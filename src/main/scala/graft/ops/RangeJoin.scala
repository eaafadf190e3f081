package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) joins at scale.
  *
  * Spark has no native interval-join operator: a raw
  * `p.ts BETWEEN i.start AND i.end` condition plans as a
  * BroadcastNestedLoopJoin (or cartesian) — O(|points| x |intervals|)
  * work however big the tables. Binning restores an equi-join shape:
  * intervals explode into the fixed-width bins they cover, points map to
  * their single bin, the join key becomes (keys..., bin), and the exact
  * containment predicate filters the equi-join's candidates. Work is
  * |points| + sum(interval_len/binWidth + 1) join rows — linear, shuffle-
  * partitionable, AQE-balanceable.
  */
object RangeJoin {

  /** Join each point to every interval containing it, equi-joining on
    * `keys` plus the bin. `pointCol`/`startCol`/`endCol` are integral
    * (e.g. epoch micros — convert timestamps with `unix_micros` first;
    * integral `div` keeps the binning exact where double division could
    * misround). Intervals are closed ([start, end]); callers wanting
    * half-open subtract 1 from `endCol`.
    *
    * Sizing rule: choose `binWidth` near the TYPICAL interval length —
    * each interval fans out into `len/binWidth + 1` bin rows, so a width
    * far below the interval lengths multiplies the exploded side by that
    * ratio (the adversarial case: 1 ms bins on year-long intervals =
    * 3e10 rows per interval). The fan-out is guarded at runtime: any
    * interval that would explode into more than `maxBinsPerInterval`
    * bins fails the job with a message naming the offending width, before
    * the explode materializes the rows — a mis-sized 100 TB job dies in
    * seconds, not after shuffling petabytes. Intervals with
    * `end < start` are dropped up front (an unsatisfiable BETWEEN matches
    * nothing; left in, Spark's `sequence` would count DOWN and explode
    * them into spurious bins). */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   pointCol: String, startCol: String, endCol: String,
                   binWidth: Long, keys: Seq[String] = Nil,
                   maxBinsPerInterval: Long = 65536L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val p = points.withColumn("__bin", expr(s"$pointCol div ${binWidth}L"))
    val i = binExplode(intervals, startCol, endCol, binWidth,
      maxBinsPerInterval)
    p.join(i, keys :+ "__bin", "inner")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  /** Explode closed intervals into their covered fixed-width bins as
    * `__bin`, dropping unsatisfiable `end < start` rows and failing fast
    * on bin fan-out past `maxBins` (see [[intervalJoin]]'s sizing rule). */
  private def binExplode(df: DataFrame, startCol: String, endCol: String,
                         binWidth: Long, maxBins: Long): DataFrame = {
    val nBins =
      expr(s"$endCol div ${binWidth}L") - expr(s"$startCol div ${binWidth}L") + 1L
    val fanOutOk = coalesce(assert_true(nBins <= maxBins,
      concat(lit(s"RangeJoin: interval spans "), nBins.cast("string"),
        lit(s" bins of width $binWidth (> maxBinsPerInterval=" +
          s"$maxBins); raise binWidth toward the typical " +
          "interval length or raise maxBinsPerInterval"))), lit(true))
    df.filter(expr(s"$endCol >= $startCol"))
      .filter(fanOutOk).withColumn("__bin",
        explode(sequence(expr(s"$startCol div ${binWidth}L"),
          expr(s"$endCol div ${binWidth}L"))))
  }

  /** Interval-overlap join: every (left, right) pair of CLOSED intervals
    * with `lStart <= rEnd && rStart <= lEnd` (and equal `keys`) — the
    * interval×interval sibling of [[intervalJoin]]'s point-in-interval.
    * Column names must be disjoint across the two frames apart from
    * `keys`.
    *
    * Same binning discipline, both sides exploded; a pair sharing
    * several bins would surface once per shared bin, so candidates are
    * kept only in their FIRST shared bin —
    * `__bin == greatest(lStartBin, rStartBin)` — which makes the output
    * exactly-once WITHOUT a distinct/dedup shuffle (the first shared bin
    * of an overlapping pair always exists and both sides cover it).
    * Work stays linear in exploded rows: |l|·(len/width+1) +
    * |r|·(len/width+1), equi-join shape, AQE-balanceable, with the same
    * runtime fan-out guard on both sides. */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  lStart: String, lEnd: String,
                  rStart: String, rEnd: String,
                  binWidth: Long, keys: Seq[String] = Nil,
                  maxBinsPerInterval: Long = 65536L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val l = binExplode(left, lStart, lEnd, binWidth, maxBinsPerInterval)
    val r = binExplode(right, rStart, rEnd, binWidth, maxBinsPerInterval)
    l.join(r, keys :+ "__bin", "inner")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bin") === greatest(
        expr(s"$lStart div ${binWidth}L"), expr(s"$rStart div ${binWidth}L")))
      .drop("__bin")
  }
}
