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
    * misround). Choose `binWidth` near the typical interval length: each
    * interval fans out into len/binWidth + 1 bin rows. Intervals are
    * closed ([start, end]); callers wanting half-open subtract 1 from
    * `endCol`. */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   pointCol: String, startCol: String, endCol: String,
                   binWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", expr(s"$pointCol div ${binWidth}L"))
    val i = intervals.withColumn("__bin",
      explode(sequence(expr(s"$startCol div ${binWidth}L"),
        expr(s"$endCol div ${binWidth}L"))))
    p.join(i, keys :+ "__bin", "inner")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
