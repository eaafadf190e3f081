package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-preceding) join — an operator Spark lacks as a
  * built-in, composed from existing operators per the preference order
  * (compose > custom plan): tag and union both sides, sort within each
  * key partition by (time, side), and carry the last-seen right-side
  * payload forward with `last(..., ignoreNulls)`.
  *
  * Scale shape: ONE shuffle of `|left| + |right|` rows on the key (the
  * same cost as any keyed window), no range-explosion cross product, no
  * per-key driver loops; skewed keys are subject to the same salting
  * guards as any window (see [[Skew]]). This is the standard distributed
  * as-of technique and why a custom `SparkStrategy` isn't warranted.
  */
object AsOf {

  /** For each left row, attach the latest right row with
    * `rightTime <= leftTime` within the same `key` (left join semantics:
    * unmatched left rows keep nulls).
    *
    * `rightCols` are the right-side payload columns to carry; they appear
    * in the output as `asof_<name>`. The right side must be unique per
    * (key, time) — pre-aggregate if needed (ties at equal time are
    * matched, mirroring ASOF semantics of `l.time >= r.time`).
    *
    * `tolerance`: optional maximum staleness — a match older than
    * `leftTime - tolerance` is nulled out (the pandas `merge_asof`
    * tolerance semantics). Pass whatever adds to the time column:
    * `expr("INTERVAL 30 MINUTES")` for timestamps, `lit(n)` for numeric
    * times. Payloads are carried per COLUMN (`last(..., ignoreNulls)`),
    * so when the most recent right row holds a null in one payload
    * column, that column's value may originate from an OLDER right row
    * than `asof_time` — each payload is therefore gated on ITS OWN
    * origin-row time (carried alongside it in the same window), not on
    * the overall match time; a payload whose origin row exceeds the
    * tolerance nulls out even when a fresher (null-payload) match
    * exists. Applied as a post-carry projection: the plan stays the
    * same single keyed shuffle, no extra pass. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String],
               tolerance: Option[Column] = None): DataFrame = {
    val leftOut = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r0 = right.select(
      (col(key) +: col(rightTime).as("__t") +:
        rightCols.map(c => col(c).as(s"asof_$c"))): _*)
      .withColumn("__side", lit(0))
    val lAligned = l.select(
      (col(key) +: col("__t") +: col("__side") +:
        leftOut.filterNot(_ == key).map(col) ++:
        rightCols.map(c => lit(null).cast(
          r0.schema(s"asof_$c").dataType).as(s"asof_$c"))): _*)
    val rAligned = r0.select(
      (col(key) +: col("__t") +: col("__side") +:
        leftOut.filterNot(_ == key).map(c =>
          lit(null).cast(l.schema(c).dataType).as(c)) ++:
        rightCols.map(c => col(s"asof_$c"))): _*)
    // right rows sort before left rows at equal time, so an exact-time
    // match is visible to the left row
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carriedCols = rightCols.map(c =>
      last(col(s"asof_$c"), ignoreNulls = true).over(w).as(s"asof_$c"))
    val carriedTime =
      last(when(col("__side") === 0, col("__t")), ignoreNulls = true)
        .over(w).as("asof_time")
    // per-payload origin times (tolerance only): the time of the right
    // row each carried payload actually came from — same window, same
    // physical Window op, so the extra expressions cost no extra shuffle
    val payloadTimes =
      if (tolerance.isEmpty) Nil
      else rightCols.map(c =>
        last(when(col(s"asof_$c").isNotNull, col("__t")), ignoreNulls = true)
          .over(w).as(s"__asof_t_$c"))
    val carried = lAligned.unionByName(rAligned)
      .select((col(key) +: col("__side") +:
        leftOut.filterNot(_ == key).map(col)) ++
        carriedCols ++ payloadTimes :+ carriedTime: _*)
      .filter(col("__side") === 1)
      .drop("__side")
    tolerance match {
      case None => carried
      case Some(tol) =>
        // staleness gates: leftTime - originTime <= tol, written as
        // leftTime <= originTime + tol so it types for both timestamp
        // (+ interval) and numeric (+ numeric) time columns. Each
        // payload checks the origin time of ITS carried value;
        // asof_time checks the overall match time.
        def fresh(t: Column): Column =
          t.isNotNull && col(leftTime) <= t + tol
        rightCols.foldLeft(carried) { (df, c) =>
          df.withColumn(s"asof_$c",
            when(fresh(col(s"__asof_t_$c")), col(s"asof_$c")))
        }.withColumn("asof_time",
          when(fresh(col("asof_time")), col("asof_time")))
          .drop(rightCols.map(c => s"__asof_t_$c"): _*)
    }
  }

  /** Forward-fill (LOCF — last observation carried forward): replace
    * nulls in `fillCols` with the most recent non-null value of the
    * same column, within `key`, ordered by (`timeCol`, `orderCols`).
    * The single-table sibling of [[asofJoin]]: one keyed window
    * shuffle, `last(..., ignoreNulls)` per column, no self-join.
    *
    * `tolerance`: optional maximum staleness, same contract as
    * [[asofJoin]] — each column's carried value is gated on ITS OWN
    * origin-row time (tracked in the same window at zero extra
    * shuffle), so a value older than `time - tolerance` stays null
    * rather than leaking stale state forward; on an unbounded event
    * stream this is the difference between bounded and unbounded
    * effective memory. Rows whose own value is non-null always keep it.
    *
    * `orderCols` break timestamp ties deterministically (pass the event
    * id); without a total order, "last" is not well-defined and results
    * become partitioning-dependent.
    */
  def fillForward(df: DataFrame, key: String, timeCol: String,
                  fillCols: Seq[String],
                  orderCols: Seq[String] = Nil,
                  tolerance: Option[Column] = None): DataFrame = {
    require(fillCols.nonEmpty, "fillCols must be non-empty")
    val w = Window.partitionBy(col(key))
      .orderBy((col(timeCol) +: orderCols.map(col)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = fillCols.foldLeft(df) { (d, c) =>
      d.withColumn(s"__fill_$c", last(col(c), ignoreNulls = true).over(w))
        .withColumn(s"__fill_t_$c",
          last(when(col(c).isNotNull, col(timeCol)), ignoreNulls = true)
            .over(w))
    }
    val gated = tolerance match {
      case None => filled
      case Some(tol) =>
        fillCols.foldLeft(filled) { (d, c) =>
          d.withColumn(s"__fill_$c",
            when(col(s"__fill_t_$c").isNotNull &&
              col(timeCol) <= col(s"__fill_t_$c") + tol,
              col(s"__fill_$c")))
        }
    }
    fillCols.foldLeft(gated) { (d, c) =>
      d.withColumn(c, col(s"__fill_$c"))
    }.drop(fillCols.flatMap(c => Seq(s"__fill_$c", s"__fill_t_$c")): _*)
  }
}
