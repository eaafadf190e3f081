package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Pin.PinOps

/** Ordered event-sequence (funnel) matching: which users performed
  * step 1, then step 2 strictly later, then step 3 strictly later
  * still — the conversion-analysis primitive behind "view → click →
  * purchase within a day".
  *
  * Semantics: GREEDY-EARLIEST — t1 is the user's first step-1 event,
  * t_i the first step-i event strictly after t_{i-1}. If any strictly
  * increasing chain exists, the greedy one exists (classic exchange
  * argument), so chain FEASIBILITY is exact; the optional `within`
  * bound is then applied to that greedy chain (`t_k - t_1 <= within`),
  * which is the standard "window from the FIRST occurrence of step 1"
  * funnel definition — a user whose only fast-enough chain starts at a
  * later step-1 occurrence does not count. Events with equal
  * timestamps do not chain (strictly-later), so the result is
  * tie-order independent.
  *
  * Scale shape: one `min` aggregate per step, each keyed on the user
  * column — k small aggregate tables (one row per user who reached the
  * step) joined back user-keyed. The event table is scanned once per
  * step with the step-type filter pushed to the scan; nothing ever
  * shuffles the full event stream, and no per-user event list is
  * collected anywhere.
  */
object Funnel {

  /** Per-user completion times for the full funnel: one row per user
    * who completed ALL steps, with columns `t1..tk` (the greedy chain)
    * — join back to the per-step aggregates for stage-by-stage
    * drop-off counts. `within` bounds `tk - t1` when set; pass
    * whatever compares against a time difference (`lit(micros)` for
    * numeric times, an interval for timestamps compared as
    * `tk <= t1 + within`).
    */
  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String],
                  within: Option[Column] = None): DataFrame = {
    val chained = greedyPrefixes(events, userCol, tsCol, typeCol, steps,
      checkpoint = false).last
    within match {
      case None => chained
      case Some(w) =>
        chained.filter(col(s"t${steps.size}") <= col("t1") + w)
    }
  }

  /** The greedy chain fold shared by [[funnelTimes]] and
    * [[funnelSteps]]: element d-1 is the d-step prefix frame — one row
    * per user whose greedy chain reaches step d, columns `t1..td`.
    * `checkpoint` eagerly cuts each prefix's lineage (user-cardinality
    * frames) so a consumer reading EVERY prefix ([[funnelSteps]]) pays
    * each chain join once, not once per depth it appears under. */
  private def greedyPrefixes(events: DataFrame, userCol: String,
                             tsCol: String, typeCol: String,
                             steps: Seq[String],
                             checkpoint: Boolean): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, "funnel steps must be distinct")
    def cut(df: DataFrame): DataFrame =
      if (checkpoint) df.pinned() else df
    val first = cut(events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("t1")))
    steps.zipWithIndex.drop(1).scanLeft(first) {
      case (prev, (step, i)) =>
        val tPrev = s"t$i"
        val tCur = s"t${i + 1}"
        cut(events.filter(col(typeCol) === step)
          .select(col(userCol), col(tsCol).as("__ts"))
          .join(prev, Seq(userCol))
          .filter(col("__ts") > col(tPrev))
          .groupBy(col(userCol) +: (1 to i).map(j => col(s"t$j")): _*)
          .agg(min(col("__ts")).as(tCur)))
    }
  }

  /** Per-step funnel drop-off report — the question funnels exist to
    * answer, without a user-side join: one row per step with
    * `(step_idx, step, n_reached, n_dropped, rate)`, where `n_reached`
    * counts users whose greedy chain reaches the step (with `within`
    * set, reaches it inside the window from their first step-1 event:
    * `t_i <= t1 + within` — the [[funnelTimes]] bound applied at every
    * depth, so the last row's count equals the completer count),
    * `n_dropped` is the loss from the previous step and `rate` the
    * step-over-step conversion (`floor(n * 1e6 / n_prev) / 1e6`, 1.0
    * for the first step). Greedy minimality makes the per-depth bound
    * sound: `t_i` is the earliest feasible time, so if the greedy chain
    * misses the window at depth i, every chain does, and counts are
    * non-increasing in depth.
    *
    * Scale shape: the shared per-step min-aggregate fold, each prefix
    * `localCheckpoint`ed (user-cardinality frames) and counted — k
    * single-row aggregates unioned, then a k-row window for the
    * drop-off arithmetic (k = |steps|, driver-trivial by construction).
    * The event stream still never shuffles whole. */
  def funnelSteps(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String],
                  within: Option[Column] = None): DataFrame = {
    val prefixes = greedyPrefixes(events, userCol, tsCol, typeCol, steps,
      checkpoint = true)
    val counts = prefixes.zipWithIndex.map { case (df, i) =>
      val d = i + 1
      val bounded = within match {
        case Some(w) if d > 1 => df.filter(col(s"t$d") <= col("t1") + w)
        case _ => df
      }
      bounded.agg(count(lit(1)).cast("long").as("n_reached"))
        .select(lit(d).as("step_idx"), lit(steps(i)).as("step"),
          col("n_reached"))
    }
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("step_idx"))
    counts.reduce(_ unionByName _)
      .withColumn("__prev", lag(col("n_reached"), 1).over(w))
      .withColumn("n_dropped",
        coalesce(col("__prev") - col("n_reached"), lit(0L)))
      .withColumn("rate",
        when(col("__prev").isNull || col("__prev") === 0L, lit(1.0))
          .otherwise(
            floor(col("n_reached") * lit(1000000.0) / col("__prev")) / 1e6))
      .drop("__prev")
      .orderBy(col("step_idx"))
  }

  /** Cohort retention: bucket users by the time of their first
    * `anchorType` event (cohort = `floor(t / bucket)`), then count how
    * many of each cohort are active again k buckets later —
    * `(cohort, bucket_offset, n_active, n_cohort, rate)`. The classic
    * retention triangle behind "of the users who signed up in week W,
    * how many came back in week W+k".
    *
    * Buckets are plain integer floor-division of the numeric time
    * column (pass epoch micros and `bucketUnits = 7 days of micros`
    * for weekly cohorts) — no calendar functions, so the bucketing is
    * engine-exact and timezone-free. `rate` is 1e-6-floor-rounded.
    *
    * Scale shape: one filtered min-aggregate for cohorts (user-keyed),
    * one distinct over (user, bucket) — the activity table, bounded by
    * users x buckets, not events — then a user-keyed join and a
    * (cohort, offset)-keyed count. The event stream itself never
    * shuffles; everything after the distinct is user-cardinality.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, anchorType: String,
                      bucketUnits: Long): DataFrame = {
    require(bucketUnits > 0, "bucketUnits must be positive")
    val bucket = (c: Column) => floor(c / lit(bucketUnits)).cast("long")
    val cohorts = events.filter(col(typeCol) === anchorType)
      .groupBy(col(userCol))
      .agg(bucket(min(col(tsCol))).as("cohort"))
    val sizes = cohorts.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_cohort"))
    val activity = events
      .select(col(userCol), bucket(col(tsCol)).as("bkt"))
      .distinct()
    activity.join(cohorts, Seq(userCol))
      .filter(col("bkt") >= col("cohort"))
      .groupBy(col("cohort"), (col("bkt") - col("cohort")).as("bucket_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort"))
      .select(col("cohort"), col("bucket_offset"), col("n_active"),
        col("n_cohort"),
        (floor(col("n_active") / col("n_cohort") * 1e6) / 1e6).as("rate"))
      .orderBy(col("cohort"), col("bucket_offset"))
  }
}
