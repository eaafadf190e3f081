package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the validation gate a pipeline runs
  * before committing an ingest batch (nulls crept in? id space collided?
  * a source started sending empty text?).
  *
  * One aggregation job over the corpus: all per-column statistics ride a
  * single `agg(...)` (Spark plans the multi-`countDistinct` via EXPAND —
  * one shuffle, partial aggregation on every branch), and the single
  * result row is unpivoted to one row per column with `stack`. No
  * per-column scans, no driver-side iteration over data — profiling
  * 100 TB costs one pass.
  */
object Profile {

  /** (col_name, n, n_nulls, n_distinct, min_s, max_s) per listed column.
    * Min/max are computed in the column's native type and then rendered
    * as strings (casting first would compare "10" < "9").
    *
    * Distinct counting: EXACT by default — what a validation gate needs
    * to assert id uniqueness — but exact multi-`countDistinct` plans via
    * EXPAND, which multiplies every input row by the number of profiled
    * columns before the exchange. Fine for a gate run; for routine
    * profiling of a 100 TB ingest pass `approx = true`: HyperLogLog++
    * sketches (`approx_count_distinct`, `rsd` relative error) are plain
    * partial aggregates — no EXPAND, the scan shuffles one sketch per
    * (partition, column) regardless of cardinality. */
  def columnStats(df: DataFrame, cols: Seq[String],
                  approx: Boolean = false, rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    def distinctAgg(c: String): Column =
      if (approx) approx_count_distinct(col(c), rsd)
      else countDistinct(col(c))
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"__${c}__nulls"),
        distinctAgg(c).as(s"__${c}__distinct"),
        min(col(c)).cast("string").as(s"__${c}__min"),
        max(col(c)).cast("string").as(s"__${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__${c}__nulls`, `__${c}__distinct`, `__${c}__min`, `__${c}__max`"
    }.mkString(", ")
    one.select(col("__n").as("n"),
      expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_nulls, n_distinct, min_s, max_s)"))
      .select(col("col_name"), col("n"), col("n_nulls"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }

  /** Robust per-group outlier detection via the modified z-score:
    * `|x - median| / (1.4826 * MAD) > z` with MAD = median of absolute
    * deviations from the group median. Unlike mean/stddev gates, both
    * statistics have a 50% breakdown point — the outliers themselves
    * cannot drag the threshold (the classic failure of 3-sigma rules on
    * heavy-tailed doc lengths).
    *
    * Returns the input rows (value cast to double as `<valueCol>_v`)
    * with `med`, `mad`, and the 1e-6-floor-rounded `robust_z` attached,
    * filtered to `robust_z > z`. Groups where MAD = 0 (over half the
    * group shares one value) flag nothing — standard for the method;
    * combine with an exact-duplicate gate for degenerate groups.
    *
    * Scale shape: two aggregate rounds over the group key — exact
    * `median` (Spark's built-in exact percentile) then the deviation
    * median — each a group-keyed shuffle whose result (one row per
    * group) joins back onto the corpus (AQE broadcasts it when the
    * group count is small, and degrades to a shuffle join when a
    * high-cardinality grouping makes it large); the corpus itself
    * never re-shuffles. Exact medians hold whole-group value multisets in
    * executor memory during the aggregate — at extreme per-group
    * cardinality swap in `approx_percentile` (the profiling `approx`
    * discipline); for integer-ish metrics (lengths, counts) exact is
    * right and the interpolated midpoint is dyadic, so cross-engine
    * reproducibility is exact. */
  def robustOutliers(df: DataFrame, valueCol: String, groupCol: String,
                     z: Double = 3.5): DataFrame = {
    require(z > 0, "z must be positive")
    val v = col(valueCol).cast("double")
    val base = df.filter(v.isNotNull && !isnan(v))
      .withColumn(s"${valueCol}_v", v)
    // no broadcast() hints: the per-group tables are one row per group,
    // but group cardinality is caller-controlled and unbounded (e.g. a
    // url-host grouping) — AQE picks broadcast when they fit and degrades
    // to a shuffle join when they don't, instead of a forced-build OOM
    val med = base.groupBy(col(groupCol))
      .agg(median(col(s"${valueCol}_v")).as("med"))
    val withMed = base.join(med, Seq(groupCol))
    val mad = withMed.groupBy(col(groupCol))
      .agg(median(abs(col(s"${valueCol}_v") - col("med"))).as("mad"))
    val score = abs(col(s"${valueCol}_v") - col("med")) /
      (lit(1.4826) * col("mad"))
    withMed.join(mad, Seq(groupCol))
      .filter(col("mad") > 0d)
      .withColumn("robust_z", floor(score * 1e6) / 1e6)
      .filter(col("robust_z") > z)
  }

  /** Gate attribution for an ordered rule chain (the Dolma-style
    * tagger-then-decide audit): for each named boolean rule, how many
    * docs fail it IN ISOLATION (`n_fail_alone`), how many have it as
    * their FIRST failing rule in chain order (`n_first_blame` — these
    * sum to the total dropped, so the table explains exactly where the
    * corpus went), and how many survive the chain up to and including
    * it (`n_surviving_after`, monotonically non-increasing; the last
    * row is the corpus that ships). A null rule value counts as a
    * failure — a gate that cannot evaluate must not pass documents.
    *
    * Returns `(rule_idx, rule, n_fail_alone, n_first_blame,
    * n_surviving_after)` in chain order.
    *
    * Scale shape: ONE corpus pass — every counter is a conditional sum
    * in a single grouping-less aggregate (partial-aggregated map-side
    * to one row), unpivoted to K rows with `stack`. Adding a rule adds
    * three sum branches, never a scan. */
  def gateAttribution(df: DataFrame,
                      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be unique")
    val pass = rules.map { case (_, c) => coalesce(c, lit(false)) }
    val aggs = rules.indices.flatMap { i =>
      val failAlone = sum(when(!pass(i), 1L).otherwise(0L))
        .as(s"fa$i")
      val firstBlame = sum(when(
        pass.take(i).foldLeft(!pass(i))((acc, p) => acc && p), 1L)
        .otherwise(0L)).as(s"fb$i")
      val surviving = sum(when(
        pass.take(i + 1).reduce(_ && _), 1L).otherwise(0L))
        .as(s"sv$i")
      Seq(failAlone, firstBlame, surviving)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single row to K rule rows (stack wants resolvable
    // column names, so the literal/counter columns are named first)
    val stackArgs = rules.indices.flatMap(i => Seq(
      lit(i.toLong), lit(rules(i)._1),
      col(s"fa$i"), col(s"fb$i"), col(s"sv$i")))
    val named = one.select(stackArgs.zipWithIndex.map {
      case (c, j) => c.as(s"arg$j")
    }: _*)
    named.select(expr(
      s"stack(${rules.size}, ${stackArgs.indices.map(j => s"arg$j")
        .mkString(", ")}) AS (rule_idx, rule, n_fail_alone, " +
        "n_first_blame, n_surviving_after)"))
      .orderBy(col("rule_idx"))
  }
}
