package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators. AQE's skew-join handling covers most cases
  * at runtime; these are the explicit two-phase forms for when a key's
  * cardinality is so pathological (a handful of keys owning most of a
  * 100 TB table) that pre-splitting beats re-planning.
  */
object Skew {

  /** Deterministic salt in [0, n): hash of the salt-source columns — no
    * `rand()`, so retried tasks and re-runs produce identical plans. */
  def salt(n: Int, source: Column*): Column =
    pmod(xxhash64(source: _*), lit(n.toLong)).cast("int")

  /** Two-phase salted aggregation: phase 1 aggregates on (key, salt) —
    * splitting each hot key across `n` reducers — phase 2 merges the
    * partials per key. Supported merges: sum/count/min/max (the
    * re-aggregatable ones). `saltSource` should be high-cardinality
    * columns (defaults to all non-key columns' hash via the caller). */
  def saltedAgg(df: DataFrame, keys: Seq[String], n: Int,
                saltSource: Seq[String],
                aggs: Seq[(String, String)]): DataFrame = {
    val saltCol = salt(n, saltSource.map(col): _*)
    val phase1 = df.withColumn("__salt", saltCol)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head match { case (c, f) => partialExpr(c, f) },
        aggs.tail.map { case (c, f) => partialExpr(c, f) }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(aggs.head match { case (c, f) => mergeExpr(c, f) },
        aggs.tail.map { case (c, f) => mergeExpr(c, f) }: _*)
  }

  private def partialExpr(c: String, f: String): Column = f match {
    case "sum" => sum(col(c)).as(s"${f}_$c")
    case "count" => count(col(c)).as(s"${f}_$c")
    case "min" => min(col(c)).as(s"${f}_$c")
    case "max" => max(col(c)).as(s"${f}_$c")
    case other => throw new IllegalArgumentException(
      s"not re-aggregatable under salting: $other")
  }

  private def mergeExpr(c: String, f: String): Column = f match {
    case "sum" => sum(col(s"${f}_$c")).as(s"${f}_$c")
    case "count" => sum(col(s"${f}_$c")).as(s"${f}_$c")
    case "min" => min(col(s"${f}_$c")).as(s"${f}_$c")
    case "max" => max(col(s"${f}_$c")).as(s"${f}_$c")
    case other => throw new IllegalArgumentException(other)
  }

  /** Salted equi-join for a skewed big side against a smaller (but not
    * broadcastable) side: the big side gets a deterministic salt, the
    * small side is replicated `n` times, and the join key becomes
    * (key, salt) — each hot key spreads over `n` tasks. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int,
                 saltSource: Seq[String]): DataFrame = {
    val b = big.withColumn("__salt", salt(n, saltSource.map(col): _*))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
