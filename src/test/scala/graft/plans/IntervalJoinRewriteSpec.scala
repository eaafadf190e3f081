package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The opt-in non-equi interval-join rewrite: plan shape (BNLJ ->
  * bin-keyed equi join) and exact answer parity with the naive join on
  * adversarial fixtures (strict/closed bounds, nulls, inverted
  * intervals, bin-boundary points, reversed join sides).
  */
class IntervalJoinRewriteSpec extends AnyFunSuite {
  import graft.SparkSpec.spark
  import spark.implicits._

  private def withRule[A](width: Long)(f: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ IntervalJoinRewrite
    spark.conf.set(IntervalJoinRewrite.binWidthConf, width.toString)
    try f finally {
      spark.conf.unset(IntervalJoinRewrite.binWidthConf)
      spark.experimental.extraOptimizations = prev
    }
  }

  private val points = Seq[(Long, java.lang.Long)](
    (1L, 0L), (2L, 10L), (3L, 100L), (4L, 101L), (5L, 199L),
    (6L, 200L), (7L, 999L), (8L, null)
  ).toDF("pid", "t")

  private val intervals = Seq[(Long, java.lang.Long, java.lang.Long)](
    (10L, 0L, 99L),       // bins 0
    (11L, 50L, 250L),     // spans bins 0..2
    (12L, 200L, 200L),    // single-point interval on a bin boundary
    (13L, 300L, 100L),    // inverted: must match nothing
    (14L, null, 500L),    // null bound: must match nothing
    (15L, 900L, 1100L)
  ).toDF("iid", "s", "e")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("closed-bounds rewrite: no nested loop, answer equals the " +
    "naive join, boundary and null cases exact") {
    val cond = col("t") >= col("s") && col("t") <= col("e")
    val naive = pairs(points.join(intervals, cond))
    assert(naive == Set((1L, 10L), (2L, 10L), (3L, 11L), (4L, 11L),
      (5L, 11L), (6L, 11L), (6L, 12L), (7L, 15L)))
    withRule(100L) {
      val joined = points.join(intervals, cond)
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), p)
      assert(p.contains("Generate explode"), p)
      assert(pairs(joined) == naive)
    }
  }

  test("strict bounds and reversed sides rewrite too; equi-keyed and " +
    "conf-less joins are left alone") {
    val strict = col("t") > col("s") && col("t") < col("e")
    val naiveStrict = pairs(points.join(intervals, strict))
    withRule(64L) {
      val j = points.join(intervals, strict)
      assert(!j.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(pairs(j) == naiveStrict)
      // intervals on the LEFT: the point side is detected on the right
      val rev = intervals.join(points, strict)
      assert(!rev.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(pairs(rev) == naiveStrict)
      // a cross-side equality conjunct means Spark hash-joins already —
      // the rule must not add explode fan-out
      val keyed = points.withColumn("k", col("pid") % 2)
        .join(intervals.withColumn("k", col("iid") % 2), Seq("k"))
        .filter(col("t") >= col("s") && col("t") <= col("e"))
      assert(!keyed.queryExecution.executedPlan.toString
        .contains("Generate explode"))
      keyed.collect()
    }
    // without the conf, the naive plan stays (opt-in contract)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ IntervalJoinRewrite
    try {
      val p = points.join(intervals, strict)
        .queryExecution.executedPlan.toString
      assert(p.contains("BroadcastNestedLoopJoin") ||
        p.contains("CartesianProduct"), p)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("bin fan-out cap: an interval spanning far more bins than " +
    "maxBins routes through the hash-keyed fallback branch — exact " +
    "answer, no Sequence blow-up, no nested loop in the plan") {
    val huge = Seq[(Long, java.lang.Long, java.lang.Long)](
      (20L, 0L, Long.MaxValue - 1L), // corrupt upper bound
      (21L, 0L, 99L)                 // healthy interval alongside it
    ).toDF("iid", "s", "e")
    val cond = col("t") >= col("s") && col("t") <= col("e")
    val naive = pairs(points.join(huge, cond))
    withRule(100L) {
      spark.conf.set(IntervalJoinRewrite.maxBinsConf, "16")
      try {
        val j = points.join(huge, cond)
        val p = j.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin") &&
          !p.contains("CartesianProduct"), p)
        assert(p.contains("Generate explode"), p)
        assert(pairs(j) == naive) // would throw in Sequence without the cap
      } finally spark.conf.unset(IntervalJoinRewrite.maxBinsConf)
    }
  }

  test("invalid conf values log-and-skip instead of failing the query") {
    val cond = col("t") >= col("s") && col("t") <= col("e")
    val naive = pairs(points.join(intervals, cond))
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ IntervalJoinRewrite
    try {
      spark.conf.set(IntervalJoinRewrite.binWidthConf, "not-a-number")
      val j = points.join(intervals, cond)
      assert(pairs(j) == naive) // query still runs, rewrite skipped
      assert(!j.queryExecution.optimizedPlan.toString
        .contains("__graft_bin"), "rewrite must not fire on a bad conf")
      spark.conf.set(IntervalJoinRewrite.binWidthConf, "-5")
      assert(pairs(points.join(intervals, cond)) == naive)
      // bad maxBins falls back to the default, rewrite still fires
      spark.conf.set(IntervalJoinRewrite.binWidthConf, "100")
      spark.conf.set(IntervalJoinRewrite.maxBinsConf, "zero")
      val ok = points.join(intervals, cond)
      assert(ok.queryExecution.optimizedPlan.toString
        .contains("__graft_bin"))
      assert(pairs(ok) == naive)
    } finally {
      spark.conf.unset(IntervalJoinRewrite.binWidthConf)
      spark.conf.unset(IntervalJoinRewrite.maxBinsConf)
      spark.experimental.extraOptimizations = prev
    }
  }

  test("randomized parity: rewrite == naive join on generated data, " +
    "negative longs included") {
    val rnd = new scala.util.Random(11)
    val ps = (0 until 300).map(i =>
      (i.toLong, (rnd.nextLong() % 2000L): java.lang.Long))
    val is = (0 until 80).map { i =>
      val s = rnd.nextLong() % 2000L
      (1000L + i, (s: java.lang.Long), (s + rnd.nextInt(300) - 20L): java.lang.Long)
    }
    val pdf = ps.toDF("pid", "t")
    val idf = is.toDF("iid", "s", "e")
    val cond = col("t") >= col("s") && col("t") <= col("e")
    val naive = pairs(pdf.join(idf, cond))
    withRule(128L) {
      assert(pairs(pdf.join(idf, cond)) == naive)
    }
  }
}
