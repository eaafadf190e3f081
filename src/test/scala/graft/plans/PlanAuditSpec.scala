package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The plan auditor flags exactly the hazard shapes and stays quiet on
  * the plans the engine itself ships. */
class PlanAuditSpec extends AnyFunSuite {
  import graft.SparkSpec.spark
  import spark.implicits._

  private val a = (1L to 20L).map(i => (i, s"a$i")).toDF("id", "s")
  private val b = (1L to 10L).map(i => (i, i * 2)).toDF("k", "v")

  private def kinds(df: org.apache.spark.sql.DataFrame): Set[String] =
    PlanAudit.audit(df).map(_.kind).toSet

  test("cartesian and nested-loop joins are flagged; equi joins are not") {
    // a small crossJoin broadcasts (BNLJ); with broadcast off it is a
    // true CartesianProduct — both are loop shapes and both flag
    assert(kinds(a.crossJoin(b))
      .exists(Set("CARTESIAN", "NESTED_LOOP")))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try assert(kinds(a.crossJoin(b)).contains("CARTESIAN"))
    finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(kinds(a.join(b, col("id") < col("k"))).contains("NESTED_LOOP"))
    assert(!kinds(a.join(b, col("id") === col("k")))
      .exists(Set("CARTESIAN", "NESTED_LOOP")))
  }

  test("global window flagged, partitioned window clean; global sort " +
    "flagged, top-k clean") {
    import org.apache.spark.sql.expressions.Window
    val global = a.withColumn("r",
      row_number().over(Window.orderBy(col("id"))))
    assert(kinds(global).contains("GLOBAL_WINDOW"))
    val part = a.withColumn("r",
      row_number().over(Window.partitionBy(col("s")).orderBy(col("id"))))
    assert(!kinds(part).contains("GLOBAL_WINDOW"))
    assert(kinds(a.orderBy(col("id"))).contains("GLOBAL_SORT"))
    // the K-row tail plans as TakeOrderedAndProject — no global sort
    assert(!kinds(a.orderBy(col("id")).limit(5)).contains("GLOBAL_SORT"))
  }

  test("single-row exemption does not walk through row-multiplying " +
    "nodes: an explode over a grouping-less aggregate is still flagged") {
    // agg -> one row, but the explode fans it back out to many rows —
    // a loop join against it is NOT linear and must be flagged
    val exploded = b.agg(collect_list(col("k")).as("ks"))
      .select(explode(col("ks")).as("k"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try assert(kinds(a.crossJoin(exploded)).contains("CARTESIAN"))
    finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(kinds(a.crossJoin(exploded))
      .exists(Set("CARTESIAN", "NESTED_LOOP")))
    // the genuine single-row shape stays exempt (broadcast-stats idiom)
    val stats = b.agg(sum(col("v")).as("tot"))
    assert(!kinds(a.crossJoin(stats))
      .exists(Set("CARTESIAN", "NESTED_LOOP")))
  }

  test("group-table loop exemption: the sketch overlap matrix audits " +
    "clean, a row-level BNLJ still flags") {
    // both sides grouped aggregates -> G x G over slices: exempt
    val ev = (0 until 200).map(i => (s"t${i % 4}", (i % 37).toLong))
      .toDF("g", "v")
    val m = graft.ops.Sketch.overlapMatrix(ev, "g", col("v"), k = 64)
    assert(!kinds(m).exists(Set("CARTESIAN", "NESTED_LOOP")),
      PlanAudit.audit(m).toString)
    // one row-level side (a plain scan) -> still a quadratic hazard
    val groupTab = ev.groupBy(col("g")).agg(count(lit(1)).as("c"))
    assert(kinds(a.join(groupTab, col("id") < col("c")))
      .contains("NESTED_LOOP"))
    // a grouped aggregate fanned back out by explode is row-level again
    val fanned = ev.groupBy(col("g"))
      .agg(collect_list(col("v")).as("vs"))
      .select(col("g"), explode(col("vs")).as("v"))
    assert(kinds(fanned.join(fanned.withColumnRenamed("g", "g2"),
      col("g") < col("g2"))).contains("NESTED_LOOP"))
  }

  test("the engine's own flagship plans audit clean") {
    val sf = "/root/testdata/sf0.001"
    Seq("q_join_stars", "q_agg_pricing", "q_doc_bm25_index",
      "q_dedup_minhash", "q_embed_ivf_batch").foreach { q =>
      val fs = PlanAudit.audit(graft.SparkEntry.queries(q)(spark, sf))
        .filterNot(_.kind == "WIDE_SCAN")   // informational
        .filterNot(_.kind == "GLOBAL_SORT") // the oracle convention's
        // trailing total ORDER BY — exactly the documented-acceptable
        // final small-output sort
      assert(fs.isEmpty, s"$q: $fs")
    }
  }
}
