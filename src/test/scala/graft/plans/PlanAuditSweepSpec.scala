package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Registry-wide plan linting: EVERY batch query's physical plan must
  * be free of row-level loop-join shapes — the audit that PlanSpec
  * applies to chosen queries, applied to all of them, so a new query
  * with a missing join key fails CI by default instead of by luck of
  * selection. Deliberate loop shapes are allow-listed BY NAME with a
  * justification; the single-row and group-table exemptions inside
  * [[PlanAudit]] cover the broadcast-stats and sketch-matrix idioms
  * without entries here.
  *
  * Streaming coverage (round 11): the composable streaming surfaces in
  * [[graft.streaming.Monitor]] are audited PRE-START via
  * [[PlanAudit.auditStreaming]] — constructing the frame is enough, no
  * drain. The registry's `q_stream_*` entries are those surfaces plus
  * foreachBatch sinks whose per-batch work is the batch fold functions
  * already linted by the batch sweep above; a new streaming TRANSFORM
  * gets default lint coverage by being exercised here. */
class PlanAuditSweepSpec extends AnyFunSuite {
  import graft.SparkSpec.spark

  private val sf = "/root/testdata/sf0.001"

  /** Deliberate loop joins, each bounded by construction but NOT
    * statically provable from the plan (the bound lives in a literal
    * IN-filter's pushed predicate, which the audit cannot size):
    * every entry is a QUERY-SET scan — the retrieval workload's
    * handful of query vectors / query rows, selected from parquet by
    * a literal IN filter and crossed once with the corpus as the
    * brute-force / ADC scoring baseline. Cost is |corpus| x
    * |queries|, linear in the corpus. (Grid queries — pgrid, cross,
    * stargrid — need no entries: Catalyst's ConvertToLocalRelation
    * folds their literal products before planning; stats crosses,
    * top-vocab model tables, and domain grids are exempted
    * structurally inside PlanAudit via staticBound /
    * groupTableBounded.) */
  private val allowed: Map[String, String] = Map(
    "q_cross_small" -> "5-row dims cross (the deliberate tiny-dims demo)",
    "q_embed_topk" -> "query-vector set (literal IN scan) x corpus",
    "q_embed_quant_topk" -> "query-vector set x quantized corpus",
    "q_embed_pq" -> "query-vector set x PQ codes (ADC baseline)",
    "q_embed_pq_index" -> "query-vector set x persisted PQ index",
    "q_embed_contamination" -> "benchmark-vector set x corpus",
    "q_doc_rrf_batch" -> "query batch rows x corpus (dense arm)"
  )

  test("every batch registry query audits clean of loop-join shapes " +
    "(explicit allow-list for deliberate grids)") {
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("q_stream_"))
    val flagged = names.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      PlanAudit.audit(df)
        .filter(f => f.kind == "CARTESIAN" || f.kind == "NESTED_LOOP")
        .map(f => (name, f.kind, f.operator))
    }
    val unexpected = flagged.filterNot { case (n, _, _) => allowed.contains(n) }
    assert(unexpected.isEmpty,
      "loop-join shapes outside the allow-list:\n" +
        unexpected.mkString("\n"))
    // the allow-list itself must not rot: every entry still flags
    val flaggedNames = flagged.map(_._1).toSet
    val stale = allowed.keySet -- flaggedNames
    assert(stale.isEmpty,
      s"allow-list entries no longer needed (plan improved?): $stale")
  }

  test("streaming surfaces audit clean of loop-join shapes PRE-START; " +
    "a deliberately keyless stream-stream join flags") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-streamaudit-").toString
    val evSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType)))
    // the file source resolves its path at analysis: seed both dirs
    // with an empty file of the right schema (no rows needed — the
    // audit never starts the streams)
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      evSchema).write.parquet(s"$dir/ev")
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      docSchema).write.parquet(s"$dir/docs")
    def ev = spark.readStream.schema(evSchema).parquet(s"$dir/ev")
    def docs = spark.readStream.schema(docSchema).parquet(s"$dir/docs")
    def clicks = ev.select(col("user_id").as("click_user"),
      col("ts").as("click_ts"),
      floor(col("value") * 100).cast("long").as("click_cents"))
    def purchases = ev.select(col("user_id").as("p_user"),
      col("ts").as("p_ts"))
    import graft.streaming.Monitor
    val surfaces: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "eventsWindowed" -> Monitor.eventsWindowed(ev),
      "sessionizeNative" -> Monitor.sessionizeNative(ev),
      "attributionJoin" -> Monitor.attributionJoin(clicks, purchases),
      "attributionWindowed" ->
        Monitor.attributionWindowed(clicks, purchases),
      "mixtureMonitor" -> Monitor.mixtureMonitor(docs),
      "dedupStream" -> Monitor.dedupStream(docs, Seq("doc_id")),
      "windowedQuantiles" ->
        Monitor.windowedQuantiles(ev, col("value"), k = 64),
      "gateMonitor" -> Monitor.gateMonitor(docs,
        Seq("nonempty" -> col("text").isNotNull)))
    val flagged = surfaces.flatMap { case (name, df) =>
      PlanAudit.auditStreaming(df)
        .filter(f => f.kind == "CARTESIAN" || f.kind == "NESTED_LOOP")
        .map(f => (name, f.kind))
    }
    assert(flagged.isEmpty, s"streaming loop-join shapes: $flagged")
    // teeth: a stream-stream join with ONLY a range condition (no
    // equality conjunct) must flag — the state-unbounded shape the
    // sweep exists to catch before a deploy does
    val keyless = clicks.withWatermark("click_ts", "1 hour")
      .join(purchases.withWatermark("p_ts", "1 hour"),
        expr("click_ts >= p_ts - INTERVAL 30 MINUTES AND click_ts <= p_ts"))
    val bad = PlanAudit.auditStreaming(keyless)
      .filter(f => f.kind == "CARTESIAN" || f.kind == "NESTED_LOOP")
    assert(bad.nonEmpty, "keyless streaming join should flag")
  }
}
