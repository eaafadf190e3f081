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
  * Streaming queries are excluded (building them starts and drains a
  * stream; their stateful shapes are pinned by MonitorSpec and the
  * per-query PlanSpec gates). */
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
}
