package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Static scale audit of a physical plan — the engine's CI plan gates
  * (PlanSpec) packaged as a library call, so a pipeline author can lint
  * a query for the shapes that are harmless at notebook scale and fatal
  * at 100 TB, BEFORE running it on the cluster:
  *
  *   - `CARTESIAN` / `NESTED_LOOP`: a CartesianProduct or
  *     BroadcastNestedLoopJoin — O(|left| x |right|) row visits; almost
  *     always a missing join key or a range condition that should be
  *     binned ([[IntervalJoinRewrite]] / [[graft.ops.RangeJoin]]).
  *   - `GLOBAL_WINDOW`: a window function with an EMPTY partition spec
  *     — Spark moves every row to one partition; at any real size that
  *     is one executor sorting the world.
  *   - `GLOBAL_SORT`: a global Sort that is not the K-row tail of a
  *     TakeOrderedAndProject — a full-corpus range shuffle + sort. Fine
  *     for final small outputs, a hazard mid-pipeline. (Sorts under a
  *     limit plan as TakeOrderedAndProject and never surface here.)
  *   - `WIDE_SCAN`: a file scan reading 12+ columns — often a missing
  *     projection; harmless for narrow tables, so the threshold is
  *     generous and the finding is informational.
  *
  * Findings are returned, not thrown: the caller decides what is
  * acceptable (a 20-row dimension crossJoin is fine; the audit cannot
  * know cardinalities, only shapes). `audit` resolves the plan without
  * executing it; AQE wrapper and materialized query stages are
  * traversed. */
object PlanAudit {

  final case class Finding(kind: String, operator: String, detail: String)

  def audit(df: DataFrame): Seq[Finding] =
    auditPlan(df.queryExecution.executedPlan)

  /** Audit a STREAMING DataFrame BEFORE it is started (starting and
    * draining a stream just to lint it defeats the point of a static
    * gate). Batch-planning a streaming frame works for most shapes
    * (streaming sources become placeholder leaves) and reuses the full
    * physical audit; the stateful shapes batch planning rejects fall
    * back to a logical-plan lint for the loop-join findings — a join
    * with no equality conjunct between its sides is exactly what
    * Catalyst lowers to CartesianProduct / BroadcastNestedLoopJoin.
    * The fallback lints the ANALYZED plan — optimization also runs the
    * batch-unsupported check, analysis does not. */
  def auditStreaming(df: DataFrame): Seq[Finding] =
    try audit(df)
    catch {
      case _: org.apache.spark.sql.AnalysisException |
           _: UnsupportedOperationException |
           _: IllegalArgumentException =>
        auditLogicalLoops(df.queryExecution.analyzed)
    }

  /** Loop-join lint on a LOGICAL plan (the streaming fallback). */
  def auditLogicalLoops(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Seq[Finding] = {
    import org.apache.spark.sql.catalyst.plans.logical
    plan.collect {
      case j: logical.Join if !hasEquiConjunct(j) && !logicalBounded(j) =>
        Finding("NESTED_LOOP", j.nodeName,
          s"join (${j.joinType}) has no equality conjunct between the " +
            "sides — Catalyst lowers it to a CartesianProduct / " +
            "BroadcastNestedLoopJoin; add a join key or bin the range")
    }
  }

  private def hasEquiConjunct(
      j: org.apache.spark.sql.catalyst.plans.logical.Join): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    def split(e: Expression): Seq[Expression] = e match {
      case And(a, b) => split(a) ++ split(b)
      case other => Seq(other)
    }
    def acrossSides(l: Expression, r: Expression): Boolean = {
      val (lo, ro) = (j.left.outputSet, j.right.outputSet)
      (l.references.subsetOf(lo) && r.references.subsetOf(ro)) ||
        (l.references.subsetOf(ro) && r.references.subsetOf(lo))
    }
    j.condition.toSeq.flatMap(split).exists {
      case EqualTo(l, r) => acrossSides(l, r)
      case EqualNullSafe(l, r) => acrossSides(l, r)
      case _ => false
    }
  }

  /** Logical analog of the tiny-side exemption: a join is not a scale
    * hazard when either side provably emits at most a few rows. */
  private def logicalBounded(
      j: org.apache.spark.sql.catalyst.plans.logical.Join): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def bound(p: LogicalPlan): Option[Long] = p match {
      case a: Aggregate if a.groupingExpressions.isEmpty => Some(1L)
      case l: LocalRelation => Some(l.data.size.toLong)
      case g: GlobalLimit =>
        g.limitExpr match {
          case org.apache.spark.sql.catalyst.expressions
                .Literal(v: Int, _) => Some(v.toLong)
          case _ => None
        }
      case u: UnaryNode => bound(u.child)
      case _ => None
    }
    Seq(j.left, j.right).exists(s => bound(s).exists(_ <= 3))
  }

  def auditPlan(plan: SparkPlan): Seq[Finding] = {
    val nodes = flatten(plan)
    val findings = scala.collection.mutable.ArrayBuffer.empty[Finding]
    nodes.foreach {
      // two loop-join exemptions, both shape-provable:
      //   - one side is PROVABLY a-few-rows ([[staticBound]] <= 3: a
      //     grouping-less aggregate, a tiny limit/literal, or a cross
      //     of such — the broadcast-stats idiom, including the nested
      //     stats-cross-stats builds the LM queries plan): cost is
      //     linear, not quadratic;
      //   - BOTH sides are group tables (grouped aggregates, or joins
      //     of group tables with statically-bounded relations): the
      //     loop is G x G over group counts, not row counts — the
      //     sketch overlap-matrix / domain-grid idioms, where the
      //     all-pairs is over corpus SLICES and deliberately bounded.
      //     A row-level side (a scan, or anything row-multiplying) on
      //     either end still flags.
      case c: CartesianProductExec
          if !Seq(c.left, c.right).exists(singleRowBounded) &&
            !(groupTableBounded(c.left) && groupTableBounded(c.right)) =>
        findings += Finding("CARTESIAN", c.nodeName,
          "CartesianProduct visits |left| x |right| row pairs; add a " +
            "join key, or bin a range condition (RangeJoin / " +
            "IntervalJoinRewrite)")
      case b: BroadcastNestedLoopJoinExec
          if {
            val build = b.buildSide match {
              case BuildLeft => b.left
              case BuildRight => b.right
            }
            !singleRowBounded(build) &&
              !(groupTableBounded(b.left) && groupTableBounded(b.right))
          } =>
        findings += Finding("NESTED_LOOP", b.nodeName,
          s"BroadcastNestedLoopJoin (${b.joinType}) scans the streamed " +
            "side once per broadcast row batch with no hash lookup; " +
            "add an equality conjunct or bin the range")
      case w: WindowExec if w.partitionSpec.isEmpty =>
        findings += Finding("GLOBAL_WINDOW", w.nodeName,
          "window with no PARTITION BY moves every row to a single " +
            "partition; partition the window or use a global " +
            "aggregate/join instead")
      case s: SortExec if s.global =>
        findings += Finding("GLOBAL_SORT", s.nodeName,
          "global sort (full range shuffle + sort); fine as a final " +
            "small-output step, a hazard mid-pipeline — prefer " +
            "orderBy(...).limit(k) (TakeOrderedAndProject) or " +
            "repartitionByRange only where the order is consumed")
      case f: FileSourceScanExec if f.output.size >= 12 =>
        findings += Finding("WIDE_SCAN", f.nodeName,
          s"scan reads ${f.output.size} columns " +
            s"(${f.output.take(6).map(_.name).mkString(", ")}, ...); " +
            "check the projection actually needs them")
      case _ => ()
    }
    findings.toSeq
  }

  /** Static row-count ceiling of a subtree, when the plan itself
    * proves one: a grouping-less aggregate emits 1; limits/top-k emit
    * their literal k; a literal local relation emits its known size;
    * a loop join of two bounded sides emits at most the product (+2
    * slack for outer-join unmatched singletons); a union sums;
    * row-preserving unary nodes pass through. Row-MULTIPLYING nodes
    * (GenerateExec explode, ExpandExec grouping sets) void the bound.
    * None = unbounded as far as static shape can tell. Compositional,
    * so the nested stats-cross-stats build sides the library actually
    * plans (a BNLJ of two single-row aggregates under a broadcast)
    * prove out without special cases. */
  private def staticBound(p: SparkPlan): Option[Long] = p match {
    case h: HashAggregateExec if h.groupingExpressions.isEmpty => Some(1L)
    case s: SortAggregateExec if s.groupingExpressions.isEmpty => Some(1L)
    case o: ObjectHashAggregateExec if o.groupingExpressions.isEmpty =>
      Some(1L)
    case g: GlobalLimitExec => Some(g.limit.toLong)
    case t: TakeOrderedAndProjectExec => Some(t.limit.toLong)
    case c: CollectLimitExec => Some(c.limit.toLong)
    case l: LocalTableScanExec => Some(l.rows.size.toLong)
    case a: AdaptiveSparkPlanExec => staticBound(a.executedPlan)
    case q: QueryStageExec => staticBound(q.plan)
    case _: GenerateExec | _: ExpandExec => None
    case j: BroadcastNestedLoopJoinExec =>
      for (l <- staticBound(j.left); r <- staticBound(j.right))
        yield l * r + 2 // outer joins add unmatched singletons
    case j: CartesianProductExec =>
      for (l <- staticBound(j.left); r <- staticBound(j.right))
        yield l * r
    case u: UnionExec =>
      u.children.foldLeft(Option(0L)) { (acc, c) =>
        for (a <- acc; b <- staticBound(c)) yield a + b
      }
    case u: UnaryExecNode => staticBound(u.child)
    case _ => None
  }

  /** Provably at-most-a-few rows (grouping-less aggregates, possibly
    * crossed — the broadcast-stats idiom). */
  private def singleRowBounded(p: SparkPlan): Boolean =
    staticBound(p).exists(_ <= 3) // 1x1 loop joins carry the +2 slack

  /** True when the subtree provably emits one row PER GROUP of some
    * aggregation: a walk down row-preserving unary operators reaching
    * an aggregate (grouped or not). The walk refuses row-MULTIPLYING
    * nodes (GenerateExec / ExpandExec) above the aggregate, so "group
    * table" really means at-most-|groups| rows. Used to exempt loop
    * joins whose BOTH sides are group tables — a G x G pair enumeration
    * over slices, not a row-level quadratic. */
  private def groupTableBounded(p: SparkPlan): Boolean = p match {
    case _: HashAggregateExec | _: SortAggregateExec |
         _: ObjectHashAggregateExec => true
    case a: AdaptiveSparkPlanExec => groupTableBounded(a.executedPlan)
    case q: QueryStageExec => groupTableBounded(q.plan)
    case _: GenerateExec | _: ExpandExec => false
    // a JOIN of group-table-or-statically-bounded sides stays
    // group-table-scale (output <= product of two non-row-level
    // sides) — the domain-grid shape: literal domain list joined to
    // per-domain totals
    case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
      (groupTableBounded(j.left) || staticBound(j.left).isDefined) &&
        (groupTableBounded(j.right) || staticBound(j.right).isDefined)
    case u: UnaryExecNode => groupTableBounded(u.child)
    case _ => false
  }

  /** Depth-first operator list, descending through AQE wrappers,
    * materialized query stages, and reused subtrees. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedSubqueryExec => Seq(r.child)
      case other => other.children
    }
    p +: children.flatMap(flatten)
  }
}
