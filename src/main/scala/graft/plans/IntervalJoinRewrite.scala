package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite non-equi point-in-interval joins
  * into [[graft.ops.RangeJoin]]'s binned equi-join shape — the whole
  * point of the declarative API is that users write the natural
  * condition
  *
  *   points.join(intervals, $"t" >= $"s" && $"t" <= $"e")
  *
  * and at 100 TB that plans as a BroadcastNestedLoopJoin (or a
  * cartesian): O(|points| x |intervals|) comparisons regardless of how
  * selective the range is. With this rule active and
  * `spark.graft.intervalJoin.binWidth` set (opt-in — the width must be
  * chosen near the typical interval length, a data property the
  * optimizer cannot know; see the sizing rule on
  * [[graft.ops.RangeJoin.intervalJoin]]), the same query plans as:
  *
  *   points + __bin(t div W)   JOIN ON __bin   intervals exploded into
  *                                             their covered bins
  *
  * — one equi-join keyed on the bin, shuffle-partitionable and
  * AQE-balanceable, with the ORIGINAL range predicate retained so the
  * answer is exactly the naive join's. Each matching pair surfaces in
  * exactly one bin (the point's), so no dedup pass is needed.
  *
  * Safety envelope — the rule fires only when ALL hold, else the plan
  * is untouched:
  *   - inner join whose condition has NO cross-side equality conjunct
  *     (with one, Spark already plans a hash join; rebinning could only
  *     add explode fan-out);
  *   - some long-typed point ATTRIBUTE `p` of one side has both a
  *     lower and an upper bound conjunct against deterministic
  *     long-typed expressions whose references live entirely in the
  *     other side (strict bounds qualify: the bin hull of the closed
  *     bounds covers them, the retained predicate keeps exactness);
  *   - the output schema is preserved by re-projecting the original
  *     join output over the rewritten join.
  *
  * Unsatisfiable intervals (`e < s`) are filtered before the explode —
  * they cannot match the range predicate, and Spark's `sequence` would
  * otherwise step BACKWARD through them, exploding spurious bins. Null
  * points/bounds fall out of the equi-join/filter exactly as they fail
  * a BETWEEN. The rewritten join carries an equality conjunct, so the
  * rule cannot re-fire on its own output.
  *
  * Registered by [[graft.GraftExtensions]] (`injectOptimizerRule`) or
  * per-session via
  * `spark.experimental.extraOptimizations = Seq(IntervalJoinRewrite)`.
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val binWidthConf = "spark.graft.intervalJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val widthStr = conf.getConfString(binWidthConf, "")
    if (widthStr.isEmpty) plan
    else {
      val width = widthStr.toLong
      require(width > 0, s"$binWidthConf must be positive, got $width")
      plan.transformUp {
        case j @ Join(_, _, Inner, Some(_), _) if j.resolved =>
          rewrite(j, width).getOrElse(j)
      }
    }
  }

  private def sideOf(e: Expression, left: LogicalPlan,
                     right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  private def rewrite(j: Join, width: Long): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), hint) = j
    val conjuncts = splitConjunctivePredicates(cond)
    def cross(a: Expression, b: Expression): Boolean =
      (for (sa <- sideOf(a, left, right); sb <- sideOf(b, left, right))
        yield sa != sb).getOrElse(false)
    val crossEqui = conjuncts.exists {
      case EqualTo(a, b) => cross(a, b)
      case EqualNullSafe(a, b) => cross(a, b)
      case _ => false
    }
    if (crossEqui) return None

    def asBound(p: Expression, b: Expression)
        : Option[(Attribute, Boolean, Expression)] = p match {
      case a: Attribute if a.dataType == LongType =>
        for {
          pSide <- sideOf(a, left, right)
          bSide <- sideOf(b, left, right)
          if pSide != bSide && b.dataType == LongType && b.deterministic
        } yield (a, pSide, b)
      case _ => None
    }
    val lowers = conjuncts.flatMap {
      case GreaterThanOrEqual(p, s) => asBound(p, s)
      case GreaterThan(p, s) => asBound(p, s)
      case LessThanOrEqual(s, p) => asBound(p, s)
      case LessThan(s, p) => asBound(p, s)
      case _ => None
    }
    val uppers = conjuncts.flatMap {
      case LessThanOrEqual(p, e) => asBound(p, e)
      case LessThan(p, e) => asBound(p, e)
      case GreaterThanOrEqual(e, p) => asBound(p, e)
      case GreaterThan(e, p) => asBound(p, e)
      case _ => None
    }
    val candidate = lowers.flatMap { case (p, pIsLeft, s) =>
      uppers.collectFirst {
        case (p2, _, e) if p2.semanticEquals(p) => (p, pIsLeft, s, e)
      }
    }.headOption

    candidate.map { case (p, pointIsLeft, s, e) =>
      val w = Literal(width)
      val (pointSide, intervalSide) =
        if (pointIsLeft) (left, right) else (right, left)
      val pBin = Alias(new IntegralDivide(p, w), "__graft_bin_p")()
      val pointProj = Project(pointSide.output :+ pBin, pointSide)
      val satisfiable = Filter(GreaterThanOrEqual(e, s), intervalSide)
      val binAttr = AttributeReference("__graft_bin_i", LongType,
        nullable = false)()
      val gen = Generate(
        // Sequence is TimeZoneAwareExpression — without an explicit
        // zone it stays unresolved and fails plan validation, even for
        // a pure-long sequence where the zone is semantically inert
        Explode(Sequence(new IntegralDivide(s, w), new IntegralDivide(e, w),
          Some(Literal(1L)), Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(binAttr), child = satisfiable)
      val newCond = And(cond, EqualTo(pBin.toAttribute, binAttr))
      val newJoin =
        if (pointIsLeft) Join(pointProj, gen, Inner, Some(newCond), hint)
        else Join(gen, pointProj, Inner, Some(newCond), hint)
      // an optimizer rule must preserve the output schema exactly —
      // project the synthetic bin columns back out
      Project(j.output, newJoin)
    }
  }
}
