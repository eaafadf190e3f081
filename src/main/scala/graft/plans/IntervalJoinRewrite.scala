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

  /** Cap on bins per interval: an interval spanning more than this many
    * bins (width chosen far too small, or a corrupt bound like
    * e = Long.MaxValue) would make `Sequence` build a huge array and
    * fail at runtime — turning a slow-but-working naive join into a
    * crashing one. Intervals over the cap are routed through a retained
    * naive-predicate join branch instead (exactly-once preserved: the
    * two branches partition the interval set). When that branch is
    * empty at runtime — the healthy case — AQE's empty-relation
    * propagation collapses it after the broadcast stage materializes. */
  val maxBinsConf = "spark.graft.intervalJoin.maxBins"
  val defaultMaxBins = 1L << 16

  private def longConf(key: String, raw: String): Option[Long] =
    scala.util.Try(raw.trim.toLong).toOption.filter(_ > 0).orElse {
      logWarning(s"$key='$raw' is not a positive long; " +
        "interval-join rewrite skipped for this query")
      None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val widthStr = conf.getConfString(binWidthConf, "")
    if (widthStr.isEmpty) plan
    else longConf(binWidthConf, widthStr) match {
      case None => plan
      case Some(width) =>
        val maxBinsStr = conf.getConfString(maxBinsConf, "")
        val maxBins =
          if (maxBinsStr.isEmpty) defaultMaxBins
          else longConf(maxBinsConf, maxBinsStr).getOrElse(defaultMaxBins)
        plan.transformUp {
          case j @ Join(_, _, Inner, Some(_), _) if j.resolved =>
            rewrite(j, width, maxBins).getOrElse(j)
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

  private def rewrite(j: Join, width: Long,
                      maxBins: Long): Option[LogicalPlan] = {
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
      // bin fan-out guard: intervals spanning more than maxBins bins go
      // through the naive branch below instead of a huge Sequence array
      // (span < 0 catches a wrapped subtraction on corrupt extremes)
      val span = Subtract(new IntegralDivide(e, w), new IntegralDivide(s, w))
      val spanOk = And(GreaterThanOrEqual(span, Literal(0L)),
        LessThanOrEqual(span, Literal(maxBins)))
      val bounded = Filter(spanOk, satisfiable)
      val binAttr = AttributeReference("__graft_bin_i", LongType,
        nullable = false)()
      val gen = Generate(
        // Sequence is TimeZoneAwareExpression — without an explicit
        // zone it stays unresolved and fails plan validation, even for
        // a pure-long sequence where the zone is semantically inert
        Explode(Sequence(new IntegralDivide(s, w), new IntegralDivide(e, w),
          Some(Literal(1L)), Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(binAttr), child = bounded)
      val newCond = And(cond, EqualTo(pBin.toAttribute, binAttr))
      val newJoin =
        if (pointIsLeft) Join(pointProj, gen, Inner, Some(newCond), hint)
        else Join(gen, pointProj, Inner, Some(newCond), hint)
      // over-cap intervals keep the naive predicate, but on a synthetic
      // constant equi-key (p-p = s-s: 0 on both sides, null exactly when
      // the range predicate could not match anyway) so the branch plans
      // as a parallel hash join rather than a nested loop, and the
      // cross-side equality stops this rule re-firing on it. p-p / s-s
      // are non-foldable (attribute-bearing), so constant folding cannot
      // collapse the key back into a conditionless cross join. Expected
      // EMPTY in healthy data — AQE's empty-relation propagation then
      // collapses the whole branch after its first stage materializes.
      val overCap = Filter(Not(spanOk), satisfiable)
      val kP = Alias(Subtract(p, p), "__graft_k_p")()
      val kI = Alias(Subtract(s, s), "__graft_k_i")()
      val pointK = Project(pointSide.output :+ kP, pointSide)
      val overCapK = Project(overCap.output :+ kI, overCap)
      val fallbackCond = And(cond, EqualTo(kP.toAttribute, kI.toAttribute))
      val fallbackJoin =
        if (pointIsLeft) Join(pointK, overCapK, Inner, Some(fallbackCond), hint)
        else Join(overCapK, pointK, Inner, Some(fallbackCond), hint)
      // an optimizer rule must preserve the output schema exactly —
      // project the synthetic bin/key columns back out; both branches
      // project j.output, so the Union's output keeps j's exprIds
      Union(Seq(Project(j.output, newJoin), Project(j.output, fallbackJoin)))
    }
  }
}
