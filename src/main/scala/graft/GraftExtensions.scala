package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.core.PsetHashExpression
import graft.ops.{PerceptualHash64, SimHash64, VectorExprs,
  WinnowFingerprint, WordShingles}

/** SQL registration of the engine's custom Catalyst expressions, so every
  * operator is usable from `spark.sql(...)` as well as the Scala API:
  *
  *   pset_hash(struct(...))            canonical pset hash (SURVEY §2.9)
  *   word_shingles(text, n)            distinct word n-grams
  *   simhash64(tokens)                 64-bit SimHash fingerprint
  *   winnow_fingerprint(text, k, w)    winnowing rolling-hash fingerprint
  *   cosine_sim(a, b)                  one-pass cosine over vector arrays
  *   vec_dot(a, b)                     dot product over vector arrays
  *   perceptual_hash64(payload)        byte-bigram histogram phash
  *
  * Two entry points: `--conf spark.sql.extensions=graft.GraftExtensions`
  * at session build time (the standard extension mechanism), or
  * `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // opt-in non-equi interval-join rewrite (fires only when
    // spark.graft.intervalJoin.binWidth is set — see the rule's doc)
    e.injectOptimizerRule(_ => graft.plans.IntervalJoinRewrite)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private[graft] val functions: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("pset_hash",
      new ExpressionInfo(classOf[PsetHashExpression].getName, "pset_hash"),
      (args: Seq[Expression]) => PsetHashExpression(args.head)),
    ("word_shingles",
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) =>
        WordShingles(args.head, intArg(args(1), "shingle size n"))),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    ("winnow_fingerprint",
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "winnow_fingerprint"),
      (args: Seq[Expression]) => WinnowFingerprint(args.head,
        if (args.length > 1) intArg(args(1), "k") else 8,
        if (args.length > 2) intArg(args(2), "w") else 4)),
    ("cosine_sim",
      new ExpressionInfo(classOf[VectorExprs.CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => VectorExprs.CosineSim(args(0), args(1))),
    ("vec_dot",
      new ExpressionInfo(classOf[VectorExprs.Dot].getName, "vec_dot"),
      (args: Seq[Expression]) => VectorExprs.Dot(args(0), args(1))),
    ("perceptual_hash64",
      new ExpressionInfo(classOf[PerceptualHash64].getName,
        "perceptual_hash64"),
      (args: Seq[Expression]) => PerceptualHash64(args.head)))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
