package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.shim
import org.apache.spark.sql.types._

/** Codegen'd vector arithmetic over embedding columns.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`) evaluate their
  * lambda ONCE PER ELEMENT through the interpreted expression tree — for
  * a 64-dim cosine inside a pair join that is ~200 interpreted calls per
  * candidate pair, and it dominated q_embed_pairs once the driver query
  * covered the full table. These expressions do the same arithmetic in
  * one tight JIT-compiled loop (the SimHash64 pattern: `compute` invoked
  * from `doGenCode`, so the hot path stays inside whole-stage codegen).
  *
  * Numerical contract (load-bearing for the DuckDB oracles): element
  * products/squares are computed in double and accumulated LEFT TO RIGHT,
  * exactly like the `aggregate(zip_with(...))` formulation they replace —
  * each accumulator is independent, so fusing the three passes into one
  * loop changes nothing bit-wise. Null/ragged semantics also match the
  * higher-order formulation: any null element, or a length mismatch
  * (zip_with's null padding), yields NULL.
  */
object VectorExprs {

  private[ops] def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Read element i as double; Double.NaN is a valid value so null is
    * signalled via the boxed return. */
  @inline private def get(arr: ArrayData, floats: Boolean, i: Int): Double =
    if (floats) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** cosine(a, b) = dot / (sqrt(dot_aa) * sqrt(dot_bb)), one pass. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_sim"

    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(left.dataType) && elemOk(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires array<float|double>, got " +
          s"${left.dataType} / ${right.dataType}")

    override def nullable: Boolean = true

    private lazy val lFloat = left.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false
    }
    private lazy val rFloat = right.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false
    }

    override def nullSafeEval(l: Any, r: Any): Any = compute(l, r)

    def compute(l: Any, r: Any): java.lang.Double = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (b.numElements() != n) return null
      var dot = 0.0; var sa = 0.0; var sb = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = get(a, lFloat, i)
        val y = get(b, rFloat, i)
        dot += x * y; sa += x * x; sb += y * y
        i += 1
      }
      java.lang.Double.valueOf(dot / (math.sqrt(sa) * math.sqrt(sb)))
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("cosineSim", this)
      nullSafeCodeGen(ctx, ev, (l, r) => s"""
        |java.lang.Double ${ev.value}_v = $ref.compute($l, $r);
        |if (${ev.value}_v == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = ${ev.value}_v.doubleValue(); }
        |""".stripMargin)
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** Plain dot product of two vector columns (norms: `Dot(v, v)`). */
  case class Dot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(left.dataType) && elemOk(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<float|double>, got " +
          s"${left.dataType} / ${right.dataType}")

    override def nullable: Boolean = true

    private lazy val lFloat = left.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false
    }
    private lazy val rFloat = right.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false
    }

    override def nullSafeEval(l: Any, r: Any): Any = compute(l, r)

    def compute(l: Any, r: Any): java.lang.Double = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (b.numElements() != n) return null
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        dot += get(a, lFloat, i) * get(b, rFloat, i)
        i += 1
      }
      java.lang.Double.valueOf(dot)
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("vecDot", this)
      nullSafeCodeGen(ctx, ev, (l, r) => s"""
        |java.lang.Double ${ev.value}_v = $ref.compute($l, $r);
        |if (${ev.value}_v == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = ${ev.value}_v.doubleValue(); }
        |""".stripMargin)
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** Dot product against a CONSTANT weight vector (hyperplanes, k-means
    * centroids): the weights ride the expression (broadcast with the
    * plan), so per-row work is one loop with zero literal-array
    * materialization. Length mismatch -> NULL, like zip_with padding. */
  case class DotConst(child: Expression, weights: IndexedSeq[Double])
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot_const"

    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"vec_dot_const requires array<float|double>, got ${child.dataType}")

    override def nullable: Boolean = true

    private lazy val cFloat = child.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false
    }
    private val w: Array[Double] = weights.toArray

    override def nullSafeEval(input: Any): Any = compute(input)

    def compute(input: Any): java.lang.Double = {
      val a = input.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != w.length) return null
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return null
        dot += get(a, cFloat, i) * w(i)
        i += 1
      }
      java.lang.Double.valueOf(dot)
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("vecDotConst", this)
      nullSafeCodeGen(ctx, ev, c => s"""
        |java.lang.Double ${ev.value}_v = $ref.compute($c);
        |if (${ev.value}_v == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = ${ev.value}_v.doubleValue(); }
        |""".stripMargin)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def cosine(a: Column, b: Column): Column =
    shim.column(CosineSim(shim.expression(a), shim.expression(b)))

  def dot(a: Column, b: Column): Column =
    shim.column(Dot(shim.expression(a), shim.expression(b)))

  def dotConst(a: Column, weights: Array[Double]): Column =
    shim.column(DotConst(shim.expression(a), weights.toIndexedSeq))
}
