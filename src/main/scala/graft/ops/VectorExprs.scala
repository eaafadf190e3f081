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


  /** Dot of the input vector against EVERY row of a constant matrix:
    * null score for a row on null input, null element, or dimension
    * mismatch — the same per-centroid result `DotConst` would give.
    * Shared by the three matrix expressions below. */
  private def scoreAll(input: Any, cFloat: Boolean,
                       m: Array[Array[Double]]): Array[java.lang.Double] = {
    val a = if (input == null) null else input.asInstanceOf[ArrayData]
    val out = new Array[java.lang.Double](m.length)
    var c = 0
    while (c < m.length) {
      val w = m(c)
      if (a != null && a.numElements() == w.length) {
        var dot = 0.0
        var i = 0
        var ok = true
        while (ok && i < w.length) {
          if (a.isNullAt(i)) ok = false
          else { dot += get(a, cFloat, i) * w(i); i += 1 }
        }
        if (ok) out(c) = java.lang.Double.valueOf(dot)
      }
      c += 1
    }
    out
  }

  /** `Double.compare` with null ordered below every non-null — the
    * ordering Catalyst's struct comparison gives a nullable double
    * field, which is what the literal `greatest(struct(dot, cid))` /
    * `sort_array(struct(-dot, cid))` formulations rank by. */
  private def cmpScore(x: java.lang.Double, y: java.lang.Double): Int =
    if (x == null && y == null) 0
    else if (x == null) -1
    else if (y == null) 1
    else java.lang.Double.compare(x.doubleValue(), y.doubleValue())

  /** Argmax-by-dot-product over a CONSTANT centroid matrix: returns the
    * row index (cid) whose dot product with the input vector is
    * greatest. The whole matrix rides the expression as one reference
    * object and the per-row work is a single `K x dim` JIT loop — this
    * is what lifts [[graft.ops.Similarity.assignCentroid]]'s 64-cell
    * literal ceiling: `greatest(struct(dot, cid), ...)` materializes K
    * child expressions in generated code (quadratic plan compile, then
    * codegen fallback), where this stays O(1) plan-size at any K.
    *
    * Exact semantic parity with the `greatest(struct(score, cid))`
    * formulation, including its edges (spec-pinned):
    *   - scores compare with `Double.compare` (NaN greatest, -0.0 < 0.0),
    *     ties take the HIGHER cid — struct ordering resolved ties on the
    *     ascending cid field under `greatest`'s max;
    *   - a null score (null input array, null element, or dimension
    *     mismatch) orders below every non-null score — struct ordering
    *     put null fields first — so an all-null row yields cid K-1,
    *     NOT null, exactly like `greatest` over structs with null
    *     score fields. Hence `nullable = false`. */
  case class ArgMaxDot(child: Expression, centroids: IndexedSeq[IndexedSeq[Double]])
      extends UnaryExpression {
    require(centroids.nonEmpty, "arg_max_dot needs at least one centroid")
    override def dataType: DataType = IntegerType
    override def prettyName: String = "arg_max_dot"
    override def nullable: Boolean = false

    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"arg_max_dot requires array<float|double>, got ${child.dataType}")

    private lazy val cFloat = child.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false
    }
    private val m: Array[Array[Double]] = centroids.map(_.toArray).toArray

    // handles the null-input row itself (returns K-1, see scaladoc), so
    // eval bypasses UnaryExpression's null short-circuit
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      compute(child.eval(input))

    def compute(input: Any): Int = {
      val s = scoreAll(input, cFloat, m)
      var best = 0
      var c = 1
      while (c < s.length) {
        if (cmpScore(s(c), s(best)) >= 0) best = c
        c += 1
      }
      best
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val ref = ctx.addReferenceObj("argMaxDot", this)
      val childGen = child.genCode(ctx)
      ev.copy(
        code = code"${childGen.code}" +
          code"int ${ev.value} = $ref.compute(${childGen.isNull} ? null : ${childGen.value});",
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** The winning SCORE of [[ArgMaxDot]]'s argmax — what
    * `greatest(struct(dot, cid)).getField("score")` returns, including
    * the null edge (all scores null -> null). Callers needing both cid
    * and score past the literal ceiling pair this with [[ArgMaxDot]];
    * two K x dim loops, still O(1) plan-size. */
  case class MaxDot(child: Expression, centroids: IndexedSeq[IndexedSeq[Double]])
      extends UnaryExpression {
    require(centroids.nonEmpty, "max_dot needs at least one centroid")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "max_dot"
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"max_dot requires array<float|double>, got ${child.dataType}")

    private lazy val cFloat = child.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false
    }
    private val m: Array[Array[Double]] = centroids.map(_.toArray).toArray

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      compute(child.eval(input))

    def compute(input: Any): java.lang.Double = {
      val s = scoreAll(input, cFloat, m)
      var best = 0
      var c = 1
      while (c < s.length) {
        if (cmpScore(s(c), s(best)) >= 0) best = c
        c += 1
      }
      s(best)
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val ref = ctx.addReferenceObj("maxDot", this)
      val childGen = child.genCode(ctx)
      ev.copy(code = code"${childGen.code}" + code"""
        java.lang.Double ${ev.value}_v = $ref.compute(${childGen.isNull} ? null : ${childGen.value});
        boolean ${ev.isNull} = ${ev.value}_v == null;
        double ${ev.value} = ${ev.isNull} ? 0.0 : ${ev.value}_v.doubleValue();""")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** The `n` nearest centroid ids of a constant matrix, ordered exactly
    * like `slice(sort_array(array(struct(-dot, cid), ...)), 1, n)`:
    * ascending by (negated score, cid) with null scores first — the
    * [[graft.ops.Similarity.ivfTopKBatch]] probe rule, freed of its
    * K-term literal array (same ceiling as [[ArgMaxDot]]'s). Returns
    * `array<int>` of length `min(n, K)`; never null. */
  case class TopNDotCids(child: Expression,
                         centroids: IndexedSeq[IndexedSeq[Double]], n: Int)
      extends UnaryExpression {
    require(centroids.nonEmpty, "top_n_dot_cids needs at least one centroid")
    require(n > 0, "top_n_dot_cids needs n > 0")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "top_n_dot_cids"
    override def nullable: Boolean = false

    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"top_n_dot_cids requires array<float|double>, got ${child.dataType}")

    private lazy val cFloat = child.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false
    }
    private val m: Array[Array[Double]] = centroids.map(_.toArray).toArray

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      compute(child.eval(input))

    def compute(input: Any): ArrayData = {
      val s = scoreAll(input, cFloat, m)
      // ascending (ns = -score, cid) with null ns FIRST — the negation
      // is applied BEFORE Double.compare, exactly like the literal
      // struct(-dot, cid): under the double total order that flips NaN
      // to the front and keeps the +-0.0 distinction the struct sort had
      val cids = Array.range(0, s.length)
      val sorted = cids.sortWith { (i, j) =>
        val si = s(i); val sj = s(j)
        if (si == null || sj == null) {
          if (si == null && sj == null) i < j else si == null
        } else {
          val c = java.lang.Double.compare(-si.doubleValue(), -sj.doubleValue())
          if (c != 0) c < 0 else i < j
        }
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        java.util.Arrays.copyOfRange(sorted, 0, math.min(n, sorted.length))
          .asInstanceOf[Array[Int]].map(Int.box))
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val ref = ctx.addReferenceObj("topNDotCids", this)
      val childGen = child.genCode(ctx)
      ev.copy(
        code = code"${childGen.code}" +
          code"org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $ref.compute(${childGen.isNull} ? null : ${childGen.value});",
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
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

  def argMaxDot(a: Column, centroids: Array[Array[Double]]): Column =
    shim.column(ArgMaxDot(shim.expression(a),
      centroids.map(_.toIndexedSeq).toIndexedSeq))

  def maxDot(a: Column, centroids: Array[Array[Double]]): Column =
    shim.column(MaxDot(shim.expression(a),
      centroids.map(_.toIndexedSeq).toIndexedSeq))

  def topNDotCids(a: Column, centroids: Array[Array[Double]], n: Int): Column =
    shim.column(TopNDotCids(shim.expression(a),
      centroids.map(_.toIndexedSeq).toIndexedSeq, n))
}
