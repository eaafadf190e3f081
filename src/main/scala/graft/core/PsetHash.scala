package graft.core

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.functions.struct
import org.apache.spark.sql.graftshim.shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Canonical, reproducible pset hash.
  *
  * The reference hashes the pset-kind subset of each parameter dict with
  * `joblib.hash(..., hash_name="sha1")` (ref psweep.py:188-270) and golden-
  * pins the resulting hex strings (ref tests/test_all.py:619-704). joblib's
  * pickle-based encoding is not reproducible from the JVM, so this engine
  * defines its own canonical encoding with the same *properties*:
  *
  *   - deterministic across sessions/machines/JVMs,
  *   - key-order independent (map/struct keys sorted before encoding),
  *   - type-sensitive (an i64 `1` and an f64 `1.0` hash differently),
  *   - insensitive to Spark integer/float width (all ints encode as i64,
  *     all floats as f64 — matching the SURVEY §1.2 type collapse),
  *   - NA-aware (SQL null has its own tag),
  *   - prefix/postfix column exclusion (ref tests/test_all.py:658-676),
  *   - recomputable from stored rows: the driver-side twin
  *     ([[PsetHash.hash]]) and the Catalyst expression ([[PsetHash.expr]])
  *     produce identical digests for equal logical values.
  *
  * Encoding grammar (UTF-8 bytes fed to SHA-1, hex lowercase digest):
  * {{{
  *   null       -> "z"
  *   boolean    -> "b1" | "b0"
  *   integral   -> "i" + base-10 long
  *   float      -> "f" + doubleToLongBits (canonical NaN; -0.0 -> 0.0)
  *   string     -> "s" + utf8ByteLen + ":" + bytes
  *   binary     -> "x" + byteLen + ":" + bytes
  *   timestamp  -> "t" + epoch micros          (UTC)
  *   date       -> "D" + epoch days
  *   decimal    -> "c" + plain string of normalized value
  *   array      -> "a[" enc "," enc ... "]"
  *   map/struct -> "d{" k enc "=" v enc "," ... "}"   (sorted by key name)
  * }}}
  */
object PsetHash {

  /** Hash of a driver-side pset (`Map[String, Any]`). Prefix/postfix keys
    * are excluded unless the skip flags are disabled
    * (ref psweep.py:208-270). */
  def hash(pset: Map[String, Any], skipPrefix: Boolean = true,
           skipPostfix: Boolean = true): String = {
    val keep = ColKind.hashedCols(pset.keys.toSeq, skipPrefix, skipPostfix)
    val sb = new StringBuilder
    encodeAny(sb, keep.sorted.map(k => k -> pset(k)).toMap)
    sha1Hex(sb.toString)
  }

  /** The pinned hash of the empty pset (analog of manual.md:569-570). */
  lazy val emptyHash: String = hash(Map.empty)

  /** Column form: hash of the pset-kind subset of the given columns.
    * Usage: `df.withColumn("_pset_hash", PsetHash.expr(df.columns))`. */
  def expr(cols: Seq[String], skipPrefix: Boolean = true,
           skipPostfix: Boolean = true): Column = {
    val keep = ColKind.hashedCols(cols, skipPrefix, skipPostfix).sorted
    val st =
      if (keep.isEmpty) struct()
      else struct(keep.map(org.apache.spark.sql.functions.col): _*)
    shim.column(PsetHashExpression(shim.expression(st)))
  }

  private[core] def sha1Hex(s: String): String = {
    val d = MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  /** Driver-side canonical encoder over plain Scala/Java values. Must stay
    * in lock-step with [[PsetHashExpression.encode]] over Catalyst values. */
  private[core] def encodeAny(sb: StringBuilder, v: Any): Unit = v match {
    case null => sb.append('z')
    case None => sb.append('z')
    case b: Boolean => sb.append(if (b) "b1" else "b0")
    case i: Byte => sb.append('i').append(i.toLong)
    case i: Short => sb.append('i').append(i.toLong)
    case i: Int => sb.append('i').append(i.toLong)
    case i: Long => sb.append('i').append(i)
    case f: Float => encodeDouble(sb, f.toDouble)
    case f: Double => encodeDouble(sb, f)
    case d: java.math.BigDecimal =>
      sb.append('c').append(d.stripTrailingZeros.toPlainString)
    case d: BigDecimal =>
      sb.append('c').append(d.underlying.stripTrailingZeros.toPlainString)
    case s: String => encodeString(sb, s)
    case b: Array[Byte] =>
      sb.append('x').append(b.length).append(':')
      b.foreach(x => sb.append(f"$x%02x"))
    case t: java.sql.Timestamp =>
      sb.append('t').append(t.getTime * 1000L + (t.getNanos / 1000) % 1000)
    case t: java.time.Instant =>
      sb.append('t').append(t.getEpochSecond * 1000000L + t.getNano / 1000)
    case d: java.sql.Date => sb.append('D').append(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => sb.append('D').append(d.toEpochDay)
    case m: scala.collection.Map[_, _] =>
      sb.append("d{")
      val entries = m.toSeq.map { case (k, vv) => (k.toString, vv) }
        .sortBy(_._1)
      var first = true
      entries.foreach { case (k, vv) =>
        if (!first) sb.append(','); first = false
        encodeString(sb, k); sb.append('=')
        encodeAny(sb, vv)
      }
      sb.append('}')
    case a: Iterable[_] =>
      sb.append("a[")
      var first = true
      a.foreach { e =>
        if (!first) sb.append(','); first = false
        encodeAny(sb, e)
      }
      sb.append(']')
    case a: Array[_] => encodeAny(sb, a.toSeq)
    case c: Complex =>
      // same bytes as the normalized struct cell: d{ im=…, re=… }
      encodeAny(sb, Map("re" -> c.re, "im" -> c.im))
    case d: Dyn =>
      // same bytes as the normalized struct cell: d{ json=…, tag=… }
      encodeAny(sb, Map("json" -> d.json, "tag" -> d.tag))
    case p: Product if p.getClass.getName.startsWith("scala.Tuple") =>
      encodeAny(sb, p.productIterator.toSeq)
    case r: org.apache.spark.sql.Row =>
      val names = r.schema.fieldNames
      encodeAny(sb, names.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap)
    case other =>
      throw new IllegalArgumentException(
        s"unhashable pset value of type ${other.getClass.getName}: $other " +
          "(supported: null, boolean, integral, float, string, binary, " +
          "timestamp, date, decimal, seq, map, Row)")
  }

  private[core] def encodeDouble(sb: StringBuilder, d: Double): Unit = {
    val norm = if (d == 0.0d) 0.0d else d // -0.0 -> 0.0
    sb.append('f').append(java.lang.Double.doubleToLongBits(norm))
  }

  private[core] def encodeString(sb: StringBuilder, s: String): Unit = {
    val n = s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    sb.append('s').append(n).append(':').append(s)
  }
}

/** Deterministic Catalyst expression computing the canonical pset hash of a
  * struct value. Name filtering (prefix/postfix exclusion) happens in
  * [[PsetHash.expr]] when the input struct is built; this expression hashes
  * every field it is given. Codegen emits a reference-object call (not
  * CodegenFallback, which would disqualify the containing stage from
  * whole-stage codegen).
  */
case class PsetHashExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pset_hash"

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): UTF8String = {
    val sb = new StringBuilder
    encode(sb, input, child.dataType)
    UTF8String.fromString(PsetHash.sha1Hex(sb.toString))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("psetHash", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  /** Catalyst-value twin of [[PsetHash.encodeAny]]. */
  private def encode(sb: StringBuilder, v: Any, dt: DataType): Unit = {
    if (v == null) { sb.append('z'); return }
    dt match {
      case BooleanType => sb.append(if (v.asInstanceOf[Boolean]) "b1" else "b0")
      case ByteType => sb.append('i').append(v.asInstanceOf[Byte].toLong)
      case ShortType => sb.append('i').append(v.asInstanceOf[Short].toLong)
      case IntegerType => sb.append('i').append(v.asInstanceOf[Int].toLong)
      case LongType => sb.append('i').append(v.asInstanceOf[Long])
      case FloatType => PsetHash.encodeDouble(sb, v.asInstanceOf[Float].toDouble)
      case DoubleType => PsetHash.encodeDouble(sb, v.asInstanceOf[Double])
      case _: DecimalType =>
        sb.append('c').append(
          v.asInstanceOf[org.apache.spark.sql.types.Decimal]
            .toJavaBigDecimal.stripTrailingZeros.toPlainString)
      case StringType => PsetHash.encodeString(sb, v.toString)
      case BinaryType =>
        val b = v.asInstanceOf[Array[Byte]]
        sb.append('x').append(b.length).append(':')
        b.foreach(x => sb.append(f"$x%02x"))
      case TimestampType => sb.append('t').append(v.asInstanceOf[Long])
      case TimestampNTZType => sb.append('t').append(v.asInstanceOf[Long])
      case DateType => sb.append('D').append(v.asInstanceOf[Int].toLong)
      case ArrayType(et, _) =>
        val a = v.asInstanceOf[ArrayData]
        sb.append("a[")
        var i = 0
        while (i < a.numElements()) {
          if (i > 0) sb.append(',')
          encode(sb, a.get(i, et), et)
          i += 1
        }
        sb.append(']')
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[MapData]
        val ks = m.keyArray(); val vs = m.valueArray()
        val entries = (0 until m.numElements()).map { i =>
          (ks.get(i, kt).toString, vs.get(i, vt))
        }.sortBy(_._1)
        sb.append("d{")
        var first = true
        entries.foreach { case (k, vv) =>
          if (!first) sb.append(','); first = false
          PsetHash.encodeString(sb, k); sb.append('=')
          encode(sb, vv, vt)
        }
        sb.append('}')
      case st: StructType =>
        val r = v.asInstanceOf[InternalRow]
        val entries = st.fields.zipWithIndex
          .map { case (f, i) => (f.name, i, f.dataType) }.sortBy(_._1)
        sb.append("d{")
        var first = true
        entries.foreach { case (name, i, fdt) =>
          if (!first) sb.append(','); first = false
          PsetHash.encodeString(sb, name); sb.append('=')
          encode(sb, if (r.isNullAt(i)) null else r.get(i, fdt), fdt)
        }
        sb.append('}')
      case other =>
        throw new IllegalArgumentException(s"unhashable Spark type: $other")
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
