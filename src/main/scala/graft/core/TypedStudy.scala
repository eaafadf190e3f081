package graft.core

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Dataset, Encoder, Encoders, Row}

/** Typed façade over [[Study]]: sweeps with case-class params and results,
  * so field names and types are compile-checked instead of stringly-typed
  * maps — `Dataset[T]` ergonomics on top of the dynamic-schema engine
  * (which remains the source of truth: the database itself must stay
  * untyped because its schema grows over time, SURVEY §1.3).
  *
  * {{{
  * case class P(a: Long, b: String)
  * case class R(result_ : Double)
  * val out = TypedStudy(spark, calcDir).run[P, R](
  *   p => R(p.a * 10.0), Seq(P(1, "x"), P(2, "y")))
  * val typedView: Dataset[P] = out.paramsAs[P]
  * }}}
  */
final class TypedStudy(val study: Study) {

  /** Run a typed sweep: params and results are case classes; fields map to
    * columns by name (result fields should follow the `postfix_`
    * convention to be recognized as results). */
  def run[P <: Product : TypeTag, R <: Product : TypeTag](
      func: P => R, params: Seq[P]): RunOutput = {
    val pEnc = Encoders.product[P]
    val pNames = pEnc.schema.fieldNames.toSeq
    val toMap: P => Map[String, Any] = p =>
      pNames.zip(p.productIterator.toSeq).toMap
    val rNames = Encoders.product[R].schema.fieldNames.toSeq
    // rebuild P inside the task from the normalized map via the case
    // class's constructor (java.lang.reflect.Constructor is not
    // serializable, so it is looked up task-side; the lookup is cheap
    // relative to any real user function)
    val pClass = pEnc.clsTag.runtimeClass
    val untypedFunc: Map[String, Any] => Map[String, Any] = { m =>
      // the primary constructor is the (unique) one whose arity matches
      // the encoder's field list — getConstructors.head is unordered
      val ctor = pClass.getConstructors
        .find(_.getParameterCount == pNames.length)
        .getOrElse(throw new IllegalArgumentException(
          s"${pClass.getName}: no ${pNames.length}-arg constructor"))
      // engine normalization widens numerics to Long/Double; narrow each
      // value back to the declared parameter type so Int/Float/Short
      // fields reconstruct instead of throwing argument-type-mismatch
      val args = pNames.zip(ctor.getParameterTypes.toSeq)
        .map { case (n, t) => TypedStudy.coerce(m(n), t) }.toArray
      val p = ctor.newInstance(args: _*).asInstanceOf[P]
      val r = func(p)
      rNames.zip(r.productIterator.toSeq).toMap
    }
    study.run(untypedFunc, params.map(toMap))
  }

  def database: Database = study.database
}

object TypedStudy {

  /** Narrow an engine-normalized value (Long/Double/…) to the declared
    * constructor parameter type; non-numeric values pass through. */
  private[core] def coerce(v: Any, t: Class[_]): AnyRef = v match {
    case n: java.lang.Number =>
      if (t == java.lang.Integer.TYPE || t == classOf[java.lang.Integer])
        Int.box(n.intValue())
      else if (t == java.lang.Long.TYPE || t == classOf[java.lang.Long])
        Long.box(n.longValue())
      else if (t == java.lang.Short.TYPE || t == classOf[java.lang.Short])
        Short.box(n.shortValue())
      else if (t == java.lang.Byte.TYPE || t == classOf[java.lang.Byte])
        Byte.box(n.byteValue())
      else if (t == java.lang.Float.TYPE || t == classOf[java.lang.Float])
        Float.box(n.floatValue())
      else if (t == java.lang.Double.TYPE || t == classOf[java.lang.Double])
        Double.box(n.doubleValue())
      else n.asInstanceOf[AnyRef]
    case other => other.asInstanceOf[AnyRef]
  }

  def apply(spark: org.apache.spark.sql.SparkSession, calcDir: String): TypedStudy =
    new TypedStudy(Study(spark, calcDir))

  def apply(spark: org.apache.spark.sql.SparkSession, cfg: StudyConfig): TypedStudy =
    new TypedStudy(Study(spark, cfg))

  /** Typed view of the pset columns of a database slice. */
  implicit class TypedRunOutput(val out: RunOutput) extends AnyVal {
    def paramsAs[P <: Product : TypeTag](implicit d: DummyImplicit): Dataset[P] = {
      implicit val enc: Encoder[P] = Encoders.product[P]
      val names = enc.schema.fieldNames.toSeq
      out.db.select(names.head, names.tail: _*).as[P]
    }
  }
}
