package graft.core

/** The dynamic-column escape hatch (SURVEY §7.4.1): the reference's
  * schemaless database accepts mixed types within one column (pandas
  * object dtype, e.g. the `[1, "3", None, 1.23, ...]` plist of ref
  * tests/test_all.py:690-704); Spark columns are typed, so the engine
  * rejects genuinely mixed columns at ingest — UNLESS the user marks the
  * column dynamic by wrapping values in [[Dyn]]. A `Dyn` cell stores as
  * `struct(json string, tag string)`: the value JSON-encoded plus its
  * type tag, so mixed columns get a stable schema, hash canonically
  * (through the ordinary struct encoding), survive parquet/JSON
  * round-trips, and stay queryable (`col("x.tag")`,
  * `get_json_object(col("x.json"), ...)`).
  */
final case class Dyn(value: Any) {

  /** Type tag stored next to the JSON encoding. */
  def tag: String = Dyn.tagOf(value)

  /** Deterministic JSON encoding (same encoder as the tmpsave sink). */
  def json: String = Fs.toJson(value)
}

object Dyn {

  /** The storage schema: field names sorted, both strings. */
  val structType: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("json",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("tag",
        org.apache.spark.sql.types.StringType, nullable = true)))

  private[core] def tagOf(v: Any): String = v match {
    case null | None => "null"
    case _: Boolean => "bool"
    case _: Byte | _: Short | _: Int | _: Long => "int"
    case _: Float | _: Double | _: BigDecimal | _: java.math.BigDecimal =>
      "float"
    case _: String => "str"
    case _: scala.collection.Map[_, _] => "dict"
    case _: Iterable[_] | _: Array[_] => "list"
    case other => other.getClass.getSimpleName.toLowerCase
  }

  /** Decode a stored dynamic cell (schema-carrying Row of {json, tag})
    * back to a Scala value: null/bool/long/double/string and nested
    * lists/maps of those — json4s (bundled with Spark) does the parse;
    * integral numbers come back as Long, fractional as Double, matching
    * the engine's §1.2 type collapse. */
  def decode(v: Any): Any = v match {
    case d: Dyn => d.value
    case r: org.apache.spark.sql.Row if r.schema != null =>
      val names = r.schema.fieldNames.toSeq
      require(names.sorted == Seq("json", "tag"),
        s"not a Dyn struct: fields $names")
      fromJson(r.getAs[String]("json"))
    case other =>
      throw new IllegalArgumentException(
        s"cannot decode ${other.getClass.getName} as Dyn: $other")
  }

  private def fromJson(s: String): Any = {
    import org.json4s._
    def conv(j: JValue): Any = j match {
      case JNull | JNothing => null
      case JBool(b) => b
      case JInt(i) => i.toLong
      case JLong(l) => l
      case JDouble(d) => d
      case JDecimal(d) => d.toDouble
      case JString(x) => x
      case JArray(xs) => xs.map(conv)
      case JObject(fields) => fields.map { case (k, v) => k -> conv(v) }.toMap
      case JSet(xs) => xs.map(conv)
    }
    conv(org.json4s.jackson.JsonMethods.parse(s))
  }
}
