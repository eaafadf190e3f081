package graft.core

/** Complex-valued parameter support (SURVEY §1.2: `complex` maps to
  * `struct(re, im)`).
  *
  * The reference sweeps complex params through the same schemaless
  * machinery as every other scalar (`complex(1.0, 3.0)` appears in the
  * extraction and hash matrices, ref tests/test_all.py:679-687 and
  * :1370-1380). Spark has no complex scalar, so the engine stores a
  * two-field double struct — nested-column selection (`col("c.re")`),
  * parquet min/max stats per component, and canonical struct hashing all
  * come for free. Field names sort as (im, re) in the canonical encodings,
  * like every other struct.
  */
final case class Complex(re: Double, im: Double)

object Complex {

  /** The storage schema: field names sorted, both components double. */
  val structType: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("im",
        org.apache.spark.sql.types.DoubleType, nullable = true),
      org.apache.spark.sql.types.StructField("re",
        org.apache.spark.sql.types.DoubleType, nullable = true)))

  /** Recover a Complex from a stored struct cell (extraction round-trip:
    * `Database.pset` returns struct cells as schema-carrying Rows). */
  def fromAny(v: Any): Complex = v match {
    case c: Complex => c
    case r: org.apache.spark.sql.Row if r.schema != null =>
      val names = r.schema.fieldNames.toSeq
      require(names.sorted == Seq("im", "re"),
        s"not a complex struct: fields $names")
      Complex(r.getAs[Double]("re"), r.getAs[Double]("im"))
    case other =>
      throw new IllegalArgumentException(
        s"cannot read ${other.getClass.getName} as Complex: $other")
  }
}
