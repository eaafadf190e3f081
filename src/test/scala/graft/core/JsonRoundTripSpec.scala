package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The JSON database format's type-loss matrix, pinned (analog of ref
  * tests/test_all.py:329-391, which round-trips a type-matrix frame
  * through `df_write/df_read(fmt="json")` and documents what JSON cannot
  * carry). JSON is the lossy interchange format; Parquet is the lossless
  * store. Schemaless read-back loses exactly the conversions enumerated
  * here — and a schema-carrying read restores every one of them.
  */
class JsonRoundTripSpec extends AnyFunSuite {
  import graft.SparkSpec.{spark, tmpDir}

  private val ts = java.sql.Timestamp.from(
    java.time.Instant.parse("2024-06-01T12:00:00.123Z"))
  private val day = java.time.LocalDate.parse("2024-06-01")

  private def freshDb(): (Database, StructType) = {
    val calc = tmpDir("graft-json-")
    val db = Database(spark, calc)
    val psets = Seq(
      Map[String, Any]("k" -> 1L, "l" -> 42, "d" -> 1.5, "dw" -> 10.0,
        "s" -> "x", "flag" -> true, "arr" -> Seq(1, 2),
        "nested" -> Map("a" -> 1.0, "c" -> Seq(1L, 2L)),
        "t" -> ts, "day" -> day, "bin" -> Array[Byte](1, 2, -1),
        "z" -> Complex(1.0, -2.0), "onlynull" -> null),
      Map[String, Any]("k" -> 2L, "l" -> 7, "d" -> 2.5, "dw" -> 20.0,
        "s" -> "y", "flag" -> false, "arr" -> Seq(3),
        "nested" -> Map("a" -> 2.0, "c" -> Seq(9L)),
        "t" -> ts, "day" -> day, "bin" -> Array[Byte](0),
        "z" -> Complex(0.5, 0.0), "onlynull" -> null))
    val df = ValueSchema.toDF(spark, psets).withColumn("_run_id", lit("r0"))
    db.append(df)
    (db, df.schema)
  }

  test("schemaless JSON read-back: the exact loss matrix") {
    val (db, _) = freshDb()
    val out = tmpDir("graft-json-out-") + "/db.json"
    db.writeJson(out)
    val back = db.readJson(out)
    val f = back.schema.fields.map(x => x.name -> x.dataType).toMap
    // survives: integral stays long, float stays double (incl. whole
    // doubles — written as 10.0, re-inferred as double), bool, string,
    // arrays, nested structs (incl. complex's struct(im, re))
    assert(f("k") == LongType && f("l") == LongType)
    assert(f("d") == DoubleType && f("dw") == DoubleType)
    assert(f("flag") == BooleanType && f("s") == StringType)
    assert(f("arr") == ArrayType(LongType, true))
    assert(f("nested") == StructType(Seq(StructField("a", DoubleType),
      StructField("c", ArrayType(LongType, true)))))
    assert(f("z") == StructType(Seq(StructField("im", DoubleType),
      StructField("re", DoubleType))))
    // LOSS 1: timestamps come back as ISO strings without a schema
    assert(f("t") == StringType)
    assert(back.select("t").head().getString(0).startsWith("2024-06-01T12:00:00.123"))
    // LOSS 2: dates come back as strings
    assert(f("day") == StringType)
    assert(back.select("day").head().getString(0) == "2024-06-01")
    // LOSS 3: binary comes back as its base64 text
    assert(f("bin") == StringType)
    val binBack = back.orderBy("k").select("bin").head().getString(0)
    assert(java.util.Base64.getDecoder.decode(binBack).toSeq ==
      Seq[Byte](1, 2, -1).toSeq)
    // LOSS 4: an all-null column vanishes entirely (JSON omits null
    // cells, so nothing records the column ever existed)
    assert(!f.contains("onlynull"))
    // values that JSON can carry are exact
    assert(back.orderBy("k").select("k", "d", "flag").collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSeq ==
      Seq((1L, 1.5, true), (2L, 2.5, false)))
  }

  test("schema-carrying JSON read-back restores every lossy conversion") {
    val (db, schema) = freshDb()
    val out = tmpDir("graft-json-out2-") + "/db.json"
    db.writeJson(out)
    val back = db.readJson(out, Some(schema))
    assert(back.schema.fields.map(f => f.name -> f.dataType).toMap ==
      schema.fields.map(f => f.name -> f.dataType).toMap)
    val r = back.orderBy("k").collect()
    assert(r(0).getAs[java.sql.Timestamp]("t") == ts)
    assert(r(0).getAs[java.sql.Date]("day") == java.sql.Date.valueOf(day))
    assert(r(0).getAs[Array[Byte]]("bin").toSeq == Seq[Byte](1, 2, -1).toSeq)
    assert(r.forall(_.isNullAt(r(0).fieldIndex("onlynull"))))
    // hash identity survives the JSON round-trip: recomputing the pset
    // hash over the restored rows gives the parquet db's hashes
    val orig = db.read()
    val hashed = back.withColumn("_h", PsetHash.expr(back.columns.toSeq))
    val origHashed = orig.withColumn("_h", PsetHash.expr(orig.columns.toSeq))
    assert(hashed.orderBy("k").select("_h").collect().toSeq ==
      origHashed.orderBy("k").select("_h").collect().toSeq)
  }
}
