package graft.core

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** F8/F9 type-matrix fixtures (ref tests/test_all.py:1338-1437): the
  * engine's supported value domain, union-schema inference, widening,
  * NA handling, and rejection of the unsupported. */
class ValueSchemaSpec extends AnyFunSuite {
  import graft.SparkSpec.spark

  test("inference covers the supported domain (F9)") {
    assert(ValueSchema.inferType(1) == LongType)
    assert(ValueSchema.inferType(1L) == LongType)
    assert(ValueSchema.inferType(1.5f) == DoubleType)
    assert(ValueSchema.inferType(1.5) == DoubleType)
    assert(ValueSchema.inferType(true) == BooleanType)
    assert(ValueSchema.inferType("x") == StringType)
    assert(ValueSchema.inferType(java.time.Instant.now()) == TimestampType)
    assert(ValueSchema.inferType(java.time.LocalDate.now()) == DateType)
    assert(ValueSchema.inferType(Array[Byte](1, 2)) == BinaryType)
    assert(ValueSchema.inferType(Seq(1, 2)) == ArrayType(LongType, true))
    assert(ValueSchema.inferType(Seq(Seq(1.0))) ==
      ArrayType(ArrayType(DoubleType, true), true))
    // nested dict -> struct with sorted field names
    assert(ValueSchema.inferType(Map("b" -> 1, "a" -> "x")) ==
      StructType(Seq(StructField("a", StringType), StructField("b", LongType))))
  }

  test("union schema: first-appearance order, widening, null columns (F8)") {
    val schema = ValueSchema.infer(Seq(
      Map("a" -> 1, "c" -> null),
      Map("a" -> 2.5, "b" -> "x")))
    assert(schema.fieldNames.toSeq == Seq("a", "c", "b"))
    assert(schema("a").dataType == DoubleType) // long+double -> double
    assert(schema("c").dataType == StringType) // null-only -> string
  }

  test("mixed-type columns are rejected with a clear error (F9 deviation)") {
    val e = intercept[IllegalArgumentException] {
      ValueSchema.infer(Seq(Map("a" -> 1), Map("a" -> "x")))
    }
    assert(e.getMessage.contains("mixed-type column"))
    intercept[IllegalArgumentException] {
      ValueSchema.inferType(new Object)
    }
  }

  test("complex values as struct(re, im) round-trip (SURVEY §1.2)") {
    val c = Map("re" -> 1.0, "im" -> -2.0)
    val df = ValueSchema.toDF(spark, Seq(Map[String, Any]("z" -> c)))
    val row = df.select("z.re", "z.im").head()
    assert(row.getDouble(0) == 1.0 && row.getDouble(1) == -2.0)
  }

  test("first-class Complex: inference, normalization, extraction, merge " +
      "(ref tests/test_all.py:679-687, 1370-1380)") {
    assert(ValueSchema.inferType(Complex(1.0, 3.0)) == Complex.structType)
    // Complex and the equivalent re/im map infer the same struct and can
    // mix in one column
    assert(ValueSchema.merge(
      ValueSchema.inferType(Complex(1.0, 3.0)),
      ValueSchema.inferType(Map("re" -> 0.5, "im" -> 0.0)))
      == Complex.structType)
    val df = ValueSchema.toDF(spark, Seq(
      Map[String, Any]("k" -> 1L, "z" -> Complex(1.0, 3.0)),
      Map[String, Any]("k" -> 2L, "z" -> Map("re" -> 0.5, "im" -> -0.25))))
    val rows = df.orderBy("k").select("z.re", "z.im").collect()
    assert(rows(0).getDouble(0) == 1.0 && rows(0).getDouble(1) == 3.0)
    assert(rows(1).getDouble(0) == 0.5 && rows(1).getDouble(1) == -0.25)
    // extraction round-trip: the stored struct cell reads back as Complex
    val cell = df.orderBy("k").select("z").head().get(0)
    assert(Complex.fromAny(cell) == Complex(1.0, 3.0))
  }

  test("Dyn: the mixed-column escape hatch (SURVEY §7.4.1; " +
      "ref tests/test_all.py:690-704 object-dtype plist)") {
    // the reference sweeps [1, "3", None, 1.23, [..]] in ONE column; the
    // engine stores it as tagged JSON when wrapped in Dyn
    val mixed = Seq[Any](1L, "3", null, 1.23, Seq(1L, 2L),
      Map("a" -> 1L, "b" -> Seq("x", "y")))
    val psets = mixed.zipWithIndex.map { case (v, i) =>
      Map[String, Any]("k" -> i.toLong, "stuff" -> Dyn(v))
    }
    val df = ValueSchema.toDF(spark, psets)
    assert(df.schema("stuff").dataType == Dyn.structType)
    val rows = df.orderBy("k").select("stuff").collect()
    // tags distinguish the kinds; decode round-trips the value domain
    assert(rows.map(_.getStruct(0).getAs[String]("tag")).toSeq ==
      Seq("int", "str", "null", "float", "list", "dict"))
    assert(mixed.zip(rows).forall { case (v, r) =>
      Dyn.decode(r.getStruct(0)) == v
    })
    // hashes: type-sensitive (int 1 != str "1"), stable through the
    // normalized struct cell
    val h1 = PsetHash.hash(Map[String, Any]("s" -> Dyn(1L)))
    val h2 = PsetHash.hash(Map[String, Any]("s" -> Dyn("1")))
    assert(h1 != h2)
    val norm = ValueSchema.normalize(Dyn(1L), Dyn.structType)
    assert(PsetHash.hash(Map[String, Any]("s" -> norm)) == h1)
    // an unwrapped mixed column still rejects, pointing at Dyn
    val e = intercept[IllegalArgumentException] {
      ValueSchema.infer(Seq(Map("x" -> 1), Map("x" -> "s")))
    }
    assert(e.getMessage.contains("Dyn"))
  }

  test("toDF round-trips arrays, nested structs, timestamps, nulls (F12)") {
    val ts = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-06-01T12:00:00Z"))
    val psets = Seq(
      Map[String, Any]("a" -> 1, "arr" -> Seq(1, 2, 3),
        "nested" -> Map("x" -> 1.5, "y" -> "s"), "t" -> ts, "nn" -> null),
      Map[String, Any]("a" -> 2, "arr" -> Seq(9),
        "nested" -> Map("x" -> 2.5, "y" -> "u"), "t" -> ts, "nn" -> "v"))
    val df = ValueSchema.toDF(spark, psets)
    val rows = df.orderBy("a").collect()
    assert(rows(0).getSeq[Long](df.columns.indexOf("arr")) == Seq(1L, 2L, 3L))
    assert(rows(0).getAs[org.apache.spark.sql.Row]("nested").getDouble(0) == 1.5)
    assert(rows(0).getAs[java.sql.Timestamp]("t") == ts)
    assert(rows(0).isNullAt(df.columns.indexOf("nn")))
    assert(rows(1).getString(df.columns.indexOf("nn")) == "v")
  }

  test("hash stability through parquet round-trip (driver == expression)") {
    val psets = Seq(
      Map[String, Any]("a" -> 1, "arr" -> Seq(1, 2), "s" -> "x",
        "nested" -> Map("k" -> 2.0), "nn" -> null))
    val schema = ValueSchema.infer(psets)
    val norm = Study.normalizeFull(psets.head, schema)
    val driverHash = PsetHash.hash(norm)
    val df = ValueSchema.toDF(spark, psets)
    val tmp = graft.SparkSpec.tmpDir("graft-vs-") + "/t"
    df.write.parquet(tmp)
    val back = spark.read.parquet(tmp)
    val exprHash = back.select(PsetHash.expr(back.columns.toSeq).as("h"))
      .head().getString(0)
    assert(exprHash == driverHash)
  }

  test("extracted params with array/struct cells re-run with equal hashes") {
    val calc = graft.SparkSpec.tmpDir("graft-rt-")
    val params = Seq(
      Map[String, Any]("a" -> 1, "arr" -> Seq(1, 2),
        "cfg" -> Map("lr" -> 0.1, "opt" -> "sgd")),
      Map[String, Any]("a" -> 2, "arr" -> Seq(3),
        "cfg" -> Map("lr" -> 0.2, "opt" -> "adam")))
    val study = Study(spark, StudyConfig(calcDir = calc, skipDups = true))
    val out1 = study.run(p => Map("r_" -> 1.0), params)
    val extracted = Database.extractParams(out1.db)
    assert(extracted.size == 2)
    // re-running the extracted params dedups everything: hashes identical
    val out2 = study.run(p => Map("r_" -> 2.0), extracted)
    assert(out2.executed == 0)
    assert(out2.db.count() == 2)
  }

  test("date/timestamp/binary params sweep end-to-end with stable hashes") {
    val calc = graft.SparkSpec.tmpDir("graft-types-")
    val d1 = java.time.LocalDate.parse("2024-03-01")
    val ts = java.time.Instant.parse("2024-03-01T10:00:00Z")
    val params = Seq(
      Map[String, Any]("day" -> d1, "at" -> ts, "blob" -> Array[Byte](1, 2, 3)),
      Map[String, Any]("day" -> d1.plusDays(1), "at" -> ts,
        "blob" -> Array[Byte](4, 5)))
    val study = Study(spark, StudyConfig(calcDir = calc, skipDups = true))
    val out = study.run(p => Map("r_" -> 1.0), params)
    assert(out.executed == 2)
    val row = out.db.orderBy("_pset_seq").head()
    assert(row.getAs[java.sql.Date]("day").toLocalDate == d1)
    assert(row.getAs[java.sql.Timestamp]("at").toInstant == ts)
    assert(row.getAs[Array[Byte]]("blob").toSeq == Seq[Byte](1, 2, 3))
    // identical params dedup across a fresh JVM-independent hash path
    val out2 = study.run(p => Map("r_" -> 2.0), params)
    assert(out2.executed == 0)
  }

  test("JSON db format round-trip with schema (S3, F12)") {
    val calc = graft.SparkSpec.tmpDir("graft-json-")
    val out = Study(spark, calc).run(
      p => Map("r_" -> p("a").asInstanceOf[Long] * 1.5),
      Grid.plist("a", Seq(1, 2, 3)))
    val db = Database(spark, calc)
    db.writeJson(s"$calc/db_json")
    val back = db.readJson(s"$calc/db_json", Some(out.db.schema))
    assert(back.count() == 3)
    val a = back.orderBy("a").collect().map(r => (r.getAs[Long]("a"),
      r.getAs[Double]("r_"), r.getAs[java.sql.Timestamp]("_time_utc")))
    val orig = out.db.orderBy("a").collect().map(r => (r.getAs[Long]("a"),
      r.getAs[Double]("r_"), r.getAs[java.sql.Timestamp]("_time_utc")))
    assert(a.map(x => (x._1, x._2)).toSeq == orig.map(x => (x._1, x._2)).toSeq)
    // timestamps survive at millisecond precision (ISO format)
    a.zip(orig).foreach { case (x, y) =>
      assert(math.abs(x._3.getTime - y._3.getTime) < 1000)
    }
  }
}
