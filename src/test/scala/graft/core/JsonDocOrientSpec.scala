package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The pandas-orient JSON document matrix (analog of ref
  * psweep.py:454-512, which passes `orient` through to pandas
  * `to_json`/`read_json`). Every orient re-enters Spark's JSON record
  * parser on read, so the type-loss rules are the ones JsonRoundTripSpec
  * pins for the distributed records path — this spec pins the SHAPES and
  * the round-trip identity.
  */
class JsonDocOrientSpec extends AnyFunSuite {
  import graft.SparkSpec.{spark, tmpDir}

  private val ts = java.sql.Timestamp.from(
    java.time.Instant.parse("2024-06-01T12:00:00.123Z"))

  private def freshDb() = {
    val calc = tmpDir("graft-jsondoc-")
    val db = Database(spark, calc)
    val psets = Seq(
      Map[String, Any]("k" -> 1L, "d" -> 1.5, "s" -> "x", "flag" -> true,
        "arr" -> Seq(1L, 2L), "t" -> ts, "bin" -> Array[Byte](1, 2, -1)),
      Map[String, Any]("k" -> 2L, "d" -> 2.5, "s" -> "y", "flag" -> false,
        "arr" -> Seq(3L), "t" -> ts, "bin" -> Array[Byte](0)))
    val df = ValueSchema.toDF(spark, psets).withColumn("_run_id", lit("r0"))
    db.append(df)
    (db, df.schema)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    // base64 the binary column: Row.toString renders Array[Byte] by
    // JVM identity, which would fail equal contents
    df.withColumn("bin", base64(col("bin")))
      .orderBy("k").collect().toSeq.map(_.toString)

  test("records/split/index/columns round-trip with a schema; values maps positionally") {
    val (db, schema) = freshDb()
    val want = canon(db.read())
    Seq("records", "split", "index", "columns", "values").foreach { orient =>
      val out = tmpDir(s"graft-jsondoc-$orient-") + "/db.json"
      db.writeJsonDoc(out, orient)
      val back = db.readJsonDoc(out, orient, Some(schema))
      assert(canon(back.select(db.read().columns.map(col): _*)) == want,
        s"orient=$orient")
    }
  }

  test("document shapes match the pandas orient contracts") {
    val (db, _) = freshDb()
    def doc(orient: String): String = {
      val out = tmpDir(s"graft-jsondoc-shape-$orient-") + "/db.json"
      db.writeJsonDoc(out, orient)
      Fs.readString(out)
    }
    // records: top-level array of objects
    assert(doc("records").startsWith("[{"))
    // values: array of positional arrays, no field names
    val v = doc("values")
    assert(v.startsWith("[[") && !v.contains("\"k\":"))
    // split: the three pandas keys, in order
    val sp = doc("split")
    assert(sp.startsWith("{\"columns\":[") && sp.contains(",\"index\":[0,1]")
      && sp.contains(",\"data\":[["))
    // index / columns: objects keyed by row label / column name
    assert(doc("index").startsWith("{\"0\":{"))
    assert(doc("columns").contains("\"k\":{\"0\":1,\"1\":2}"))
  }

  test("schemaless values orient gets pandas-style positional labels") {
    val (db, _) = freshDb()
    val out = tmpDir("graft-jsondoc-vals-") + "/db.json"
    db.writeJsonDoc(out, "values")
    val back = db.readJsonDoc(out, "values")
    assert(back.columns.toSeq.sorted ==
      db.read().columns.indices.map(_.toString).sorted)
    assert(back.count() == 2L)
  }

  test("maxRows guard and unknown orients are loud errors") {
    val (db, _) = freshDb()
    val out = tmpDir("graft-jsondoc-err-") + "/db.json"
    val e = intercept[IllegalArgumentException](
      db.writeJsonDoc(out, "records", maxRows = 1L))
    assert(e.getMessage.contains("maxRows"))
    intercept[IllegalArgumentException](db.writeJsonDoc(out, "tables"))
    db.writeJsonDoc(out, "records")
    intercept[IllegalArgumentException](db.readJsonDoc(out, "tables"))
  }
}
