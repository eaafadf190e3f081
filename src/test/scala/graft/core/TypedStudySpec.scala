package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class TP(a: Long, b: String)
case class TR(result_ : Double, tag_ : String)
case class TPNarrow(i: Int, f: Float, s: Short, d: Double, b: String)

class TypedStudySpec extends AnyFunSuite {
  import graft.SparkSpec.{spark, tmpDir}
  import TypedStudy.TypedRunOutput

  test("typed sweep: case-class params/results, typed read-back") {
    val calc = tmpDir("graft-typed-")
    val params = Seq(TP(1, "x"), TP(2, "y"), TP(3, "x"))
    val out = TypedStudy(spark, calc).run[TP, TR](
      p => TR(p.a * 10.0, p.b + "!"), params)
    assert(out.executed == 3)
    val db = out.db
    assert(db.columns.contains("a") && db.columns.contains("result_"))
    val rows = db.orderBy("_pset_seq").collect()
    assert(rows.map(_.getAs[Double]("result_")).toSeq == Seq(10.0, 20.0, 30.0))
    assert(rows.map(_.getAs[String]("tag_")).toSeq == Seq("x!", "y!", "x!"))
    // typed view round-trip
    val typed = out.paramsAs[TP].orderBy("a").collect()
    assert(typed.toSeq == params.sortBy(_.a))
    // hashes match the equivalent untyped run (same canonical identity)
    val h = PsetHash.hash(Map[String, Any]("a" -> 1L, "b" -> "x"))
    assert(db.filter(col("a") === 1).select("_pset_hash")
      .head().getString(0) == h)
  }

  test("typed sweep reconstructs narrowed numeric fields (Int/Float/Short)") {
    // engine normalization widens to Long/Double; task-side ctor rebuild
    // must narrow back (round-1 bug: argument-type-mismatch for Int)
    val calc = tmpDir("graft-typed3-")
    val params = Seq(TPNarrow(1, 0.5f, 2, 3.0, "x"),
      TPNarrow(4, 1.5f, 5, 6.0, "y"))
    val out = TypedStudy(spark, calc).run[TPNarrow, TR](
      p => TR(p.i + p.f + p.s + p.d, p.b), params)
    assert(out.executed == 2)
    val r = out.db.orderBy("i").collect()
      .map(_.getAs[Double]("result_")).toSeq
    assert(r == Seq(1 + 0.5 + 2 + 3.0, 4 + 1.5 + 5 + 6.0))
  }

  test("typed sweep interops with untyped dedup") {
    val calc = tmpDir("graft-typed2-")
    val ts = TypedStudy(spark, StudyConfig(calcDir = calc, skipDups = true))
    ts.run[TP, TR](p => TR(p.a * 1.0, "t"), Seq(TP(1, "x"), TP(2, "y")))
    // the same logical psets as plain maps dedup against the typed rows
    val out = Study(spark, StudyConfig(calcDir = calc, skipDups = true))
      .run(p => Map("result_" -> 0.0, "tag_" -> "u"),
        Seq(Map[String, Any]("a" -> 1L, "b" -> "x"),
          Map[String, Any]("a" -> 9L, "b" -> "z")))
    assert(out.executed == 1)
    assert(out.db.count() == 3)
  }
}
