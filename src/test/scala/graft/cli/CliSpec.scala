package graft.cli

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Database

/** CLI smoke: flag parsing and the time-travel frame resolution the
  * export mains share — a `--as-of` dump is the [[Database.asOf]]
  * frame (manifest-pruned to one run's files), `--changes` the delta,
  * and the JSON export round-trips the chosen frame. */
class CliSpec extends AnyFunSuite {
  import graft.SparkSpec.{spark, tmpDir}

  private val t0 = java.time.Instant.parse("2026-08-15T10:00:00Z")

  private def mkDb(): Database = {
    val db = Database(spark, tmpDir("graft-cli-"))
    def runDf(r: Int, n: Int) = spark.range(0, n).select(
      concat(lit(s"p$r-"), col("id")).as("_pset_id"),
      col("id").as("_pset_seq"), lit(r.toLong).as("_run_seq"),
      lit(s"run$r").as("_run_id"),
      timestamp_seconds(lit(t0.getEpochSecond + r * 60L))
        .as("_time_utc"),
      col("id").cast("double").as("x"))
    db.append(runDf(0, 30))
    db.rebuildSkipManifest()
    db.append(runDf(1, 20))
    db.append(runDf(2, 10))
    db
  }

  test("splitFlags: --flag value pairs split from positionals; a " +
    "trailing flag with no value is loud") {
    val (f, p) = Cli.splitFlags(Array("/a", "--as-of", "3", "/b"),
      Cli.timeFlags)
    assert(f == Map("--as-of" -> "3"))
    assert(p.toSeq == Seq("/a", "/b"))
    intercept[IllegalArgumentException](
      Cli.splitFlags(Array("/a", "--as-of"), Cli.timeFlags))
    // a repeated flag is an error, not silent last-wins (the operator
    // would export a different history than they inspected)
    intercept[IllegalArgumentException](Cli.splitFlags(
      Array("/a", "--as-of", "3", "--as-of", "7"), Cli.timeFlags))
    // a flag token in value position is an error, not a value
    intercept[IllegalArgumentException](Cli.splitFlags(
      Array("--as-of", "--changes", "3"), Cli.timeFlags))
  }

  test("frame: full read by default; --as-of/--changes resolve the " +
    "time-travel frames, pruned and exportable; flags are exclusive") {
    val db = mkDb()
    assert(Cli.frame(db, Map.empty).count() == 60L)
    assert(Cli.frame(db, Map("--as-of" -> "0")).count() == 30L)
    assert(Cli.frame(db, Map("--as-of" -> "1")).count() == 50L)
    assert(Cli.frame(db, Map("--changes" -> "0")).count() == 30L)
    assert(Cli.frame(db, Map("--changes" -> "0,1")).count() == 20L)
    // wall-clock addressing: at run 1's commit instant, between runs,
    // and a malformed timestamp is loud
    assert(Cli.frame(db,
      Map("--as-of-time" -> t0.plusSeconds(60).toString)).count() == 50L)
    assert(Cli.frame(db,
      Map("--as-of-time" -> t0.plusSeconds(90).toString)).count() == 50L)
    val badTs = intercept[IllegalArgumentException](
      Cli.frame(db, Map("--as-of-time" -> "yesterday")))
    assert(badTs.getMessage.contains("ISO-8601"))
    intercept[IllegalArgumentException](
      Cli.frame(db, Map("--as-of" -> "1", "--changes" -> "0")))
    intercept[IllegalArgumentException](
      Cli.frame(db, Map("--as-of" -> "1",
        "--as-of-time" -> t0.toString)))
    intercept[IllegalArgumentException](
      Cli.frame(db, Map("--changes" -> "0,1,2")))
    // the historical dump IS asOf's frame: same rows, and with a fresh
    // manifest it reads only run 0's files
    val h = Cli.frame(db, Map("--as-of" -> "0"))
    assert(h.inputFiles.nonEmpty &&
      h.inputFiles.forall(_.contains("_run_id=run0")),
      h.inputFiles.mkString("\n"))
    // db2json over the selected frame round-trips it
    val out = tmpDir("graft-cli-json-")
    db.writeJson(s"$out/j", h)
    assert(spark.read.json(s"$out/j").count() == 30L)
  }

  test("export mains: positional arity is exact and loud — a missing " +
    "arg is a usage error (not a MatchError), an extra positional is " +
    "rejected (not silently ignored)") {
    val missing = intercept[IllegalArgumentException](
      Db2Json.main(Array("/only-one")))
    assert(missing.getMessage.contains("usage: db2json"))
    val extra = intercept[IllegalArgumentException](
      Db2Json.main(Array("/a", "/b", "/stray")))
    assert(extra.getMessage.contains("usage: db2json"))
    val tblNone = intercept[IllegalArgumentException](
      Db2Table.main(Array.empty[String]))
    assert(tblNone.getMessage.contains("usage: db2table"))
    val tblExtra = intercept[IllegalArgumentException](
      Db2Table.main(Array("/a", "5", "/stray")))
    assert(tblExtra.getMessage.contains("usage: db2table"))
  }
}
