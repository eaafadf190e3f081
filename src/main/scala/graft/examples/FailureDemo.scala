package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._

/** The failure-capture + repeat-failed workflow (the reference's blessed
  * pattern, manual.md:891-944, promoted to first-class API): a flaky sweep
  * records `_failed`/`_exc_txt` rows instead of dying; `repeatFailed`
  * re-runs exactly the failed psets. Run:
  * `sbt "runMain graft.examples.FailureDemo [calcDir]"`.
  */
object FailureDemo {
  def main(args: Array[String]): Unit = {
    val calc = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-fail-demo-").toString)
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-failure-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val flaky: Map[String, Any] => Map[String, Any] = p => {
      val a = p("a").asInstanceOf[Long]
      if (a % 2 == 0) throw new RuntimeException(s"transient failure for a=$a")
      Map("result_" -> a * 10.0)
    }
    val study = Study(spark, StudyConfig(calcDir = calc, failSafe = true))
    val out1 = study.run(flaky, Grid.plist("a", 0 until 6))
    println(s"run 1: ${out1.executed} psets, " +
      s"${out1.db.filter(col("_failed")).count()} failed")

    val fixed: Map[String, Any] => Map[String, Any] =
      p => Map("result_" -> p("a").asInstanceOf[Long] * 10.0)
    val out2 = study.repeatFailed(fixed)
    println(s"repeatFailed: re-ran ${out2.executed} psets")
    // the latest state per pset hash: all succeeded
    val latest = out2.db
      .groupBy(col("_pset_hash"))
      .agg(max_by(struct(col("a"), col("result_"), col("_failed")),
        col("_pset_seq")).as("s"))
      .select(col("s.a"), col("s.result_"), col("s._failed"))
      .orderBy(col("a"))
    latest.show()
    println(s"still failing: ${latest.filter(col("_failed")).count()}")
    spark.stop()
  }
}
