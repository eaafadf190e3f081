package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._

/** The SURVEY §7.2 minimum end-to-end slice, mirroring the reference's
  * `examples/vary_2_params.py` + `examples/save_data_on_disk/20eval.py`
  * usage: build a grid, sweep a function over it, extend the study
  * incrementally with dedup, then query the Parquet database with Spark
  * SQL. Run: `sbt "runMain graft.examples.MinimalSlice [calcDir]"`.
  */
object MinimalSlice {
  def main(args: Array[String]): Unit = {
    val calcDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-example-").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-minimal-slice")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. grid: {a: 1..4} x {b: 8, 9}
    val params = Grid.pgrid(Grid.plist("a", 1 to 4), Grid.plist("b", Seq(8, 9)))
    println(s"grid: ${params.size} psets")

    // 2. sweep
    val func: Map[String, Any] => Map[String, Any] = p =>
      Map("result_" -> (p("a").asInstanceOf[Long] * 10.0 +
        p("b").asInstanceOf[Long]))
    val out1 = Study(spark, calcDir).run(func, params)
    println(s"run 1: run_id=${out1.runId} executed=${out1.executed}")
    Database.printableDF(out1.db).orderBy("a", "b").show(20, truncate = false)

    // 3. incremental extension with dedup: half the grid is already done
    val params2 = Grid.pgrid(Grid.plist("a", 3 to 6), Grid.plist("b", Seq(8, 9)))
    val out2 = Study(spark, StudyConfig(calcDir = calcDir, skipDups = true))
      .run(func, params2)
    println(s"run 2: executed=${out2.executed} (of ${params2.size}; rest deduped)")

    // 4. query the database like any Spark table
    val db = Database(spark, calcDir).read()
    db.filter(col("a") > 1)
      .groupBy("b").agg(avg("result_").as("avg_result"), count(lit(1)).as("n"))
      .orderBy("b")
      .show()
    println(s"database at $calcDir/database: ${db.count()} rows, " +
      s"${db.select("_run_id").distinct().count()} runs")
    spark.stop()
  }
}
