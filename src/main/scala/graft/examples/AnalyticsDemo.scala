package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._

/** The post-processing/query path (SURVEY §3.3), mirroring the reference's
  * `examples/save_data_on_disk` flow: sweep a function that writes per-pset
  * artifact files, then evaluate — load the database, filter, join the
  * artifacts back on `_pset_id`, derive a new column, and persist a
  * derived database. Run:
  * `sbt "runMain graft.examples.AnalyticsDemo [calcDir]"`.
  */
object AnalyticsDemo {
  def main(args: Array[String]): Unit = {
    val calc = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-analytics-").toString)
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-analytics-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 10run: sweep writes one artifact file per pset
    val out = Study(spark, calc).run(p => {
      val a = p("a").asInstanceOf[Long]
      Fs.writeString(s"${p("_calc_dir")}/${p("_pset_id")}/output.txt",
        (1 to 5).map(i => a * i).mkString(" "))
      Map("status_" -> "ok")
    }, Grid.plist("a", 1 to 6))
    println(s"run: ${out.executed} psets, artifacts under $calc/<pset_id>/")

    // 20eval: load db -> filter -> artifact join -> derive -> persist
    val db = Database(spark, calc).read()
    val arts = spark.read.text(s"$calc/*/output.txt")
      .withColumn("_pset_id",
        regexp_extract(input_file_name(), "/([0-9a-f-]{36})/output\\.txt", 1))
      .withColumn("vals",
        transform(split(col("value"), " "), x => x.cast("double")))
      .withColumn("mean_",
        aggregate(col("vals"), lit(0.0), (acc, x) => acc + x) /
          size(col("vals")))
      .select(col("_pset_id"), col("mean_"))
    val eval = db.filter(col("a") > 1)
      .join(arts, Seq("_pset_id"))
    eval.write.mode("overwrite").parquet(s"$calc/database_eval")
    Database.printableDF(eval).orderBy("a").show()
    println(s"derived database at $calc/database_eval: ${eval.count()} rows")
    spark.stop()
  }
}
