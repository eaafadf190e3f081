package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Grid, Study, StudyConfig}

class MonitorSpec extends AnyFunSuite {
  import graft.SparkSpec.{spark, tmpDir}

  test("tmpsave progress monitor folds checkpoints into per-run counts") {
    val calc = tmpDir("graft-stream-")
    val cfg = StudyConfig(calcDir = calc, tmpsave = true)
    val out = Study(spark, cfg)
      .run(p => Map("r_" -> 1.0), Grid.plist("a", 1 to 7))
    val q = Monitor.startProgress(spark, calc, "prog_test")
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM prog_test").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[String]("run_id") == out.runId)
      assert(rows.head.getAs[Long]("n_done") == 7)
      assert(rows.head.getAs[Double]("mean_runtime") >= 0.0)
    } finally q.stop()
  }

  test("watermarked windowed aggregation over a file stream of events") {
    val dir = tmpDir("graft-events-")
    import spark.implicits._
    val batch = Seq(
      ("2024-01-01 00:05:00", "click", 1.0),
      ("2024-01-01 00:25:00", "click", 2.0),
      ("2024-01-01 00:45:00", "buy", 10.0),
      ("2024-01-01 01:10:00", "click", 3.0))
      .toDF("ts_s", "event_type", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    batch.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("ts", TimestampType))))
      .parquet(s"$dir/in")
    val q = Monitor.eventsWindowed(stream).writeStream
      .outputMode("complete").format("memory").queryName("win_test").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window.start, event_type, n, value_sum FROM win_test " +
          "ORDER BY 1, 2").collect()
      assert(rows.length == 3)
      assert(rows(0).getAs[String]("event_type") == "buy" ||
        rows(0).getAs[Long]("n") == 2) // hour 0: 2 clicks + 1 buy
      val hour0click = rows.find(r => r.getAs[String]("event_type") == "click"
        && r.getAs[Long]("n") == 2).get
      assert(hour0click.getAs[Double]("value_sum") == 3.0)
    } finally q.stop()
  }
}
