package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.Monitor

/** Driver-drivable demo of the streaming surfaces (SURVEY §2.8 streaming
  * monitor), run: `sbt "runMain graft.examples.StreamingDemo"`.
  *
  * Feeds [[Monitor.sessionizeStream]] from the deterministic
  * `rate-micro-batch` source: each generated value maps to a
  * (user, event-time) pair where every 4th event per user jumps ahead by
  * two hours — a gap larger than the 30-minute session timeout — so
  * sessions of exactly 4 events close as the stream progresses. The same
  * shape a production job would run over Kafka; only the source line
  * differs. Also starts the watermarked tumbling-window aggregation
  * ([[Monitor.eventsWindowed]]) on the same stream.
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val users = 3
    // deterministic micro-batches: 30 rows per trigger, fixed start epoch
    val rate = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", 30)
      .option("startTimestamp", 0)
      .load()
    // value -> (user, seq); event k of a user lands at k*10min, plus a
    // 2h jump every 4 events (> 30min gap => closes the open session).
    // NB: `/` on longs is DOUBLE division in Spark SQL — use floor for
    // the sequence arithmetic
    val seq = floor(col("value") / users).cast("long")
    val events = rate.select(
      (col("value") % users).as("user_id"),
      (seq * expr("INTERVAL 10 MINUTES") +
        floor(seq / 4).cast("long") * expr("INTERVAL 2 HOURS") +
        lit("2024-01-01 00:00:00").cast("timestamp")).as("ts"),
      lit(1.0).as("value"))

    val sessions = Monitor.sessionizeStream(events.as[Monitor.SessionEvent])
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    // the native session_window twin on the SAME stream — the two
    // sessionizers agree decision-for-decision (spec-pinned tie rule),
    // so their closed-session shapes must match as the stream drains
    val nativeSessions = Monitor.sessionizeNative(events)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_native").start()
    val windows = Monitor.eventsWindowed(
      events.withColumn("event_type", concat(lit("u"), col("user_id"))),
      windowLen = "1 hour", watermark = "2 hours")
      .writeStream.outputMode("update")
      .format("memory").queryName("windows").start()

    try {
      // let micro-batches stream through until enough sessions closed
      // (never processAllAvailable: a rate source always has a next batch)
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def closedCount(): Long =
        spark.sql("SELECT count(*) FROM sessions").head().getLong(0)
      // the independent native query's append emission waits on ITS
      // watermark — it can be a micro-batch behind the custom
      // sessionizer, so the wait gates on BOTH before any assertion
      def nativeClosed(): Long = spark.sql(
        "SELECT count(*) FROM sessions_native WHERE n_events = 4")
        .head().getLong(0)
      while ((closedCount() < 6 || nativeClosed() < 1) &&
        System.nanoTime() < deadline) {
        Thread.sleep(250)
      }
      // snapshot ONCE: the memory table keeps growing while the stream
      // runs, so re-evaluating the DataFrame between counts would race
      val snap = spark.sql(
        "SELECT * FROM sessions ORDER BY user_id, session_start").collect()
      println("closed sessions (4 events each, 30-minute gap rule):")
      snap.take(12).foreach(r => println(s"  $r"))
      val n = snap.length.toLong
      val ok = snap.count(_.getAs[Long]("n_events") == 4L).toLong
      println(s"closed=$n, of which 4-event sessions=$ok")
      require(n >= 6, s"expected >= 6 closed sessions, got $n")
      require(ok == n, "every closed session should have exactly 4 events")
      println("windowed counts (streaming twin of q_events_hourly):")
      spark.sql("SELECT * FROM windows ORDER BY window, event_type")
        .show(8, truncate = false)
      val nat = spark.sql(
        "SELECT count(*) FROM sessions_native WHERE n_events = 4")
        .head().getLong(0)
      println(s"native session_window closed 4-event sessions: $nat")
      require(nat > 0, "native sessionizer should close sessions too")
    } finally {
      sessions.stop(); nativeSessions.stop(); windows.stop()
    }
    spark.stop()
    println("streaming demo OK")
  }
}
