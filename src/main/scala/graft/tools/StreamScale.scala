package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming scaling evidence at a larger-than-bench input (round-16,
  * VERDICT r15 item 8): at sf0.1 every stream query is bounded below
  * by per-drain fixed cost (WAL trio + stream start + one tiny job),
  * so c8/c32 ratios near 1 cannot distinguish serial code from fixed
  * cost. This experiment drains a SYNTHETIC ~`targetMb` MB event table
  * (the sf events table replicated with shifted ids/timestamps —
  * deterministic) through the watermarked windowed aggregation twice:
  *
  *   1. at the DERIVED state partition count
  *      ([[graft.streaming.Monitor.drainPartitions]] — which must now
  *      exceed the floor, proving the derivation scales with input),
  *   2. pinned to the floor (spark.graft.stream.statePartitions=2),
  *
  * and prints one JSON line with the input bytes, the derived count,
  * and both wall times. A derived count > 2 plus a speedup over the
  * pinned floor is the committed evidence that the drain sizing is
  * scale-adaptive (not a local[32] constant) and that the bounded
  * drains parallelize once data, not fixed cost, dominates.
  *
  * Run: `sbt "runMain graft.tools.StreamScale [targetMb]"` with
  * `SPARK_GRAFT_SF_DIR` selecting the seed data (default sf0.1).
  */
object StreamScale {
  def main(args: Array[String]): Unit = {
    val targetMb = args.headOption.map(_.toInt).getOrElse(160)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-stream-scale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft-sscale-")
    val in = s"$dir/events"
    try {
      // deterministic replication: copy k shifts the ids and timestamps
      // so windows/users spread instead of collapsing onto one key
      val seed = spark.read.parquet(s"$sfDir/events.parquet")
      val seedBytes = graft.core.Fs
        .fs(s"$sfDir/events.parquet")
        .getContentSummary(
          new org.apache.hadoop.fs.Path(s"$sfDir/events.parquet"))
        .getLength
      val copies = math.max(1,
        (targetMb.toLong << 20) / math.max(seedBytes, 1L)).toInt
      seed.crossJoin(
          spark.range(0, copies).select(col("id").as("__k")))
        .withColumn("event_id",
          col("event_id") + col("__k") * 10000000L)
        .withColumn("user_id", col("user_id") + col("__k") * 100000L)
        .withColumn("ts",
          expr("ts + make_interval(0, 0, 0, 0, 0, 0, __k % 3600)")
            .cast("timestamp")) // parquet ts is NTZ; watermarks need TIMESTAMP
        .drop("__k")
        .write.mode("overwrite").parquet(in)
      val bytes = graft.core.Fs.fs(in)
        .getContentSummary(new org.apache.hadoop.fs.Path(in)).getLength
      val derived = graft.streaming.Monitor.drainPartitions(spark, in)

      // two stateful shapes with opposite sensitivity: the windowed
      // AGGREGATION's state is one row per open (window, type) group —
      // map-side partial aggregation does the heavy lifting, so state
      // partitioning barely matters; the DEDUP's state is one row per
      // distinct key (every event), so per-partition state-store work
      // scales with data and the derived count is load-bearing
      def drainOnce(label: String, statePartitions: Int,
                    shape: String): Double = {
        val ckpt = s"$dir/ckpt-$label-${System.nanoTime()}"
        val name = s"graft_sscale_$label"
        val prevSp = spark.conf.get("spark.graft.stream.statePartitions",
          "0")
        spark.conf.set("spark.graft.stream.statePartitions",
          statePartitions.toString)
        try {
          val t0 = System.nanoTime()
          graft.streaming.Monitor.withDrainPartitions(spark, in) {
            val ev = spark.readStream
              .schema(spark.read.parquet(in).schema)
              .parquet(in)
              .withColumn("ts", col("ts").cast("timestamp"))
            val (frame, mode) = shape match {
              case "agg" =>
                (graft.streaming.Monitor.eventsWindowed(ev), "complete")
              case "dedup" =>
                (graft.streaming.Monitor.dedupStream(
                  ev.select(col("event_id"), col("user_id")),
                  Seq("event_id"))
                  .groupBy().agg(count(lit(1)).as("n")), "complete")
            }
            val q = frame.writeStream
              .outputMode(mode).format("memory").queryName(name)
              .option("checkpointLocation", ckpt)
              .trigger(
                org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            q.awaitTermination()
          }
          val n = spark.table(name).count()
          require(n > 0, "drain produced no rows")
          (System.nanoTime() - t0) / 1e9
        } finally {
          spark.conf.set("spark.graft.stream.statePartitions", prevSp)
          spark.catalog.dropTempView(name): Unit
        }
      }
      val results = Seq("agg", "dedup").map { shape =>
        // warmup on the floor (JIT/codegen), then timed: derived vs floor
        drainOnce("warm", 2, shape)
        val tFloor = Seq(drainOnce("floor1", 2, shape),
          drainOnce("floor2", 2, shape)).min
        val tDerived = Seq(drainOnce("der1", derived, shape),
          drainOnce("der2", derived, shape)).min
        f""""$shape":{"wall_floor_s":$tFloor%.3f,"wall_derived_s":$tDerived%.3f,"speedup":${tFloor / tDerived}%.3f}"""
      }
      println(
        s"""{"experiment":"stream_scale","seed_bytes":$seedBytes,"input_bytes":$bytes,"copies":$copies,"derived_partitions":$derived,"floor_partitions":2,${results.mkString(",")},"cpus":$cpus}""")
    } finally {
      graft.core.Fs.delete(dir.toString)
      spark.stop()
    }
  }
}
