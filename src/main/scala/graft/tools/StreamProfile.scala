package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.SparkEntry

/** Trigger-level profiler for the q_stream_* family: runs each named
  * query once untimed (warmup) then `repeat` timed runs with a
  * StreamingQueryListener attached, and prints every trigger's
  * durationMs breakdown (triggerExecution = addBatch + getBatch +
  * latestOffset + queryPlanning + walCommit + commitOffsets + ...)
  * plus the stream-lifecycle gaps the progress events cannot see
  * (query START cost before the first trigger, stop cost after the
  * last). This is the attribution step for the per-drain fixed cost
  * the round-15 verdict flagged (~0.8-1.3 s x 34 streaming queries):
  * which part is WAL fsync, which is source listing, which is
  * per-batch planning, which is stream start/stop machinery.
  *
  * Run: `sbt "runMain graft.tools.StreamProfile <q1,q2,...> [repeat]"`
  * with `SPARK_GRAFT_SF_DIR` selecting data (default sf0.1).
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StreamProfile <q1,q2,...> [repeat]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val repeat = args.lift(1).map(_.toInt).getOrElse(2)
    names.foreach(n => require(SparkEntry.queries.contains(n),
      s"unknown query $n"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val extra = sys.env.get("SPARK_GRAFT_PROFILE_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val b0 = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-stream-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = extra.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-trigger duration maps, in arrival order, plus query start/end
    // wall-clock from the lifecycle events
    case class Ev(kind: String, at: Long, durations: Map[String, Long],
                  batchId: Long, rows: Long)
    val events = new java.util.concurrent.ConcurrentLinkedQueue[Ev]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = {
        events.add(Ev("started", System.nanoTime(), Map.empty, -1, -1)); ()
      }
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        import scala.jdk.CollectionConverters._
        val d = e.progress.durationMs.asScala.map {
          case (k, v) => (k, v.longValue())
        }.toMap
        events.add(Ev("progress", System.nanoTime(), d,
          e.progress.batchId, e.progress.numInputRows)); ()
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
        events.add(Ev("terminated", System.nanoTime(), Map.empty, -1, -1)); ()
      }
    }

    for (name <- names) {
      // warmup run: JIT, codegen cache, FS metadata
      SparkEntry.queries(name)(spark, sfDir).count()
      spark.streams.addListener(listener)
      events.clear()
      val t0 = System.nanoTime()
      var constructS = 0.0
      (0 until repeat).foreach { _ =>
        val c0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        constructS += (System.nanoTime() - c0) / 1e9
        df.count()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      // the listener bus is async — give terminal events a beat to land
      Thread.sleep(300)
      spark.streams.removeListener(listener)
      import scala.jdk.CollectionConverters._
      val evs = events.asScala.toSeq.sortBy(_.at)
      println(f"== $name%s: $wall%.2f s wall over $repeat runs " +
        f"(construct+drain $constructS%.2f s) ==")
      // aggregate durationMs keys over all triggers
      val agg = scala.collection.mutable.LinkedHashMap[String, Long]()
      var nTrig = 0
      evs.filter(_.kind == "progress").foreach { ev =>
        nTrig += 1
        ev.durations.foreach { case (k, v) =>
          agg(k) = agg.getOrElse(k, 0L) + v
        }
      }
      println(s"  triggers: $nTrig  (plus starts: " +
        s"${evs.count(_.kind == "started")}, terms: " +
        s"${evs.count(_.kind == "terminated")})")
      agg.toSeq.sortBy(-_._2).foreach { case (k, ms) =>
        println(f"    ${ms / 1e3}%8.3f s  $k%s")
      }
      // lifecycle gap analysis: time from query start to first trigger
      // and between last trigger and termination, summed over runs
      var preFirst = 0L; var postLast = 0L
      var lastStart = -1L; var lastProgress = -1L
      evs.foreach { ev =>
        ev.kind match {
          case "started" => lastStart = ev.at; lastProgress = -1L
          case "progress" =>
            if (lastStart >= 0 && lastProgress < 0)
              preFirst += ev.at - lastStart
            lastProgress = ev.at
          case "terminated" =>
            if (lastProgress >= 0) postLast += ev.at - lastProgress
            lastStart = -1L
          case _ =>
        }
      }
      println(f"    ${preFirst / 1e9}%8.3f s  start->first-trigger (all runs)")
      println(f"    ${postLast / 1e9}%8.3f s  last-trigger->terminated (all runs)")
    }
    spark.stop()
  }
}
