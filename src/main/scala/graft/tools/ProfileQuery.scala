package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Job-level profiler for one SparkEntry query: runs the query once
  * untimed (warmup — JIT, codegen, FS metadata), then once timed with a
  * listener attached, and prints every Spark job's wall time with the
  * callsite that submitted it — the attribution step of the measure-
  * first loop (optimization guide §1) when a query is a multi-job
  * lifecycle whose returned frame's plan explains only the last read.
  *
  * Run: `sbt "runMain graft.tools.ProfileQuery <query> [repeat]"` with
  * `SPARK_GRAFT_SF_DIR` selecting data (default sf0.1).
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery <query> [repeat]")
    val name = args(0)
    val repeat = args.lift(1).map(_.toInt).getOrElse(1)
    require(SparkEntry.queries.contains(name), s"unknown query $name")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_PROFILE_CONF="k=v;k=v" layers extra session conf on
    // top of the bench's, for config-sensitivity experiments
    val extra = sys.env.get("SPARK_GRAFT_PROFILE_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val b0 = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = extra.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(): Unit = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      println(f"[profile] construct ${(t1 - t0) / 1e9}%.2f s, " +
        f"count ${(t2 - t1) / 1e9}%.2f s")
    }
    run() // warmup, unprofiled

    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val listener = new SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execDesc.put(s.executionId, s.description): Unit
        case _ =>
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val exec = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.root.id"))
            .orElse(Option(p.getProperty("spark.sql.execution.id"))))
          .flatMap(id => Option(execDesc.get(id.toLong)))
        val site = exec.getOrElse(
          js.stageInfos.lastOption.map(_.name).getOrElse("?"))
        starts.put(js.jobId, (js.time, site)): Unit
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          rows.add((je.time - t0, site)): Unit
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    (0 until repeat).foreach(_ => run())
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)

    import scala.jdk.CollectionConverters._
    val bySite = rows.asScala.toSeq.groupBy(_._2).map { case (site, rs) =>
      (rs.map(_._1).sum, rs.size, site)
    }.toSeq.sortBy(-_._1)
    println(f"== $name%s: $wall%.2f s wall, ${rows.size()}%d jobs ==")
    bySite.foreach { case (ms, n, site) =>
      println(f"  ${ms / 1e3}%8.3f s  $n%4d jobs  $site%s")
    }
    println(f"  ${bySite.map(_._1).sum / 1e3}%8.3f s  total job time")
    spark.stop()
  }
}
