package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

import graft.SparkEntry
import graft.core.Fs

/** Writes the FULL `.explain("formatted")` output of named SparkEntry
  * queries to one file each — the optimization-round evidence trail
  * (`plans/r15/<query>_<suffix>.txt`). Unlike [[DumpPlans]] (which
  * curates PLANS.md excerpts), this dumps everything: operator tree,
  * per-operator details, PushedFilters, ReadSchema.
  *
  * Run: `sbt "runMain graft.tools.ExplainDump <outDir> <suffix> <q...>"`
  * with `SPARK_GRAFT_SF_DIR` selecting the data (default sf0.01).
  * Queries whose closures run eager side work (index builds, stream
  * drains) pay that work here; the dumped plan is the returned frame's.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <outDir> <suffix> <q...>")
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-explain-dump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(FormattedMode)
      Fs.writeString(s"$outDir/${name}_$suffix.txt",
        s"== $name @ $sfDir ==\n\n" + plan)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
