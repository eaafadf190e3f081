package graft.queries

/** Diagnostic twin of [[PlanDump]]: execute a query and print the
  * ADAPTIVE final plan. Static explain shows structurally identical
  * exchanges duplicated; whether AQE stage reuse actually collapses
  * them (ReusedExchange) is only visible here. Usage:
  * `sbt "Test/runMain graft.queries.ReuseProbe q_doc_overlap"`.
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.spark
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      df.collect()
      println(s"===== $name (executed) =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
