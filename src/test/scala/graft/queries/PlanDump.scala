package graft.queries

import org.apache.spark.sql.execution.FormattedMode

/** Dumps the formatted physical plan of named SparkEntry queries — the
  * source of the PLANS.md listings. Usage:
  * `sbt "Test/runMain graft.queries.PlanDump q_dedup_ngram q_embed_pairs"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.spark
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      println(s"===== $name =====")
      println(df.queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
