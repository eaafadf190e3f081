package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scratch profiling harness for the shingle join (not part of CI
  * assertions — timings print to stdout). */
class NgramProfile extends AnyFunSuite {
  import graft.SparkSpec.spark

  test("profile ngram stages at sf0.1") {
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    // warmup
    docs.count()
    time("shingle explode count") {
      docs.select(explode(Dedup.shingles(col("text"), 3)).as("s")).count()
    }
    val ex = docs.select(col("doc_id").as("id"),
      explode(Dedup.shingles(col("text"), 3)).as("s"),
      size(Dedup.shingles(col("text"), 3)).as("nsh"))
    time("explode+size count") { ex.count() }
    val a = ex.select(col("id").as("id1"), col("s"), col("nsh").as("n1"))
    val b = ex.select(col("id").as("id2"), col("s"), col("nsh").as("n2"))
    time("join count") { a.join(b, Seq("s")).filter(col("id1") < col("id2")).count() }
    time("join+group count") {
      a.join(b, Seq("s")).filter(col("id1") < col("id2"))
        .groupBy("id1", "id2")
        .agg(count(lit(1)).as("inter"), first(col("n1")).as("n1"),
          first(col("n2")).as("n2"))
        .count()
    }
    val grouped = a.join(b, Seq("s")).filter(col("id1") < col("id2"))
      .groupBy("id1", "id2")
      .agg(count(lit(1)).as("inter"), first(col("n1")).as("n1"),
        first(col("n2")).as("n2"))
    time("group+jaccard no filter") {
      grouped.withColumn("jaccard", col("inter").cast("double") /
        (col("n1") + col("n2") - col("inter"))).count()
    }
    time("group+jaccard+filter") {
      grouped.withColumn("jaccard", col("inter").cast("double") /
        (col("n1") + col("n2") - col("inter")))
        .filter(col("jaccard") >= 0.5).count()
    }
    time("group+filter inter only") {
      grouped.filter(col("inter") >= 20).count()
    }
    time("group+jaccard+filter 2nd") {
      grouped.withColumn("jaccard", col("inter").cast("double") /
        (col("n1") + col("n2") - col("inter")))
        .filter(col("jaccard") >= 0.5).count()
    }
    time("collect instead of count") {
      grouped.withColumn("jaccard", col("inter").cast("double") /
        (col("n1") + col("n2") - col("inter")))
        .filter(col("jaccard") >= 0.5).collect().length
    }
    val full = Dedup.ngramJaccardPairs(docs, 3, 0.5)
    time("full ngram pairs") { full.count() }
    val p = full.queryExecution.executedPlan.toString
    println("[prof] ngram exchanges=" +
      "Exchange hash".r.findAllIn(p).length +
      " reused=" + "ReusedExchange".r.findAllIn(p).length +
      " scans=" + "Scan parquet".r.findAllIn(p).length)
    val mh = Dedup.minhashLshPairs(docs, 3, 64, 16, 0.5)
    time("full minhash pairs") { mh.count() }
    val p2 = mh.queryExecution.executedPlan.toString
    println("[prof] minhash exchanges=" +
      "Exchange hash".r.findAllIn(p2).length +
      " reused=" + "ReusedExchange".r.findAllIn(p2).length +
      " scans=" + "Scan parquet".r.findAllIn(p2).length)
  }
}
