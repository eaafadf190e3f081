package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Perf sanity for the dedup pipelines at sf0.1 (timings print to stdout;
  * the assertion is a generous regression ceiling, not a benchmark). */
class NgramProfile extends AnyFunSuite {
  import graft.SparkSpec.spark

  test("dedup pipelines stay within the regression ceiling at sf0.1") {
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count() // warmup
    def time[A](label: String)(f: => A): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[prof] $label: $s%.2fs"); s
    }
    val ngram = Dedup.ngramJaccardPairs(docs, 3, 0.5)
    val tN = time("ngram pairs")(ngram.count())
    val mh = Dedup.minhashLshPairs(docs, 3, 64, 16, 0.5)
    val tM = time("minhash pairs")(mh.count())
    val p = ngram.queryExecution.executedPlan.toString
    println("[prof] ngram scans=" + "Scan parquet".r.findAllIn(p).length)
    // local[4] test session: both were ~50s before the one-pass shingle
    // expression and lean-join redesign; a 20s ceiling catches any
    // regression to per-element re-evaluation
    assert(tN < 20.0 && tM < 20.0, s"dedup perf regression: $tN / $tM")
  }
}
