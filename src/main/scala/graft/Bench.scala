package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  * One untimed warmup pass absorbs JIT/codegen/caching noise; the timed
  * pass is what a steady-state cluster job would see.
  */
object Bench {

  /** Representative heavy queries across the engine's surfaces:
    * relational scan/agg/join/window, the sweep pipeline, and the
    * training-data ops (dedup, similarity, text). */
  val headline: Seq[String] = Seq(
    "q_agg_pricing", "q_join_stars", "q_filter_proj", "q_window_rank",
    "q_dedup_first", "q_events_hourly", "q_events_sessionize",
    "q_events_asof",
    "q_dedup_ngram", "q_dedup_minhash", "q_dedup_simhash",
    "q_embed_topk", "q_embed_ivf", "q_doc_quality", "q_doc_langid",
    "q_doc_tfidf", "q_doc_contamination",
    "q_run_sweep",
    // round 2 additions (kept after the stable 18 for round-over-round
    // comparability): exact cell-blocked cosine pair mining, the
    // winnowing fingerprint explode, per-source caps, exact-count
    // mixture resampling, and semantic embedding dedup
    "q_embed_pairs", "q_doc_winnow",
    "q_doc_hostcap", "q_doc_mixture", "q_embed_semdedup",
    // the end-to-end funnel: gate -> near-dup dedup -> split -> stats
    "q_doc_funnel")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = headline.filter(SparkEntry.queries.contains)
    // warmup: JIT, codegen caches, FS metadata
    qs.foreach { name =>
      try { SparkEntry.queries(name)(spark, sfDir).count(); () }
      catch { case _: Throwable => () }
    }
    // min of two timed passes (the reference's own benchmark pattern:
    // min(timeit.repeat(...)), ref examples/benchmark_shell_command.py)
    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count(); () }
      catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    val results = qs.map { name =>
      name -> math.min(timeOnce(name), timeOnce(name))
    }
    val qJson = results
      .map { case (k, v) => "\"" + k + f"\":$v%.4f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.4f,"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
