package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops._

/** The full training-data curation funnel, end to end on the bundled
  * corpus — the pipeline a 100 TB pretraining run would execute, each
  * stage one of the engine's operators:
  *
  *   corpus triage (overlap matrix, robust outliers, term drift) →
  *   quality/language/Gopher gate → PII scrub → exact dedup → near-dup
  *   clustering (MinHash-LSH pairs → connected components →
  *   best-quality survivors) → benchmark decontamination →
  *   token-budget mixture → per-source quality budget →
  *   leakage-safe split → sequence packing → epoch-shuffled shards
  *
  * Run: `sbt "runMain graft.examples.TrainingDataDemo [sfDir]"`.
  */
object TrainingDataDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-training-data-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n0 = docs.count()

    // 0b. corpus triage BEFORE touching anything: cross-source overlap
    //     (is a dump redundant?), robust length outliers (ingest bugs),
    //     per-source distribution drift (mixture sanity)
    val topOverlap = Text.sourceNgramOverlap(docs, n = 3).limit(1)
      .collect().headOption
      .map(r => f"${r.getString(0)}~${r.getString(1)} j=${r.getDouble(5)}%.3f")
      .getOrElse("none")
    val nOutliers = Profile.robustOutliers(docs, "n_chars", "source",
      z = 2.5).count()
    val maxDrift = Text.termDrift(docs, topV = 50)
      .orderBy(col("kl").desc).limit(1).collect().headOption
      .map(r => f"${r.getString(0)} kl=${r.getDouble(2)}%.4f")
      .getOrElse("none")
    println(s"triage: top overlap $topOverlap; " +
      s"$nOutliers length outliers; max drift $maxDrift")

    // 1. quality + language gate (cheap per-row scalars, shuffle-free):
    //    composite score, language id, and the Gopher rule set — all
    //    codegen'd predicates that push into the scan
    val gated = docs
      .withColumn("lang", Text.langId(col("text")))
      .withColumn("q", Text.qualityScore(col("text")))
      .filter(col("lang") === "en" && col("q") >= 0.3)
      .filter(Text.gopherKeep(col("text"), minWords = 10))
    val n1 = gated.count()

    // 2. PII scrub (per-row regexp chain)
    val clean = gated.withColumn("text", Text.redactPii(col("text")))

    // 3. exact dedup (hash-groupBy keep-first)
    val exact = Dedup.exactDedup(clean)
    val n2 = exact.count()

    // 4. near-dup removal: MinHash-LSH pairs -> connected components ->
    //    each cluster keeps its BEST-quality member (the q column is
    //    already there — survivors should be the good copies, not the
    //    min-id ones)
    val pairs = Dedup.minhashLshPairs(exact, n = 3, numHashes = 64,
      bands = 16, threshold = 0.5)
    val survivors = Dedup.keepClusterBest(exact, pairs, col("q"))
    val n3 = survivors.count()

    // 5. benchmark decontamination (docs sharing 8-gram spans with a
    //    held-out eval set are dropped; eval set faked from the corpus
    //    tail so the demo is self-contained)
    val benchmark = docs.orderBy(col("doc_id").desc).limit(5)
      .select(col("doc_id").as("bench_id"), col("text"))
    val decon = Contamination.decontaminate(survivors, benchmark,
      n = 8, minShared = 1)
    val n4 = decon.count()

    // 5b. token-budget mixture: group the 20 sources into three domains
    //     (a stand-in for web/books/code) and rebalance to a 3:2:1 TOKEN
    //     mixture — what a pretraining recipe actually specifies.
    //     Strata not listed in the weights would drop: the stratum must
    //     cover the corpus you mean to keep.
    val domain = concat(lit("d"),
      (substring(col("source"), 4, 10).cast("int") % 3).cast("string"))
    val mixed = Sampling.mixtureByTokens(
      decon.withColumn("domain", domain), col("domain"),
      col("doc_id"), Text.tokenCount(col("text")),
      Map("d0" -> 3L, "d1" -> 2L, "d2" -> 1L)).drop("domain")
    val n5 = mixed.count()

    // 5c. within the mixture, keep each source's best-quality docs up
    //     to a token cap — the final quality squeeze after rebalancing
    val capped = Sampling.selectByQualityBudget(mixed, col("source"),
      col("doc_id"), Text.tokenCount(col("text")), col("q"),
      mixed.select("source").distinct().collect()
        .map(r => r.getString(0) -> 800L).toMap)
    val n5c = capped.count()

    // 6. leakage-safe split: every doc of a source lands in one part
    val split = capped.withColumn("part", Sampling.splitColumn(col("source"),
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)))
    val bySplit = split.groupBy("part").count().orderBy("part").collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", ")

    // 7. pack the train part into fixed token budgets
    val packed = Packing.packSequences(
      split.filter(col("part") === "train"), maxTokens = 2048)
    val nBins = packed.select("bin_id").distinct().count()

    // 8. epoch-shuffled training shards: deterministic per-epoch
    //    permutation, range-partitioned so shard order IS epoch order
    val shardDir = java.nio.file.Files
      .createTempDirectory("graft-demo-shards").toString
    Sampling.writeEpochShards(split.filter(col("part") === "train"),
      shardDir, col("doc_id"), epoch = 1, numShards = 4)
    val nShardFiles = new java.io.File(shardDir).listFiles()
      .count(_.getName.endsWith(".parquet"))

    println(s"corpus:           $n0 docs")
    println(s"quality/lang/gopher gate: $n1 kept")
    println(s"exact dedup:       $n2 kept")
    println(s"near-dup clusters: $n3 kept")
    println(s"decontamination:   $n4 kept")
    println(s"token mixture:     $n5 kept (3:2:1 tokens over domains)")
    println(s"quality budget:    $n5c kept (best-first, 800 tok/source)")
    println(s"splits:            $bySplit")
    println(s"packing:           $nBins bins of <= 2048 tokens")
    println(s"epoch shards:      $nShardFiles files at $shardDir")
    require(n0 >= n1 && n1 >= n2 && n2 >= n3 && n3 >= n4 && n4 >= n5
      && n5 >= n5c, "funnel must be monotone")
    require(n5c > 0, "pipeline should keep something")
    spark.stop()
    println("training-data demo OK")
  }
}
