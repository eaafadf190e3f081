package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops._

/** The curation-SELECTION layer a pretraining pipeline runs after the
  * classic cleaning funnel ([[TrainingDataDemo]]) — deciding not just
  * what is clean, but what is WORTH training on and in what order:
  *
  *   C4 page gate → exact-substring (passage) dedup → DSIR importance
  *   scoring against a target domain + K-domain routing → embedding
  *   prototypicality pruning → priority-sampled token-weighted corpus
  *   snapshot → source-preference merge + cross-corpus Bloom
  *   decontamination → DoReMi mixture weights → temperature-flattened
  *   mixture → curriculum order
  *
  * Every stage is deterministic (no rand()), so the whole layer is
  * re-runnable and auditable: the same corpus always yields the same
  * selection, the same sample, and the same training order.
  * Run: `sbt "runMain graft.examples.CurationDemo [sfDir]"`.
  */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-curation-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n0 = docs.count()

    // 1. C4 page gate on synthesized page structure (the bundled corpus
    //    is flat single-line text; a real crawl passes its pages
    //    directly). Three token-slice sentences make a well-formed page.
    val toks = Text.tokens(col("text"))
    def sent(a: Int) = concat(concat_ws(" ", slice(toks, a, 8)), lit("."))
    val paged = docs.withColumn("page",
      concat_ws("\n", sent(1), sent(9), sent(17), sent(25)))
    val gated = paged.filter(Text.c4Keep(col("page")))
    val n1 = gated.count()
    println(s"c4 gate: $n0 -> $n1 pages")

    // 2. passage-level dedup: cut every 8-token span occurring twice+
    //    corpus-wide (license headers, quoted boilerplate), then drop
    //    docs left with fewer than 8 tokens
    val cleaned = SpanDedup.removeDuplicatedSpans(gated, k = 8)
      .withColumn("text", col("clean_text"))
      .filter(Text.tokenCount(col("text")) >= 8)
    val nSpans = SpanDedup.duplicatedSpans(gated, k = 8).count()
    val n2 = cleaned.count()
    println(s"span dedup: $nSpans duplicated spans cut; $n1 -> $n2 docs")

    // 1b. gate attribution BEFORE committing to the chain: which rule
    //     would drop what, and where does each dropped doc get blamed
    val funnel = Profile.gateAttribution(docs, Seq(
      "nonempty" -> col("text").isNotNull,
      "min_tokens" -> (Text.tokenCount(col("text")) >= 10),
      "quality" -> (Text.qualityScore(col("text")) >= 0.5)))
      .collect().map(r => s"${r.getString(1)}: alone=${r.getLong(2)} " +
        s"blame=${r.getLong(3)} surviving=${r.getLong(4)}").mkString("; ")
    println(s"gate attribution: $funnel")

    // 2b. CCNet-style LM filter: train the stupid-backoff bigram model
    //     on the corpus itself, bucket each SOURCE into head/middle/
    //     tail by log-loss (the partitioned window — per-source
    //     tertiles also keep one source's register from eating
    //     another's budget), and drop the tail tertile (word salad,
    //     wrong register); docs with no bigrams carry no LM evidence
    //     and pass
    val ll = Text.bigramLogLoss(cleaned, topV = 500)
      .join(cleaned.select(col("doc_id").as("id"), col("source")),
        Seq("id"))
    val tail3 = ll.withColumn("b", ntile(3).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(col("logloss"), col("id"))))
      .filter(col("b") === 3).select(col("id").as("doc_id"))
    val lmKept = cleaned.join(tail3, Seq("doc_id"), "left_anti")
    val n2b = lmKept.count()
    println(s"bigram-LM filter: $n2 -> $n2b docs (tail tertile cut)")

    // 3. DSIR: score every doc by how target-like it is (target = the
    //    src1 slice, standing in for a curated high-quality domain),
    //    keep the top half; then route survivors across two domains
    val target = cleaned.filter(col("source") === "src1")
    val raw = cleaned.filter(col("source") =!= "src1")
    val selected = Dsir.dsirSelect(raw, target, n = (n2 / 2).toInt,
      buckets = 4096)
    val routed = Dsir.domainRoute(cleaned,
      Seq("code" -> cleaned.filter(col("source") === "src2"),
        "prose" -> cleaned.filter(col("source") === "src3")),
      buckets = 4096)
    val routeMix = routed.groupBy(col("domain")).count()
      .orderBy(col("domain")).collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")
    println(s"dsir: kept top ${selected.count()} target-like docs; " +
      s"routing $routeMix")

    // 4. embedding-space diversity: prune each IVF cluster to its 60%
    //    LEAST prototypical members (Sorscher et al.: on abundant data,
    //    keep the hard examples)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pruned = Similarity.prototypicalityPrune(emb,
      keepPerCluster = 60, keepLeast = true, trainFraction = 0.5)
    println(s"proto prune: ${emb.count()} -> ${pruned.count()} vectors")

    // 5. priority sample: a token-weighted 200-doc corpus snapshot
    //    whose est_weight makes any subset token-count unbiased —
    //    the deterministic alternative to rand() subsampling for
    //    eval slices and ablations
    val snapshot = Sampling.prioritySample(cleaned, col("doc_id"),
      Text.tokenCount(col("text")).cast("double"), n = 200)
    val estTok = snapshot.agg(sum(col("est_weight"))).head().getDouble(0)
    val trueTok = cleaned.agg(sum(Text.tokenCount(col("text"))
      .cast("double"))).head().getDouble(0)
    println(f"priority snapshot: 200 docs estimate " +
      f"$estTok%.0f of $trueTok%.0f corpus tokens " +
      f"(${100 * estTok / trueTok}%.1f%%)")

    // 5b. source-preference dedup + cross-corpus bloom decontamination:
    //     duplicate content keeps the most-trusted source's copy, and
    //     anything overlapping the frozen "last-release" reference
    //     (here: the doc_id < 40 slice) is dropped through the Bloom
    //     prefilter + exact-verify path
    val merged = Dedup.preferSource(cleaned, Seq("src1", "src3"))
      .drop("n_copies")
    val released = Contamination.bloomDecontaminate(
      merged.filter(col("doc_id") >= 40), docs.filter(col("doc_id") < 40),
      n = 3, minShared = 5, expectedItems = 500000L)
    println(s"prefer-source + bloom decontam: $n2 -> ${merged.count()} " +
      s"-> ${released.count()} docs")

    // 5b2. retrieval audit: the released corpus goes behind a
    //      persisted BM25 inverted index (build once, probe many — the
    //      spot-check surface reviewers use to ask "what does the
    //      corpus say about X"), searched here for one probe
    val idxRoot = java.nio.file.Files
      .createTempDirectory("graft-demo-bm25-").toString
    val bm25Idx = s"$idxRoot/idx"
    Retrieval.appendToBm25Index(released, bm25Idx)
    val probe = Retrieval.bm25Search(spark, bm25Idx,
      Seq("hash", "join", "window"), k = 3)
      .collect().map(r => s"${r.getLong(0)}").mkString(", ")
    println(s"bm25 index probe [hash join window]: top docs $probe")
    graft.core.Fs.delete(idxRoot)

    // 5c. DoReMi mixture weights over the surviving sources (excess
    //     loss proxied by chars-per-token; real proxy/reference scores
    //     enter through the Score seam)
    val weights = Dsir.domainReweight(released,
      excess = length(col("text")).cast("double")
        / Text.tokenCount(col("text")) - lit(4.5),
      domain = col("source"), steps = 2)
      .orderBy(col("weight").desc).limit(3).collect()
      .map(r => f"${r.getString(0)}=${r.getDouble(2)}%.3f").mkString(" ")
    println(s"doremi top weights: $weights")

    // 6. temperature-flatten the source mixture (alpha=0.5), then fix
    //    the training order: sources as curriculum stages, hash-shuffled
    //    within each stage — no global sort at any step
    val mixed = Sampling.temperatureSample(cleaned, col("source"),
      col("doc_id"), alpha = 0.5)
    val stages = mixed.select(col("source")).distinct()
      .orderBy(col("source")).collect().map(_.getString(0)).toSeq
    val ordered = Sampling.curriculumOrder(mixed, col("source"),
      col("doc_id"), stages)
    val head = ordered.orderBy(col("position")).limit(3)
      .collect().map(r => r.getAs[Long]("doc_id")).mkString(", ")
    println(s"curriculum: ${mixed.count()} docs over " +
      s"${stages.size} stages; training starts with docs $head")

    spark.stop()
  }
}
