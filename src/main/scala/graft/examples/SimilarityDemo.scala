package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** The embedding-similarity toolbox end to end on the synthetic corpus:
  * int8 quantization (the 4x storage cut + fidelity readout), exact
  * cell-blocked near-dup pairs, the LSH ANN candidate path, and
  * SemDeDup-style cluster-and-keep — both the exact and the ANN variant.
  * Run: `sbt "runMain graft.examples.SimilarityDemo [sfDir]"`.
  */
object SimilarityDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-similarity-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    println(s"corpus: ${emb.count()} vectors")

    // int8 quantization: 4x smaller embeddings, fidelity readout
    val quant = emb
      .withColumn("scale", Similarity.quantScale(col("embedding")))
      .withColumn("q", Similarity.quantize(col("embedding"), col("scale")))
    val fidelity = quant.select(Similarity.cosine(
      Similarity.dequantize(col("q"), col("scale")),
      col("embedding")).as("c"))
      .agg(min("c").as("worst"), avg("c").as("mean")).head()
    println(f"int8 roundtrip cosine: worst=${fidelity.getDouble(0)}%.6f " +
      f"mean=${fidelity.getDouble(1)}%.6f")

    // exact near-dup pairs (cell-blocked, recall 1.0) vs ANN candidates
    val exact = Similarity.cosinePairs(emb, 0.4).cache()
    val ann = Similarity.annCosinePairs(emb, 0.4, radius = 2).cache()
    println(s"pairs >= 0.4: exact=${exact.count()} ann=${ann.count()}" +
      " (ann recall is threshold-dependent; see annCosinePairs scaladoc)")

    // SemDeDup: one survivor per near-dup cluster
    val kept = Similarity.semanticDedup(emb, 0.4)
    val keptAnn = Similarity.semanticDedupAnn(emb, 0.4)
    println(s"semantic dedup survivors: exact=${kept.count()} " +
      s"ann=${keptAnn.count()} of ${emb.count()}")
    exact.unpersist(); ann.unpersist()

    // the ANN serving ladder at one config: brute force (the answer),
    // int8 two-stage, and a persisted PQ index (4 bytes/vector code
    // table + frozen codebooks; new arrivals append without retraining)
    val qs = emb.filter(col("vec_id").isin(0L, 1L, 2L))
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = hits(Similarity.bruteForceTopK(emb, qs, 5))
    val i8 = hits(Similarity.quantizedTopK(emb, qs, 5, candidates = 20))
    val idx = java.nio.file.Files
      .createTempDirectory("graft-simdemo-pq").toString + "/idx"
    Similarity.buildPqIndex(emb, idx, m = 4, codewords = 16,
      targetTrain = 16000L)
    val pq = hits(Similarity.pqSearch(emb, qs, idx, 5, candidates = 100))
    println(s"top-5 recall vs brute: int8=${
      i8.intersect(brute).size}/${brute.size} pq=${
      pq.intersect(brute).size}/${brute.size}")
    spark.stop()
  }
}
