package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scale design: the brute-force path is the exactness baseline — a
  * broadcast of the (small) query set against a single scan of the corpus,
  * per-partition top-k via window (no corpus shuffle, the only wide
  * exchange moves `|queries| * k` rows). The LSH path buckets the corpus
  * by random-hyperplane signatures computed with codegen'd expressions —
  * at 100 TB the corpus is hashed once, the bucket join replaces the full
  * cross product, and recall is tuned by `planes` (bucket granularity)
  * and multi-probe `hammingRadius`.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double with
    * a fixed left-to-right accumulation order (reproducible everywhere). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) =>
      x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (na * nb)
  }

  /** Exact top-k cosine neighbors for each query vector (brute force —
    * the correctness baseline and the small-query-set workhorse).
    * Output: (query_id, vec_id, score, rank), deterministic tiebreak on
    * neighbor id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val scored = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", cosine(col("v"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("score"), col("rank"))
  }

  /** Deterministic pseudo-random unit-ish hyperplanes (fixed seed). */
  def hyperplanes(dim: Int, planes: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane signature of a vector column: bit i = sign of
    * dot(v, plane_i). Composed from codegen'd array expressions. */
  def lshSignature(v: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      val dot = aggregate(zip_with(v, planeLit, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Signatures within Hamming distance `radius` of `sig` (multi-probe). */
  private def probeSignatures(sig: Column, planes: Int, radius: Int): Column = {
    require(radius <= 1, "multi-probe beyond radius 1 not implemented")
    if (radius == 0) array(sig)
    else array((sig +: (0 until planes).map(i =>
      sig.bitwiseXOR(lit(1L << i)))): _*)
  }

  /** LSH-bucketed approximate top-k: corpus hashed once into signature
    * buckets; each query probes its own bucket plus all Hamming-1
    * neighbors; exact cosine ranks candidates. Recall < 1 by construction
    * — tune `planes` down / `radius` up for higher recall. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 8, radius: Int = 1,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val hp = hyperplanes(64, planes)
    val bucketed = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"),
      lshSignature(col(vecCol), hp).as("sig"))
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        explode(probeSignatures(lshSignature(col(vecCol), hp), planes, radius))
          .as("sig")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    bucketed.join(q, Seq("sig"))
      .filter(col("vec_id") =!= col("query_id"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("score", cosine(col("v"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("score"), col("rank"))
  }

  /** Cosine near-duplicate pairs above a threshold among a (sub)corpus —
    * embedding-based dedup. Brute force within the given frame; pair it
    * with [[lshTopK]]-style bucketing for full-corpus scale. */
  def cosinePairs(corpus: DataFrame, threshold: Double,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(idCol).as("id1"), col(vecCol).as("v1"))
    val b = corpus.select(col(idCol).as("id2"), col(vecCol).as("v2"))
    a.crossJoin(b)
      .filter(col("id1") < col("id2"))
      .withColumn("score", cosine(col("v1"), col("v2")))
      .filter(col("score") >= threshold)
      .select(col("id1"), col("id2"), col("score"))
  }
}
