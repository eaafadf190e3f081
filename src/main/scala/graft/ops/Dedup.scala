package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.shim
import org.apache.spark.sql.types.{DataType, LongType, StringType, ArrayType}

/** Deduplication operators for training-data pipelines, each designed as a
  * shuffle-conscious distributed plan:
  *
  *   - exact: hash-groupBy on a canonical fingerprint — one shuffle on the
  *     16-byte digest, never on the document body;
  *   - shingle inverted index: candidate pairs come from an equi-join on
  *     shingles (only docs sharing a shingle ever meet), so the quadratic
  *     all-pairs comparison is avoided; hot shingles (stopword runs) are
  *     the skew risk — cap or salt them (`maxShingleFreq`);
  *   - MinHash + LSH banding: documents collapse to `numHashes` longs; the
  *     band join touches only same-bucket docs. Signature width, not corpus
  *     size, drives the shuffle payload — the 100 TB-scale path;
  *   - SimHash: one 64-bit fingerprint per document (custom Catalyst
  *     expression over the token array), near-dup = small Hamming
  *     distance, banded by 16-bit chunks for candidate generation;
  *   - embedding cosine: see [[Similarity]] for the kNN/LSH machinery.
  */
object Dedup {

  /** Exact duplicate groups by canonical fingerprint: one row per
    * duplicated content hash with the kept (minimum) id, the dropped
    * count, and member ids. */
  def exactGroups(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), Text.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keep_id"),
        sort_array(collect_list(col(idCol))).as("member_ids"))
      .filter(col("n") > 1)

  /** Distinct-keeper: one surviving row per canonical fingerprint (the
    * scalable `dropDuplicates` with an explicit deterministic keep rule). */
  def exactDedup(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val keep = docs
      .select(Text.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy("fp").agg(min(col(idCol)).as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Word n-gram shingles of a text column (distinct; empty array when the
    * text has fewer than n tokens — `sequence` would otherwise descend). */
  def shingles(text: Column, n: Int): Column = {
    val toks = Text.tokens(text)
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(1), size(toks) - lit(n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Near-duplicate pairs by exact n-gram Jaccard, with candidate
    * generation through a shingle inverted index (equi-join on shingle).
    * `maxShingleFreq` drops ubiquitous shingles from the index (stopword
    * runs) — the standard skew guard; exactness is preserved for pairs
    * that share at least one rarer shingle.
    * Output: (id1, id2, jaccard) with id1 < id2, jaccard >= threshold. */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double,
                        textCol: String = "text", idCol: String = "doc_id",
                        maxShingleFreq: Option[Int] = None): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val ex0 = sh.select(col("id"), explode(col("sh")).as("s"),
      size(col("sh")).as("nsh"))
    val ex = maxShingleFreq match {
      case Some(cap) =>
        val rare = ex0.groupBy("s").agg(count(lit(1)).as("freq"))
          .filter(col("freq") <= cap).select("s")
        ex0.join(rare, Seq("s"), "left_semi")
      case None => ex0
    }
    val a = ex.select(col("id").as("id1"), col("s"), col("nsh").as("n1"))
    val b = ex.select(col("id").as("id2"), col("s"), col("nsh").as("n2"))
    a.join(b, Seq("s"))
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("inter"),
        first(col("n1")).as("n1"), first(col("n2")).as("n2"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** MinHash signature: `numHashes` min-hash longs per document, computed
    * with the codegen'd xxhash64 over (shingle, permutation index). */
  def minhashSignature(sh: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map(i =>
      array_min(transform(sh, s => xxhash64(s, lit(i)))).as(s"mh$i"))

  /** MinHash + LSH banding near-dup detection:
    * shingle -> `numHashes` minhashes -> `bands` band-hashes -> bucket
    * join -> exact-Jaccard verification of candidates.
    * Output: (id1, id2, jaccard) verified pairs above threshold. */
  def minhashLshPairs(docs: DataFrame, n: Int, numHashes: Int, bands: Int,
                      threshold: Double, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sh = docs
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = sh.select(
      (col("id") +: col("sh") +: minhashSignature(col("sh"), numHashes)): _*)
    // band hash = xxhash64 of the band's minhash slice + band index
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64((lit(b) +: slice): _*).as("bh"))
    }
    // band buckets carry only (id, band, bandHash) — the shingle arrays
    // never enter the bucket shuffle (signature width, not doc size,
    // drives the payload)
    val buckets = sig.select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bh"))
    val l = buckets.select(col("band"), col("bh"), col("id").as("id1"))
    val r = buckets.select(col("band"), col("bh"), col("id").as("id2"))
    val candIds = l.join(r, Seq("band", "bh"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .dropDuplicates("id1", "id2")
    // exact verification on the candidate set only: join shingles back in
    val cand = candIds
      .join(sh.select(col("id").as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(sh.select(col("id").as("id2"), col("sh").as("sh2")), Seq("id2"))
    cand
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** 64-bit SimHash of the token array (Column form). */
  def simhash64(tokens: Column): Column =
    shim.column(SimHash64(shim.expression(tokens)))

  /** SimHash near-dup pairs: fingerprints banded into four 16-bit chunks
    * (a pair within Hamming distance 3 must agree on at least one chunk),
    * then exact popcount verification. */
  def simhashPairs(docs: DataFrame, maxHamming: Int,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val fp = docs.select(col(idCol).as("id"),
      simhash64(Text.tokens(col(textCol))).as("f"))
    val chunks = fp.select(col("id"), col("f"), explode(array(
      (0 until 4).map(i => struct(lit(i).as("c"),
        shiftrightunsigned(col("f"), i * 16).bitwiseAND(lit(0xFFFFL)).as("v"))): _*))
      .as("ch"))
      .select(col("id"), col("f"), col("ch.c"), col("ch.v"))
    val l = chunks.select(col("c"), col("v"), col("id").as("id1"), col("f").as("f1"))
    val r = chunks.select(col("c"), col("v"), col("id").as("id2"), col("f").as("f2"))
    l.join(r, Seq("c", "v"))
      .filter(col("id1") < col("id2"))
      .dropDuplicates("id1", "id2")
      .withColumn("hamming", bit_count(col("f1").bitwiseXOR(col("f2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }
}

/** Deterministic 64-bit SimHash over an array of string tokens: each token
  * hashes to 64 bits (two seeded MurmurHash3 halves — stdlib, stable across
  * JVMs); bit positions vote +1/-1 weighted by occurrence; the sign vector
  * is the fingerprint.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        val lo = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x9747b28c)
        val hi = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x5bd1e995)
        val h = (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
