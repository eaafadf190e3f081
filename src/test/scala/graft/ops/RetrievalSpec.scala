package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** BM25 retrieval, term-distribution drift, and PMI collocations on
  * hand-computable fixtures. Expected values are recomputed with plain
  * Scala arithmetic in the test (independent of the engine's Column
  * expressions), the same way the DuckDB oracles recompute them in SQL.
  */
class RetrievalSpec extends AnyFunSuite {
  import graft.SparkSpec.spark
  import spark.implicits._

  test("bm25TopK matches an independently computed score and order") {
    val docs = Seq(
      (0L, "apple banana apple"),
      (1L, "apple cherry"),
      (2L, "banana banana banana durian"),
      (3L, "cherry durian cherry durian")
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, Seq("apple", "banana"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

    // independent recomputation (plain doubles, same formula)
    val toks = Map(0L -> Seq("apple", "banana", "apple"),
      1L -> Seq("apple", "cherry"),
      2L -> Seq("banana", "banana", "banana", "durian"),
      3L -> Seq("cherry", "durian", "cherry", "durian"))
    val n = 4.0
    val avgdl = toks.values.map(_.size).sum / n
    val (k1, b) = (1.2, 0.75)
    def score(id: Long): Double = Seq("apple", "banana").map { t =>
      val tf = toks(id).count(_ == t).toDouble
      val df = toks.values.count(_.contains(t)).toDouble
      val idf = math.log(1d + (n - df + 0.5) / (df + 0.5))
      idf * tf * (k1 + 1) /
        (tf + k1 * (1 - b + b * toks(id).size / avgdl))
    }.sum
    val want = toks.keys.toSeq
      .map(id => (id, math.floor(score(id) * 1e6) / 1e6))
      .filter(_._2 > 0)
      .sortBy { case (id, s) => (-s, id) }
    assert(got.toSeq == want) // doc 3 (no match) excluded
    assert(!got.map(_._1).contains(3L))
  }

  test("bm25TopKBatch agrees with the map-side single-query path") {
    val docs = Seq(
      (0L, "apple banana apple"),
      (1L, "apple cherry"),
      (2L, "banana banana banana durian"),
      (3L, "cherry durian cherry durian")
    ).toDF("doc_id", "text")
    val single = Retrieval.bm25TopK(docs, Seq("apple", "banana"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val queries = Seq((7L, "apple"), (7L, "banana"), (8L, "durian"))
      .toDF("query_id", "term")
    val batch = Retrieval.bm25TopKBatch(docs, queries, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val q7 = batch.filter(_._1 == 7L).sortBy(_._4)
      .map(r => (r._2, r._3))
    assert(q7.toSeq == single.toSeq)
    // single-term query: rank order by rounded score then id
    val q8 = batch.filter(_._1 == 8L).map(_._2)
    assert(q8.toSet == Set(2L, 3L)) // only durian docs
  }

  test("bm25 index: search over appended batches equals the map-side " +
    "scorer; split point cannot move a score; compaction preserves; " +
    "null-text docs count toward N") {
    import graft.SparkSpec.tmpDir
    val docs = Seq(
      (0L, "apple banana apple"),
      (1L, "apple cherry"),
      (2L, "banana banana banana durian"),
      (3L, "cherry durian cherry durian"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val terms = Seq("apple", "banana")
    val want = Retrieval.bm25TopK(docs, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    def build(splitAt: Long, compact: Boolean): Seq[(Long, Double)] = {
      val p = tmpDir("graft-bm25-") + "/idx"
      Retrieval.appendToBm25Index(docs.filter(col("doc_id") < splitAt), p)
      if (compact) Retrieval.compactBm25Index(spark, p)
      Retrieval.appendToBm25Index(docs.filter(col("doc_id") >= splitAt), p)
      Retrieval.bm25Search(spark, p, terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    assert(build(2L, compact = false) == want)
    assert(build(4L, compact = true) == want)
    // the null-text doc (4) must raise N without postings: drop it and
    // scores change, proving it was counted
    val p2 = tmpDir("graft-bm25-") + "/idx"
    Retrieval.appendToBm25Index(docs.filter(col("doc_id") < 4L), p2)
    val without = Retrieval.bm25Search(spark, p2, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(without.map(_._1) == want.map(_._1) && without != want)
  }

  test("bm25 index: re-appending a batch fails fast (key digest and " +
    "caller batch ids); skipDuplicate makes the replay a no-op") {
    import graft.SparkSpec.tmpDir
    val docs = Seq((0L, "apple banana"), (1L, "apple cherry"))
      .toDF("doc_id", "text")
    val p = tmpDir("graft-bm25-dup-") + "/idx"
    assert(Retrieval.appendToBm25Index(docs, p))
    // identical content → same order-free key digest → guard fires
    val e = intercept[IllegalStateException](
      Retrieval.appendToBm25Index(docs.orderBy(col("doc_id").desc), p))
    assert(e.getMessage.contains("at-most-once"))
    // the streaming-sink mode skips instead, leaving scores unchanged
    val before = Retrieval.bm25Search(spark, p, Seq("apple"), k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(!Retrieval.appendToBm25Index(docs, p, skipDuplicate = true))
    val after = Retrieval.bm25Search(spark, p, Seq("apple"), k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == before)
    // caller-supplied ids guard independently of content
    val more = Seq((2L, "banana durian")).toDF("doc_id", "text")
    assert(Retrieval.appendToBm25Index(more, p, batchId = Some("b2")))
    intercept[IllegalStateException](Retrieval.appendToBm25Index(
      Seq((3L, "cherry")).toDF("doc_id", "text"), p, batchId = Some("b2")))
    // a distinct batch still appends and search sees it
    assert(Retrieval.appendToBm25Index(
      Seq((3L, "apple apple")).toDF("doc_id", "text"), p,
      batchId = Some("b3")))
    assert(Retrieval.bm25Search(spark, p, Seq("apple"), k = 5)
      .collect().map(_.getLong(0)).contains(3L))
  }

  test("bm25 index: a pre-upgrade stream:<bid> stats row still dedups " +
    "the lineage-qualified stream:<lineage>:<bid> replay") {
    import graft.SparkSpec.tmpDir
    val p = tmpDir("graft-bm25-legacy-") + "/idx"
    val docs = Seq((0L, "apple banana")).toDF("doc_id", "text")
    // an index fed by the OLD sink format (bid-only identity)
    assert(Retrieval.appendToBm25Index(docs, p, batchId = Some("stream:0")))
    // the upgraded sink replays the same committed micro-batch with the
    // lineage-qualified id: must be a no-op, not a double-append
    assert(!Retrieval.appendToBm25Index(docs, p,
      batchId = Some("stream:deadbeef:0"), skipDuplicate = true))
    // a genuinely new batch under the new format still appends
    assert(Retrieval.appendToBm25Index(
      Seq((1L, "cherry")).toDF("doc_id", "text"), p,
      batchId = Some("stream:deadbeef:1"), skipDuplicate = true))
  }

  test("bm25 index: empty batches short-circuit — no stats row, no " +
    "digest collision between two distinct empty batches") {
    import graft.SparkSpec.tmpDir
    val p = tmpDir("graft-bm25-empty-") + "/idx"
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // two DISTINCT empty batches: both are no-ops, neither throws (the
    // old auto-digest degenerated to "keys:null:0" for every empty
    // batch, so the second collided with the first)
    assert(!Retrieval.appendToBm25Index(empty, p))
    assert(!Retrieval.appendToBm25Index(empty, p))
    assert(!Retrieval.appendToBm25Index(empty, p, batchId = Some("e1")))
    // a real batch then appends cleanly, and stats holds ONLY its row
    assert(Retrieval.appendToBm25Index(
      Seq((0L, "apple banana")).toDF("doc_id", "text"), p))
    assert(spark.read.parquet(s"$p/stats").count() == 1L)
  }

  test("bm25TopK rejects empty, duplicate, and oversized term sets") {
    val docs = Seq((0L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Retrieval.bm25TopK(docs, Nil, 5))
    intercept[IllegalArgumentException](
      Retrieval.bm25TopK(docs, Seq("a", "a"), 5))
    intercept[IllegalArgumentException](
      Retrieval.bm25TopK(docs, (1 to 65).map("t" + _), 5))
  }

  test("termDrift: a group mirroring the corpus has kl 0, a skewed one > 0") {
    // srcA and srcB are identical -> each matches the corpus exactly;
    // srcC is all-"x" -> positive divergence
    val docs = Seq(
      ("srcA", "x y z"), ("srcB", "x y z"), ("srcC", "x x x")
    ).toDF("source", "text")
    val rows = Text.termDrift(docs, topV = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byGrp = rows.map(r => r._1 -> r).toMap
    assert(rows.map(_._1).sorted.toSeq == Seq("srcA", "srcB", "srcC"))
    assert(byGrp("srcA")._3 == byGrp("srcB")._3)
    assert(byGrp("srcC")._3 > byGrp("srcA")._3)
    assert(byGrp("srcC")._3 > 0d)
    assert(byGrp("srcC")._2 == 3L) // restricted token count
    // corpus: x=5 y=2 z=2 of 9; srcA p = (1/3,1/3,1/3)
    val expectA = List(5d, 2d, 2d).map { gc =>
      (1d / 3) * math.log((1d / 3) / (gc / 9d))
    }.sum
    assert(byGrp("srcA")._3 == math.floor(expectA * 1e6) / 1e6)
  }

  test("edge cases: absent query terms, single source, tiny corpora") {
    // a query term in ZERO docs contributes nothing (tf=0 everywhere)
    // but must not error (df=0 -> idf = ln(1 + (N+0.5)/0.5))
    val docs = Seq((0L, "a b"), (1L, "b c")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, Seq("a", "zzz_absent"), k = 5)
      .collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L)) // only doc 0 matches "a"
    // one source: its distribution IS the corpus -> kl exactly 0
    val single = Seq(("only", "x y z x")).toDF("source", "text")
    val drift = Text.termDrift(single, topV = 10).collect()
    assert(drift.length == 1 && drift.head.getDouble(2) == 0d)
    // collocations on an all-single-token corpus: no bigrams, no error
    val singles = Seq((0L, "one"), (1L, "two")).toDF("doc_id", "text")
    assert(Text.collocations(singles, k = 5, minCount = 1L)
      .collect().isEmpty)
    // a source whose docs are all shorter than n has no shingles and
    // cannot appear in the overlap matrix
    val short = Seq(("sA", "a b c d"), ("sB", "a b c"), ("sC", "x y"))
      .toDF("source", "text")
    val pairs = Text.sourceNgramOverlap(short, n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(pairs.toSeq == Seq(("sA", "sB")))
  }

  test("sourceNgramOverlap: exact pair jaccard; cap drops shared shingles") {
    val docs = Seq(
      ("srcA", "a b c d"), // shingles {a b c, b c d}
      ("srcB", "a b c x"), // shingles {a b c, b c x}
      ("srcC", "p q r s") // disjoint
    ).toDF("source", "text")
    val got = Text.sourceNgramOverlap(docs, n = 3).collect()
    assert(got.length == 1) // only pairs sharing >= 1 shingle appear
    val r = got.head
    assert((r.getString(0), r.getString(1)) == ("srcA", "srcB"))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == (2L, 2L, 1L))
    assert(r.getDouble(5) == math.floor(1d / 3 * 1e6) / 1e6)
    // a shingle present in more than maxGroupsPerShingle groups is
    // dropped before the join: the only shared shingle is in 2 groups
    assert(Text.sourceNgramOverlap(docs, n = 3, maxGroupsPerShingle = 1)
      .collect().isEmpty)
  }

  test("collocations: bound pair tops PMI; single-token docs add no bigrams") {
    val docs = Seq(
      (0L, "new york new york new york"),
      (1L, "red blue green red blue green"),
      (2L, "lonely") // must contribute zero bigrams (sequence guard)
    ).toDF("doc_id", "text")
    val got = Text.collocations(docs, k = 5, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // unigrams: new 3, york 3, red/blue/green 2, lonely 1; T=13, B=10.
    // PMI(blue,green) = PMI(red,blue) = ln((2/10)/(2/13)^2) ~ 2.134 beats
    // PMI(new,york) = ln((3/10)/(3/13)^2) ~ 1.729 — PMI favors rare
    // pairs; ties break on w1, so blue-green comes first
    assert(got.take(2).map(p => (p._1, p._2)).toSeq ==
      Seq(("blue", "green"), ("red", "blue")))
    val newYork = got.find(p => p._1 == "new" && p._2 == "york").get
    assert(newYork._3 == 3L)
    val wantNy =
      math.floor(math.log((3d / 10) / ((3d / 13) * (3d / 13))) * 1e6) / 1e6
    val nyPmi = Text.collocations(docs, k = 5, minCount = 2L)
      .collect().find(r => r.getString(0) == "new").get.getDouble(3)
    assert(nyPmi == wantNy)
    assert(!got.exists(p => p._1 == "lonely" || p._2 == "lonely"))
    // total bigram count check via a minCount=1 run: doc2 contributes 0
    val all = Text.collocations(docs, k = 100, minCount = 1L)
      .agg(org.apache.spark.sql.functions.sum("pair_count")).collect()(0).getLong(0)
    assert(all == 5L + 5L) // (6-1) + (6-1) + 0
  }

  test("hardNegatives drops positives, re-ranks densely, caps at m") {
    val retrieved = Seq(
      // q1: positives scattered at ranks 1 and 3
      (1L, 10L, 0.9, 1), (1L, 11L, 0.8, 2), (1L, 12L, 0.7, 3),
      (1L, 13L, 0.6, 4), (1L, 14L, 0.5, 5),
      // q2: no positives at all
      (2L, 20L, 0.9, 1), (2L, 21L, 0.8, 2), (2L, 22L, 0.7, 3),
      // q3: every hit is a positive
      (3L, 30L, 0.9, 1)
    ).toDF("query_id", "id", "score", "rank")
    val positives = Seq((1L, 10L), (1L, 12L), (3L, 30L),
      (9L, 99L) // positives for an unseen query are inert
    ).toDF("query_id", "id")
    val got = Retrieval.hardNegatives(retrieved, positives, m = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 11L, 1L), (1L, 13L, 2L), // 14 cut by m=2
      (2L, 20L, 1L), (2L, 21L, 2L))) // q3 fully positive -> no rows
    intercept[IllegalArgumentException] {
      Retrieval.hardNegatives(retrieved, positives, m = 0)
    }
  }
}
