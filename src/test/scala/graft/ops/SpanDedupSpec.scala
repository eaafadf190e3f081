package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** ExactSubstr span mining on hand-computable fixtures: shared passages
  * at different offsets, disjoint passages in one document, intra-doc
  * self-repeats, and the removal pass — each span set recomputed by
  * inspection, independent of the engine's window/merge machinery.
  */
class SpanDedupSpec extends AnyFunSuite {
  import graft.SparkSpec.spark
  import spark.implicits._

  // a 10-token passage shared verbatim by docs 0 and 1 at different
  // offsets; the surrounding filler is unique per doc
  private val passage = (0 until 10).map(i => s"p$i").mkString(" ")
  private def filler(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("shared passage is found at each doc's own offset, merged " +
    "across overlapping windows") {
    val docs = Seq(
      (0L, s"${filler("a", 5)} $passage ${filler("b", 5)}"),
      (1L, s"${filler("c", 2)} $passage"),
      (2L, filler("z", 20))).toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(docs, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    // doc 0: tokens 5..14 inclusive -> [5, 15); doc 1: [2, 12)
    assert(spans.toSeq == Seq((0L, 5L, 15L), (1L, 2L, 12L)))
  }

  test("two disjoint duplicated passages in one doc stay two spans; " +
    "contiguous ones merge") {
    val p2 = (0 until 6).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (0L, s"$passage ${filler("gap", 7)} $p2"),
      (1L, passage),
      (2L, p2)).toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(docs, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    assert(spans.toSeq == Seq(
      (0L, 0L, 10L), (0L, 17L, 23L), (1L, 0L, 10L), (2L, 0L, 6L)))
  }

  test("intra-doc self-repeat counts as duplicated (Lee et al. " +
    "semantics); a lone doc with unique text yields nothing") {
    val docs = Seq(
      (0L, s"$passage ${filler("mid", 3)} $passage"),
      (1L, filler("u", 30))).toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(docs, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    assert(spans.toSeq == Seq((0L, 0L, 10L), (0L, 13L, 23L)))
  }

  test("docs shorter than k tokens are never marked; null text yields " +
    "no span rows and passes through removal as null") {
    val docs = Seq(
      (0L, Some("p0 p1 p2")), // 3 tokens < k, equals passage prefix
      (1L, Some("p0 p1 p2")),
      (2L, Option.empty[String])).toDF("doc_id", "text")
    assert(SpanDedup.duplicatedSpans(docs, k = 4).count() == 0)
    val cleaned = SpanDedup.removeDuplicatedSpans(docs, k = 4)
      .collect().map(r => (r.getLong(0),
        Option(r.getAs[String]("clean_text")),
        r.getAs[Long]("n_removed_tokens"))).sortBy(_._1)
    assert(cleaned.toSeq == Seq(
      (0L, Some("p0 p1 p2"), 0L), (1L, Some("p0 p1 p2"), 0L),
      (2L, None, 0L)))
  }

  test("removal cuts exactly the span tokens; a fully-duplicated doc " +
    "cleans to the empty string") {
    val docs = Seq(
      (0L, s"${filler("a", 3)} $passage ${filler("b", 2)}"),
      (1L, passage)).toDF("doc_id", "text")
    val cleaned = SpanDedup.removeDuplicatedSpans(docs, k = 4)
      .collect().map(r => (r.getLong(0), r.getAs[String]("clean_text"),
        r.getAs[Long]("n_removed_tokens"))).sortBy(_._1)
    assert(cleaned.toSeq == Seq(
      (0L, "a0 a1 a2 b0 b1", 10L), (1L, "", 10L)))
  }

  test("incremental fold has keep-one semantics: history's first copy " +
    "is never marked, every re-arrival is; a re-delivered batch is " +
    "fully marked (its content IS in history); stale locks fail fast") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft-spandx-spec-").toString + "/idx"
    val b1 = Seq((0L, s"${filler("a", 3)} $passage"),
      (1L, filler("u", 12))).toDF("doc_id", "text")
    val b2 = Seq((10L, s"${filler("b", 2)} $passage ${filler("c", 2)}"),
      (11L, filler("v", 12))).toDF("doc_id", "text")
    // batch 1: the passage is new — nothing marked
    assert(SpanDedup.incrementalDuplicatedSpans(b1, idx, k = 4)
      .count() == 0)
    // batch 2: the passage re-arrives — marked at ITS offset only
    val s2 = SpanDedup.incrementalDuplicatedSpans(b2, idx, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s2.toSeq == Seq((10L, 2L, 12L)))
    // re-delivering batch 1 (a retried stage): every window of BOTH its
    // docs is now in history, so both are fully marked — the correct
    // dedup outcome for content that already made it into the corpus
    val s3 = SpanDedup.incrementalDuplicatedSpans(b1, idx, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(s3.toSeq == Seq((0L, 0L, 13L), (1L, 0L, 12L)))
    graft.core.Fs.writeString(s"$idx.__lock", "pid=dead")
    val e = intercept[IllegalStateException] {
      SpanDedup.incrementalDuplicatedSpans(b2, idx, k = 4)
    }
    assert(e.getMessage.contains("lock"))
  }

  test("batchId journal: a DELIVERY-level replay of a committed batch " +
    "is a no-op (empty spans, counts untouched); the same content under " +
    "a NEW id is a genuine re-arrival and marks fully") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft-spanjr-spec-").toString + "/idx"
    val b1 = Seq((0L, s"${filler("a", 3)} $passage")).toDF("doc_id", "text")
    var sunk = 0L
    assert(SpanDedup.incrementalDuplicatedSpans(b1, idx, k = 4,
      batchId = Some("stream:x:0"),
      sinkFirst = d => sunk += d.count()).count() == 0)
    assert(sunk == 0L)
    val countsAfter1 = graft.SparkSpec.spark.read.parquet(idx).count()
    // crash-replay: same id — nothing emitted, nothing appended, the
    // sink hook never fires
    assert(SpanDedup.incrementalDuplicatedSpans(b1, idx, k = 4,
      batchId = Some("stream:x:0"),
      sinkFirst = d => sunk += d.count()).count() == 0)
    assert(sunk == 0L)
    assert(graft.SparkSpec.spark.read.parquet(idx).count() == countsAfter1)
    // the SAME CONTENT under a new batch id is a legitimate re-crawl:
    // every window is in history now — fully marked, counts appended
    val s = SpanDedup.incrementalDuplicatedSpans(b1, idx, k = 4,
      batchId = Some("stream:x:1"),
      sinkFirst = d => sunk += d.count())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s.toSeq == Seq((0L, 0L, 13L)) && sunk == 1L)
    assert(graft.SparkSpec.spark.read.parquet(idx).count() > countsAfter1)
  }

  test("minOccurrences raises the corpus-wide bar") {
    val docs = Seq(
      (0L, passage), (1L, passage), (2L, passage),
      (3L, s"solo ${filler("s", 3)} solo2")).toDF("doc_id", "text")
    assert(SpanDedup.duplicatedSpans(docs, k = 4, minOccurrences = 3)
      .count() == 3) // the 3x passage survives the bar, nothing else
    assert(SpanDedup.duplicatedSpans(docs, k = 4, minOccurrences = 4)
      .count() == 0)
    intercept[IllegalArgumentException] {
      SpanDedup.duplicatedSpans(docs, k = 4, minOccurrences = 1)
    }
    intercept[IllegalArgumentException] {
      SpanDedup.duplicatedSpans(docs, k = 1)
    }
  }

  test("surgical decontamination: ONLY the benchmark-leaked passage is " +
    "cut, at its exact offsets; clean docs pass through") {
    // benchmark item quoted verbatim inside doc 0; doc 1 shares no
    // 4-token window with the benchmark; doc 2 quotes it twice
    val bench = Seq((100L, passage)).toDF("bench_id", "text")
    val corpus = Seq(
      (0L, s"${filler("a", 5)} $passage ${filler("b", 5)}"),
      (1L, filler("z", 20)),
      (2L, s"$passage ${filler("m", 3)} $passage"))
      .toDF("doc_id", "text")
    val spans = SpanDedup.contaminatedSpans(corpus, bench, k = 4,
      benchTextCol = "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    // doc 0: [5, 15); doc 2: [0, 10) and [13, 23) — NOT merged across
    // the 3 clean middle tokens
    assert(spans.toSeq == Seq((0L, 5L, 15L), (2L, 0L, 10L), (2L, 13L, 23L)))
    val cleaned = SpanDedup.removeContaminatedSpans(corpus, bench, k = 4)
      .select("doc_id", "clean_text", "n_removed_tokens")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(cleaned(0L) ==
      ((s"${filler("a", 5)} ${filler("b", 5)}", 10L)))
    assert(cleaned(1L) == ((filler("z", 20), 0L)))
    assert(cleaned(2L) == ((filler("m", 3), 20L)))
    // the benchmark itself is NOT the corpus: a doc sharing fewer than
    // k consecutive tokens with any benchmark item is untouched even if
    // it shares individual words
    val near = Seq((7L, s"p0 p1 p2 ${filler("q", 5)}")).toDF("doc_id", "text")
    assert(SpanDedup.contaminatedSpans(near, bench, k = 4).count() == 0L)
  }
}
