package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Continuous-ingest dedup lifecycle walkthrough: daily batches arrive,
  * each dedups against (and extends) the persisted incremental indexes,
  * and a periodic [[graft.ops.Dedup.compactIndex]] keeps the append-only
  * index from degrading into thousands of small files — append-only
  * must not mean degrade-forever. Shows all three index families (exact
  * fingerprint, MinHash near-dup with the compact rereadFrom verify,
  * SimHash near-identical) over the same batch stream.
  * Run: `sbt "runMain graft.examples.IngestDemo /tmp/graft-ingest
  * [documentsParquet]"`.
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft-ingest-demo")
    val docsPath = args.lift(1)
      .getOrElse("/root/testdata/sf0.001/documents.parquet")
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-ingest-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(docsPath)
      .select(col("doc_id"), col("text"))

    // three daily batches with overlapping re-crawls: batch 2 re-sends
    // some of batch 1 verbatim, batch 3 re-sends whitespace variants
    val b1 = docs.filter(col("doc_id") % 3 === 0)
    val b2 = docs.filter(col("doc_id") % 3 === 1)
      .unionByName(b1.filter(col("doc_id") % 9 === 0))
    val b3 = docs.filter(col("doc_id") % 3 === 2)
      .unionByName(b1.filter(col("doc_id") % 9 === 3)
        .select((col("doc_id") + 100000).as("doc_id"),
          expr("replace(text, ' ', '  ')").as("text")))

    val exactIdx = s"$root/exact_idx"
    val simIdx = s"$root/simhash_idx"
    var corpus = docs.limit(0) // accumulated kept docs (rereadFrom mode)
    val mhIdx = s"$root/minhash_idx"

    val spanIdx = s"$root/span_idx"
    Seq(("day1", b1), ("day2", b2), ("day3", b3)).foreach { case (day, b) =>
      val n = b.count()
      val exact = Dedup.incrementalExactDedup(b, exactIdx)
      val near = Dedup.incrementalMinhashDedup(b, mhIdx,
        rereadFrom = Some(corpus)).localCheckpoint(true)
      corpus = corpus.unionByName(near).localCheckpoint(true)
      val sim = Dedup.incrementalSimhashDedup(b, simIdx)
      // passage granularity: re-arriving 8-token spans (keep-one — the
      // first arrival stays unmarked in the corpus). Deliberately fed
      // the RAW batch, so the counts track ARRIVALS — including
      // passages of docs the doc-level dedup above drops. A pipeline
      // wanting counts consistent with the KEPT corpus (no re-arrival
      // reports for passages no copy of which survived) would feed
      // `near` here instead; this demo monitors the ingest stream
      // itself, where re-crawled passages are exactly the signal.
      val spans = graft.ops.SpanDedup
        .incrementalDuplicatedSpans(b, spanIdx, k = 8)
      println(s"$day: ${n} in -> exact ${exact.count()}, " +
        s"minhash ${near.count()}, simhash ${sim.count()} kept; " +
        s"${spans.count()} re-arrived passages")
    }

    // lifecycle: one small file set per batch accumulated — compact
    def files(p: String): Int = graft.core.Fs.fs(p)
      .listStatus(new org.apache.hadoop.fs.Path(p))
      .count(_.getPath.getName.endsWith(".parquet"))
    Seq(exactIdx, mhIdx, simIdx, spanIdx).foreach { idx =>
      val before = files(idx)
      Dedup.compactIndex(spark, idx)
      println(s"compact ${idx.split('/').last}: $before -> ${files(idx)} files")
    }

    // day 4 decides identically against the compacted indexes
    val b4 = b1.filter(col("doc_id") % 9 === 6)
      .select((col("doc_id") + 200000).as("doc_id"), col("text"))
    // exact keeps 0 by construction (every day-1 fingerprint — survivor
    // or duplicate — is the fingerprint of some indexed survivor);
    // simhash drops every re-crawl of a KEPT day-1 doc
    println(s"day4 (all re-crawls): " +
      s"exact ${Dedup.incrementalExactDedup(b4, exactIdx).count()} kept " +
      s"(0 guaranteed), " +
      s"simhash ${Dedup.incrementalSimhashDedup(b4, simIdx).count()} kept")
    spark.stop()
  }
}
