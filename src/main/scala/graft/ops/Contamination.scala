package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection and removal for training corpora:
  * find training documents sharing n-gram shingles with an evaluation
  * set, report overlap, drop the contaminated.
  *
  * Scale shape: the benchmark side is small (eval sets are thousands of
  * documents), so its exploded shingle set broadcasts; the corpus is
  * scanned once and only rows whose shingles hit the benchmark index ever
  * reach the aggregation — a broadcast semi-structured join, never a
  * corpus×corpus product.
  */
object Contamination {

  /** Per corpus document: how many distinct n-gram shingles it shares with
    * any benchmark document. Output: (id, shared_shingles) for docs with
    * `shared >= minShared`. */
  def report(corpus: DataFrame, benchmark: DataFrame, n: Int, minShared: Int,
             textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val corpusEx = corpus.select(col(idCol).as("id"),
      explode(Dedup.shingles(col(textCol), n)).as("s"))
    val benchSh = benchmark
      .select(explode(Dedup.shingles(col(textCol), n)).as("s")).distinct()
    corpusEx.join(broadcast(benchSh), Seq("s"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("shared_shingles"))
      .filter(col("shared_shingles") >= minShared)
  }

  /** Drop contaminated documents from the corpus. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int,
                    minShared: Int, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val bad = report(corpus, benchmark, n, minShared, textCol, idCol)
      .select(col("id").as(idCol))
    corpus.join(bad, Seq(idCol), "left_anti")
  }
}
