package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Sampling, Tokenize}

/** Tokenizer training end to end — the fit-once / serve-everywhere
  * lifecycle a training-data pipeline runs before any token budget
  * means anything:
  *
  *   - trainBpeDistributed: the merge loop with the histogram held in
  *     the cluster (the vocab-unbounded path)
  *   - saveBpe / loadBpe: the merge table IS the model — persist it,
  *     serve from the loaded copy
  *   - compression curve: corpus tokens under growing merge prefixes
  *     (the vocab-size tradeoff read off the same literal chains)
  *   - bpeCountExpr: the trained count as a pure Column feeding a
  *     token-budget mixture — no UDF, no seam, whole-stage codegen
  *   - bpeVocabFromHistogram / bpeIdsExpr / packSequences(tokens=):
  *     derive the id table, pack bins in trained-tokenizer tokens,
  *     rehydrate bins as id arrays — sequence building end to end
  *   - the same expression over readStream: score-at-ingest counting
  *
  * Run: `sbt "runMain graft.examples.TokenizerDemo [sfDir]"`. */
object TokenizerDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-tokenizer-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sf/documents.parquet")

    println("== train (distributed merge loop) -> persist -> load ==")
    // the word histogram is the ONE corpus-sized pass — build it once,
    // share it between training and the compression curve below
    val hist = Tokenize.wordHistogram(docs).persist()
    val trained = Tokenize.trainBpeFromHistogram(hist, numMerges = 12)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bpe-demo-").toString
    Tokenize.saveBpe(spark, trained, s"$dir/merges")
    val merges = Tokenize.loadBpe(spark, s"$dir/merges")
    require(merges == trained, "persisted table must round-trip")
    merges.zipWithIndex.take(6).foreach { case ((l, r), i) =>
      println(f"  rank $i%2d: '$l' + '$r' -> '${l + r}'")
    }

    println("== compression curve (tokens under merge prefixes) ==")
    val ks = Seq(0, 4, 8, 12)
    val aggs = ks.map(k => sum(col("freq") *
      Tokenize.bpeCountExpr(col("w"), merges.take(k))).as(s"t$k")) :+
      sum(col("freq")).as("nw")
    val row = hist.agg(aggs.head, aggs.tail: _*).head()
    ks.foreach { k =>
      val t = row.getAs[Long](s"t$k")
      println(f"  $k%2d merges: $t%7d tokens  " +
        f"(${t.toDouble / row.getAs[Long]("nw")}%.3f per word)")
    }

    println("== token-budget mixture contracted in TRAINED tokens ==")
    Sampling.mixtureByTokens(docs, col("source"), col("doc_id"),
      Tokenize.bpeCountExpr(col("text"), merges),
      Map("src0" -> 6L, "src1" -> 3L, "src2" -> 1L))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("source").show()

    println("== sequence building: ids + token-budget packing ==")
    // the id table is derived, not loaded: alphabet ids 0..A-1 in
    // UTF-8 order, merge outputs at A + rank (the GPT-2 convention)
    val vocab = Tokenize.bpeVocabFromHistogram(hist, merges)
    println(s"  vocab: ${vocab.length} tokens " +
      s"(alphabet ${vocab.length - merges.length} + ${merges.length} merges)")

    println("== fit-once survives the process: save + load round-trip ==")
    // the published GPT-2 interchange format (merges.txt + vocab.json,
    // byte-level encoded) — a later driver process loads tables
    // bit-equal to the fit instead of retraining
    val tokDir = java.nio.file.Files
      .createTempDirectory("graft-demo-tok-").toString
    Tokenize.saveTrained(merges, vocab, tokDir)
    val loaded = Tokenize.loadTrained(tokDir)
    println(s"  round-trip exact: merges=" +
      s"${loaded.merges == merges} vocab=${loaded.vocab == vocab}")
    // the serving statistics ride a sidecar (the GPT-2 pair stays
    // pristine): a later process monitors drift without the histogram
    val refRow = hist.agg(
      sum(col("freq") * Tokenize.bpeCountExpr(col("w"), merges)).as("t"),
      sum(col("freq") * length(col("w"))).as("c")).head()
    val refTpc = refRow.getAs[Long]("t").toDouble / refRow.getAs[Long]("c")
    Tokenize.saveTrainedStats(tokDir, refTpc)
    println(s"  drift reference survives: " +
      s"${Tokenize.loadTrainedStats(tokDir).contains(refTpc)} " +
      s"(ref_tokens_per_char = $refTpc)")
    graft.core.Fs.delete(tokDir)
    val packed = graft.ops.Packing.packSequences(docs, maxTokens = 512,
      tokens = Some(Tokenize.bpeCountExpr(col("text"), merges)))
    packed.agg(count(lit(1)).as("bins"),
      avg("total_tokens").as("avg_fill")).show()
    // bins rehydrate as id arrays off the same trained table
    val seqs = docs.join(
      packed.select(explode(col("doc_ids")).as("doc_id"), col("bin_id")),
      "doc_id")
      .groupBy("bin_id")
      .agg(flatten(collect_list(
        Tokenize.bpeIdsExpr(col("text"), merges, vocab))).as("ids"))
    seqs.select(col("bin_id"), size(col("ids")).as("n_ids"))
      .orderBy("bin_id").show(3)

    println("== the same expression at ingest (stateless stream) ==")
    val stream = spark.readStream.schema(docs.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
      .select(col("doc_id"),
        Tokenize.bpeCountExpr(col("text"), merges).as("n_tok"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("bpe_demo")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table("bpe_demo")
      .agg(count(lit(1)).as("docs"), sum("n_tok").as("tokens")).show()

    hist.unpersist()
    graft.core.Fs.delete(dir)
    spark.stop()
  }
}
