package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for LLM pretraining: group documents into bins of at
  * most `maxTokens` tokens (greedy first-fit in id order), so downstream
  * tokenization fills fixed-length training sequences with minimal
  * padding.
  *
  * Scale shape: documents are hash-partitioned and packed *within* each
  * partition (greedy packing is embarrassingly parallel when global
  * optimality isn't required — the waste bound barely moves), so no
  * shuffle beyond the initial repartition and no driver-side state.
  * Deterministic: partition = hash(id) % P, in-partition order = id.
  */
object Packing {

  val binSchema: StructType = StructType(Seq(
    StructField("bin_id", StringType),
    StructField("doc_ids", ArrayType(LongType, containsNull = false)),
    StructField("n_docs", LongType),
    StructField("total_tokens", LongType)))

  /** Pack documents into token-budget bins. A single document larger than
    * `maxTokens` gets its own bin (callers chunk oversized docs upstream).
    * Output: (bin_id, doc_ids, n_docs, total_tokens). */
  def packSequences(docs: DataFrame, maxTokens: Long,
                    numPartitions: Int = 0,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else docs.sparkSession.sparkContext.defaultParallelism
    val sized = docs.select(col(idCol).as("id"),
      Text.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .repartition(parts, pmod(col("id"), lit(parts.toLong)))
      .sortWithinPartitions(col("id"))
    implicit val enc = RowEncoder.encoderFor(binSchema)
    sized.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val bins = scala.collection.mutable.ArrayBuffer[Row]()
      var curIds = scala.collection.mutable.ArrayBuffer[Long]()
      var curTok = 0L
      def flush(): Unit = if (curIds.nonEmpty) {
        bins += Row(s"p$pid-b${bins.size}", curIds.toSeq, curIds.size.toLong,
          curTok)
        curIds = scala.collection.mutable.ArrayBuffer[Long]()
        curTok = 0L
      }
      it.foreach { r =>
        val id = r.getLong(0); val t = r.getLong(1)
        if (curTok + t > maxTokens && curIds.nonEmpty) flush()
        curIds += id
        curTok += t
      }
      flush()
      bins.iterator
    }
  }

  /** GPT-style concat-and-chunk sequence assembly: documents are laid out
    * in a deterministic global order (`orderKey`, e.g.
    * [[Sampling.shufflePosition]] for a per-epoch permutation), their
    * token streams conceptually concatenated, and the stream cut into
    * fixed `maxTokens` sequences — documents STRADDLE sequence boundaries
    * (the pretraining discipline [[packSequences]]' no-split bins are the
    * alternative to). Output per doc: its global token offset, the
    * sequence its first token lands in, and the offset within it.
    *
    * The global prefix sum is NOT a single-partition window: docs bucket
    * by the first two hex chars of `orderKey` (256 range buckets), bucket
    * token totals aggregate to a 256-row driver table whose running sum
    * gives each bucket's global offset, and the per-bucket cumulative
    * window (parallel, one shuffle on the bucket key) adds its bucket's
    * offset — the classic two-phase distributed prefix sum, expressed in
    * DataFrame ops. The oracle can still be the naive global window: the
    * result is identical. */
  def concatChunks(docs: DataFrame, maxTokens: Long, orderKey: Column,
                   textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val sized = docs.select(col(idCol).as("id"), orderKey.as("pos"),
      Text.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .withColumn("bucket", substring(col("pos"), 1, 2))
    // phase 1: 256 bucket totals -> exclusive running offsets (driver)
    val totals = sized.groupBy(col("bucket"))
      .agg(sum(col("n_tok")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = {
      var acc = 0L
      totals.map { case (b, t) => val o = acc; acc += t; b -> o }.toMap
    }
    val offCol = offsets.foldLeft(lit(0L)) { case (acc, (b, off)) =>
      when(col("bucket") === b, lit(off)).otherwise(acc)
    }
    // phase 2: per-bucket cumulative window (parallel) + bucket offset
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("pos"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sized
      .withColumn("start", sum(col("n_tok")).over(w) - col("n_tok") + offCol)
      // SQL `div` = exact integral division (double `/` could misround
      // at large token offsets); starts are non-negative so % agrees
      // with floor-mod in any engine
      .select(col("id").as(idCol), col("n_tok"),
        expr(s"start div ${maxTokens}L").as("seq_id"),
        (col("start") % maxTokens).as("seq_off"))
  }
}
