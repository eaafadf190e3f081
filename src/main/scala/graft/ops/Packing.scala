package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
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
}
