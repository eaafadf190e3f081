package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images / audio / video ride through the
  * pipeline as opaque `binary` payloads plus a typed metadata struct, and
  * decode / feature-extraction runs as batched per-partition functions —
  * the executor-side shape a real decoder (JNI codec, model inference)
  * plugs into. The decoders themselves are STUBS (deterministic functions
  * of the bytes — the container has no image/audio codecs); everything
  * Spark-side is real: schema, partition-level batching, output schema
  * contracts, and the pushdown-friendly separation of cheap metadata from
  * heavy payload.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("modality", StringType),
    StructField("format", StringType),
    StructField("byte_len", LongType)))

  /** Wrap a text corpus as fake multimodal assets: payload = utf-8 bytes
    * (stand-in for an encoded image), metadata derived per row. Real
    * pipelines read payloads via `binaryFile` or parquet binary columns. */
  def toAssets(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol).as("asset_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("image").as("modality"),
        lit("fake/raw").as("format"),
        length(encode(col(textCol), "UTF-8")).cast("long").as("byte_len"))
        .as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("byte_len", LongType),
    StructField("checksum", LongType),
    StructField("head_hex", StringType),
    StructField("histogram", ArrayType(LongType))))

  /** STUB decoder: a deterministic function of the payload bytes standing
    * in for image decode + feature extraction. Byte histogram over 16
    * buckets plays the role of a color histogram. */
  private[ops] def decodeStub(assetId: Long, payload: Array[Byte]): Row = {
    var checksum = 0L
    val hist = new Array[Long](16)
    var i = 0
    while (i < payload.length) {
      checksum = (checksum * 31 + (payload(i) & 0xff)) & 0x7fffffffffffffffL
      hist((payload(i) & 0xff) % 16) += 1
      i += 1
    }
    val head = payload.take(8).map(b => f"$b%02x").mkString
    Row(assetId, payload.length.toLong, checksum, head, hist.toSeq)
  }

  /** Batched feature extraction over the payload column: one decoder
    * context per partition (the real-world pattern — codec/model init is
    * amortized across the batch, not paid per row). */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val rows = assets.select(col("asset_id"), col("payload"))
    implicit val enc = RowEncoder.encoderFor(featureSchema)
    rows.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map(r => decodeStub(r.getLong(0), r.getAs[Array[Byte]](1)))
    }
  }

  /** Deterministic frame sampling stub for video-like payloads: cut the
    * byte stream into `frameSize` chunks, keep every `stride`-th chunk's
    * checksum — the shape of keyframe extraction. */
  def sampleFrames(assets: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    val frameSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("frame_idx", LongType),
      StructField("frame_checksum", LongType)))
    implicit val enc = RowEncoder.encoderFor(frameSchema)
    assets.select(col("asset_id"), col("payload")).flatMap { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      bytes.grouped(frameSize).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (chunk, i) =>
          var c = 0L
          chunk.foreach(b => c = (c * 31 + (b & 0xff)) & 0x7fffffffffffffffL)
          Row(id, i.toLong, c)
        }
    }
  }
}
