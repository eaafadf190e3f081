package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Multimodal, Sampling}

/** Multimodal training-data pipeline walkthrough: wrap a corpus as binary
  * assets with typed metadata, extract features with the batched stub
  * decoder, sample frames, and cut a leakage-safe train/test split —
  * the end-to-end shape a real image/audio pipeline plugs codecs into.
  * Run: `sbt "runMain graft.examples.MultimodalDemo"`.
  */
object MultimodalDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-multimodal-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val assets = Multimodal.toAssets(docs)
    println(s"assets: ${assets.count()} binary payloads")
    assets.select("asset_id", "meta.modality", "meta.byte_len").show(3)

    val features = Multimodal.extractFeatures(assets)
    println("decoded features (stub decoder — byte histogram as stand-in):")
    features.select("asset_id", "byte_len", "checksum", "head_hex").show(3)

    val frames = Multimodal.sampleFrames(
      assets.filter(col("asset_id") < 3), frameSize = 64, stride = 2)
    println(s"sampled frames: ${frames.count()}")
    frames.show(5)

    val split = assets.withColumn("split",
      Sampling.splitColumn(col("asset_id"), Seq("train" -> 0.9, "test" -> 0.1)))
    split.groupBy("split").count().show()
    spark.stop()
  }
}
