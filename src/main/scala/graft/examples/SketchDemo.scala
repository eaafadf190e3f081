package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Database, Fs, Grid, Study}
import graft.ops.{Freq, Quantile, Sketch}

/** The sketch + layout layer end to end — the per-slice audits every
  * 100 TB pipeline runs continuously, each from ONE scan, plus the
  * clustered-db point lookup:
  *
  *   - audience overlap: per-event-type distinct-user KMV sketches ->
  *     pairwise intersection/union WITHOUT pairwise joins
  *   - value distributions: per-type KLL quantiles, no global sort
  *   - distribution heads: per-source Misra-Gries top tokens
  *   - sliceProfile: count + distinct + quantiles in ONE aggregate
  *   - Database.optimizeLayout + lookup: hash-clustered files + skip
  *     manifest turn a point lookup into a 1-file read
  *
  * Run: `sbt "runMain graft.examples.SketchDemo [sfDir]"`. */
object SketchDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-sketch-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"),
        col("user_id").cast("long").as("user_id"),
        col("value").cast("double").as("value"))
      .filter(col("event_type").isNotNull)

    println("== audience overlap (KMV, one scan, exact regime) ==")
    val kD = Sketch.exactRegimeK(ev, "event_type", col("user_id"))
    Sketch.overlapMatrix(ev, "event_type", col("user_id"), kD)
      .show(5, truncate = false)

    println("== audience growth (a-not-b: what each slice ADDS) ==")
    val sk = ev.groupBy(col("event_type").as("g"))
      .agg(Sketch.kmvAgg(col("user_id"), kD).as("sk"))
    sk.select(col("g").as("type_a"), col("sk").as("sa"))
      .join(sk.select(col("g").as("type_b"), col("sk").as("sb")),
        col("type_a") =!= col("type_b"))
      .select(col("type_a"), col("type_b"),
        round(Sketch.aNotBEstimate(col("sa"), col("sb")))
          .cast("long").as("n_new"))
      .orderBy("type_a", "type_b").show(6, truncate = false)

    println("== value quantiles (KLL, one scan, no global sort) ==")
    val kQ = Quantile.exactRegimeK(ev, "event_type", col("value"))
    Quantile.groupQuantiles(ev, "event_type", col("value"),
      Seq(0.25, 0.5, 0.95), kQ).orderBy("event_type")
      .show(5, truncate = false)

    println("== one-scan slice profile (count + distinct + quantiles) ==")
    Sketch.sliceProfile(ev, "event_type", col("user_id"), col("value"),
      Seq(0.5, 0.95), kDistinct = kD, kQuant = kQ)
      .orderBy("event_type").show(5, truncate = false)

    println("== per-source top tokens (Misra-Gries, one scan) ==")
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"),
        explode(split(col("text"), "\\s+")).as("tok"))
    val kH = Freq.exactRegimeK(toks, "source", col("tok"))
    Freq.groupTopItems(toks, "source", col("tok"), n = 3, kH)
      .show(9, truncate = false)

    println("== clustered db + skip-manifest point lookup ==")
    val calc = java.nio.file.Files
      .createTempDirectory("graft-sketch-demo-").toString
    Study(spark, calc).run(
      p => Map("r_" -> p("a").asInstanceOf[Long] * 3.0),
      Grid.plist("a", 1L to 2000L))
    val db = Database(spark, calc)
    db.optimizeLayout(numFiles = 16)
    val someId = db.read().filter(col("a") === 777L)
      .select("_pset_id").head().getString(0)
    val hit = db.lookup(someId)
    println(s"lookup($someId): read ${hit.inputFiles.length} of " +
      s"${db.read().inputFiles.length} files -> " +
      s"r_=${db.extractRow(someId).getAs[Double]("r_")}")
    spark.stop()
  }
}
