package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KLL/MRL quantile sketches: exact below k (the oracle regime) with a
  * canonical partitioning-invariant blob, bounded rank error above it,
  * weight conservation, and the incremental fold contract. */
class QuantileSpec extends AnyFunSuite {
  import graft.SparkSpec.spark
  import spark.implicits._

  /** The engine's quantile definition, recomputed independently:
    * inverted-CDF discrete quantile at rank max(1, ceil(q*n)). */
  private def naiveQ(values: Seq[Double], q: Double): Double = {
    val s = values.sorted
    s((math.max(1L, math.ceil(q * s.length).toLong) - 1).toInt)
  }

  test("exact regime: sketch quantiles equal the naive discrete " +
    "quantiles; nulls ignored; blob partitioning-invariant") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 3000).map { i =>
      val g = s"g${i % 3}"
      val v: java.lang.Double =
        if (i % 101 == 0) null else rnd.nextDouble() * 100
      (g, v)
    }
    val df = rows.toDF("g", "v").repartition(13)
    val qs = Seq(0.05, 0.25, 0.5, 0.75, 0.9, 0.95, 1.0)
    val got = Quantile.groupQuantiles(df, "g", col("v"), qs, k = 4096)
      .collect().map(r => r.getString(0) ->
        qs.indices.map(i => r.getDouble(i + 1))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val vals = rows.filter(r => r._1 == g && r._2 != null)
        .map(_._2.doubleValue())
      assert(got(g) == qs.map(q => naiveQ(vals, q)), s"group $g")
    }
    // canonical blob: any partitioning merges to identical bytes
    val one = df.coalesce(1).groupBy("g")
      .agg(Quantile.kllAgg(col("v"), 4096).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk")).toMap
    val many = df.repartition(29).groupBy("g")
      .agg(Quantile.kllAgg(col("v"), 4096).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk")).toMap
    for ((g, blob) <- one)
      assert(java.util.Arrays.equals(many(g), blob), s"group $g")
  }

  test("estimate regime: normalized rank error stays under 5% at " +
    "n/k ~ 800; total weight equals the true count") {
    val k = 256
    val n = 200000
    // a skewed (quadratic) distribution so equal-rank errors show up
    // as value errors too
    val vals = (0 until n).map(i => (i.toDouble / n) * (i.toDouble / n))
    val df = vals.toDF("v").repartition(31)
      .select(lit("g").as("g"), col("v"))
    val sk = df.groupBy("g").agg(Quantile.kllAgg(col("v"), k).as("sk"))
    assert(sk.select(Quantile.sketchCount(col("sk")))
      .head().getLong(0) == n.toLong)
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val est = sk.select(qs.map(q =>
      Quantile.kllQuantile(col("sk"), q).as(s"q$q")): _*).head()
    val sorted = vals.sorted
    qs.zipWithIndex.foreach { case (q, i) =>
      val v = est.getDouble(i)
      // rank of the returned value in the true data
      val rank = sorted.search(v)(Ordering.Double.TotalOrdering)
        .insertionPoint
      val err = math.abs(rank - q * n) / n
      assert(err <= 0.05, s"q=$q est=$v rank=$rank err=$err")
    }
  }

  test("incremental fold: exact-regime batch splits (with a null " +
    "group) reproduce the one-shot blob bit-for-bit; quantiles from " +
    "the table match") {
    import graft.SparkSpec.tmpDir
    val rnd = new scala.util.Random(17)
    val rows = (0 until 2000).map { i =>
      (if (i % 7 == 0) null else s"g${i % 3}", rnd.nextDouble() * 10)
    }
    val df = rows.toDF("g", "v")
    val p = tmpDir("graft-kll-inc-") + "/sk"
    Quantile.incrementalQuantileSketch(
      df.filter(col("v") < 4), p, "g", col("v"), k = 4096)
    val folded = Quantile.incrementalQuantileSketch(
      df.filter(col("v") >= 4), p, "g", col("v"), k = 4096)
      .collect()
      .map(r => Option(r.getString(0)) -> r.getAs[Array[Byte]]("sk")).toMap
    val oneShot = df.groupBy(col("g").cast("string").as("g"))
      .agg(Quantile.kllAgg(col("v"), 4096).as("sk"))
      .collect()
      .map(r => Option(r.getString(0)) -> r.getAs[Array[Byte]]("sk")).toMap
    assert(folded.keySet == oneShot.keySet)
    for ((g, blob) <- oneShot)
      assert(java.util.Arrays.equals(folded(g), blob), s"group $g")
    val med = spark.read.parquet(p)
      .select(col("g"), Quantile.kllQuantile(col("sk"), 0.5).as("m"))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    for ((g, m) <- med) {
      val vals = rows.filter(r => Option(r._1) == g).map(_._2)
      assert(m == naiveQ(vals, 0.5), s"group $g")
    }
  }

  test("batchId ledger: re-delivering a folded batch is a no-op (the " +
    "crash-replay case), a NEW id still folds, and the ledger survives " +
    "an id-less fold in between") {
    import graft.SparkSpec.tmpDir
    val p = tmpDir("graft-kll-ledger-") + "/sk"
    val b1 = Seq(("g0", 1.0), ("g0", 2.0), ("g1", 3.0)).toDF("g", "v")
    def blobs(): Map[String, Seq[Byte]] =
      spark.read.parquet(p).collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk").toSeq).toMap
    Quantile.incrementalQuantileSketch(b1, p, "g", col("v"), k = 64,
      batchId = Some("stream:abc:0"))
    val after1 = blobs()
    // the at-least-once replay: same batch, same id -> bit-identical
    Quantile.incrementalQuantileSketch(b1, p, "g", col("v"), k = 64,
      batchId = Some("stream:abc:0"))
    assert(blobs() == after1)
    // an id-less fold must not drop the recorded ids
    Quantile.incrementalQuantileSketch(
      Seq(("g1", 9.0)).toDF("g", "v"), p, "g", col("v"), k = 64)
    val after2 = blobs()
    assert(after2 != after1)
    Quantile.incrementalQuantileSketch(b1, p, "g", col("v"), k = 64,
      batchId = Some("stream:abc:0")) // still remembered
    assert(blobs() == after2)
    // a genuinely new batch id folds (and double-counts the content,
    // which is exactly why the id is the dedup key, not the content)
    Quantile.incrementalQuantileSketch(b1, p, "g", col("v"), k = 64,
      batchId = Some("stream:abc:1"))
    assert(blobs() != after2)
  }

  test("edge cases: empty group null quantile, single value, " +
    "duplicate-heavy input, capacity and q guards") {
    val df = Seq[(String, java.lang.Double)](
      ("e", null), ("s", 7.5),
      ("d", 1.0), ("d", 1.0), ("d", 1.0), ("d", 2.0))
      .toDF("g", "v")
    val r = Quantile.groupQuantiles(df, "g", col("v"), Seq(0.5), k = 64)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(r == Map("e" -> None, "s" -> Some(7.5), "d" -> Some(1.0)))
    intercept[IllegalArgumentException](Quantile.kllAgg(col("v"), 8))
    intercept[IllegalArgumentException](
      Quantile.kllQuantile(col("v"), 1.5))
    // exactRegimeK: count-based sizing, floor, and over-cap failure
    val tiny = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    assert(Quantile.exactRegimeK(tiny, "g", col("v"), minK = 1024) == 1024)
    val big = spark.range(0, (1L << 21), 1, 8)
      .select(lit("g").as("g"), col("id").cast("double").as("v"))
    val e = intercept[IllegalArgumentException](
      Quantile.exactRegimeK(big, "g", col("v")))
    assert(e.getMessage.contains("explicit k"))
  }
}
