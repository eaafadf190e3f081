package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries frequent-items sketches: exact below k with a canonical
  * partitioning-invariant blob, the deterministic MG bound above it,
  * and the incremental fold contract. */
class FreqSpec extends AnyFunSuite {
  import graft.SparkSpec.spark
  import spark.implicits._

  test("exact regime: counts equal groupBy counts, top order is " +
    "(cnt desc, item); nulls ignored; blob partitioning-invariant") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 4000).map { i =>
      val g = s"g${i % 2}"
      val item: String =
        if (i % 97 == 0) null else s"w${rnd.nextInt(200)}"
      (g, item)
    }
    val df = rows.toDF("g", "item").repartition(17)
    val got = Freq.groupTopItems(df, "g", col("item"), n = 10, k = 1024)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = rows.filter(_._2 != null)
      .groupBy(r => (r._1, r._2)).view.mapValues(_.size.toLong).toSeq
      .map { case ((g, item), c) => (g, item, c) }
      .groupBy(_._1).toSeq.flatMap { case (g, items) =>
        items.sortBy(t => (-t._3, t._2)).take(10)
      }.sortBy(t => (t._1, -t._3, t._2))
    assert(got.toSeq == want)
    // canonical blob in the exact regime: any partitioning, same bytes
    val one = df.coalesce(1).groupBy("g")
      .agg(Freq.mgAgg(col("item"), 1024).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk")).toMap
    val many = df.repartition(29).groupBy("g")
      .agg(Freq.mgAgg(col("item"), 1024).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk")).toMap
    for ((g, blob) <- one)
      assert(java.util.Arrays.equals(many(g), blob), s"group $g")
    // n counts non-null arrivals like COUNT(item)
    val ns = df.groupBy("g").agg(Freq.mgAgg(col("item"), 1024).as("sk"))
      .select(col("g"), Freq.itemCount(col("sk")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val trueNs = rows.filter(_._2 != null).groupBy(_._1)
      .view.mapValues(_.size.toLong).toMap
    assert(ns == trueNs)
  }

  test("estimate regime: every stored count obeys " +
    "est <= true <= est + n/(k+1), and every item with true count " +
    "above n/(k+1) survives") {
    val k = 64
    // zipf-ish: item j appears ~N/j times over 3000 distinct items
    val rows = (1 to 3000).flatMap(j =>
      Seq.fill(math.max(1, 6000 / j))(s"w$j"))
    val n = rows.size.toLong
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = rows.toDF("item").repartition(23)
      .select(lit("g").as("g"), col("item"))
      .groupBy("g").agg(Freq.mgAgg(col("item"), k).as("sk"))
    val est = sk.select(explode(Freq.topItems(col("sk"), 0)).as("t"))
      .select(col("t.item"), col("t.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.nonEmpty && est.size <= k)
    val bound = n / (k + 1)
    for ((item, e) <- est) {
      val t = truth(item)
      assert(e <= t && t <= e + bound, s"$item est=$e true=$t bound=$bound")
    }
    for ((item, t) <- truth if t > bound)
      assert(est.contains(item), s"heavy item $item (true=$t) missing")
  }

  test("incremental fold: exact-regime batch splits (with a null " +
    "group) reproduce the one-shot blob bit-for-bit") {
    import graft.SparkSpec.tmpDir
    val rows = (0 until 3000).map { i =>
      (if (i % 11 == 0) null else s"g${i % 2}", s"w${i % 150}")
    }
    val df = rows.toDF("g", "item")
    val p = tmpDir("graft-mg-inc-") + "/sk"
    Freq.incrementalFreqSketch(
      df.filter(col("item") < "w5"), p, "g", col("item"), k = 1024)
    val folded = Freq.incrementalFreqSketch(
      df.filter(!(col("item") < "w5")), p, "g", col("item"), k = 1024)
      .collect()
      .map(r => Option(r.getString(0)) -> r.getAs[Array[Byte]]("sk")).toMap
    val oneShot = df.groupBy(col("g").cast("string").as("g"))
      .agg(Freq.mgAgg(col("item"), 1024).as("sk"))
      .collect()
      .map(r => Option(r.getString(0)) -> r.getAs[Array[Byte]]("sk")).toMap
    assert(folded.keySet == oneShot.keySet)
    for ((g, blob) <- oneShot)
      assert(java.util.Arrays.equals(folded(g), blob), s"group $g")
  }

  test("batchId ledger: re-delivering a folded batch is a no-op, a new " +
    "id still folds (the quantile-sink crash-replay contract)") {
    import graft.SparkSpec.tmpDir
    val p = tmpDir("graft-mg-ledger-") + "/sk"
    val b1 = Seq(("g0", "a"), ("g0", "a"), ("g0", "b")).toDF("g", "item")
    def counts(): Map[(String, String), Long] =
      spark.read.parquet(p)
        .select(col("g"), explode(Freq.topItems(col("sk"), 0)).as("t"))
        .select(col("g"), col("t.item"), col("t.est"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
    Freq.incrementalFreqSketch(b1, p, "g", col("item"), k = 64,
      batchId = Some("stream:x:0"))
    assert(counts() == Map(("g0", "a") -> 2L, ("g0", "b") -> 1L))
    Freq.incrementalFreqSketch(b1, p, "g", col("item"), k = 64,
      batchId = Some("stream:x:0")) // replay: no double-count
    assert(counts() == Map(("g0", "a") -> 2L, ("g0", "b") -> 1L))
    Freq.incrementalFreqSketch(b1, p, "g", col("item"), k = 64,
      batchId = Some("stream:x:1")) // new batch id: folds
    assert(counts() == Map(("g0", "a") -> 4L, ("g0", "b") -> 2L))
  }

  test("edge cases: empty group, unicode items, ties, capacity guards") {
    val df = Seq[(String, String)](
      ("e", null),
      ("t", "a"), ("t", "b"), ("t", "a"), ("t", "b"), ("t", "c"))
      .toDF("g", "item")
    val top = Freq.groupTopItems(df, "g", col("item"), n = 2, k = 64)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // ties break by item asc; the all-null group has no rows
    assert(top.toSeq == Seq(("t", "a", 2L), ("t", "b", 2L)))
    val uni = Seq(("g", "héllo"), ("g", "héllo"), ("g", "wörld"))
      .toDF("g", "item")
      .groupBy("g").agg(Freq.mgAgg(col("item"), 64).as("sk"))
      .select(explode(Freq.topItems(col("sk"), 0)).as("t"))
      .select(col("t.item"), col("t.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni == Map("héllo" -> 2L, "wörld" -> 1L))
    intercept[IllegalArgumentException](Freq.mgAgg(col("item"), 4))
    intercept[IllegalArgumentException](
      Freq.groupTopItems(df, "g", col("item"), n = 0))
    val big = spark.range(0, (1L << 18) + 10, 1, 4)
      .select(lit("g").as("g"), col("id").cast("string").as("item"))
    val e = intercept[IllegalArgumentException](
      Freq.exactRegimeK(big, "g", col("item")))
    assert(e.getMessage.contains("explicit k"))
  }
}
