package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-technique specs: salting produces identical results to the naive
  * plan, and bucketed tables join without a shuffle.
  */
class ScaleSpec extends AnyFunSuite {
  import graft.SparkSpec.spark

  private val sf = "/root/testdata/sf0.01"
  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")
  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")

  test("salted aggregation == naive aggregation") {
    val src = li.withColumn("qty", col("l_quantity").cast("long"))
    val naive = src.groupBy(col("l_returnflag"))
      .agg(sum(col("qty")).as("sum_qty"),
        count(col("l_orderkey")).as("count_l_orderkey"),
        max(col("l_extendedprice")).as("max_l_extendedprice"))
      .orderBy("l_returnflag").collect()
    val salted = Skew.saltedAgg(src, Seq("l_returnflag"), n = 8,
      saltSource = Seq("l_orderkey", "l_linenumber"),
      aggs = Seq(("qty", "sum"), ("l_orderkey", "count"),
        ("l_extendedprice", "max")))
      .orderBy("l_returnflag").collect()
    assert(salted.length == naive.length)
    naive.zip(salted).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      // sum of long-cast quantities is exact; counts and max exact
      assert(a.getLong(1) == b.getLong(1))
      assert(a.getLong(2) == b.getLong(2))
      assert(a.getDouble(3) == b.getDouble(3))
    }
    // rejects non-re-aggregatable merges
    intercept[IllegalArgumentException] {
      Skew.saltedAgg(li, Seq("l_returnflag"), 4, Seq("l_orderkey"),
        Seq(("l_quantity", "avg")))
    }
    ()
  }

  test("salted join == naive join") {
    val small = orders.select(col("o_orderkey").as("l_orderkey"),
      col("o_orderstatus"))
    val naive = li.join(small, Seq("l_orderkey"))
      .groupBy("o_orderstatus").count().orderBy("o_orderstatus").collect()
    val salted = Skew.saltedJoin(li, small, "l_orderkey", n = 8,
      saltSource = Seq("l_linenumber", "l_partkey"))
      .groupBy("o_orderstatus").count().orderBy("o_orderstatus").collect()
    assert(naive.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      salted.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("mixture selection window is bucket-partitioned: parallelism " +
    "tracks 16^bucketChars, not |weights|") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // worst case for the old plan: ONE listed stratum owning the whole
    // corpus — Window.partitionBy(stratum) would sort all 20k rows in a
    // single task; the bucketed rank must spread it across the prefix
    // buckets while selecting the exact same rows
    val docs = spark.range(0, 20000)
      .select(col("id"), lit("web").as("src"),
        (col("id") % 97 + 1).as("tok"))
    val w = Map("web" -> 1L)
    val mixed = Sampling.mixtureByCount(docs.toDF(), col("src"), col("id"),
      w, bucketChars = 2)
    // 1) selection stage partitions by the hash-prefix bucket: the
    // window's partition spec names __bkt alongside __s
    val plan = mixed.queryExecution.optimizedPlan.toString
    assert(plan.contains("__bkt"), s"no bucket column in the plan:\n$plan")
    // 2) the rows actually spread over many buckets (so at 100x the
    // dominant stratum is 16^chars tasks, not one)
    val buckets = docs
      .select(substring(Sampling.hashPosition(col("id")), 1, 2).as("b"))
      .distinct().count()
    assert(buckets > 200, s"only $buckets populated buckets")
    // 3) identical row set to the naive single-window-per-stratum rank
    // (half the corpus: 1*N/1 with N = supply -> keeps all; tighten by
    // listing a phantom second stratum is impossible, so compare on a
    // two-strata fixture instead)
    val two = docs.withColumn("src",
      when(col("id") % 3 === 0, lit("wiki")).otherwise(col("src")))
    val w2 = Map("web" -> 2L, "wiki" -> 1L)
    val got = Sampling.mixtureByCount(two.toDF(), col("src"), col("id"), w2,
      bucketChars = 2).select("id").as[Long].collect().toSet
    val naiveW = Window.partitionBy(col("src"))
      .orderBy(Sampling.hashPosition(col("id")), col("id"))
    val counts = two.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = w2.map { case (s, ww) => counts(s) * 3L / ww }.min
    val lim = w2.map { case (s, ww) => s -> ww * n / 3L }
    val expect = two.withColumn("__rn", row_number().over(naiveW))
      .filter(col("__rn") <= when(col("src") === "web", lim("web"))
        .otherwise(lim("wiki")))
      .select("id").as[Long].collect().toSet
    assert(got == expect)
    // token variant: same bucket-partitioned shape, same row set as the
    // naive cumulative window
    val gotT = Sampling.mixtureByTokens(two.toDF(), col("src"), col("id"),
      col("tok"), w2, bucketChars = 2).select("id").as[Long].collect().toSet
    val sups = two.groupBy("src").agg(sum("tok").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = w2.map { case (s, ww) => sups(s) * 3L / ww }.min
    val limT = w2.map { case (s, ww) => s -> ww * t / 3L }
    val cumW = naiveW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expectT = two.withColumn("__cum", sum(col("tok")).over(cumW))
      .filter(col("__cum") <= when(col("src") === "web", limT("web"))
        .otherwise(limT("wiki")))
      .select("id").as[Long].collect().toSet
    assert(gotT == expectT)
  }

  test("bucketed tables co-locate the join: no exchange in the plan") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    orders.withColumn("l_orderkey", col("o_orderkey"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("orders_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("orders_bucketed"), Seq("l_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    // the join itself needs no shuffle: the only exchange is the final
    // single-key aggregation, never hashpartitioning(l_orderkey)
    assert(!p.contains("hashpartitioning(l_orderkey"), p)
    val plainPlan = li.join(orders.withColumn("l_orderkey", col("o_orderkey")),
      Seq("l_orderkey")).queryExecution.executedPlan.toString
    assert(plainPlan.contains("hashpartitioning(l_orderkey") ||
      plainPlan.contains("BroadcastHashJoin")) // contrast case
  }
}
