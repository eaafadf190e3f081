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
