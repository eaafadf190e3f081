package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Priority sampling invariants: small-population exactness, sample
  * nesting, estimator sanity, and the reservoir fold's equality with
  * the single-shot answer under permuted and re-delivered batches.
  */
class PrioritySampleSpec extends AnyFunSuite {
  import graft.SparkSpec.spark
  import spark.implicits._

  // deterministic skewed weights: a few heavy rows, a long light tail
  private val pop = (0L until 400L).map { i =>
    (i, if (i % 97 == 0) 500.0 else 1.0 + (i % 7).toDouble)
  }
  private def popDf = pop.toDF("id", "w")

  test("population <= n: everything is kept and est_weight is exact") {
    val out = Sampling.prioritySample(popDf.limit(10), col("id"),
      col("w"), n = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getAs[Double]("est_weight")))
    assert(out.length == 10)
    out.foreach { case (_, w, est) => assert(est == w) }
  }

  test("samples nest: top-n is a subset of top-(n+1); heavy rows are " +
    "near-certain members") {
    val ids = (10 to 60).map { n =>
      n -> Sampling.prioritySample(popDf, col("id"), col("w"), n)
        .collect().map(_.getLong(0)).toSet
    }.toMap
    (10 until 60).foreach { n =>
      assert(ids(n).subsetOf(ids(n + 1)), s"top-$n not in top-${n + 1}")
    }
    // every weight-500 row has ~500x the priority of a tail row
    val heavy = pop.filter(_._2 == 500.0).map(_._1).toSet
    assert(heavy.subsetOf(ids(60)))
  }

  test("sum(est_weight) over the sample estimates the population total") {
    val total = pop.map(_._2).sum
    val est = Sampling.prioritySample(popDf, col("id"), col("w"), n = 100)
      .agg(sum(col("est_weight"))).head.getDouble(0)
    assert(math.abs(est - total) / total < 0.25,
      s"estimate $est vs total $total")
  }

  test("null and non-positive weights are excluded by contract") {
    val df = Seq((0L, Some(2.0)), (1L, Some(0.0)), (2L, Some(-1.0)),
      (3L, Option.empty[Double]), (4L, Some(1.0))).toDF("id", "w")
    val kept = Sampling.prioritySample(df, col("id"), col("w"), n = 10)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 4L))
  }

  test("reservoir fold == single-shot under permuted batch order and " +
    "re-delivery; the parked-old swap leaves no residue") {
    val single = Sampling.prioritySample(popDf, col("id"), col("w"), n = 25)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("est_weight")))
      .sortBy(_._1).toSeq
    val batches = Seq(
      popDf.filter(col("id") % 3 === 0),
      popDf.filter(col("id") % 3 === 1),
      popDf.filter(col("id") % 3 === 2))
    for (order <- Seq(Seq(0, 1, 2), Seq(2, 0, 1))) {
      val idx = java.nio.file.Files
        .createTempDirectory("prio-spec-").toString + "/res"
      var last: org.apache.spark.sql.DataFrame = null
      order.foreach { b =>
        last = Sampling.incrementalPrioritySample(batches(b), idx,
          col("id"), col("w"), n = 25)
      }
      // re-deliver the last batch: decisions must not move
      last = Sampling.incrementalPrioritySample(batches(order.last), idx,
        col("id"), col("w"), n = 25)
      val inc = last.collect()
        .map(r => (r.getAs[String]("key").toLong,
          r.getAs[Double]("est_weight"))).sortBy(_._1).toSeq
      assert(inc == single, s"order $order diverged from single-shot")
      assert(!graft.core.Fs.exists(s"$idx.__old") &&
        !graft.core.Fs.exists(s"$idx.__lock") &&
        !graft.core.Fs.exists(s"$idx.__compact_tmp"))
    }
  }

  test("a stale writer lock fails fast on the next fold") {
    val idx = java.nio.file.Files
      .createTempDirectory("prio-spec-").toString + "/res"
    Sampling.incrementalPrioritySample(popDf.limit(5), idx,
      col("id"), col("w"), n = 3)
    graft.core.Fs.writeString(s"$idx.__lock", "pid=dead")
    val e = intercept[IllegalStateException] {
      Sampling.incrementalPrioritySample(popDf.limit(5), idx,
        col("id"), col("w"), n = 3)
    }
    assert(e.getMessage.contains("lock"))
  }
}
