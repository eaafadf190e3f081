package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cross-study and db-to-filesystem linkage patterns: J5 (tree study —
  * results of study 1 become params of study 2, ref examples/tree_study.py:
  * 127-139), J6/S15 (artifact join — per-pset files loaded and joined back
  * on `_pset_id`, ref examples/save_data_on_disk/20eval.py), and A5
  * (column-wise mean over artifact arrays).
  */
class LinkageSpec extends AnyFunSuite {
  import graft.SparkSpec.{spark, tmpDir}

  test("J5: tree study — study-1 results feed study-2 params") {
    val calc1 = tmpDir("graft-tree1-")
    val out1 = Study(spark, calc1).run(
      p => Map("result_ab_" -> (p("a").asInstanceOf[Long] + 1.0)),
      Grid.plist("a", Seq(1, 2)))
    // extract psets + the result column, link as study-2 params
    val linked = out1.db.select(col("a"), col("result_ab_").as("b"))
      .orderBy("a").collect()
      .map(r => Map[String, Any]("a" -> r.getLong(0), "b" -> r.getDouble(1)))
    val calc2 = tmpDir("graft-tree2-")
    val out2 = Study(spark, calc2).run(
      p => Map("result_" -> p("a").asInstanceOf[Long] *
        p("b").asInstanceOf[Double]),
      linked.toSeq)
    val rows = out2.db.orderBy("a").collect()
    assert(rows.map(_.getAs[Double]("result_")).toSeq == Seq(2.0, 6.0))
    // cross-db FK join works on the shared pset column
    val joined = out1.db.select(col("a"), col("result_ab_"))
      .join(out2.db.select(col("a"), col("result_")), Seq("a"))
    assert(joined.count() == 2)
  }

  test("J6/S15/A5: artifact write, load, join on _pset_id, array mean") {
    val calc = tmpDir("graft-artifact-")
    // run: each pset writes calc/<pset_id>/output.txt with "a 2a 4a" (F14)
    val out = Study(spark, calc).run(p => {
      val a = p("a").asInstanceOf[Long]
      Fs.writeString(s"${p("_calc_dir")}/${p("_pset_id")}/output.txt",
        s"$a ${2 * a} ${4 * a}")
      Map.empty
    }, Grid.plist("a", Seq(1, 2, 3)))

    // eval: load artifacts keyed by _pset_id, compute mean_, join to db
    val arts = spark.read.text(s"$calc/*/output.txt")
      .withColumn("_pset_id",
        regexp_extract(input_file_name(), "/([0-9a-f-]{36})/output\\.txt", 1))
      .withColumn("vals",
        transform(split(col("value"), " "), x => x.cast("double")))
      .withColumn("mean_",
        aggregate(col("vals"), lit(0.0), (acc, x) => acc + x) /
          size(col("vals")))
      .select(col("_pset_id"), col("mean_"))
    val enriched = out.db.join(arts, Seq("_pset_id"))
    val got = enriched.orderBy("a").collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Double]("mean_")))
    // mean of (a, 2a, 4a) = 7a/3
    assert(got.toSeq == Seq(1L, 2L, 3L).map(a => (a, 7.0 * a / 3)))
  }
}
