package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-verification of the custom Catalyst expressions against
  * independent reference implementations (composed built-ins or plain
  * Scala) on real corpus data — the in-repo analog of an oracle for the
  * expression layer itself.
  */
class ExpressionEquivalenceSpec extends AnyFunSuite {
  import graft.SparkSpec.spark

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")
    .filter(col("doc_id") < 100)

  test("WordShingles == composed transform/element_at/split form") {
    val toks = split(col("text"), "\\s+")
    val composed = when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - lit(2)),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2)))))
      .otherwise(array().cast("array<string>"))
    val both = docs.select(
      Dedup.shingles(col("text"), 3).as("fast"), composed.as("slow"))
      .collect()
    both.foreach(r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("WordShingles == plain Scala sliding-window on driver") {
    val rows = docs.select(col("text"),
      Dedup.shingles(col("text"), 2).as("sh")).collect()
    rows.foreach { r =>
      val expected = r.getString(0).split("\\s+").toSeq
        .sliding(2).map(_.mkString(" ")).toSeq.distinct
      assert(r.getSeq[String](1) == expected)
    }
  }

  test("SimHash64 == plain Scala fold on driver") {
    val rows = docs.limit(20).select(col("text"),
      Dedup.simhash64(split(col("text"), "\\s+")).as("f")).collect()
    rows.foreach { r =>
      val votes = new Array[Int](64)
      r.getString(0).split("\\s+").foreach { tok =>
        val bytes = tok.getBytes("UTF-8")
        val p = bytes.foldLeft(0L)((acc, b) => acc * 1000000007L + (b & 0xff))
        val h = SimHash64.fmix64(p)
        (0 until 64).foreach(b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1)
      }
      val expected = (0 until 64).foldLeft(0L)((acc, b) =>
        if (votes(b) > 0) acc | (1L << b) else acc)
      assert(r.getLong(1) == expected)
    }
  }

  test("WinnowFingerprint == plain Scala winnowing on driver") {
    val rows = docs.limit(20).select(col("text"),
      Text.winnowingFingerprint(col("text"), 8, 4).as("f")).collect()
    rows.foreach { r =>
      val s = r.getString(0).toLowerCase.replaceAll("\\s+", " ").trim
      val k = 8; val w = 4
      val expected: Seq[Long] =
        if (s.length < k) Seq.empty
        else {
          val grams = s.sliding(k).toArray
          val B = 1000000007L
          val hs = grams.map(_.foldLeft(0L)((h, c) => h * B + c))
          val n = hs.length
          val sel = scala.collection.mutable.SortedSet[Long]()
          (0 to math.max(0, n - w)).foreach { start =>
            val end = math.min(start + w, n)
            // rightmost minimum in the window
            val window = hs.slice(start, end)
            val minV = window.min
            sel += hs(start + window.lastIndexOf(minV))
          }
          sel.toSeq
        }
      assert(r.getSeq[Long](1) == expected)
    }
  }

  test("PsetHash expression == driver twin on corpus-derived rows") {
    val rows = docs.limit(50)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val withHash = rows.withColumn("h",
      graft.core.PsetHash.expr(rows.columns.toSeq)).collect()
    withHash.foreach { r =>
      val m = Map[String, Any]("doc_id" -> r.getLong(0),
        "lang" -> r.getString(1), "n_chars" -> r.getLong(2))
      assert(r.getString(3) == graft.core.PsetHash.hash(m))
    }
  }
}
