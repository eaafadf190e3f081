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

  test("CosineSim/Dot/DotConst == aggregate(zip_with(...)) bit-for-bit") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet")
      .filter(col("vec_id") < 100)
    // the HOF formulations these expressions replaced (left-to-right
    // double accumulation) — results must be EXACTLY equal, not within
    // epsilon, because the DuckDB oracles pin the old values
    def hofCosine(a: org.apache.spark.sql.Column,
                  b: org.apache.spark.sql.Column) = {
      val dot = aggregate(zip_with(a, b, (x, y) =>
        x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
      val na = sqrt(aggregate(a, lit(0.0),
        (acc, v) => acc + v.cast("double") * v.cast("double")))
      val nb = sqrt(aggregate(b, lit(0.0),
        (acc, v) => acc + v.cast("double") * v.cast("double")))
      dot / (na * nb)
    }
    val pairs = emb.select(col("vec_id").as("ida"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("idb"),
        col("embedding").as("vb")))
      .filter(col("ida") < col("idb"))
    val cos = pairs.select(
      Similarity.cosine(col("va"), col("vb")).as("fast"),
      hofCosine(col("va"), col("vb")).as("slow")).collect()
    assert(cos.nonEmpty)
    cos.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // dot-with-constant vs zip_with against the literal array
    val plane = Similarity.hyperplanes(64, 1).head
    val planeLit = array(plane.map(lit): _*)
    val dots = emb.select(
      VectorExprs.dotConst(col("embedding"), plane).as("fast"),
      aggregate(zip_with(col("embedding"), planeLit,
        (x, y) => x.cast("double") * y), lit(0.0),
        (acc, x) => acc + x).as("slow")).collect()
    dots.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // self-dot (norm path)
    val norms = emb.select(
      VectorExprs.dot(col("embedding"), col("embedding")).as("fast"),
      aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")).as("slow"))
      .collect()
    norms.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // null/ragged semantics match zip_with's null padding
    import graft.SparkSpec.spark.implicits._
    val ragged = Seq((Seq(1f, 2f), Seq(1f, 2f, 3f))).toDF("a", "b")
    assert(ragged.select(Similarity.cosine(col("a"), col("b"))).head()
      .isNullAt(0))
    assert(ragged.select(VectorExprs.dotConst(col("a"), plane)).head()
      .isNullAt(0))
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
