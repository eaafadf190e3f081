package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed BPE merge loop against the driver-histogram trainer
  * (same algorithm, two executions), and the codegen serving expressions
  * against the seam's reference tokenizer.
  */
class TokenizeDistributedSpec extends AnyFunSuite {
  import graft.SparkSpec.spark
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  private def fixture = (Seq.fill(4)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(3)("new")).zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("trainBpeDistributed: hand-computable merges; partitioning " +
    "invariant; early stop parity") {
    val merges = Tokenize.trainBpeDistributed(fixture, numMerges = 5)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("e", "w"),
      ("n", "ew"), ("e", "r")))
    val shuffled = fixture.orderBy(rand(7)).repartition(7)
    assert(Tokenize.trainBpeDistributed(shuffled, numMerges = 5) == merges)
    assert(Tokenize.trainBpeDistributed(fixture, numMerges = 5,
      minPairCount = 7L).isEmpty)
  }

  test("trainBpeDistributed == trainBpe on the sf0.01 corpus (the two " +
    "paths are one algorithm) and across the rematerialize boundary") {
    // 20 merges crosses rematerializeEvery=16, so the fold-into-a-fresh-
    // persist path is exercised, not just the pending expression chain
    val dist = Tokenize.trainBpeDistributed(docs, numMerges = 20)
    val drv = Tokenize.trainBpe(docs, numMerges = 20)
    assert(dist == drv)
    assert(dist.length == 20)
  }

  test("trainBpeFromHistogram: a weighted histogram trains the same " +
    "table as the expanded corpus; malformed columns fail fast") {
    // the fixture corpus as its (w, freq) histogram — the merge loop's
    // real input, so feeding it directly must be equivalent
    val h = Seq(("low", 4L), ("lower", 2L), ("new", 3L))
      .toDF("w", "freq")
    assert(Tokenize.trainBpeFromHistogram(h, numMerges = 5) ==
      Seq(("l", "o"), ("lo", "w"), ("e", "w"), ("n", "ew"), ("e", "r")))
    assertThrows[IllegalArgumentException](
      Tokenize.trainBpeFromHistogram(
        Seq(("x", 1L)).toDF("word", "n"), numMerges = 1))
    // out-of-contract rows fail loudly instead of silently skewing
    // pair counts (a null pre-token drops out of the explode; a
    // non-positive count SUBTRACTS mass)
    assertThrows[IllegalArgumentException](
      Tokenize.trainBpeFromHistogram(
        Seq(("ab", 2L), ("cd", 0L)).toDF("w", "freq"), numMerges = 1))
    assertThrows[IllegalArgumentException](
      Tokenize.trainBpeFromHistogram(
        Seq(("ab", 2L), (null: String, 3L)).toDF("w", "freq"),
        numMerges = 1))
  }

  test("merge application is greedy left-to-right: overlapping runs " +
    "pair up like the reference algorithm") {
    // "aaa" x3: pair (a,a)=6 -> merge; then (aa,a)=3 -> merge. The
    // wrapped-string replace must pair greedily: aaa -> [aa, a], never
    // [a, aa]. Next round counts (aa,a)=3 (not (a,aa)).
    val d = Seq.fill(3)("aaa").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Tokenize.trainBpeDistributed(d, numMerges = 2)
    assert(merges == Seq(("a", "a"), ("aa", "a")))
  }

  test("wrapped-symbol replace cannot match across a symbol boundary") {
    // Round 1: (b,a) = 5+3 = 8 beats (a,b) = 3+2 = 5, so "bab" becomes
    // [ba, b]. Round 2's TRUE counts: (ba,b)=3 from "bab", (a,b)=2 from
    // "ab" -> (ba,b) wins. If the serialized form let the (a,b) merge
    // see a false "a b" adjacency inside "ba  b", (a,b) would count
    // 2+3=5 and steal round 2 — the assertion pins the true winner.
    val d = (Seq.fill(5)("ba") ++ Seq.fill(3)("bab") ++ Seq.fill(2)("ab"))
      .zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Tokenize.trainBpeDistributed(d, numMerges = 2)
    assert(merges == Seq(("b", "a"), ("ba", "b")))
  }

  test("bpeCountExpr/bpeTokensExpr: literal-chain serving matches the " +
    "seam's ToyBpe counter on the corpus it was trained on") {
    val merges = Tokenize.trainBpeDistributed(docs, numMerges = 12)
    val viaExpr = docs
      .select(col("doc_id"),
        Tokenize.bpeCountExpr(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaSeam = Tokenize
      .withTokenCount(docs.select("doc_id", "text"),
        Tokenize.ToyBpeTokenizer(merges), outCol = "n")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap
    assert(viaExpr == viaSeam)
    // serving stays a pure projection: no object seam (mapPartitions /
    // Dataset.map would show as DeserializeToObject), no join — the
    // merge table rides the plan as literals
    val plan = docs.select(
      Tokenize.bpeCountExpr(col("text"), merges).as("n"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") &&
      !plan.contains("MapPartitions") && !plan.contains("Join"),
      s"expected a literal-chain projection, got:\n$plan")
    // tokens, not just counts: "lower" folds through (l,o)(lo,w)(e,r)
    // to [low, er]; "newest" through (e,w)(n,ew) to [new, e, s, t]
    val fm = Tokenize.trainBpeDistributed(fixture, numMerges = 5)
    val toks = Seq(("lower newest", 0L)).toDF("text", "id")
      .select(Tokenize.bpeTokensExpr(col("text"), fm).as("t"))
      .head().getSeq[String](0)
    assert(toks == Seq("low", "er", "new", "e", "s", "t"))
  }

  test("trainBpeDistributed wall-clock tracks the histogram, not the " +
    "corpus (10x docs, GRAFT_SCALEUP opt-in)") {
    assume(sys.env.contains("GRAFT_SCALEUP"),
      "slow: opt in with GRAFT_SCALEUP=1 sbt test")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val big = (0 until 10).map(i =>
      base.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
      .repartition(8).cache()
    big.count(); base.cache().count()
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val t1 = time(Tokenize.trainBpeDistributed(base, numMerges = 8))
    val t10 = time(Tokenize.trainBpeDistributed(big, numMerges = 8))
    println(f"[scaleup] bpeDistTrain 1x=$t1%.1fs 10x=$t10%.1fs " +
      f"ratio=${t10 / t1}%.1f")
    // replication leaves the DISTINCT pre-token vocabulary unchanged,
    // so after the first histogram pass the merge loop's working set is
    // identical — only the one corpus-sized aggregation may grow
    assert(t10 / math.max(t1, 0.5) < 8,
      "distributed BPE training should track the vocabulary, not the corpus")
    base.unpersist(); big.unpersist()
  }

  test("randomized parity: distributed == driver trainer, and the " +
    "literal-chain count == a naive sequential-merge reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
    // the straightforward list implementation of "apply each merge in
    // rank order, greedy left-to-right" — the semantic the wrapped-
    // string replace chain claims
    def naiveApply(word: String,
                   merges: Seq[(String, String)]): Vector[String] = {
      var syms = word.map(_.toString).toVector
      for ((l, r) <- merges) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += l + r; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    val pre = java.util.regex.Pattern.compile(Text.bpeTokenPattern)
    def naiveCount(text: String, merges: Seq[(String, String)]): Long = {
      val m = pre.matcher(text); var n = 0L
      while (m.find()) n += naiveApply(m.group(), merges).length
      n
    }
    // small alphabet with digits and punctuation so pre-token class
    // boundaries and single-mark tokens are exercised, heavy repetition
    // so merges overlap
    val wordGen = Gen.choose(1, 6).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf('a', 'b', 'c', '1', '.')).map(_.mkString))
    val docGen = Gen.frequency(
      9 -> Gen.choose(1, 6).flatMap(k =>
        Gen.listOfN(k, wordGen).map(_.mkString(" "))),
      1 -> Gen.const(""))
    val corpusGen = Gen.choose(2, 20).flatMap(n => Gen.listOfN(n, docGen))
    sample(corpusGen, 6).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val drv = Tokenize.trainBpe(df, numMerges = 5)
      assert(Tokenize.trainBpeDistributed(df, numMerges = 5) == drv,
        s"trainer divergence on corpus $texts")
      val got = df.select(col("doc_id"),
        Tokenize.bpeCountExpr(col("text"), drv).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == naiveCount(t, drv),
          s"count divergence on '$t' under $drv")
      }
    }
  }

  test("bpeCountExpr null/empty semantics match the seam (0, not null) " +
    "and the merge ceiling is loud") {
    val d = Seq((0L, null: String), (1L, ""), (2L, "ab"))
      .toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
      Tokenize.bpeCountExpr(col("text"), Nil).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 2L))
    val big = (1 to 513).map(i => (s"x$i", "y"))
    assertThrows[IllegalArgumentException](
      Tokenize.bpeCountExpr(col("text"), big))
    assertThrows[IllegalArgumentException](
      Tokenize.bpeTokensExpr(col("text"), big))
  }
}
