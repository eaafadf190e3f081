package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance resampling on hand-computable fixtures: the hashed
  * bucket model, the Laplace-smoothed log-likelihood-ratio weights, and
  * the top-n selection are recomputed with plain Scala arithmetic,
  * independent of the engine's Column expressions (the same replay the
  * q_doc_dsir DuckDB oracle performs in SQL).
  */
class DsirSpec extends AnyFunSuite {
  import graft.SparkSpec.spark
  import spark.implicits._

  private val B = 64

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket(g: String): Int =
    Integer.parseInt(md5hex(g).substring(0, 6), 16) % B

  private def grams(text: String): Seq[String] = {
    val t = text.split("\\s+").toSeq
    t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  private val target = Seq(
    (100L, "quantum flux harmonics resonate"),
    (101L, "flux harmonics quantum field"))
  private val raw = Seq(
    (0L, "quantum flux field resonate"), // target-like
    (1L, "banana smoothie recipe blog"), // off-domain
    (2L, "flux harmonics"), // short but target-like
    (3L, "banana banana banana"))
  private val targetB = Seq(
    (200L, "banana smoothie kale blender"),
    (201L, "banana recipe blender juice"))

  private def expectedScores: Map[Long, (Long, Double)] = {
    val rawGrams = raw.flatMap { case (id, t) => grams(t).map(id -> _) }
    val rc = rawGrams.groupBy(g => bucket(g._2)).view.mapValues(_.size.toLong).toMap
    val tc = target.flatMap(t => grams(t._2)).groupBy(bucket)
      .view.mapValues(_.size.toLong).toMap
    val (rtot, ttot) = (rc.values.sum, tc.values.sum)
    def lw(b: Int): Double =
      math.log((tc.getOrElse(b, 0L) + 1).toDouble / (ttot + B)) -
        math.log((rc.getOrElse(b, 0L) + 1).toDouble / (rtot + B))
    raw.map { case (id, t) =>
      val byB = grams(t).groupBy(bucket).view.mapValues(_.size.toLong).toMap
      val s = byB.map { case (b, dc) => dc * lw(b) }.sum
      id -> (byB.values.sum, s)
    }.toMap
  }

  test("dsirScores matches the independent bucket-model replay") {
    val got = Dsir
      .dsirScores(raw.toDF("doc_id", "text"), target.toDF("vid", "text"),
        buckets = B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length === raw.size)
    val want = expectedScores
    got.foreach { case (id, nf, logw) =>
      val (wantNf, wantRaw) = want(id)
      assert(nf === wantNf, s"n_feats for doc $id")
      // partial-sum order may differ between the engine and the replay,
      // and the engine's value is 1e-6-floor-rounded — allow one
      // rounding step of slack either way
      assert(logw <= wantRaw + 1e-9 && logw > wantRaw - 2e-6,
        s"dsir_logw for doc $id: got $logw want ~$wantRaw")
    }
  }

  test("target-like documents outrank off-domain ones; top-n is the " +
    "prefix of the full ranking") {
    val rawDf = raw.toDF("doc_id", "text")
    val tgtDf = target.toDF("vid", "text")
    val all = Dsir.dsirScores(rawDf, tgtDf, buckets = B)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(all(0L) > all(1L), "target-like doc must outrank off-domain")
    assert(all(2L) > all(3L))
    val top2 = Dsir.dsirSelect(rawDf, tgtDf, n = 2, buckets = B)
      .collect().map(_.getLong(0)).toSeq
    val wantTop2 = all.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(2).map(_._1)
    assert(top2 === wantTop2)
  }

  test("domainRoute: per-domain score equals dsirScores against that " +
    "target alone; winner/margin consistent; K=1 margin is null") {
    val rawDf = raw.toDF("doc_id", "text")
    val tgtA = target.toDF("vid", "text")
    val tgtB = targetB.toDF("vid", "text")
    val routed = Dsir.domainRoute(rawDf, Seq("a" -> tgtA, "b" -> tgtB),
      buckets = B)
      .collect()
      .map(r => (r.getLong(0), r.getString(2), r.getDouble(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
      .toSeq.sortBy(_._1)
    assert(routed.map(_._1) == raw.map(_._1).sorted)
    val vsA = Dsir.dsirScores(rawDf, tgtA, buckets = B)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val vsB = Dsir.dsirScores(rawDf, tgtB, buckets = B)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    routed.foreach { case (id, dom, logw, margin) =>
      val (hi, lo) =
        if (vsA(id) > vsB(id) || (vsA(id) == vsB(id))) (vsA(id), vsB(id))
        else (vsB(id), vsA(id))
      val wantDom = if (hi == vsA(id)) "a" else "b"
      assert(dom == wantDom, s"doc $id routed to $dom")
      assert(math.abs(logw - hi) < 2e-6, s"doc $id winner score")
      assert(math.abs(margin - (hi - lo)) < 4e-6, s"doc $id margin")
    }
    // quantum-flux docs route to the quantum target, banana docs to
    // the banana target
    val byId = routed.map(r => r._1 -> r._2).toMap
    assert(byId(0L) == "a" && byId(2L) == "a")
    assert(byId(1L) == "b" && byId(3L) == "b")
    // K = 1: no runner-up, margin null
    val solo = Dsir.domainRoute(rawDf, Seq("only" -> tgtA), buckets = B)
      .collect()
    assert(solo.forall(_.isNullAt(4)))
    intercept[IllegalArgumentException] {
      Dsir.domainRoute(rawDf, Seq("x" -> tgtA, "x" -> tgtB), buckets = B)
    }
    intercept[IllegalArgumentException] {
      Dsir.domainRoute(rawDf, Seq.empty, buckets = B)
    }
  }

  test("freezeRouter reproduces domainRoute decisions per doc; unseen " +
    "grams route through the smoothed grid; K=1 margin is NaN") {
    val rawDf = raw.toDF("doc_id", "text")
    val tgtA = target.toDF("vid", "text")
    val tgtB = targetB.toDF("vid", "text")
    val router = Dsir.freezeRouter(rawDf, Seq("a" -> tgtA, "b" -> tgtB),
      buckets = B)
    val routed = Dsir.domainRoute(rawDf, Seq("a" -> tgtA, "b" -> tgtB),
      buckets = B)
      .collect()
      .map(r => (r.getLong(0), r.getString(2), r.getDouble(3),
        r.getDouble(4)))
    val texts = raw.toMap
    routed.foreach { case (id, dom, logw, margin) =>
      val (d2, s2, m2) = router.route(texts(id))
      assert(d2 == dom, s"doc $id frozen-vs-distributed domain")
      assert(math.abs(s2 - logw) < 2e-6, s"doc $id score: $s2 vs $logw")
      assert(math.abs(m2 - margin) < 4e-6, s"doc $id margin")
    }
    // grams the raw corpus never saw hit rc=0 grid cells, not an error
    val (d3, s3, _) = router.route("zorbomatic glyph cascade")
    assert(Set("a", "b")(d3) && !s3.isNaN)
    // trailing whitespace exercises the split(-1) seam (Spark's split
    // keeps the trailing empty token)
    val (d4, _, _) = router.route("quantum flux ")
    assert(Set("a", "b")(d4))
    assert(Dsir.freezeRouter(rawDf, Seq("a" -> tgtA), buckets = B)
      .route("quantum flux")._3.isNaN)
  }

  test("saveRouter/loadRouter round-trip: bit-identical grid, identical " +
    "decisions; foreign parquet fails fast") {
    val rawDf = raw.toDF("doc_id", "text")
    val tgtA = target.toDF("vid", "text")
    val tgtB = targetB.toDF("vid", "text")
    val router = Dsir.freezeRouter(rawDf, Seq("b" -> tgtB, "a" -> tgtA),
      buckets = B)
    val path = graft.SparkSpec.tmpDir("graft-router-") + "/router"
    Dsir.saveRouter(spark, router, path)
    val loaded = Dsir.loadRouter(spark, path)
    assert(loaded.domains == router.domains &&
      loaded.buckets == router.buckets)
    (0 until B).foreach(b => assert(
      loaded.lw(b).sameElements(router.lw(b)), s"bucket $b grid drift"))
    raw.foreach { case (_, t) =>
      assert(loaded.route(t) == router.route(t))
    }
    val junk = graft.SparkSpec.tmpDir("graft-router-") + "/junk"
    rawDf.write.parquet(junk)
    assertThrows[IllegalArgumentException](Dsir.loadRouter(spark, junk))
  }

  test("empty target sample: the domain survives with fully-smoothed " +
    "weights and the frozen/distributed paths still agree") {
    import org.apache.spark.sql.functions.col
    val rawDf = raw.toDF("doc_id", "text")
    val tgtA = target.toDF("vid", "text")
    val emptyB = targetB.toDF("vid", "text").filter(col("vid") < 0)
    // scoring against an empty target is defined (all weights fully
    // smoothed), not null/NaN
    val scores = Dsir.dsirScores(rawDf, emptyB, buckets = B).collect()
    assert(scores.length == raw.size)
    assert(scores.forall(r => !r.isNullAt(2) && !r.getDouble(2).isNaN))
    // routing keeps the empty domain as a candidate on both paths
    val pair = Seq("a" -> tgtA, "none" -> emptyB)
    val routed = Dsir.domainRoute(rawDf, pair, buckets = B)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getDouble(3)))
    assert(routed.length == raw.size)
    val router = Dsir.freezeRouter(rawDf, pair, buckets = B)
    val texts = raw.toMap
    routed.foreach { case (id, dom, logw) =>
      val (d2, s2, _) = router.route(texts(id))
      assert(d2 == dom, s"doc $id empty-target parity")
      assert(math.abs(s2 - logw) < 2e-6)
    }
  }

  test("null-text documents yield no feature rows; bucket guard is loud") {
    val rawDf = Seq((0L, Some("quantum flux")), (1L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = Dsir.dsirScores(rawDf, target.toDF("vid", "text"), buckets = B)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(0L))
    intercept[IllegalArgumentException] {
      Dsir.dsirScores(rawDf, target.toDF("vid", "text"), buckets = 1)
    }
    intercept[IllegalArgumentException] {
      Dsir.dsirSelect(rawDf, target.toDF("vid", "text"), n = 0, buckets = B)
    }
  }

  test("domainReweight: hand-replayed Group-DRO recursion on a fixture; " +
    "weights normalize, order follows excess, smoothing floors") {
    import org.apache.spark.sql.functions._
    val d = Seq(
      (1L, "aaaaaaaaaa bb", "hi"),   // 13 chars / 2 toks -> excess 2.0
      (2L, "aaaa bb", "mid"),        // 7/2 -> excess 0 (clipped: 3.5-4.5<0)
      (3L, "aaaaaaa bbbbbbb c", "lo") // 17/3 ~ 5.667 -> excess ~1.1667
    ).toDF("doc_id", "text", "source")
    val out = Dsir.domainReweight(d,
      excess = length(col("text")).cast("double")
        / Text.tokenCount(col("text")) - lit(4.5),
      domain = col("source"), eta = 1.0, smoothing = 0.1, steps = 1)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // hand replay: excess on the 1e-6 grid, raw on the 1e-9 grid
    def ex(chars: Int, toks: Int) =
      math.floor(math.max(chars.toDouble / toks - 4.5, 0.0) * 1e6 + 0.5) / 1e6
    val exHi = ex(13, 2); val exMid = ex(7, 2); val exLo = ex(17, 3)
    val rns = Seq(exHi, exLo, exMid).map(e =>  // sorted domains: hi, lo, mid
      math.floor((1.0 / 3) * math.exp(e) * 1e9 + 0.5).toLong)
    val z = rns.sum
    def alpha(rn: Long) = 0.9 * (rn.toDouble / z.toDouble) + 0.1 / 3
    assert(out("hi")._1 == math.floor(exHi * 1e6) / 1e6)
    assert(out("hi")._2 == math.floor(alpha(rns(0)) * 1e6) / 1e6)
    assert(out("lo")._2 == math.floor(alpha(rns(1)) * 1e6) / 1e6)
    assert(out("mid")._2 == math.floor(alpha(rns(2)) * 1e6) / 1e6)
    // invariants: normalized, monotone in excess, floored by c/K
    val ws = out.values.map(_._2)
    assert(math.abs(ws.sum - 1.0) < 1e-4)
    assert(out("hi")._2 > out("lo")._2 && out("lo")._2 > out("mid")._2)
    assert(ws.forall(_ >= 0.1 / 3 - 1e-6))
    // two steps with static losses sharpens toward the hot domain
    val two = Dsir.domainReweight(d,
      excess = length(col("text")).cast("double")
        / Text.tokenCount(col("text")) - lit(4.5),
      domain = col("source"), eta = 1.0, smoothing = 0.1, steps = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(two("hi") > out("hi")._2)
  }
}
