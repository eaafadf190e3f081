package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized invariants for the round-5 operators, each checked
  * against a naive in-driver reference on small generated inputs. The
  * point is edge-case coverage the fixed fixtures cannot enumerate:
  * negative/out-of-range quality scores, duplicate timestamps, strata
  * with one row, payload permutations. Deterministic seeds (the
  * [[graft.core.PropertySpec]] discipline — no flaky CI); Spark
  * round-trips are slow, so each property runs a handful of generated
  * cases, not hundreds.
  */
class OpsPropertySpec extends AnyFunSuite {
  import graft.SparkSpec.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def hashPos(id: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .take(2).map(b => f"${b & 0xff}%02x").mkString

  test("selectByQualityBudget == naive prefix for random rows and buckets") {
    val rowGen = for {
      id <- Gen.choose(0L, 60L)
      s <- Gen.oneOf("a", "b", "c")
      tok <- Gen.choose(1L, 30L)
      q <- Gen.frequency(3 -> Gen.choose(-2.0, 3.0),
        1 -> Gen.oneOf(0.0, 1.0, 0.5))
    } yield (id, s, tok, q)
    val caseGen = for {
      rows <- Gen.nonEmptyListOf(rowGen)
      buckets <- Gen.choose(1, 40)
      budget <- Gen.choose(10L, 200L)
    } yield (rows, buckets, budget)
    sample(caseGen, 6).foreach { case (rowsRaw, buckets, budget) =>
      val rows = rowsRaw.groupBy(_._1).map(_._2.head).toSeq // unique ids
      val df = rows.toDF("id", "s", "tok", "q")
      val kept = Sampling.selectByQualityBudget(df, col("s"), col("id"),
        col("tok"), col("q"), Map("a" -> budget, "b" -> budget),
        qBuckets = buckets)
        .select("id").collect().map(_.getLong(0)).toSet
      val expected = Seq("a", "b").flatMap { s =>
        val in = rows.filter(_._2 == s)
          .sortBy(r => (-r._4, hashPos(r._1), r._1))
        val cums = in.scanLeft(0L)(_ + _._3).tail
        in.zip(cums).takeWhile(_._2 <= budget).map(_._1._1)
      }.toSet
      assert(kept == expected, s"buckets=$buckets budget=$budget rows=$rows")
    }
  }

  test("temperatureSample == naive flattened hash filter for random " +
    "strata and alphas") {
    val rowGen = for {
      id <- Gen.choose(0L, 200L)
      s <- Gen.oneOf("a", "b", "c", "d")
    } yield (id, s)
    val caseGen = for {
      rows <- Gen.nonEmptyListOf(rowGen)
      alpha <- Gen.oneOf(0.0, 0.25, 0.5, 0.75, 1.0)
    } yield (rows, alpha)
    sample(caseGen, 6).foreach { case (rowsRaw, alpha) =>
      val rows = rowsRaw.groupBy(_._1).map(_._2.head).toSeq // unique ids
      val df = rows.toDF("id", "s")
      val kept = Sampling.temperatureSample(df, col("s"), col("id"), alpha)
        .select("id").collect().map(_.getLong(0)).toSet
      val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val minN = counts.values.min
      // mirrors the operator's quarter-alpha dyadic contract: fixed
      // sqrt/multiply compositions, pow only off the quarter grid
      def flat(r: Double) = (1.0 - alpha) match {
        case 0.5 => math.sqrt(r)
        case 0.25 => math.sqrt(math.sqrt(r))
        case 0.75 => val s = math.sqrt(r); s * math.sqrt(s)
        case e => math.pow(r, e)
      }
      val expected = rows.filter { case (id, s) =>
        val f = math.floor(flat(minN.toDouble / counts(s)) * 1e6) / 1e6
        val t = math.round(f * 65536)
        t >= 65536 || hashPos(id) < f"${math.min(t, 65535).toInt}%04x"
      }.map(_._1).toSet
      assert(kept == expected, s"alpha=$alpha counts=$counts")
    }
  }

  test("rrfFuse == naive reference for random ranked lists") {
    val listGen = Gen.nonEmptyListOf(Gen.choose(0L, 30L)).map(ids =>
      ids.distinct.zipWithIndex.map { case (id, i) => (id, (i + 1).toLong) })
    val caseGen = for {
      a <- listGen; b <- listGen
      k0 <- Gen.choose(1, 100); topK <- Gen.choose(1, 10)
    } yield (a, b, k0, topK)
    sample(caseGen, 6).foreach { case (a, b, k0, topK) =>
      val fused = Retrieval.rrfFuse(
        Seq(a.toDF("id", "rank"), b.toDF("id", "rank")), topK, k0)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
          r.getLong(3))).toSeq
      val contrib = (a ++ b).groupBy(_._1).view.mapValues { rs =>
        (math.floor(rs.map { case (_, r) => 1.0 / (k0 + r) }.sum * 1e6)
          / 1e6, rs.size.toLong)
      }.toMap
      val expected = contrib.toSeq.map { case (id, (sc, n)) => (id, sc, n) }
        .sortBy { case (id, sc, _) => (-sc, id) }.take(topK)
        .zipWithIndex.map { case ((id, sc, n), i) => (id, sc, n, (i + 1).toLong) }
      assert(fused == expected, s"k0=$k0 topK=$topK a=$a b=$b")
    }
  }

  test("leakageSafeSplit: co-located endpoints for random pair graphs") {
    val pairGen = for {
      a <- Gen.choose(0L, 23L)
      b <- Gen.choose(a + 1, 24L)
    } yield (a, b)
    val caseGen = for {
      n <- Gen.choose(5, 25)
      pairs <- Gen.listOf(pairGen)
    } yield (n, pairs.distinct)
    sample(caseGen, 6).foreach { case (n, pairs) =>
      val docs = (0 until n).map(i => (i.toLong, s"text$i"))
        .toDF("doc_id", "text")
      val pairsDF = pairs.toDF("id1", "id2")
      val m = Sampling.leakageSafeSplit(docs, pairsDF,
        Seq("train" -> 0.7, "test" -> 0.3))
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(m.size == n)
      // transitive co-location: both endpoints of every in-corpus pair
      // (and by induction every cluster) share one split
      pairs.filter(p => p._1 < n && p._2 < n).foreach { case (a, b) =>
        assert(m(a) == m(b), s"pair ($a,$b) straddles: ${m(a)} vs ${m(b)}")
      }
    }
  }

  test("fillForward == naive per-key carry for random null patterns") {
    val rowGen = for {
      k <- Gen.oneOf("x", "y")
      t <- Gen.choose(0L, 40L)
      v <- Gen.option(Gen.choose(0L, 9L))
    } yield (k, t, v)
    sample(Gen.nonEmptyListOf(rowGen), 8).foreach { rowsRaw =>
      // unique (k, t) so the (t)-only order is total per key
      val rows = rowsRaw.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val df = rows.toDF("k", "t", "v")
      val got = AsOf.fillForward(df, "k", "t", Seq("v"))
        .select("k", "t", "v").collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        var last: Option[Long] = None
        rs.sortBy(_._2).map { case (_, t, v) =>
          if (v.isDefined) last = v
          (k, t, last)
        }
      }.toSet
      assert(got == expected, s"rows=$rows")
    }
  }

  test("funnelTimes == naive greedy search for random event streams") {
    val evGen = for {
      u <- Gen.choose(1L, 6L)
      t <- Gen.choose(0L, 50L)
      typ <- Gen.oneOf("A", "B", "C", "noise")
    } yield (u, t, typ)
    sample(Gen.nonEmptyListOf(evGen), 8).foreach { evs =>
      val df = evs.toDF("u", "t", "typ")
      val got = Funnel.funnelTimes(df, "u", "t", "typ", Seq("A", "B", "C"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val expected = evs.groupBy(_._1).flatMap { case (u, es) =>
        def first(typ: String, after: Long): Option[Long] =
          es.filter(e => e._3 == typ && e._2 > after)
            .map(_._2).sorted.headOption
        for {
          t1 <- es.filter(_._3 == "A").map(_._2).sorted.headOption
          t2 <- first("B", t1)
          t3 <- first("C", t2)
        } yield u -> ((t1, t2, t3))
      }
      assert(got == expected, s"events=$evs")
    }
  }

  test("duplicatedSpans / removeDuplicatedSpans == naive reference for " +
    "random tiny-vocab corpora") {
    // a 5-symbol vocabulary makes duplicated windows common, exercising
    // merges, self-repeats, and full-doc spans the fixture can't
    val docGen = Gen.choose(0, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" ")))
    val caseGen = for {
      n <- Gen.choose(2, 6)
      texts <- Gen.listOfN(n, docGen)
      k <- Gen.choose(2, 4)
      minOcc <- Gen.choose(2, 3)
    } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }, k, minOcc)
    sample(caseGen, 8).foreach { case (docsSeq, k, minOcc) =>
      def toks(t: String) = t.split("\\s+").toSeq
      val grams = docsSeq.flatMap { case (id, t) =>
        val ts = toks(t)
        if (ts.size >= k)
          (0 to ts.size - k).map(i => (id, i, ts.slice(i, i + k).mkString(" ")))
        else Seq.empty
      }
      val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
      val expSpans = grams.filter(g => counts(g._3) >= minOcc)
        .groupBy(_._1).toSeq.flatMap { case (id, ms) =>
          val merged = scala.collection.mutable.ListBuffer[(Int, Int)]()
          ms.map(m => (m._2, m._2 + k)).sortBy(_._1).foreach { case (s, e) =>
            if (merged.nonEmpty && s <= merged.last._2) {
              val (ls, le) = merged.last
              merged(merged.size - 1) = (ls, math.max(le, e))
            } else merged += ((s, e))
          }
          merged.map { case (s, e) => (id, s.toLong, e.toLong) }
        }.sortBy(x => (x._1, x._2))
      val df = docsSeq.toDF("doc_id", "text")
      val got = SpanDedup.duplicatedSpans(df, k, minOcc.toLong)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(x => (x._1, x._2)).toSeq
      assert(got == expSpans, s"k=$k minOcc=$minOcc docs=$docsSeq")
      // removal: survivors are exactly the unmarked positions, re-joined
      val spanMap = expSpans.groupBy(_._1)
      val expClean = docsSeq.map { case (id, t) =>
        val ts = toks(t)
        val kept = ts.zipWithIndex.filterNot { case (_, i) =>
          spanMap.getOrElse(id, Seq.empty)
            .exists(sp => i >= sp._2 && i < sp._3)
        }.map(_._1)
        (id, kept.mkString(" "), (ts.size - kept.size).toLong)
      }.sortBy(_._1)
      val gotClean = SpanDedup.removeDuplicatedSpans(df, k, minOcc.toLong)
        .select(col("doc_id"), col("clean_text"), col("n_removed_tokens"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(gotClean == expClean, s"k=$k minOcc=$minOcc docs=$docsSeq")
    }
  }

  test("prioritySample == naive reference: same rows, same est_weight, " +
    "bit for bit") {
    val rowGen = for {
      id <- Gen.choose(0L, 40L)
      w <- Gen.oneOf(Gen.choose(0.5, 100.0), Gen.oneOf(0.0, -1.0, 1e9))
    } yield (id, w)
    val caseGen = for {
      rows <- Gen.nonEmptyListOf(rowGen)
      n <- Gen.choose(1, 15)
    } yield (rows.groupBy(_._1).map(_._2.head).toSeq, n)
    sample(caseGen, 8).foreach { case (rows, n) =>
      def prio(id: Long, w: Double): Double = {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString.substring(0, 13)
        // the same two exact steps the Column form runs
        w / ((java.lang.Long.parseLong(hex, 16) + 1L).toDouble
          / 4503599627370496.0)
      }
      val pos = rows.filter(_._2 > 0.0)
      val top = pos.map { case (id, w) => (id, w, prio(id, w)) }
        .sortBy { case (id, _, p) => (-p, id) }.take(n + 1)
      val tau = if (top.size == n + 1) top.last._3 else 0.0
      val expected = top.take(n)
        .map { case (id, w, _) => (id, math.max(w, tau)) }.sortBy(_._1)
      val got = Sampling.prioritySample(rows.toDF("id", "w"),
        col("id"), col("w"), n)
        .select(col("id"), col("est_weight"))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy(_._1).toSeq
      assert(got == expected, s"n=$n rows=$rows")
    }
  }

  test("bigramLogLoss == naive stupid-backoff reference for random " +
    "corpora and vocabulary sizes") {
    val docGen = for {
      id <- Gen.choose(0L, 40L)
      n <- Gen.choose(0, 8)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd", "e"))
    } yield (id, toks.mkString(" "))
    val caseGen = for {
      docs <- Gen.nonEmptyListOf(docGen)
      topV <- Gen.choose(1, 6)
    } yield (docs, topV)
    sample(caseGen, 6).foreach { case (docsRaw, topV) =>
      val rows = docsRaw.groupBy(_._1).map(_._2.head).toSeq
      val df = rows.toDF("doc_id", "text")
      val got = Text.bigramLogLoss(df, topV)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap

      // naive reference (plain Scala, same tokenizer: split keeps the
      // leading/trailing empties Spark's split(-1) keeps)
      def toks(t: String) = t.split("\\s+", -1).toSeq
      val all = rows.flatMap(r => toks(r._2))
      val counts = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(topV)
      val topM = top.toMap
      val (nTotal, nTop) = (all.size.toLong, top.map(_._2).sum)
      val bigrams = rows.map(r => r._1 -> toks(r._2).sliding(2).toSeq
        .filter(_.size == 2).map(p => (p(0), p(1))))
      val model = bigrams.flatMap(_._2)
        .filter(p => topM.contains(p._1) && topM.contains(p._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      def pUni(w: String): Double =
        (topM.get(w).getOrElse(nTotal - nTop) + 1L).toDouble /
          (nTotal + top.size + 1L).toDouble
      bigrams.foreach { case (id, bs) =>
        if (bs.isEmpty) assert(!got.contains(id))
        else {
          val terms = bs.map { p =>
            model.get(p) match {
              case Some(cb) => -math.log(cb.toDouble / counts(p._1))
              case None => -math.log(0.4 * pUni(p._2))
            }
          }
          val want = math.floor(terms.sum / bs.size * 1e6) / 1e6
          val (nb, ll) = got(id)
          assert(nb == bs.size.toLong, s"doc $id count")
          assert(math.abs(ll - want) <= 1e-6,
            s"doc $id: got $ll want $want (topV=$topV)")
        }
      }
    }
  }

  test("trigramLogLoss == naive recursive stupid-backoff reference " +
    "for random corpora") {
    val docGen = for {
      id <- Gen.choose(0L, 30L)
      n <- Gen.choose(0, 9)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
    } yield (id, toks.mkString(" "))
    val caseGen = for {
      docs <- Gen.nonEmptyListOf(docGen)
      topV <- Gen.choose(1, 5)
    } yield (docs, topV)
    sample(caseGen, 5).foreach { case (docsRaw, topV) =>
      val rows = docsRaw.groupBy(_._1).map(_._2.head).toSeq
      val got = Text.trigramLogLoss(rows.toDF("doc_id", "text"), topV)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap

      def toks(t: String) = t.split("\\s+", -1).toSeq
      val all = rows.flatMap(r => toks(r._2))
      val counts = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(topV)
      val topM = top.toMap
      val (nTotal, nTop) = (all.size.toLong, top.map(_._2).sum)
      def grams(t: String, k: Int) =
        toks(t).sliding(k).toSeq.filter(_.size == k)
      val m2 = rows.flatMap(r => grams(r._2, 2))
        .filter(g => g.forall(topM.contains))
        .map(g => (g(0), g(1)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val m3 = rows.flatMap(r => grams(r._2, 3))
        .filter(g => g.forall(topM.contains))
        .map(g => (g(0), g(1), g(2)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      def pUni(w: String): Double =
        (topM.get(w).getOrElse(nTotal - nTop) + 1L).toDouble /
          (nTotal + top.size + 1L).toDouble
      rows.foreach { case (id, text) =>
        val tg = grams(text, 3).map(g => (g(0), g(1), g(2)))
        if (tg.isEmpty) assert(!got.contains(id))
        else {
          val terms = tg.map { case (u, v, w) =>
            m3.get((u, v, w)) match {
              case Some(cb3) =>
                -math.log(cb3.toDouble / m2((u, v)))
              case None => m2.get((v, w)) match {
                case Some(cb2) =>
                  -math.log(0.4 * (cb2.toDouble / counts(v)))
                case None => -math.log(0.4 * (0.4 * pUni(w)))
              }
            }
          }
          val want = math.floor(terms.sum / tg.size * 1e6) / 1e6
          val (n, ll) = got(id)
          assert(n == tg.size.toLong, s"doc $id count")
          assert(math.abs(ll - want) <= 1e-6,
            s"doc $id: got $ll want $want (topV=$topV)")
        }
      }
    }
  }

  test("bm25 index search == bm25TopK for random corpora and batch " +
    "splits") {
    val docGen = for {
      id <- Gen.choose(0L, 30L)
      n <- Gen.choose(0, 6)
      toks <- Gen.listOfN(n, Gen.oneOf("x", "y", "z", "w", "qq"))
    } yield (id, toks.mkString(" "))
    val caseGen = for {
      docs <- Gen.nonEmptyListOf(docGen)
      split <- Gen.choose(0L, 30L)
    } yield (docs, split)
    sample(caseGen, 5).foreach { case (docsRaw, split) =>
      val rows = docsRaw.groupBy(_._1).map(_._2.head).toSeq
      val df = rows.toDF("doc_id", "text")
      val terms = Seq("x", "qq")
      val want = Retrieval.bm25TopK(df, terms, k = 50)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val p = graft.SparkSpec.tmpDir("graft-prop-bm25-") + "/idx"
      Retrieval.appendToBm25Index(df.filter(col("doc_id") < split), p)
      Retrieval.appendToBm25Index(df.filter(col("doc_id") >= split), p)
      val got = Retrieval.bm25Search(spark, p, terms, k = 50)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == want, s"split=$split: $got vs $want")
    }
  }

  test("perceptual hash: deterministic; local edit never farther than " +
    "a full rewrite") {
    val wordsGen = Gen.listOfN(12,
      Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta"))
    val e = PerceptualHash64(null)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    sample(wordsGen, 12).foreach { words =>
      val p1 = words.mkString(" ").getBytes("UTF-8")
      // swapping the first two words preserves almost all bigrams
      val swapped = (words.take(2).reverse ++ words.drop(2))
        .mkString(" ").getBytes("UTF-8")
      val other = words.map(w => "Q" + w.toUpperCase)
        .mkString(" ").getBytes("UTF-8")
      assert(e.compute(p1) == e.compute(p1))
      assert(ham(e.compute(p1), e.compute(swapped)) <=
        ham(e.compute(p1), e.compute(other)),
        s"local edit farther than rewrite for words=$words")
    }
  }

  test("calibrationCurve == single-window NTILE replay for random " +
    "sizes, bins, and tie-heavy quantized scores") {
    // the bucketed prefix-sum fan-out must be indistinguishable from
    // the naive unpartitioned ntile for ANY (N, bins) split — odd
    // remainders, more bins than rows, every row tied, one row
    import org.apache.spark.sql.expressions.Window
    val caseGen = for {
      n <- Gen.choose(1, 160)
      bins <- Gen.choose(1, 13)
      distinct <- Gen.oneOf(1, 2, 5, 40) // 1 = all scores tied
    } yield (n, bins, distinct)
    sample(caseGen, 8).foreach { case (n, bins, distinct) =>
      val rnd = new scala.util.Random(n * 31 + bins)
      val rows = (0 until n).map { i =>
        (i.toLong, rnd.nextInt(distinct).toDouble / 4.0,
          rnd.nextBoolean())
      }.toDF("id", "score", "label")
      val got = Classifier.calibrationCurve(rows, "score", "label",
        "id", bins).collect().toSeq
      val expect = rows
        .withColumn("bin", ntile(bins).over(
          Window.orderBy(col("score").asc, col("id").asc)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), avg(col("score")).as("mean_score"),
          avg(when(col("label"), 1.0).otherwise(0.0)).as("pos_rate"))
        .orderBy(col("bin")).collect().toSeq
      assert(got == expect, s"n=$n bins=$bins distinct=$distinct")
    }
  }
}
