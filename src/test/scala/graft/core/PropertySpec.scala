package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-flavored randomized checks over the grid algebra and hash
  * (the engine analog of the reference's randomized round-trip layer,
  * ref tests/test_all.py:329-391). Deterministic seeds — no flaky CI. */
class PropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val nameGen: Gen[String] =
    Gen.identifier.map(_.take(8)).suchThat(s =>
      s.nonEmpty && !s.startsWith("_") && !s.endsWith("_"))

  private val plistGen: Gen[(String, Seq[Any])] = for {
    name <- nameGen
    n <- Gen.choose(1, 5)
    vals <- Gen.listOfN(n, Gen.oneOf[Any](Gen.choose(-100L, 100L),
      Gen.choose(-10.0, 10.0), Gen.alphaStr.map(_.take(6))))
  } yield (name, vals)

  test("pgrid: |product| = Π|plists|, keys = union, order lexicographic") {
    sample(Gen.listOfN(3, plistGen), 60).foreach { raw =>
      val lists = raw.zipWithIndex
        .map { case ((n, v), i) => (s"${n}_$i".replace("_", "k"), v) }
      val plists = lists.map { case (n, v) => Grid.plist(n, v) }
      val g = Grid.pgrid(plists: _*)
      assert(g.size == lists.map(_._2.size).product)
      assert(g.forall(_.keySet == lists.map(_._1).toSet))
      // first pset takes every head, last takes every last
      assert(g.head == lists.map { case (n, v) => n -> v.head }.toMap)
      assert(g.last == lists.map { case (n, v) => n -> v.last }.toMap)
    }
  }

  test("filterParamsUnique is idempotent and order-preserving") {
    sample(plistGen, 80).foreach { case (name, vals) =>
      val params = Grid.plist(name, vals ++ vals)
      val once = Grid.filterParamsUnique(params)
      assert(Grid.filterParamsUnique(once) == once)
      assert(once.map(_(name)) == vals.distinct)
    }
  }

  test("stargrid: center appears once; size bounded by Σ|vary|") {
    sample(Gen.zip(plistGen, plistGen), 60).foreach {
      case ((n1, v1), (n2, v2)) if n1 != n2 =>
        val const = Map[String, Any](n1 -> v1.head, n2 -> v2.head)
        val g = Grid.stargrid(const,
          Seq(Grid.plist(n1, v1), Grid.plist(n2, v2)))
        assert(g.count(_ == const) == 1)
        assert(g.size <= v1.size + v2.size)
        assert(g.size == Grid.filterParamsUnique(g).size)
      case _ => ()
    }
  }

  test("intspace: sorted, distinct, endpoint-inclusive") {
    sample(Gen.zip(Gen.choose(-50.0, 50.0), Gen.choose(1.0, 100.0),
      Gen.choose(2, 40)), 100).foreach { case (a, span, n) =>
      val b = a + span
      val v = Grid.intspace(a, b, n)
      assert(v == v.sorted && v == v.distinct)
      assert(v.head == math.rint(a).toLong && v.last == math.rint(b).toLong)
      assert(v.size <= n)
    }
  }

  test("logspace: endpoints exact-ish, monotone increasing") {
    sample(Gen.zip(Gen.choose(0.1, 10.0), Gen.choose(1.5, 1000.0),
      Gen.choose(2, 30)), 100).foreach { case (a, f, n) =>
      val b = a * f
      val v = Grid.logspace(a, b, n)
      assert(math.abs(v.head - a) < 1e-9 * math.max(1, a.abs))
      assert(math.abs(v.last - b) < 1e-6 * math.max(1, b.abs))
      assert(v.sliding(2).forall(p => p.head <= p.last))
    }
  }

  test("flattenDict: flat dicts unchanged; nested keys joined") {
    sample(Gen.listOfN(4, Gen.zip(nameGen, Gen.choose(0, 100))), 60)
      .foreach { kvs =>
        val flat: Map[String, Any] =
          kvs.toMap.map { case (k, v) => k -> (v: Any) }
        assert(Grid.flattenDict(flat) == flat)
      }
    assert(Grid.flattenDict(Map("a" -> Map("b" -> Map("c" -> 7)))) ==
      Map("a_b_c" -> 7))
  }

  test("hash: injective on sampled distinct flat psets") {
    val psets = sample(Gen.listOfN(3, Gen.zip(nameGen, Gen.choose(-1000L, 1000L))),
      300).map(_.toMap.map { case (k, v) => k -> (v: Any) }).distinct
    val hashes = psets.map(PsetHash.hash(_))
    assert(hashes.distinct.size == psets.size)
  }

  test("normalizeFull is idempotent w.r.t. the hash") {
    val homoPlistGen: Gen[(String, Seq[Any])] = for {
      name <- nameGen
      n <- Gen.choose(1, 5)
      vals <- Gen.oneOf(
        Gen.listOfN(n, Gen.choose(-100L, 100L).map(x => x: Any)),
        Gen.listOfN(n, Gen.choose(-10.0, 10.0).map(x => x: Any)),
        Gen.listOfN(n, Gen.alphaStr.map(s => s.take(6): Any)))
    } yield (name, vals)
    sample(homoPlistGen, 60).foreach { case (name, vals) =>
      val psets = Grid.plist(name, vals)
      val schema = ValueSchema.infer(psets)
      psets.foreach { p =>
        val n1 = Study.normalizeFull(p, schema)
        val n2 = Study.normalizeFull(n1, schema)
        assert(PsetHash.hash(n1) == PsetHash.hash(n2))
      }
    }
  }
}
