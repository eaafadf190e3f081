package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class PsetHashSpec extends AnyFunSuite {

  // Properties mirrored from ref tests/test_all.py:619-704.

  test("key-order independence") {
    val a = Map[String, Any]("a" -> 1, "b" -> Map("c" -> 2, "d" -> Seq(1, 2, "a")))
    val b = Map[String, Any]("b" -> Map("d" -> Seq(1, 2, "a"), "c" -> 2), "a" -> 1)
    assert(PsetHash.hash(a) == PsetHash.hash(b))
  }

  test("prefix/postfix exclusion (ref tests/test_all.py:658-676)") {
    val base = Map[String, Any]("a" -> 1, "b" -> 2)
    assert(PsetHash.hash(base) == PsetHash.hash(base + ("_c" -> 3)))
    assert(PsetHash.hash(base) == PsetHash.hash(base + ("d_" -> 4)))
    assert(PsetHash.hash(base + ("_c" -> 3), skipPrefix = false) !=
      PsetHash.hash(base))
    assert(PsetHash.hash(base + ("d_" -> 4), skipPostfix = false) !=
      PsetHash.hash(base))
  }

  test("prefix/postfix-only pset hashes to the empty hash (F11)") {
    assert(PsetHash.hash(Map("_a" -> 1, "b_" -> 2)) == PsetHash.emptyHash)
  }

  test("type sensitivity: i64 vs f64") {
    assert(PsetHash.hash(Map("a" -> 1)) != PsetHash.hash(Map("a" -> 1.0)))
  }

  test("width insensitivity: Int/Long and Float/Double collapse") {
    assert(PsetHash.hash(Map("a" -> 1)) == PsetHash.hash(Map("a" -> 1L)))
    assert(PsetHash.hash(Map("a" -> 1.5f)) == PsetHash.hash(Map("a" -> 1.5)))
  }

  test("null-awareness: null cell is part of the identity") {
    assert(PsetHash.hash(Map("a" -> 1)) !=
      PsetHash.hash(Map("a" -> 1, "b" -> null)))
  }

  test("golden pins (engine-defined, analog of ref tests/test_all.py:619-626)") {
    // Pinned once; any encoding change must be caught here.
    assert(PsetHash.emptyHash == PsetHash.sha1Hex("d{}"))
    val h = PsetHash.hash(Map[String, Any](
      "a" -> 1, "b" -> Map("c" -> 2, "d" -> Seq(1, 2, "a"))))
    assert(h == PsetHash.sha1Hex(
      "d{s1:a=i1,s1:b=d{s1:c=i2,s1:d=a[i1,i2,s1:a]}}"))
  }

  test("complex values hash as their struct(re, im) encoding, golden-pinned") {
    // ref exercises complex(1.0, 3.0) in the hash/extract matrices
    // (tests/test_all.py:679-687, 1370-1380); the engine's canonical
    // encoding treats it exactly like the normalized struct cell
    val h = PsetHash.hash(Map[String, Any]("c" -> Complex(1.0, 3.0)))
    val reBits = java.lang.Double.doubleToLongBits(1.0)
    val imBits = java.lang.Double.doubleToLongBits(3.0)
    assert(h == PsetHash.sha1Hex(s"d{s1:c=d{s2:im=f$imBits,s2:re=f$reBits}}"))
    // driver twin == stored-row recompute: hashing the normalized Row
    // gives the same digest as hashing the raw Complex
    val norm = ValueSchema.normalize(Complex(1.0, 3.0), Complex.structType)
    assert(PsetHash.hash(Map[String, Any]("c" -> norm)) == h)
  }

  test("property: permutation invariance on random flat psets") {
    val kv: Gen[(String, Any)] = for {
      k <- Gen.identifier.suchThat(s =>
        s.nonEmpty && !s.startsWith("_") && !s.endsWith("_"))
      v <- Gen.oneOf[Any](Gen.long, Gen.double, Gen.alphaStr,
        Gen.oneOf(true, false))
    } yield k -> v
    val listGen = Gen.listOfN(6, kv)
    val rnd = new scala.util.Random(42)
    (0 until 100).foreach { i =>
      val l = listGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val m = l.toMap
      assert(PsetHash.hash(m) ==
        PsetHash.hash(rnd.shuffle(m.toSeq).toMap))
    }
  }

  test("-0.0 normalizes to 0.0; NaN is canonical") {
    assert(PsetHash.hash(Map("a" -> 0.0)) == PsetHash.hash(Map("a" -> -0.0)))
    assert(PsetHash.hash(Map("a" -> Double.NaN)) ==
      PsetHash.hash(Map("a" -> java.lang.Double.longBitsToDouble(0x7ff8000000000001L))))
  }
}
