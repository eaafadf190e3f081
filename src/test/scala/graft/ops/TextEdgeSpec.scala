package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case behavior of the text/dedup operators on messy input: empty
  * strings, whitespace runs, unicode, single tokens. The corpus is clean
  * single-spaced ASCII; these pin what happens when real-world data isn't.
  */
class TextEdgeSpec extends AnyFunSuite {
  import graft.SparkSpec.spark
  import spark.implicits._

  private lazy val messy = Seq(
    (0L, ""),
    (1L, "   "),
    (2L, "one"),
    (3L, "a  b\t\tc\nd"), // mixed whitespace runs
    (4L, "héllo wörld héllo wörld héllo wörld"),
    (5L, "x " * 500 + "x") // long repetitive doc
  ).toDF("doc_id", "text")

  test("token/char stats survive messy input without errors") {
    val rows = messy.select(col("doc_id"),
      Text.tokenCount(col("text")).as("n"),
      Text.charCount(col("text")).as("c"),
      Text.bpeTokenCount(col("text")).as("b")).orderBy("doc_id").collect()
    assert(rows(2).getInt(1) == 1) // "one"
    assert(rows(3).getInt(1) == 4) // a b c d across mixed whitespace
    assert(rows(4).getInt(1) == 6)
    // unicode letters are not [A-Za-z]: the BPE-ish count differs from
    // whitespace count on non-ASCII — documented behavior
    assert(rows(4).getInt(3) >= 6)
  }

  test("shingles on tiny/empty texts are empty, not errors") {
    val rows = messy.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("sh")).orderBy("doc_id").collect()
    assert(rows(0).getSeq[String](1).isEmpty || rows(0).getSeq[String](1) == Seq(""))
    assert(rows(2).getSeq[String](1).isEmpty) // 1 token < n=3
    assert(rows(3).getSeq[String](1).nonEmpty)
  }

  test("repetition ratio flags the repetitive doc, not the short ones") {
    val rows = messy.select(col("doc_id"),
      Text.repetitionRatio(col("text"), 3).as("r")).orderBy("doc_id").collect()
    assert(rows(2).getDouble(1) == 0.0) // too short -> 0
    assert(rows(5).getDouble(1) > 0.99) // "x x x ..." almost pure repetition
    assert(rows(4).getDouble(1) > 0.0) // repeated unicode trigram
  }

  test("fingerprints and simhash are defined on all inputs") {
    val rows = messy.select(col("doc_id"),
      Text.fingerprint(col("text")).as("fp"),
      Text.winnowingFingerprint(col("text")).as("wf"),
      Dedup.simhash64(Text.tokens(col("text"))).as("sh"))
      .orderBy("doc_id").collect()
    assert(rows.forall(_.getString(1).length == 32))
    // empty and whitespace-only texts share the canonical fingerprint
    assert(rows(0).getString(1) == rows(1).getString(1))
    assert(rows(0).getSeq[Long](2).isEmpty) // winnow of "" is empty
  }

  test("sampling and splits accept any key type") {
    import graft.ops.Sampling
    val s = Sampling.hashSample(messy, col("text"), 0.5)
    assert(s.count() <= 6)
    val sp = messy.withColumn("p",
      Sampling.splitColumn(col("doc_id"), Seq("a" -> 0.5, "b" -> 0.5)))
    assert(sp.select("p").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(Set("a", "b")))
  }

  test("redactPii: every kind redacted, clean text untouched, counts audit") {
    val r = Seq(
      "mail me at jane.doe+x@sub.example.org now",
      "call 555-123-4567 or 555.123.4567",
      "host 192.168.0.1 ssn 123-45-6789",
      "nothing sensitive here 12345"
    ).toDF("t")
      .select(col("t"), Text.redactPii(col("t")).as("r"),
        Text.piiCount(col("t")).as("n"))
      .collect()
    assert(r(0).getString(1) == "mail me at <EMAIL> now")
    assert(r(0).getInt(2) == 1)
    assert(r(1).getString(1) == "call <PHONE> or <PHONE>")
    assert(r(1).getInt(2) == 2)
    assert(r(2).getString(1) == "host <IP> ssn <SSN>")
    assert(r(2).getInt(2) == 2)
    assert(r(3).getString(1) == r(3).getString(0) && r(3).getInt(2) == 0)
  }

  test("removeBoilerplateLines: hot lines dropped, order kept, " +
      "all-boilerplate docs become empty") {
    val d = Seq(
      (1L, "HEAD\nalpha\nFOOT"),
      (2L, "HEAD\nbeta\ngamma\nFOOT"),
      (3L, "HEAD\nFOOT"),
      (4L, "HEAD\ndelta\nFOOT")).toDF("doc_id", "text")
    val out = Text.removeBoilerplateLines(d, minDocs = 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "alpha"), (2L, "beta\ngamma"),
      (3L, ""), (4L, "delta")))
  }
}
