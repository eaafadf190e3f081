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

  test("bigramLogLoss on messy input: empty/whitespace/single-token " +
    "docs are absent, mixed whitespace tokenizes like single spaces") {
    val out = Text.bigramLogLoss(messy, topV = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no adjacent pair to score: "" ([""], one empty token) and "one"
    // are absent, not zero-scored. "   " splits to ["", ""] (Spark's
    // split keeps the trailing empty — limit -1 — and DuckDB's
    // string_split_regex matches), so it carries ONE ("","") pair:
    // whitespace-only docs are scoreable boilerplate, not invisible
    assert(!out.contains(0L) && !out.contains(2L))
    assert(out(1L) == 1L)
    assert(out(3L) == 3L) // a b c d -> 3 pairs across \t\t and \n
    assert(out(4L) == 5L)
    assert(out(5L) == 500L)
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

  test("c4CleanLines: terminal punctuation, word floor, and phrase " +
    "drops; c4Rules gates brace/lorem/sentence-count pages") {
    val good = "this is a proper sentence here."
    val pages = Seq(
      // three good sentences -> keep
      (0L, s"$good\n$good\n$good"),
      // javascript and cookie lines cut; only two sentences left
      (1L, s"$good\nplease enable javascript to continue.\n" +
        s"this site uses cookies for tracking.\n$good"),
      // no terminal punctuation anywhere
      (2L, "a line without any ending\nanother bare line"),
      // short exclamations fail the five-word floor
      (3L, "wow!\nnice!\ngreat!"),
      // quote counts as terminal punctuation (C4 keeps quoted speech)
      (4L, "he said \"this is clearly fine speech\"\n" +
        s"$good\n$good"),
      // lorem and brace pages die regardless of line quality
      (5L, s"$good\n$good\nLorem ipsum dolor sit amet filler.\n$good"),
      (6L, s"$good\n$good\nvar x = { a: 1 };\n$good"),
      (7L, "")).toDF("doc_id", "text")
    val out = pages.select(col("doc_id"),
      Text.c4CleanLines(col("text")).as("clean"),
      Text.c4Keep(col("text")).as("keep"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val byId = out.map(x => x._1 -> x).toMap
    assert(byId(0L)._3)
    assert(byId(1L)._2 == s"$good\n$good" && !byId(1L)._3)
    assert(byId(2L)._2 == "" && !byId(2L)._3)
    assert(byId(3L)._2 == "" && !byId(3L)._3)
    assert(byId(4L)._3 &&
      byId(4L)._2.startsWith("he said \"this is clearly fine speech\""))
    assert(!byId(5L)._3 && !byId(6L)._3 && !byId(7L)._3)
    // rule attribution: 5 fails lorem only, 6 fails brace only
    val ruleCols = Seq(col("doc_id")) ++
      Text.c4Rules(col("text")).map { case (n, c) => c.as(n) }
    val rules = pages.filter(col("doc_id").isin(5L, 6L))
      .select(ruleCols: _*)
      .orderBy("doc_id").collect()
    assert(rules(0).getBoolean(1) && !rules(0).getBoolean(2))
    assert(!rules(1).getBoolean(1) && rules(1).getBoolean(2))
  }
}
