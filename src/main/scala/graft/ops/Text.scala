package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token statistics, quality scoring, language identification, document
  * fingerprinting. All are composed from codegen'd built-in SQL functions
  * (no UDFs) so they stay inside whole-stage codegen on a 100 TB scan,
  * and every scalar is expressible in ANSI SQL for oracle verification.
  */
object Text {

  /** Whitespace tokenization (the corpus convention). */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def charCount(text: Column): Column = length(text)

  /** Distinct-token / token ratio — a vocabulary-richness quality signal. */
  def typeTokenRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") /
      size(tokens(text)).cast("double")

  /** Share of tokens drawn from a stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), x => x.isin(stopwords: _*))).cast("double") /
      size(tokens(text)).cast("double")

  /** Mean token length — proxies for gibberish / boilerplate detection. */
  def meanTokenLen(text: Column): Column =
    (length(text) - size(tokens(text)) + 1).cast("double") /
      size(tokens(text)).cast("double")

  /** Composite quality score in [0, 1]: rewards moderate length and
    * vocabulary richness. Pure double arithmetic in a fixed op order so
    * any engine reproduces it bit-for-bit. */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val ttr = typeTokenRatio(text)
    val lenScore = least(n / lit(64.0), lit(1.0))
    (lenScore * lit(0.5)) + (ttr * lit(0.5))
  }

  /** Stopword-profile language identification (n-gram heuristic):
    * score each candidate language by how many tokens fall in its
    * profile set; deterministic argmax with a fixed preference order.
    * Profiles are intentionally tiny — the operator demonstrates the
    * scalable shape (per-row scoring, no shuffle); production use swaps
    * in real frequency tables. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "und", "nicht"),
    "es" -> Seq("el", "los", "que"))

  def langScore(text: Column, profile: Seq[String]): Column =
    size(filter(tokens(text), x => x.isin(profile: _*)))

  def langId(text: Column): Column = {
    val s = langProfiles.map { case (l, p) => l -> langScore(text, p) }.toMap
    when(s("en") >= s("de") && s("en") >= s("es") && s("en") > 0, "en")
      .when(s("de") >= s("es") && s("de") > 0, "de")
      .when(s("es") > 0, "es")
      .otherwise("unknown")
  }

  /** Canonical-text fingerprint: lowercase, collapse whitespace, trim,
    * md5 — the exact-dedup key (rolling-hash shingle fingerprints live in
    * [[Dedup]]). */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))
}
