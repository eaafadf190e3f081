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

  /** BPE-ish subword-boundary token count: letter runs, digit runs, and
    * single non-alphanumeric marks count separately (the pre-tokenization
    * split of GPT-style BPE, minus byte-level details). The pattern is
    * deliberately RE2/Java-portable. */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0)))

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

  /** Intra-document repetition ratio (the C4/Gopher-style quality signal):
    * 1 - distinct n-grams / total n-grams. 0 for texts shorter than one
    * n-gram; approaches 1 for heavily repeated boilerplate. */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val total = size(tokens(text)) - lit(n - 1)
    when(total <= 0, lit(0.0)).otherwise(
      lit(1.0) - size(Dedup.shingles(text, n)).cast("double") /
        total.cast("double"))
  }

  /** The Gopher quality-rule stopword list (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training Gopher",
    * Table A1 heuristics — public). */
  val gopherStop: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Number of `#` characters plus `...` runs — the Gopher "symbol"
    * signals, counted with plain length arithmetic (no regex) so any
    * engine reproduces them exactly. */
  def symbolCount(text: Column): Column =
    (length(text) - length(replace(text, lit("#"), lit("")))) +
      (length(text) - length(replace(text, lit("..."), lit("")))) / lit(3)

  /** Tokens containing at least one ASCII letter. */
  def alphaWordCount(text: Column): Column =
    size(filter(tokens(text), x => x.rlike("[A-Za-z]")))

  def stopwordCount(text: Column, stopwords: Seq[String] = gopherStop): Column =
    size(filter(tokens(text), x => x.isin(stopwords: _*)))

  /** Gopher-style quality rule flags, one boolean per rule. Every
    * comparison is integer arithmetic (ratios are cross-multiplied:
    * `symbols/words <= 0.1` becomes `10*symbols <= words`), so the rule
    * set is bit-reproducible in ANSI SQL — no float thresholds to
    * disagree on. Rules (Gopher Table A1, the subset meaningful without
    * markup): word count in [minWords, maxWords]; mean word length in
    * [3, 10] chars; symbol-to-word ratio <= 0.1; >= 80% of words contain
    * a letter; >= 2 stopwords present. */
  def gopherRules(text: Column, minWords: Int = 50,
                  maxWords: Int = 100000): Seq[(String, Column)] = {
    val n = tokenCount(text).cast("long")
    val chars = length(text).cast("long")
    // sum of token lengths = chars - (n-1) separators, as in meanTokenLen
    val tokChars = chars - n + lit(1L)
    Seq(
      "rule_words" -> (n >= minWords && n <= maxWords),
      "rule_mean_len" -> (tokChars >= n * 3L && tokChars <= n * 10L),
      "rule_symbol" -> (symbolCount(text).cast("long") * 10L <= n),
      "rule_alpha" -> (alphaWordCount(text).cast("long") * 10L >= n * 8L),
      "rule_stop" -> (stopwordCount(text).cast("long") >= 2L))
  }

  /** Conjunction of all [[gopherRules]] — the document-level keep
    * decision of a Gopher-style quality gate. Per-row codegen'd
    * predicate: pushes into the scan filter, no shuffle, linear at any
    * corpus size. */
  def gopherKeep(text: Column, minWords: Int = 50,
                 maxWords: Int = 100000): Column =
    gopherRules(text, minWords, maxWords).map(_._2).reduce(_ && _)

  /** Boilerplate phrases whose presence drops a LINE under the C4
    * cleanup (Raffel et al. 2020 §2.2: "javascript" plus the
    * cookie/policy notices). Lowercase substring matches. */
  val c4LineDropPhrases: Seq[String] = Seq(
    "javascript", "uses cookies", "cookie policy", "privacy policy",
    "terms of use")

  /** C4-style line cleanup (Raffel et al. 2020, "Exploring the Limits
    * of Transfer Learning with a Unified Text-to-Text Transformer",
    * §2.2): keep only lines that end in terminal punctuation, carry at
    * least `minLineWords` words, and contain none of
    * [[c4LineDropPhrases]]; survivors re-join on newline. A pure
    * per-row array expression — codegen'd, no shuffle, linear at any
    * corpus size (the line list lives inside the row). */
  /** The surviving-line array behind [[c4CleanLines]] and the
    * sentence-count rule. */
  private def c4KeptLines(text: Column, minLineWords: Int): Column =
    filter(split(text, "\n"), l =>
      c4LineDropPhrases.foldLeft(
        l.rlike("[.!?\"]$") &&
          size(split(l, "\\s+")) >= minLineWords) {
        (acc, p) => acc && !lower(l).contains(p)
      })

  def c4CleanLines(text: Column, minLineWords: Int = 5): Column =
    concat_ws("\n", c4KeptLines(text, minLineWords))

  /** C4 document-level rule flags: no curly brace anywhere (code/markup
    * tell), no "lorem ipsum" placeholder, and at least `minSentences`
    * lines surviving the cleanup — each survivor ends in a terminal
    * mark by the line rule, making the line count the deterministic
    * stand-in for the paper's "at least 3 sentences" (a tokenizer-free
    * under-count: a kept line holding several sentences counts once).
    * Like [[gopherRules]], every comparison is integer/string
    * arithmetic — bit-reproducible in ANSI SQL. */
  def c4Rules(text: Column, minSentences: Int = 3,
              minLineWords: Int = 5): Seq[(String, Column)] = Seq(
    "rule_brace" -> !text.contains("{"),
    "rule_lorem" -> !lower(text).contains("lorem ipsum"),
    "rule_sentences" ->
      (size(c4KeptLines(text, minLineWords)) >= lit(minSentences)))

  /** Conjunction of all [[c4Rules]] — the C4 page-level keep decision.
    * Codegen'd scan-filter predicate, like [[gopherKeep]]. */
  def c4Keep(text: Column, minSentences: Int = 3,
             minLineWords: Int = 5): Column =
    c4Rules(text, minSentences, minLineWords).map(_._2).reduce(_ && _)

  /** Corpus vocabulary statistics: per token, total occurrences and
    * document frequency — the TF-IDF building block. One explode + one
    * partial-aggregatable groupBy; at 100 TB the exchange carries one row
    * per (partition, token), not per occurrence. */
  def vocabulary(docs: org.apache.spark.sql.DataFrame,
                 textCol: String = "text",
                 idCol: String = "doc_id"): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("occurrences"),
        countDistinct(col("id")).as("doc_freq"))

  /** Per-document top-k TF-IDF terms: tf = in-doc occurrences,
    * idf = ln(N/df).
    *
    * N policy (the round-1 design ran a hidden `docs.count()` action —
    * a surprise extra evaluation of the upstream frame): pass `numDocs`
    * when the caller can supply N cheaply (for a parquet-backed corpus,
    * `count()` is served from footer metadata — no data scan), giving
    * two tokenize passes (tf and df) and nothing else. With `numDocs`
    * omitted the function stays action-free and derives N inside the
    * plan (a one-row countDistinct branch cross-joined back as a
    * broadcast); that branch costs a third tokenize pass at execution —
    * correct for ad-hoc frames, but prefer the parameter at scale. The
    * derived N counts documents with at least one token (identical for
    * any corpus without null/token-less texts). At corpus scale the
    * vocabulary is orders of magnitude smaller than the corpus and
    * broadcasts. Ranking uses the 1e-6-rounded score (+ term tiebreak)
    * so ordering is reproducible across engines regardless of libm ulp
    * differences. */
  def tfIdfTopTerms(docs: org.apache.spark.sql.DataFrame, k: Int,
                    textCol: String = "text",
                    idCol: String = "doc_id",
                    numDocs: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val ex = docs.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("token"))
    val tf = ex.groupBy(col("id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val base = tf.join(df, Seq("token"))
    val withN = numDocs match {
      case Some(v) => base.withColumn("n", lit(v))
      case None =>
        base.crossJoin(broadcast(tf.agg(countDistinct(col("id")).as("n"))))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("score").desc, col("token"))
    withN
      .withColumn("score",
        floor(col("tf") * log(col("n").cast("double") / col("df")) * 1e6) / 1e6)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("token"), col("score"), col("rank"))
  }

  /** PII patterns, applied in order (SSN before phone so the narrower
    * pattern wins; email before IPv4 so domains never half-match). All
    * patterns are RE2/Java-portable — no lookarounds — so redaction is
    * reproducible across engines and expressible in the SQL oracle. */
  val piiPatterns: Seq[(String, String)] = Seq(
    ("SSN", "\\b\\d{3}-\\d{2}-\\d{4}\\b"),
    ("EMAIL", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("PHONE", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"),
    ("IP", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"))

  /** Redact PII spans to `<KIND>` placeholders — the pre-training scrub
    * pass. Pure per-row regexp chain: codegen'd, no shuffle, linear scan
    * at any corpus size. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (kind, p)) =>
      regexp_replace(c, p, s"<$kind>")
    }

  /** Count of PII matches per kind before redaction (audit signal). */
  def piiCount(text: Column): Column =
    piiPatterns.map { case (_, p) =>
      size(regexp_extract_all(text, lit(p), lit(0)))
    }.reduce(_ + _)

  /** Remove boilerplate lines: a line occurring in at least `minDocs`
    * DISTINCT documents (headers, footers, nav chrome — the
    * Gopher/RefinedWeb repeated-line rule) is dropped from every doc;
    * remaining lines keep their order. Dataflow: one posexplode of the
    * line table, a partial-aggregatable line→doc-frequency count, an
    * anti-join of the (small) hot-line set, and one regroup by doc — two
    * keyed shuffles at corpus scale, line payloads never carried through
    * the frequency aggregate.
    * Output: (idCol, textCol) with the filtered text. Docs whose every
    * line is boilerplate come back with an empty string. */
  def removeBoilerplateLines(docs: org.apache.spark.sql.DataFrame,
                             minDocs: Int, sep: String = "\n",
                             textCol: String = "text",
                             idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
    val hot = lines.groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") >= minDocs).select("line")
    lines.join(hot, Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(array_sort(collect_list(struct(col("pos"), col("line"))))
        .getField("line"), sep).as("kept"))
      .join(docs.select(col(idCol)), Seq(idCol), "right")
      .select(col(idCol), coalesce(col("kept"), lit("")).as(textCol))
  }

  /** Canonical-text fingerprint: lowercase, collapse whitespace, trim,
    * md5 — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Aggressive canonicalization for fuzzy-exact dedup (the CCNet/ccnet
    * normalization discipline): lowercase, strip everything but letters,
    * digits and whitespace, collapse whitespace runs, trim. Catches
    * reformatting duplicates — case changes, punctuation edits, spacing —
    * that [[fingerprint]]'s whitespace-only canonicalization misses,
    * while staying a per-row codegen'd regex chain (no shuffle; the
    * dedup itself is the usual 16-byte-digest groupBy). Both regexes are
    * RE2-portable, so the oracle replays the exact pipeline. */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** [[normalizeForDedup]] folded to the 16-byte dedup key. */
  def normalizedFingerprint(text: Column): Column =
    md5(normalizeForDedup(text))

  /** Global paragraph-level exact dedup (the CCNet-style granularity
    * between [[removeBoilerplateLines]]' frequency rule and whole-doc
    * dedup): each canonical paragraph fingerprint keeps its FIRST
    * corpus-wide occurrence — ordered by (doc id, position) — and every
    * later copy is dropped from its document; surviving paragraphs keep
    * their order. Whitespace-only paragraphs are document structure, not
    * content, and are kept everywhere.
    *
    * Dataflow: one posexplode, a rank window partitioned by the 16-byte
    * paragraph fingerprint (the only wide key), one regroup by doc —
    * two keyed shuffles at any corpus size, exactly the
    * [[removeBoilerplateLines]] shape plus the keep-first rank. Docs
    * whose every paragraph is a later copy come back with empty text. */
  def dedupParagraphsGlobal(docs: org.apache.spark.sql.DataFrame,
                            sep: String = "\n",
                            textCol: String = "text",
                            idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    val paras = docs.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "para")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(fingerprint(col("para")))
      .orderBy(col(idCol), col("pos"))
    paras
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 || trim(col("para")) === "")
      .groupBy(col(idCol))
      .agg(array_join(array_sort(collect_list(struct(col("pos"), col("para"))))
        .getField("para"), sep).as("kept"))
      .join(docs.select(col(idCol)), Seq(idCol), "right")
      .select(col(idCol), coalesce(col("kept"), lit("")).as(textCol))
  }

  /** Winnowing document fingerprint (the rolling-hash scheme of
    * Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for Document
    * Fingerprinting", SIGMOD 2003): rolling hash over character k-grams,
    * keep the minimum hash of every window of `w` consecutive k-grams
    * (rightmost on ties), distinct. Two documents sharing any sufficiently
    * long substring share fingerprint hashes — robust to edits in a way
    * the whole-document md5 is not. */
  def winnowingFingerprint(text: Column, k: Int = 8, w: Int = 4): Column =
    org.apache.spark.sql.graftshim.shim.column(
      WinnowFingerprint(
        org.apache.spark.sql.graftshim.shim.expression(text), k, w))

  /** Per-group term-distribution drift: KL divergence of each group's
    * unigram distribution from the whole-corpus distribution,
    * restricted to the global top-`topV` tokens and renormalized
    * within that set (so both distributions are well-defined and the
    * statistic is vocabulary-bounded). A mixture-monitoring signal:
    * run it per source / per snapshot and alert when a slice drifts
    * from the corpus it is supposed to represent.
    *
    * Scale shape: one (group, token) count shuffle over the corpus;
    * everything after operates on vocabulary-sized tables — the
    * top-V list and the per-group totals broadcast. Missing tokens in
    * a group contribute 0 to the sum (lim p→0 of p·ln p), which the
    * inner-join encoding below gives for free.
    *
    * `kl` is floor-rounded at 1e-6; p-ratios inside the log are exact
    * integer-count ratios so the per-token terms are engine-stable,
    * and the rounding makes summation-order boundary flips rare (it
    * cannot absorb them outright: when the true sum lies within an ulp
    * of a 1e-6 grid line, engines summing in different orders may still
    * floor to adjacent buckets — an oracle mismatch exactly at a bucket
    * boundary is expected noise, not a regression).
    *
    * Returns `(group, n_tokens, kl)` ordered by group, where
    * `n_tokens` is the group's token count within the top-V set.
    */
  /** CCNet-style unigram surprisal: mean `-ln p(token)` per document
    * under the corpus's own top-V unigram distribution — the classic
    * LM-perplexity quality signal at its cheapest useful order. High
    * surprisal = token mix unlike the corpus (gibberish, wrong
    * language, binary junk); unusually LOW surprisal = boilerplate.
    * Probabilities are Laplace-1 smoothed over top-V + one shared OOV
    * bucket (`p_oov = (n_total - n_top + 1) / (n_total + V + 1)`), so
    * every token has positive mass and the distribution is proper.
    *
    * Returns `(id, n_tokens, surprisal)`, surprisal 1e-6-floor-rounded
    * (same summation-order caveat as [[termDrift]]: per-term `ln` ulps
    * and partial-sum order make boundary flips rare, not impossible).
    *
    * Scale shape: two tokenize passes (corpus counts, per-doc counts —
    * the [[tfIdfTopTerms]] minimal shape); the top-V table and the
    * single-row stats broadcast; nothing shuffles more than
    * (doc, distinct token) rows. */
  def unigramSurprisal(docs: org.apache.spark.sql.DataFrame,
                       topV: Int,
                       textCol: String = "text",
                       idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame = {
    require(topV > 0, "topV must be positive")
    def docTokens = docs.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("token"))
    val counts = docTokens.groupBy(col("token"))
      .agg(count(lit(1)).as("c"))
    val top = counts.orderBy(col("c").desc, col("token")).limit(topV)
    val stats = counts.agg(sum(col("c")).as("n_total")).crossJoin(
      top.agg(sum(col("c")).as("n_top"), count(lit(1)).as("v")))
    val perDoc = docTokens.groupBy(col("id"), col("token"))
      .agg(count(lit(1)).as("dc"))
    perDoc
      .join(broadcast(top.select(col("token"), col("c"))),
        Seq("token"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("p",
        (coalesce(col("c"), col("n_total") - col("n_top")) + lit(1L))
          .cast("double") /
          (col("n_total") + col("v") + lit(1L)).cast("double"))
      .withColumn("term", col("dc") * -log(col("p")))
      .groupBy(col("id"))
      .agg(sum(col("dc")).as("n_tokens"),
        (floor(sum(col("term")) / sum(col("dc")) * 1e6) / 1e6)
          .as("surprisal"))
  }

  /** KenLM-style bigram log-loss with stupid backoff (Brants et al.
    * 2007): mean `-ln s(w | v)` over a document's adjacent token pairs,
    * scored under a bigram model trained on the corpus itself — the
    * next-order-up of [[unigramSurprisal]] and the shape of the CCNet /
    * RedPajama "LM perplexity" quality filter (one `exp` away from
    * perplexity; the ranking is identical so the log domain is kept —
    * fewer ulp hazards for cross-engine replay).
    *
    * Model, all from exact integer corpus counts so any engine rebuilds
    * it bit-for-bit:
    *   - vocabulary = top-V unigrams by (count desc, token asc);
    *   - bigram table = adjacent pairs with BOTH tokens in-vocabulary
    *     (size <= min(observed pairs, V^2) — the classic pruned-LM
    *     vocabulary cap that bounds the model independent of corpus
    *     size);
    *   - score: `s(w|v) = c(v,w) / c(v)` when the pair is in the table,
    *     else stupid backoff `0.4 * p_uni(w)` with [[unigramSurprisal]]'s
    *     Laplace top-V + shared-OOV-bucket unigram distribution (proper,
    *     always positive — the log never sees zero).
    *
    * High log-loss = token SEQUENCES unlike the corpus (word salad with
    * plausible words, shuffled text — invisible to unigram surprisal);
    * unusually low = boilerplate. Docs with fewer than two tokens have
    * no bigrams and are absent from the output (nothing to score).
    *
    * Returns `(id, n_bigrams, logloss)` with logloss 1e-6-floor-rounded
    * (same partial-sum-order caveat as [[unigramSurprisal]]).
    *
    * Scale shape: two tokenize passes (corpus counts, per-doc bigram
    * counts). The top-V table and single-row stats broadcast; the
    * bigram model is joined on its (v, w) key — a plain shuffle join,
    * NOT a broadcast, because at a 100 TB corpus a 100k-token
    * vocabulary makes V^2 too large to ship — and nothing shuffles more
    * than (doc, distinct bigram) rows. The in-vocabulary semi-join
    * prunes the model build before its aggregation. */
  def bigramLogLoss(docs: org.apache.spark.sql.DataFrame,
                    topV: Int,
                    backoff: Double = 0.4,
                    textCol: String = "text",
                    idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame =
    bigramLogLossAgainst(docs, docs, topV, backoff, textCol, idCol)

  /** [[bigramLogLoss]] with the model trained on a SEPARATE reference
    * corpus — the actual CCNet deployment shape: the LM trains on a
    * trusted clean corpus (their Wikipedia) and scores the raw crawl,
    * so "low perplexity" means "reads like the reference", not "reads
    * like the average of the crawl being filtered". Same model
    * definition, scoring, rounding, and scale shape as the self-trained
    * form ([[bigramLogLoss]] is this with `train = docs`); vocabulary,
    * counts, and OOV mass all come from `train` only, so a score-side
    * token the reference never saw backs off to the reference's shared
    * OOV bucket. */
  def bigramLogLossAgainst(train: org.apache.spark.sql.DataFrame,
                           docs: org.apache.spark.sql.DataFrame,
                           topV: Int,
                           backoff: Double = 0.4,
                           textCol: String = "text",
                           idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame = {
    require(topV > 0, "topV must be positive")
    require(backoff > 0.0 && backoff <= 1.0,
      "backoff weight must be in (0, 1]")
    // adjacent pairs; slice-with-length-0 yields an empty array for
    // single-token docs (sequence(1, size-1) would mis-step backwards)
    def bigramsOf(d: org.apache.spark.sql.DataFrame) = d
      .select(col(idCol).as("id"), tokens(col(textCol)).as("t"))
      .select(col("id"), explode(zip_with(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
        (v, w) => struct(v.as("v"), w.as("w")))).as("b"))
      .select(col("id"), col("b.v").as("v"), col("b.w").as("w"))
    val counts = train
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("c"))
    val top = counts.orderBy(col("c").desc, col("token")).limit(topV)
    val stats = counts.agg(sum(col("c")).as("n_total")).crossJoin(
      top.agg(sum(col("c")).as("n_top"), count(lit(1)).as("vsz")))
    // bigram model: in-vocabulary TRAIN pairs with the context's count
    val model = bigramsOf(train)
      .join(broadcast(top.select(col("token").as("v"), col("c").as("cv"))),
        Seq("v"))
      .join(broadcast(top.select(col("token").as("w"))), Seq("w"))
      .groupBy(col("v"), col("w"), col("cv"))
      .agg(count(lit(1)).as("cb"))
    val perDoc = bigramsOf(docs).groupBy(col("id"), col("v"), col("w"))
      .agg(count(lit(1)).as("dc"))
    perDoc
      .join(model, Seq("v", "w"), "left")
      .join(broadcast(top.select(col("token").as("w"),
        col("c").as("cw"))), Seq("w"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("s",
        when(col("cb").isNotNull,
          col("cb").cast("double") / col("cv").cast("double"))
          .otherwise(lit(backoff) *
            ((coalesce(col("cw"), col("n_total") - col("n_top")) + lit(1L))
              .cast("double") /
              (col("n_total") + col("vsz") + lit(1L)).cast("double"))))
      .withColumn("term", col("dc") * -log(col("s")))
      .groupBy(col("id"))
      .agg(sum(col("dc")).as("n_bigrams"),
        (floor(sum(col("term")) / sum(col("dc")) * 1e6) / 1e6)
          .as("logloss"))
  }

  /** Order-3 stupid backoff: mean `-ln s(w | u v)` with the recursive
    * chain `s3 = c(u,v,w)/c(u,v)` when the trigram is in the model,
    * else `0.4 * c(v,w)/c(v)` when the bigram is, else
    * `0.4 * 0.4 * p_uni(w)` — one order closer to the 5-gram KenLM
    * CCNet actually deploys than [[bigramLogLoss]], and the
    * demonstration that the backoff chain generalizes. All model
    * tables are restricted to the top-V vocabulary (the pruned-LM cap);
    * the trigram context count `c(u,v)` is the in-vocabulary bigram
    * count, so every ratio is a quotient of exact train-corpus
    * integers. Docs with fewer than three tokens are absent.
    *
    * Returns `(id, n_trigrams, logloss)`, same rounding/caveats as the
    * bigram form. Scale shape identical: model tables join on their
    * gram keys (never broadcast by construction), top-V and stats
    * broadcast, widest shuffle (doc, distinct trigram) rows. */
  def trigramLogLoss(docs: org.apache.spark.sql.DataFrame,
                     topV: Int,
                     backoff: Double = 0.4,
                     textCol: String = "text",
                     idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame =
    trigramLogLossAgainst(docs, docs, topV, backoff, textCol, idCol)

  /** [[trigramLogLoss]] with the model trained on a separate reference
    * corpus (see [[bigramLogLossAgainst]] for why that is the
    * deployment shape). */
  def trigramLogLossAgainst(train: org.apache.spark.sql.DataFrame,
                            docs: org.apache.spark.sql.DataFrame,
                            topV: Int,
                            backoff: Double = 0.4,
                            textCol: String = "text",
                            idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame = {
    require(topV > 0, "topV must be positive")
    require(backoff > 0.0 && backoff <= 1.0,
      "backoff weight must be in (0, 1]")
    def bigramsOf(d: org.apache.spark.sql.DataFrame) = d
      .select(tokens(col(textCol)).as("t"))
      .select(explode(zip_with(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
        (v, w) => struct(v.as("v"), w.as("w")))).as("b"))
      .select(col("b.v").as("v"), col("b.w").as("w"))
    def trigramsOf(d: org.apache.spark.sql.DataFrame) = {
      val len = greatest(size(col("t")) - 2, lit(0))
      d.select(col(idCol).as("id"), tokens(col(textCol)).as("t"))
        .select(col("id"), explode(zip_with(
          zip_with(slice(col("t"), lit(1), len),
            slice(col("t"), lit(2), len),
            (u, v) => struct(u.as("u"), v.as("v"))),
          slice(col("t"), lit(3), len),
          (uv, w) => struct(uv.getField("u").as("u"),
            uv.getField("v").as("v"), w.as("w")))).as("g"))
        .select(col("id"), col("g.u").as("u"), col("g.v").as("v"),
          col("g.w").as("w"))
    }
    val counts = train
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("c"))
    val top = counts.orderBy(col("c").desc, col("token")).limit(topV)
    val stats = counts.agg(sum(col("c")).as("n_total")).crossJoin(
      top.agg(sum(col("c")).as("n_top"), count(lit(1)).as("vsz")))
    val m2 = bigramsOf(train)
      .join(broadcast(top.select(col("token").as("v"), col("c").as("cv"))),
        Seq("v"))
      .join(broadcast(top.select(col("token").as("w"))), Seq("w"))
      .groupBy(col("v"), col("w"), col("cv"))
      .agg(count(lit(1)).as("cb2"))
    // trigram model with its context's in-vocabulary bigram count
    val m3 = trigramsOf(train)
      .join(broadcast(top.select(col("token").as("u"))), Seq("u"))
      .join(broadcast(top.select(col("token").as("v"))), Seq("v"))
      .join(broadcast(top.select(col("token").as("w"))), Seq("w"))
      .groupBy(col("u"), col("v"), col("w"))
      .agg(count(lit(1)).as("cb3"))
      .join(m2.select(col("v").as("u"), col("w").as("v"),
        col("cb2").as("c2")), Seq("u", "v"))
    val perDoc = trigramsOf(docs)
      .groupBy(col("id"), col("u"), col("v"), col("w"))
      .agg(count(lit(1)).as("dc"))
    perDoc
      .join(m3, Seq("u", "v", "w"), "left")
      .join(m2.select(col("v"), col("w"), col("cv"), col("cb2")),
        Seq("v", "w"), "left")
      .join(broadcast(top.select(col("token").as("w"),
        col("c").as("cw"))), Seq("w"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("s",
        when(col("cb3").isNotNull,
          col("cb3").cast("double") / col("c2").cast("double"))
          .when(col("cb2").isNotNull,
            lit(backoff) *
              (col("cb2").cast("double") / col("cv").cast("double")))
          .otherwise(lit(backoff) * (lit(backoff) *
            ((coalesce(col("cw"), col("n_total") - col("n_top")) + lit(1L))
              .cast("double") /
              (col("n_total") + col("vsz") + lit(1L)).cast("double")))))
      .withColumn("term", col("dc") * -log(col("s")))
      .groupBy(col("id"))
      .agg(sum(col("dc")).as("n_trigrams"),
        (floor(sum(col("term")) / sum(col("dc")) * 1e6) / 1e6)
          .as("logloss"))
  }

  def termDrift(docs: org.apache.spark.sql.DataFrame, topV: Int,
                textCol: String = "text",
                groupCol: String = "source")
      : org.apache.spark.sql.DataFrame = {
    require(topV > 0, "topV must be positive")
    val counts = docs
      .select(col(groupCol).as("grp"),
        explode(tokens(col(textCol))).as("token"))
      .groupBy(col("grp"), col("token"))
      .agg(count(lit(1)).as("c"))
    val global = counts.groupBy(col("token"))
      .agg(sum(col("c")).as("gc"))
      .orderBy(col("gc").desc, col("token"))
      .limit(topV)
    val gtot = global.agg(sum(col("gc")).cast("double").as("gtot"))
    val restricted = counts.join(broadcast(global), Seq("token"))
    val stot = restricted.groupBy(col("grp"))
      .agg(sum(col("c")).as("n_tokens"))
    restricted
      .join(broadcast(stot), Seq("grp"))
      .crossJoin(broadcast(gtot))
      .select(col("grp"), col("n_tokens"),
        ((col("c") / col("n_tokens")) *
          log((col("c") / col("n_tokens")) /
            (col("gc") / col("gtot")))).as("term"))
      .groupBy(col("grp"), col("n_tokens"))
      .agg((floor(sum(col("term")) * 1e6) / 1e6).as("kl"))
      .select(col("grp").as(groupCol), col("n_tokens"), col("kl"))
      .orderBy(col(groupCol))
  }

  /** Cross-group corpus overlap: exact n-gram-shingle Jaccard between
    * every pair of groups (sources, snapshots, dumps) that share at
    * least one shingle — the corpus-level "how much of B is already in
    * A" signal that decides whether a new dump is worth ingesting.
    *
    * Returns `(src_a, src_b, n_a, n_b, n_shared, jaccard)` with
    * `src_a < src_b`, ordered by jaccard (floor-rounded 1e-6)
    * descending then the pair. n_a/n_b are distinct-shingle counts.
    *
    * Scale shape: one distinct-(group, shingle) shuffle, then a
    * shingle-keyed self-join whose fan-out per shingle is s·(s-1)/2
    * for s = number of groups containing it — bounded by the GROUP
    * count, not the corpus. Ubiquitous shingles (every group has
    * them) are exactly the ones that carry no discrimination;
    * `maxGroupsPerShingle` drops shingles present in more than that
    * many groups BEFORE the join (0 = exact, keep all). With the cap
    * active, n_shared/jaccard are computed over the discriminative
    * shingle subset — an explicitly approximate, skew-proof mode for
    * corpora with thousands of groups.
    */
  def sourceNgramOverlap(docs: org.apache.spark.sql.DataFrame,
                         n: Int = 3,
                         maxGroupsPerShingle: Int = 0,
                         textCol: String = "text",
                         groupCol: String = "source")
      : org.apache.spark.sql.DataFrame = {
    require(n >= 1, "n must be >= 1")
    val sh0 = docs
      .select(col(groupCol).as("grp"),
        explode(Dedup.shingles(col(textCol), n)).as("shingle"))
      .distinct()
    val sh =
      if (maxGroupsPerShingle <= 0) sh0
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("shingle"))
        // count-over-window, not groupBy+join: one shuffle, and the
        // per-shingle partition is bounded by the group count
        sh0.withColumn("__g", count(lit(1)).over(w))
          .filter(col("__g") <= maxGroupsPerShingle)
          .drop("__g")
      }
    val counts = sh.groupBy(col("grp")).agg(count(lit(1)).as("n_sh"))
    val shared = sh.select(col("grp").as("src_a"), col("shingle"))
      .join(sh.select(col("grp").as("src_b"), col("shingle")),
        Seq("shingle"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(counts.select(col("grp").as("src_a"),
        col("n_sh").as("n_a"))), Seq("src_a"))
      .join(broadcast(counts.select(col("grp").as("src_b"),
        col("n_sh").as("n_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("n_shared"),
        (floor(col("n_shared") /
          (col("n_a") + col("n_b") - col("n_shared")) * 1e6) / 1e6)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("src_a"), col("src_b"))
  }

  /** Top-k adjacent-bigram collocations by pointwise mutual
    * information — tokenizer/vocabulary QA (multi-word units that a
    * whitespace tokenizer splits, boilerplate phrase discovery).
    *
    * PMI = ln( (c12/B) / ((c1/T)·(c2/T)) ) with c12 the bigram count,
    * c1/c2 unigram counts, B total bigrams, T total tokens. The
    * `minCount` floor is applied to the bigram counts BEFORE the
    * unigram joins, cutting the heavy-tailed bigram table down to the
    * frequent head early; low-count bigrams are exactly the ones PMI
    * over-scores anyway. All counts are exact integers; `pmi` is
    * floor-rounded at 1e-6 and ties order by (w1, w2).
    *
    * Scale shape: one bigram-count shuffle and one unigram-count
    * shuffle over the corpus, then two vocabulary-keyed joins on the
    * minCount-pruned head (AQE broadcasts them when small) and a
    * TakeOrderedAndProject top-k.
    */
  def collocations(docs: org.apache.spark.sql.DataFrame, k: Int,
                   minCount: Long = 5L, textCol: String = "text")
      : org.apache.spark.sql.DataFrame = {
    require(k > 0, "k must be positive")
    require(minCount >= 1L, "minCount must be >= 1")
    val toks = docs.select(tokens(col(textCol)).as("toks"))
    // sequence(1, 0) in Spark is DESCENDING [1, 0], so single-token
    // documents need the explicit size >= 2 guard
    val big = toks
      .select(explode(expr(
        "if(size(toks) < 2, array(), transform(sequence(1, size(toks) - 1), " +
          "i -> named_struct('w1', toks[i-1], 'w2', toks[i])))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    // T and B come from a map-side scalar scan, NOT from the count
    // tables: uni totals would re-evaluate the explode, and big is
    // already minCount-pruned (B must count ALL bigrams)
    val totals = toks.agg(
      sum(size(col("toks"))).cast("double").as("t"),
      sum(greatest(size(col("toks")) - 1, lit(0))).cast("double").as("btot"))
    big
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c12").as("pair_count"),
        (floor(log((col("c12") / col("btot")) /
          ((col("c1") / col("t")) * (col("c2") / col("t")))) * 1e6) / 1e6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }
}

/** One-pass winnowing fingerprint expression: canonicalize (lowercase,
  * collapse whitespace), polynomial rolling hash over char k-grams,
  * window minima, distinct sorted output (`array<long>`).
  */
case class WinnowFingerprint(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    k: Int, w: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(k >= 2 && w >= 1, "need k >= 2, w >= 1")

  import org.apache.spark.sql.types._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  private val B = 1000000007L

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = input.toString.toLowerCase.replaceAll("\\s+", " ").trim
    if (s.length < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    // rolling polynomial hash of each k-gram
    var pow = 1L
    (1 until k).foreach(_ => pow = pow * B)
    val n = s.length - k + 1
    val hs = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    hs(0) = h
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + k - 1)
      hs(i) = h
      i += 1
    }
    // winnowing: min of each window of w hashes, rightmost wins ties;
    // a text shorter than one window contributes its single minimum
    val sel = new java.util.TreeSet[java.lang.Long]()
    val lastStart = math.max(0, n - w)
    var start = 0
    while (start <= lastStart) {
      val end = math.min(start + w, n)
      var minIdx = start
      var j = start + 1
      while (j < end) {
        if (hs(j) <= hs(minIdx)) minIdx = j
        j += 1
      }
      sel.add(hs(minIdx))
      start += 1
    }
    val arr = new Array[Any](sel.size)
    val it = sel.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = it.next().longValue(); idx += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = c)
}
