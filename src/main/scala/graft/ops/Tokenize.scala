package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.LongType

/** Pluggable real-tokenizer seam for token-budget operators.
  *
  * The engine's default token counts are Column-level heuristics
  * ([[Text.tokenCount]], [[Text.bpeTokenCount]]) — codegen'd, oracle-
  * expressible, and right for statistics. Training BUDGETS, though,
  * are contracted in the tokens a real tokenizer produces; this seam
  * lets a production tokenizer (a BPE merge table, SentencePiece via
  * JNI, any JVM-callable model) supply the count column those
  * operators consume, with its expensive state built ONCE PER
  * PARTITION — the [[Multimodal.extractFeatures]] batched-decoder
  * pattern, not per row.
  *
  * Wiring: [[withTokenCount]] appends `outCol` to the frame; pass
  * `col(outCol)` wherever a budget operator takes a `tokens` column
  * ([[Sampling.mixtureByTokens]], [[Sampling.selectByQualityBudget]],
  * [[Packing.packSequences]]). The heuristics remain the default
  * everywhere — this path trades whole-stage codegen for tokenizer
  * fidelity, so reach for it when the budget contract demands real
  * tokens, not for per-row statistics.
  */
object Tokenize {

  /** Per-partition tokenizer factory: `init()` runs once per task and
    * returns the (possibly stateful, non-serializable) counter — merge
    * tables get indexed, vocab files opened, JNI handles created there,
    * amortized over the partition's rows. Implementations must be
    * serializable CONFIGURATION (the counter itself need not be). */
  trait BatchTokenizer extends Serializable {
    def init(): TokenCounter
  }

  /** Executor-side counting state built by [[BatchTokenizer.init]]. */
  trait TokenCounter {
    def count(text: String): Long
  }

  /** Append `outCol` = the tokenizer's token count of `textCol` (null
    * text counts 0, matching the budget operators' drop semantics for
    * non-positive counts). One `mapPartitions` pass; all other columns
    * ride through unchanged. */
  def withTokenCount(df: DataFrame, tokenizer: BatchTokenizer,
                     textCol: String = "text",
                     outCol: String = "n_tokens"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column $outCol already exists")
    val idx = df.schema.fieldIndex(textCol)
    val outSchema = df.schema.add(outCol, LongType, nullable = false)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      val counter = tokenizer.init() // once per partition
      it.map { r =>
        val n =
          if (r.isNullAt(idx)) 0L else counter.count(r.getString(idx))
        Row.fromSeq(r.toSeq :+ n)
      }
    }
  }

  /** Minimal byte-pair-encoding tokenizer over an explicit merge list —
    * the seam's test implementation (the public BPE algorithm: within
    * each pre-token, repeatedly merge the adjacent symbol pair with the
    * best merge-table rank until none applies; the final symbol count
    * is the token count). Pre-tokenization reuses
    * [[Text.bpeTokenPattern]] (letter runs / digit runs / single
    * marks), so with an EMPTY merge table the count equals the number
    * of characters in those runs. Production tokenizers implement
    * [[BatchTokenizer]] directly; this class exists so the seam's
    * contract is executable and spec'd. */
  final case class ToyBpeTokenizer(merges: Seq[(String, String)])
      extends BatchTokenizer {
    def init(): TokenCounter = new TokenCounter {
      // merge-table indexing is the per-partition "model load"
      private val rank: Map[(String, String), Int] =
        merges.zipWithIndex.toMap
      private val pre = java.util.regex.Pattern.compile(Text.bpeTokenPattern)

      def count(text: String): Long = {
        val m = pre.matcher(text)
        var total = 0L
        while (m.find()) total += bpe(m.group())
        total
      }

      private def bpe(word: String): Long = {
        val syms = scala.collection.mutable.ArrayBuffer.from(
          word.map(_.toString))
        var done = syms.length < 2
        while (!done) {
          var best = -1
          var bestRank = Int.MaxValue
          var i = 0
          while (i < syms.length - 1) {
            val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
            if (r < bestRank) { bestRank = r; best = i }
            i += 1
          }
          if (best < 0) done = true
          else {
            syms(best) = syms(best) + syms(best + 1)
            syms.remove(best + 1)
            if (syms.length < 2) done = true
          }
        }
        syms.length.toLong
      }
    }
  }
}
