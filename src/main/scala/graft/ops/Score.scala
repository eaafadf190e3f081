package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.DoubleType

/** Pluggable model-based quality-scorer seam for selection operators.
  *
  * The engine's default quality signals are Column-level heuristics
  * ([[Text.qualityScore]], [[Text.unigramSurprisal]]) — codegen'd,
  * oracle-expressible, and right for calibration statistics. Production
  * quality FILTERING, though, is usually model-based (a fastText
  * classifier, a KenLM perplexity model, any JVM-callable scorer); this
  * seam lets such a model supply the quality column the selection
  * operators consume, with its expensive state loaded ONCE PER
  * PARTITION — the [[Tokenize.BatchTokenizer]] / batched-decoder
  * pattern, not per row.
  *
  * Wiring: [[withQualityScore]] appends `outCol` to the frame; pass
  * `col(outCol)` wherever an operator takes a `quality` column
  * ([[Sampling.selectByQualityBudget]], the decile-calibration and
  * threshold queries, [[Dedup.keepClusterBest]]). The heuristics
  * remain the default everywhere — this path trades whole-stage codegen
  * for model fidelity, so reach for it when selection is contracted on
  * a real classifier's scores, not for per-row statistics.
  */
object Score {

  /** Per-partition scorer factory: `init()` runs once per task and
    * returns the (possibly stateful, non-serializable) scorer — model
    * weights get loaded, native handles created, feature vocabularies
    * indexed there, amortized over the partition's rows. Implementations
    * must be serializable CONFIGURATION (the scorer itself need not
    * be). */
  trait BatchScorer extends Serializable {
    def init(): DocScorer
  }

  /** Executor-side scoring state built by [[BatchScorer.init]]. */
  trait DocScorer {
    def score(text: String): Double
  }

  /** Append `outCol` = the model's quality score of `textCol`. Null
    * text scores NaN — [[Sampling.selectByQualityBudget]] and the other
    * selection operators DROP null/NaN qualities, so un-scorable rows
    * are excluded from selection rather than silently ranked. One
    * `mapPartitions` pass; all other columns ride through unchanged. */
  def withQualityScore(df: DataFrame, scorer: BatchScorer,
                       textCol: String = "text",
                       outCol: String = "model_quality"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column $outCol already exists")
    val idx = df.schema.fieldIndex(textCol)
    val outSchema = df.schema.add(outCol, DoubleType, nullable = false)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      val s = scorer.init() // once per partition
      it.map { r =>
        val q =
          if (r.isNullAt(idx)) Double.NaN else s.score(r.getString(idx))
        Row.fromSeq(r.toSeq :+ q)
      }
    }
  }

  /** Logistic regression over the engine's own text statistics — the
    * seam's executable test implementation (sigmoid of a linear model
    * over stopword ratio, mean token length, and alphabetic-character
    * ratio: the same public feature family as [[Text.qualityScore]],
    * so scores land in (0, 1) and feed [[Sampling.selectByQualityBudget]]
    * with its default `[qMin, qMax]` range). The indexed stopword set
    * is the per-partition "model load". Production classifiers
    * implement [[BatchScorer]] directly; this class exists so the
    * seam's contract is executable and spec'd. */
  final case class ToyLogisticScorer(bias: Double, wStop: Double,
                                     wMeanLen: Double, wAlpha: Double,
                                     stopwords: Seq[String])
      extends BatchScorer {
    def init(): DocScorer = new DocScorer {
      private val stops = stopwords.map(_.toLowerCase).toSet

      def score(text: String): Double = {
        val toks = text.split("\\s+").filter(_.nonEmpty)
        val stopRatio =
          if (toks.isEmpty) 0.0
          else toks.count(t => stops(t.toLowerCase)).toDouble / toks.length
        val meanLen =
          if (toks.isEmpty) 0.0
          else toks.map(_.length.toLong).sum.toDouble / toks.length
        val alphaRatio =
          if (text.isEmpty) 0.0
          else text.count(_.isLetter).toDouble / text.length
        val z = bias + wStop * stopRatio + wMeanLen * meanLen +
          wAlpha * alphaRatio
        1.0 / (1.0 + math.exp(-z))
      }
    }
  }
}
