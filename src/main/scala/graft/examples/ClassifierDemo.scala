package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Classifier, Sampling, Text}

/** The trained-quality-filter lifecycle end to end — the GPT-3-lineage
  * classifier loop a 100 TB curation pipeline runs continuously:
  *
  *   - featurize: vocab counts / hashed indices, codegen'd, no shuffle
  *   - train: distributed IRLS (dense) on weak labels
  *   - evaluate: confusion + exact Mann-Whitney AUC, integer-exact
  *   - score: dense literal margin chain / sparse broadcast-join
  *   - select: per-source token budgets filled in margin order
  *   - refresh: online Newton folds into the persisted model with the
  *     incremental-index exactly-once ledger
  *
  * Run: `sbt "runMain graft.examples.ClassifierDemo [sfDir]"`. */
object ClassifierDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-classifier-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val vocab = Seq("hash", "join", "sort", "scan",
      "batch", "data", "merge", "filter")

    println("== featurize + weak labels (concept: mentions 'hash' >= 2) ==")
    val feats = docs.select(col("doc_id"), col("source"),
      Text.tokenCount(col("text")).as("tok"),
      Classifier.vocabCountFeatures(Text.tokens(col("text")), vocab)
        .as("f"))
      .withColumn("label", element_at(col("f"), 1) >= 2.0)
    feats.groupBy(col("label")).count().show()

    println("== train: distributed IRLS with L2 ridge ==")
    val model = Classifier.trainLogistic(feats, "f", "label",
      dim = vocab.size)
    println(s"bias=${model.bias}")
    vocab.zip(model.weights).foreach { case (w, v) =>
      println(f"  w($w%-6s) = $v%+.3f")
    }

    println("== evaluate: confusion + exact AUC + calibration ==")
    val scored = feats
      .withColumn("margin", Classifier.marginExpr(col("f"), model))
      .withColumn("predicted", col("margin") > 0)
    Classifier.confusion(scored, "label", "predicted").show()
    Classifier.aucExact(scored, "margin", "label").show()
    // continuous-score-safe AUC: KLL edges bound the group relation
    Classifier.aucBinned(scored, "margin", "label", bins = 256).show()
    Classifier.calibrationCurve(scored, "margin", "label", "doc_id",
      bins = 5).show()

    println("== cross-validate: out-of-fold honesty ==")
    val oof = Classifier.crossValidate(feats, "f", "label", "doc_id",
      dim = vocab.size, k = 3, iters = 16, l2 = 1e-3)
    val oofAcc = feats.join(oof, "doc_id")
      .select(avg(when((col("margin") > 0) === col("label"), 1.0)
        .otherwise(0.0))).head().getDouble(0)
    println(f"out-of-fold accuracy: $oofAcc%.4f")

    println("== multiclass: softmax domain routing ==")
    val words3 = Seq("hash", "join", "sort")
    val f3 = Classifier.vocabCountFeatures(Text.tokens(col("text")), words3)
    val c0 = element_at(col("f3"), 1); val c1 = element_at(col("f3"), 2)
    val c2 = element_at(col("f3"), 3)
    val multi = docs.withColumn("f3", f3)
      .withColumn("label3",
        when(c0 >= c1 && c0 >= c2, 0).when(c1 >= c2, 1).otherwise(2))
    val sm = Classifier.trainSoftmax(multi, "f3", "label3",
      dim = 3, numClasses = 3)
    multi.select(Classifier.softmaxPredictExpr(col("f3"), sm)
      .as("predicted"))
      .groupBy(col("predicted")).count().orderBy(col("predicted")).show()

    println("== multiclass at hashed scale: distill + sparse GD polish ==")
    // the dense router's weights land at their words' xxhash bins
    // (same linear form, so the distilled logits are exact), then
    // warm-started sparse GD polishes in the 4096-bin serving space —
    // the CCNet-at-scale shape the dense Newton cap bars
    val hdim = 4096
    val multiIdx = multi.withColumn("idx", Classifier.hashedIndices(
      filter(Text.tokens(col("text")),
        t => t.isin(words3.map(w => w: Any): _*)), hdim))
    val bins3 = spark.range(1).select(words3.map(w =>
      pmod(xxhash64(lit(w)), lit(hdim.toLong)).cast("int").as(w)): _*)
      .head()
    val wInit = Array.tabulate(2) { c =>
      val row = new Array[Double](hdim + 1)
      words3.indices.foreach(i => row(bins3.getInt(i)) += sm.weights(c)(i))
      row(hdim) = sm.weights(c)(words3.size)
      row
    }
    val smSparse = Classifier.trainSoftmaxSparse(multiIdx, "idx",
      "label3", hdim, numClasses = 3, iters = 20, lr = 0.5,
      init = Some(Classifier.SoftmaxModel(wInit, 3)))
    Classifier.scoreSoftmaxSparse(multiIdx, "doc_id", "idx", smSparse)
      .groupBy(col("predicted")).count().orderBy(col("predicted")).show()

    println("== select: per-source token budgets in margin order ==")
    Sampling.selectByQualityBudget(scored, col("source"), col("doc_id"),
      col("tok"), col("margin"),
      Map("src0" -> 400L, "src1" -> 300L), qMin = -2.0, qMax = 25.0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_selected"), sum(col("tok")).as("tokens"))
      .show()

    println("== refresh: online Newton folds, exactly-once ==")
    val modelDir = java.nio.file.Files
      .createTempDirectory("graft-clf-demo-").toString + "/model"
    val sparse = docs.select(col("doc_id"),
      Classifier.hashedIndices(
        filter(Text.tokens(col("text")),
          t => t.isin(vocab.map(v => v: Any): _*)), 64).as("idx"),
      (size(filter(Text.tokens(col("text")), t => t === "hash")) >= 2)
        .as("label"))
    val m1 = Classifier.updateModelOnline(
      sparse.filter(col("doc_id") % 2 === 0), modelDir, "idx", "label",
      dim = 64, iters = 5, newton = true, batchId = Some("demo:0"))
    val m2 = Classifier.updateModelOnline(
      sparse.filter(col("doc_id") % 2 === 1), modelDir, "idx", "label",
      dim = 64, iters = 5, newton = true, batchId = Some("demo:1"))
    val replay = Classifier.updateModelOnline(
      sparse.filter(col("doc_id") % 2 === 1), modelDir, "idx", "label",
      dim = 64, iters = 5, newton = true, batchId = Some("demo:1"))
    println(s"fold 1 bias=${m1.bias}; fold 2 bias=${m2.bias}; " +
      s"replayed fold is committed bits: ${replay.bias == m2.bias}")
    val sparseScored = Classifier.scoreSparse(sparse, "doc_id", "idx", m2)
    val acc = sparse.join(sparseScored, "doc_id")
      .select(avg(when((col("margin") > 0) === col("label"), 1.0)
        .otherwise(0.0))).head().getDouble(0)
    println(f"online model corpus accuracy: $acc%.4f")

    spark.stop()
  }
}
