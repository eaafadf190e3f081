package graft.examples

import org.apache.spark.sql.SparkSession

import graft.batch.Batch
import graft.core.{Fs, Grid, StudyConfig}

/** Batch-template codegen walkthrough, mirroring the reference's
  * `examples/batch_templates` flow: define calc + machine templates, render
  * per-pset job dirs through the sweep pipeline, emit submit scripts.
  * Run: `sbt "runMain graft.examples.BatchDemo [rootDir]"`.
  */
object BatchDemo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-batch-demo-").toString)
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-batch-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Fs.writeString(s"$root/templates/calc/run.py",
      "compute(a={{param_a}}, b={{param_b}})  # pset {{_pset_id}}\n")
    Fs.writeString(s"$root/templates/machines/local/info.yaml", "subcmd: bash\n")
    Fs.writeString(s"$root/templates/machines/local/jobscript",
      "python3 run.py  # seq {{_pset_seq}}\n")

    val params = Grid.pgrid(Grid.plist("param_a", Seq(1, 2)),
      Grid.plist("param_b", Seq("xx", "yy")))
    val out = Batch.prepBatch(spark, params,
      s"$root/templates/calc", s"$root/templates/machines",
      StudyConfig(calcDir = s"$root/calc"))
    println(s"rendered ${out.executed} job dirs under $root/calc")
    println("--- run_local.sh ---")
    println(Fs.readString(s"$root/calc/run_local.sh"))
    val firstId = out.db.select("_pset_id").head().getString(0)
    println(s"--- calc/$firstId/run.py ---")
    println(Fs.readString(s"$root/calc/$firstId/run.py"))
    spark.stop()
  }
}
