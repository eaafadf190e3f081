package graft.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Fs, RunOutput, Study, StudyConfig}

/** HPC batch-file codegen path (SURVEY §2.7, ref psweep.py:1500-1662):
  * per-pset template rendering + submit-script generation. Rendering runs
  * inside the sweep's map task (distributed — at 10^6 jobs the driver
  * never touches a template), the submit script is generated from a
  * driver-side collect of just the id/seq columns of the latest run.
  */
object Batch {

  /** Text template with `{{ var }}` ("jinja" mode) or dollar-prefixed
    * (`$var` or brace-wrapped) "dollar" mode substitution. Missing
    * placeholders error (strict —
    * ref psweep.py:1541 StrictUndefined; tests/test_all.py:1315-1326).
    * Only variable substitution is supported: the reference's own
    * templates use nothing else (ref examples/batch_templates/templates/
    * calc/run.py:9-14). */
  final case class FileTemplate(filename: String, targetSuffix: String = "") {
    val basename: String = new java.io.File(filename).getName
    val targetName: String = basename + targetSuffix

    def fill(pset: Map[String, Any], mode: String = "jinja"): String =
      FileTemplate.render(Fs.readString(filename), pset, mode)
  }

  object FileTemplate {
    private val jinjaRe = raw"\{\{\s*([A-Za-z0-9_]+)\s*\}\}".r
    private val dollarRe =
      ("\\$\\$|\\$\\{([A-Za-z0-9_]+)\\}|\\$([A-Za-z0-9_]+)").r

    def render(txt: String, pset: Map[String, Any],
               mode: String = "jinja"): String = {
      def lookup(k: String): String = pset.get(k) match {
        case Some(v) => if (v == null) "None" else v.toString
        case None => throw new NoSuchElementException(
          s"unfilled template placeholder: $k")
      }
      mode match {
        case "jinja" =>
          jinjaRe.replaceAllIn(txt, m =>
            scala.util.matching.Regex.quoteReplacement(lookup(m.group(1))))
        case "dollar" =>
          dollarRe.replaceAllIn(txt, m =>
            if (m.matched == "$$") "\\$"
            else scala.util.matching.Regex.quoteReplacement(
              lookup(Option(m.group(1)).getOrElse(m.group(2)))))
        case other =>
          throw new IllegalArgumentException(s"template mode not supported: $other")
      }
    }
  }

  /** A machine bundle: jobscript template + `info.yaml` attributes
    * (`subcmd` at minimum) — ref psweep.py:1500-1521. */
  final case class Machine(machineDir: String,
                           jobscriptName: String = "jobscript") {
    val name: String = new java.io.File(machineDir).getName
    val template: FileTemplate =
      FileTemplate(s"$machineDir/$jobscriptName", targetSuffix = "_" + name)
    val info: Map[String, String] = {
      val yaml = new org.yaml.snakeyaml.Yaml()
      val m = yaml.load[java.util.Map[String, Any]](
        Fs.readString(s"$machineDir/info.yaml"))
      import scala.jdk.CollectionConverters._
      m.asScala.map { case (k, v) => k -> String.valueOf(v) }.toMap
    }
    def subcmd: String = info("subcmd")
  }

  def gatherCalcTemplates(calcTemplDir: String): Seq[FileTemplate] =
    Fs.listNames(calcTemplDir).sorted.map(b => FileTemplate(s"$calcTemplDir/$b"))

  def gatherMachines(machineTemplDir: String): Seq[Machine] =
    Fs.listNames(machineTemplDir).sorted.map(b => Machine(s"$machineTemplDir/$b"))

  /** `prep_batch` (ref psweep.py:1566-1662): render every template into
    * `calc/<pset_id>/` through the standard sweep pipeline (the renderer is
    * the map function — executed on executors), then generate one
    * `calc/run_<machine>.sh` submit script per machine, newest run active,
    * older runs commented out, with `# run_seq=R pset_seq=P` annotations.
    */
  def prepBatch(spark: SparkSession, params: Seq[Map[String, Any]],
                calcTemplDir: String = "templates/calc",
                machineTemplDir: String = "templates/machines",
                cfg: StudyConfig = StudyConfig(),
                writePset: Boolean = false,
                templateMode: String = "jinja"): RunOutput = {
    val calcDir =
      if (cfg.simulate) {
        // simulate here means "render into the sandbox" — the renderer
        // itself must still run (ref psweep.py:1606-1614)
        val dst = cfg.calcDir + ".simulate"
        Fs.delete(dst); Fs.mkdirs(dst)
        val src = s"${cfg.calcDir}/${cfg.databaseBasename}"
        if (Fs.exists(src)) Fs.copyDir(src, s"$dst/${cfg.databaseBasename}")
        dst
      } else cfg.calcDir

    val calcTemplates = gatherCalcTemplates(calcTemplDir)
    val machines = gatherMachines(machineTemplDir)
    // read template bodies on the driver; the closure ships only strings
    val templates: Seq[(String, String)] =
      (calcTemplates ++ machines.map(_.template))
        .map(t => t.targetName -> Fs.readString(t.filename))

    val renderFunc: Map[String, Any] => Map[String, Any] = { pset =>
      val psetId = pset("_pset_id").toString
      templates.foreach { case (target, body) =>
        Fs.writeString(s"$calcDir/$psetId/$target",
          FileTemplate.render(body, pset, templateMode))
      }
      if (writePset)
        Fs.writeString(s"$calcDir/$psetId/pset.json", Fs.toJson(pset))
      Map.empty
    }

    val out = Study(spark, cfg.copy(calcDir = calcDir, simulate = false,
      git = false)).run(renderFunc, params)

    // submit scripts from just the bookkeeping columns of the database
    val slim = out.db.select(col("_pset_id"), col("_pset_seq"), col("_run_seq"))
      .orderBy(col("_pset_seq")).collect()
    val maxRun = slim.map(_.getLong(2)).max
    machines.foreach { machine =>
      val sb = new StringBuilder("#!/bin/sh\n\nhere=$(readlink -f $(dirname $0))\n")
      def section(prefix: String, rows: Seq[org.apache.spark.sql.Row]): Unit =
        if (rows.nonEmpty) {
          sb.append('\n')
          sb.append(rows.map { r =>
            s"${prefix}cd $$here/${r.getString(0)}; ${machine.subcmd} " +
              s"${machine.template.targetName}  # run_seq=${r.getLong(2)} " +
              s"pset_seq=${r.getLong(1)}"
          }.mkString("\n"))
        }
      section("# ", slim.toSeq.filter(_.getLong(2) < maxRun))
      section("", slim.toSeq.filter(_.getLong(2) == maxRun))
      sb.append('\n')
      Fs.writeString(s"$calcDir/run_${machine.name}.sh", sb.toString)
    }
    out
  }
}
