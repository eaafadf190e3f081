package graft.batch

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Fs, Grid, StudyConfig}

/** F13 batch-template fixtures (ref tests/test_all.py:886-986, 1295-1326). */
class BatchSpec extends AnyFunSuite {
  import graft.SparkSpec.{spark, tmpDir}

  private def setupTemplates(root: String): (String, String) = {
    val calcT = s"$root/templates/calc"
    val machT = s"$root/templates/machines"
    Fs.writeString(s"$calcT/run.py",
      "a={{param_a}} b={{param_b}} id={{_pset_id}}\n")
    Fs.writeString(s"$machT/local/info.yaml", "subcmd: bash\n")
    Fs.writeString(s"$machT/local/jobscript", "run {{_pset_id}}\n")
    Fs.writeString(s"$machT/cluster/info.yaml", "subcmd: sbatch\n")
    Fs.writeString(s"$machT/cluster/jobscript",
      "#SBATCH -J {{_pset_seq}}\nrun {{_pset_id}}\n")
    (calcT, machT)
  }

  test("template fill: jinja spacing variants + dollar mode (F13)") {
    val pset = Map[String, Any]("foo" -> "lala", "_bar" -> 23, "baz" -> null)
    assert(Batch.FileTemplate.render(" $foo $_bar", pset, "dollar") == " lala 23")
    for (t <- Seq(" {{foo}} {{_bar}}", " {{ foo}} {{ _bar}}",
      " {{foo }} {{_bar }}", " {{ foo }} {{ _bar }}"))
      assert(Batch.FileTemplate.render(t, pset, "jinja") == " lala 23")
    assert(Batch.FileTemplate.render("$$foo $foo", pset, "dollar") == "$foo lala")
  }

  test("strict-missing placeholder raises (ref tests/test_all.py:1315-1326)") {
    val pset = Map[String, Any]("foo" -> "lala")
    intercept[NoSuchElementException] {
      Batch.FileTemplate.render(" $foo $abc", pset, "dollar")
    }
    intercept[NoSuchElementException] {
      Batch.FileTemplate.render(" {{foo}} {{abc}}", pset, "jinja")
    }
  }

  test("prepBatch renders per-pset files and submit scripts (F13)") {
    val root = tmpDir("graft-batch-")
    val calc = s"$root/calc"
    val (calcT, machT) = setupTemplates(root)
    val params = Grid.pgrid(Grid.plist("param_a", Seq(1, 2, 3)),
      Grid.plist("param_b", Seq("xx", "yy")))
    val out = Batch.prepBatch(spark, params, calcT, machT,
      StudyConfig(calcDir = calc), writePset = true)
    assert(out.executed == 6)

    val ids = out.db.select("_pset_id").collect().map(_.getString(0))
    ids.foreach { id =>
      val runPy = Fs.readString(s"$calc/$id/run.py")
      assert(runPy.contains(s"id=$id"))
      assert(Fs.exists(s"$calc/$id/jobscript_local"))
      assert(Fs.exists(s"$calc/$id/jobscript_cluster"))
      assert(Fs.exists(s"$calc/$id/pset.json"))
    }
    val sh = Fs.readString(s"$calc/run_local.sh")
    assert(sh.startsWith("#!/bin/sh"))
    assert(sh.contains("here=$(readlink -f $(dirname $0))"))
    ids.foreach(id => assert(sh.contains(
      s"cd $$here/$id; bash jobscript_local  # run_seq=0")))
    assert(Fs.readString(s"$calc/run_cluster.sh").contains("sbatch"))

    // second run: old rows commented out (ref psweep.py:1640-1658)
    Batch.prepBatch(spark, Grid.pgrid(Grid.plist("param_a", Seq(9)),
      Grid.plist("param_b", Seq("zz"))), calcT, machT,
      StudyConfig(calcDir = calc))
    val sh2 = Fs.readString(s"$calc/run_local.sh")
    ids.foreach(id => assert(sh2.contains(s"# cd $$here/$id")))
    assert(sh2.linesIterator.count(l => l.startsWith("cd $here/")) == 1)
    assert(sh2.contains("run_seq=1"))
  }

  test("prepBatch simulate renders into sandbox") {
    val root = tmpDir("graft-batchsim-")
    val calc = s"$root/calc"
    val (calcT, machT) = setupTemplates(root)
    Batch.prepBatch(spark, Grid.plist("param_a", Seq(1))
      .map(_ + ("param_b" -> "w")), calcT, machT,
      StudyConfig(calcDir = calc, simulate = true))
    assert(Fs.exists(s"$calc.simulate"))
    assert(!Fs.exists(s"$calc/database"))
    val simIds = Fs.listNames(s"$calc.simulate")
      .filter(_.matches("^([0-9a-f]+-){4}[0-9a-f]+$"))
    assert(simIds.size == 1)
    assert(Fs.readString(s"$calc.simulate/${simIds.head}/run.py")
      .startsWith("a=1 b=w"))
  }
}
