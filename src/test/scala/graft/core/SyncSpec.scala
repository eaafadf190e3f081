package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Pull/push calc-dir sync with rsync-rule-file semantics (S10 analog;
  * ref bin/psweep-pull:52-77, bin/psweep-push:5-24). */
class SyncSpec extends AnyFunSuite {
  import graft.SparkSpec.tmpDir

  private def mkStudy(root: String): Unit = {
    Fs.writeString(s"$root/calc/database/part-0.parquet", "db")
    Fs.writeString(s"$root/calc/aaa-111/output.txt", "r1")
    Fs.writeString(s"$root/calc/aaa-111/core.12345", "huge-coredump")
    Fs.writeString(s"$root/calc/bbb-222/output.txt", "r2")
    Fs.writeString(s"$root/calc/bbb-222/scratch/tmp.bin", "scratch")
    Fs.writeString(s"$root/calc/notes.log", "log")
  }

  test("rule matching: basename, anchored, dir-only, *, **, ?") {
    def m(pat: String, rel: String, isDir: Boolean = false) =
      Sync.compileRule(pat).matches(rel, isDir)
    // bare pattern matches basename at any depth
    assert(m("*.log", "notes.log"))
    assert(m("*.log", "a/b/notes.log"))
    assert(!m("*.log", "a/logs/file.txt"))
    // `*` does not cross segments; `**` does
    assert(m("a/*.txt", "a/x.txt"))
    assert(!m("a/*.txt", "a/b/x.txt"))
    assert(m("a/**.txt", "a/b/x.txt"))
    // anchored at transfer root
    assert(m("/top.txt", "top.txt"))
    assert(!m("/top.txt", "sub/top.txt"))
    // dir-only
    assert(m("scratch/", "b/scratch", isDir = true))
    assert(!m("scratch/", "b/scratch", isDir = false))
    // ? is one char
    assert(m("core.?????", "aaa/core.12345"))
    assert(!m("core.?????", "aaa/core.1"))
  }

  test("pull honors excl_pull; push honors excl_push; dry-run is a no-op") {
    val remote = tmpDir("graft-sync-remote-")
    val local = tmpDir("graft-sync-local-")
    mkStudy(remote)
    Fs.writeString(s"$local/excl_pull",
      "# skip scratch + coredumps\nscratch/\ncore.*\n*.log\n")
    val dry = Sync.pull(remote, local, dryRun = true)
    assert(dry.toSet == Set("database/part-0.parquet",
      "aaa-111/output.txt", "bbb-222/output.txt"))
    assert(!Fs.exists(s"$local/calc/database/part-0.parquet")) // dry!
    val copied = Sync.pull(remote, local)
    assert(copied.toSet == dry.toSet)
    assert(Fs.readString(s"$local/calc/aaa-111/output.txt") == "r1")
    assert(!Fs.exists(s"$local/calc/aaa-111/core.12345"))
    assert(!Fs.exists(s"$local/calc/bbb-222/scratch"))
    assert(!Fs.exists(s"$local/calc/notes.log"))
    // incremental: second pull copies nothing (size+mtime quick check)
    assert(Sync.pull(remote, local).isEmpty)
    // push back to a fresh remote honors excl_push from the LOCAL side
    val remote2 = tmpDir("graft-sync-remote2-")
    Fs.writeString(s"$local/excl_push", "database/\n")
    val pushed = Sync.push(local, remote2)
    assert(pushed.toSet == Set("aaa-111/output.txt", "bbb-222/output.txt"))
    assert(!Fs.exists(s"$remote2/calc/database"))
  }

  test("pulled database reads back identically") {
    val remote = tmpDir("graft-sync-r3-")
    val local = tmpDir("graft-sync-l3-")
    val spark = graft.SparkSpec.spark
    val db = Database(spark, s"$remote/calc")
    db.append(ValueSchema.toDF(spark,
      (1L to 4L).map(i => Map[String, Any]("a" -> i)))
      .withColumn("_run_id", org.apache.spark.sql.functions.lit("r0")))
    Sync.pull(remote, local)
    val pulled = Database(spark, s"$local/calc").read()
    assert(pulled.count() == 4)
    assert(pulled.columns.toSet == db.read().columns.toSet)
  }
}
