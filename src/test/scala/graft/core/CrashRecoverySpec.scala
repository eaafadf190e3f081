package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash and concurrency hardening of the database store (SURVEY §7.4.5):
  * every rewrite (rehash, compact, interactive overwrite) swaps a fully
  * written replacement into place with the previous state parked at
  * `.__old`, so a crash at ANY point leaves a recoverable complete state;
  * mutators hold a single-writer lock so a concurrent writer fails loudly
  * instead of corrupting the store.
  */
class CrashRecoverySpec extends AnyFunSuite {
  import graft.SparkSpec.{spark, tmpDir}

  private def seeded(): Database = {
    val db = Database(spark, tmpDir("graft-crash-"))
    val df = ValueSchema.toDF(spark,
      (1L to 5L).map(i => Map[String, Any]("a" -> i)))
      .withColumn("_run_id", lit("r0"))
    db.append(df)
    db
  }

  test("crash between swap renames: data recovered from .__old on read") {
    val db = seeded()
    // simulate dying after `rename(db, __old)` but before the tmp rename
    Fs.rename(db.dbPath, s"${db.dbPath}.__old")
    assert(!Fs.exists(db.dbPath))
    assert(db.exists) // recover() restores the parked state
    assert(db.read().count() == 5)
    assert(!Fs.exists(s"${db.dbPath}.__old"))
  }

  test("crash after swap completed: stale .__old is dropped, db wins") {
    val db = seeded()
    Fs.mkdirs(s"${db.dbPath}.__old")
    Fs.writeString(s"${db.dbPath}.__old/garbage.txt", "stale")
    assert(db.read().count() == 5) // current db untouched
    assert(!Fs.exists(s"${db.dbPath}.__old"))
  }

  test("a live lock suppresses reader-side recovery (mid-swap race)") {
    val db = seeded()
    // writer mid-swap: data parked at .__old, lock held
    Fs.rename(db.dbPath, s"${db.dbPath}.__old")
    assert(Fs.createExclusive(db.lockPath, "pid=1 acquired=test"))
    db.recover() // must NOT restore — the writer owns the window
    assert(!Fs.exists(db.dbPath))
    assert(Fs.exists(s"${db.dbPath}.__old"))
    // writer crashed: the stale lock is removed, recovery proceeds
    Fs.delete(db.lockPath)
    assert(db.exists)
    assert(db.read().count() == 5)
  }

  test("second writer fails fast on the lock, with holder identity") {
    val db = seeded()
    assert(Fs.createExclusive(db.lockPath, "pid=9999 acquired=test"))
    val more = ValueSchema.toDF(spark, Seq(Map[String, Any]("a" -> 9L)))
      .withColumn("_run_id", lit("r1"))
    val e = intercept[IllegalStateException](db.append(more))
    assert(e.getMessage.contains("locked by another writer"))
    assert(e.getMessage.contains("pid=9999"))
    assert(e.getMessage.contains(db.lockPath))
    // clearing the stale lock unblocks; the lock is released afterwards
    Fs.delete(db.lockPath)
    db.append(more)
    assert(!Fs.exists(db.lockPath))
    assert(db.read().count() == 6)
  }

  test("in-process reentrancy is owner-thread-only: a second THREAD on " +
    "the same handle fails fast instead of silently passing through") {
    val db = seeded()
    @volatile var otherResult: Option[Either[String, Unit]] = None
    db.withWriteLock {
      // same thread: nested acquisition passes through (Study's shape)
      db.withWriteLock(())
      val t = new Thread(() => {
        otherResult = Some(
          try { db.withWriteLock(()); Right(()) }
          catch { case e: IllegalStateException => Left(e.getMessage) })
      })
      t.start(); t.join(30000)
    }
    otherResult match {
      case Some(Left(msg)) =>
        assert(msg.contains("locked by another writer"))
      case other => fail(s"expected fail-fast on the lock file, got $other")
    }
    // released: any thread can acquire again
    db.withWriteLock(())
    assert(!Fs.exists(db.lockPath))
  }

  test("two racing Study.runs: the run pipeline holds the lock end to " +
    "end — one wins, the other fails fast, db invariants hold") {
    val calc = tmpDir("graft-race-")
    // file-based gate: the func closure must stay serializable (local
    // mode still serializes tasks), so no latch capture
    val marker = s"$calc/__a_started"
    val params = Grid.plist("a", Seq(1, 2, 3))
    // run A: slow func — holds the pipeline lock while executing
    val a = new Thread(() => {
      Study(spark, calc).run(p => {
        Fs.createExclusive(marker, "") // A is inside the locked pipeline
        Thread.sleep(1500)
        Map("r_" -> p("a").asInstanceOf[Long] * 2.0)
      }, params)
      ()
    })
    a.start()
    while (!Fs.exists(marker)) Thread.sleep(25)
    // run B starts while A executes: before the pipeline-scoped lock it
    // would read the SAME max(_run_seq) and commit duplicate sequence
    // numbers; now it fails fast at start
    val e = intercept[IllegalStateException](
      Study(spark, calc).run(
        p => Map("r_" -> 0.0), Grid.plist("a", Seq(7, 8))))
    assert(e.getMessage.contains("locked by another writer"))
    a.join()
    // A's run committed alone with the F1 invariant set intact
    val df = Database(spark, calc).read()
    assert(df.count() == 3)
    assert(df.select("_run_id").distinct().count() == 1)
    assert(df.select("_pset_seq").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(0L, 1L, 2L))
    assert(df.select("_run_seq").distinct().head().getLong(0) == 0L)
    // the lock is released: a follow-up run appends normally
    Study(spark, calc).run(
      p => Map("r_" -> 1.0), Grid.plist("a", Seq(9)))
    val df2 = Database(spark, calc).read()
    assert(df2.count() == 4)
    assert(df2.agg(max(col("_run_seq"))).head().getLong(0) == 1L)
  }

  test("compact and rehash release the lock and keep every row") {
    val db = seeded()
    db.append(ValueSchema.toDF(spark, Seq(Map[String, Any]("a" -> 6L)))
      .withColumn("_run_id", lit("r1")))
    db.compact()
    assert(!Fs.exists(db.lockPath))
    assert(db.read().count() == 6)
    db.rehashWith(Map.empty, Map.empty)
    assert(!Fs.exists(db.lockPath))
    assert(db.read().count() == 6)
    // a follow-up mutation still works (no deadlock, no stale state)
    db.append(ValueSchema.toDF(spark, Seq(Map[String, Any]("a" -> 7L)))
      .withColumn("_run_id", lit("r2")))
    assert(db.read().count() == 7)
  }
}
