package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Database

/** Thin CLI mains over the database (ref bin/psweep-db2json,
  * bin/psweep-db2table, cli.py check-calc-dir).
  *
  * The export mains accept time-travel flags (the shell-pipeline
  * face of [[Database.asOf]]/[[Database.asOfTime]]/
  * [[Database.changes]]):
  *   - `--as-of <runSeq>` — the db exactly as that run left it;
  *   - `--as-of-time <ISO-8601 instant>` — the db as of that wall-
  *     clock moment (resolved to the latest run committed by then);
  *   - `--changes <afterRun>[,<untilRun>]` — only rows appended in
  *     the interval.
  * All are manifest-pruned: a one-run dump of a 10,000-run db reads
  * one run's files (and the timestamp resolution reads none). */
object Cli {
  /** Split `--flag value` pairs from positional args. Malformed
    * invocations fail loudly instead of exporting the wrong frame: a
    * repeated flag is an error (silent last-wins would dump a
    * different history than the operator inspected), and a flag token
    * in value position is an error (not silently consumed). */
  private[cli] def splitFlags(args: Array[String], flags: Set[String])
      : (Map[String, String], Array[String]) = {
    val fl = scala.collection.mutable.Map.empty[String, String]
    val pos = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      if (flags(args(i))) {
        require(i + 1 < args.length, s"${args(i)} needs a value")
        require(!args(i + 1).startsWith("--"),
          s"${args(i)} needs a value, got flag '${args(i + 1)}'")
        require(!fl.contains(args(i)), s"duplicate flag ${args(i)}")
        fl(args(i)) = args(i + 1); i += 2
      } else { pos += args(i); i += 1 }
    }
    (fl.toMap, pos.toArray)
  }

  /** Resolve the frame an export main should dump: full read by
    * default, [[Database.asOf]] under `--as-of <runSeq>`,
    * [[Database.asOfTime]] under `--as-of-time <ISO-8601 instant>`
    * (operators think in wall clock; the db resolves it to the run
    * log), [[Database.changes]] under `--changes from[,to]`. */
  private[cli] def frame(db: Database,
                         flags: Map[String, String]): DataFrame = {
    val asOf = flags.get("--as-of")
    val asOfT = flags.get("--as-of-time")
    val ch = flags.get("--changes")
    require(Seq(asOf, asOfT, ch).count(_.nonEmpty) <= 1,
      "--as-of, --as-of-time and --changes are mutually exclusive")
    (asOf, asOfT, ch) match {
      case (Some(r), _, _) => db.asOf(r.toLong)
      case (_, Some(t), _) =>
        val ts =
          try java.time.Instant.parse(t)
          catch {
            case e: java.time.format.DateTimeParseException =>
              throw new IllegalArgumentException(
                s"--as-of-time wants an ISO-8601 instant " +
                  s"(2026-08-15T12:00:00Z), got '$t'", e)
          }
        db.asOfTime(ts)
      case (_, _, Some(iv)) =>
        iv.split(",").map(_.trim) match {
          case Array(from) => db.changes(from.toLong)
          case Array(from, to) => db.changes(from.toLong, to.toLong)
          case _ => throw new IllegalArgumentException(
            s"--changes wants from[,to], got '$iv'")
        }
      case _ => db.read()
    }
  }

  private[cli] val timeFlags = Set("--as-of", "--as-of-time", "--changes")

  private[cli] def session(): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** `db2json <calcDir> <outPath> [--as-of <run> | --changes <from>[,<to>]]`
  * — JSON export (ref bin/psweep-db2json), optionally of a historical
  * or delta frame. */
object Db2Json {
  def main(args: Array[String]): Unit = {
    val (flags, pos) = Cli.splitFlags(args, Cli.timeFlags)
    // exact arity, fail-loud (splitFlags' doctrine): a missing arg must
    // not die as an opaque MatchError, and an EXTRA positional must not
    // be silently ignored — the operator typo'd something
    require(pos.length == 2,
      s"usage: db2json <calcDir> <outPath> [--as-of <run> | " +
        s"--as-of-time <ts> | --changes <from>[,<to>]] — got " +
        s"${pos.length} positionals: ${pos.mkString(" ")}")
    val Array(calcDir, outPath) = pos
    val spark = Cli.session()
    val db = Database(spark, calcDir)
    db.writeJson(outPath, Cli.frame(db, flags))
    spark.stop()
  }
}

/** `db2table <calcDir> [n] [--as-of <run> | --changes <from>[,<to>]]` —
  * tabular display, prefix cols hidden, sorted column names
  * (ref bin/psweep-db2table), optionally of a historical or delta
  * frame. */
object Db2Table {
  def main(args: Array[String]): Unit = {
    val (flags, pos) = Cli.splitFlags(args, Cli.timeFlags)
    require(pos.length == 1 || pos.length == 2,
      s"usage: db2table <calcDir> [n] [--as-of <run> | --as-of-time " +
        s"<ts> | --changes <from>[,<to>]] — got ${pos.length} " +
        s"positionals: ${pos.mkString(" ")}")
    val calcDir = pos(0)
    val n = if (pos.length > 1) pos(1).toInt else 20
    val spark = Cli.session()
    val db = Database(spark, calcDir)
    Database.printableDF(Cli.frame(db, flags)).show(n, truncate = false)
    spark.stop()
  }
}

/** `pull <remoteStudyDir> <localStudyDir> [-n]` — fetch the calc dir from
  * a shared/remote filesystem location, honoring `excl_pull` /
  * `rsync.exclude` rule files in the local study dir
  * (ref bin/psweep-pull). `-n` = dry run. */
object Pull {
  def main(args: Array[String]): Unit = {
    val dry = args.contains("-n")
    val pos = args.filterNot(_.startsWith("-"))
    val copied = graft.core.Sync.pull(pos(0), pos(1), dryRun = dry)
    val verb = if (dry) "would copy" else "copied"
    copied.foreach(p => println(s"  $verb: $p"))
    println(s"$verb ${copied.size} files")
  }
}

/** `push <localStudyDir> <remoteStudyDir> [-n]` — mirror of [[Pull]] with
  * `excl_push` rules (ref bin/psweep-push). */
object Push {
  def main(args: Array[String]): Unit = {
    val dry = args.contains("-n")
    val pos = args.filterNot(_.startsWith("-"))
    val copied = graft.core.Sync.push(pos(0), pos(1), dryRun = dry)
    val verb = if (dry) "would copy" else "copied"
    copied.foreach(p => println(s"  $verb: $p"))
    println(s"$verb ${copied.size} files")
  }
}

/** `checkdir <calcDir>` — database vs artifact-dir consistency
  * (ref cli.py:8-24). */
object CheckDir {
  def main(args: Array[String]): Unit = {
    val calcDir = args(0)
    val spark = Cli.session()
    val db = Database(spark, calcDir).read()
    val (dbNotDisk, diskNotDb) = Database.checkCalcDir(spark, calcDir, db)
    println("db_not_disk:")
    dbNotDisk.collect().foreach(r => println("  " + r.getString(0)))
    println("disk_not_db:")
    diskNotDb.collect().foreach(r => println("  " + r.getString(0)))
    spark.stop()
  }
}
