package graft.cli

import org.apache.spark.sql.SparkSession

import graft.core.Database

/** Thin CLI mains over the database (ref bin/psweep-db2json,
  * bin/psweep-db2table, cli.py check-calc-dir). */
object Cli {
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

/** `db2json <calcDir> <outPath>` — JSON export (ref bin/psweep-db2json). */
object Db2Json {
  def main(args: Array[String]): Unit = {
    val Array(calcDir, outPath) = args.take(2)
    val spark = Cli.session()
    Database(spark, calcDir).writeJson(outPath)
    spark.stop()
  }
}

/** `db2table <calcDir> [n]` — tabular display, prefix cols hidden, sorted
  * column names (ref bin/psweep-db2table). */
object Db2Table {
  def main(args: Array[String]): Unit = {
    val calcDir = args(0)
    val n = if (args.length > 1) args(1).toInt else 20
    val spark = Cli.session()
    Database.printableDF(Database(spark, calcDir).read()).show(n, truncate = false)
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
