package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The results database: an append-only, Parquet-backed, `_run_id`-
  * partitioned table replacing the reference's single rewritten pickle
  * (ref psweep.py:36,1401-1407,1487-1488; deliberate deviation SURVEY §4.3
  * — the representation changes, the semantics don't).
  *
  * Scale design:
  *   - appends write only the new run's partition; old data is never
  *     touched except on pset-schema growth, where the hash column must be
  *     recomputed (ref psweep.py:690-710) — a single distributed rewrite;
  *   - counters come from a column-pruned `agg(max)` scan (Parquet footer
  *     stats, no data read);
  *   - dedup against the database broadcasts the (small) incoming hash set
  *     and semi-joins the database's hash column — one column-pruned pass,
  *     no driver-side materialization of database hashes.
  */
class Database(val spark: SparkSession, val calcDir: String,
               val basename: String = "database") {

  val dbPath: String = s"$calcDir/$basename"

  /** Single-writer lock file. The database supports ONE writer at a time
    * (same contract as the reference's pickle database); the lock turns a
    * silent race into a loud error. */
  val lockPath: String = s"$dbPath.__lock"

  private val oldPath: String = s"$dbPath.__old"

  def exists: Boolean = {
    recover()
    Fs.exists(dbPath) && Fs.listNames(dbPath).nonEmpty
  }

  /** Recover from a crash mid-swap ([[swapIn]] windows): a crash between
    * the two renames leaves the data under `.__old` — restore it; a crash
    * after the second rename leaves a stale `.__old` next to a complete
    * db — drop it. Idempotent and cheap (two existence checks), called on
    * every read path.
    *
    * A LIVE lock suppresses recovery: `.__old` + lock means a writer is
    * mid-swap right now, and a concurrent reader restoring `.__old`
    * between the writer's two renames would make the writer's final
    * rename land on an occupied path. After a CRASH the lock is stale by
    * definition — delete it (per [[withWriteLock]]'s error message) and
    * the next read restores the parked state. */
  def recover(): Unit = {
    if (Fs.exists(oldPath) && !Fs.exists(lockPath)) {
      if (!Fs.exists(dbPath)) Fs.rename(oldPath, dbPath)
      else Fs.delete(oldPath)
    }
  }

  /** Run `f` holding the database's single-writer lock. Concurrent
    * mutators fail fast with the holder's identity instead of corrupting
    * the store. A crashed holder leaves a stale lock: remove `lockPath`
    * manually after confirming the writer is gone (recovery of a crashed
    * SWAP itself is automatic via [[recover]]). */
  def withWriteLock[A](f: => A): A = {
    val info = s"pid=${ProcessHandle.current().pid()} " +
      s"acquired=${java.time.Instant.now()}"
    if (!Fs.createExclusive(lockPath, info)) {
      val holder =
        try Fs.readString(lockPath) catch { case _: Exception => "unknown" }
      throw new IllegalStateException(
        s"database $dbPath is locked by another writer ($holder); " +
          "the store is single-writer. If that process crashed, delete " +
          s"$lockPath and re-run.")
    }
    try f finally Fs.delete(lockPath)
  }

  /** Swap a fully-written replacement directory into place. Never
    * delete-then-rename on the live path: the previous state is parked at
    * `.__old` until the new data is in place, so every crash point leaves
    * either the old or the new complete state recoverable ([[recover]]).
    */
  private[core] def swapIn(tmp: String): Unit = {
    recover()
    Fs.delete(oldPath)
    if (Fs.exists(dbPath)) Fs.rename(dbPath, oldPath)
    Fs.rename(tmp, dbPath)
    Fs.delete(oldPath)
  }

  /** Read the database; schemas of all appended runs are unioned
    * (missing columns read as null — the Parquet analog of the
    * reference's NA-fill on append, ref psweep.py:707-709). */
  def read(): DataFrame = {
    recover()
    spark.read.option("mergeSchema", "true").parquet(dbPath)
  }

  def readOpt(): Option[DataFrame] = if (exists) Some(read()) else None

  /** `(max _pset_seq, max _run_seq)`, or (-1, -1) on an empty database
    * (ref psweep.py:1409-1415). */
  def counters(): (Long, Long) = readOpt() match {
    case None => (-1L, -1L)
    case Some(df) =>
      val r = df.agg(
        max(col("_pset_seq")).cast(LongType),
        max(col("_run_seq")).cast(LongType)).head()
      (if (r.isNullAt(0)) -1L else r.getLong(0),
       if (r.isNullAt(1)) -1L else r.getLong(1))
  }

  /** Which of `values` already exist in database column `colName`?
    * One column-pruned scan; the small side is broadcast
    * (the J1 dedup anti-join and the `_pset_id` collision re-check,
    * ref psweep.py:1068-1081,1442-1446). */
  def existingAmong(colName: String, values: Seq[String]): Set[String] =
    readOpt() match {
      case None => Set.empty
      case Some(df) => Database.existingAmong(df, colName, values)
    }

  /** Append new rows (one run) as a new `_run_id` partition. */
  def append(df: DataFrame): Unit = withWriteLock {
    df.write.mode("append").partitionBy("_run_id").parquet(dbPath)
  }

  /** Distributed rewrite recomputing `_pset_hash` over the grown pset
    * column set — triggered only when the pset schema actually grows,
    * same condition as the reference (ref psweep.py:690-710), where it is
    * an O(N) driver-side Python loop; here one `withColumn` pass. New
    * columns appear as nulls via mergeSchema; shared columns whose type
    * widened are cast. */
  def rehashWith(extraPsetCols: Map[String, DataType],
                 casts: Map[String, DataType]): Unit = {
    var df = read()
    casts.foreach { case (c, t) => df = df.withColumn(c, col(c).cast(t)) }
    extraPsetCols.foreach { case (c, t) =>
      if (!df.columns.contains(c)) df = df.withColumn(c, lit(null).cast(t))
    }
    val rehashed = df.withColumn("_pset_hash", PsetHash.expr(df.columns.toSeq))
    withWriteLock {
      val tmp = s"$dbPath.__rewrite_tmp"
      Fs.delete(tmp)
      rehashed.write.mode("overwrite").partitionBy("_run_id").parquet(tmp)
      swapIn(tmp)
    }
  }

  /** Backup the whole calc dir to `calc.bak_<stamp>_run_id_<id>` before a
    * mutating run (ref psweep.py:1417-1427). */
  def backup(): Option[String] = {
    if (!exists) return None
    val stampRow = read().agg(max(col("_time_utc")), first(col("_run_id")))
      .head()
    val stamp =
      if (stampRow.isNullAt(0)) "empty"
      else stampRow.getTimestamp(0).toInstant.toString.replace(":", "-")
    val lastRun = if (stampRow.isNullAt(1)) "none" else stampRow.getString(1)
    val dst = s"$calcDir.bak_${stamp}_run_id_$lastRun"
    require(!Fs.exists(dst), s"backup destination exists: $dst")
    Fs.copyDir(calcDir, dst)
    Some(dst)
  }

  /** JSON export of the database (the `psweep-db2json` sink, ref
    * bin/psweep-db2json:48-51): records orient, ISO timestamps. */
  def writeJson(outPath: String): Unit =
    read().coalesce(math.max(1, spark.sparkContext.defaultParallelism / 4))
      .write.mode("overwrite")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .json(outPath)

  /** pandas-orient JSON DOCUMENT export (ref psweep.py:454-474
    * `df_to_json` with pandas `orient` kwarg; default "records" =
    * PANDAS_DEFAULT_ORIENT, ref psweep.py:31). All five orients are
    * single-document formats — the whole table is one JSON value — so
    * they are inherently driver-materialized; the explicit `maxRows`
    * guard turns a misuse at scale into a loud error. The 100 TB path
    * stays [[writeJson]]'s distributed line-delimited records. Values
    * follow [[Fs.toJson]]'s rules (ISO instants, null for NaN/Inf — the
    * analog of the reference's `double_precision=15, date_format="iso"`
    * defaults). */
  def writeJsonDoc(outPath: String, orient: String = "records",
                   maxRows: Long = 1L << 20): Unit = {
    val df = read()
    val n = df.count()
    require(n <= maxRows,
      s"writeJsonDoc is a driver-side document export: $n rows > maxRows=" +
        s"$maxRows; use writeJson (distributed records) for large tables")
    val names = df.columns.toSeq
    val rows = df.collect().toSeq
    def cell(r: Row, i: Int): String = Fs.toJson(r.get(i))
    def rowObj(r: Row): String =
      names.indices.map(i => Fs.jsonString(names(i)) + ":" + cell(r, i))
        .mkString("{", ",", "}")
    def rowArr(r: Row): String =
      names.indices.map(cell(r, _)).mkString("[", ",", "]")
    val doc = orient match {
      case "records" => rows.map(rowObj).mkString("[", ",", "]")
      case "values" => rows.map(rowArr).mkString("[", ",", "]")
      case "split" =>
        "{\"columns\":" + names.map(Fs.jsonString).mkString("[", ",", "]") +
          ",\"index\":" + rows.indices.map(_.toString)
            .mkString("[", ",", "]") +
          ",\"data\":" + rows.map(rowArr).mkString("[", ",", "]") + "}"
      case "index" =>
        rows.zipWithIndex
          .map { case (r, i) => Fs.jsonString(i.toString) + ":" + rowObj(r) }
          .mkString("{", ",", "}")
      case "columns" =>
        names.indices.map { i =>
          Fs.jsonString(names(i)) + ":" + rows.zipWithIndex
            .map { case (r, j) => Fs.jsonString(j.toString) + ":" + cell(r, i) }
            .mkString("{", ",", "}")
        }.mkString("{", ",", "}")
      case other => throw new IllegalArgumentException(
        s"unknown orient: $other (records|split|index|columns|values)")
    }
    Fs.writeString(outPath, doc)
  }

  /** Read back any [[writeJsonDoc]] orient (ref psweep.py:494-512
    * `df_read` fmt="json" with orient). The document is re-shaped
    * driver-side into record objects and parsed by Spark's JSON reader,
    * so the type-loss matrix — ints widen to long, timestamps need
    * `schema` to round-trip — is identical for every orient
    * (JsonRoundTripSpec / JsonDocOrientSpec pin it). `values` orient has
    * no column names; pandas-style positional names "0".."N" apply. */
  def readJsonDoc(path: String, orient: String = "records",
                  schema: Option[StructType] = None): DataFrame = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    import scala.jdk.CollectionConverters._
    val root = new ObjectMapper().readTree(Fs.readString(path))
    def obj(fields: Seq[(String, JsonNode)]): String =
      fields.map { case (k, v) => Fs.jsonString(k) + ":" + v.toString }
        .mkString("{", ",", "}")
    val records: Seq[String] = orient match {
      case "records" => root.elements().asScala.map(_.toString).toSeq
      case "values" =>
        // no names in the document: take them positionally from `schema`
        // when given, else pandas-style positional labels "0".."N"
        val colNames = schema.map(_.fieldNames.toSeq)
        root.elements().asScala.map { arr =>
          val vals = arr.elements().asScala.toSeq
          obj(colNames match {
            case Some(ns) => ns.zip(vals)
            case None => vals.zipWithIndex
              .map { case (v, i) => i.toString -> v }
          })
        }.toSeq
      case "split" =>
        val cols = root.get("columns").elements().asScala
          .map(_.asText).toSeq
        root.get("data").elements().asScala.map(arr =>
          obj(cols.zip(arr.elements().asScala.toSeq))).toSeq
      case "index" =>
        root.properties().asScala.toSeq.map(e => e.getValue.toString)
      case "columns" =>
        // transpose {col -> {label -> v}} back to one object per label,
        // preserving first-seen label order
        val byLabel =
          new java.util.LinkedHashMap[String, List[(String, JsonNode)]]()
        root.properties().asScala.foreach { colEntry =>
          colEntry.getValue.properties().asScala.foreach { cellEntry =>
            val prev = byLabel.getOrDefault(cellEntry.getKey, Nil)
            byLabel.put(cellEntry.getKey,
              prev :+ (colEntry.getKey -> cellEntry.getValue))
          }
        }
        byLabel.values().asScala.map(obj).toSeq
      case other => throw new IllegalArgumentException(
        s"unknown orient: $other (records|split|index|columns|values)")
    }
    import spark.implicits._
    val ds = spark.createDataset(records)
    schema.fold(spark.read.json(ds))(s => spark.read.schema(s).json(ds))
  }

  /** Compact the database's many small append files (an append-only store
    * accumulates one file set per run; at high run counts the scan's
    * file-listing and task-launch overhead dominates) down to ~one file
    * per `_run_id` partition. Atomic: rewrite to a temp dir, then swap.
    * Values, schema, and partitioning are unchanged. */
  def compact(numPartitions: Int = 0): Unit = {
    if (!exists) return
    val runs = read().select("_run_id").distinct().count().toInt
    val n = if (numPartitions > 0) numPartitions else math.max(1, runs)
    val df = read().repartition(n, col("_run_id"))
    withWriteLock {
      val tmp = s"$dbPath.__compact_tmp"
      Fs.delete(tmp)
      df.write.mode("overwrite").partitionBy("_run_id").parquet(tmp)
      swapIn(tmp)
    }
  }

  /** Read a JSON-format database back (the S3 alternate format,
    * ref psweep.py:454-512). JSON is the lossy format — ints widen to
    * long, timestamps need the schema to round-trip (mirrors the
    * reference's documented JSON type-loss caveats,
    * ref tests/test_all.py:357-363). */
  def readJson(path: String,
               schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
    schema.fold(r)(s => r.schema(s)).json(path)
  }
}

object Database {

  def apply(spark: SparkSession, calcDir: String,
            basename: String = "database"): Database =
    new Database(spark, calcDir, basename)

  /** Which of `values` already exist in `df`'s column `colName` — one
    * column-pruned pass, broadcast small side (the J1 dedup shape). */
  def existingAmong(df: DataFrame, colName: String,
                    values: Seq[String]): Set[String] = {
    if (!df.columns.contains(colName)) return Set.empty
    import df.sparkSession.implicits._
    val small = values.distinct.toDF(colName)
    df.select(colName)
      .join(broadcast(small), Seq(colName), "left_semi")
      .distinct().collect().map(_.getString(0)).toSet
  }

  /** Fuse boolean filter columns with and/or/xor and apply
    * (ref psweep.py:622-679 `df_filter_conds`). */
  def dfFilterConds(df: DataFrame, conds: Seq[Column],
                    op: String = "and"): DataFrame = {
    if (conds.isEmpty) return df
    val fused = op match {
      case "and" => conds.reduce(_ && _)
      case "or" => conds.reduce(_ || _)
      case "xor" => conds.reduce(_ =!= _)
      case other => throw new IllegalArgumentException(
        s"op must be and|or|xor, got $other")
    }
    df.filter(fused)
  }

  /** Kind-projection of a DataFrame (ref psweep.py:877-898). */
  def selectKind(df: DataFrame, kind: ColKind.Value): DataFrame = {
    val cols = ColKind.filterCols(df.columns.toSeq, kind)
    df.select(cols.map(col): _*)
  }

  /** Extract psets (pset-kind columns, nulls preserved) from a database
    * slice, such that re-running them reproduces the stored hashes
    * (ref psweep.py:755-795 `df_extract_params`; round-trip invariant of
    * tests/test_all.py:1440-1473). Driver-side by design: extracted params
    * seed a new sweep, which is driver-built. */
  def extractParams(df: DataFrame): Seq[Map[String, Any]] = {
    val slice = selectKind(df, ColKind.Pset)
    val names = slice.columns
    slice.collect().toSeq.map { r =>
      names.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap
    }
  }

  /** Single row for a `_pset_id`; asserts uniqueness
    * (ref psweep.py:798-850). */
  def extractRow(df: DataFrame, psetId: String): Row = {
    val rows = df.filter(col("_pset_id") === psetId).collect()
    require(rows.length == 1,
      s"expected exactly 1 row for _pset_id=$psetId, got ${rows.length}")
    rows(0)
  }

  /** The pset (parameter map) of one stored row. */
  def extractPset(df: DataFrame, psetId: String): Map[String, Any] = {
    val slice = df.filter(col("_pset_id") === psetId)
    val params = extractParams(slice)
    require(params.size == 1,
      s"expected exactly 1 row for _pset_id=$psetId, got ${params.size}")
    params.head
  }

  /** Consistency check between the database's `_pset_id`s and the per-pset
    * artifact dirs on disk (ref psweep.py:273-297): two anti-joins, fully
    * distributed (artifact listings can be large at scale). */
  def checkCalcDir(spark: SparkSession, calcDir: String, df: DataFrame,
                   basename: String = "database")
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    val uuidRe = "^([0-9a-f]+-){4}[0-9a-f]+$"
    val disk = Fs.listNames(calcDir)
      .filter(_.matches(uuidRe)).toDF("_pset_id")
    val dbIds = df.select("_pset_id")
    val dbNotDisk = dbIds.join(disk, Seq("_pset_id"), "left_anti").distinct()
    val diskNotDb = disk.join(dbIds, Seq("_pset_id"), "left_anti").distinct()
    (dbNotDisk, diskNotDb)
  }

  /** Sorted-column display projection with the full `df_print` option
    * matrix (ref psweep.py:515-619): column names always sorted, prefix
    * cols hidden by default; `cols` selects explicitly and unions the
    * prefix set when `prefixCols` is also given; `skipCols` subtracts
    * (mutually exclusive with `cols`, like the reference); `index`
    * prepends a display ordinal in the frame's current order (an extra
    * zipWithIndex pass — display helper, not a pipeline operator). */
  def printableDF(df: DataFrame, prefixCols: Boolean = false,
                  cols: Seq[String] = Seq.empty,
                  skipCols: Seq[String] = Seq.empty,
                  index: Boolean = false): DataFrame = {
    require(cols.isEmpty || skipCols.isEmpty, "Use either skipCols or cols")
    val prefixSet = df.columns.filter(ColKind.isPrefix).toSet
    val disp =
      if (cols.nonEmpty)
        cols.toSet | (if (prefixCols) prefixSet else Set.empty[String])
      else
        (df.columns.toSet --
          (if (prefixCols) Set.empty[String] else prefixSet)) -- skipCols.toSet
    val chosen = disp.toSeq.sorted
    val proj = df.select(chosen.map(col): _*)
    if (!index) proj
    else {
      val schema = StructType(
        StructField("index", LongType, nullable = false) +:
          proj.schema.fields)
      val rdd = proj.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(i +: r.toSeq)
      }
      proj.sparkSession.createDataFrame(rdd, schema)
    }
  }
}
