package graft.core

import org.apache.spark.sql.Dataset

/** Eager materialization ("pinning") of an intermediate frame, with the
  * fault-tolerance mode chosen per session — the engine-wide answer to
  * the round-15 verdict's reliability finding.
  *
  * Every pin in the engine is per-invocation scratch: a frame computed
  * once and read 2+ times within one query/lifecycle call (candidate
  * sets, gated outputs, signature tables), never reused across runs.
  * `localCheckpoint` is the right default for that shape — eager,
  * executor-local blocks, no distributed-FS round trip — but it is NOT
  * fault-tolerant: the blocks die with their executor, so on a cluster
  * with dynamic allocation (or any executor loss) the consuming query
  * FAILS instead of recomputing. On `local[*]` the executor is the
  * driver, so the distinction is moot.
  *
  * `spark.graft.pin.reliable` picks the trade per session:
  *   - `auto` (default): reliable `checkpoint()` when the session has a
  *     checkpoint dir (`SparkContext.setCheckpointDir` — the cluster
  *     deployment shape, where the dir points at durable shared
  *     storage and pins survive executor loss), `localCheckpoint()`
  *     otherwise (single-JVM runs; an executor loss aborts loudly
  *     instead of recomputing through lost state). This is
  *     [[graft.ops.Tokenize]]'s long-standing `truncateLineage` rule,
  *     promoted engine-wide.
  *   - `true`: always reliable — fails fast if no checkpoint dir is
  *     set, instead of silently degrading to non-fault-tolerant pins.
  *   - `false`: always executor-local, even with a checkpoint dir
  *     (bench/CI shape: the dir may exist for other tooling, pins
  *     should stay cheap).
  *
  * Values are identical in all modes — both checkpoints materialize
  * the SAME rows this plan computed; only where the blocks live (and
  * hence what survives executor loss) differs. PinSpec pins the mode
  * selection and value-identity.
  */
object Pin {
  def pin[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    val mode = spark.conf.get("spark.graft.pin.reliable", "auto")
    val hasDir = spark.sparkContext.getCheckpointDir.isDefined
    // label the eager materialization job with the CALLER's site — the
    // helper would otherwise collapse every pin in the engine onto one
    // "localCheckpoint at Pin.scala" line in the UI and the job-level
    // profiler, losing exactly the attribution the optimization guide
    // says to keep (§1.5)
    val site = Thread.currentThread().getStackTrace
      .find { e =>
        val c = e.getClassName
        !c.startsWith("graft.core.Pin") && !c.startsWith("java.") &&
          !c.startsWith("jdk.") && !c.startsWith("scala.")
      }
      .map(e => s"${e.getFileName}:${e.getLineNumber}")
      .getOrElse("unknown")
    val sc = spark.sparkContext
    val prevDesc = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(s"pin at $site")
    try mode match {
      case "true" =>
        require(hasDir,
          "spark.graft.pin.reliable=true needs a checkpoint dir — call " +
            "SparkContext.setCheckpointDir(<durable shared path>) first " +
            "(silently falling back to executor-local pins would defeat " +
            "the reliability the conf asked for)")
        ds.checkpoint(eager = true)
      case "false" => ds.localCheckpoint(true)
      case "auto" =>
        if (hasDir) ds.checkpoint(eager = true) else ds.localCheckpoint(true)
      case other => throw new IllegalArgumentException(
        s"spark.graft.pin.reliable must be auto|true|false, got '$other'")
    } finally sc.setJobDescription(prevDesc)
  }

  /** Syntax: `df.pinned()` — so pin sites read like the
    * `localCheckpoint(true)` calls they replace. */
  implicit class PinOps[T](private val ds: Dataset[T]) extends AnyVal {
    def pinned(): Dataset[T] = pin(ds)
  }
}
