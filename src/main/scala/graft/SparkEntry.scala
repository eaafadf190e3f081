package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by the packs under `graft.queries`; each pack
  * pairs Spark implementations with DuckDB oracle SQL over the same
  * parquet tables (or VALUES reconstructions for constructed relations).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_stars")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Every `q_stream_*` closure runs under
    * [[graft.streaming.Monitor.withDrainPartitions]]: these queries
    * drain a BOUNDED file stream through a fresh checkpoint per
    * invocation, and a stateful drain materializes one state-store
    * instance per shuffle partition per micro-batch — so the partition
    * count is derived from the drained input's size (capped at the
    * session's configured shuffle partitions; see drainPartitions'
    * scaladoc for the production-sizing argument) instead of paying a
    * cluster-sized constant for kilobytes of state. Only the eager
    * drain inside the closure is affected; the returned frame executes
    * under the session's normal configuration. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = graft.queries.Relational.queries ++
      graft.queries.Core.queries ++
      graft.queries.TrainingData.queries ++
      graft.queries.Tokenizer.queries
    all.map {
      case (name, fn) if name.startsWith("q_stream") =>
        name -> ((s: SparkSession, dir: String) =>
          graft.streaming.Monitor.withDrainPartitions(s, dir) {
            fn(s, dir)
          })
      case other => other
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Core.oracle ++
      graft.queries.TrainingData.oracle ++
      graft.queries.Tokenizer.oracle
}
