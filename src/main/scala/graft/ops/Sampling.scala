package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting for
  * training-data pipelines.
  *
  * Everything keys off `md5(key)` compared lexicographically against a hex
  * threshold — no `rand()`, so samples are reproducible across runs,
  * retried tasks, engines, and cluster sizes (the properties a 100 TB
  * pipeline actually needs from a sampler), and the whole operator family
  * is expressible in ANSI SQL for oracle verification. Threshold
  * granularity is 4 hex digits (1/65536).
  */
object Sampling {

  private def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0,1]")
    // clamp to the largest 4-digit threshold: rounding to 65536 would
    // format as the 5-char "10000", which compares lexicographically
    // BELOW almost every 4-char hash and silently kept ~1/16 of rows
    f"${math.round(fraction * 65536).min(65535).toInt}%04x"
  }

  /** True iff `fraction` rounds to keep-everything at the 1/65536
    * threshold granularity (>= 65535.5/65536): such fractions must keep
    * every row exactly, not hash-filter. */
  private def keepsAll(fraction: Double): Boolean =
    math.round(fraction * 65536) >= 65536

  /** The unit-interval position of a key: first 4 hex chars of its md5.
    * Lexicographic comparison of lowercase hex == numeric comparison. */
  def hashPosition(key: Column): Column = substring(md5(key.cast("string")), 1, 4)

  /** The keep-decision predicate for one fraction (keep-all / drop-all
    * short-circuited so boundary fractions are exact, not hash-rounded). */
  private def keepPredicate(key: Column, fraction: Double): Column =
    if (keepsAll(fraction)) lit(true)
    else if (fraction <= 0.0) lit(false)
    else hashPosition(key) < lit(hexThreshold(fraction))

  /** Keep ~`fraction` of rows, chosen by key hash (same key -> same
    * decision, always). */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(keepPredicate(key, fraction))

  /** Per-stratum fractions (e.g. downsample dominant languages): strata
    * not listed keep everything. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           fractions: Map[String, Double]): DataFrame = {
    val keep = fractions.foldLeft(lit(true)) { case (acc, (s, f)) =>
      when(stratum === s, keepPredicate(key, f)).otherwise(acc)
    }
    df.filter(keep)
  }

  /** Keep at most `k` rows per group, chosen deterministically by hash
    * position (ties broken by the key itself) — the per-host / per-source
    * cap of a crawl pipeline. The constant-limit rank filter plans as a
    * WindowGroupLimit: every map partition prunes to its local k rows per
    * group BEFORE the exchange, so a hot group (one host owning 1e8 pages
    * of a 100 TB crawl) ships `k * numPartitions` rows through the
    * shuffle, never the whole group. */
  def capPerGroup(df: DataFrame, group: Column, key: Column, k: Int): DataFrame = {
    require(k > 0, "cap must be positive")
    val w = Window.partitionBy(group).orderBy(hashPosition(key), key)
    // null keys drop, like everywhere else in this family — rank is
    // never null, and a null hash position would sort FIRST and steal a
    // cap slot from every real row in its group
    df.filter(key.isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Per-stratum selectable-row counts for the LISTED strata only — the
    * driver-side table [[mixtureByCount]] sizes its targets from. Package-
    * private so the spec can pin the collected cardinality to
    * `listed.size`, not the corpus's stratum domain. */
  private[ops] def supplyCounts(df: DataFrame, stratum: Column, key: Column,
                                listed: Set[String]): Map[String, Long] =
    df.filter(key.isNotNull)
      .filter(stratum.isin(listed.toSeq: _*))
      .groupBy(stratum.as("__s")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Exact-count mixture resampling: re-weight a multi-source corpus to an
    * integer target mixture (e.g. web:5, wiki:3, books:2) by keeping the
    * largest total N such that every listed stratum can supply its share,
    * then taking each stratum's hash-first `weight*N/W` rows. All the
    * count arithmetic is integer floor division, so the selected counts —
    * and, via the hash ordering, the selected ROWS — are exactly
    * reproducible in any engine. Strata not listed in `weights` are
    * dropped.
    *
    * Scale: one count aggregate (collects one row per LISTED stratum —
    * bounded by `weights.size`, never the corpus's stratum domain) plus one
    * rank-per-stratum window; the per-stratum total order is the price of
    * exact counts. For approximate mixtures where a global rank is too
    * expensive, use [[stratifiedHashSample]] with precomputed fractions —
    * same hash, no sort. */
  def mixtureByCount(df: DataFrame, stratum: Column, key: Column,
                     weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixture weights must be positive")
    val totalW = weights.values.sum
    // supply counts over SELECTABLE rows only (null keys drop below, so
    // counting them would set targets the rank filter cannot fill). The
    // aggregate is restricted to the strata actually named in `weights`
    // BEFORE collecting: the rank filter ignores unlisted strata anyway,
    // and without the filter this would pull one row per distinct stratum
    // value in the corpus — driver OOM when the stratum is e.g. url-host
    // on a crawl. Collected rows are bounded by |weights|.
    val counts = supplyCounts(df, stratum, key, weights.keySet)
    // largest N with floor(w_s*N/W) <= count_s for all s: each stratum
    // can supply at most count_s*W/w_s total, the corpus supplies the min
    val n = weights.map { case (s, w) =>
      counts.getOrElse(s, 0L) * totalW / w
    }.min
    val lim = weights.map { case (s, w) => s -> w * n / totalW }
    val rankW = Window.partitionBy(stratum).orderBy(hashPosition(key), key)
    val limCol = lim.foldLeft(lit(0L)) { case (acc, (s, k)) =>
      when(stratum === s, lit(k)).otherwise(acc)
    }
    // null keys drop (rank would otherwise admit them hash-first); null
    // strata never match a weight entry, so limCol stays 0 for them
    df.filter(key.isNotNull)
      .withColumn("__rn", row_number().over(rankW))
      .filter(col("__rn") <= limCol)
      .drop("__rn")
  }

  /** Token-budget mixture resampling — [[mixtureByCount]] with the
    * mixture measured in TOKENS, which is what a pretraining recipe
    * actually specifies ("web 60% of tokens, code 25%, books 15%").
    * Keeps, per listed stratum, its hash-first documents while the
    * stratum's cumulative token count stays within `floor(w_s*T/W)`,
    * where T is the largest total token budget every stratum can supply.
    * All arithmetic is integer (sums, floor division, a cumulative-sum
    * comparison), so the selected ROW SET is exactly reproducible in any
    * engine. Selection is a strict hash-order PREFIX per stratum: the
    * first document whose inclusive cumulative token count exceeds the
    * stratum budget ends that stratum (later smaller docs are NOT
    * back-filled — best-fit would break the prefix property that makes
    * the row set order-independent and oracle-reproducible). Budgets
    * never split a document. Strata not listed in `weights` are dropped;
    * a LISTED stratum with no supply zeroes the whole mixture (targets
    * are unsatisfiable); null keys and null/negative token counts drop.
    *
    * Scale shape: one partial-aggregatable sum per LISTED stratum
    * (driver collect bounded by |weights|), then one rank-free
    * cumulative window per stratum — the same single keyed shuffle as
    * [[mixtureByCount]]; the per-stratum total order is the price of an
    * exact budget. */
  def mixtureByTokens(df: DataFrame, stratum: Column, key: Column,
                      tokens: Column, weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixture weights must be positive")
    val totalW = weights.values.sum
    val tok = tokens.cast("long")
    val selectable = df.filter(key.isNotNull)
      .filter(tok.isNotNull && tok > 0L)
      .filter(stratum.isin(weights.keySet.toSeq: _*))
    val supply = selectable
      .groupBy(stratum.as("__s")).agg(sum(tok).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // largest T with floor(w_s*T/W) <= supply_s for all s (same floor
    // inversion as mixtureByCount, over token totals)
    val t = weights.map { case (s, w) =>
      supply.getOrElse(s, 0L) * totalW / w
    }.min
    val lim = weights.map { case (s, w) => s -> w * t / totalW }
    val cumW = Window.partitionBy(stratum).orderBy(hashPosition(key), key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val limCol = lim.foldLeft(lit(0L)) { case (acc, (s, k)) =>
      when(stratum === s, lit(k)).otherwise(acc)
    }
    selectable
      .withColumn("__cum", sum(tok).over(cumW))
      .filter(col("__cum") <= limCol)
      .drop("__cum")
  }

  /** Deterministic training-order shuffle position: a portable sort key
    * derived from `md5(epoch ":" key)`, so each epoch is an independent,
    * reproducible permutation of the corpus — no `rand()`, no state.
    * `ORDER BY` this column is Spark's standard range-partitioned global
    * sort (sample → range boundaries → one shuffle), which is exactly how
    * an epoch's training shards should be laid out; rows with equal hash
    * fall back to key order, so the permutation is total. */
  def shufflePosition(key: Column, epoch: Int): Column =
    md5(concat_ws(":", lit(epoch), key.cast("string")))

  /** Write the corpus as epoch-shuffled training shards: rows take their
    * epoch's [[shufflePosition]], range-partition into `numShards` files
    * whose WITHIN-shard and ACROSS-shard order is the epoch permutation —
    * a trainer streaming shard 0, 1, 2... reads the exact global order,
    * and any shard subset is a valid stratified slice of the epoch.
    * `repartitionByRange` is Spark's sampled range partitioner (one
    * shuffle); the per-shard sort is the write-side sort, no extra
    * exchange. The global ROW ORDER (the concatenation of shards) is
    * deterministic given (key, epoch); shard BOUNDARIES come from the
    * range partitioner's reservoir sample, which is seeded per plan — a
    * re-run rewrites a complete, globally-identical order whose cut
    * points may sit elsewhere. Always consume a write atomically (the
    * `overwrite` here replaces the whole directory); never mix shard
    * files from two runs. */
  def writeEpochShards(df: DataFrame, path: String, key: Column,
                       epoch: Int, numShards: Int): Unit = {
    require(numShards > 0, "numShards must be positive")
    df.withColumn("__pos", shufflePosition(key, epoch))
      .repartitionByRange(numShards, col("__pos"))
      .sortWithinPartitions(col("__pos"))
      .drop("__pos")
      .write.mode("overwrite").parquet(path)
  }

  /** Split assignment column from cumulative hash ranges, e.g.
    * `splits = Seq("train" -> 0.8, "test" -> 0.1, "val" -> 0.1)`.
    * Key on a GROUP column (source, author, url-domain) to make the split
    * leakage-safe: every row of a group lands in the same part. */
  def splitColumn(key: Column, splits: Seq[(String, Double)]): Column = {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val pos = hashPosition(key)
    val cums = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    splits.zip(cums).init.foldRight(lit(splits.last._1)) {
      case (((name, _), cum), otherwise) =>
        // keepsAll guards degenerate zero-weight tails: a cumulative 1.0
        // boundary must capture every hash, including "ffff"
        val below =
          if (keepsAll(cum)) lit(true) else pos < lit(hexThreshold(cum))
        when(below, name).otherwise(otherwise)
    }
  }
}
