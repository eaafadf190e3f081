package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Pin.PinOps

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scale design: the brute-force path is the exactness baseline — a
  * broadcast of the (small) query set against a single scan of the corpus,
  * per-partition top-k via window (no corpus shuffle, the only wide
  * exchange moves `|queries| * k` rows). The LSH path buckets the corpus
  * by random-hyperplane signatures computed with codegen'd expressions —
  * at 100 TB the corpus is hashed once, the bucket join replaces the full
  * cross product, and recall is tuned by `planes` (bucket granularity)
  * and multi-probe `hammingRadius`.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double with
    * a fixed left-to-right accumulation order (reproducible everywhere).
    * Backed by the codegen'd [[VectorExprs.CosineSim]] — numerically
    * identical to the `aggregate(zip_with(...))` formulation it replaced
    * (ExpressionEquivalenceSpec pins bit-equality), but one JIT'd loop
    * instead of ~3*dim interpreted lambda calls per pair. */
  def cosine(a: Column, b: Column): Column = VectorExprs.cosine(a, b)

  /** Exact top-k cosine neighbors for each query vector (brute force —
    * the correctness baseline and the small-query-set workhorse).
    * Output: (query_id, vec_id, score, rank), deterministic tiebreak on
    * neighbor id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val scored = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", cosine(col("v"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("score"), col("rank"))
  }

  /** Recall@k of an approximate neighbor result against the exact
    * brute-force ground truth on the SAME query set — the deployment
    * gate every served ANN index needs (an index whose recall silently
    * decayed — drifted corpus, stale centroids, too-coarse buckets —
    * poisons every downstream near-dup / contamination decision that
    * consumes it). Inputs are two `(query_id, vec_id, …)` frames as
    * produced by [[bruteForceTopK]] / [[lshTopK]] / [[ivfTopKBatch]];
    * output is one row per query:
    * `(query_id, n_exact, n_hit, recall)` with
    * `recall = |approx ∩ exact| / |exact|` (`n_exact` < k only when the
    * corpus minus self has fewer than k rows).
    *
    * Scale shape: the expensive side is the GROUND TRUTH, which is why
    * a production gate runs on a SAMPLED query set (the caller picks
    * the sample — [[bruteForceTopK]] is one corpus scan against
    * broadcast queries, no corpus shuffle). The comparison itself is
    * one equi-join on (query_id, vec_id) over two |queries|·k-row
    * frames plus a keyed aggregate — never corpus-sized. */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame =
    exact.select(col("query_id"), col("vec_id"))
      .join(broadcast(approx.select(col("query_id"), col("vec_id"),
        lit(1L).as("__hit"))), Seq("query_id", "vec_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"), count(col("__hit")).as("n_hit"))
      .withColumn("recall", col("n_hit").cast("double") / col("n_exact"))

  /** Deterministic pseudo-random hyperplanes (fixed seed): component
    * (p, i) = fmix64(seed + p*dim + i) mapped to a uniform in [-1, 1).
    * The top 53 bits over 2^53 is a dyadic rational, so the double is
    * EXACT and any engine with 128-bit integer arithmetic reproduces the
    * planes bit-for-bit — which is what lets the driver's DuckDB oracle
    * check q_embed_ann end-to-end (signatures, probes, and ranking).
    * Uniform (not Gaussian) components keep sign-of-dot LSH symmetric,
    * which is all the banding needs; the recall spec pins quality. */
  def hyperplanes(dim: Int, planes: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(planes)(p => Array.tabulate(dim) { i =>
      val h = SimHash64.fmix64(seed + p.toLong * dim + i)
      (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    })

  /** Random-hyperplane signature of a vector column: bit i = sign of
    * dot(v, plane_i), each dot one codegen'd constant-weight loop. */
  def lshSignature(v: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(VectorExprs.dotConst(v, p) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Signatures within Hamming distance `radius` of `sig` (multi-probe).
    * Probe counts: 1 at radius 0, 1+planes at radius 1,
    * 1+planes+C(planes,2) at radius 2 (37 for the default 8 planes) —
    * still a per-query constant, so the probe explode stays broadcastable.
    * Radius 2 is where big-corpus recall tuning usually lands: it rescues
    * pairs whose signatures disagree on two marginal hyperplanes without
    * coarsening the buckets themselves. */
  private def probeSignatures(sig: Column, planes: Int, radius: Int): Column = {
    require(radius >= 0 && radius <= 2, "multi-probe radius in [0,2]")
    val r1 =
      if (radius >= 1) (0 until planes).map(i => sig.bitwiseXOR(lit(1L << i)))
      else Seq.empty[Column]
    val r2 =
      if (radius >= 2)
        for { i <- 0 until planes; j <- (i + 1) until planes }
          yield sig.bitwiseXOR(lit((1L << i) | (1L << j)))
      else Seq.empty[Column]
    array((sig +: r1) ++ r2: _*)
  }

  /** LSH-bucketed approximate top-k: corpus hashed once into signature
    * buckets; each query probes its own bucket plus all Hamming-1
    * neighbors; exact cosine ranks candidates. Recall < 1 by construction
    * — tune `planes` down / `radius` up for higher recall. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 8, radius: Int = 1,
              idCol: String = "vec_id",
              vecCol: String = "embedding",
              dim: Int = -1): DataFrame = {
    // hyperplanes must match the embedding dimension: a mismatch would
    // null-pad every zip_with dot product and silently collapse all
    // signatures into one bucket. Infer from the data (one-row job) when
    // not supplied, and fail fast per row on ragged dimensions.
    val d =
      if (dim > 0) dim
      else corpus.select(size(col(vecCol)).as("d")).head().getInt(0)
    val hp = hyperplanes(d, planes)
    val dimOk = coalesce(assert_true(size(col("v")) === d,
      lit(s"embedding dimension != $d")), lit(true))
    val bucketed = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"),
      lshSignature(col(vecCol), hp).as("sig"))
      .filter(dimOk)
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        explode(probeSignatures(lshSignature(col(vecCol), hp), planes, radius))
          .as("sig"))
        .filter(coalesce(assert_true(size(col("qv")) === d,
          lit(s"query embedding dimension != $d")), lit(true))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    bucketed.join(q, Seq("sig"))
      .filter(col("vec_id") =!= col("query_id"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("score", cosine(col("v"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("score"), col("rank"))
  }

  /** Score of a vector column against one literal centroid (dot product —
    * centroids are normalized, so this ranks like cosine). */
  private def centroidDot(v: Column, c: Array[Double]): Column =
    VectorExprs.dotConst(v, c)

  /** Element-type-agnostic vector read from a collected Row: the driver
    * has regenerated testdata schemas between rounds before (the events
    * ns->us lesson), and the Column-level ops already accept
    * `array<float|double>` — the driver-side collect sites must not be
    * the one place a float->double drift still crashes. */
  private def rowVec(r: org.apache.spark.sql.Row, i: Int): Array[Double] =
    r.getSeq[Any](i).map {
      case f: java.lang.Float => f.toDouble
      case d: java.lang.Double => d.doubleValue()
      case n: java.lang.Number => n.doubleValue()
      case x => throw new IllegalArgumentException(
        s"non-numeric embedding element: $x")
    }.toArray

  /** Past this many centroids the `greatest(struct(dot, cid), ...)`
    * formulation stops being reasonable: K child expressions in one
    * generated function (plan-compile blowup, then codegen fallback).
    * The matrix-expression path has no such ceiling. */
  private[ops] val literalArgmaxCeiling = 64

  /** Nearest-centroid id by maximum dot product (deterministic: ties take
    * the higher centroid id via lexicographic struct comparison). Two
    * spec-pinned-identical physical forms: up to
    * [[literalArgmaxCeiling]] centroids, the original per-centroid
    * literal `greatest` chain (unchanged plans for every existing
    * caller); above it, [[VectorExprs.ArgMaxDot]] carries the whole
    * centroid matrix as ONE reference object and loops K x dim inside
    * codegen — corpus-scale IVF (thousands of cells over billions of
    * vectors) without a join, a shuffle, or a K-term expression tree. */
  def assignCentroid(v: Column, centroids: Array[Array[Double]]): Column =
    if (centroids.length <= literalArgmaxCeiling)
      greatest(centroids.zipWithIndex.map { case (c, i) =>
        struct(centroidDot(v, c).as("score"), lit(i).as("cid"))
      }: _*).getField("cid")
    else VectorExprs.argMaxDot(v, centroids)

  /** Deterministic mini k-means (Lloyd) for the IVF coarse quantizer:
    * centroids seed from the `k` lowest-id vectors, each iteration assigns
    * by dot product and recomputes per-dimension means (rounded to 1e-6 so
    * distributed summation order cannot leak into the result). One Spark
    * job per iteration; the corpus is scanned, never collected. */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int = 5,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Array[Array[Double]] = {
    def normalize(c: Array[Double]): Array[Double] = {
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) c else c.map(x => math.floor(x / n * 1e6) / 1e6)
    }
    var centroids = corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(r => normalize(rowVec(r, 0)))
    (0 until iters).foreach { _ =>
      val assigned = corpus.select(col(vecCol).as("v"),
        assignCentroid(col(vecCol), centroids).as("cid"))
      val dims = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("x").cast("double")).as("m"))
        .collect()
      val byCid = dims.groupBy(_.getInt(0))
      centroids = centroids.indices.map { i =>
        byCid.get(i) match {
          case Some(rows) =>
            val dim = rows.map(_.getInt(1)).max + 1
            val c = new Array[Double](dim)
            rows.foreach(r => c(r.getInt(1)) = r.getDouble(2))
            normalize(c)
          case None => centroids(i) // empty cluster keeps its centroid
        }
      }.toArray
    }
    centroids
  }

  /** IVF approximate top-k: the corpus is assigned once to `k` coarse
    * centroids (the inverted file); each query probes its `nprobe` nearest
    * lists and ranks candidates by exact cosine. The scan computes
    * `numCentroids` dot products per row and the candidate join touches
    * only the probed lists — the other scale path next to [[lshTopK]]. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numCentroids: Int = 8, nprobe: Int = 2, iters: Int = 3,
              idCol: String = "vec_id",
              vecCol: String = "embedding",
              trainFraction: Double = 0.0,
              targetTrain: Long = 100000L,
              maxQueries: Int = 100000): DataFrame = {
    // the coarse quantizer trains on a deterministic hash sample: each
    // Lloyd iteration scans its training input, and at corpus scale the
    // quantizer needs ~1e4-1e5 vectors, not `iters` full 100 TB scans.
    // Assignment below still covers the FULL corpus; sampling only
    // perturbs where the cell boundaries fall. `trainFraction = 0` (the
    // default) DERIVES the fraction from corpus size — keep ~`targetTrain`
    // training vectors, like cosinePairs' deriveCells — so a caller on
    // defaults never pays `iters` full scans of a 100 TB corpus; 1.0
    // explicitly opts back into full-corpus training. The sizing count()
    // is metadata-only on file-backed frames (pass trainFraction
    // explicitly when the input plan is expensive to evaluate).
    val (centroids, bucketed) = ivfQuantize(corpus, numCentroids, iters,
      idCol, vecCol, trainFraction, targetTrain)
    // probe lists per query, computed driver-side: the query frame is a
    // probe set (it rides the plan as two broadcasts below), so the
    // collect is bounded BEFORE it happens — the bm25TopKBatch
    // bounded-probe discipline. A corpus-sized "query table" gets a loud
    // fail-fast with sizing guidance, not a silent driver OOM; the limit
    // counts at most maxQueries+1 rows, never the full frame.
    require(maxQueries > 0, "maxQueries must be positive")
    val nQueries = queries.limit(maxQueries + 1).count()
    require(nQueries <= maxQueries,
      s"query frame exceeds maxQueries=$maxQueries rows; ivfTopK " +
        "collects and broadcasts the queries as a probe set — for " +
        "corpus-scale query tables shard the queries (or raise " +
        "maxQueries deliberately if the driver is sized for it)")
    val qRows = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .collect()
    val probes = qRows.flatMap { r =>
      val qv = rowVec(r, 1)
      centroids.zipWithIndex
        .map { case (c, i) => (c.zip(qv).map { case (a, b) => a * b }.sum, i) }
        .sortBy { case (s, i) => (-s, i) }
        .take(nprobe)
        .map { case (_, cid) => (r.getLong(0), cid) }
    }
    import corpus.sparkSession.implicits._
    val probeDF = broadcast(probes.toSeq.toDF("query_id", "cid"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    ivfRank(bucketed.join(probeDF, Seq("cid")).join(q, Seq("query_id")), k)
  }

  /** Shared IVF quantizer prelude: derived-or-explicit train fraction,
    * Lloyd iterations on the (possibly sampled) train set, full-corpus
    * cell assignment. One definition so the driver-probe and
    * distributed-probe variants can never diverge on training or
    * assignment semantics. */
  /** Fit the IVF coarse quantizer once: deterministic k-means
    * centroids plus the corpus bucketed by nearest centroid
    * (`(vec_id, v, cid)`). Public because fit-once/probe-many is the
    * production shape — an nprobe sweep ([[ivfProbeTopK]]), a tuning
    * loop, or repeated query batches re-probe ONE fitted quantizer
    * instead of re-running k-means per call; [[ivfTopKBatch]] is the
    * fit-and-probe convenience over this. */
  def ivfQuantize(corpus: DataFrame, numCentroids: Int = 8,
                  iters: Int = 3, idCol: String = "vec_id",
                  vecCol: String = "embedding",
                  trainFraction: Double = 0.0,
                  targetTrain: Long = 100000L)
      : (Array[Array[Double]], DataFrame) = {
    require(trainFraction >= 0.0 && trainFraction <= 1.0,
      "trainFraction in [0,1] (0 = derive from corpus size)")
    val frac =
      if (trainFraction > 0.0) trainFraction
      else deriveTrainFraction(corpus.count(), targetTrain)
    val trainSet =
      if (frac >= 1.0) corpus
      else Sampling.hashSample(corpus, col(idCol), frac)
    val centroids = kmeansCentroids(trainSet, numCentroids, iters, idCol, vecCol)
    val bucketed = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"),
      assignCentroid(col(vecCol), centroids).as("cid"))
    (centroids, bucketed)
  }

  /** Shared IVF ranking epilogue over candidate rows
    * `(query_id, vec_id, v, qv, ...)`: self-filter, exact cosine, and
    * the per-query constant-limit rank (WindowGroupLimit). */
  private def ivfRank(cands: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    cands
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", cosine(col("v"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("score"), col("rank"))
  }

  /** [[ivfTopK]] for query TABLES: identical semantics (same quantizer,
    * same probe rule, same ranking), but the per-query probe lists are
    * computed MAP-SIDE from the literal centroid array instead of a
    * driver collect — there is no `maxQueries` bound because nothing
    * ever concentrates on the driver, so a million-query curation table
    * fans out across the cluster like any other join.
    *
    * Probe-order parity with [[ivfTopK]]: the driver version sorts
    * `(-score, cid)` with Scala's total ordering; here each query row
    * sorts an array of `struct(-score, cid)` — Spark's struct ordering
    * compares doubles with the same `Double.compare` total order, so
    * the chosen cells (ties, signed zeros and all) are identical.
    *
    * Scale shape: one corpus pass for assignment (as in [[ivfTopK]]),
    * one map-side generator expanding each query to `nprobe` rows (the
    * query vector rides those rows), then a cid equi-join — AQE
    * broadcasts the probe side while it is small and shuffle-joins at
    * table scale; the final per-query rank is a constant-limit window
    * (WindowGroupLimit: per-partition heaps before the exchange). A hot
    * cell is bounded by the quantizer's balance, same as [[ivfTopK]] —
    * at 1000 executors the candidate work is
    * `|queries| * nprobe * avg-cell-size`, spread by the cid shuffle. */
  def ivfTopKBatch(corpus: DataFrame, queries: DataFrame, k: Int,
                   numCentroids: Int = 8, nprobe: Int = 2, iters: Int = 3,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding",
                   trainFraction: Double = 0.0,
                   targetTrain: Long = 100000L): DataFrame = {
    val (centroids, bucketed) = ivfQuantize(corpus, numCentroids, iters,
      idCol, vecCol, trainFraction, targetTrain)
    ivfProbeTopK(centroids, bucketed, queries, k, nprobe, idCol, vecCol)
  }

  /** The probe-and-rank half of [[ivfTopKBatch]] over a PREBUILT
    * quantizer ([[ivfQuantize]]'s pair): per-call cost is probe-cell
    * selection + the cid join + the constant-limit rank — no k-means,
    * no assignment pass. Identical results to [[ivfTopKBatch]] with
    * the same parameters (it delegates here). */
  def ivfProbeTopK(centroids: Array[Array[Double]], bucketed: DataFrame,
                   queries: DataFrame, k: Int, nprobe: Int = 2,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    require(k > 0, "k must be positive")
    require(nprobe > 0, "nprobe must be positive")
    // probe-cell selection: same two physical forms as assignCentroid —
    // the K-term literal sort_array up to the ceiling (existing plans
    // unchanged), one matrix expression above it (spec-pinned identical
    // ordering, including null-score-first and cid tie-breaks)
    val base = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probed =
      if (centroids.length <= literalArgmaxCeiling) {
        val probeArr = slice(sort_array(array(centroids.zipWithIndex.map {
          case (c, i) =>
            struct((-centroidDot(col("qv"), c)).as("ns"), lit(i).as("cid"))
        }: _*)), 1, math.min(nprobe, centroids.length))
        base.select(col("query_id"), col("qv"), explode(probeArr).as("p"))
          .select(col("query_id"), col("qv"), col("p.cid").as("cid"))
      } else
        base.select(col("query_id"), col("qv"),
          explode(VectorExprs.topNDotCids(col("qv"), centroids, nprobe))
            .as("cid"))
    ivfRank(bucketed.join(probed, Seq("cid")), k)
  }

  /** Prototypicality-based diversity pruning (Sorscher et al. 2022,
    * "Beyond neural scaling laws: beating power law scaling via data
    * pruning"): cluster the embeddings with the IVF coarse quantizer,
    * score each vector by cosine similarity to its cluster centroid
    * (its prototypicality), and keep `keepPerCluster` per cluster —
    * the LEAST prototypical (hard, diverse examples; the paper's
    * abundant-data regime) by default, or the most prototypical
    * (`keepLeast = false`, the scarce-data regime). Keeping a per-
    * cluster quota rather than a global cut preserves coverage of the
    * embedding space, which is the entire point of pruning by cluster.
    *
    * Output: `(vec_id, cid, proto, rank)`, `proto` 1e-6-floor-rounded,
    * `rank` the within-cluster position under `(proto, vec_id)`
    * ordering (ascending when keeping least, descending when keeping
    * most). Zero-norm vectors have no direction (cosine = 0/0 = NaN)
    * and are excluded, the [[cosinePairs]]/[[lshTopK]] guard.
    *
    * Portability: the quantizer is [[kmeansCentroids]] — deterministic
    * seeds, 1e-6-rounded normalized centroids — and `proto` divides an
    * exact left-to-right dot fold by the two exactly-computed norms, so
    * an oracle replaying the same folds reproduces it bit-for-bit.
    *
    * Scale shape: one corpus pass for assignment (`numCentroids` dot
    * products per row, codegen'd), one broadcast join against the
    * `numCentroids`-row centroid table, and a constant-limit rank that
    * plans as WindowGroupLimit (per-partition heaps before the one
    * cluster-keyed exchange) — no driver materialization beyond the
    * quantizer's own bounded training step. */
  def prototypicalityPrune(corpus: DataFrame, keepPerCluster: Int,
                           keepLeast: Boolean = true,
                           numCentroids: Int = 8, iters: Int = 3,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding",
                           trainFraction: Double = 0.0,
                           targetTrain: Long = 16000L): DataFrame = {
    require(keepPerCluster > 0, "keepPerCluster must be positive")
    val (centroids, bucketed) = ivfQuantize(corpus, numCentroids, iters,
      idCol, vecCol, trainFraction, targetTrain)
    val spark = corpus.sparkSession
    import spark.implicits._
    val centDf = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cid", "cvec")
    val scored = bucketed
      .filter(VectorExprs.dot(col("v"), col("v")) > 0)
      .join(broadcast(centDf), Seq("cid"))
      .withColumn("proto",
        floor(cosine(col("v"), col("cvec")) * 1e6) / 1e6)
    val ord = if (keepLeast) col("proto").asc else col("proto").desc
    val w = Window.partitionBy(col("cid")).orderBy(ord, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= keepPerCluster)
      .select(col("vec_id"), col("cid"), col("proto"), col("rank"))
  }

  /** Cosine near-duplicate pairs above a threshold — embedding-based
    * dedup with EXACT results (recall 1.0) and no cartesian product.
    *
    * Metric-blocking design: vectors are assigned to `numCentroids`
    * k-means cells; per cell we record the maximum angle of any member to
    * its centroid (the cell's angular radius). By the spherical triangle
    * inequality, `angle(a,b) >= angle(cA,cB) - rA - rB`, so any cell pair
    * whose centroid angle minus both radii exceeds `acos(threshold)`
    * provably contains no qualifying pair and is pruned driver-side
    * (`numCentroids^2` checks on collected radii — tiny). The surviving
    * cell pairs drive an equi-join on cell ids: a BroadcastHashJoin
    * against the (small) cell-pair list, then a shuffled equi-join on the
    * cell key — never a CartesianProduct / BroadcastNestedLoopJoin node.
    *
    * Scale: work is the sum of |A|x|B| over surviving cell pairs; with
    * clustered real-world embeddings and high thresholds most cell pairs
    * prune away, and the cell count tunes the block granularity. Uniform
    * data at low thresholds degrades gracefully toward blocked all-pairs
    * — the information-theoretic floor for an exact answer — while
    * keeping shuffle-partitionable equi-join shape (AQE handles cell
    * skew). Zero-norm vectors have no direction (cosine undefined/null)
    * and are excluded, matching the `>= threshold` filter semantics.
    *
    * Cell sizing: `numCentroids = 0` (the default) derives the cell count
    * from the corpus — `clamp(n / targetCellSize, 8, 64)` — so the
    * blocking tracks corpus growth instead of freezing at a test-sized
    * constant (the round-3 `weak` finding). The derived clamp stays at
    * 64 for an economics reason, not a codegen one (assignment itself
    * now scales to thousands of cells via [[assignCentroid]]'s matrix
    * path): past 64 cells * targetCellSize vectors, an EXACT all-pairs
    * answer is quadratic no matter the blocking — use
    * [[annCosinePairs]] and accept recall < 1. Callers may still pass
    * an explicit larger `numCentroids`.
    *
    * Hot-cell guard: a cell holding more than `maxCellSize` vectors
    * (default 16x targetCellSize; negative disables) would make its |cell|^2
    * self-join partition the job's runaway straggler, so the operator
    * fails fast with sizing guidance instead — loud beats a silent
    * week-long stage. The per-cell counts ride the radii aggregate:
    * the guard costs nothing extra. */
  def cosinePairs(corpus: DataFrame, threshold: Double,
                  numCentroids: Int = 0, iters: Int = 3,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding",
                  trainFraction: Double = 0.0,
                  targetCellSize: Long = 100000L,
                  maxCellSize: Long = 0L,
                  targetTrain: Long = 100000L): DataFrame = {
    require(targetCellSize > 0, "targetCellSize must be positive")
    require(trainFraction >= 0.0 && trainFraction <= 1.0,
      "trainFraction in [0,1] (0 = derive from corpus size)")
    // sizing pass: count() is metadata-only on file-backed frames, but a
    // DERIVED corpus (filters, joins upstream) pays one full evaluation
    // here — pass numCentroids + trainFraction explicitly or
    // localCheckpoint upstream when the input plan is expensive
    lazy val n = corpus.count()
    val cells =
      if (numCentroids > 0) numCentroids
      else deriveCells(n, targetCellSize)
    val cellCap =
      if (maxCellSize != 0L) maxCellSize else 16L * targetCellSize
    // centroid TRAINING runs on a deterministic hash sample (each
    // k-means iteration scans its input; at corpus scale train on ~1e5
    // vectors, not 100 TB — trainFraction = 0, the default, derives the
    // fraction keeping ~targetTrain vectors, like ivfTopK). Exactness
    // is unaffected: the pruning bound uses cell radii computed over
    // the FULL corpus below, and the triangle inequality is sound for
    // ANY centroid set — sampling only modulates pruning strength.
    val frac =
      if (trainFraction > 0.0) trainFraction
      else deriveTrainFraction(n, targetTrain)
    val trainSet =
      if (frac >= 1.0) corpus
      else Sampling.hashSample(corpus, col(idCol), frac)
    val centroids = kmeansCentroids(trainSet, cells, iters, idCol, vecCol)
    val norm = sqrt(VectorExprs.dot(col("v"), col("v")))
    // (cid, best score): literal greatest-chain up to the ceiling,
    // the paired matrix expressions above it (same argmax semantics,
    // two K x dim loops instead of K expression children)
    val (bestCid, bestScore) =
      if (centroids.length <= literalArgmaxCeiling) {
        val best = greatest(centroids.zipWithIndex.map { case (c, i) =>
          struct(centroidDot(col("v"), c).as("score"), lit(i).as("cid"))
        }: _*)
        (best.getField("cid"), best.getField("score"))
      } else
        (VectorExprs.argMaxDot(col("v"), centroids),
          VectorExprs.maxDot(col("v"), centroids))
    // materialized once: the radii action, and both sides of the cell
    // self-join, would otherwise each recompute the numCentroids dot
    // products per row
    val assigned = corpus
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .filter(norm > 0)
      .select(col("id"), col("v"), bestCid.as("cid"),
        acos(least(lit(1.0), greatest(lit(-1.0),
          bestScore / norm))).as("ang"))
      .pinned()
    // per-cell angular radius + population: `cells` rows to the driver
    val cellStats = assigned.groupBy(col("cid"))
      .agg(max(col("ang")).as("r"), count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    if (cellCap > 0) cellStats.find(_._2._2 > cellCap).foreach {
      case (cid, (_, n)) => throw new IllegalStateException(
        s"cosinePairs: cell $cid holds $n vectors (> maxCellSize=$cellCap);" +
          " its self-join partition would dominate the job. Raise" +
          " numCentroids/maxCellSize, lower targetCellSize, or switch to" +
          " annCosinePairs (LSH candidates + exact verify, recall < 1)")
    }
    val radii = cellStats.map { case (cid, (r, _)) => cid -> r }
    val maxAngle = math.acos(threshold)
    def centroidAngle(i: Int, j: Int): Double = {
      val d = centroids(i).zip(centroids(j)).map { case (a, b) => a * b }.sum
      val ni = math.sqrt(centroids(i).map(x => x * x).sum)
      val nj = math.sqrt(centroids(j).map(x => x * x).sum)
      if (ni == 0 || nj == 0) 0.0
      else math.acos(math.max(-1.0, math.min(1.0, d / (ni * nj))))
    }
    val survivors = for {
      i <- centroids.indices
      j <- centroids.indices if i <= j
      ri <- radii.get(i)
      rj <- radii.get(j)
      if centroidAngle(i, j) - ri - rj <= maxAngle + 1e-9
    } yield (i, j)
    import corpus.sparkSession.implicits._
    val cellPairs = broadcast(survivors.toDF("cid1", "cid2"))
    val a = assigned.select(col("id").as("ida"), col("v").as("va"),
      col("cid").as("cid1"))
    val b = assigned.select(col("id").as("idb"), col("v").as("vb"),
      col("cid").as("cid2"))
    a.join(cellPairs, Seq("cid1"))
      .join(b, Seq("cid2"))
      .filter(col("cid1") =!= col("cid2") || col("ida") < col("idb"))
      // explode(array(...)) is a Generator: the threshold predicate
      // cannot be pushed back into the join condition through it, so the
      // cosine is evaluated ONCE per candidate instead of twice
      // (condition + projection — the CollapseProject/pushdown trap)
      .withColumn("score", explode(array(cosine(col("va"), col("vb")))))
      .filter(col("score") >= threshold)
      .select(least(col("ida"), col("idb")).as("id1"),
        greatest(col("ida"), col("idb")).as("id2"), col("score"))
  }

  /** Per-vector symmetric int8 quantization scale: `max|x| / 127`. At
    * 100 TB the embedding column IS the storage/shuffle bill — int8 cuts
    * it 4x for ~0.1% cosine error (OpsSpec pins the fidelity floor).
    * Engine-portable: one float max, negate/compare in float, a single
    * double division — no accumulation order to disagree on. */
  def quantScale(v: Column): Column =
    greatest(array_max(v), -array_min(v)).cast("double") / lit(127.0)

  /** Quantize to `array<tinyint>`: `floor(x/scale + 0.5)` (plain floor in
    * both engines — no round-half-to-even ambiguity); a zero scale (the
    * all-zeros vector) quantizes to zeros. Pass `scale` as a MATERIALIZED
    * column ([[quantScale]] via withColumn), not an inline expression —
    * a captured expression re-evaluates inside the per-element lambda. */
  def quantize(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale === 0.0, lit(0))
        .otherwise(floor(x.cast("double") / scale + lit(0.5)))
        .cast("tinyint"))

  /** Reconstruct `array<double>` from int8 codes: `q * scale`. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Plain-L2 deterministic mini k-means for PQ sub-codebooks: seeds
    * from the `k` lowest-id rows, assignment by minimum L2 (via the
    * monotone `dot - ||c||^2/2` form), per-dimension means — every
    * centroid element 1e-6 floor-rounded, but NOT normalized: product
    * quantization reconstructs subvector magnitudes, so, unlike the
    * spherical [[kmeansCentroids]], codewords keep theirs. */
  private[ops] def kmeansCentroidsL2(corpus: DataFrame, k: Int, iters: Int,
                                     idCol: String, vecCol: String)
      : Array[Array[Double]] = {
    def round(c: Array[Double]) = c.map(x => math.floor(x * 1e6) / 1e6)
    var cents = corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(r => round(rowVec(r, 0)))
    (0 until iters).foreach { _ =>
      val dims = corpus
        .select(assignCentroidL2(col(vecCol), cents).as("cid"),
          posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("x").cast("double")).as("m"))
        .collect()
      val byCid = dims.groupBy(_.getInt(0))
      cents = cents.indices.map { i =>
        byCid.get(i) match {
          case Some(rows) =>
            val dim = rows.map(_.getInt(1)).max + 1
            val c = new Array[Double](dim)
            rows.foreach(r => c(r.getInt(1)) = r.getDouble(2))
            round(c)
          case None => cents(i) // empty cluster keeps its codeword
        }
      }.toArray
    }
    cents
  }

  /** ALL `m` PQ sub-codebooks trained in ONE Lloyd loop (r16, guide
    * §1.2 — fewer driver actions): the per-subspace
    * [[kmeansCentroidsL2]] runs were independent loops over the SAME
    * train sample, costing `m × (1 seed collect + iters aggregate
    * jobs)` of sequential scheduler round trips; every subspace's
    * assignment and per-dimension mean now computes in one pass per
    * iteration (`m` structs exploded per row, grouped by (sub, cid,
    * pos)), so the whole training is `1 + iters` jobs regardless of
    * `m`. Value-identical to the per-subspace runs: seeds are the same
    * k lowest-id rows (one collect, sliced client-side — slicing moves
    * no bits), each subspace's assignment chain is the same expression
    * over the same slice, and each (sub, cid, pos) group's `avg`
    * accumulates the same values in the same partition-major order the
    * separate aggregates used (the subspaces only interleave BETWEEN
    * groups). OpsSpec's PQ parity/recall pins and the
    * q_embed_pq/ivfpq oracles hold bit-for-bit. */
  private[ops] def kmeansCentroidsL2Multi(
      corpus: DataFrame, m: Int, sub: Int, k: Int, iters: Int,
      idCol: String, vecCol: String): IndexedSeq[Array[Array[Double]]] = {
    def round(c: Array[Double]) = c.map(x => math.floor(x * 1e6) / 1e6)
    val seedRows = corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
    var cents: IndexedSeq[Array[Array[Double]]] = (0 until m).map { s =>
      seedRows.map(r => round(rowVec(r, 0).slice(s * sub, (s + 1) * sub)))
    }
    (0 until iters).foreach { _ =>
      val perSub = (0 until m).map { s =>
        val sv = slice(col(vecCol), s * sub + 1, sub)
        struct(lit(s).as("sub"), assignCentroidL2(sv, cents(s)).as("cid"),
          sv.as("v"))
      }
      val dims = corpus
        .select(explode(array(perSub: _*)).as("e"))
        .select(col("e.sub").as("sub"), col("e.cid").as("cid"),
          posexplode(col("e.v")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(avg(col("x").cast("double")).as("mn"))
        .collect()
      val bySub = dims.groupBy(_.getInt(0))
      cents = (0 until m).map { s =>
        val byCid = bySub.getOrElse(s, Array.empty[org.apache.spark.sql.Row])
          .groupBy(_.getInt(1))
        cents(s).indices.map { i =>
          byCid.get(i) match {
            case Some(rows) =>
              val c = new Array[Double](sub)
              rows.foreach(r => c(r.getInt(2)) = r.getDouble(3))
              round(c)
            case None => cents(s)(i) // empty cluster keeps its codeword
          }
        }.toArray
      }
    }
    cents
  }

  /** Nearest codeword by minimum L2: argmax of `dot(v, c) - ||c||^2/2`
    * (`||v||^2` is constant across codewords), ties to the higher cid
    * like [[assignCentroid]]. PQ codebooks are tiny by design
    * (`codewords <= 64` enforced by the caller), so the literal
    * `greatest` chain always applies. */
  private def assignCentroidL2(v: Column,
                               cents: Array[Array[Double]]): Column = {
    require(cents.length <= literalArgmaxCeiling,
      s"${cents.length} codewords exceed the literal-chain ceiling")
    greatest(cents.zipWithIndex.map { case (c, i) =>
      val half = 0.5 * c.map(x => x * x).sum
      struct((VectorExprs.dotConst(v, c) - lit(half)).as("score"),
        lit(i).as("cid"))
    }: _*).getField("cid")
  }

  /** Product-quantization ADC top-k (Jegou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011): the vector is split into
    * `m` subvectors, each encoded as the id of its nearest per-subspace
    * codeword — the persisted index is `m` SMALL ints per vector
    * (m=4, 64 codewords fit a byte each: 4 bytes vs 256 float bytes,
    * 64x) — and candidates are scored by asymmetric distance
    * computation: per query, one exact `query-subvector x codeword` dot
    * table (the LUT, `m * codewords` doubles, computed ONCE per query
    * on the broadcast build side), then each corpus row costs `m`
    * array lookups and `m-1` adds. Top `candidates` by
    * `(approx desc, id)` rerank through exact cosine.
    *
    * Scale shape: stage 1 reads ONLY the m-byte code table (the 64x
    * bandwidth cut is the entire point at corpus scale); the LUT rides
    * the broadcast query rows so nothing concentrates on the driver —
    * no maxQueries bound, the [[ivfTopKBatch]] discipline. Codebook
    * training is `m` runs of [[kmeansCentroidsL2]] on the derived hash
    * sample (never `iters` full-corpus scans).
    *
    * Engine-portable: codewords are 1e-6 floor-rounded, assignment and
    * LUT dots are fixed-order folds, the ADC sum is `m-1` adds in
    * subspace order — the DuckDB oracle replays training, encoding, the
    * LUT, and the candidate cut exactly (recall is pinned separately in
    * OpsSpec; `avg`/libm carry the usual 1-ulp caveat). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 4, codewords: Int = 8, candidates: Int = 0,
             iters: Int = 3, trainFraction: Double = 0.0,
             targetTrain: Long = 100000L,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val cand = if (candidates > 0) candidates else 4 * k
    require(cand >= k, s"candidates=$cand must be >= k=$k")
    require(m >= 1, "m must be positive")
    require(codewords >= 2 && codewords <= literalArgmaxCeiling,
      s"codewords=$codewords outside [2, $literalArgmaxCeiling]")
    val dim = corpus.select(size(col(vecCol)).as("d")).head().getInt(0)
    require(dim % m == 0, s"dim=$dim not divisible by m=$m subspaces")
    val sub = dim / m
    require(trainFraction >= 0.0 && trainFraction <= 1.0,
      "trainFraction in [0,1] (0 = derive from corpus size)")
    val frac =
      if (trainFraction > 0.0) trainFraction
      else deriveTrainFraction(corpus.count(), targetTrain)
    val trainSet =
      if (frac >= 1.0) corpus
      else Sampling.hashSample(corpus, col(idCol), frac)
    val books: IndexedSeq[Array[Array[Double]]] =
      kmeansCentroidsL2Multi(trainSet, m, sub, codewords, iters,
        idCol, vecCol)
    // the m-byte code table — at scale this is the persisted index and
    // the ONLY thing stage 1 scans
    val codes = pqEncode(corpus, books, sub, idCol, vecCol)
    pqAdcRank(codes, books, corpus, queries, k, cand, sub, idCol, vecCol)
  }

  /** Encode vectors to their per-subspace nearest-codeword ids:
    * `(vec_id, __c0 .. __c{m-1})`. */
  private def pqEncode(vectors: DataFrame,
                       books: IndexedSeq[Array[Array[Double]]], sub: Int,
                       idCol: String, vecCol: String): DataFrame = {
    val codeCols = books.indices.map(s =>
      assignCentroidL2(slice(col(vecCol), s * sub + 1, sub), books(s))
        .as(s"__c$s"))
    vectors.select((col(idCol).as("vec_id") +: codeCols): _*)
  }

  /** Shared ADC scoring + rerank over a code table: per-query LUT
    * columns evaluate on the broadcast BUILD side (one
    * codeword-dot array per subspace, lambda-eval'd once per query
    * row), each code row costs `m` lookups and `m-1` adds; the top
    * `cand` by `(approx desc, id)` join full-precision `vectors` for
    * the exact-cosine rerank. */
  private def pqAdcRank(codes: DataFrame,
                        books: IndexedSeq[Array[Array[Double]]],
                        vectors: DataFrame, queries: DataFrame,
                        k: Int, cand: Int, sub: Int,
                        idCol: String, vecCol: String): DataFrame = {
    val lutCols = books.indices.map { s =>
      transform(typedlit(books(s).map(_.toSeq).toSeq),
        cw => VectorExprs.dot(slice(col("qv"), s * sub + 1, sub), cw))
        .as(s"__lut$s")
    }
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id") +: col("qv") +: lutCols: _*))
    val adc = books.indices
      .map(s => element_at(col(s"__lut$s"), col(s"__c$s") + 1))
      .reduce(_ + _)
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("vec_id"))
    val candIds = codes.crossJoin(q.drop("qv"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("approx", adc)
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= cand)
      .select(col("query_id"), col("vec_id"))
    val rerank = candIds
      .join(vectors.select(col(idCol).as("vec_id"), col(vecCol).as("v")),
        Seq("vec_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"))), Seq("query_id"))
      .withColumn("score", cosine(col("v"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    rerank
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("score"), col("rank"))
  }

  /** IVF-PQ (the production billion-scale ANN layout): the coarse
    * quantizer restricts each query's ADC scan to its `nprobe` cells —
    * [[pqTopK]]'s code scan is O(corpus) per query batch; here it is a
    * cid EQUI-JOIN against the probed cells, a partition-pruned scan
    * when the code table is partitioned by cell — and PQ codes score
    * the probed candidates at `m` lookups each before the exact-cosine
    * rerank. Both quantizers train on ONE derived hash sample; probe
    * selection reuses the [[ivfTopKBatch]] map-side forms (ties to the
    * LOWER cid), PQ encode ties to the higher codeword id as always —
    * all of it replayed by the q_embed_ivfpq oracle. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                numCentroids: Int = 8, nprobe: Int = 2, m: Int = 4,
                codewords: Int = 16, candidates: Int = 0, iters: Int = 3,
                trainFraction: Double = 0.0,
                targetTrain: Long = 100000L,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val cand = if (candidates > 0) candidates else 4 * k
    require(cand >= k, s"candidates=$cand must be >= k=$k")
    require(nprobe > 0, "nprobe must be positive")
    require(codewords >= 2 && codewords <= literalArgmaxCeiling,
      s"codewords=$codewords outside [2, $literalArgmaxCeiling]")
    val dim = corpus.select(size(col(vecCol)).as("d")).head().getInt(0)
    require(m >= 1 && dim % m == 0, s"dim=$dim not divisible by m=$m")
    val sub = dim / m
    val frac =
      if (trainFraction > 0.0) trainFraction
      else deriveTrainFraction(corpus.count(), targetTrain)
    val (centroids, bucketed) = ivfQuantize(corpus, numCentroids, iters,
      idCol, vecCol, frac, targetTrain)
    val trainSet =
      if (frac >= 1.0) corpus
      else Sampling.hashSample(corpus, col(idCol), frac)
    val books = kmeansCentroidsL2Multi(trainSet, m, sub, codewords,
      iters, idCol, vecCol)
    // the cell-partitioned code table: (vec_id, cid, __c0..__c{m-1})
    val codeCols = books.indices.map(s =>
      assignCentroidL2(slice(col("v"), s * sub + 1, sub), books(s))
        .as(s"__c$s"))
    val codes = bucketed.select(
      (col("vec_id") +: col("cid") +: codeCols): _*)
    // per-query LUTs once, then the probe-cell explode
    val lutCols = books.indices.map { s =>
      transform(typedlit(books(s).map(_.toSeq).toSeq),
        cw => VectorExprs.dot(slice(col("qv"), s * sub + 1, sub), cw))
        .as(s"__lut$s")
    }
    val withLuts = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id") +: col("qv") +: lutCols: _*)
    val keep = col("query_id") +: books.indices.map(s => col(s"__lut$s"))
    val probed =
      if (centroids.length <= literalArgmaxCeiling) {
        val probeArr = slice(sort_array(array(centroids.zipWithIndex.map {
          case (c, i) =>
            struct((-centroidDot(col("qv"), c)).as("ns"), lit(i).as("cid"))
        }: _*)), 1, math.min(nprobe, centroids.length))
        withLuts.select(keep :+ explode(probeArr).as("p"): _*)
          .select(keep :+ col("p.cid").as("cid"): _*)
      } else
        withLuts.select(keep :+
          explode(VectorExprs.topNDotCids(col("qv"), centroids, nprobe))
            .as("cid"): _*)
    val adc = books.indices
      .map(s => element_at(col(s"__lut$s"), col(s"__c$s") + 1))
      .reduce(_ + _)
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("vec_id"))
    val candIds = codes.join(broadcast(probed), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("approx", adc)
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= cand)
      .select(col("query_id"), col("vec_id"))
    val rerank = candIds
      .join(corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v")),
        Seq("vec_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"))), Seq("query_id"))
      .withColumn("score", cosine(col("v"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    rerank
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("score"), col("rank"))
  }

  /** Build a persisted PQ index at `path`: `path/books` holds the
    * frozen per-subspace codebooks (`(s, cid, vals)` rows — tiny),
    * `path/codes` the `m`-int code per vector. Train cost is
    * [[kmeansCentroidsL2]] per subspace on the derived hash sample;
    * encode is one corpus pass. The index is the thing ANN serving
    * scans — `m` small ints per vector against `4*dim` float bytes. */
  def buildPqIndex(corpus: DataFrame, path: String, m: Int = 4,
                   codewords: Int = 8, iters: Int = 3,
                   trainFraction: Double = 0.0,
                   targetTrain: Long = 100000L,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): Unit = {
    require(m >= 1, "m must be positive")
    require(codewords >= 2 && codewords <= literalArgmaxCeiling,
      s"codewords=$codewords outside [2, $literalArgmaxCeiling]")
    val dim = corpus.select(size(col(vecCol)).as("d")).head().getInt(0)
    require(dim % m == 0, s"dim=$dim not divisible by m=$m subspaces")
    val sub = dim / m
    val frac =
      if (trainFraction > 0.0) trainFraction
      else deriveTrainFraction(corpus.count(), targetTrain)
    val trainSet =
      if (frac >= 1.0) corpus
      else Sampling.hashSample(corpus, col(idCol), frac)
    val books = kmeansCentroidsL2Multi(trainSet, m, sub, codewords,
      iters, idCol, vecCol)
    import corpus.sparkSession.implicits._
    books.zipWithIndex
      .flatMap { case (b, s) =>
        b.zipWithIndex.map { case (c, cid) => (s, cid, c.toSeq) }
      }
      .toDF("s", "cid", "vals")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/books")
    pqEncode(corpus, books, sub, idCol, vecCol)
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Load the frozen codebooks of a persisted PQ index. */
  private def loadPqBooks(spark: org.apache.spark.sql.SparkSession,
                          path: String)
      : IndexedSeq[Array[Array[Double]]] = {
    val rows = spark.read.parquet(s"$path/books")
      .select(col("s"), col("cid"), col("vals")).collect()
    val m = rows.map(_.getInt(0)).max + 1
    (0 until m).map { s =>
      rows.filter(_.getInt(0) == s).sortBy(_.getInt(1))
        .map(_.getSeq[Double](2).toArray)
    }
  }

  /** Append a batch to a persisted PQ index: encode with the FROZEN
    * codebooks (so codes are reproducible regardless of arrival order
    * or batch split) and append to `path/codes`. Codebooks are never
    * silently retrained — retrain is an explicit [[buildPqIndex]]
    * rebuild; measure drift first (e.g. [[prototypicalityPrune]] over
    * new arrivals) and accept that codes stay comparable only within
    * one codebook generation. */
  def appendToPqIndex(batch: DataFrame, path: String,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Unit = {
    val books = loadPqBooks(batch.sparkSession, path)
    val sub = books.head.head.length
    pqEncode(batch, books, sub, idCol, vecCol)
      .write.mode("append").parquet(s"$path/codes")
  }

  /** ANN search over a persisted PQ index: stage 1 scans ONLY
    * `path/codes` (+ the tiny codebooks); `vectors` supplies
    * full-precision rows for the exact-cosine rerank of the top
    * `candidates` — at scale the fat table is touched for
    * `candidates * |queries|` rows, nothing more. Same ADC semantics
    * as [[pqTopK]] (OpsSpec pins equality). */
  def pqSearch(vectors: DataFrame, queries: DataFrame, path: String,
               k: Int, candidates: Int = 0,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val cand = if (candidates > 0) candidates else 4 * k
    require(cand >= k, s"candidates=$cand must be >= k=$k")
    val books = loadPqBooks(vectors.sparkSession, path)
    val sub = books.head.head.length
    val codes = vectors.sparkSession.read.parquet(s"$path/codes")
    pqAdcRank(codes, books, vectors, queries, k, cand, sub, idCol, vecCol)
  }

  /** Two-stage quantized top-k: rank the WHOLE corpus by the int8
    * integer dot product, keep `candidates` per query, exact-cosine
    * rerank only those. At corpus scale the first stage is the memory
    * bill — it reads 1/4 the bytes of a float scan (the int8 codes are
    * the persisted index; full-precision vectors are touched only for
    * the `candidates * |queries|` rerank join) — and the integer dots
    * are branch-free codegen loops.
    *
    * Engine-portable by construction: code products are exact small
    * integers (|q| <= 127, so a 64-dim dot <= ~1e6 — exact in double),
    * and the approximate score is that exact integer times two
    * per-vector scales, two correctly-rounded multiplies in a fixed
    * order. The DuckDB oracle replays stage 1 bit-for-bit, so even the
    * candidate CUT is reproducible — no recall fuzz in the verify, the
    * spec pins recall vs [[bruteForceTopK]] separately.
    *
    * Output: (query_id, vec_id, score, rank) — exact cosine scores,
    * ties on neighbor id, like [[bruteForceTopK]]. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    candidates: Int = 0,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val cand = if (candidates > 0) candidates else 4 * k
    require(cand >= k, s"candidates=$cand must be >= k=$k")
    def codes(df: DataFrame, id: String, pre: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(s"${pre}v"))
        .withColumn(s"${pre}scale", quantScale(col(s"${pre}v")))
        .withColumn(s"${pre}q",
          quantize(col(s"${pre}v"), col(s"${pre}scale")))
        .drop(s"${pre}v")
    val q = broadcast(codes(queries, "query_id", "q"))
    // stage 1: integer dots over the code table only — VectorExprs.Dot
    // on the double-cast codes is exact (products of ints <= 127^2)
    val approx = codes(corpus, "vec_id", "c")
      .crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("idot", VectorExprs.dot(
        col("cq").cast("array<double>"), col("qq").cast("array<double>")))
      .withColumn("approx",
        col("idot") * col("cscale") * col("qscale"))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("vec_id"))
    val candIds = approx
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= cand)
      .select(col("query_id"), col("vec_id"))
    // stage 2: full-precision vectors join in for the candidates only
    val rerank = candIds
      .join(corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v")),
        Seq("vec_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"))), Seq("query_id"))
      .withColumn("score", cosine(col("v"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    rerank
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("score"), col("rank"))
  }

  /** Cell count for [[cosinePairs]]' metric blocking, derived from corpus
    * size: one cell per `targetCellSize` vectors, clamped to [8, 64]
    * (the cap marks where an exact blocked answer stops being economic,
    * not a codegen limit — see the [[cosinePairs]] scaladoc). */
  private[ops] def deriveCells(n: Long, targetCellSize: Long): Int =
    math.min(64L, math.max(8L,
      (n + targetCellSize - 1) / targetCellSize)).toInt

  /** Quantizer-training fraction for [[ivfTopK]], derived from corpus
    * size: the hash-sample fraction that keeps ~`targetTrain` vectors,
    * clamped to 1.0 (small corpora train on everything). Reproducible in
    * any engine: the effective predicate is [[Sampling.hashSample]]'s
    * 4-hex-digit md5 threshold at `floor(targetTrain*65536/n + 0.5)`. */
  private[ops] def deriveTrainFraction(n: Long, targetTrain: Long): Double = {
    require(targetTrain > 0, "targetTrain must be positive")
    if (n <= 0) 1.0 else math.min(1.0, targetTrain.toDouble / n)
  }

  /** SemDeDup-shaped embedding near-dup removal: exact cosine pairs above
    * `threshold` from the metric-blocked [[cosinePairs]] (equi-join shape,
    * never a cartesian), connected components over the pair graph, and one
    * survivor — the smallest id — kept per semantic cluster. Vectors in no
    * qualifying pair pass through untouched. Output: the deduplicated
    * corpus, input schema preserved.
    *
    * Cluster-then-drop (rather than drop-any-paired-row) keeps exactly one
    * representative per *transitive* near-dup set, so chains a-b-c where
    * only adjacent pairs qualify still collapse to one doc — the semantics
    * a dedup stage needs to be idempotent. */
  def semanticDedup(corpus: DataFrame, threshold: Double,
                    numCentroids: Int = 0, iters: Int = 3,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    trainFraction: Double = 0.0): DataFrame = {
    val pairs = cosinePairs(corpus, threshold, numCentroids, iters,
      idCol, vecCol, trainFraction)
    Dedup.keepClusterCanonical(corpus, pairs, idCol)
  }

  /** [[semanticDedup]] with ANN candidates: [[annCosinePairs]] feeds the
    * same cluster-then-drop machinery. Missed pairs (recall < 1) mean
    * extra survivors, never lost documents — the safe failure direction
    * for a dedup stage — and the regime note on [[annCosinePairs]]
    * applies: use at near-dup thresholds (~0.9+). */
  def semanticDedupAnn(corpus: DataFrame, threshold: Double,
                       planes: Int = 8, radius: Int = 2,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val pairs = annCosinePairs(corpus, threshold, planes, radius, idCol, vecCol)
    Dedup.keepClusterCanonical(corpus, pairs, idCol)
  }

  /** Approximate cosine near-dup pairs: LSH signature buckets generate
    * candidates (multi-probe on one side covers all pairs within
    * `radius` signature bits), exact cosine verifies every emitted pair —
    * so precision is 1.0 and only RECALL is approximate. This is the
    * opt-in scale path past [[cosinePairs]]' exactness: candidate volume
    * is bucket-quadratic, not corpus-quadratic, whatever the threshold.
    *
    * Regime note: signature collision probability per plane is
    * `1 - angle/pi`, so LSH candidates are only dense enough for NEAR-DUP
    * thresholds (~0.9+, the dedup use case); at low thresholds (broad
    * similarity mining) recall collapses and [[cosinePairs]]' exact
    * blocking is the right tool. Pairs of identical signature meet once;
    * each emitted pair is verified once (probes are distinct signatures,
    * so a pair can only meet through one probe). */
  /** Incremental SEMANTIC dedup across batches via a persisted LSH
    * signature index — the embedding-modality member of the incremental
    * family ([[graft.ops.Dedup.incrementalExactDedup]] /
    * `incrementalMinhashDedup` / `incrementalSimhashDedup` /
    * [[graft.ops.SpanDedup.incrementalDuplicatedSpans]]). A parquet
    * index at `indexPath` persists `(id, sig, v)` — the
    * random-hyperplane signature plus the vector itself, so cross-batch
    * verification is EXACT cosine (LSH bounds recall only, precision is
    * 1.0; the [[annCosinePairs]] regime note applies: near-dup
    * thresholds ~0.9+). Each batch:
    *
    *   1. drops batch vectors whose multi-probe candidates (Hamming <=
    *      `radius` signature collisions vs the index) verify at
    *      `cosine >= threshold` against ANY indexed vector — keep-one
    *      semantics: history survives, re-arrivals drop;
    *   2. among survivors, runs the same probe-join candidates in-batch
    *      and keeps the min-id representative per component
    *      ([[graft.ops.Dedup.keepClusterCanonical]]);
    *   3. appends the kept `(id, sig, v)` rows (lineage cut before the
    *      self-referential append).
    *
    * Rows with no direction (null / zero-norm vectors) have no
    * signature and pass through unkept-but-returned, like the simhash
    * variant's no-signature rows. The hyperplanes derive from the
    * vector dimension and a FIXED seed, so signatures are comparable
    * across batches and sessions by construction.
    *
    * Scale shape: the index is touched by (a) a signature equi-join
    * semi-pruned map-side by a broadcast of the batch's distinct probe
    * signatures — only actual bucket collisions ever enter an exchange,
    * the batch-bounded discipline of the whole incremental family — and
    * (b) one partitioned append. Index footprint is vector-sized
    * (4 B x dim + 8 B per kept doc): the honest cost of exact verify,
    * same tradeoff as the minhash stored-sh mode; compact alternatives
    * (int8 quantization via [[quantize]]) trade verify exactness. */
  def incrementalSemanticDedup(batch: DataFrame, indexPath: String,
                               threshold: Double,
                               planes: Int = 8, radius: Int = 2,
                               idCol: String = "vec_id",
                               vecCol: String = "embedding",
                               dim: Int = -1): DataFrame = {
    require(threshold > -1.0 && threshold <= 1.0,
      "cosine threshold in (-1, 1]")
    val spark = batch.sparkSession
    Dedup.recoverIndex(indexPath)
    val dProbe =
      if (dim > 0) Array(dim)
      else batch.select(size(col(vecCol)).as("d")).head(1).map(_.getInt(0))
    if (dProbe.isEmpty) return batch // empty micro-batch: nothing to do
    val d = dProbe.head
    val hp = hyperplanes(d, planes)
    // pin the (id, sig, v) triple once: it feeds the cross-batch probe,
    // the in-batch mining, the membership pass, and the index append
    val sigs = batch
      .filter(col(vecCol).isNotNull &&
        VectorExprs.dot(col(vecCol), col(vecCol)) > 0)
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        lshSignature(col(vecCol), hp).as("sig"))
      .pinned()
    val existing: Option[DataFrame] =
      if (graft.core.Fs.exists(indexPath) &&
        graft.core.Fs.listNames(indexPath).nonEmpty) {
        val idx = spark.read.parquet(indexPath)
        require(idx.columns.sorted.toSeq == Seq("id", "sig", "v"),
          s"index at $indexPath is not a semantic (id, sig, v) index " +
            s"(columns ${idx.columns.mkString(", ")}) — one index " +
            "family per path")
        Some(idx)
      } else None
    val probeCol = explode(probeSignatures(col("sig"), planes, radius))
    val dupOfIndex = existing match {
      case None => sigs.select(col("id")).limit(0)
      case Some(idx) =>
        val probes = sigs.select(col("id"), col("v"), probeCol.as("sig"))
        // batch-bounded index touch: broadcast the distinct probe
        // signatures, semi-prune the index scan map-side, THEN join
        val iPruned = idx.select(col("sig"), col("v").as("iv"))
          .join(broadcast(probes.select(col("sig")).distinct()),
            Seq("sig"), "left_semi")
        probes.join(iPruned, Seq("sig"))
          // Generator barrier: one cosine per candidate (see cosinePairs)
          .withColumn("score", explode(array(cosine(col("v"), col("iv")))))
          .filter(col("score") >= threshold)
          .select(col("id")).distinct()
    }
    val fresh = sigs.join(broadcast(dupOfIndex), Seq("id"), "left_anti")
    // in-batch mining: same probe-join candidates, exact cosine, pair
    // met exactly once (probes are distinct signatures vs exact sigs)
    val a = fresh.select(col("id").as("ida"), col("v").as("va"),
      probeCol.as("sig"))
    val b = fresh.select(col("id").as("idb"), col("v").as("vb"), col("sig"))
    val pairs = a.join(b, Seq("sig"))
      .filter(col("ida") < col("idb"))
      .withColumn("score", explode(array(cosine(col("va"), col("vb")))))
      .filter(col("score") >= threshold)
      .select(col("ida").as("id1"), col("idb").as("id2"))
    val keptIdx = Dedup.keepClusterCanonical(
      fresh.select(col("id"), col("sig"), col("v")), pairs, "id")
      .pinned() // cut lineage before the self-referential append
    keptIdx.write.mode("append").parquet(indexPath)
    // ONE membership pass over the caller's frame off checkpointed
    // markers: kept ids survive; rows that never produced a signature
    // (null / zero-norm) pass through
    batch
      .join(sigs.select(col("id").as(idCol), lit(true).as("__sig")),
        Seq(idCol), "left")
      .join(keptIdx.select(col("id").as(idCol), lit(true).as("__kept")),
        Seq(idCol), "left")
      .filter(col("__kept") || col("__sig").isNull)
      .drop("__sig", "__kept")
  }

  def annCosinePairs(corpus: DataFrame, threshold: Double,
                     planes: Int = 8, radius: Int = 1,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     dim: Int = -1): DataFrame = {
    val d =
      if (dim > 0) dim
      else corpus.select(size(col(vecCol)).as("d")).head().getInt(0)
    val hp = hyperplanes(d, planes)
    // zero-norm vectors have no direction: cosine would be 0/0 = NaN,
    // and Spark orders NaN ABOVE every number, so `NaN >= threshold`
    // passes — without this filter a zero vector pairs with everything
    // (cosinePairs applies the same guard, and the ann ⊆ exact contract
    // depends on matching it)
    val sigs = corpus
      .filter(VectorExprs.dot(col(vecCol), col(vecCol)) > 0)
      .select(col(idCol).as("ida"), col(vecCol).as("va"),
        lshSignature(col(vecCol), hp).as("sig"))
    val a = sigs.select(col("ida"), col("va"),
      explode(probeSignatures(col("sig"), planes, radius)).as("sig"))
    val b = sigs.select(col("ida").as("idb"), col("va").as("vb"), col("sig"))
    a.join(b, Seq("sig"))
      .filter(col("ida") < col("idb"))
      // Generator barrier: one cosine evaluation per candidate (the
      // CollapseProject/pushdown trap — see cosinePairs)
      .withColumn("score", explode(array(cosine(col("va"), col("vb")))))
      .filter(col("score") >= threshold)
      .select(col("ida").as("id1"), col("idb").as("id2"), col("score"))
  }
}
