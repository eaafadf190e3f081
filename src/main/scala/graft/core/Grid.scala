package graft.core

/** Grid/param-space constructors — the reference's signature operators
  * (SURVEY §2.5). These build the *input relation* of a sweep: small,
  * driver-side combinators over `Seq[Map[String, Any]]` with the
  * reference's assertion semantics, plus a `toDF` bridge
  * ([[ValueSchema.toDF]]) for handing the grid to Spark.
  *
  * Kept driver-side deliberately: params enumerate the experiment design
  * (100..10^6 rows), not the data; the heavy relation is the *result*
  * database. Eager full enumeration also preserves the reference's
  * fail-early property (ref manual.md:314-317).
  */
object Grid {

  type Pset = Map[String, Any]

  /** `plist(name, seq)` — a named single-column relation
    * (ref psweep.py:906-913). */
  def plist(name: String, values: Seq[Any]): Seq[Pset] =
    values.map(v => Map(name -> v))

  /** Left-to-right merge of psets; duplicate keys rejected unless allowed
    * (ref psweep.py:916-945). */
  def mergeDicts(dicts: Seq[Pset], allowDupKeys: Boolean = false): Pset = {
    if (!allowDupKeys) {
      val all = dicts.flatMap(_.keys)
      val dups = all.diff(all.distinct)
      require(dups.isEmpty, s"duplicate keys in merge: ${dups.distinct.mkString(", ")}")
    }
    dicts.foldLeft(Map.empty[String, Any])(_ ++ _)
  }

  /** Flatten one "loop position" — either a single plist or a zip of
    * aligned plists — into a list of merged psets
    * (ref psweep.py:948-999 `itr2params`). Input shape per position:
    * `Seq[Seq[Pset]]` where the inner seqs are positionally aligned. */
  def itr2params(loops: Seq[Seq[Seq[Pset]]]): Seq[Pset] =
    loops.map(zipMerge).reduceOption(cross).getOrElse(Seq.empty)

  /** Zip positionally aligned plists into one plist of merged psets;
    * asserts equal lengths (ref psweep.py:995-998). */
  def zipMerge(aligned: Seq[Seq[Pset]]): Seq[Pset] = {
    require(aligned.nonEmpty, "empty zip group")
    val lens = aligned.map(_.size).distinct
    require(lens.size == 1,
      s"zip-linked plists must have equal lengths, got $lens")
    aligned.transpose.map(mergeDicts(_))
  }

  private def cross(a: Seq[Pset], b: Seq[Pset]): Seq[Pset] =
    for (x <- a; y <- b) yield mergeDicts(Seq(x, y))

  /** `pgrid` — cartesian product of plists (or zip groups), flattened and
    * merged; duplicate keys rejected (ref psweep.py:1002-1051). Each
    * argument is either one plist (`Seq[Pset]`) wrapped as a single-element
    * group, or a zip group (`Seq[Seq[Pset]]`). */
  def pgrid(plists: Seq[Pset]*): Seq[Pset] =
    itr2params(plists.map(p => Seq(p)))

  /** `pgrid` with explicit zip groups: `pgridZ(Seq(a, c), Seq(d))` varies
    * a and c together, crossed with d (ref manual.md:255-279). */
  def pgridZ(groups: Seq[Seq[Pset]]*): Seq[Pset] =
    itr2params(groups.toSeq)

  /** `stargrid` — one-at-a-time (star) sampling around a constant center
    * (ref psweep.py:1084-1183): for each vary-plist, cross the center
    * (minus the varied key) with that plist; union all; optionally label
    * each block; dedup repeated centers via the canonical hash. */
  def stargrid(const: Pset, vary: Seq[Seq[Pset]],
               varyLabels: Seq[String] = null,
               varyLabelCol: String = "_vary",
               skipDups: Boolean = true): Seq[Pset] = {
    require(varyLabels == null || varyLabels.size == vary.size,
      "varyLabels must align with vary")
    val blocks = vary.zipWithIndex.flatMap { case (pl, i) =>
      pl.map { p =>
        val base = const -- p.keys
        val labeled =
          if (varyLabels != null) p + (varyLabelCol -> varyLabels(i)) else p
        mergeDicts(Seq(base, labeled))
      }
    }
    if (skipDups) filterParamsUnique(blocks) else blocks
  }

  /** Self-dedup by canonical hash, keeping the FIRST occurrence in input
    * order (ref psweep.py:1054-1065). */
  def filterParamsUnique(params: Seq[Pset]): Seq[Pset] = {
    val seen = scala.collection.mutable.HashSet[String]()
    params.filter(p => seen.add(PsetHash.hash(p)))
  }

  /** Drop psets whose hash is already in `hashes` (the database-dedup
    * anti-join, driver side; ref psweep.py:1068-1081). */
  def filterParamsDupHash(params: Seq[Pset], hashes: Set[String]): Seq[Pset] =
    params.filter(p => !hashes.contains(PsetHash.hash(p)))

  /** Bounds-based logspace with tunable density skew `offset`
    * (ref psweep.py:300-353): generalized logspace where start/stop are the
    * actual bounds (not exponents). `offset` shifts the log transform to
    * tune how strongly points crowd toward `start`. */
  def logspace(start: Double, stop: Double, num: Int,
               offset: Double = 0.0, base: Double = 10.0): Seq[Double] = {
    require(num >= 1, "num >= 1")
    require(start + offset > 0 && stop + offset > 0,
      s"start+offset and stop+offset must be > 0, got ${start + offset}, ${stop + offset}")
    val logb = (x: Double) => math.log(x) / math.log(base)
    val a = logb(start + offset)
    val b = logb(stop + offset)
    linspace(a, b, num).map(e => math.pow(base, e) - offset)
  }

  /** Evenly spaced doubles over [start, stop], inclusive. */
  def linspace(start: Double, stop: Double, num: Int): Seq[Double] = {
    require(num >= 1, "num >= 1")
    if (num == 1) Seq(start)
    else (0 until num).map(i => start + (stop - start) * i / (num - 1))
  }

  /** linspace rounded (half-even, as numpy) to unique sorted ints — may
    * return fewer than `num` (ref psweep.py:356-368 uses `np.unique`,
    * which sorts and dedups). */
  def intspace(start: Double, stop: Double, num: Int): Seq[Long] =
    linspace(start, stop, num).map(x => math.rint(x).toLong).distinct.sorted

  /** Flatten nested-dict keys with a join string
    * (ref psweep.py:130-151): `{a: {b: {c: 1}}} -> {a_b_c: 1}`. */
  def flattenDict(dct: Pset, joinStr: String = "_"): Pset =
    dct.flatMap {
      case (k, m: scala.collection.Map[_, _]) =>
        flattenDict(m.map { case (kk, vv) => kk.toString -> vv }.toMap, joinStr)
          .map { case (kk, vv) => s"$k$joinStr$kk" -> vv }
      case (k, v) => Map(k -> v)
    }
}
