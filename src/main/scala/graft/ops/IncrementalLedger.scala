package graft.ops

import graft.core.Fs

/** Applied-batch ledger for the NON-idempotent incremental sketch folds
  * ([[Quantile.incrementalQuantileSketch]], [[Freq
  * .incrementalFreqSketch]] — multiset state, where a re-delivered
  * batch would silently double its weight).
  *
  * The ledger is one underscore-prefixed text file (`_graft_applied`,
  * invisible to the parquet reader) INSIDE the sketch-table directory:
  * the fold writes the updated ledger into the tmp directory alongside
  * the merged parquet BEFORE the two-rename swap, so data and ledger
  * commit in one atomic rename. Crash on either side of the swap
  * leaves a consistent (table, ledger) pair; a foreachBatch replay of a
  * batch whose id is in the ledger is a no-op — exactly-once folds
  * under at-least-once delivery, with no reliance on the streaming
  * checkpoint's commit timing.
  *
  * Ledger size is one line per applied batch — bounded by batch count,
  * not data; read/written driver-side under the fold's writer lock. */
private[ops] object IncrementalLedger {

  private def path(tableDir: String): String = s"$tableDir/_graft_applied"

  /** Batch ids already folded into the table at `tableDir` (empty for
    * a missing table or a pre-ledger table). */
  def appliedIds(tableDir: String): Set[String] = {
    val p = path(tableDir)
    if (!Fs.exists(p)) Set.empty
    else Fs.readString(p).split("\n").iterator
      .map(_.trim).filter(_.nonEmpty).toSet
  }

  // -------------------------------------------------------------- //
  // append-journal variant, for APPEND-shaped indexes (the span-dedup
  // count table) where a per-batch swap-rewrite would turn a bounded
  // append into a corpus-sized rewrite
  // -------------------------------------------------------------- //

  private def journalDir(indexPath: String): String = s"$indexPath.__applied"

  private def enc(id: String): String =
    java.net.URLEncoder.encode(id, "UTF-8")

  /** Batch ids recorded in the side journal of an append-shaped index
    * (one empty marker file per id — bounded by batch count, read as a
    * driver-side listing). UNLIKE the in-directory ledger, the journal
    * is not atomic with the index append: a crash between an append
    * and its record replays that one batch (the bm25 stats-row
    * discipline — the window is one file-create wide); every recorded
    * batch stays dedup'd as long as the journal lives beside the
    * index. */
  def journalIds(indexPath: String): Set[String] = {
    val d = journalDir(indexPath)
    if (!Fs.exists(d)) Set.empty
    else Fs.listNames(d)
      .map(n => java.net.URLDecoder.decode(n, "UTF-8")).toSet
  }

  /** Record `batchId` as applied (call AFTER the index append lands). */
  def journalRecord(indexPath: String, batchId: String): Unit = {
    Fs.mkdirs(journalDir(indexPath))
    Fs.writeString(s"${journalDir(indexPath)}/${enc(batchId)}", "")
  }

  /** Write `applied` + `batchId` as the ledger of the STAGING directory
    * `tmpDir` (called after the merged parquet lands there, before the
    * swap renames it live). An existing ledger is carried forward even
    * on an id-LESS fold — mixing tracked and untracked callers must
    * never drop recorded ids. No-op only when there is nothing to
    * record. */
  def writeInto(tmpDir: String, applied: Set[String],
                batchId: Option[String]): Unit = {
    val ids = applied ++ batchId
    if (ids.nonEmpty)
      Fs.writeString(path(tmpDir), ids.toSeq.sorted.mkString("\n"))
  }
}
