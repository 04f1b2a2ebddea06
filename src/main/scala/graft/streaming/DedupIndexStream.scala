package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.queries.Llm

/** INCREMENTAL maintenance of the verified near-dup pair index
  * (`Llm.lshVerifiedPairs`'s streaming twin — the artifact-lifecycle
  * complement of `DocumentStream.termStatsStream`).
  *
  * A curation deployment builds the dedup index once per corpus
  * snapshot; this operator keeps it current as the corpus APPENDS:
  * each micro-batch's new documents are MinHash-banded (the same 32×2
  * banding expressions as the batch build, shared via
  * `Llm.bandedSignatures`), candidate pairs come from the new docs'
  * bands joined against the STORED band index plus the within-batch
  * self-join, and candidates are exact-verified against the stored
  * shingle-array frame — so each batch's work is
  * O(new docs × band collisions), never a corpus rescan.
  *
  * Decomposition argument (parity pinned in DedupIndexStreamSpec): a
  * pair's band collisions depend only on the two docs' signatures, and
  * every pair has a unique later-arriving member — so
  * (new × stored) ∪ (new × new) across batches enumerates exactly the
  * batch build's self-join candidates, and the verified pair set after
  * any prefix of batches equals `lshVerifiedPairsFor` over the
  * documents streamed so far.
  *
  * State layout under `dir` — base + append-only deltas (the LSM
  * shape), one store per frame:
  * {{{
  *   dir/bands/delta_vN   (doc_id, band_idx, band_hash)  batch N only
  *   dir/docs/delta_vN    (doc_id, shh)                  batch N only
  *   dir/pairs/delta_vN   (a_id, b_id, jaccard)          batch N only
  *   dir/&lt;store&gt;/base_vM  all state through batch M (compaction)
  * }}}
  * Each batch WRITES ONLY ITS OWN DELTA — per-trigger I/O is O(new
  * docs), not O(index) (a cumulative-rewrite layout degenerates to
  * rewriting the whole index every trigger at corpus scale). The
  * stored view of a store is `base_vM ∪ {delta_vN : N > M, N
  * committed}`. A batch is committed iff `pairs/delta_vN/_SUCCESS`
  * exists — pairs is written LAST and is the commit point; bands/docs
  * deltas of a crashed batch are invisible (their batch id is not
  * committed) and are simply overwritten on retry. A replayed batch
  * whose pairs delta is committed is a no-op.
  *
  * `compact()` folds every committed delta (and the prior base) into a
  * new `base_vM`, committed by the pairs base, then deletes what it
  * covered — run it on whatever cadence bounds the delta count (the
  * read path unions one frame per uncompacted batch; at 100 TB the
  * base would additionally be bucketed by doc_id so the per-batch
  * verify join prunes to colliding buckets).
  *
  * Idempotent ingest: a doc_id already in the stored feature frame is
  * anti-joined away, so re-delivered documents are no-ops (docs
  * shorter than the 3-token shingling minimum produce no features or
  * bands and are trivially idempotent).
  */
object DedupIndexStream {

  // the LSM listing/commit/compaction mechanics live in DeltaStore
  // (shared with WinnowIndexStream); "pairs" is the commit store
  private val Commit = "pairs"
  private val Subs = Seq("bands", "docs", "pairs")

  private def stored(spark: SparkSession, dir: String, sub: String,
      before: Long): Option[DataFrame] =
    DeltaStore.stored(spark, dir, sub, Commit, before)

  /** One incremental index update (factored out so replay/crash
    * semantics are unit-testable without a streaming query).
    * `autoCompactEvery` > 0 folds the delta chain into a base once
    * that many uncompacted batches accumulate — the streaming entry
    * defaults it on so a long-lived stream's read fan-in stays
    * bounded. */
  def updateBatch(batch: DataFrame, dir: String, batchId: Long,
      autoCompactEvery: Int = 0): Unit = {
    val spark = batch.sparkSession
    if (DeltaStore.isCommitted(spark, dir, Commit, batchId))
      return // replay of a committed batch: done
    val prevBands = stored(spark, dir, "bands", batchId)
    val prevDocs = stored(spark, dir, "docs", batchId)

    val incoming = batch.select(col("doc_id"), col("text"))
      .dropDuplicates("doc_id")
    val newDocs = prevDocs match {
      case Some(p) => incoming.join(p.select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      case None => incoming
    }
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val newBands = Llm.bandedSignatures(newDocs).persist(lvl)
    val newFeats = Llm.shingleArrays(newDocs).persist(lvl)
    try {
      // candidates: new docs vs the stored index + within this batch.
      // Within-batch keeps the batch build's x<y orientation; the
      // cross-generation join orients by (least, greatest).
      val candNew = newBands.as("x")
        .join(newBands.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
            col("x.band_hash") === col("y.band_hash") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      val candCross = prevBands match {
        case Some(pb) => newBands.as("n")
          .join(pb.as("p"),
            col("n.band_idx") === col("p.band_idx") &&
              col("n.band_hash") === col("p.band_hash"))
          .select(
            least(col("n.doc_id"), col("p.doc_id")).as("a_id"),
            greatest(col("n.doc_id"), col("p.doc_id")).as("b_id"))
        case None => candNew.limit(0)
      }
      val cand = candNew.unionAll(candCross).distinct()
      val allFeats = prevDocs match {
        case Some(p) => p.unionAll(newFeats)
        case None => newFeats
      }
      val newPairs = Llm.verifiedFromCandidates(cand, allFeats)

      // deltas only — O(new docs) written; pairs LAST = commit point
      newBands.write.mode("overwrite")
        .parquet(s"$dir/bands/delta_v$batchId")
      newFeats.write.mode("overwrite")
        .parquet(s"$dir/docs/delta_v$batchId")
      newPairs.write.mode("overwrite")
        .parquet(s"$dir/pairs/delta_v$batchId")
    } finally {
      newBands.unpersist(); newFeats.unpersist(); ()
    }
    DeltaStore.autoCompact(spark, dir, Subs, Commit, autoCompactEvery)
  }

  /** Fold the committed base + deltas of every store into one new
    * `base_vM` (M = newest committed batch) and delete what it
    * covered. Crash-safe by the same convention as the batch path:
    * the pairs base commits the compaction; a crash before it leaves
    * the delta view authoritative, and the covered-dir cleanup is
    * best-effort (re-running compact() finishes it). */
  def compact(spark: SparkSession, dir: String): Unit =
    DeltaStore.compact(spark, dir, Subs, Commit)

  /** The streaming entry point: maintain the index under `dir` from a
    * streaming `documents` frame, auto-compacting every
    * `autoCompactEvery` batches. */
  def indexStream(docs: DataFrame, dir: String,
      autoCompactEvery: Int = 64): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), dir, batchId, autoCompactEvery)
    }

  /** The current verified pair set (base + committed deltas). */
  def currentPairs(spark: SparkSession, dir: String): DataFrame =
    stored(spark, dir, "pairs", Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no committed index under $dir"))
}
