package graft.streaming

import org.apache.hadoop.fs.Path
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
  * State layout under `dir` (the `foreachBatchRunningAgg` versioned
  * convention, one store per frame):
  * {{{
  *   dir/bands/state_vN   (doc_id, band_idx, band_hash)
  *   dir/docs/state_vN    (doc_id, shh)        — verify features
  *   dir/pairs/state_vN   (a_id, b_id, jaccard)
  * }}}
  * Each store's `state_vN` carries Spark's `_SUCCESS`; `pairs` is
  * written LAST and is the batch's commit point — a replayed batch
  * whose pairs version is committed is a no-op, and a crash between
  * stores is healed on retry because every read resolves the latest
  * version committed BEFORE the current batch id. Old committed
  * versions are pruned to the previous one, as in
  * `Sources.mergeBatch`.
  *
  * Idempotent ingest: a doc_id already in the stored feature frame is
  * anti-joined away, so re-delivered documents are no-ops (docs
  * shorter than the 3-token shingling minimum produce no features or
  * bands and are trivially idempotent).
  */
object DedupIndexStream {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def committedVersions(spark: SparkSession,
      store: String): Seq[Long] = {
    val base = new Path(store)
    val f = fs(spark, store)
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("state_v") &&
        f.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("state_v").toLong)
  }

  /** Latest (version, frame) committed strictly before `before` —
    * retries of a half-committed batch must not read their own
    * partial output. */
  private def latestBefore(spark: SparkSession, store: String,
      before: Long): Option[(Long, DataFrame)] =
    committedVersions(spark, store).filter(_ < before) match {
      case Seq() => None
      case vs => Some((vs.max,
        spark.read.parquet(s"$store/state_v${vs.max}")))
    }

  /** Write version `batchId`, then prune committed versions older
    * than `keepFloor` — the version this batch actually READ (still
    * lazily referenced by in-flight plans until every store of the
    * batch is written, so it must survive the whole batch even when
    * batch ids are not consecutive). */
  private def writeState(df: DataFrame, store: String,
      batchId: Long, keepFloor: Long): Unit = {
    df.write.mode("overwrite").parquet(s"$store/state_v$batchId")
    val f = fs(df.sparkSession, store)
    scala.util.Try {
      committedVersions(df.sparkSession, store)
        .filter(v => v < keepFloor && v != batchId)
        .foreach(v => f.delete(new Path(s"$store/state_v$v"), true))
    }
    ()
  }

  /** One incremental index update (factored out so replay/crash
    * semantics are unit-testable without a streaming query). */
  def updateBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (fs(spark, dir).exists(
        new Path(s"$dir/pairs/state_v$batchId/_SUCCESS")))
      return // replay of a committed batch: done
    val prevBandsV = latestBefore(spark, s"$dir/bands", batchId)
    val prevDocsV = latestBefore(spark, s"$dir/docs", batchId)
    val prevPairsV = latestBefore(spark, s"$dir/pairs", batchId)
    val prevBands = prevBandsV.map(_._2)
    val prevDocs = prevDocsV.map(_._2)
    val prevPairs = prevPairsV.map(_._2)

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

      // cumulative state; pairs LAST = commit point. Each store keeps
      // the version this batch read (later stores' plans still
      // reference it) — with consecutive streaming batch ids this is
      // exactly the mergeBatch keep-one-predecessor policy.
      writeState(prevBands.fold(newBands)(_ unionAll newBands),
        s"$dir/bands", batchId,
        keepFloor = prevBandsV.fold(batchId)(_._1))
      writeState(allFeats, s"$dir/docs", batchId,
        keepFloor = prevDocsV.fold(batchId)(_._1))
      writeState(prevPairs.fold(newPairs)(_ unionAll newPairs),
        s"$dir/pairs", batchId,
        keepFloor = prevPairsV.fold(batchId)(_._1))
    } finally {
      newBands.unpersist(); newFeats.unpersist(); ()
    }
  }

  /** The streaming entry point: maintain the index under `dir` from a
    * streaming `documents` frame. */
  def indexStream(docs: DataFrame, dir: String): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), dir, batchId)
    }

  /** The current verified pair set (latest committed pairs version). */
  def currentPairs(spark: SparkSession, dir: String): DataFrame =
    latestBefore(spark, s"$dir/pairs", Long.MaxValue)
      .map(_._2)
      .getOrElse(throw new IllegalStateException(
        s"no committed index under $dir"))
}
