package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** INCREMENTAL maintenance of the per-(source, n_chars-bucket)
  * histogram over a streaming `documents` source — the
  * artifact-lifecycle twin of `q104_psi` (18th maintainer): a 100 TB
  * pipeline cannot re-scan the corpus to refresh its drift gate on
  * every ingest batch. The state is PURELY ADDITIVE (exact integer
  * cell counts), so the stored histogram after any batch prefix
  * equals a one-shot pass over everything streamed so far, and the
  * served PSI report is byte-identical to running q104's batch form
  * on the same prefix (pinned in HistStreamSpec).
  *
  * Buckets are q104's: least(floor(n_chars/500), 9), null n_chars
  * rows excluded. State under `dir` (VersionedState protocol: meta
  * written LAST = commit point; replays no-op; after commit, versions
  * strictly OLDER than the one the batch read from are pruned — the
  * crash-window pair {readV, batchId} is kept):
  * {{{
  *   dir/hist/state_vN  (source, b, c)   — ≤ sources × 10 rows
  *   dir/meta/state_vN  (n_rows)         — rows through batch N
  * }}}
  */
object HistStream {

  /** q104's bucketing — DELEGATED to the query pack so the pair
    * shares one definition by construction. */
  private[streaming] def bucketed(df: DataFrame): DataFrame =
    graft.queries.Profiling.bucketCells(df)

  /** One incremental histogram update over `batch`. */
  def updateBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (VersionedState.isCommitted(spark, dir, batchId))
      return // replay of a committed batch
    val prevV = VersionedState.latestBefore(spark, dir, batchId)
    // persist the batch's cells across the two consumers (the merge
    // write and the meta-total read): without it each action would
    // re-aggregate the whole batch (the ProfileStream lesson)
    val delta = bucketed(batch).persist()
    try {
      val batchRows = delta
        .agg(coalesce(sum(col("c")), lit(0L))).head.getLong(0)
      val (merged, total) = prevV match {
        case None => (delta, batchRows)
        case Some(v) =>
          val prevTotal = spark.read
            .parquet(VersionedState.path(dir, "meta", v))
            .head().getLong(0)
          (spark.read.parquet(VersionedState.path(dir, "hist", v))
            .unionByName(delta)
            .groupBy(col("source"), col("b"))
            .agg(sum(col("c")).cast(LongType).as("c")),
            prevTotal + batchRows) // additive, never re-derived
      }
      // cell table is ≤ sources × 10 rows — a coalesce(1) rewrite per
      // trigger, independent of corpus size (the ProfileStream bound);
      // counts over an empty batch produce no delta rows, which is the
      // additive identity (nothing to coalesce — unlike sums, an
      // absent cell IS zero)
      merged.coalesce(1).write.mode("overwrite")
        .parquet(VersionedState.path(dir, "hist", batchId))
      import spark.implicits._
      Seq(total).toDF("n_rows").coalesce(1)
        .write.mode("overwrite") // meta LAST = the commit point
        .parquet(VersionedState.path(dir, "meta", batchId))
      VersionedState.prune(spark, dir, Seq("hist", "meta"),
        batchId, prevV)
    } finally delta.unpersist(false)
  }

  /** The streaming entry point: maintain the histogram under `dir`. */
  def histStream(src: DataFrame, dir: String): DataStreamWriter[Row] =
    src.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), dir, batchId)
    }

  /** The served drift report: the maintained cells through
    * `Profiling.psiOfCells` — the SAME expression tree q104 runs, so
    * serving from state is identical to the batch query over the same
    * prefix BY CONSTRUCTION, not by two hand-synchronized copies.
    * Throws if nothing is committed. */
  def currentPsi(spark: SparkSession, dir: String): DataFrame = {
    val v = VersionedState.latestBefore(spark, dir, Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no committed histogram under $dir"))
    graft.queries.Profiling.psiOfCells(
      spark.read.parquet(VersionedState.path(dir, "hist", v)))
  }
}
