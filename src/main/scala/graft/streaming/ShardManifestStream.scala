package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** INCREMENTAL maintenance of the export shard manifest over a
  * streaming `documents` source — the artifact-lifecycle twin of
  * `llm_shard_manifest` (19th maintainer): an incremental export
  * appends new docs to their (append-stable, md5-assigned) shards,
  * and the manifest a downstream loader validates must stay current
  * without re-scanning the corpus. Every manifest column merges
  * exactly: counts and sums are additive, and the content fingerprint
  * is a bit_xor of per-doc 60-bit md5 integers — xor is associative,
  * commutative, and self-inverse, so state ⊕ delta over disjoint
  * batches equals the one-shot xor over everything streamed so far.
  * Replayed batch ids no-op under the VersionedState commit protocol,
  * so a crashed trigger can never double-xor a doc (which would
  * CANCEL its contribution and report a fingerprint missing it).
  *
  * The per-shard stats derivation is DELEGATED to the query pack
  * (`Llm.shardStats`) — one expression tree, so the maintained
  * manifest equals `llm_shard_manifest`'s batch form over the same
  * prefix by construction (pinned in ShardManifestStreamSpec).
  *
  * State under `dir` (meta written LAST = commit point; after commit,
  * versions strictly OLDER than the one the batch read from are
  * pruned — the crash-window pair {readV, batchId} is kept, the
  * StateSoakSpec `<= 2 versions` bound):
  * {{{
  *   dir/manifest/state_vN  (shard, n_docs, n_tokens, n_chars,
  *                           fingerprint)  — ≤ 16 rows
  *   dir/meta/state_vN      (n_docs)       — docs through batch N
  * }}}
  */
object ShardManifestStream {

  /** One incremental manifest update over `batch`. */
  def updateBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (VersionedState.isCommitted(spark, dir, batchId))
      return // replay of a committed batch
    val prevV = VersionedState.latestBefore(spark, dir, batchId)
    // persist across the two consumers (merge write + meta-total
    // read) — un-materialized, each action re-aggregates the batch
    val delta = graft.queries.Llm.shardStats(batch).persist()
    try {
      val batchDocs = delta
        .agg(coalesce(sum(col("n_docs")), lit(0L))).head.getLong(0)
      val (merged, total) = prevV match {
        case None => (delta, batchDocs)
        case Some(v) =>
          val prevTotal = spark.read
            .parquet(VersionedState.path(dir, "meta", v))
            .head().getLong(0)
          (spark.read.parquet(VersionedState.path(dir, "manifest", v))
            .unionByName(delta)
            .groupBy(col("shard"))
            .agg(sum(col("n_docs")).cast(LongType).as("n_docs"),
              sum(col("n_tokens")).cast(LongType).as("n_tokens"),
              sum(col("n_chars")).cast(LongType).as("n_chars"),
              expr("bit_xor(fingerprint)").as("fingerprint")),
            prevTotal + batchDocs) // additive, never re-derived
      }
      // ≤ 16 rows — a coalesce(1) rewrite per trigger, independent of
      // corpus size; an empty batch contributes no delta rows, the
      // additive AND xor identity
      merged.coalesce(1).write.mode("overwrite")
        .parquet(VersionedState.path(dir, "manifest", batchId))
      import spark.implicits._
      Seq(total).toDF("n_docs").coalesce(1)
        .write.mode("overwrite") // meta LAST = the commit point
        .parquet(VersionedState.path(dir, "meta", batchId))
      VersionedState.prune(spark, dir, Seq("manifest", "meta"),
        batchId, prevV)
    } finally delta.unpersist(false)
  }

  /** The streaming entry point: maintain the manifest under `dir`. */
  def manifestStream(src: DataFrame, dir: String): DataStreamWriter[Row] =
    src.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), dir, batchId)
    }

  /** The served manifest (shard-ordered, the llm_shard_manifest
    * presentation). Throws if nothing is committed. */
  def currentManifest(spark: SparkSession, dir: String): DataFrame = {
    val v = VersionedState.latestBefore(spark, dir, Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no committed manifest under $dir"))
    spark.read.parquet(VersionedState.path(dir, "manifest", v))
      .orderBy(col("shard"))
  }
}
