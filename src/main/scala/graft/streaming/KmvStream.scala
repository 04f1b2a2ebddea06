package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** INCREMENTAL maintenance of the per-type KMV distinct sketches over
  * a streaming events source — the artifact-lifecycle twin of
  * `q107_kmv_distinct` (23rd maintainer). KMV is a UNION MONOID: the
  * k smallest distinct hashes of A∪B are exactly the k smallest of
  * kmv(A) ∪ kmv(B), so merging the stored sketch with the batch's
  * delta sketch is EXACT — the maintained sketch after any prefix
  * equals the one-shot batch derivation over everything streamed so
  * far, BY CONSTRUCTION: the merge re-runs the very same
  * `Events.kmvOfHashes` aggregation over exploded stored∪delta
  * hashes, and the served report runs `Events.kmvReport` — the same
  * derivations the batch q107 runs (KmvStreamSpec pins per-prefix
  * equality of both the sketch arrays and the report).
  *
  * State is types × k longs — bounded by construction, no cap needed
  * (the sketch IS the bound; contrast the histogram maintainer's
  * value-alphabet cap). Per-batch cost: one bounded aggregation over
  * the batch plus a types×2k merge.
  *
  * State under `dir` (VersionedState protocol: meta written LAST =
  * commit point; replays no-op; stale versions pruned):
  * {{{
  *   dir/kmv/state_vN   (event_type, sk)
  *   dir/meta/state_vN  (n_rows)
  * }}}
  */
object KmvStream {

  /** One incremental sketch update over `batch` (event_type, user_id
    * rows; extra columns ignored). */
  def updateBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (VersionedState.isCommitted(spark, dir, batchId))
      return // replay of a committed batch
    val prevV = VersionedState.latestBefore(spark, dir, batchId)
    val delta = graft.queries.Events.kmvOf(
      batch.select(col("event_type"), col("user_id"))).persist()
    try {
      val batchRows = batch.count()
      val (merged, total) = prevV match {
        case None => (delta, batchRows)
        case Some(v) =>
          val prevTotal = spark.read
            .parquet(VersionedState.path(dir, "meta", v))
            .head().getLong(0)
          val prevSk = spark.read
            .parquet(VersionedState.path(dir, "kmv", v))
          // union monoid: re-aggregate exploded stored ∪ delta hashes
          // through the SAME kmvOfHashes the batch query runs
          (graft.queries.Events.kmvOfHashes(
            prevSk.unionByName(delta)
              .select(col("event_type"),
                explode(col("sk")).as("h"))),
            prevTotal + batchRows) // additive, never re-derived
      }
      // types × k longs — bounded by construction
      merged.coalesce(1).write.mode("overwrite")
        .parquet(VersionedState.path(dir, "kmv", batchId))
      import spark.implicits._
      Seq(total).toDF("n_rows").coalesce(1)
        .write.mode("overwrite") // meta LAST = the commit point
        .parquet(VersionedState.path(dir, "meta", batchId))
      VersionedState.prune(spark, dir, Seq("kmv", "meta"),
        batchId, prevV)
    } finally delta.unpersist(false)
  }

  /** The streaming entry point: maintain the sketches under `dir`. */
  def kmvStream(src: DataFrame, dir: String): DataStreamWriter[Row] =
    src.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), dir, batchId)
    }

  /** The maintained raw sketches: (event_type, sk). */
  def currentSketches(spark: SparkSession, dir: String): DataFrame = {
    val v = VersionedState.latestBefore(spark, dir, Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no committed KMV state under $dir"))
    spark.read.parquet(VersionedState.path(dir, "kmv", v))
  }

  /** The served distinct report — `Events.kmvReport` over the
    * maintained sketches, the SAME derivation the batch q107 runs on
    * its sketch columns (sans the exact-distinct audit leg, which a
    * maintainer must not need). */
  def currentReport(spark: SparkSession, dir: String): DataFrame =
    graft.queries.Events.kmvReport(currentSketches(spark, dir))
      .orderBy(col("event_type"))

  /** The served pairwise-overlap report — `Events.kmvOverlap` over
    * the maintained sketches, the SAME sketch-algebra derivation the
    * batch q108 runs (sans its exact-intersection audit leg). */
  def currentOverlap(spark: SparkSession, dir: String): DataFrame =
    graft.queries.Events.kmvOverlap(currentSketches(spark, dir))
      .orderBy(col("type_a"), col("type_b"))
}
