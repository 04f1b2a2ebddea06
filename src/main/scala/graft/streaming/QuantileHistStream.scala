package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** INCREMENTAL maintenance of the per-(event_type, cents) VALUE
  * HISTOGRAM over a streaming events source — the artifact-lifecycle
  * twin of `q80_mad`'s witness quantiles (21st maintainer), closing
  * the percentile family's build-once/serve-many/maintain-
  * incrementally triad: q39/q76/q80 compute witness quantiles in
  * batch, q52's sketch is the unbounded-domain path, and this state
  * serves the EXACT batch output on every append without a corpus
  * rescan. The state is purely additive (exact integer bucket
  * counts), so the stored histogram after any batch prefix equals a
  * one-shot pass over everything streamed so far, and the served
  * (median_cents_x2, mad_cents_x4) report runs the SAME
  * `Stats.madOfCells` derivation the batch q80 runs — byte-identical
  * by construction, pinned in QuantileHistStreamSpec.
  *
  * Domain bound: buckets live on the 0.01 value grid, so the state is
  * ≤ types × distinct-cents rows — bounded by the VALUE ALPHABET, not
  * the corpus. A deployment with unbounded-domain values switches to
  * the mergeable sketch (q52's path); the loud cap below marks that
  * boundary instead of letting the state grow silently.
  *
  * State under `dir` (VersionedState protocol: meta written LAST =
  * commit point; replays no-op; versions strictly older than the one
  * the batch read are pruned after commit):
  * {{{
  *   dir/hist/state_vN  (event_type, cents, c)
  *   dir/meta/state_vN  (n_rows)
  * }}}
  */
object QuantileHistStream {

  /** Loud domain cap: the histogram state must stay value-alphabet
    * bounded (the 0.01 grid), never corpus-sized. */
  val MaxCells = 10000000L

  /** q80's bucketing — DELEGATED to the query pack so the pair shares
    * one definition by construction. */
  private[streaming] def cells(df: DataFrame): DataFrame =
    graft.queries.Stats.valueCells(df)

  /** One incremental histogram update over `batch`. */
  def updateBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (VersionedState.isCommitted(spark, dir, batchId))
      return // replay of a committed batch
    val prevV = VersionedState.latestBefore(spark, dir, batchId)
    // persist across the two consumers (merge write + meta total) —
    // the ProfileStream lesson
    val delta = cells(batch).persist()
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
            .groupBy(col("event_type"), col("cents"))
            .agg(sum(col("c")).cast(LongType).as("c")),
            prevTotal + batchRows) // additive, never re-derived
      }
      val mergedP = merged.persist()
      try {
        val nCells = mergedP.count()
        require(nCells <= MaxCells,
          s"quantile histogram state $nCells cells exceeds $MaxCells —" +
            " the value domain is not grid-bounded; use the mergeable" +
            " sketch path (q52) instead")
        // grid-bounded cell table — a coalesce(1) rewrite per trigger,
        // independent of corpus size; an empty batch produces no delta
        // rows (the additive identity)
        mergedP.coalesce(1).write.mode("overwrite")
          .parquet(VersionedState.path(dir, "hist", batchId))
      } finally mergedP.unpersist(false)
      import spark.implicits._
      Seq(total).toDF("n_rows").coalesce(1)
        .write.mode("overwrite") // meta LAST = the commit point
        .parquet(VersionedState.path(dir, "meta", batchId))
      VersionedState.prune(spark, dir, Seq("hist", "meta"),
        batchId, prevV)
    } finally delta.unpersist(false)
  }

  /** The streaming entry point: maintain the histogram under `dir`. */
  def quantileStream(src: DataFrame, dir: String): DataStreamWriter[Row] =
    src.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), dir, batchId)
    }

  /** The served robust-dispersion report: the maintained cells through
    * `Stats.madOfCells` — the SAME derivation the batch q80 runs, so
    * serving from state is identical to the batch query over the same
    * prefix BY CONSTRUCTION. Throws if nothing is committed. */
  def currentMad(spark: SparkSession, dir: String): DataFrame = {
    val v = VersionedState.latestBefore(spark, dir, Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no committed quantile histogram under $dir"))
    graft.queries.Stats.madOfCells(
      spark.read.parquet(VersionedState.path(dir, "hist", v)))
  }
}
