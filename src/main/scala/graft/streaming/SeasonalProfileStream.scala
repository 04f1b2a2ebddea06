package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.DecimalType

/** INCREMENTAL maintenance of the per-(event type, hour-of-day)
  * seasonal moment profile — the artifact-lifecycle twin of
  * `q87_seasonal_anomaly`'s inline profile. The state rows are
  * (n, Σx, Σx²) with the sums in EXACT DECIMAL, so merge is plain
  * addition and the streamed profile equals the one-shot batch
  * profile of the whole prefix EXACTLY after every append (the
  * CountMinStream contract, pinned in SeasonalProfileStreamSpec) —
  * an anomaly monitor can therefore flag against the maintained
  * profile without ever rescanning history.
  *
  * State layout under `dir` follows the shared `VersionedState`
  * protocol (meta LAST = commit point; replays of a committed batch
  * are no-ops; versions older than the one the batch read are pruned):
  * {{{
  *   dir/profile/state_vN  (event_type, hr, n, sx, sxx)
  *   dir/meta/state_vN     (n_rows, n_events)
  * }}}
  * The profile is bounded by |types| × 24 — behind a loud driver-side
  * cap like every bounded collect in the library.
  */
object SeasonalProfileStream {

  /** Profile rows are a bounded alphabet; a store past this is a
    * foreign/corrupt table masquerading as a profile. */
  val MaxProfileRows = 100000L

  /** One-shot batch profile of an events frame (ts, event_type,
    * value): exact-decimal (n, Σx, Σx²) per (type, hour) — the same
    * derivation q87 runs inline. Sums are pinned to fixed DECIMAL
    * types so stored and freshly-derived frames union cleanly. */
  def batchProfile(events: DataFrame): DataFrame = {
    val x = col("value").cast(DecimalType(18, 2))
    events.groupBy(col("event_type"),
        hour(col("ts")).cast("int").as("hr"))
      .agg(count(lit(1)).as("n"),
        sum(x).cast(DecimalType(38, 2)).as("sx"),
        sum(x * x).cast(DecimalType(38, 4)).as("sxx"))
  }

  private def merged(prev: Option[DataFrame], batch: DataFrame)
      : DataFrame = prev match {
    case None => batch
    case Some(p) =>
      p.unionByName(batch)
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("n")).cast("long").as("n"),
          sum(col("sx")).cast(DecimalType(38, 2)).as("sx"),
          sum(col("sxx")).cast(DecimalType(38, 4)).as("sxx"))
  }

  /** One incremental profile update over `batch` (ts, event_type,
    * value rows). */
  def updateBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (VersionedState.isCommitted(spark, dir, batchId))
      return // replay of a committed batch
    val prevV = VersionedState.latestBefore(spark, dir, batchId)
    val prev = prevV.map { v =>
      val df = spark.read.parquet(VersionedState.path(dir, "profile", v))
      val rows = df.count()
      require(rows <= MaxProfileRows,
        s"seasonal profile store $dir holds $rows rows, over the " +
          s"$MaxProfileRows bounded-alphabet cap — corrupt or foreign " +
          "store; rebuild it")
      df
    }
    val out = merged(prev, batchProfile(batch))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val rows = out.count()
      require(rows <= MaxProfileRows,
        s"merged seasonal profile would hold $rows rows, over the " +
          s"$MaxProfileRows cap — the grouping alphabet is not " +
          "bounded; profile a coarser key")
      val nEvents = // empty prefix: sum over no rows is NULL, not 0
        if (rows == 0L) 0L
        else out.agg(sum(col("n"))).collect()(0).getLong(0)
      out.coalesce(1).write.mode("overwrite")
        .parquet(VersionedState.path(dir, "profile", batchId))
      import spark.implicits._
      Seq((rows, nEvents)).toDF("n_rows", "n_events").coalesce(1)
        .write.mode("overwrite") // meta LAST = the commit point
        .parquet(VersionedState.path(dir, "meta", batchId))
      VersionedState.prune(spark, dir, Seq("profile", "meta"),
        batchId, prevV)
    } finally out.unpersist()
  }

  /** The streaming entry point: maintain the profile under `dir` from
    * a streaming events frame. */
  def profileStream(src: DataFrame, dir: String): DataStreamWriter[Row] =
    src.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), dir, batchId)
    }

  /** Latest committed profile (event_type, hr, n, sx, sxx). Throws if
    * nothing is committed. */
  def current(spark: SparkSession, dir: String): DataFrame = {
    val v = VersionedState.latestBefore(spark, dir, Long.MaxValue)
    if (v.isEmpty)
      throw new IllegalStateException(s"no committed profile under $dir")
    spark.read.parquet(VersionedState.path(dir, "profile", v.get))
  }
}
