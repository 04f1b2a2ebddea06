package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.DecimalType

/** INCREMENTAL maintenance of the per-(label, idx) embedding moment
  * state behind the class prototypes — the artifact-lifecycle twin of
  * the session label-centroid arrays (nearest-class-mean
  * classification, the embedding-outlier audit, per-class drift
  * monitoring). State rows are (n, Σx) with Σx in EXACT DECIMAL:
  * each float component is cast to DECIMAL(38,18) — a deterministic
  * correctly-rounded narrowing both the batch twin and the maintainer
  * perform identically — so merge is plain addition and the streamed
  * state equals the one-shot batch moments of the whole prefix
  * EXACTLY after every append (the SeasonalProfileStream contract,
  * pinned in LabelCentroidStreamSpec). Centroid components are the
  * read-time division sx/n; a monitor serves prototypes from the
  * maintained state without rescanning the corpus.
  *
  * State layout follows the shared `VersionedState` protocol (meta
  * LAST = commit point; replays no-ops; superseded versions pruned):
  * {{{
  *   dir/moments/state_vN  (label, idx, n, sx)
  *   dir/meta/state_vN     (n_rows, n_observations — the TOTAL count
  *                          of (label, idx) component observations
  *                          folded into the state, i.e. Σn — an audit
  *                          volume figure, not a dimension count)
  * }}}
  * Bounded by |labels| × dim behind a loud cap.
  */
object LabelCentroidStream {

  /** |labels| × dim bound; a store past this is foreign/corrupt. */
  val MaxMomentRows = 1000000L

  /** One-shot batch moments of an embeddings frame (label,
    * embedding): exact-decimal (n, Σx) per (label, idx) — the same
    * narrowing the maintainer merges, so stored and freshly-derived
    * frames union cleanly. */
  def batchMoments(emb: DataFrame): DataFrame =
    emb.select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("idx", "x")))
      .groupBy(col("label"), col("idx").cast("int").as("idx"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(DecimalType(38, 18)))
          .cast(DecimalType(38, 18)).as("sx"))

  private def merged(prev: Option[DataFrame], batch: DataFrame)
      : DataFrame = prev match {
    case None => batch
    case Some(p) =>
      p.unionByName(batch)
        .groupBy(col("label"), col("idx"))
        .agg(sum(col("n")).cast("long").as("n"),
          sum(col("sx")).cast(DecimalType(38, 18)).as("sx"))
  }

  /** One incremental moment update over `batch` (label, embedding
    * rows). */
  def updateBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (VersionedState.isCommitted(spark, dir, batchId))
      return // replay of a committed batch
    val prevV = VersionedState.latestBefore(spark, dir, batchId)
    val prev = prevV.map { v =>
      val df = spark.read.parquet(VersionedState.path(dir, "moments", v))
      val rows = df.count()
      require(rows <= MaxMomentRows,
        s"centroid moment store $dir holds $rows rows, over the " +
          s"$MaxMomentRows |labels|x dim cap — corrupt or foreign " +
          "store; rebuild it")
      df
    }
    val out = merged(prev, batchMoments(batch))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val rows = out.count()
      require(rows <= MaxMomentRows,
        s"merged centroid moments would hold $rows rows, over the " +
          s"$MaxMomentRows cap — the label/dim alphabet is not " +
          "bounded; fix the source")
      val nObservations =
        if (rows == 0L) 0L
        else out.agg(sum(col("n"))).collect()(0).getLong(0)
      out.coalesce(1).write.mode("overwrite")
        .parquet(VersionedState.path(dir, "moments", batchId))
      import spark.implicits._
      Seq((rows, nObservations)).toDF("n_rows", "n_observations")
        .coalesce(1)
        .write.mode("overwrite") // meta LAST = the commit point
        .parquet(VersionedState.path(dir, "meta", batchId))
      VersionedState.prune(spark, dir, Seq("moments", "meta"),
        batchId, prevV)
    } finally out.unpersist()
  }

  /** The streaming entry point: maintain the moments under `dir` from
    * a streaming embeddings frame. */
  def centroidStream(src: DataFrame, dir: String): DataStreamWriter[Row] =
    src.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), dir, batchId)
    }

  /** Latest committed moments (label, idx, n, sx). Throws if nothing
    * is committed. */
  def current(spark: SparkSession, dir: String): DataFrame = {
    val v = VersionedState.latestBefore(spark, dir, Long.MaxValue)
    if (v.isEmpty)
      throw new IllegalStateException(s"no committed moments under $dir")
    spark.read.parquet(VersionedState.path(dir, "moments", v.get))
  }

  /** Centroid components from the maintained state — the read-time
    * division (label, idx, c = sx/n as double). */
  def centroids(spark: SparkSession, dir: String): DataFrame =
    current(spark, dir)
      .select(col("label"), col("idx"),
        (col("sx") / col("n")).cast("double").as("c"))
}
