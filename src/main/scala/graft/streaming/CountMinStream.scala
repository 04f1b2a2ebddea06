package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.CountMin

/** INCREMENTAL maintenance of a count-min sketch over a streaming
  * token source — the artifact-lifecycle twin of `q63_count_min`'s
  * one-shot sketch, and the EXACT counterpart of HeavyHittersStream:
  * CMS merge is elementwise SUM, so after any prefix of batches the
  * stored sketch is BIT-IDENTICAL to a single batch pass over
  * everything streamed so far — not merely bound-preserving
  * (pinned in CountMinStreamSpec against whole-prefix truth).
  *
  * State layout under `dir` mirrors HeavyHittersStream (versioned
  * O(depth*width) rewrite per trigger, independent of corpus size;
  * `meta` written LAST = the batch's commit point, so replays of a
  * committed batch are no-ops and a crash between the two stores
  * heals on retry; committed versions older than the one the batch
  * read are pruned):
  * {{{
  *   dir/sketch/state_vN  (i, c)      flattened nonzero counters
  *   dir/meta/state_vN    (depth, n)  shape + items through batch N
  * }}}
  */
object CountMinStream {

  /** Latest committed (sketch, n) at version `v` (None = empty). */
  private def stored(spark: SparkSession, dir: String,
      v: Option[Long], depth: Int): (Array[Long], Long) = v match {
    case None => (new Array[Long](depth * CountMin.Width), 0L)
    case Some(v) =>
      val meta = spark.read
        .parquet(VersionedState.path(dir, "meta", v)).collect()(0)
      require(meta.getInt(0) == depth,
        s"stored sketch depth ${meta.getInt(0)} != requested $depth")
      val m = new Array[Long](depth * CountMin.Width)
      val sdf = spark.read.parquet(VersionedState.path(dir, "sketch", v))
      // bound check BEFORE the collect: a store with more nonzero
      // counters than the d×w matrix has cells is corrupt or foreign
      // and must fail fast with a message, not OOM the driver
      // (VERDICT r5 #6)
      val cnt = sdf.count()
      require(cnt <= m.length,
        s"count-min store $dir holds $cnt counters, over the " +
          s"$depth x ${CountMin.Width} = ${m.length} matrix — " +
          "corrupt or foreign store; rebuild it")
      sdf.collect().foreach { r =>
        val i = r.getInt(0)
        require(i >= 0 && i < m.length,
          s"count-min store $dir counter index $i outside the " +
            s"$depth x ${CountMin.Width} matrix — corrupt or foreign " +
            "store; rebuild it")
        m(i) = r.getLong(1)
      }
      (m, meta.getLong(1))
  }

  /** One incremental sketch update over `batch`'s `column`. */
  def updateBatch(batch: DataFrame, column: String, dir: String,
      batchId: Long, depth: Int): Unit = {
    val spark = batch.sparkSession
    if (VersionedState.isCommitted(spark, dir, batchId))
      return // replay of a committed batch
    val prevV = VersionedState.latestBefore(spark, dir, batchId)
    val (prev, prevN) = stored(spark, dir, prevV, depth)
    val (batchSketch, batchN) = CountMin.sketch(batch, column, depth)
    val merged = CountMin.merge(prev, batchSketch)
    import spark.implicits._
    merged.toSeq.zipWithIndex.collect { case (c, i) if c > 0L => (i, c) }
      .toDF("i", "c").coalesce(1).write.mode("overwrite")
      .parquet(VersionedState.path(dir, "sketch", batchId))
    Seq((depth, prevN + batchN)).toDF("depth", "n").coalesce(1)
      .write.mode("overwrite") // meta LAST = the commit point
      .parquet(VersionedState.path(dir, "meta", batchId))
    VersionedState.prune(spark, dir, Seq("sketch", "meta"),
      batchId, prevV)
  }

  /** The streaming entry point: maintain the sketch under `dir` from
    * a streaming frame's string `column`. */
  def sketchStream(src: DataFrame, column: String, dir: String,
      depth: Int): DataStreamWriter[Row] =
    src.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), column, dir, batchId, depth)
    }

  /** The current (sketch, n). Throws if nothing is committed. */
  def current(spark: SparkSession, dir: String, depth: Int)
      : (Array[Long], Long) = {
    val v = VersionedState.latestBefore(spark, dir, Long.MaxValue)
    if (v.isEmpty)
      throw new IllegalStateException(s"no committed sketch under $dir")
    stored(spark, dir, v, depth)
  }
}
