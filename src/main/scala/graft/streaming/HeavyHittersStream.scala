package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.HeavyHitters

/** INCREMENTAL maintenance of a Misra-Gries heavy-hitters summary
  * over a streaming token source — the artifact-lifecycle twin of
  * `q59_heavy_hitters`'s one-shot sketch, completing the
  * build-once / serve-many / maintain-incrementally contract for the
  * frequent-items artifact.
  *
  * Each micro-batch is summarized with the SAME per-partition MG
  * pass as the batch operator (`HeavyHitters.sketch`) and merged
  * into the stored summary under the mergeable-summaries offset
  * rule — so after ANY prefix of batches the stored estimates carry
  * the same deterministic guarantee as a single pass over everything
  * streamed so far:
  *
  *   c(x) − n_total/(k+1)  <=  est(x)  <=  c(x)
  *
  * (merging is associative w.r.t. the bound; pinned in
  * HeavyHittersStreamSpec against whole-prefix truth).
  *
  * State layout under `dir` (versioned rewrite, NOT the dedup
  * index's base+delta LSM: the whole state is <= k counter rows plus
  * one meta row, so rewriting it per trigger is O(k), independent of
  * corpus size):
  * {{{
  *   dir/summary/state_vN   (w, c)     the merged MG counters
  *   dir/meta/state_vN      (n_total)  items streamed through batch N
  * }}}
  * `meta` is written LAST and is the batch's commit point — a
  * replayed batch whose meta version is committed is a no-op, and
  * every read resolves the latest version committed BEFORE the
  * current batch id, so a crash between the two stores heals on
  * retry. Old committed versions are pruned to the previous one.
  */
object HeavyHittersStream {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def committed(spark: SparkSession, store: String): Seq[Long] = {
    val base = new Path(store)
    val f = fs(spark, store)
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("state_v") &&
        f.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("state_v").toLong)
  }

  /** Latest committed (summary, n_total) strictly before `before`
    * (commit point = meta). */
  private def storedBefore(spark: SparkSession, dir: String,
      before: Long): (Map[String, Long], Long) =
    committed(spark, s"$dir/meta").filter(_ < before).maxOption match {
      case None => (Map.empty, 0L)
      case Some(v) =>
        val m = spark.read.parquet(s"$dir/summary/state_v$v")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val n = spark.read.parquet(s"$dir/meta/state_v$v")
          .collect()(0).getLong(0)
        (m, n)
    }

  /** One incremental summary update over `batch`'s `column`. */
  def updateBatch(batch: DataFrame, column: String, dir: String,
      batchId: Long, k: Int): Unit = {
    val spark = batch.sparkSession
    if (fs(spark, dir).exists(
        new Path(s"$dir/meta/state_v$batchId/_SUCCESS")))
      return // replay of a committed batch
    val (prev, prevN) = storedBefore(spark, dir, batchId)
    val prevV = committed(spark, s"$dir/meta").filter(_ < batchId)
      .maxOption
    val (batchSummary, batchN) = HeavyHitters.sketch(batch, column, k)
    val merged = HeavyHitters.merge(
      scala.collection.mutable.HashMap.from(prev),
      scala.collection.mutable.HashMap.from(batchSummary), k)
    import spark.implicits._
    merged.toSeq.sorted.toDF("w", "c").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/summary/state_v$batchId")
    Seq(prevN + batchN).toDF("n_total").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta/state_v$batchId")
    // prune committed versions older than the one this batch read
    val f = fs(spark, dir)
    scala.util.Try {
      for (store <- Seq("summary", "meta");
           v <- committed(spark, s"$dir/$store")
           if v != batchId && prevV.exists(v < _))
        f.delete(new Path(s"$dir/$store/state_v$v"), true)
    }
    ()
  }

  /** The streaming entry point: maintain the summary under `dir`
    * from a streaming frame's string `column`. */
  def summaryStream(src: DataFrame, column: String, dir: String,
      k: Int): DataStreamWriter[Row] =
    src.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), column, dir, batchId, k)
    }

  /** The current (summary, n_total). */
  def current(spark: SparkSession, dir: String): (Map[String, Long], Long) = {
    val s = storedBefore(spark, dir, Long.MaxValue)
    if (s._2 == 0L && s._1.isEmpty &&
        committed(spark, s"$dir/meta").isEmpty)
      throw new IllegalStateException(s"no committed summary under $dir")
    s
  }
}
