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
  * written LAST = commit point; replays no-op; the version the batch
  * read from is pruned after commit):
  * {{{
  *   dir/hist/state_vN  (source, b, c)   — ≤ sources × 10 rows
  *   dir/meta/state_vN  (n_rows)         — rows through batch N
  * }}}
  */
object HistStream {

  /** q104's bucketing, the single shared definition for this pair. */
  private[streaming] def bucketed(df: DataFrame): DataFrame =
    df.filter(col("n_chars").isNotNull)
      .groupBy(col("source"),
        least(floor(col("n_chars") / 500), lit(9L)).cast(LongType)
          .as("b"))
      .agg(count(lit(1)).cast(LongType).as("c"))

  /** One incremental histogram update over `batch`. */
  def updateBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (VersionedState.isCommitted(spark, dir, batchId))
      return // replay of a committed batch
    val prevV = VersionedState.latestBefore(spark, dir, batchId)
    val delta = bucketed(batch)
    val merged = prevV match {
      case None => delta
      case Some(v) =>
        spark.read.parquet(VersionedState.path(dir, "hist", v))
          .unionByName(delta)
          .groupBy(col("source"), col("b"))
          .agg(sum(col("c")).cast(LongType).as("c"))
    }
    // cell table is ≤ sources × 10 rows — a coalesce(1) rewrite per
    // trigger, independent of corpus size (the ProfileStream bound);
    // counts over an empty batch produce no delta rows, which is the
    // additive identity (nothing to coalesce — unlike sums, an absent
    // cell IS zero)
    merged.coalesce(1).write.mode("overwrite")
      .parquet(VersionedState.path(dir, "hist", batchId))
    import spark.implicits._
    val total = merged.agg(coalesce(sum(col("c")), lit(0L))).head.getLong(0)
    Seq(total).toDF("n_rows").coalesce(1)
      .write.mode("overwrite") // meta LAST = the commit point
      .parquet(VersionedState.path(dir, "meta", batchId))
    VersionedState.prune(spark, dir, Seq("hist", "meta"),
      batchId, prevV)
  }

  /** The streaming entry point: maintain the histogram under `dir`. */
  def histStream(src: DataFrame, dir: String): DataStreamWriter[Row] =
    src.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), dir, batchId)
    }

  /** The served drift report: q104's PSI per source, computed from
    * the maintained cells with q104's EXACT expression tree
    * (contributions DECIMAL(20,10)-cast before the per-source sum),
    * so serving from state hashes identically to the batch query over
    * the same prefix. Throws if nothing is committed. */
  def currentPsi(spark: SparkSession, dir: String): DataFrame = {
    val v = VersionedState.latestBefore(spark, dir, Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no committed histogram under $dir"))
    val cell = spark.read.parquet(VersionedState.path(dir, "hist", v))
    val srcTot = cell.groupBy(col("source"))
      .agg(sum(col("c")).cast(LongType).as("n_src"))
    val blend = cell.groupBy(col("b"))
      .agg(sum(col("c")).cast(LongType).as("cb"))
    val tot = cell.agg(sum(col("c")).cast(LongType).as("n_all"))
    val p = col("c").cast(DoubleType) / col("n_src").cast(DoubleType)
    val q = col("cb").cast(DoubleType) / col("n_all").cast(DoubleType)
    cell
      .join(broadcast(srcTot), "source")
      .join(broadcast(blend), "b")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_src"),
        ((p - q) * log(p / q)).cast(DecimalType(20, 10)).as("contrib"))
      .groupBy(col("source"))
      .agg(max(col("n_src")).as("n_docs"),
        round(sum(col("contrib")).cast(DoubleType), 6).as("psi"))
      .orderBy(col("source"))
  }
}
