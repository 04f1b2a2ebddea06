package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** INCREMENTAL maintenance of a per-column table profile over a
  * streaming `documents` source — the artifact-lifecycle twin of
  * `q98_profile`'s one-shot report, closing the same batch/stream pair
  * the other maintainers close (CountMinStream ↔ q63, TermStats ↔
  * tf-idf, …): a 100 TB pipeline cannot re-scan the corpus to refresh
  * its profile on every append.
  *
  * Every maintained statistic is a MERGEABLE summary, so the stored
  * profile after any batch prefix equals a one-shot pass over
  * everything streamed so far (pinned in ProfileStreamSpec):
  *   - row/null counts and numeric sums: additive (sums ride
  *     DECIMAL(38,0) — exact at any corpus size);
  *   - min/max: monotone lattice merge;
  *   - distinct counts: DataSketches HLL sketches (`hll_sketch_agg`),
  *     merged with `hll_union_agg` — register max-merge is
  *     commutative/associative, so the union over batches carries the
  *     same state as one sketch over the union of batches (same lgK,
  *     same target type), and the served estimate is prefix-invariant.
  *     This is the q98 trade at scale: q98's exact multi-distinct is
  *     one Expand pass over a static table; a maintainer that kept
  *     exact distinct sets would hold O(cardinality) state per column,
  *     so the stream path stores O(2^lgK) registers instead.
  *
  * State layout under `dir` (VersionedState protocol: meta written
  * LAST = commit point; replays no-op; versions the batch read from
  * are pruned after commit):
  * {{{
  *   dir/profile/state_vN  (col_name, n_nulls, min_num, max_num,
  *                          sum_num, min_str, max_str, sk)
  *   dir/meta/state_vN     (n_rows)   rows through batch N
  * }}}
  */
object ProfileStream {

  private val LgK = 14

  /** (name, isNumeric) — the documents columns the profile covers.
    * Numeric columns carry min/max/sum + sketch; strings carry
    * lexicographic min/max + sketch. */
  val Columns: Seq[(String, Boolean)] = Seq(
    "doc_id" -> true, "n_chars" -> true,
    "lang" -> false, "source" -> false)

  private val d38 = DecimalType(38, 0)

  /** Per-column mergeable profile rows of ONE frame: a single
    * aggregate pass (nulls, min/max, sums, HLL sketch per column)
    * exploded into one row per column — the q98 shape, with the exact
    * distinct replaced by the sketch. */
  private[streaming] def profileRows(df: DataFrame): DataFrame = {
    val aggs: Seq[org.apache.spark.sql.Column] =
      Seq(count(lit(1)).as("n_rows")) ++ Columns.flatMap { case (c, num) =>
        Seq(
          // coalesce: sum() over an EMPTY batch is NULL, but a null
          // COUNT must commit as 0 — an empty batch 0 would otherwise
          // write NULL counts into version 0 of the state (min/max/
          // sum_num stay NULL: they are the lattice/additive
          // identities sum()/min()/max() already skip on merge)
          coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
            .as(s"${c}_nulls"),
          hll_sketch_agg(col(c), lit(LgK)).as(s"${c}_sk")) ++
          (if (num) Seq(
            min(col(c)).cast(LongType).as(s"${c}_min"),
            max(col(c)).cast(LongType).as(s"${c}_max"),
            sum(col(c).cast(d38)).as(s"${c}_sum"))
          else Seq(
            min(col(c)).as(s"${c}_smin"), max(col(c)).as(s"${c}_smax")))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = Columns.map { case (c, num) =>
      struct(lit(c).as("col_name"),
        col(s"${c}_nulls").as("n_nulls"),
        (if (num) col(s"${c}_min") else lit(null).cast(LongType))
          .as("min_num"),
        (if (num) col(s"${c}_max") else lit(null).cast(LongType))
          .as("max_num"),
        (if (num) col(s"${c}_sum") else lit(null).cast(d38))
          .as("sum_num"),
        (if (num) lit(null).cast(StringType) else col(s"${c}_smin"))
          .as("min_str"),
        (if (num) lit(null).cast(StringType) else col(s"${c}_smax"))
          .as("max_str"),
        col(s"${c}_sk").as("sk"))
    }
    one.select(col("n_rows"), explode(array(rows: _*)).as("r"))
      .select(col("n_rows"), col("r.*"))
  }

  /** Merge two profile frames (same schema as [[profileRows]] minus
    * n_rows): counts add, min/max lattice-merge, sketches union. */
  private def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("col_name"))
      .agg(sum(col("n_nulls")).cast(LongType).as("n_nulls"),
        min(col("min_num")).as("min_num"),
        max(col("max_num")).as("max_num"),
        sum(col("sum_num")).cast(d38).as("sum_num"),
        min(col("min_str")).as("min_str"),
        max(col("max_str")).as("max_str"),
        hll_union_agg(col("sk"), lit(false)).as("sk"))

  /** One incremental profile update over `batch`. */
  def updateBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (VersionedState.isCommitted(spark, dir, batchId))
      return // replay of a committed batch
    val prevV = VersionedState.latestBefore(spark, dir, batchId)
    // persist across the two actions (the n_rows read and the state
    // write): without it the head() and the parquet write would each
    // re-aggregate the whole batch — two full scans per trigger
    val batchProfile = profileRows(batch).persist()
    try {
      updateFrom(spark, batchProfile, dir, batchId, prevV)
    } finally batchProfile.unpersist(false)
  }

  private def updateFrom(spark: SparkSession, batchProfile: DataFrame,
      dir: String, batchId: Long, prevV: Option[Long]): Unit = {
    val batchRows = batchProfile.select("n_rows").head().getLong(0)
    val delta = batchProfile.drop("n_rows")
    val (mergedProfile, totalRows) = prevV match {
      case None => (delta, batchRows)
      case Some(v) =>
        val prev = spark.read
          .parquet(VersionedState.path(dir, "profile", v))
        val prevRows = spark.read
          .parquet(VersionedState.path(dir, "meta", v))
          .head().getLong(0)
        (merge(prev, delta), prevRows + batchRows)
    }
    // the profile is O(#columns) rows — a coalesce(1) rewrite per
    // trigger, independent of corpus size (the CountMinStream bound)
    mergedProfile.coalesce(1).write.mode("overwrite")
      .parquet(VersionedState.path(dir, "profile", batchId))
    import spark.implicits._
    Seq(totalRows).toDF("n_rows").coalesce(1)
      .write.mode("overwrite") // meta LAST = the commit point
      .parquet(VersionedState.path(dir, "meta", batchId))
    VersionedState.prune(spark, dir, Seq("profile", "meta"),
      batchId, prevV)
  }

  /** The streaming entry point: maintain the profile under `dir`. */
  def profileStream(src: DataFrame, dir: String)
      : DataStreamWriter[Row] =
    src.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), dir, batchId)
    }

  /** The served report: one row per column with the distinct ESTIMATE
    * and the exact additive stats. `mean` divides the exact decimal
    * sum by the non-null count — one double division of exact
    * operands. Throws if nothing is committed. */
  def current(spark: SparkSession, dir: String): DataFrame = {
    val v = VersionedState.latestBefore(spark, dir, Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no committed profile under $dir"))
    val nRows = spark.read.parquet(VersionedState.path(dir, "meta", v))
      .head().getLong(0)
    spark.read.parquet(VersionedState.path(dir, "profile", v))
      .select(col("col_name"), lit(nRows).as("n_rows"),
        col("n_nulls"),
        // sk is NULL when no non-null value was EVER sketched (e.g.
        // an all-empty prefix): the distinct estimate is 0, not NULL
        coalesce(hll_sketch_estimate(col("sk")), lit(0L))
          .as("n_distinct_est"),
        col("min_num"), col("max_num"),
        when(lit(nRows) > col("n_nulls"),
          col("sum_num").cast(DoubleType) /
            (lit(nRows) - col("n_nulls")))
          .as("mean"),
        col("min_str"), col("max_str"))
      .orderBy(col("col_name"))
  }
}
