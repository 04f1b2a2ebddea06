package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.queries.Llm

/** INCREMENTAL maintenance of the leakage-safe train/val/test split —
  * the streaming twin of `llm_split_leakage_safe` and the 24th
  * maintainer, closing the build/serve/maintain triad for the split
  * artifact (VERDICT r12 #7).
  *
  * The key decomposition: a doc's split is `f(md5(root))` where root
  * is its near-dup component label, and root ≠ doc_id ONLY for docs
  * that appear in the maintained cluster labeling
  * (`DedupClusterStream`). So the split report over the whole corpus
  * splits into
  *   - an UNPAIRED base: every doc counted by the md5 bucket of its
  *     OWN id — a 10-row counter this maintainer increments per batch
  *     (O(new docs) map-side work, never retroactive: a doc's own
  *     bucket is immutable), and
  *   - a PAIRED correction derived at serve time from the labeling
  *     alone (subtract each labeled doc's own-bucket count, add its
  *     root-bucket count; group census from distinct labels) — O(labels)
  *     work, and labels ≪ corpus under the sparse-dup contract.
  * A late pair that MERGES two clusters (retroactively moving every
  * member of one to the other's split) therefore costs this maintainer
  * NOTHING: the labeling rewrite is `DedupClusterStream`'s job, and
  * the correction always reads the labeling's current version. The
  * served report equals the one-shot batch query on the docs seen, for
  * every prefix and every pair arrival order (pinned in
  * SplitStreamSpec).
  *
  * State layout (shared `VersionedState` protocol: meta LAST = commit
  * point, replayed batches no-op, superseded versions pruned):
  * {{{
  *   dir/counts/state_vN  (bucket 0..9, n)  — docs by OWN md5 bucket
  *   dir/meta/state_vN    (n_docs)
  * }}}
  * The doc stream is append-only (the shard-manifest membership
  * contract); the counts store is 10 rows forever.
  */
object SplitStream {

  private val Stores = Seq("counts", "meta")

  /** Fold one batch of newly arrived docs (a `doc_id` column) into the
    * own-bucket counters. */
  def updateBatch(docs: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = docs.sparkSession
    if (VersionedState.isCommitted(spark, dir, batchId))
      return // replay of a committed batch
    val prevV = VersionedState.latestBefore(spark, dir, batchId)
    // ONE pass over the batch: collect the ≤10-row bucket census and
    // do the emptiness check AND the merge on the collected array (an
    // isEmpty probe on the aggregate would scan the batch twice —
    // review r13)
    val delta = docs
      .select(Llm.splitBucketOf(col("doc_id")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .collect()
    if (prevV.nonEmpty && delta.isEmpty)
      return // idle trigger on an established chain: free no-op
    val merged = scala.collection.mutable.Map.empty[Long, Long]
    prevV.foreach { v =>
      spark.read.parquet(VersionedState.path(dir, "counts", v))
        .collect() // ≤ 10 rows by construction
        .foreach(r => merged.updateWith(r.getLong(0))(
          o => Some(o.getOrElse(0L) + r.getLong(1))))
    }
    delta.foreach(r => merged.updateWith(r.getLong(0))(
      o => Some(o.getOrElse(0L) + r.getLong(1))))
    import spark.implicits._
    val rows = merged.toSeq.sortBy(_._1)
    rows.toDF("bucket", "n").coalesce(1)
      .write.mode("overwrite")
      .parquet(VersionedState.path(dir, "counts", batchId))
    Seq(rows.map(_._2).sum).toDF("n_docs").coalesce(1)
      .write.mode("overwrite") // meta LAST = the commit point
      .parquet(VersionedState.path(dir, "meta", batchId))
    VersionedState.prune(spark, dir, Stores, batchId, prevV)
  }

  /** The streaming entry point: maintain the counters under `dir`
    * from a streaming `doc_id` frame. */
  def splitStream(docs: DataFrame, dir: String): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), dir, batchId)
    }

  /** The served split report — (split, n_docs, n_groups,
    * leakage_free), the exact schema `llm_split_leakage_safe`
    * produces one-shot — from the maintained counters plus the
    * CURRENT cluster labeling under `clusterDir`
    * (`DedupClusterStream`). Serve-time work is O(labels) + 10
    * counter rows; the corpus is never rescanned. */
  def currentSplit(spark: SparkSession, dir: String,
      clusterDir: String): DataFrame = {
    val v = VersionedState.latestBefore(spark, dir, Long.MaxValue)
    if (v.isEmpty)
      throw new IllegalStateException(s"no committed counters under $dir")
    val own = spark.read
      .parquet(VersionedState.path(dir, "counts", v.get))
    val labels = DedupClusterStream.currentLabels(spark, clusterDir)
      .select(col("id"), col("lbl"),
        Llm.splitBucketOf(col("id")).as("own_b"),
        Llm.splitBucketOf(col("lbl")).as("root_b"))

    // per-bucket correction terms from the labeling alone
    val pairedOwn = labels.groupBy(col("own_b").as("bucket"))
      .agg(count(lit(1)).as("p_own"))
    val pairedRoot = labels.groupBy(col("root_b").as("bucket"))
      .agg(count(lit(1)).as("p_root"))
    val pairedGroups = labels.select(col("lbl"), col("root_b")).distinct()
      .groupBy(col("root_b").as("bucket"))
      .agg(count(lit(1)).as("p_groups"))
    // leakage verdict, presented as CHECKED even though the root-hash
    // construction makes it structurally zero (the batch twin's
    // discipline: a regression in the labeling join must flip a
    // visible boolean, not silently contaminate eval)
    val leak = labels
      .groupBy(col("lbl"))
      .agg(count_distinct(Llm.splitNameOf(col("root_b"))).as("ns"))
      .agg(coalesce(sum(when(col("ns") > 1, lit(1L))), lit(0L))
        .as("n_leaky"))

    // seed all 10 buckets: a bucket can hold zero docs by own hash yet
    // RECEIVE paired docs by root hash — joining corrections onto the
    // own counters alone would drop that correction
    spark.range(10).select(col("id").as("bucket"))
      .join(own, Seq("bucket"), "left")
      .join(pairedOwn, Seq("bucket"), "left")
      .join(pairedRoot, Seq("bucket"), "left")
      .join(pairedGroups, Seq("bucket"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .select(Llm.splitNameOf(col("bucket")).as("split"),
        (col("n") - coalesce(col("p_own"), lit(0L)) +
          coalesce(col("p_root"), lit(0L))).as("nd"),
        // unpaired docs are their own root (one group each) + the
        // labeling's distinct components rooted in this bucket
        (col("n") - coalesce(col("p_own"), lit(0L)) +
          coalesce(col("p_groups"), lit(0L))).as("ng"))
      .groupBy(col("split"))
      .agg(sum(col("nd")).as("n_docs"), sum(col("ng")).as("n_groups"))
      // the one-shot twin only emits populated splits (groupBy over
      // the assignment) — match it so prefix parity is exact
      .filter(col("n_docs") > 0)
      .crossJoin(broadcast(leak))
      .select(col("split"), col("n_docs"), col("n_groups"),
        (col("n_leaky") === 0L).as("leakage_free"))
      .orderBy(col("split"))
  }
}
