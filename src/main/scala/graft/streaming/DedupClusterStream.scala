package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.ConnectedComponents

/** INCREMENTAL maintenance of the near-dup CLUSTER labeling — the
  * transitive closure downstream of the verified-pair index
  * (`DedupIndexStream`), and the streaming twin of
  * `llm_dedup_clusters`' one-shot `ConnectedComponents.clusters`.
  *
  * A curation deployment dedups by CLUSTER (one keeper per component,
  * `llm_dedup_stats`' cluster-collapse policy), so the labeling — not
  * the raw pair list — is the artifact a long-lived pipeline serves.
  * This maintainer keeps it current as verified pairs arrive: each
  * batch folds the new pairs into the stored labeling by running
  * connected components over the STAR EDGES of the old labeling
  * (id ↔ lbl links — each component collapses to a star around its
  * min-id member, which preserves connectivity exactly) unioned with
  * the batch's new pairs. Per-batch work is therefore
  * O(|labeled nodes| + |new pairs|) — the labeling only holds docs
  * that near-duplicate SOMETHING (≪ corpus at any useful threshold),
  * and a batch never rescans the corpus or the historical pair list.
  *
  * Exactness argument (parity pinned in DedupClusterStreamSpec): the
  * star edge set of a correct labeling has the same components as the
  * pair set it summarizes; adding new edges and re-running an EXACT
  * component algorithm (`ConnectedComponents.of` — min-label
  * propagation with pointer doubling, throws on non-convergence)
  * yields the components of (old pairs ∪ new pairs). By induction the
  * streamed labeling after any batch prefix equals the one-shot batch
  * labeling of all pairs seen — including the hard case where a late
  * pair MERGES two established clusters and every member of the
  * larger-id cluster must relabel.
  *
  * State layout follows the shared `VersionedState` protocol (meta
  * LAST = commit point; replayed batches no-op; superseded versions
  * pruned after commit):
  * {{{
  *   dir/labels/state_vN  (id, lbl)  — every paired doc, lbl = min id
  *                                     of its component
  *   dir/meta/state_vN    (n_nodes, n_clusters, n_pairs_folded)
  * }}}
  * The labeling is rewritten per trigger — NOT a delta chain — because
  * a merge relabels an unbounded-in-principle set of members; the
  * rewrite is honest because the labeling itself is the small
  * artifact (paired docs only), and the loud `MaxLabelRows` cap turns
  * "the near-dup graph stopped being sparse" into an error instead of
  * a silently quadratic store (the house cap discipline).
  */
object DedupClusterStream {

  /** Paired-doc bound; a labeling past this means the pair source is
    * degenerate (threshold too low / corpus of clones), not that the
    * maintainer should quietly scale: fix the source. */
  val MaxLabelRows = 50000000L

  private val Stores = Seq("labels", "meta")

  /** One incremental labeling update over `pairs` (a_id, b_id rows —
    * e.g. one batch of newly verified near-dup pairs). */
  def updateBatch(pairs: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = pairs.sparkSession
    if (VersionedState.isCommitted(spark, dir, batchId))
      return // replay of a committed batch
    val prevV = VersionedState.latestBefore(spark, dir, batchId)
    val newEdges = pairs.select(col("a_id").cast("long").as("a_id"),
      col("b_id").cast("long").as("b_id"))
    if (prevV.nonEmpty && newEdges.isEmpty)
      return // idle trigger on an established chain: the labeling is
             // provably unchanged — skip the CC pass AND the state
             // rewrite (a replay of this batch re-skips identically)
    val prev = prevV.map(v =>
      spark.read.parquet(VersionedState.path(dir, "labels", v)))
    val edges = prev match {
      case Some(p) => p
        .filter(col("id") =!= col("lbl")) // self-stars carry no info
        .select(col("id").as("a_id"), col("lbl").as("b_id"))
        .unionByName(newEdges)
      case None => newEdges
    }
    // singletons (id == lbl, no surviving star edge) re-enter through
    // ConnectedComponents only if an edge touches them — preserve the
    // rest explicitly so a batch can never silently drop a node
    val singletons = prev match {
      case Some(p) => p.filter(col("id") === col("lbl"))
        .join(edges.select(col("a_id").as("id"))
            .unionByName(edges.select(col("b_id").as("id"))).distinct(),
          Seq("id"), "left_anti")
        .select(col("id"), col("lbl"))
      case None => newEdges.limit(0)
        .select(col("a_id").as("id"), col("b_id").as("lbl"))
    }
    val out = (if (prevV.isEmpty && edges.isEmpty) {
      // first batch may be empty: commit an empty labeling so the
      // version chain starts (the no-output class must still commit)
      edges.select(col("a_id").as("id"), col("b_id").as("lbl"))
    } else {
      ConnectedComponents.of(edges).unionByName(singletons)
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val rows = out.count()
      require(rows <= MaxLabelRows,
        s"dedup-cluster labeling would hold $rows rows, over the " +
          s"$MaxLabelRows paired-doc cap — the near-dup graph is not " +
          "sparse; raise the similarity threshold or fix the source")
      val nClusters =
        if (rows == 0L) 0L
        else out.agg(count_distinct(col("lbl"))).collect()(0).getLong(0)
      val nNewPairs = newEdges.count()
      val prevFolded = prevV.map { v =>
        spark.read.parquet(VersionedState.path(dir, "meta", v))
          .collect()(0).getAs[Long]("n_pairs_folded")
      }.getOrElse(0L)
      out.write.mode("overwrite")
        .parquet(VersionedState.path(dir, "labels", batchId))
      import spark.implicits._
      Seq((rows, nClusters, prevFolded + nNewPairs))
        .toDF("n_nodes", "n_clusters", "n_pairs_folded")
        .coalesce(1)
        .write.mode("overwrite") // meta LAST = the commit point
        .parquet(VersionedState.path(dir, "meta", batchId))
      VersionedState.prune(spark, dir, Stores, batchId, prevV)
    } finally out.unpersist()
  }

  /** The streaming entry point: maintain the labeling under `dir`
    * from a streaming (a_id, b_id) verified-pair frame. */
  def clusterStream(pairs: DataFrame, dir: String)
      : DataStreamWriter[Row] =
    pairs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), dir, batchId)
    }

  /** Latest committed labeling (id, lbl). Throws if nothing is
    * committed. */
  def currentLabels(spark: SparkSession, dir: String): DataFrame = {
    val v = VersionedState.latestBefore(spark, dir, Long.MaxValue)
    if (v.isEmpty)
      throw new IllegalStateException(s"no committed labeling under $dir")
    spark.read.parquet(VersionedState.path(dir, "labels", v.get))
  }

  /** Cluster census from the maintained labeling — the serving view
    * `llm_dedup_clusters` computes one-shot: (keeper_id,
    * cluster_size). */
  def currentClusters(spark: SparkSession, dir: String): DataFrame =
    currentLabels(spark, dir)
      .groupBy(col("lbl").as("keeper_id"))
      .agg(count(lit(1)).as("cluster_size"))
}
