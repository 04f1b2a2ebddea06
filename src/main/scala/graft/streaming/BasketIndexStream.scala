package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** INCREMENTAL maintenance of the market-basket statistics behind
  * `q83_assoc_rules` — pair co-occurrence counts, per-item basket
  * counts, and the basket count — as order lines APPEND.
  *
  * The hard part is that a basket GROWS across batches: an order's
  * lines may arrive in any number of micro-batches, and a pair must
  * be counted exactly once no matter how the basket was split. The
  * same decomposition as `DedupIndexStream`: each batch's NEW
  * (order, part) memberships (anti-joined against the stored items,
  * so re-delivered lines are no-ops) contribute exactly the pairs
  * {new × stored-in-same-order} ∪ {new × new} — every pair has a
  * unique later-arriving member, so across batches this enumerates
  * each basket's C(n,2) pairs exactly once (parity pinned in
  * BasketIndexStreamSpec over random row-level splits).
  *
  * State layout under `dir` (the [[DeltaStore]] LSM shape — each
  * batch writes ONLY its delta, O(new lines × basket growth), never
  * the corpus):
  * {{{
  *   dir/items/delta_vN  (l_orderkey, l_partkey)     new memberships
  *   dir/pairs/delta_vN  (part_a, part_b, dc)        pair-count deltas
  *   dir/<store>/base_vM                             compaction
  * }}}
  * `pairs` is written LAST and is the commit point; compaction folds
  * pair deltas by group-summing `dc`. The per-batch pair join is
  * pruned to the orders the batch touches (a semi-join on orderkey),
  * so a quiet order costs nothing.
  */
object BasketIndexStream {

  private val Stores = Seq("items", "pairs")
  private val Commit = "pairs"

  /** Compact when this many uncompacted deltas accumulate. */
  val CompactEvery = 8

  private def foldPairs(df: DataFrame): DataFrame =
    df.groupBy(col("part_a"), col("part_b"))
      .agg(sum(col("dc")).cast("long").as("dc"))

  /** One incremental update from `batch` rows carrying
    * (l_orderkey, l_partkey). */
  def updateBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (DeltaStore.isCommitted(spark, dir, Commit, batchId))
      return // replay of a committed batch
    val storedItems = DeltaStore.stored(spark, dir, "items", Commit,
      batchId)
    val batchItems = batch
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val newItems = (storedItems match {
      case None => batchItems
      case Some(st) => batchItems.join(st,
        Seq("l_orderkey", "l_partkey"), "left_anti")
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      newItems.write.mode("overwrite")
        .parquet(s"$dir/items/delta_v$batchId")
      // pairs: new × stored (same order) plus new × new (a < b)
      val newA = newItems.select(col("l_orderkey"),
        col("l_partkey").as("pa"))
      val oldB = storedItems.map(_.join(
          newItems.select(col("l_orderkey")).distinct(),
          Seq("l_orderkey"), "left_semi")
        .select(col("l_orderkey"), col("l_partkey").as("pb")))
      val crossOldNew = oldB.map(ob => newA.join(ob, Seq("l_orderkey"))
        .select(least(col("pa"), col("pb")).as("part_a"),
          greatest(col("pa"), col("pb")).as("part_b")))
      val newB = newItems.select(col("l_orderkey"),
        col("l_partkey").as("pb"))
      val newNew = newA.join(newB, Seq("l_orderkey"))
        .filter(col("pa") < col("pb"))
        .select(col("pa").as("part_a"), col("pb").as("part_b"))
      val allPairs = crossOldNew.fold(newNew)(c => c.unionByName(newNew))
      foldPairs(allPairs.withColumn("dc", lit(1L)))
        .write.mode("overwrite") // pairs LAST = the commit point
        .parquet(s"$dir/pairs/delta_v$batchId")
      DeltaStore.autoCompact(spark, dir, Stores, Commit, CompactEvery,
        Map("pairs" -> (foldPairs _)))
    } finally newItems.unpersist()
  }

  /** The streaming entry point: maintain the basket index under `dir`
    * from a streaming lineitem frame. */
  def basketStream(src: DataFrame, dir: String): DataStreamWriter[Row] =
    src.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), dir, batchId)
    }

  /** Served views over the committed state (empty frames before the
    * first commit). */
  def pairCounts(spark: SparkSession, dir: String): Option[DataFrame] =
    DeltaStore.stored(spark, dir, "pairs", Commit, Long.MaxValue)
      .map(df => foldPairs(df).withColumnRenamed("dc", "pc"))

  def itemCounts(spark: SparkSession, dir: String): Option[DataFrame] =
    DeltaStore.stored(spark, dir, "items", Commit, Long.MaxValue)
      .map(_.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt")))

  def orderCount(spark: SparkSession, dir: String): Long =
    DeltaStore.stored(spark, dir, "items", Commit, Long.MaxValue)
      .map(_.select(col("l_orderkey")).distinct().count()).getOrElse(0L)
}
