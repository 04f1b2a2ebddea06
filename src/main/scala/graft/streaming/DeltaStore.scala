package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The shared base+delta (LSM-shaped) durable-state protocol for
  * index maintainers whose state GROWS with the corpus — the sibling
  * of [[VersionedState]] (which rewrites small bounded artifacts
  * whole). One implementation of the listing / commit-point / replay-
  * guard / compaction mechanics, used by `DedupIndexStream` (MinHash
  * verified-pair index) and `WinnowIndexStream` (fingerprint overlap
  * index), so a protocol fix can never be applied to one maintainer
  * and silently missed in the other (the r5 review's VersionedState
  * argument, applied to the delta layout).
  *
  * Layout: each maintainer keeps stores under `dir`
  * (`dir/<store>/delta_vN` = batch N's append only;
  * `dir/<store>/base_vM` = everything through batch M, written by
  * compaction). One designated COMMIT store is written LAST each
  * batch: a batch is committed iff `dir/<commit>/delta_vN/_SUCCESS`
  * exists, so deltas of a crashed batch are invisible (their id is
  * not committed) and a retry simply overwrites them. The stored view
  * of a store is `base_vM ∪ {delta_vN : N > M, N committed}`.
  */
private[graft] object DeltaStore {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Version ids of `prefix` dirs under `store` carrying _SUCCESS. */
  private def committedDirs(spark: SparkSession, store: String,
      prefix: String): Seq[Long] = {
    val base = new Path(store)
    val f = fs(spark, store)
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(prefix) &&
        f.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix(prefix).toLong)
  }

  /** Batch ids committed strictly before `before` (commit point = the
    * commit store's delta) — retries of a half-committed batch must
    * not read their own partial output. */
  def committedBatches(spark: SparkSession, dir: String, commit: String,
      before: Long): Seq[Long] =
    committedDirs(spark, s"$dir/$commit", "delta_v").filter(_ < before)

  /** Latest committed compaction base before `before` (commit point =
    * the commit store's base). */
  def committedBase(spark: SparkSession, dir: String, commit: String,
      before: Long): Option[Long] =
    committedDirs(spark, s"$dir/$commit", "base_v").filter(_ < before)
      .maxOption

  /** Is `batchId` already committed? True means the batch is a replay
    * and must be a no-op. */
  def isCommitted(spark: SparkSession, dir: String, commit: String,
      batchId: Long): Boolean =
    fs(spark, dir).exists(
      new Path(s"$dir/$commit/delta_v$batchId/_SUCCESS"))

  /** The stored view of one store as of (strictly before) `before`:
    * base_vM plus committed deltas above it. */
  def stored(spark: SparkSession, dir: String, sub: String,
      commit: String, before: Long): Option[DataFrame] = {
    val baseM = committedBase(spark, dir, commit, before)
    val deltas = committedBatches(spark, dir, commit, before)
      .filter(n => baseM.forall(n > _))
    val paths = baseM.map(m => s"$dir/$sub/base_v$m").toSeq ++
      deltas.sorted.map(n => s"$dir/$sub/delta_v$n")
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }

  /** Compact when the uncompacted-delta count reaches `every`
    * (no-op for `every` <= 0). The stored view unions one frame per
    * uncompacted batch, so an un-compacted long-lived stream pays an
    * ever-growing read fan-in and FS listing — maintainers call this
    * after each commit to keep the delta chain bounded. */
  def autoCompact(spark: SparkSession, dir: String, subs: Seq[String],
      commit: String, every: Int,
      fold: Map[String, DataFrame => DataFrame] = Map.empty): Unit =
    if (every > 0) {
      val base = committedBase(spark, dir, commit, Long.MaxValue)
      val pending = committedBatches(spark, dir, commit, Long.MaxValue)
        .count(n => base.forall(n > _))
      if (pending >= every) compact(spark, dir, subs, commit, fold)
    }

  /** Fold the committed base + deltas of every store in `subs` into
    * one new `base_vM` (M = newest committed batch) and delete what it
    * covered. `subs` must end with the commit store so the commit base
    * is written LAST. `fold` optionally collapses a store's unioned
    * rows while compacting (e.g. group-summing signed count deltas).
    * Crash-safe by the same convention as the batch path: the commit
    * store's base commits the compaction; a crash before it leaves the
    * delta view authoritative, and the covered-dir cleanup is
    * best-effort (re-running finishes it). */
  def compact(spark: SparkSession, dir: String, subs: Seq[String],
      commit: String,
      fold: Map[String, DataFrame => DataFrame] = Map.empty): Unit = {
    require(subs.last == commit,
      s"compact: subs must end with the commit store $commit")
    val batches = committedBatches(spark, dir, commit, Long.MaxValue)
    if (batches.isEmpty) return
    val m = batches.max
    val oldBase = committedBase(spark, dir, commit, Long.MaxValue)
    if (oldBase.exists(_ >= m)) {
      // every delta is already covered by the base — only an
      // interrupted cleanup can leave this state; finish it (building
      // a base at an id ≤ the current base would let covered deltas
      // double-count against it)
      val f = fs(spark, dir)
      scala.util.Try {
        for (sub <- subs; n <- batches if n <= oldBase.get)
          f.delete(new Path(s"$dir/$sub/delta_v$n"), true)
      }
      return
    }
    for (sub <- subs) {
      val unioned = stored(spark, dir, sub, commit, Long.MaxValue).get
      fold.getOrElse(sub, identity[DataFrame] _)(unioned)
        .write.mode("overwrite").parquet(s"$dir/$sub/base_v$m")
    }
    // cleanup of covered dirs (read path already ignores them)
    val f = fs(spark, dir)
    scala.util.Try {
      for (sub <- subs) {
        oldBase.foreach(b =>
          f.delete(new Path(s"$dir/$sub/base_v$b"), true))
        batches.filter(_ <= m).foreach(n =>
          f.delete(new Path(s"$dir/$sub/delta_v$n"), true))
      }
    }
    ()
  }
}
