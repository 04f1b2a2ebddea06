package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The `_SUCCESS`-committed versioned-state protocol shared by the
  * small-artifact stream maintainers (HeavyHittersStream,
  * CountMinStream) and the durable quantizer store (KMeans.save) —
  * ONE implementation of the listing / commit-point / replay-guard /
  * prune mechanics so a protocol fix can never be applied to one
  * maintainer and silently missed in another.
  *
  * Layout: each maintainer keeps one or more stores under `dir`
  * (`dir/<store>/state_vN` parquet directories, N = streaming batch
  * id), one of which — `meta`, always written LAST — is the commit
  * point. A version counts as committed only when its `meta` parquet
  * carries `_SUCCESS`; a crash between stores therefore leaves an
  * uncommitted version that the next read ignores and the retried
  * batch overwrites. A replayed batch whose meta version is already
  * committed is a no-op. Committed versions older than the one a
  * batch read are pruned after the new commit.
  */
private[graft] object VersionedState {

  val CommitStore = "meta"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed versions in `dir/<store>` (directories named
    * `state_vN` carrying `_SUCCESS`). */
  def committed(spark: SparkSession, dir: String, store: String)
      : Seq[Long] = {
    val base = new Path(s"$dir/$store")
    val f = fs(spark, dir)
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("state_v") &&
        f.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("state_v").toLong)
  }

  /** Is `batchId` already committed (its meta carries `_SUCCESS`)?
    * True means the batch is a replay and must be a no-op. */
  def isCommitted(spark: SparkSession, dir: String, batchId: Long)
      : Boolean =
    fs(spark, dir).exists(
      new Path(s"$dir/$CommitStore/state_v$batchId/_SUCCESS"))

  /** Latest committed version strictly before `before` — the state a
    * batch with id `before` must read. */
  def latestBefore(spark: SparkSession, dir: String, before: Long)
      : Option[Long] =
    committed(spark, dir, CommitStore).filter(_ < before).maxOption

  /** Path of `store` at `version` (read side; write with
    * `.parquet(path(...))` — meta LAST). */
  def path(dir: String, store: String, version: Long): String =
    s"$dir/$store/state_v$version"

  /** Drop committed versions in `stores` older than the one the
    * just-committed batch read (`readV`), keeping `batchId` itself.
    * Best-effort: a failed delete leaves garbage, never corruption.
    * The COMMIT store's version is deleted FIRST — un-committing a
    * version before removing its data (ADVICE r5) — so a crash
    * mid-prune can never leave a committed meta whose data stores are
    * gone: every version that still reads as committed is fully
    * readable. */
  def prune(spark: SparkSession, dir: String, stores: Seq[String],
      batchId: Long, readV: Option[Long]): Unit = {
    val f = fs(spark, dir)
    val ordered = stores.sortBy(s => if (s == CommitStore) 0 else 1)
    scala.util.Try {
      for (store <- ordered;
           v <- committed(spark, dir, store)
           if v != batchId && readV.exists(v < _))
        f.delete(new Path(path(dir, store, v)), true)
    }
    ()
  }
}
