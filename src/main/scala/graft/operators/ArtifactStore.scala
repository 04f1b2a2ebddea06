package graft.operators

import org.apache.spark.sql.DataFrame

/** Session-scoped parquet materialization for build-once artifacts.
  *
  * Why a FILE and not only `persist()`: a persisted artifact's
  * DataFrame still carries the FULL derivation as its logical plan, so
  * every consuming query re-pays Catalyst analysis/optimization of the
  * whole build subtree on every invocation (the CacheManager only
  * substitutes the InMemoryRelation during physical planning). With
  * ~25 artifact families live, that per-invocation planning tax is a
  * visible slice of short-query latency (OPTIMIZATION_r13/r14 "Not
  * yet optimized"). Spilling the built artifact to a session temp
  * parquet table and serving the READ-BACK frame shrinks the analyzed
  * plan to a constant-size file scan — and is exactly the production
  * shape: an index is a table a serving system STORES, not a plan it
  * re-derives per query.
  *
  * Why this keeps the recompute path (the r12 availability lesson that
  * ruled out `localCheckpoint`/LogicalRDD handles): the artifact lives
  * in the driver-local filesystem for the session, so a lost executor
  * loses nothing — any task re-reads the file. `PlanCache` still owns
  * rebuild-on-eviction: `clear()` deletes the files and the next
  * consumer rebuilds from the parquet inputs. Nothing survives the
  * JVM: the directory is unique per session (`createTempDirectory`)
  * and removed by a shutdown hook — every driver run rebuilds every
  * artifact from its inputs (the no-result-caching-across-runs rule).
  *
  * On a cluster this directory would be shared storage (the same place
  * the corpus parquet lives); the local-mode temp dir is the
  * fixture-scale stand-in.
  */
object ArtifactStore {

  private lazy val root: java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("graft-artifacts-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(dir)))
    dir
  }

  private val seq = new java.util.concurrent.atomic.AtomicInteger()

  // path → the stored frame's ANALYZED build plan, so plan audits
  // (WindowAuditSpec's straggler guard) trace THROUGH a stored
  // artifact's file scan into the derivation that built it — the same
  // strengthening r13 applied to InMemoryRelation. A handful of
  // entries per session (one per artifact), dropped with the files.
  private val builds = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]()

  /** The build plan behind a stored artifact's parquet scan, if
    * `plan` is one (audit hook; None for any other plan). */
  def buildPlanFor(plan: org.apache.spark.sql.catalyst.plans.logical
      .LogicalPlan)
      : Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = {
    import org.apache.spark.sql.execution.datasources.{
      HadoopFsRelation, LogicalRelation}
    plan match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.headOption
            .flatMap(p => Option(builds.get(p.toUri.getPath)))
        case _ => None
      }
      case _ => None
    }
  }

  /** Write `df` as a session-scoped parquet table and return the
    * read-back frame (analyzed plan = one file scan). The write runs
    * the build exactly once, eagerly — same cost attribution as the
    * first materialization of a `persist()`ed artifact. Pass the
    * returned frame to `drop` on eviction. */
  def store(df: DataFrame, tag: String): DataFrame = {
    val path = root.resolve(
      s"${sanitize(tag)}-${seq.incrementAndGet()}").toString
    df.write.mode("overwrite").parquet(path)
    builds.put(path, df.queryExecution.analyzed)
    df.sparkSession.read.parquet(path)
  }

  /** The standard artifact serving shape: [[store]] then
    * MEMORY_AND_DISK-persist the read-back, so serving is
    * memory-speed while the analyzed plan stays a file scan. Pair
    * with [[evict]] as the owning PlanCache's onEvict. */
  def stored(df: DataFrame, tag: String): DataFrame =
    store(df, tag)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** onEvict for [[stored]] artifacts: unpersist + delete the files. */
  def evict(df: DataFrame): Unit = { df.unpersist(); drop(df) }

  /** Best-effort removal of a stored artifact's files (PlanCache
    * onEvict hook). Resolves the path from the read-back frame's scan
    * so call sites need no bookkeeping. */
  def drop(readBack: DataFrame): Unit = {
    import org.apache.spark.sql.execution.datasources.{
      HadoopFsRelation, LogicalRelation}
    readBack.queryExecution.logical.foreach {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.foreach { p =>
              val f = new java.io.File(p.toUri.getPath)
              if (f.getPath.startsWith(root.toString)) {
                builds.remove(f.getPath)
                deleteTree(f.toPath)
              }
            }
          case _ => ()
        }
      case _ => ()
    }
  }

  private def sanitize(tag: String): String =
    tag.replaceAll("[^A-Za-z0-9_.-]", "_").take(40)

  private def deleteTree(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(f => try java.nio.file.Files.deleteIfExists(f) catch {
          case _: java.io.IOException => ()
        })
    }
  }
}
