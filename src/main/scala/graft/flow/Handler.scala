package graft.flow

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A task message: the reference's free-form JSON task enriched with
  * flow lineage (`/root/reference/lib/distribot/worker.rb:123-131`).
  * Payload is a flat string map (the dynamic-schema escape hatch of
  * SURVEY.md §1.2); typed handlers can parse what they need.
  */
final case class TaskMsg(
    flowId: String,
    phase: String,
    payload: Map[String, String])

/** Context a handler runs with: the session, the submitted flow's
  * opaque data (as JSON text), and fixture location. The session is
  * `@transient`: `process` runs on executors, where `spark` is null —
  * data-plane task code must not touch the driver session. */
final case class HandlerContext(
    @transient spark: SparkSession,
    flowId: String,
    phase: String,
    dataJson: Option[String],
    sfDir: String)

/** The engine's handler contract — the Spark-native reshaping of the
  * reference worker mixin (`lib/distribot/worker.rb:17-30`):
  * `enumerate` produces the task set for data-dependent fan-out
  * (their `enumerate_with`, our generator stage) and `process` is the
  * per-task parallel map (their `process_tasks_with`). `process` runs
  * inside executors (`foreachPartition`), so implementations must be
  * serializable and idempotent (the reference is at-least-once;
  * Spark task retry gives the same contract).
  */
trait Handler extends Serializable {
  def name: String = getClass.getSimpleName.stripSuffix("$")
  def version: SemVer = SemVer(1, 0, 0)

  /** Produce the tasks for this flow/phase (runs on the driver;
    * may itself run Spark jobs). */
  def enumerate(ctx: HandlerContext): Seq[TaskMsg]

  /** Distributed enumeration (O10 at scale): override to return the
    * task set as a Dataset and the driver never materializes it — a
    * data-dependent task list derived from a 100 TB table flows
    * straight from its source partitions into `process`. When this
    * returns Some, `enumerate` is not called. */
  def enumerateDataset(ctx: HandlerContext)
      : Option[org.apache.spark.sql.Dataset[TaskMsg]] = None

  /** Process one task (runs on executors). */
  def process(ctx: HandlerContext, task: TaskMsg): Unit
}

/** A handler that runs one declarative DataFrame query as its phase
  * work — the bridge that exposes the SURVEY §2.3 relational surface
  * through distribot-shaped flows (SURVEY.md §2.2). Enumerates a
  * single task; `run` materializes the DataFrame.
  */
final class QueryHandler(
    override val name: String,
    override val version: SemVer,
    query: (SparkSession, String) => DataFrame)
    extends Handler {

  override def enumerate(ctx: HandlerContext): Seq[TaskMsg] =
    Seq(TaskMsg(ctx.flowId, ctx.phase, Map("query" -> name)))

  override def process(ctx: HandlerContext, task: TaskMsg): Unit = ()

  /** The phase's query as an unexecuted plan — the engine drives
    * materialization itself (per-partition, so progress ticks during
    * the run; Engine.runHandler). */
  def frame(ctx: HandlerContext): org.apache.spark.sql.DataFrame =
    query(ctx.spark, ctx.sfDir)

  /** Driver-side materialization hook (direct use outside the engine). */
  def run(ctx: HandlerContext): Long = frame(ctx).count()
}

/** Cross-phase data handoff: phase N materializes a DataFrame to a
  * table path that phase N+1 reads. This replaces the reference's
  * worker pattern of stashing intermediate results in shared Redis
  * sets between phases (`/root/reference/examples/worker:83-94,
  * 104-109`) with the engine-native handoff — a parquet table write,
  * which also upgrades the contract from at-least-once side effects to
  * exactly-once results (idempotent overwrite; SURVEY.md §7.4 risk 3).
  *
  * `path` may contain `{flow_id}`, substituted per flow so concurrent
  * flows don't collide (the reference namespaces its keys by flow id
  * the same way).
  */
final class MaterializeHandler(
    override val name: String,
    override val version: SemVer,
    query: (SparkSession, String) => DataFrame,
    path: String)
    extends Handler {

  def resolvedPath(ctx: HandlerContext): String =
    path.replace("{flow_id}", ctx.flowId)

  override def enumerate(ctx: HandlerContext): Seq[TaskMsg] =
    Seq(TaskMsg(ctx.flowId, ctx.phase, Map("out" -> resolvedPath(ctx))))

  override def process(ctx: HandlerContext, task: TaskMsg): Unit = ()

  /** Driver-side hook: write the result table for downstream phases. */
  def run(ctx: HandlerContext): Unit =
    query(ctx.spark, ctx.sfDir).write.mode("overwrite")
      .parquet(resolvedPath(ctx))
}
