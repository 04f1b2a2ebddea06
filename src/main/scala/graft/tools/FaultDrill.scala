package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.Await
import scala.concurrent.duration._

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession

import graft.flow._

/** Fault-injection drill under REAL Spark task retries (VERDICT r8
  * #4) — the reference's worker model makes 10% of tasks raise and
  * re-enqueues them (`examples/worker:33`, `worker.rb:74
  * reenqueue_on_failure`); Spark's analogue is task re-execution
  * under `spark.task.maxFailures`. The shared test session runs plain
  * `local[n]` (maxFailures=1, fail-fast), so this drill owns a
  * `local[8,3]` session and FaultInjectionSpec runs it as a
  * subprocess, asserting on the RESULT lines it prints:
  *
  *  1. FLAKY: a handler whose `process` raises on a deterministic 10%
  *     of tasks at attempt 0 and succeeds on retry. The flow must
  *     FINISH; processing is at-least-once per row (a partition retry
  *     re-runs its earlier rows — exactly the reference's requeue
  *     semantics, where a redelivered AMQP message replays the
  *     handler), so the pinned contract is: every enumerated task
  *     processed >= 1 time, real retries observed (attempt > 0), and
  *     the flow's transition log untouched by the storm.
  *  2. COMMIT: exactly-once RESULTS under the same storm — a
  *     materializing handler writes parquet through Spark's output
  *     committer while 10% of its tasks fail at attempt 0; the
  *     committed row count must equal the input exactly (no dup, no
  *     loss).
  *  3. EXHAUST: one poisoned task fails at EVERY attempt; after
  *     maxFailures=3 the job dies for real and the flow must take
  *     `on_error_transition_to` (O34) driven by genuine retry
  *     exhaustion — the drill asserts 3 attempts were observed and
  *     the error phase ran.
  */
object FaultDrill {
  val processed = new ConcurrentLinkedQueue[String]()
  val retriesSeen = new AtomicInteger(0)
  val poisonAttempts = new AtomicInteger(0)
  val errorPhaseRan = new AtomicInteger(0)
  val rankInjections = new AtomicInteger(0)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8, 3]") // maxFailures = 3: real task retries
      .appName("graft-fault-drill")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val out = java.nio.file.Files
      .createTempDirectory("fault-drill").toString

    // -- 1+2: flaky 10% + committed write, one two-handler phase ----
    // CommitWriter: a MaterializeHandler whose frame fails 10% of its
    // write tasks at attempt 0 — the output committer must still land
    // the 1000 rows exactly once.
    val commitWriter = new MaterializeHandler("CommitWriter",
      SemVer(1, 0, 0), (s, _) => {
        import s.implicits._
        s.range(1000).repartition(10)
          .mapPartitions { it =>
            val tc = TaskContext.get()
            if (tc != null && tc.partitionId() % 10 == 0 &&
              tc.attemptNumber() == 0)
              throw new RuntimeException(
                s"injected write failure p${tc.partitionId()} attempt 0")
            it
          }.toDF("id")
      }, s"$out/committed")
    val reg = new HandlerRegistry
    reg.register(new FlakyTenPercent)
    reg.register(commitWriter)
    val engine = new Engine(spark, reg,
      EngineConfig(sfDir = "/root/testdata/sf0.001", taskPartitions = 8))
    val run = engine.submit(
      """{"name":"storm","phases":[
        |{"name":"work","is_initial":true,"transitions_to":"done",
        | "handlers":["FlakyTenPercent","CommitWriter"]},
        |{"name":"done","is_final":true}]}""".stripMargin)
    val res = Await.result(run.future, 5.minutes)

    val tasks = processed.toArray.map(_.toString).toSeq
    val distinct = tasks.toSet
    val expected = (0 until 50).map(_.toString).toSet
    println(s"RESULT flaky_finished=${res.finalPhase == "done"}")
    println(s"RESULT flaky_all_processed=${distinct == expected}")
    println(s"RESULT flaky_retries_observed=${retriesSeen.get() > 0}")
    println(s"RESULT flaky_transitions=${run.transitions.map(_.to).mkString(">")}")
    val committed = spark.read.parquet(s"$out/committed").count()
    println(s"RESULT commit_rowcount=$committed")

    // -- 3: retry exhaustion drives O34 ------------------------------
    val reg2 = new HandlerRegistry
    reg2.register(new PoisonedTask)
    reg2.register(new ErrorPhaseProbe)
    val engine2 = new Engine(spark, reg2,
      EngineConfig(sfDir = "/root/testdata/sf0.001", taskPartitions = 8))
    val run2 = engine2.submit(
      """{"name":"exhaust","phases":[
        |{"name":"work","is_initial":true,"transitions_to":"done",
        | "on_error_transition_to":"cleanup","handlers":["PoisonedTask"]},
        |{"name":"cleanup","transitions_to":"done",
        | "handlers":["ErrorPhaseProbe"]},
        |{"name":"done","is_final":true}]}""".stripMargin)
    val res2 = Await.result(run2.future, 5.minutes)
    println(s"RESULT exhaust_finished=${res2.finalPhase == "done"}")
    println(s"RESULT exhaust_attempts=${poisonAttempts.get()}")
    println(s"RESULT exhaust_error_phase_ran=${errorPhaseRan.get()}")
    println(s"RESULT exhaust_transitions=${run2.transitions.map(_.to).mkString(">")}")

    // -- 4: rank determinism under the same storm (round-13) --------
    // The boundary contract's EMPIRICAL proof: DistributedNtile's
    // bucket ids are pure functions of row values against plan-frozen
    // boundaries, so ranks must be IDENTICAL to the fault-free window
    // oracle even when tasks of the scan stage (which also carries
    // the sketch + cell-count construction jobs) AND the post-shuffle
    // rank stage fail at attempt 0 — the executor-loss / lineage-
    // recompute path the retired localCheckpoint freeze could not
    // survive (VERDICT r12 #3).
    {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val base = spark.range(60000L).select(
        col("id"),
        pmod(hash(col("id")), lit(997)).as("v"),
        pmod(hash(col("id") * 7), lit(5)).cast("string").as("grp"))
      val scanFault = udf((id: Long) => {
        val tc = TaskContext.get()
        if (tc != null && tc.attemptNumber() == 0 &&
          tc.partitionId() % 3 == 0) {
          rankInjections.incrementAndGet()
          throw new RuntimeException(
            s"injected scan failure p${tc.partitionId()} attempt 0")
        }
        true
      })
      val rankFault = udf((rn: Long) => {
        val tc = TaskContext.get()
        if (tc != null && tc.attemptNumber() == 0 &&
          tc.partitionId() % 4 == 1) {
          rankInjections.incrementAndGet()
          throw new RuntimeException(
            s"injected rank-stage failure p${tc.partitionId()} attempt 0")
        }
        true
      })
      val got = graft.operators.DistributedNtile
        .withGroupRank(base.filter(scanFault(col("id"))),
          "grp", "rn", "cnt", col("v"), col("id"))
        .filter(rankFault(col("rn")))
        .select(col("id"), col("rn"), col("cnt"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("v"), col("id"))
      val want = base.select(col("id"),
          row_number().over(w).cast("long").as("rn"),
          count(lit(1)).over(Window.partitionBy(col("grp"))).as("cnt"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      println(s"RESULT rank_retry_equal=${got == want}")
      println(s"RESULT rank_retry_injections=${rankInjections.get()}")
    }

    spark.stop()
  }
}

/** Enumerates 50 tasks; tasks where i % 10 == 0 throw at Spark task
  * attempt 0 and succeed on the retry — the reference worker's
  * deterministic 10% failure (`examples/worker:33`). */
private[tools] class FlakyTenPercent extends Handler {
  override val name = "FlakyTenPercent"
  def enumerate(ctx: HandlerContext): Seq[TaskMsg] =
    (0 until 50).map(i =>
      TaskMsg(ctx.flowId, ctx.phase, Map("i" -> i.toString)))
  def process(ctx: HandlerContext, task: TaskMsg): Unit = {
    val i = task.payload("i").toInt
    val attempt = Option(TaskContext.get()).map(_.attemptNumber()).getOrElse(0)
    if (attempt > 0) FaultDrill.retriesSeen.incrementAndGet()
    if (i % 10 == 0 && attempt == 0)
      throw new RuntimeException(s"injected failure for task $i attempt 0")
    FaultDrill.processed.add(task.payload("i")); ()
  }
}

/** One poisoned task (i == 7) that fails at EVERY attempt; the rest
  * succeed. After maxFailures the job dies for real. */
private[tools] class PoisonedTask extends Handler {
  override val name = "PoisonedTask"
  def enumerate(ctx: HandlerContext): Seq[TaskMsg] =
    (0 until 20).map(i =>
      TaskMsg(ctx.flowId, ctx.phase, Map("i" -> i.toString)))
  def process(ctx: HandlerContext, task: TaskMsg): Unit = {
    if (task.payload("i").toInt == 7) {
      FaultDrill.poisonAttempts.incrementAndGet()
      throw new RuntimeException("poisoned task: fails every attempt")
    }
  }
}

/** Records that the O34 error phase genuinely ran. */
private[tools] class ErrorPhaseProbe extends Handler {
  override val name = "ErrorPhaseProbe"
  def enumerate(ctx: HandlerContext): Seq[TaskMsg] =
    Seq(TaskMsg(ctx.flowId, ctx.phase, Map.empty))
  def process(ctx: HandlerContext, task: TaskMsg): Unit = {
    FaultDrill.errorPhaseRan.incrementAndGet(); ()
  }
}
