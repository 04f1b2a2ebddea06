package graft.flow

import java.util.UUID
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.concurrent.TrieMap
import scala.collection.mutable
import scala.concurrent.{ExecutionContext, Future, Promise}
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.LongAccumulator
import org.json4s.jackson.JsonMethods

/** Engine configuration (SURVEY.md §2.1 O32). */
final case class EngineConfig(
    sfDir: String = "/root/testdata/sf0.001",
    taskPartitions: Int = 8)

/** One transition-log record (O3-O4): event-sourced, state derived by
  * timestamp order (`/root/reference/lib/distribot/flow.rb:126-143`). */
final case class Transition(flowId: String, from: String, to: String,
    timestampMs: Long)

final case class FlowResult(flowId: String, finalPhase: String,
    transitions: Seq[Transition])

/** Per-handler progress counters (O11/O14/O28): total enumerated tasks
  * and finished count — the reference's Redis `incrby`/`decr` pair
  * (`worker.rb:123-131`, `worker.rb:102-103`) collapsed into a Spark
  * accumulator, so nothing per-task leaves the executors. */
final case class HandlerProgress(handler: String, total: Long, finished: Long)

final case class FlowStatus(
    flowId: String,
    name: Option[String],
    currentPhase: String,
    state: String,
    msInPhase: Long,
    handlers: Seq[HandlerProgress])

/** Driver-side flow state machine + executor (SURVEY.md §3.1).
  *
  * The reference's nine message hops (flow.created → phase.started →
  * enumerate → tasks → task.finished → handler.finished →
  * phase.finished → flow.finished) collapse into a driver loop: each
  * phase runs its resolved handlers as concurrent Spark jobs
  * (`enumerate` fan-out → `process` via `foreachPartition`), and the
  * three barrier levels (O14-O16) are Spark's synchronous action
  * completion + `Future.sequence`. Control (pause/resume/cancel,
  * O6-O9) is phase-granular for batch, as designed in SURVEY §7.4:
  * re-running an interrupted handler on resume is within the
  * reference's at-least-once contract.
  */
final class Engine(
    val spark: SparkSession,
    val registry: HandlerRegistry,
    val config: EngineConfig = EngineConfig()) {

  private val active = TrieMap.empty[String, FlowRun] // O2: Flow.active
  private val runningGauge = new AtomicInteger(0) // O1/O17 gauge
  private implicit val ec: ExecutionContext = ExecutionContext.global

  def submit(flowJson: String): FlowRun = submit(FlowSpec.parse(flowJson))

  def submit(spec: FlowSpec): FlowRun = {
    // analysis-time handler resolution (O19-O20): fail fast on a
    // missing handler/version instead of the reference's silent hang
    val resolved: Map[(String, String), Handler] = (for {
      p <- spec.phases
      ref <- p.handlers
    } yield (p.name, ref.name) -> registry.resolve(ref).getOrElse(
      throw FlowSpec.InvalidFlow(
        s"no registered handler ${ref.name} ${ref.version.getOrElse("(any)")}"))
    ).toMap
    val run = new FlowRun(this, UUID.randomUUID().toString, spec, resolved)
    active.put(run.id, run) // O1: register in active set
    runningGauge.incrementAndGet()
    run.start()
    run
  }

  /** O2: lookup. */
  def find(id: String): Option[FlowRun] = active.get(id)
  def activeFlows: Seq[FlowRun] = active.values.toSeq
  def runningCount: Int = runningGauge.get()

  // O17: decr gauge + deregister. Idempotent — runLoop's normal exit
  // and start()'s catch-all escape hatch may both reach here.
  private[flow] def deregister(run: FlowRun): Unit =
    if (active.remove(run.id).isDefined) runningGauge.decrementAndGet()

  /** O28: status over all active flows as a DataFrame view. */
  def statusDataFrame(): DataFrame = {
    val rows = activeFlows.map { r =>
      val st = r.status()
      (st.flowId, st.name.getOrElse(""), st.currentPhase, st.state,
        st.msInPhase,
        st.handlers.map(h => s"${h.handler}:${h.finished}/${h.total}")
          .mkString(","))
    }
    import spark.implicits._
    rows.toDF("flow_id", "name", "current_phase", "state", "ms_in_phase",
      "handler_progress")
  }

  /** O4: the cross-flow transition log as a DataFrame (event-sourced
    * audit; append to parquet for durability). */
  def transitionLog(): DataFrame = {
    import spark.implicits._
    activeFlows.flatMap(_.transitions).toDF()
  }
}

object FlowRun {
  sealed trait State
  case object Running extends State
  case object Paused extends State
  case object Canceled extends State
  case object Finished extends State
  case object Failed extends State
}

final class FlowRun private[flow] (
    engine: Engine,
    val id: String,
    val spec: FlowSpec,
    resolved: Map[(String, String), Handler]) {
  import FlowRun._

  private val log = mutable.ArrayBuffer.empty[Transition] // O4
  private val lock = new Object
  @volatile private var state: State = Running
  @volatile private var pauseRequested = false
  @volatile private var phaseStartedAt = System.currentTimeMillis()
  @volatile private var currentPhaseName: String = spec.initialPhase.name
  private val counters =
    TrieMap.empty[(String, String), (Long, LongAccumulator)]
  private val promise = Promise[FlowResult]()
  private implicit val ec: ExecutionContext = ExecutionContext.global

  /** O27: completion future (the reference's polling callback thread,
    * `flow.rb:167-177`, without the 1 Hz poll). */
  def future: Future[FlowResult] = promise.future

  def transitions: Seq[Transition] = lock.synchronized(log.toSeq)

  /** O5: latest transition wins; falls back to the initial phase. */
  def currentPhase: String = lock.synchronized(
    log.lastOption.map(_.to).getOrElse(spec.initialPhase.name))

  // O9: status predicates
  def isRunning: Boolean = state == Running
  def isPaused: Boolean = state == Paused
  def isCanceled: Boolean = state == Canceled
  def isFinished: Boolean = state == Finished

  /** O6: pause — only a running flow; takes effect at the next phase
    * boundary (batch pause is phase-granular, SURVEY §7.4). */
  def pause(): Boolean = lock.synchronized {
    if (state != Running) false
    else { pauseRequested = true; true }
  }

  /** O7: resume — only a paused flow; re-enters the last real phase. */
  def resume(): Boolean = lock.synchronized {
    if (state != Paused) false
    else {
      pauseRequested = false
      state = Running
      lock.notifyAll()
      true
    }
  }

  /** O8: cancel — terminal; interrupts running Spark jobs via the
    * flow's job group. */
  def cancel(): Boolean = lock.synchronized {
    if (state == Canceled || state == Finished || state == Failed) false
    else {
      state = Canceled
      engine.spark.sparkContext.cancelJobGroup(id)
      lock.notifyAll()
      true
    }
  }

  /** O28: live status snapshot. */
  def status(): FlowStatus = FlowStatus(
    flowId = id,
    name = spec.name,
    currentPhase = currentPhaseName,
    state = state.toString,
    msInPhase = System.currentTimeMillis() - phaseStartedAt,
    handlers = counters.toSeq.collect {
      case ((ph, h), (total, acc)) if ph == currentPhaseName =>
        HandlerProgress(h, total, acc.value)
    })

  private def transitionTo(from: String, to: String): Unit =
    lock.synchronized { // O3
      log += Transition(id, from, to, System.currentTimeMillis())
      currentPhaseName = to
      phaseStartedAt = System.currentTimeMillis()
    }

  // Any escape path out of runLoop (including bugs in the loop itself)
  // must deregister, or the flow leaks in the active set and the
  // running gauge never decrements (ADVICE r1).
  private[flow] def start(): Unit = Future(runLoop()).failed.foreach { e =>
    engine.deregister(this)
    promise.tryFailure(e)
  }

  private def runLoop(): Unit = {
    var phase = spec.initialPhase
    transitionTo("", phase.name) // O18: flow.created → first phase
    var done = false
    // belt-and-braces against error-transition ping-pong: validation
    // guarantees every error chain terminates, but a phase pair whose
    // handlers keep failing into each other would still loop — bound
    // total error hops by the phase count
    var errorHops = 0
    while (!done) {
      // control checks at the phase boundary
      if (state == Canceled) {
        transitionTo(phase.name, "canceled")
        engine.deregister(this)
        promise.tryFailure(new InterruptedException(s"flow $id canceled"))
        return
      }
      if (pauseRequested) lock.synchronized {
        if (state == Running) {
          state = Paused
          transitionTo(phase.name, "paused") // O6: pseudo-phase
        }
        while (state == Paused) lock.wait()
        if (state == Canceled) {
          transitionTo("paused", "canceled")
          engine.deregister(this)
          promise.tryFailure(new InterruptedException(s"flow $id canceled"))
          return
        }
        transitionTo("paused", phase.name) // O7: back to last real phase
      }

      // O19: dispatch handlers (empty phase short-circuits to advance)
      val outcome: Try[Unit] =
        if (phase.handlers.isEmpty) Success(())
        else Try {
          val fs = phase.handlers.map { ref =>
            val h = resolved((phase.name, ref.name))
            Future(runHandler(phase, h))
          }
          // O15: phase barrier = all handler futures complete
          import scala.concurrent.duration._
          scala.concurrent.Await.result(Future.sequence(fs), 1.day)
          ()
        }

      outcome match {
        case Success(_) =>
          if (phase.isFinal) { // O16/O17: flow finish
            state = Finished
            engine.deregister(this)
            promise.trySuccess(FlowResult(id, phase.name, transitions))
            done = true
          } else {
            val next = spec.nextPhase(phase).get
            transitionTo(phase.name, next.name)
            phase = next
          }
        case Failure(_) if state == Canceled => () // loop records cancel
        case Failure(e) =>
          errorHops += 1
          phase.onErrorTransitionTo.flatMap(spec.phase) match {
            case Some(errPhase) if errorHops <= spec.phases.size =>
              transitionTo(phase.name, errPhase.name) // O34, for real
              phase = errPhase
            case _ =>
              state = Failed
              engine.deregister(this)
              promise.tryFailure(e)
              done = true
          }
      }
    }
  }

  /** One handler: enumerate on the driver (O10), scatter + process on
    * executors (O11-O12), count via accumulator (O14 collapses into
    * action completion). */
  private def runHandler(phase: PhaseSpec, h: Handler): Unit = {
    val spark = engine.spark
    val ctx = HandlerContext(spark, id, phase.name,
      spec.data.map(d => JsonMethods.compact(JsonMethods.render(d))),
      engine.config.sfDir)
    spark.sparkContext.setJobGroup(id, s"flow $id phase ${phase.name}",
      interruptOnCancel = true)
    try h match {
      case q: QueryHandler =>
        val acc = spark.sparkContext.longAccumulator(s"$id.${phase.name}.${h.name}")
        counters.put((phase.name, h.name), (1L, acc))
        q.run(ctx)
        acc.add(1)
      case m: MaterializeHandler =>
        val acc = spark.sparkContext.longAccumulator(s"$id.${phase.name}.${h.name}")
        counters.put((phase.name, h.name), (1L, acc))
        m.run(ctx)
        acc.add(1)
      case _ =>
        val tasks = h.enumerate(ctx) // O10: dynamic fan-out
        val acc = spark.sparkContext.longAccumulator(s"$id.${phase.name}.${h.name}")
        counters.put((phase.name, h.name), (tasks.size.toLong, acc))
        if (tasks.nonEmpty) {
          import spark.implicits._
          val parts = math.min(engine.config.taskPartitions,
            math.max(tasks.size, 1))
          // O11: scatter; O12: parallel per-task processing
          spark.createDataset(tasks).repartition(parts)
            .foreachPartition { it: Iterator[TaskMsg] =>
              it.foreach { t => h.process(ctx, t); acc.add(1) }
            }
        }
    } finally spark.sparkContext.clearJobGroup()
  }
}

/** O30: the reference's `stubbornly` retry-forever loop
  * (`connector.rb:147-160`), bounded and with backoff. */
object Retry {
  def withBackoff[T](attempts: Int, initialDelayMs: Long = 100)(f: => T): T = {
    var delay = initialDelayMs
    var left = attempts
    while (true) {
      // NonFatal only (ADVICE r1): cancellation (InterruptedException)
      // and fatal JVM errors (OutOfMemoryError etc.) propagate
      // immediately instead of being retried
      try return f
      catch {
        case scala.util.control.NonFatal(e) =>
          left -= 1
          if (left <= 0) throw e
          Thread.sleep(delay)
          delay = math.min(delay * 2, 10000)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
