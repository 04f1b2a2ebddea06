package graft.flow

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.immutable.ListMap
import scala.concurrent.Await
import scala.concurrent.duration._

import graft.SparkSpec

/** Flow-FSM crash recovery across a process restart (VERDICT r8 #3):
  * in the reference, flow state outlives every process — any daemon
  * can pick up any flow (`flow.rb:54-60`). The engine's durable twin
  * is the in-flight journal under `$eventLogDir/inflight/`; these
  * tests prove a flow submitted by engine A and "killed" mid-phase
  * (A's handler parks forever — the observable state of a dead
  * process) completes under a FRESH engine B via `recoverInflight()`:
  * resumed at the journaled phase, completed handlers not re-run,
  * transition log coherent across the death, journal cleaned up on
  * terminal.
  *
  * The abandoned engine's parked threads are released at the END of
  * each test (after every assertion) — they then fail their flow and
  * write a terminal record, which nothing asserts on; each test uses
  * its own eventLogDir so the pollution is scoped.
  */
class CrashRecoverySpec extends SparkSpec {
  import CrashRecoverySpec._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-crash").toString

  private def engineOn(dir: String, reg: HandlerRegistry) =
    new Engine(spark, reg,
      EngineConfig(sfDir = "/root/testdata/sf0.001",
        eventLogDir = Some(dir)))

  private def linearFlow(handlers: ListMap[String, Seq[String]]): String = {
    val names = handlers.keys.toSeq
    val phases = names.zipWithIndex.map { case (n, i) =>
      val hs = handlers(n).map(h => s""""$h"""").mkString("[", ",", "]")
      val init = if (i == 0) """"is_initial": true,""" else ""
      val fin = if (i == names.size - 1) """"is_final": true,""" else ""
      val trans = if (i < names.size - 1)
        s""""transitions_to": "${names(i + 1)}",""" else ""
      s"""{"name": "$n", $init $fin $trans "handlers": $hs}"""
    }
    s"""{"name": "crash", "phases": [${phases.mkString(",")}]}"""
  }

  private def awaitFile(dir: String, flowId: String,
      pred: String => Boolean, what: String): Unit = {
    val deadline = System.currentTimeMillis() + 60000
    val d = new java.io.File(s"$dir/inflight/$flowId")
    while (!Option(d.list()).exists(_.exists(pred))) {
      assert(System.currentTimeMillis() < deadline,
        s"timed out waiting for $what in ${d.getPath}: " +
          s"${Option(d.list()).map(_.mkString(", ")).getOrElse("(no dir)")}")
      Thread.sleep(25)
    }
  }

  test("a flow killed mid-phase on engine A completes under a fresh " +
    "engine B from the journal; phase-1 work is not re-run") {
    counts.clear()
    val dir = tmpDir()
    val key = s"t1-${System.nanoTime()}"

    val regA = new HandlerRegistry
    regA.register(new OnceCountingHandler("R1", 4))
    regA.register(new ParkInEnumerate("RBlock", key))
    val engineA = engineOn(dir, regA)
    val runA = engineA.submit(linearFlow(ListMap(
      "prep" -> Seq("R1"), "work" -> Seq("RBlock"), "done" -> Nil)))

    // wait until the journal durably shows the prep→work transition
    // (RBlock is parked in enumerate — the crash point)
    awaitFile(dir, runA.id,
      n => n.startsWith("t!") && n.endsWith("!work"),
      "the prep->work transition marker")

    // "process death": abandon engine A entirely. A fresh engine B on
    // the same store — with a WORKING handler under the same name —
    // picks the flow up.
    val regB = new HandlerRegistry
    regB.register(new OnceCountingHandler("R1", 4))
    regB.register(new OnceCountingHandler("RBlock", 2))
    val engineB = engineOn(dir, regB)
    val recovered = engineB.recoverInflight()
    assert(recovered.map(_.id) == Seq(runA.id),
      s"expected to recover exactly ${runA.id}, got " +
        s"${recovered.map(_.id)}")

    val result = Await.result(recovered.head.future, 2.minutes)
    assert(result.finalPhase == "done")
    // transition log coherent across the death: A's transitions were
    // seeded from the journal, B appended from the resume point, no
    // phase entered twice
    assert(recovered.head.transitions.map(_.to) ==
      Seq("prep", "work", "done"))
    assert(recovered.head.transitions.map(_.timestampMs)
      .sliding(2).forall {
        case Seq(a, b) => a <= b
        case _ => true
      })
    // phase-1 handler ran exactly once TOTAL (on A; B resumed past it)
    assert(counts.get("R1").get() == 4,
      s"R1 re-ran on recovery: ${counts.get("R1").get()} tasks")
    assert(counts.get("RBlock").get() == 2)
    // journal cleaned up on terminal; a second recovery finds nothing
    assert(!new java.io.File(s"$dir/inflight/${runA.id}").exists())
    assert(engineB.recoverInflight().isEmpty)
    // the terminal event log carries the full coherent history
    val logged = engineB.transitionLog()
      .filter(org.apache.spark.sql.functions.col("flowId") === runA.id)
      .orderBy("timestampMs").select("to")
      .collect().map(_.getString(0)).toSeq
    assert(logged == Seq("prep", "work", "done"))

    release(key) // free the abandoned engine's parked thread (post-assert)
  }

  test("mid-phase handler checkpoints survive the crash: the completed " +
    "handler is skipped, only the interrupted one re-runs") {
    counts.clear()
    val dir = tmpDir()
    val key = s"t2-${System.nanoTime()}"

    val regA = new HandlerRegistry
    regA.register(new OnceCountingHandler("MQuick", 3))
    regA.register(new ParkInEnumerate("MBlock", key))
    val engineA = engineOn(dir, regA)
    val runA = engineA.submit(linearFlow(ListMap(
      "start" -> Nil, "both" -> Seq("MQuick", "MBlock"), "fin" -> Nil)))

    // wait for MQuick's durable checkpoint (MBlock stays parked)
    awaitFile(dir, runA.id, _ == "h!both!MQuick",
      "MQuick's handler checkpoint marker")

    val regB = new HandlerRegistry
    regB.register(new OnceCountingHandler("MQuick", 3))
    regB.register(new OnceCountingHandler("MBlock", 5))
    val engineB = engineOn(dir, regB)
    val recovered = engineB.recoverInflight()
    assert(recovered.size == 1)
    val result = Await.result(recovered.head.future, 2.minutes)
    assert(result.finalPhase == "fin")
    // the checkpointed handler did NOT re-run; the interrupted one did
    assert(counts.get("MQuick").get() == 3,
      s"checkpointed MQuick re-ran: ${counts.get("MQuick").get()} tasks")
    assert(counts.get("MBlock").get() == 5)
    assert(recovered.head.transitions.map(_.to) ==
      Seq("start", "both", "fin"))
    assert(!new java.io.File(s"$dir/inflight/${runA.id}").exists())

    release(key)
  }

  test("a durable pause intent survives the crash: the recovered flow " +
    "parks paused at its first boundary poll, resumes on request") {
    counts.clear()
    val dir = tmpDir()
    val key = s"t3-${System.nanoTime()}"

    val regA = new HandlerRegistry
    regA.register(new ParkInEnumerate("PBlock", key))
    val engineA = engineOn(dir, regA)
    val runA = engineA.submit(linearFlow(ListMap(
      "warm" -> Nil, "work" -> Seq("PBlock"), "done" -> Nil)))
    awaitFile(dir, runA.id,
      n => n.startsWith("t!") && n.endsWith("!work"),
      "the warm->work transition marker")
    // operator pauses the flow THROUGH THE SHARED STORE while engine A
    // is (as far as the store can tell) dead mid-phase
    assert(engineA.requestPause(runA.id))

    val regB = new HandlerRegistry
    regB.register(new OnceCountingHandler("PBlock", 3))
    val engineB = engineOn(dir, regB)
    val recovered = engineB.recoverInflight()
    assert(recovered.size == 1)
    val run = recovered.head
    // the recovered run's first boundary poll consumes the marker:
    // it must park paused BEFORE running the phase's handlers
    val deadline = System.currentTimeMillis() + 60000
    while (!run.isPaused) {
      assert(System.currentTimeMillis() < deadline,
        s"recovered flow never parked paused: ${run.status()}")
      Thread.sleep(25)
    }
    assert(counts.get("PBlock").get() == 0,
      "the paused phase's handler ran before the pause was honored")
    // durable resume: drop the marker, the flow completes under B
    assert(engineB.requestResume(runA.id))
    val result = Await.result(run.future, 2.minutes)
    assert(result.finalPhase == "done")
    assert(counts.get("PBlock").get() == 3)
    assert(run.transitions.map(_.to) ==
      Seq("warm", "work", "paused", "work", "done"))
    release(key)
  }

  test("a journal left behind by a crash BETWEEN the terminal event-log " +
    "append and cleanup is deleted, not resurrected") {
    counts.clear()
    val dir = tmpDir()
    val reg = new HandlerRegistry
    reg.register(new OnceCountingHandler("T1", 2))
    val engineA = engineOn(dir, reg)
    val run = engineA.submit(linearFlow(ListMap(
      "a" -> Seq("T1"), "b" -> Nil)))
    Await.result(run.future, 2.minutes)
    // wait for the terminal flush (event-log append is async of the
    // future completing)
    val deadline = System.currentTimeMillis() + 60000
    while (engineA.finishedFlows().count() == 0) {
      assert(System.currentTimeMillis() < deadline, "terminal flush")
      Thread.sleep(50)
    }
    // reconstruct the crash window: terminal record written, journal
    // cleanup never ran — recreate the journal as the dead engine
    // left it (spec + a transition marker)
    val jd = new java.io.File(s"$dir/inflight/${run.id}")
    assert(jd.mkdirs())
    java.nio.file.Files.write(jd.toPath.resolve("spec.json"),
      FlowSpec.render(run.spec).getBytes("UTF-8"))
    java.nio.file.Files.write(jd.toPath.resolve("t!1!1!!a"),
      Array.emptyByteArray)
    val engineB = engineOn(dir, new HandlerRegistry) // T1 NOT registered:
    // resurrecting would fail resolution loudly — but it must not even try
    assert(engineB.recoverInflight().isEmpty,
      "a durably-terminal flow was resurrected")
    assert(!jd.exists(), "the orphan terminal journal was not cleaned")
    // and T1 ran exactly once, on engine A
    assert(counts.get("T1").get() == 2)
  }

  test("a spec-less journal (marker write raced terminal cleanup) is " +
    "self-healed, not re-logged forever") {
    val dir = tmpDir()
    val jd = new java.io.File(s"$dir/inflight/ghost-flow")
    assert(jd.mkdirs())
    java.nio.file.Files.write(jd.toPath.resolve("t!1!1!!a"),
      Array.emptyByteArray)
    val engine = engineOn(dir, new HandlerRegistry)
    assert(engine.recoverInflight().isEmpty)
    assert(!jd.exists(), "spec-less orphan journal not removed")
  }

  test("a normally-finished flow leaves no journal and is not recovered") {
    counts.clear()
    val dir = tmpDir()
    val reg = new HandlerRegistry
    reg.register(new OnceCountingHandler("N1", 2))
    val engine = engineOn(dir, reg)
    val run = engine.submit(linearFlow(ListMap(
      "a" -> Seq("N1"), "b" -> Nil)))
    Await.result(run.future, 2.minutes)
    assert(!new java.io.File(s"$dir/inflight/${run.id}").exists())
    val engineB = engineOn(dir, new HandlerRegistry)
    assert(engineB.recoverInflight().isEmpty)
  }
}

object CrashRecoverySpec {
  /** Total tasks processed per handler name, across all engines. */
  private val countsMap =
    new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]
  object counts {
    def get(k: String): AtomicInteger =
      countsMap.computeIfAbsent(k, _ => new AtomicInteger(0))
    def clear(): Unit = countsMap.clear()
  }
  private val parks =
    scala.collection.concurrent.TrieMap.empty[String, CountDownLatch]
  def park(key: String): Unit = {
    val l = parks.getOrElseUpdate(key, new CountDownLatch(1))
    l.await(10, TimeUnit.MINUTES)
    // the abandoned engine resumes here only after the test released
    // it — fail its flow loudly rather than let it continue silently
    throw new IllegalStateException("abandoned engine released")
  }
  def release(key: String): Unit =
    parks.getOrElseUpdate(key, new CountDownLatch(1)).countDown()
}

/** Counts processed tasks through a static map (task closures are
  * serialized even in local mode). */
private[flow] class OnceCountingHandler(
    override val name: String, nTasks: Int) extends Handler {
  def enumerate(ctx: HandlerContext): Seq[TaskMsg] =
    (0 until nTasks).map(i =>
      TaskMsg(ctx.flowId, ctx.phase, Map("i" -> i.toString)))
  def process(ctx: HandlerContext, task: TaskMsg): Unit = {
    CrashRecoverySpec.counts.get(name).incrementAndGet(); ()
  }
}

/** Parks forever in `enumerate` (driver-side, so no executor slot is
  * held) — the crash point. A blocked driver thread is exactly what a
  * dead process looks like to the shared store. */
private[flow] class ParkInEnumerate(
    override val name: String, key: String) extends Handler {
  def enumerate(ctx: HandlerContext): Seq[TaskMsg] = {
    CrashRecoverySpec.park(key)
    Seq.empty
  }
  def process(ctx: HandlerContext, task: TaskMsg): Unit = ()
}
