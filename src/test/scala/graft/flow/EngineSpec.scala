package graft.flow

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}
import scala.collection.concurrent.TrieMap
import scala.collection.immutable.ListMap
import scala.concurrent.Await
import scala.concurrent.duration._

import graft.SparkSpec

/** Flow lifecycle semantics (SURVEY.md §2.1/§3): create→phases→finish,
  * fan-out/fan-in barriers, empty-phase short-circuit, pause/resume,
  * cancel, error transitions, counters, transition-log derivation.
  * Mirrors the behavioral contracts of the reference specs
  * (`spec/distribot/flow_spec.rb:304-437` guards,
  * `worker_spec.rb:147-179` counters) without their infrastructure
  * mocks — the engine runs for real on local Spark.
  *
  * Handlers are top-level classes and coordinate through the static
  * `EngineSpec` registries: task closures are serialized even in local
  * mode, and latches/queues aren't serializable.
  */
class EngineSpec extends SparkSpec {
  import EngineSpec._

  private def newEngine(reg: HandlerRegistry) =
    new Engine(spark, reg, EngineConfig(sfDir = "/root/testdata/sf0.001"))

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
    s"""{"name": "t", "phases": [${phases.mkString(",")}]}"""
  }

  test("a three-phase flow runs to completion with task fan-out") {
    processed.clear()
    val reg = new HandlerRegistry
    reg.register(new CountingHandler("H1", 5))
    reg.register(new CountingHandler("H2", 3))
    val engine = newEngine(reg)
    val run = engine.submit(linearFlow(ListMap(
      "start" -> Nil, "work" -> Seq("H1", "H2"), "done" -> Nil)))
    val result = Await.result(run.future, 2.minutes)
    assert(result.finalPhase == "done")
    assert(run.isFinished)
    // all 8 tasks processed exactly the enumerated set (O10-O14)
    assert(processed.toArray.toSet ==
      ((0 until 5).map(i => s"H1/$i") ++ (0 until 3).map(i => s"H2/$i")).toSet)
    // transition log is ordered and complete (O3-O5)
    assert(run.transitions.map(_.to) == Seq("start", "work", "done"))
    assert(run.transitions.map(_.timestampMs).sliding(2).forall {
      case Seq(a, b) => a <= b
      case _ => true
    })
    // O17: finished flows deregister
    assert(engine.find(run.id).isEmpty)
    assert(engine.runningCount == 0)
  }

  test("empty phases short-circuit straight through (O19)") {
    val engine = newEngine(new HandlerRegistry)
    val run = engine.submit(
      """{"phases":[
        |{"name":"a","is_initial":true,"transitions_to":"b"},
        |{"name":"b","transitions_to":"c"},
        |{"name":"c","is_final":true}]}""".stripMargin)
    val result = Await.result(run.future, 1.minute)
    assert(result.finalPhase == "c")
    assert(run.transitions.map(_.to) == Seq("a", "b", "c"))
  }

  test("submit fails fast on unknown handler or unsatisfiable version") {
    val reg = new HandlerRegistry
    reg.register(new CountingHandler("Known", 1))
    val engine = newEngine(reg)
    assertThrows[FlowSpec.InvalidFlow](engine.submit(
      """{"phases":[{"name":"a","is_initial":true,"is_final":true,
        |"handlers":["Ghost"]}]}""".stripMargin))
    assertThrows[FlowSpec.InvalidFlow](engine.submit(
      """{"phases":[{"name":"a","is_initial":true,"is_final":true,
        |"handlers":[{"name":"Known","version":"~> 9.0"}]}]}""".stripMargin))
  }

  test("semver routing picks the highest matching handler (O20)") {
    processed.clear()
    val reg = new HandlerRegistry
    reg.register(new TaggedHandler("V", SemVer(1, 0, 0), "v1.0.0"))
    reg.register(new TaggedHandler("V", SemVer(1, 4, 0), "v1.4.0"))
    reg.register(new TaggedHandler("V", SemVer(2, 0, 0), "v2.0.0"))
    val engine = newEngine(reg)
    val run = engine.submit(
      """{"phases":[{"name":"a","is_initial":true,"is_final":true,
        |"handlers":[{"name":"V","version":"~> 1.0"}]}]}""".stripMargin)
    Await.result(run.future, 1.minute)
    assert(processed.toArray.toSeq == Seq("v1.4.0"))
  }

  test("failing handler takes on_error_transition_to (O34 upgraded)") {
    processed.clear()
    val reg = new HandlerRegistry
    reg.register(new BoomHandler)
    reg.register(new CountingHandler("Reporter", 1))
    val engine = newEngine(reg)
    val run = engine.submit(
      """{"phases":[
        |{"name":"a","is_initial":true,"transitions_to":"b",
        | "on_error_transition_to":"err","handlers":["Boom"]},
        |{"name":"b","is_final":true},
        |{"name":"err","is_final":true,"handlers":["Reporter"]}]}""".stripMargin)
    val result = Await.result(run.future, 1.minute)
    assert(result.finalPhase == "err")
    assert(run.transitions.map(_.to) == Seq("a", "err"))
    assert(processed.toArray.toSet == Set("Reporter/0"))
  }

  test("failing handler without error phase fails the flow future") {
    val reg = new HandlerRegistry
    reg.register(new BoomHandler)
    val engine = newEngine(reg)
    val run = engine.submit(
      """{"phases":[{"name":"a","is_initial":true,"transitions_to":"b",
        |"handlers":["Boom"]},{"name":"b","is_final":true}]}""".stripMargin)
    intercept[Exception](Await.result(run.future, 1.minute))
    assert(run.transitions.map(_.to) == Seq("a"))
    assert(engine.find(run.id).isEmpty)
  }

  test("error-transition ping-pong is bounded: repeated failures " +
    "terminate the flow instead of looping (ADVICE r1)") {
    val reg = new HandlerRegistry
    reg.register(new BoomHandler)
    val engine = newEngine(reg)
    val before = engine.runningCount
    // both phases' chains terminate (validation passes), but their
    // handlers fail into each other forever at runtime
    val run = engine.submit(
      """{"phases":[
        |{"name":"a","is_initial":true,"transitions_to":"z",
        | "on_error_transition_to":"b","handlers":["Boom"]},
        |{"name":"b","transitions_to":"z",
        | "on_error_transition_to":"a","handlers":["Boom"]},
        |{"name":"z","is_final":true}]}""".stripMargin)
    intercept[Exception](Await.result(run.future, 1.minute))
    assert(engine.find(run.id).isEmpty, "failed flow must deregister")
    assert(engine.runningCount == before, "gauge must return to baseline")
  }

  test("pause is phase-granular; resume continues from the paused " +
    "phase; guards mirror the reference (O6-O9)") {
    processed.clear()
    val started = latch("pause.started", 1)
    val gate = latch("pause.gate", 1)
    val reg = new HandlerRegistry
    reg.register(new GateHandler("Slow", "pause.started", "pause.gate"))
    reg.register(new CountingHandler("After", 1))
    val engine = newEngine(reg)
    val run = engine.submit(linearFlow(ListMap(
      "p1" -> Seq("Slow"), "p2" -> Seq("After"), "p3" -> Nil)))
    assert(started.await(30, TimeUnit.SECONDS)) // p1 in flight
    assert(run.pause()) // takes effect at the next phase boundary
    gate.countDown() // let p1 finish
    eventually(run.isPaused, 30000)
    assert(run.transitions.map(_.to).endsWith(Seq("paused")))
    assert(run.currentPhase == "paused")
    assert(!run.pause()) // O6 guard: only running flows pause
    assert(run.resume()) // O7
    val result = Await.result(run.future, 1.minute)
    assert(result.finalPhase == "p3")
    // p1 completed, flow advanced to p2, parked, resumed into p2
    assert(run.transitions.map(_.to) ==
      Seq("p1", "p2", "paused", "p2", "p3"))
    assert(!run.resume()) // O7 guard: only paused flows resume
  }

  test("cancel marks terminal, stops the flow, deregisters (O8)") {
    processed.clear()
    val started = latch("cancel.started", 1)
    latch("cancel.gate", 1) // never opened; cancel interrupts the wait
    val reg = new HandlerRegistry
    reg.register(new GateHandler("Slow", "cancel.started", "cancel.gate"))
    reg.register(new CountingHandler("Never", 1))
    val engine = newEngine(reg)
    val run = engine.submit(linearFlow(ListMap(
      "p1" -> Seq("Slow"), "p2" -> Seq("Never"), "p3" -> Nil)))
    assert(started.await(30, TimeUnit.SECONDS))
    assert(run.cancel())
    intercept[Exception](Await.result(run.future, 1.minute))
    assert(run.isCanceled)
    assert(run.transitions.map(_.to).endsWith(Seq("canceled")))
    assert(!run.cancel()) // O8 guard: cancel is terminal
    assert(engine.find(run.id).isEmpty)
    assert(!processed.toArray.exists(_.toString.startsWith("Never")))
  }

  test("status exposes per-handler progress counters (O28)") {
    val reg = new HandlerRegistry
    reg.register(new CountingHandler("H", 4))
    val engine = newEngine(reg)
    val run = engine.submit(
      """{"phases":[{"name":"a","is_initial":true,"is_final":true,
        |"handlers":["H"]}]}""".stripMargin)
    Await.result(run.future, 1.minute)
    val st = run.status()
    assert(st.state == "Finished")
    val hp = st.handlers.find(_.handler == "H")
    assert(hp.exists(h => h.total == 4 && h.finished == 4))
  }

  test("query handlers run the relational surface through a flow (§2.2)") {
    val reg = new HandlerRegistry
    reg.register(new QueryHandler("Q2", SemVer(1, 0, 0),
      graft.SparkEntry.queries("q02_agg_tpch_q1")))
    val engine = newEngine(reg)
    val run = engine.submit(
      """{"phases":[
        |{"name":"start","is_initial":true,"transitions_to":"agg"},
        |{"name":"agg","transitions_to":"done","handlers":["Q2"]},
        |{"name":"done","is_final":true}]}""".stripMargin)
    val result = Await.result(run.future, 2.minutes)
    assert(result.finalPhase == "done")
  }

  test("cross-phase handoff: phase N materializes a table phase N+1 " +
    "reads (the reference's shared-store handoff, engine-native)") {
    val tmp = java.nio.file.Files.createTempDirectory("handoff").toString
    val reg = new HandlerRegistry
    // phase 1: write distinct customer keys; phase 2: query over them
    reg.register(new MaterializeHandler("WriteKeys", SemVer(1, 0, 0),
      (s, dir) => s.read.parquet(s"$dir/orders.parquet")
        .select(org.apache.spark.sql.functions.col("o_custkey")).distinct(),
      s"$tmp/{flow_id}/keys"))
    reg.register(new QueryHandler("CountKeys", SemVer(1, 0, 0),
      (s, _) => s.read.parquet(s"$tmp/${EngineSpec.lastFlowId}/keys")))
    val engine = newEngine(reg)
    val run = engine.submit(linearFlow(ListMap(
      "write" -> Seq("WriteKeys"), "read" -> Seq("CountKeys"),
      "done" -> Nil)))
    EngineSpec.lastFlowId = run.id
    val result = Await.result(run.future, 2.minutes)
    assert(result.finalPhase == "done")
    // the handoff table exists, namespaced by flow id
    val n = spark.read.parquet(s"$tmp/${run.id}/keys").count()
    assert(n > 0)
  }

  test("concurrent flows are tracked independently (O1-O2 registry)") {
    val reg = new HandlerRegistry
    reg.register(new CountingHandler("H", 2))
    val engine = newEngine(reg)
    val runs = (1 to 3).map { _ =>
      engine.submit(
        """{"phases":[{"name":"a","is_initial":true,"is_final":true,
          |"handlers":["H"]}]}""".stripMargin)
    }
    assert(runs.map(_.id).distinct.size == 3)
    runs.foreach(r => Await.result(r.future, 1.minute))
    assert(engine.runningCount == 0)
  }

  test("property: random valid phase chains always terminate " +
    "(SURVEY §5 plan item 2)") {
    val reg = new HandlerRegistry
    reg.register(new CountingHandler("H", 1))
    val engine = newEngine(reg)
    val rnd = new scala.util.Random(42)
    val runs = (1 to 10).map { i =>
      val n = 1 + rnd.nextInt(8)
      val names = (0 until n).map(j => s"ph$j")
      val handlers = ListMap(names.map(nm =>
        nm -> (if (rnd.nextBoolean()) Seq("H") else Nil)): _*)
      engine.submit(linearFlow(handlers)) -> n
    }
    runs.foreach { case (run, n) =>
      val result = Await.result(run.future, 2.minutes)
      assert(result.finalPhase == s"ph${n - 1}")
      assert(run.transitions.size == n)
    }
    assert(engine.runningCount == 0)
  }

  test("transition log is durable: a finished flow stays queryable " +
    "from the parquet event log, even from a fresh engine (O4)") {
    val tmp = java.nio.file.Files.createTempDirectory("evlog").toString
    val reg = new HandlerRegistry
    reg.register(new CountingHandler("H", 2))
    val engine = new Engine(spark, reg,
      EngineConfig(sfDir = "/root/testdata/sf0.001",
        eventLogDir = Some(tmp)))
    val run = engine.submit(linearFlow(ListMap(
      "start" -> Seq("H"), "done" -> Nil)))
    Await.result(run.future, 1.minute)
    assert(engine.find(run.id).isEmpty) // gone from the active set...
    val logged = engine.transitionLog()
      .filter(org.apache.spark.sql.functions.col("flowId") === run.id)
    assert(logged.count() == 2) // ...but its full history survives
    // and a brand-new engine over the same log dir sees it too
    val fresh = new Engine(spark, reg,
      EngineConfig(sfDir = "/root/testdata/sf0.001",
        eventLogDir = Some(tmp)))
    assert(fresh.transitionLog()
      .filter(org.apache.spark.sql.functions.col("flowId") === run.id)
      .count() == 2)
    val rec = fresh.finishedFlows()
      .filter(org.apache.spark.sql.functions.col("flow_id") === run.id)
      .collect()
    assert(rec.length == 1)
    assert(rec(0).getAs[String]("final_state") == "Finished")
    // the logged spec round-trips through the parser
    val spec = FlowSpec.parse(rec(0).getAs[String]("spec_json"))
    assert(spec.phases.map(_.name) == Seq("start", "done"))
  }

  test("flow-finished broadcast reaches every registered listener " +
    "(O24 fanout)") {
    val reg = new HandlerRegistry
    reg.register(new CountingHandler("H", 1))
    val engine = newEngine(reg)
    val heard = new ConcurrentLinkedQueue[String]()
    engine.onFlowFinished(r => { heard.add(s"a:${r.flowId}"); () })
    engine.onFlowFinished(_ => throw new RuntimeException("bad listener"))
    engine.onFlowFinished(r => { heard.add(s"b:${r.flowId}"); () })
    val run = engine.submit(
      """{"phases":[{"name":"a","is_initial":true,"is_final":true,
        |"handlers":["H"]}]}""".stripMargin)
    Await.result(run.future, 1.minute)
    eventually(heard.size == 2, 10000)
    assert(heard.toArray.toSet ==
      Set(s"a:${run.id}", s"b:${run.id}"),
      "both good listeners fire; the throwing one is isolated")
  }

  test("query-handler progress ticks per partition while the query " +
    "runs (in-phase progress, examples/status parity)") {
    val reg = new HandlerRegistry
    reg.register(new QueryHandler("SlowQ", SemVer(1, 0, 0), (s, _) => {
      import s.implicits._
      // 6 partitions, each ~300 ms: a query long enough to observe
      s.range(0, 6, 1, 6).map { i => Thread.sleep(300); i }.toDF("v")
    }))
    val engine = newEngine(reg)
    val run = engine.submit(
      """{"phases":[{"name":"a","is_initial":true,"is_final":true,
        |"handlers":["SlowQ"]}]}""".stripMargin)
    // poll status() while the phase runs; record mid-flight counters
    val sawPartial = new java.util.concurrent.atomic.AtomicBoolean(false)
    val deadline = System.currentTimeMillis() + 60000
    while (!run.isFinished && System.currentTimeMillis() < deadline) {
      run.status().handlers.find(_.handler == "SlowQ").foreach { h =>
        if (h.finished > 0 && h.finished < h.total) sawPartial.set(true)
      }
      Thread.sleep(20)
    }
    Await.result(run.future, 1.minute)
    assert(sawPartial.get,
      "status() must show 0 < finished < total mid-query")
    val hp = run.status().handlers.find(_.handler == "SlowQ").get
    assert(hp.total == 6 && hp.finished == 6)
  }

  test("pauseNow interrupts mid-phase; resume re-runs only the " +
    "incomplete handler (completed-handler checkpointing)") {
    processed.clear()
    val started = latch("pausenow.started", 1)
    val reg = new HandlerRegistry
    reg.register(new CountingHandler("Fast", 1))
    reg.register(new GateHandler("Slow", "pausenow.started", "pausenow.gate"))
    val engine = newEngine(reg)
    val run = engine.submit(linearFlow(ListMap(
      "work" -> Seq("Fast", "Slow"), "done" -> Nil)))
    assert(started.await(30, TimeUnit.SECONDS)) // Slow is in flight
    // wait for Fast to be checkpointed, then pause mid-phase
    eventually(run.checkpointedHandlers.contains(("work", "Fast")), 30000)
    assert(run.pauseNow())
    eventually(run.isPaused, 30000)
    assert(run.transitions.map(_.to).endsWith(Seq("paused")))
    latch("pausenow.gate", 1).countDown() // let Slow pass next time
    assert(run.resume())
    val result = Await.result(run.future, 1.minute)
    assert(result.finalPhase == "done")
    // Fast's task processed exactly once across both phase attempts
    assert(processed.toArray.count(_ == "Fast/0") == 1,
      "checkpointed handler must not re-run on resume")
    assert(run.transitions.map(_.to) ==
      Seq("work", "paused", "work", "done"))
  }

  test("dataset-enumerating handler fans out without driver " +
    "materialization (O10 at scale)") {
    processed.clear()
    val reg = new HandlerRegistry
    reg.register(new DatasetHandler("FromTable"))
    val engine = newEngine(reg)
    val run = engine.submit(
      """{"phases":[{"name":"a","is_initial":true,"is_final":true,
        |"handlers":["FromTable"]}]}""".stripMargin)
    Await.result(run.future, 2.minutes)
    // one task per region row (5 in the fixture), all processed
    val st = run.status().handlers.find(_.handler == "FromTable").get
    assert(st.total == 5 && st.finished == 5)
    assert(processed.toArray.count(_.toString.startsWith("FromTable/")) == 5)
  }

  test("controller keeps the fleet at the concurrency target until " +
    "the total is reached (examples/controller parity)") {
    processed.clear()
    val reg = new HandlerRegistry
    reg.register(new CountingHandler("H", 1))
    val engine = newEngine(reg)
    val spec = FlowSpec.parse(
      """{"phases":[{"name":"a","is_initial":true,"is_final":true,
        |"handlers":["H"]}]}""".stripMargin)
    val ctl = new Controller(engine, _ => spec,
      maxConcurrent = 3, targetTotal = 10)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val watcher = new Thread(() => {
      while (ctl.finishedCount < 10) {
        maxSeen.getAndUpdate(m => math.max(m, engine.runningCount))
        Thread.sleep(5)
      }
    })
    watcher.setDaemon(true)
    watcher.start()
    ctl.start()
    assert(ctl.awaitDone(120000), "controller must complete the fleet")
    assert(ctl.finishedCount >= 10)
    assert(ctl.ratePerSec > 0)
    assert(maxSeen.get() <= 3, s"ran ${maxSeen.get()} > maxConcurrent")
    eventually(engine.runningCount == 0, 30000)
  }

  test("terminal broadcast fires for failed and canceled flows " +
    "(ADVICE r3: success-only broadcast leaked controller slots)") {
    val reg = new HandlerRegistry
    reg.register(new BoomHandler)
    reg.register(new GateHandler("Gate", "term.started", "term.gate"))
    val engine = newEngine(reg)
    val heard = new ConcurrentLinkedQueue[String]()
    engine.onFlowTerminal(ev => { heard.add(s"${ev.state}:${ev.flowId}"); () })
    val bad = engine.submit(
      """{"phases":[{"name":"a","is_initial":true,"is_final":true,
        |"handlers":["Boom"]}]}""".stripMargin)
    assertThrows[RuntimeException](Await.result(bad.future, 1.minute))
    val gated = engine.submit(
      """{"phases":[{"name":"a","is_initial":true,"is_final":true,
        |"handlers":["Gate"]}]}""".stripMargin)
    assert(latch("term.started", 1).await(30, TimeUnit.SECONDS))
    assert(gated.cancel())
    assert(scala.util.Try(Await.result(gated.future, 1.minute)).isFailure)
    eventually(heard.size == 2, 30000)
    assert(heard.toArray.toSet ==
      Set(s"Failed:${bad.id}", s"Canceled:${gated.id}"))
  }

  test("controller respawns failed flows and still completes the " +
    "success budget (ADVICE r3)") {
    processed.clear()
    val reg = new HandlerRegistry
    reg.register(new CountingHandler("H", 1))
    reg.register(new BoomHandler)
    val engine = newEngine(reg)
    val good = FlowSpec.parse(
      """{"phases":[{"name":"a","is_initial":true,"is_final":true,
        |"handlers":["H"]}]}""".stripMargin)
    val bad = FlowSpec.parse(
      """{"phases":[{"name":"a","is_initial":true,"is_final":true,
        |"handlers":["Boom"]}]}""".stripMargin)
    // every 3rd spawn fails: without terminal-event respawn the fleet
    // would leak a slot per failure and never reach the target
    val ctl = new Controller(engine,
      idx => if (idx % 3 == 0) bad else good,
      maxConcurrent = 2, targetTotal = 6)
    ctl.start()
    assert(ctl.awaitDone(120000),
      "fleet must reach 6 successes despite injected failures")
    assert(ctl.finishedCount >= 6)
    assert(ctl.failedCount >= 1, "at least one Boom flow terminated")
    eventually(engine.runningCount == 0, 30000)
  }

  test("cross-process control: engine B cancels a flow submitted by " +
    "engine A via the shared event-log dir (reference flow.rb:70-80)") {
    processed.clear()
    val tmp = java.nio.file.Files.createTempDirectory("xctl").toString
    val reg = new HandlerRegistry
    reg.register(new GateHandler("Slow", "xctl.started", "xctl.gate"))
    reg.register(new CountingHandler("Never", 1))
    val cfg = EngineConfig(sfDir = "/root/testdata/sf0.001",
      eventLogDir = Some(tmp))
    val engineA = new Engine(spark, reg, cfg)
    val engineB = new Engine(spark, new HandlerRegistry, cfg)
    val run = engineA.submit(linearFlow(ListMap(
      "p1" -> Seq("Slow"), "p2" -> Seq("Never"), "p3" -> Nil)))
    assert(latch("xctl.started", 1).await(30, TimeUnit.SECONDS))
    // B does not own the flow...
    assert(engineB.find(run.id).isEmpty)
    // ...but its durable cancel intent reaches A's FSM
    assert(engineB.requestCancel(run.id))
    assert(engineB.controlIntents().collect()
      .exists(r => r.getString(0) == run.id && r.getString(1) == "cancel"))
    latch("xctl.gate", 1).countDown() // let the phase finish its task
    intercept[Exception](Await.result(run.future, 1.minute))
    assert(run.isCanceled)
    // the flow stopped at the phase boundary and LOGGED the transition
    assert(run.transitions.map(_.to).endsWith(Seq("canceled")))
    assert(!processed.toArray.exists(_.toString.startsWith("Never")),
      "phase p2 must never start after a durable cancel")
    // terminal cleanup: the marker is consumed
    eventually(engineB.controlIntents()
      .filter(org.apache.spark.sql.functions.col("flow_id") === run.id)
      .count() == 0, 10000)
    // and the durable event log has the canceled flow's history
    assert(engineB.transitionLog()
      .filter(org.apache.spark.sql.functions.col("flowId") === run.id)
      .count() >= 2)
  }

  test("cross-process control: durable pause parks the flow at the " +
    "boundary; durable resume continues it (flow.rb:82-101)") {
    processed.clear()
    val tmp = java.nio.file.Files.createTempDirectory("xctl2").toString
    val reg = new HandlerRegistry
    reg.register(new GateHandler("Slow", "xctl2.started", "xctl2.gate"))
    reg.register(new CountingHandler("After", 2))
    val cfg = EngineConfig(sfDir = "/root/testdata/sf0.001",
      eventLogDir = Some(tmp))
    val engineA = new Engine(spark, reg, cfg)
    val engineB = new Engine(spark, new HandlerRegistry, cfg)
    val run = engineA.submit(linearFlow(ListMap(
      "p1" -> Seq("Slow"), "p2" -> Seq("After"), "p3" -> Nil)))
    assert(latch("xctl2.started", 1).await(30, TimeUnit.SECONDS))
    assert(engineB.requestPause(run.id))
    latch("xctl2.gate", 1).countDown()
    // the flow parks as Paused at the p1/p2 boundary
    eventually(run.isPaused, 30000)
    assert(run.transitions.map(_.to).endsWith(Seq("paused")))
    assert(!processed.toArray.exists(_.toString.startsWith("After")))
    // durable resume from B: marker drops, A's poll continues the flow
    assert(engineB.requestResume(run.id))
    val result = Await.result(run.future, 1.minute)
    assert(result.finalPhase == "p3")
    assert(run.isFinished)
    // resume re-entered the last real phase before moving on
    val tos = run.transitions.map(_.to)
    assert(tos.containsSlice(Seq("paused", "p2", "p3")))
  }

  test("cross-process control: a pause requested on the OWNING engine " +
    "is still resumable from engine B (the intent travels as a marker " +
    "even locally, so remote resume works — r5 review fix)") {
    processed.clear()
    val tmp = java.nio.file.Files.createTempDirectory("xctl3").toString
    val reg = new HandlerRegistry
    reg.register(new GateHandler("Slow", "xctl3.started", "xctl3.gate"))
    reg.register(new CountingHandler("After", 2))
    val cfg = EngineConfig(sfDir = "/root/testdata/sf0.001",
      eventLogDir = Some(tmp))
    val engineA = new Engine(spark, reg, cfg)
    val engineB = new Engine(spark, new HandlerRegistry, cfg)
    val run = engineA.submit(linearFlow(ListMap(
      "p1" -> Seq("Slow"), "p2" -> Seq("After"), "p3" -> Nil)))
    assert(latch("xctl3.started", 1).await(30, TimeUnit.SECONDS))
    // the OWNER requests the pause (pre-fix this parked the flow in a
    // state only a local resume() could leave)
    assert(engineA.requestPause(run.id))
    latch("xctl3.gate", 1).countDown()
    eventually(run.isPaused, 30000)
    // engine B's resume — which only drops the marker — must wake it
    assert(engineB.requestResume(run.id))
    val result = Await.result(run.future, 1.minute)
    assert(result.finalPhase == "p3")
    assert(run.isFinished)
  }

  test("cross-process control: intents for a known-terminal flow are " +
    "rejected without writing an orphan marker; the janitor clears " +
    "markers with no living owner") {
    val tmp = java.nio.file.Files.createTempDirectory("xctl4").toString
    val reg = new HandlerRegistry
    reg.register(new CountingHandler("Quick", 1))
    val cfg = EngineConfig(sfDir = "/root/testdata/sf0.001",
      eventLogDir = Some(tmp))
    val engineA = new Engine(spark, reg, cfg)
    val run = engineA.submit(linearFlow(ListMap("p1" -> Seq("Quick"))))
    Await.result(run.future, 1.minute)
    eventually(engineA.find(run.id).isEmpty, 10000)
    // terminal flow: no marker written, delivery reported false
    assert(!engineA.requestCancel(run.id))
    assert(!engineA.requestPause(run.id))
    assert(engineA.controlIntents()
      .filter(org.apache.spark.sql.functions.col("flow_id") === run.id)
      .count() == 0)
    // an intent for an id nobody owns (typo / dead owner) is durable,
    // visible, and manually clearable
    assert(engineA.requestCancel("no-such-flow"))
    assert(engineA.controlIntents().collect()
      .exists(_.getString(0) == "no-such-flow"))
    engineA.clearControlIntents("no-such-flow")
    assert(engineA.controlIntents()
      .filter(org.apache.spark.sql.functions.col("flow_id") === "no-such-flow")
      .count() == 0)
  }

  test("deployment-is-registration: engine B discovers and " +
    "semver-resolves handlers announced by engine A " +
    "(phase_started_handler.rb:45-67 analogue)") {
    val tmp = java.nio.file.Files.createTempDirectory("xreg").toString
    val cfg = EngineConfig(sfDir = "/root/testdata/sf0.001",
      eventLogDir = Some(tmp))
    val regA = new HandlerRegistry
    regA.register(new TaggedHandler("Worker", SemVer(1, 2, 0), "a"))
    regA.register(new TaggedHandler("Worker", SemVer(1, 5, 3), "b"))
    regA.register(new TaggedHandler("Worker", SemVer(2, 0, 0), "c"))
    regA.register(new CountingHandler("Other", 1))
    val engineA = new Engine(spark, regA, cfg)
    assert(engineA.announceHandlers() == 4)
    // B has NO local handlers, but sees the fleet's capability map
    val engineB = new Engine(spark, new HandlerRegistry, cfg)
    assert(engineB.registry.names.isEmpty)
    val fleet = engineB.fleetHandlers()
    assert(fleet.keySet == Set("Worker", "Other"))
    assert(fleet("Worker") ==
      Seq(SemVer(1, 2, 0), SemVer(1, 5, 3), SemVer(2, 0, 0)))
    // gem-style pessimistic constraint resolves to the best 1.x
    assert(engineB.fleetResolve(HandlerRef("Worker", Some("~> 1.0")))
      .contains(SemVer(1, 5, 3)))
    assert(engineB.fleetResolve(HandlerRef("Worker", None))
      .contains(SemVer(2, 0, 0)))
    assert(engineB.fleetResolve(HandlerRef("Missing", None)).isEmpty)
    // re-announce is idempotent (marker overwrite, same fleet view)
    assert(engineA.announceHandlers() == 4)
    assert(engineB.fleetHandlers()("Worker").size == 3)
    // age-based liveness: a cutoff in the future (negative maxAge)
    // deterministically excludes every marker — the mechanism that
    // drops engines which stopped re-announcing
    assert(engineB.fleetHandlers(maxAgeMs = Some(-60000L)).isEmpty)
    assert(engineB.fleetHandlers(maxAgeMs = Some(3600000L))
      .keySet == Set("Worker", "Other"))
    // a second engine's announcements coexist; graceful retraction
    // removes ONLY the retracting engine's markers
    val regC = new HandlerRegistry
    regC.register(new TaggedHandler("Worker", SemVer(3, 0, 0), "d"))
    val engineC = new Engine(spark, regC, cfg)
    assert(engineC.announceHandlers() == 1)
    assert(engineB.fleetHandlers()("Worker").size == 4)
    assert(engineC.retractHandlers() == 1)
    assert(engineB.fleetHandlers()("Worker") ==
      Seq(SemVer(1, 2, 0), SemVer(1, 5, 3), SemVer(2, 0, 0)))
    assert(engineA.retractHandlers() == 4)
    assert(engineB.fleetHandlers().isEmpty)
  }

  private def eventually(cond: => Boolean, timeoutMs: Long): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(cond)
  }
}

object EngineSpec {
  val processed = new ConcurrentLinkedQueue[String]()
  @volatile var lastFlowId: String = ""
  private val latches = TrieMap.empty[String, CountDownLatch]
  def latch(key: String, n: Int): CountDownLatch =
    latches.getOrElseUpdate(key, new CountDownLatch(n))
}

/** Enumerates n tasks; records each processed task. */
private[flow] class CountingHandler(
    override val name: String,
    nTasks: Int,
    override val version: SemVer = SemVer(1, 0, 0))
    extends Handler {
  def enumerate(ctx: HandlerContext): Seq[TaskMsg] =
    (0 until nTasks).map(i =>
      TaskMsg(ctx.flowId, ctx.phase, Map("i" -> i.toString)))
  def process(ctx: HandlerContext, task: TaskMsg): Unit = {
    EngineSpec.processed.add(s"$name/${task.payload("i")}"); ()
  }
}

/** Records a fixed tag — used to observe which version was routed. */
private[flow] class TaggedHandler(
    override val name: String,
    override val version: SemVer,
    tag: String) extends Handler {
  def enumerate(ctx: HandlerContext): Seq[TaskMsg] =
    Seq(TaskMsg(ctx.flowId, ctx.phase, Map("tag" -> tag)))
  def process(ctx: HandlerContext, task: TaskMsg): Unit = {
    EngineSpec.processed.add(task.payload("tag")); ()
  }
}

/** Enumerates one task per `region` row as a Dataset — the
  * distributed O10 form (nothing driver-side). */
private[flow] class DatasetHandler(override val name: String)
    extends Handler {
  def enumerate(ctx: HandlerContext): Seq[TaskMsg] =
    throw new IllegalStateException("driver path must not be used")
  override def enumerateDataset(ctx: HandlerContext)
      : Option[org.apache.spark.sql.Dataset[TaskMsg]] = {
    val spark = ctx.spark
    import spark.implicits._
    val flowId = ctx.flowId
    val phase = ctx.phase
    Some(spark.read.parquet(s"${ctx.sfDir}/region.parquet")
      .select(org.apache.spark.sql.functions.col("r_regionkey"))
      .as[Long]
      .map(k => TaskMsg(flowId, phase, Map("key" -> k.toString))))
  }
  def process(ctx: HandlerContext, task: TaskMsg): Unit = {
    EngineSpec.processed.add(s"$name/${task.payload("key")}"); ()
  }
}

/** Fails enumeration (exercises error transitions). */
private[flow] class BoomHandler extends Handler {
  override val name = "Boom"
  def enumerate(ctx: HandlerContext): Seq[TaskMsg] =
    throw new RuntimeException("injected failure")
  def process(ctx: HandlerContext, task: TaskMsg): Unit = ()
}

/** Signals `startedKey` when processing begins, then blocks on
  * `gateKey` (interruptible) — lets tests pause/cancel mid-phase. */
private[flow] class GateHandler(
    override val name: String,
    startedKey: String,
    gateKey: String) extends Handler {
  def enumerate(ctx: HandlerContext): Seq[TaskMsg] =
    Seq(TaskMsg(ctx.flowId, ctx.phase, Map.empty))
  def process(ctx: HandlerContext, task: TaskMsg): Unit = {
    EngineSpec.latch(startedKey, 1).countDown()
    EngineSpec.latch(gateKey, 1).await(30, TimeUnit.SECONDS)
    ()
  }
}
