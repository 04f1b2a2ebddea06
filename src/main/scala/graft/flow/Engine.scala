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

/** Engine configuration (SURVEY.md §2.1 O32).
  *
  * @param eventLogDir when set, every finished/failed/canceled flow's
  *   transitions and definition are appended as parquet under this
  *   directory — the durable, cross-process audit the reference keeps
  *   in Redis (`flow.rb:126-134`, `flow.rb:54-60`). `None` keeps the
  *   log driver-local (tests, throwaway sessions).
  */
final case class EngineConfig(
    sfDir: String = "/root/testdata/sf0.001",
    taskPartitions: Int = 8,
    eventLogDir: Option[String] = None)

/** One transition-log record (O3-O4): event-sourced, state derived by
  * timestamp order (`/root/reference/lib/distribot/flow.rb:126-143`). */
final case class Transition(flowId: String, from: String, to: String,
    timestampMs: Long)

final case class FlowResult(flowId: String, finalPhase: String,
    transitions: Seq[Transition])

/** Terminal event for ANY flow outcome — Finished, Failed, or
  * Canceled (ADVICE r3: success-only broadcast leaked concurrency
  * slots in the controller when a flow failed). */
final case class FlowTerminal(flowId: String, state: String,
    finalPhase: String, transitions: Seq[Transition])

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
  // terminal flows whose event-log flush is still in flight: consulted
  // by transitionLog() so a flow is never in neither store
  private val flushing = TrieMap.empty[String, FlowRun]
  private val runningGauge = new AtomicInteger(0) // O1/O17 gauge
  private val finishListeners =
    new java.util.concurrent.CopyOnWriteArrayList[FlowResult => Unit]
  private val terminalListeners =
    new java.util.concurrent.CopyOnWriteArrayList[FlowTerminal => Unit]
  // concurrent flows finish on independent threads, but parquet
  // appends to one path share a FileOutputCommitter _temporary staging
  // dir — one job's commit/cleanup can delete another's staged files
  // (ADVICE r3). All event-log appends funnel through this lock.
  private val eventLogLock = new Object
  private implicit val ec: ExecutionContext = ExecutionContext.global

  /** O24: completion broadcast — every registered listener is invoked
    * for every flow that finishes successfully, the reference's
    * fanout-exchange `flow.finished` announcement
    * (`connector.rb:134-138`, `flow_finished_handler.rb:10`) without
    * the broker. Listeners run on the flow's completion thread; a
    * throwing listener is isolated (logged, others still fire). */
  def onFlowFinished(listener: FlowResult => Unit): Unit =
    finishListeners.add(listener)

  private[flow] def notifyFinished(result: FlowResult): Unit =
    finishListeners.forEach { l =>
      Try(l(result)).failed.foreach(e =>
        System.err.println(s"[engine] flow-finished listener failed: $e"))
    }

  /** Terminal broadcast: fires for EVERY flow leaving the engine —
    * Finished, Failed, or Canceled — from `deregister`, so a listener
    * driving respawn/accounting (the Controller) never misses a slot.
    * `onFlowFinished` remains the success-only channel (the
    * reference's `flow.finished` fanout). */
  def onFlowTerminal(listener: FlowTerminal => Unit): Unit =
    terminalListeners.add(listener)

  private def notifyTerminal(ev: FlowTerminal): Unit =
    terminalListeners.forEach { l =>
      Try(l(ev)).failed.foreach(e =>
        System.err.println(s"[engine] flow-terminal listener failed: $e"))
    }

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
    journalSubmit(run) // durable spec BEFORE the first transition
    run.start()
    run
  }

  /** O2: lookup. */
  def find(id: String): Option[FlowRun] = active.get(id)
  def activeFlows: Seq[FlowRun] = active.values.toSeq
  def runningCount: Int = runningGauge.get()

  // O17: decr gauge + deregister. Idempotent — runLoop's normal exit
  // and start()'s catch-all escape hatch may both reach here (the
  // active.remove guard keeps the event-log append exactly-once).
  // While the durable flush is in flight the run sits in `flushing`,
  // which transitionLog() consults — so a terminal flow is never in
  // neither store (ADVICE r3: the old remove-then-append left a
  // multi-hundred-ms window where it was invisible).
  private[flow] def deregister(run: FlowRun): Unit =
    if (active.remove(run.id).isDefined) {
      flushing.put(run.id, run)
      runningGauge.decrementAndGet()
      val st = run.status().state
      // a crash that escapes runLoop can reach here still "Running"
      val terminalState =
        if (st == "Running" || st == "Paused") "Failed" else st
      notifyTerminal(FlowTerminal(run.id, terminalState, run.currentPhase,
        run.transitions))
      appendEventLog(run)
      rememberTerminal(run.id)
      clearControls(run.id)
      clearInflight(run.id) // terminal: the event-log parquet is now
      // the record; the in-flight journal would otherwise re-run a
      // finished flow at the next recovery scan
      flushing.remove(run.id)
    }

  // terminal ids this engine has seen (bounded): lets request* reject
  // control intents for flows known to be finished instead of writing
  // a marker no owner will ever consume (orphan-marker hygiene)
  private val terminalIds =
    java.util.Collections.newSetFromMap(
      new java.util.LinkedHashMap[String, java.lang.Boolean](64, 0.75f, false) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.lang.Boolean]): Boolean =
          size() > 10000
      })
  private def rememberTerminal(id: String): Unit =
    terminalIds.synchronized { terminalIds.add(id); () }
  private def knownTerminal(id: String): Boolean =
    terminalIds.synchronized(terminalIds.contains(id))

  /** O4 durability: append the finished flow's transitions and its
    * definition to `$eventLogDir/{transitions,flows}` parquet. Each
    * flow is one small append task — at fleet scale this would be the
    * batched sink of a Structured Streaming event feed
    * (`streaming/FlowStateStream`), but the schema and read path are
    * identical. Log IO must never fail the flow: errors are noted and
    * swallowed. */
  private def appendEventLog(run: FlowRun): Unit =
    config.eventLogDir.foreach { dir =>
      Try { eventLogLock.synchronized {
        import spark.implicits._
        run.transitions.toDF()
          .write.mode("append").parquet(s"$dir/transitions")
        Seq((run.id, run.spec.name.getOrElse(""), run.status().state,
          FlowSpec.render(run.spec), System.currentTimeMillis()))
          .toDF("flow_id", "name", "final_state", "spec_json",
            "finished_at_ms")
          .write.mode("append").parquet(s"$dir/flows")
      } }.failed.foreach(e =>
        System.err.println(s"[engine] event-log append failed for " +
          s"${run.id}: $e"))
    }

  // ---- cross-process flow control (O6-O8 across engine instances) ----
  // The reference lets ANY process `Flow.find(id)` then
  // `pause!/resume!/cancel!` it — control state lives in the shared
  // Redis store (`flow.rb:20-24,54-60,70-101`). Here the shared store
  // is `eventLogDir`: a control INTENT is a durable marker file under
  // `$eventLogDir/controls/` (`<flowId>.cancel` / `<flowId>.pause`;
  // resume = deleting the pause marker). The owning engine's FSM
  // consults the markers at every phase boundary and while parked in
  // the paused state, so a flow submitted by engine A stops/pauses/
  // resumes on request from engine B sharing the directory. Markers
  // are tiny FS metadata ops on the shared store — two exists() calls
  // per phase boundary, nothing per task.

  private def controlsDir: Option[org.apache.hadoop.fs.Path] =
    config.eventLogDir.map(d => new org.apache.hadoop.fs.Path(s"$d/controls"))

  private def controlFs(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeMarker(flowId: String, action: String): Boolean =
    controlsDir.exists { base =>
      Try {
        val fs = controlFs(base)
        fs.mkdirs(base)
        fs.create(new org.apache.hadoop.fs.Path(base, s"$flowId.$action"),
          true).close()
        true
      }.getOrElse(false)
    }

  private def dropMarker(flowId: String, action: String): Boolean =
    controlsDir.exists { base =>
      Try(controlFs(base)
        .delete(new org.apache.hadoop.fs.Path(base, s"$flowId.$action"),
          false)).getOrElse(false)
    }

  /** Durable (cancelRequested, pauseRequested) intents for a flow —
    * polled by the owning FlowRun's FSM. No event-log dir → Some
    * constant-false. A store READ FAILURE returns None: "cannot read
    * the store" must not be conflated with "no marker", or one I/O
    * blip would silently auto-resume a marker-paused flow (or skip a
    * pending cancel for that boundary). */
  private[flow] def durableControls(flowId: String)
      : Option[(Boolean, Boolean)] =
    controlsDir.fold(Option((false, false))) { base =>
      Try {
        val fs = controlFs(base)
        (fs.exists(new org.apache.hadoop.fs.Path(base, s"$flowId.cancel")),
          fs.exists(new org.apache.hadoop.fs.Path(base, s"$flowId.pause")))
      }.toOption
    }

  /** Cancel a flow owned by this OR any other engine sharing
    * `eventLogDir` (reference `flow.rb:70-80` `cancel!` from anywhere).
    * Local flows cancel immediately; remote ones at their owner's next
    * phase boundary (batch control is phase-granular, SURVEY §7.4).
    * Flows this engine knows are terminal are rejected without writing
    * a marker no owner would ever consume. Returns true if the intent
    * was delivered locally or durably. */
  def requestCancel(flowId: String): Boolean =
    find(flowId) match {
      case Some(run) => run.cancel()
      case None if knownTerminal(flowId) => false
      case None => writeMarker(flowId, "cancel")
    }

  /** Durable pause intent (reference `flow.rb:82-91` `pause!`). When a
    * shared store exists the intent ALWAYS travels as a marker — even
    * for a locally-owned flow — so the pause is attributed to the
    * marker and a later `requestResume` from ANY engine (which only
    * drops the marker) resumes it; a direct local `pause()` would park
    * the flow in a state only a local `resume()` can leave. Without a
    * store, falls back to the local pause. */
  def requestPause(flowId: String): Boolean =
    if (controlsDir.isDefined) {
      if (knownTerminal(flowId)) false
      else writeMarker(flowId, "pause")
    } else find(flowId).exists(_.pause())

  /** Durable resume: drops the pause marker; a flow paused BY MARKER
    * resumes at its next poll (reference `flow.rb:93-101` `resume!`).
    * Also resumes a locally-paused flow on this engine directly. */
  def requestResume(flowId: String): Boolean = {
    val dropped = dropMarker(flowId, "pause")
    val local = find(flowId).exists(_.resume())
    dropped || local
  }

  /** Terminal flows clean their markers up (a cancel marker must not
    * outlive the flow and confuse an id reuse — ids are UUIDs, this is
    * pure hygiene). */
  private[flow] def clearControls(flowId: String): Unit = {
    dropMarker(flowId, "cancel")
    dropMarker(flowId, "pause")
    ()
  }

  /** Admin janitor: drop control markers for a flow id with no living
    * owner (e.g. an intent written for a mistyped id, or for a flow
    * whose owner engine died before its terminal flush consumed the
    * marker). The owning engine cleans up automatically on terminal;
    * this is the manual path for everything else. */
  def clearControlIntents(flowId: String): Unit = clearControls(flowId)

  // ---- crash recovery: durable in-flight journal ----
  // In the reference every flow's state outlives every process — any
  // daemon can `Flow.find(id)` and continue it, because the FSM lives
  // in the shared Redis store (`flow.rb:54-60,126-143`). The terminal
  // event log alone cannot give that: a flow killed mid-phase has
  // written nothing durable. The journal is the in-flight twin of the
  // controls markers: under `$eventLogDir/inflight/<flowId>/`,
  //   spec.json       — the parsed FlowSpec, written once at submit
  //   t!<seq>!<ts>!<encFrom>!<encTo>
  //                   — one empty marker per transition (phase
  //                     boundaries only, never per task)
  //   h!<encPhase>!<encHandler>
  //                   — mid-phase handler checkpoint; dropped when the
  //                     phase completes (mirrors `completedHandlers`,
  //                     so an error loop-back still re-runs in full)
  // and the whole directory is deleted on terminal (the event-log
  // parquet is then the record). '!' is the separator because
  // URLEncoder always escapes it, so encoded names can never collide
  // with it. Cost model: a handful of tiny FS metadata ops per PHASE,
  // exactly the controls-marker budget — nothing on the task path.
  // Journal IO must never fail the flow: errors are noted + swallowed
  // (the flow still runs; it just can't be crash-recovered).

  private def inflightDir(flowId: String): Option[org.apache.hadoop.fs.Path] =
    config.eventLogDir.map(d =>
      new org.apache.hadoop.fs.Path(s"$d/inflight/$flowId"))

  private def journalNote(flowId: String, e: Throwable): Unit =
    System.err.println(s"[engine] inflight journal write failed for " +
      s"$flowId: $e")

  private[flow] def journalSubmit(run: FlowRun): Unit =
    inflightDir(run.id).foreach { dir =>
      Try {
        val fs = controlFs(dir)
        fs.mkdirs(dir)
        val out = fs.create(
          new org.apache.hadoop.fs.Path(dir, "spec.json"), true)
        try out.write(FlowSpec.render(run.spec).getBytes("UTF-8"))
        finally out.close()
      }.failed.foreach(journalNote(run.id, _))
    }

  private[flow] def journalTransition(flowId: String, seq: Int,
      t: Transition): Unit =
    inflightDir(flowId).foreach { dir =>
      Try {
        val fs = controlFs(dir)
        // exists-then-create is a TOCTOU window against a concurrent
        // terminal cleanup (create() recreates missing parents): a
        // lost race leaves a spec-less dir, which recoverInflight
        // self-heals (deletes) on its next scan — bounded orphan, not
        // a permanent one
        if (fs.exists(dir)) {
          val name = s"t!$seq!${t.timestampMs}!${enc(t.from)}!${enc(t.to)}"
          fs.create(new org.apache.hadoop.fs.Path(dir, name), true).close()
        }
      }.failed.foreach(journalNote(flowId, _))
    }

  private[flow] def journalHandlerDone(flowId: String, phase: String,
      handler: String): Unit =
    inflightDir(flowId).foreach { dir =>
      Try {
        val fs = controlFs(dir)
        if (fs.exists(dir)) {
          val name = s"h!${enc(phase)}!${enc(handler)}"
          fs.create(new org.apache.hadoop.fs.Path(dir, name), true).close()
        }
      }.failed.foreach(journalNote(flowId, _))
    }

  private[flow] def journalPhaseClear(flowId: String, phase: String): Unit =
    inflightDir(flowId).foreach { dir =>
      Try {
        val fs = controlFs(dir)
        val prefix = s"h!${enc(phase)}!"
        if (fs.exists(dir))
          fs.listStatus(dir).foreach { st =>
            if (st.getPath.getName.startsWith(prefix))
              fs.delete(st.getPath, false)
          }
      }.failed.foreach(journalNote(flowId, _))
    }

  private def clearInflight(flowId: String): Unit =
    inflightDir(flowId).foreach { dir =>
      Try { controlFs(dir).delete(dir, true); () }
        .failed.foreach(journalNote(flowId, _))
    }

  /** Crash recovery (the reference's any-daemon-picks-it-up model,
    * `flow.rb:54-60`): scan the shared store for flows with an
    * in-flight journal but no terminal record, and resume each from
    * its last journaled phase — pre-seeding the transition log (so
    * the log stays coherent across the death) and the mid-phase
    * handler checkpoints (so handlers that completed before the crash
    * are not re-run; the ones that didn't re-run in full, the
    * reference's requeue semantics, `worker.rb:133-137`).
    *
    * This is an explicit operator action on a dead engine's store:
    * like the reference's Redis state it carries no liveness fencing,
    * so don't point two LIVE engines' recovery at one directory.
    * Flows this engine already owns (active or flushing) or knows
    * terminal are skipped; a journal that fails to parse is noted and
    * left in place for inspection. Returns the resumed runs. */
  def recoverInflight(): Seq[FlowRun] =
    config.eventLogDir.toSeq.flatMap { d =>
      val base = new org.apache.hadoop.fs.Path(s"$d/inflight")
      val fs = controlFs(base)
      if (!fs.exists(base)) Seq.empty
      else {
        val dirs = fs.listStatus(base).toSeq.filter(_.isDirectory)
        val candidateIds = dirs.map(_.getPath.getName)
        // the DURABLE terminal set, not just this engine's in-memory
        // one: a crash in the window between appendEventLog and
        // clearInflight leaves a terminal flow's journal behind, and
        // resuming it would re-run final-phase handlers and append a
        // second terminal record. Fetched only when candidates exist,
        // and filtered to the candidate ids so a long-lived shared
        // log's millions of terminal rows never ride to the driver.
        val durableTerminal: Set[String] =
          if (candidateIds.isEmpty) Set.empty
          else Try(logTable("flows").fold(Set.empty[String])(
            _.select("flow_id")
              .filter(org.apache.spark.sql.functions.col("flow_id")
                .isin(candidateIds: _*))
              .collect().map(_.getString(0)).toSet))
            .getOrElse(Set.empty)
        dirs.flatMap { st =>
          val flowId = st.getPath.getName
          if (active.contains(flowId) || flushing.contains(flowId) ||
            knownTerminal(flowId)) None
          else if (durableTerminal.contains(flowId)) {
            // terminal-but-uncleaned journal (crash mid-deregister):
            // finish the dead engine's WHOLE cleanup — journal, then
            // any pending control markers it never consumed — instead
            // of resurrecting; failures reported like every other
            // journal IO path
            Try { fs.delete(st.getPath, true); clearControls(flowId) }
              .failed.foreach(journalNote(flowId, _))
            rememberTerminal(flowId)
            None
          } else {
            val attempt = Try {
              val sp = new org.apache.hadoop.fs.Path(st.getPath, "spec.json")
              if (!fs.exists(sp)) {
                // spec-less journal: a marker write raced terminal
                // cleanup and recreated the dir (or submit died before
                // the spec landed) — nothing recoverable lives here,
                // so self-heal instead of re-logging it forever
                fs.delete(st.getPath, true)
                throw FlowSpec.InvalidFlow(
                  s"recovery of $flowId: no spec.json — orphan journal" +
                    " removed")
              }
              val in = fs.open(sp)
              val specJson =
                try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
              val spec = FlowSpec.parse(specJson)
              val names = fs.listStatus(st.getPath).map(_.getPath.getName)
              val seedLog = names.filter(_.startsWith("t!")).flatMap { n =>
                // t!<seq>!<ts>!<encFrom>!<encTo>; enc("") is "" for the
                // created transition, and split('!') keeps interior
                // empty strings, so every well-formed marker is 5-ary
                n.split('!') match {
                  case Array(_, seq, ts, from, to) =>
                    Some((seq.toInt,
                      Transition(flowId, dec(from), dec(to), ts.toLong)))
                  case _ => None
                }
              }.sortBy(_._1).map(_._2).toSeq
              val seedCheckpoints = names.filter(_.startsWith("h!"))
                .flatMap(_.split('!') match {
                  case Array(_, ph, h) => Some((dec(ph), dec(h)))
                  case _ => None
                }).toSet
              val resolved: Map[(String, String), Handler] = (for {
                p <- spec.phases
                ref <- p.handlers
              } yield (p.name, ref.name) -> registry.resolve(ref).getOrElse(
                throw FlowSpec.InvalidFlow(
                  s"recovery of $flowId: no registered handler " +
                    s"${ref.name} ${ref.version.getOrElse("(any)")}"))).toMap
              val run = new FlowRun(this, flowId, spec, resolved,
                seedLog, seedCheckpoints)
              // putIfAbsent: two concurrent recovery calls (an operator
              // racing a janitor) must not both start the same flow
              if (active.putIfAbsent(run.id, run).isEmpty) {
                runningGauge.incrementAndGet()
                run.start()
                Some(run)
              } else None
            }
            attempt.failed.foreach(e => System.err.println(
              s"[engine] could not recover inflight flow $flowId: $e"))
            attempt.toOption.flatten
          }
        }
      }
    }

  /** Pending durable control intents — observability twin of
    * `transitionLog()` for the control plane. */
  def controlIntents(): DataFrame = {
    import spark.implicits._
    val rows = controlsDir.toSeq.flatMap { base =>
      Try {
        val fs = controlFs(base)
        if (!fs.exists(base)) Seq.empty
        else fs.listStatus(base).toSeq.flatMap { st =>
          val n = st.getPath.getName
          val i = n.lastIndexOf('.')
          if (i <= 0) None
          else Some((n.substring(0, i), n.substring(i + 1),
            st.getModificationTime))
        }
      }.getOrElse(Seq.empty)
    }
    rows.toDF("flow_id", "action", "requested_at_ms")
  }

  // ---- deployment-is-registration handler discovery (O20/O26 across
  // processes). In the reference, a worker becomes routable by
  // EXISTING: subscribing creates a versioned queue that
  // `phase_started_handler.rb:45-67` later discovers over the broker's
  // management API and semver-matches. The shared-store analogue:
  // `announceHandlers()` drops one marker per registered (handler,
  // version) under `$eventLogDir/registry/` tagged with this engine's
  // id; any engine sharing the directory lists the fleet's union and
  // semver-resolves against it — version DISCOVERY for multi-process
  // deployments (execution still happens on the engine that owns the
  // handler code, as in the reference, where the queue's consumer is
  // the process that registered it).

  /** This engine instance's fleet identity. */
  val engineId: String = UUID.randomUUID().toString

  private def registryDir: Option[org.apache.hadoop.fs.Path] =
    config.eventLogDir.map(d => new org.apache.hadoop.fs.Path(s"$d/registry"))

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** Announce every locally-registered handler version to the shared
    * store; idempotent (marker overwrite). Returns markers written. */
  def announceHandlers(): Int =
    registryDir.fold(0) { base =>
      Try {
        val fs = controlFs(base)
        fs.mkdirs(base)
        val names = registry.names
        val written = for {
          n <- names
          v <- registry.versions(n)
        } yield {
          fs.create(new org.apache.hadoop.fs.Path(base,
            s"${enc(n)}@$v.$engineId"), true).close()
          1
        }
        written.sum
      }.getOrElse(0)
    }

  /** The fleet's advertised capability map: handler → announced
    * versions (distinct, ascending) from every engine sharing the
    * store — the reference's management-API queue listing. In the
    * reference a dead worker's queue eventually disappears with its
    * connection; here announcements are files, so liveness is
    * age-based: pass `maxAgeMs` to ignore markers older than the
    * fleet's re-announce heartbeat (engines that stopped
    * re-announcing drop out of the view), or leave it None for the
    * full historical union. Graceful shutdown should call
    * [[retractHandlers]]. */
  def fleetHandlers(maxAgeMs: Option[Long] = None): Map[String, Seq[SemVer]] =
    registryDir.fold(Map.empty[String, Seq[SemVer]]) { base =>
      Try {
        val fs = controlFs(base)
        if (!fs.exists(base)) Map.empty[String, Seq[SemVer]]
        else {
          val cutoff = maxAgeMs.map(System.currentTimeMillis() - _)
          fs.listStatus(base).toSeq
            .filter(st => cutoff.forall(st.getModificationTime >= _))
            .flatMap { st =>
              val n = st.getPath.getName
              // <urlenc(name)>@<version>.<engineId(36 chars)>
              val at = n.lastIndexOf('@')
              if (at < 0 || n.length < at + 39) None
              else {
                val verPart = n.substring(at + 1, n.length - 37)
                SemVer.parse(verPart).map(v => (dec(n.substring(0, at)), v))
              }
            }
            .groupBy(_._1)
            .map { case (k, vs) => k -> vs.map(_._2).distinct.sorted }
        }
      }.getOrElse(Map.empty)
    }

  /** Graceful deregistration: drop every marker THIS engine announced
    * (the reference worker's queues vanish when it disconnects).
    * Other engines' markers are untouched. Returns markers removed. */
  def retractHandlers(): Int =
    registryDir.fold(0) { base =>
      Try {
        val fs = controlFs(base)
        if (!fs.exists(base)) 0
        else fs.listStatus(base).toSeq.count { st =>
          st.getPath.getName.endsWith(s".$engineId") &&
            Try(fs.delete(st.getPath, false)).getOrElse(false)
        }
      }.getOrElse(0)
    }

  /** Semver-resolve a handler ref against the FLEET's announcements
    * (highest matching version, same rule as local resolution) —
    * answers "can some deployed engine run this, and at what
    * version?" without that engine's code being loaded here. */
  def fleetResolve(ref: HandlerRef): Option[SemVer] =
    fleetHandlers().get(ref.name).flatMap(vs =>
      SemVer.bestMatch(ref.version.getOrElse(""), vs))

  private def logTable(sub: String): Option[DataFrame] =
    config.eventLogDir.flatMap { dir =>
      val path = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) Some(spark.read.parquet(path.toString)) else None
    }

  /** Finished-flow registry from the durable log (the reference's
    * `Flow.find` for completed flows, `flow.rb:54-60`): one row per
    * terminal flow with its final state and round-trippable spec. */
  def finishedFlows(): DataFrame =
    logTable("flows").getOrElse {
      import spark.implicits._
      Seq.empty[(String, String, String, String, Long)]
        .toDF("flow_id", "name", "final_state", "spec_json",
          "finished_at_ms")
    }

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

  /** O4: the cross-flow transition log as a DataFrame — live
    * (in-flight flows, driver memory) unioned with the durable parquet
    * log (terminal flows), so finished flows stay queryable across
    * engine instances, matching the reference's always-readable Redis
    * transition list (`flow.rb:126-143`). */
  def transitionLog(): DataFrame = {
    import spark.implicits._
    // one snapshot of active + mid-flush runs (deduped by id: a run
    // may move active → flushing between the two reads); the durable
    // side excludes those ids so a flush that lands mid-query is not
    // double-counted
    val snapshot = (active.values.toSeq ++ flushing.values.toSeq)
      .groupBy(_.id).map(_._2.head).toSeq
    val live = snapshot.flatMap(_.transitions).toDF()
    val ids = snapshot.map(_.id)
    logTable("transitions").fold(live) { durable =>
      val d =
        if (ids.isEmpty) durable
        else durable.filter(!org.apache.spark.sql.functions.col("flowId")
          .isin(ids: _*))
      live.unionByName(d)
    }
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
    resolved: Map[(String, String), Handler],
    // crash recovery (Engine.recoverInflight): the pre-death
    // transition history and mid-phase handler checkpoints read back
    // from the in-flight journal — the run resumes at the last
    // journaled real phase with its completed handlers pre-seeded
    seedLog: Seq[Transition] = Nil,
    seedCheckpoints: Set[(String, String)] = Set.empty) {
  import FlowRun._

  private val log = mutable.ArrayBuffer.empty[Transition] // O4
  log ++= seedLog
  private val lock = new Object
  @volatile private var state: State = Running
  @volatile private var pauseRequested = false
  @volatile private var phaseStartedAt = System.currentTimeMillis()
  // recovery resumes at the last journaled REAL phase ("paused" and
  // other pseudo-phases are not spec phases; a journal whose tail is
  // a pseudo-phase resumes at the last real one before it)
  private val resumePhaseName: Option[String] =
    seedLog.reverseIterator.map(_.to).find(spec.phase(_).isDefined)
  @volatile private var currentPhaseName: String =
    resumePhaseName.getOrElse(spec.initialPhase.name)
  private val counters =
    TrieMap.empty[(String, String), (Long, LongAccumulator)]
  // Mid-phase checkpoint (O6/O7 upgrade): handlers that completed in
  // the current attempt of each phase. A phase re-entered after a
  // mid-phase pause (or an error loop routing back) re-runs only the
  // handlers not recorded here — the reference's per-task requeue
  // semantics (`worker.rb:133-137`) at handler granularity.
  private val completedHandlers = TrieMap.empty[(String, String), Unit]
  seedCheckpoints.foreach(k => completedHandlers.put(k, ()))

  /** Current (phase, handler) checkpoints — test/observability hook. */
  private[flow] def checkpointedHandlers: Set[(String, String)] =
    completedHandlers.keySet.toSet
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

  /** O6 (cooperative variant): pause that takes effect immediately by
    * interrupting the phase's running Spark jobs. In-flight handlers
    * fail and will re-run on resume; handlers that already completed
    * this phase are checkpointed and skipped — the reference's
    * requeue-on-pause (`worker.rb:133-137`, `connector.rb:66-68`)
    * without losing completed work. */
  def pauseNow(): Boolean = lock.synchronized {
    if (state != Running) false
    else {
      pauseRequested = true
      engine.spark.sparkContext.cancelJobGroup(id)
      true
    }
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

  // set when a pause was triggered by a durable marker (cross-process
  // requestPause): such a flow auto-resumes when the marker disappears,
  // while a locally-paused flow only resumes via resume()
  @volatile private var pausedByMarker = false

  /** Apply durable cross-process control intents (engine.requestPause/
    * requestCancel/requestResume from ANY engine sharing the event-log
    * dir). Polled at every phase boundary and, for the resume path,
    * while parked in the paused state. Cancel wins over pause. No
    * event-log dir → two constant-false reads, zero I/O. */
  private def pollDurableControls(): Unit =
    // None = store unreadable this poll: take NO action (in particular
    // do not auto-resume a marker-paused flow) — retry next poll
    engine.durableControls(id).foreach { case (rCancel, rPause) =>
      if (rCancel) { cancel(); () }
      else if (rPause) lock.synchronized {
        if (state == Running && !pauseRequested) {
          pausedByMarker = true
          pause()
          ()
        }
      }
      else if (pausedByMarker) {
        pausedByMarker = false
        resume()
        ()
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

  private def transitionTo(from: String, to: String): Unit = {
    val (seq, t) = lock.synchronized { // O3
      log += Transition(id, from, to, System.currentTimeMillis())
      currentPhaseName = to
      phaseStartedAt = System.currentTimeMillis()
      (log.size, log.last)
    }
    // durable twin (crash recovery), written OUTSIDE the lock: a slow
    // shared-store metadata op must not block status()/pause()/cancel()
    // for its latency. Safe unlocked: transitions are driven only by
    // this flow's single runLoop thread, so seq order is already
    // serial. Seq continues past any seeded prefix, so a resumed
    // flow's markers never collide with the dead engine's.
    // Phase-boundary granularity — never per task.
    engine.journalTransition(id, seq, t)
  }

  // Any escape path out of runLoop (including bugs in the loop itself)
  // must deregister, or the flow leaks in the active set and the
  // running gauge never decrements (ADVICE r1).
  private[flow] def start(): Unit = Future(runLoop()).failed.foreach { e =>
    engine.deregister(this)
    promise.tryFailure(e)
  }

  private def runLoop(): Unit = {
    var phase = resumePhaseName.flatMap(spec.phase)
      .getOrElse(spec.initialPhase)
    // O18: flow.created → first phase; a recovered run is already IN
    // its resume phase (the seeded log ends there) — re-recording the
    // entry would duplicate the dead engine's transition
    if (resumePhaseName.isEmpty) transitionTo("", phase.name)
    var done = false
    // belt-and-braces against error-transition ping-pong: validation
    // guarantees every error chain terminates, but a phase pair whose
    // handlers keep failing into each other would still loop — bound
    // total error hops by the phase count
    var errorHops = 0
    while (!done) {
      // control checks at the phase boundary; durable (cross-process)
      // intents first so they land exactly like local calls
      pollDurableControls()
      if (state == Canceled) {
        transitionTo(phase.name, "canceled")
        engine.deregister(this)
        promise.tryFailure(new InterruptedException(s"flow $id canceled"))
        return
      }
      if (pauseRequested) {
        // state decision under the lock, TRANSITIONS (which journal to
        // the shared store) outside it — holding the monitor through a
        // slow metadata write would block status()/pause()/cancel()
        // (the transitionTo discipline; only this runLoop thread ever
        // transitions, so the order stays serial)
        // idempotent park (VERDICT r11 #2): a dying engine can land
        // its `paused` transition just before the crash, so a
        // recovered flow's seeded log may already END in `paused` —
        // its first boundary poll would then append a SECOND
        // consecutive `paused`. Parking is idempotent under the O4
        // event-sourced semantics: skip the append when the tail is
        // already `paused` (any resume appends `paused → phase`, so
        // a later legitimate re-park never sees a `paused` tail).
        // The tail check shares ONE critical section with the
        // Running→Paused decision (ADVICE r12): only this runLoop
        // thread appends transitions, but making the skip decision
        // atomic with the state flip keeps that invariant local
        // instead of implicit.
        val entered = lock.synchronized {
          val flip = if (state == Running) { state = Paused; true }
            else false
          flip && !log.lastOption.exists(_.to == "paused")
        }
        if (entered)
          transitionTo(phase.name, "paused") // O6
        lock.synchronized {
          // timed wait: a cross-process resume only deletes the durable
          // marker (no monitor to notify in this JVM) — poll it
          while (state == Paused) {
            lock.wait(250)
            if (state == Paused) pollDurableControls()
          }
        }
        if (state == Canceled) {
          transitionTo("paused", "canceled")
          engine.deregister(this)
          promise.tryFailure(new InterruptedException(s"flow $id canceled"))
          return
        }
        transitionTo("paused", phase.name) // O7: back to last real phase
      }

      // O19: dispatch handlers (empty phase short-circuits to
      // advance); handlers checkpointed complete in an earlier attempt
      // of this phase (mid-phase pause, error loop-back) are skipped
      val toRun = phase.handlers
        .filterNot(ref => completedHandlers.contains((phase.name, ref.name)))
      val outcome: Try[Unit] =
        if (toRun.isEmpty) Success(())
        else {
          val fs = toRun.map { ref =>
            val h = resolved((phase.name, ref.name))
            Future {
              runHandler(phase, h)
              completedHandlers.put((phase.name, ref.name), ())
              engine.journalHandlerDone(id, phase.name, ref.name)
            }.transform(Success(_))
          }
          // O15: phase barrier = every handler future SETTLED (not
          // fail-fast: a pause/cancel interrupt must not leave
          // straggler jobs running into the paused window)
          import scala.concurrent.duration._
          val settled =
            scala.concurrent.Await.result(Future.sequence(fs), 1.day)
          settled.collectFirst { case Failure(e) => e }
            .fold[Try[Unit]](Success(()))(Failure(_))
        }

      outcome match {
        case Success(_) =>
          // phase complete: drop its checkpoints so a future re-entry
          // (error path cycling back) re-runs it in full
          completedHandlers.keys
            .filter(_._1 == phase.name).foreach(completedHandlers.remove)
          engine.journalPhaseClear(id, phase.name)
          if (phase.isFinal) { // O16/O17: flow finish
            state = Finished
            engine.deregister(this)
            val result = FlowResult(id, phase.name, transitions)
            promise.trySuccess(result)
            engine.notifyFinished(result) // O24 broadcast
            done = true
          } else {
            val next = spec.nextPhase(phase).get
            transitionTo(phase.name, next.name)
            phase = next
          }
        case Failure(_) if state == Canceled => () // loop records cancel
        case Failure(_) if pauseRequested =>
          () // pauseNow interrupt: loop top parks, resume re-enters
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
        // In-phase progress (reference `examples/status:7-38`): total =
        // result partitions, one tick as each partition materializes,
        // so status() moves during a long query instead of 0/1 → 1/1.
        // (df.rdd finalizes the plan — with AQE that may run upstream
        // stages eagerly; the final stage runs under the tick loop.)
        val df = q.frame(ctx)
        val rdd = df.rdd
        val parts = math.max(rdd.getNumPartitions, 1)
        val acc = spark.sparkContext.longAccumulator(s"$id.${phase.name}.${h.name}")
        counters.put((phase.name, h.name), (parts.toLong, acc))
        rdd.foreachPartition { it =>
          while (it.hasNext) it.next()
          acc.add(1)
        }
      case m: MaterializeHandler =>
        val acc = spark.sparkContext.longAccumulator(s"$id.${phase.name}.${h.name}")
        counters.put((phase.name, h.name), (1L, acc))
        m.run(ctx)
        acc.add(1)
      case _ =>
        h.enumerateDataset(ctx) match {
          case Some(ds) =>
            // O10 distributed form: the task set never touches the
            // driver — count for the progress total, then process in
            // place (the source's own partitioning is the scatter)
            val acc = spark.sparkContext.longAccumulator(
              s"$id.${phase.name}.${h.name}")
            val total = ds.count()
            counters.put((phase.name, h.name), (total, acc))
            if (total > 0)
              ds.foreachPartition { it: Iterator[TaskMsg] =>
                it.foreach { t => h.process(ctx, t); acc.add(1) }
              }
          case None =>
            val tasks = h.enumerate(ctx) // O10: driver-side fan-out
            val acc = spark.sparkContext.longAccumulator(
              s"$id.${phase.name}.${h.name}")
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
