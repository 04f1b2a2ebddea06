package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming flow-state tracking (SURVEY.md §2.1 O11/O14-O16 in
  * streaming form): folds a stream of lifecycle events into per-flow
  * counters with `mapGroupsWithState` — the Spark-native replacement
  * for the reference's per-task Redis `incrby`/`decr` + barrier checks
  * (`/root/reference/lib/distribot/worker.rb:123-131`,
  * `lib/distribot/task_finished_handler.rb:7-23`). State lives in the
  * checkpointed state store, so pause/resume is stop/restart from
  * checkpoint and nothing per-task leaves the executors.
  */
object FlowStateStream {

  /** A lifecycle event: kind is one of `tasks_enumerated` (delta = task
    * count), `task_finished` (delta = 1), `phase_started` (phase set).
    */
  final case class FlowEvent(
      flowId: String,
      kind: String,
      phase: String,
      delta: Long,
      eventTimeMs: Long)

  final case class FlowCounters(
      flowId: String,
      currentPhase: String,
      totalTasks: Long,
      finishedTasks: Long,
      outstanding: Long,
      phaseComplete: Boolean)

  /** Fold lifecycle events into the latest per-flow counter snapshot.
    * Works on a streaming Dataset (update mode) or a batch one. */
  def track(events: Dataset[FlowEvent]): Dataset[FlowCounters] = {
    implicit val countersEnc = Encoders.product[FlowCounters]
    events
      .groupByKey(_.flowId)(Encoders.STRING)
      .mapGroupsWithState[FlowCounters, FlowCounters](
        GroupStateTimeout.NoTimeout) {
        (flowId: String, batch: Iterator[FlowEvent],
         state: GroupState[FlowCounters]) =>
          var cur = state.getOption.getOrElse(
            FlowCounters(flowId, "", 0L, 0L, 0L, phaseComplete = false))
          batch.toSeq.sortBy(_.eventTimeMs).foreach { e =>
            cur = e.kind match {
              case "phase_started" =>
                // new phase resets the barrier accounting (the
                // reference deletes the counter key, O14)
                cur.copy(currentPhase = e.phase, totalTasks = 0,
                  finishedTasks = 0, outstanding = 0, phaseComplete = false)
              case "tasks_enumerated" =>
                cur.copy(totalTasks = cur.totalTasks + e.delta,
                  outstanding = cur.outstanding + e.delta)
              case "task_finished" =>
                cur.copy(finishedTasks = cur.finishedTasks + e.delta,
                  outstanding = cur.outstanding - e.delta)
              case _ => cur
            }
            // O14/O15 barrier, derived from the counters after EVERY
            // event: micro-batch boundaries don't preserve event order
            // across batches, so a tasks_enumerated arriving after its
            // tasks drained (outstanding already negative) must still
            // satisfy the barrier once totals catch up — the old
            // branch-local phaseComplete=false froze it (r5 review
            // fix). A fresh phase has totalTasks=0 → false, as before.
            cur = cur.copy(phaseComplete =
              cur.totalTasks > 0 && cur.outstanding <= 0)
          }
          state.update(cur)
          cur
      }
  }
}
