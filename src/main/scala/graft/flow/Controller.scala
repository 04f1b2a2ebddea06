package graft.flow

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** Concurrency controller (the reference's autoscaling loop,
  * `/root/reference/examples/controller:149-163`): keep up to
  * `maxConcurrent` flows running by spawning replacements as flows
  * terminate, and report throughput (flows finished/sec,
  * `controller:153-156`).
  *
  * The reference polls Redis gauges every 2 s and spawns the
  * difference; here the terminal broadcast drives respawn event-wise —
  * no poll, no gap where the fleet runs below target. Respawn fires on
  * ANY terminal outcome (Finished, Failed, Canceled — ADVICE r3: the
  * success-only channel leaked a concurrency slot per failure and
  * stalled the fleet), while only successes count toward
  * `targetTotal`, so a failed flow is replaced until the success
  * budget is met. `targetTotal` bounds the experiment (the reference
  * loops forever).
  */
final class Controller(
    engine: Engine,
    makeSpec: Long => FlowSpec,
    maxConcurrent: Int,
    targetTotal: Long) {

  private val started = new AtomicLong(0)
  private val terminal = new AtomicLong(0)
  private val finished = new AtomicLong(0)
  private val stopped = new AtomicBoolean(false)
  private val startedAt = System.nanoTime()
  @volatile private var doneLatch =
    new java.util.concurrent.CountDownLatch(1)

  def finishedCount: Long = finished.get()

  /** Terminal flows that did NOT finish successfully. */
  def failedCount: Long = terminal.get() - finished.get()

  /** flows finished per second since start (reference rate metric). */
  def ratePerSec: Double =
    finished.get() / math.max((System.nanoTime() - startedAt) / 1e9, 1e-9)

  private def spawnUpToTarget(): Unit = synchronized {
    if (stopped.get()) return
    // outstanding = this controller's own in-flight flows (not the
    // engine gauge, which other submitters may share)
    def outstanding = started.get() - terminal.get()
    while (outstanding < maxConcurrent &&
        finished.get() + outstanding < targetTotal) {
      val idx = started.incrementAndGet()
      engine.submit(makeSpec(idx))
    }
  }

  /** Start the fleet and register the respawn listener. */
  def start(): Unit = {
    engine.onFlowTerminal { ev =>
      terminal.incrementAndGet()
      if (ev.state == "Finished") finished.incrementAndGet()
      if (finished.get() >= targetTotal) doneLatch.countDown()
      else spawnUpToTarget()
    }
    spawnUpToTarget()
  }

  /** Block until `targetTotal` flows finished (or timeout). */
  def awaitDone(timeoutMs: Long): Boolean = {
    val ok = doneLatch.await(timeoutMs,
      java.util.concurrent.TimeUnit.MILLISECONDS)
    stopped.set(true)
    ok
  }
}
