package graft.flow

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** Concurrency controller (the reference's autoscaling loop,
  * `/root/reference/examples/controller:149-163`): keep up to
  * `maxConcurrent` flows running by spawning replacements as flows
  * finish, and report throughput (flows finished/sec,
  * `controller:153-156`).
  *
  * The reference polls Redis gauges every 2 s and spawns the
  * difference; here the completion broadcast (O24) drives respawn
  * event-wise — no poll, no gap where the fleet runs below target —
  * and the gauge is the engine's own `runningCount`. `targetTotal`
  * bounds the experiment (the reference loops forever).
  */
final class Controller(
    engine: Engine,
    makeSpec: Long => FlowSpec,
    maxConcurrent: Int,
    targetTotal: Long) {

  private val started = new AtomicLong(0)
  private val finished = new AtomicLong(0)
  private val stopped = new AtomicBoolean(false)
  private val startedAt = System.nanoTime()
  @volatile private var doneLatch =
    new java.util.concurrent.CountDownLatch(1)

  def finishedCount: Long = finished.get()

  /** flows finished per second since start (reference rate metric). */
  def ratePerSec: Double =
    finished.get() / math.max((System.nanoTime() - startedAt) / 1e9, 1e-9)

  private def spawnUpToTarget(): Unit = synchronized {
    if (stopped.get()) return
    while (engine.runningCount < maxConcurrent &&
        started.get() < targetTotal) {
      val idx = started.incrementAndGet()
      engine.submit(makeSpec(idx))
    }
  }

  /** Start the fleet and register the respawn listener. */
  def start(): Unit = {
    engine.onFlowFinished { _ =>
      finished.incrementAndGet()
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
