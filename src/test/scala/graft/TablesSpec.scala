package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the work-model partition sizing (r7): scan width follows
  * estimated work, clamped to the session's cores — the rule that
  * replaced the flat `cpus` slicing whose task-launch overhead WAS
  * the bench floor (BASELINE.md r7 A/B).
  */
class TablesSpec extends AnyFunSuite {

  test("light tables size by rows over the task budget") {
    assert(Tables.partsFor("lineitem", 600000L, 32) == 19)
    assert(Tables.partsFor("events", 100000L, 32) == 4)
    assert(Tables.partsFor("orders", 150000L, 32) == 5)
    // sub-budget tables collapse to one partition, never zero
    assert(Tables.partsFor("region", 5L, 32) == 1)
    assert(Tables.partsFor("nation", 0L, 32) == 1)
  }

  test("CPU-heavy tables keep width through the kernel weight") {
    // 5k documents x 256 weight = 1.28M work rows -> cores-capped
    assert(Tables.partsFor("documents", 5000L, 32) == 32)
    // 2k embeddings x 1024 = 2.05M -> cores-capped
    assert(Tables.partsFor("embeddings", 2000L, 32) == 32)
    // but a tiny doc corpus still shrinks: 100 x 256 / 32k -> 1
    assert(Tables.partsFor("documents", 100L, 32) == 1)
  }

  test("the cores cap binds at any scale (no overflow at 100 TB rows)") {
    assert(Tables.partsFor("lineitem", 3_000_000_000_000L, 1000) == 1000)
    assert(Tables.partsFor("documents", Long.MaxValue / 2048, 64) == 64)
  }
}
