package graft.flow

import org.scalatest.funsuite.AnyFunSuite

/** Runs `graft.tools.FaultDrill` as a subprocess (it needs its own
  * `local[8, 3]` master for real task retries — the shared test
  * session is plain local[4], maxFailures=1 fail-fast) and asserts on
  * its RESULT lines: 10%-flaky tasks retry and the flow finishes,
  * Spark's output committer lands results exactly once under the
  * storm, and a genuinely-exhausted task (3 real attempts) drives the
  * O34 error transition. See FaultDrill's scaladoc for the scenario
  * definitions (VERDICT r8 #4).
  */
class FaultInjectionSpec extends AnyFunSuite {

  test("10% task failures retry to completion; committed output is " +
    "exactly-once; retry exhaustion drives on_error_transition_to") {
    val buf = new StringBuilder
    val proc = scala.sys.process.Process(
      Seq("tools/run.sh", "graft.tools.FaultDrill"),
      new java.io.File("/root/repo"))
    val exit = proc.!(scala.sys.process.ProcessLogger(
      line => { buf.append(line).append('\n'); () }, _ => ()))
    assert(exit == 0, s"FaultDrill exited $exit; output:\n$buf")
    val results = buf.toString.linesIterator
      .filter(_.startsWith("RESULT "))
      .map(_.stripPrefix("RESULT ").split("=", 2))
      .collect { case Array(k, v) => k -> v }.toMap
    assert(results.get("flaky_finished").contains("true"), results)
    assert(results.get("flaky_all_processed").contains("true"), results)
    assert(results.get("flaky_retries_observed").contains("true"),
      s"no task retry actually happened — the drill is not exercising " +
        s"maxFailures: $results")
    assert(results.get("flaky_transitions").contains("work>done"), results)
    assert(results.get("commit_rowcount").contains("1000"),
      s"output committer lost or duplicated rows: $results")
    assert(results.get("exhaust_finished").contains("true"), results)
    assert(results.get("exhaust_attempts").contains("3"),
      s"expected exactly maxFailures=3 real attempts: $results")
    assert(results.get("exhaust_error_phase_ran").contains("1"), results)
    assert(results.get("exhaust_transitions")
      .contains("work>cleanup>done"), results)
    // round-13: ranks from the plan-frozen-boundary machinery are
    // bit-identical to the fault-free window oracle under the same
    // retry storm (scan + post-shuffle rank stage both injected)
    assert(results.get("rank_retry_equal").contains("true"),
      s"rank determinism broke under task retries: $results")
    assert(results.get("rank_retry_injections").exists(_.toInt > 0),
      s"no rank-path failure was actually injected: $results")
  }
}
