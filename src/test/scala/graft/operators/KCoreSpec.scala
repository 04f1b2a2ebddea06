package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** KCore: both execution paths reach the same unique fixpoint, the
  * guard rails fire, and the semantics match a from-scratch
  * sequential peel on a randomized graph.
  */
class KCoreSpec extends SparkSpec {

  private def edgesDf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("u", "v")
  }

  private def collectCore(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // triangle {1,2,3} + pendant 4-1 + separate chain 5-6-7
  private val handGraph = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (5L, 6L), (6L, 7L))

  test("small path: 2-core of triangle+pendant+chain is the triangle") {
    val core = collectCore(KCore.of(edgesDf(handGraph), 2))
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // 3-core is empty; 1-core keeps everything with an edge
    assert(KCore.of(edgesDf(handGraph), 3).count() == 0L)
    val one = collectCore(KCore.of(edgesDf(handGraph), 1))
    assert(one.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(one(1L) == 3L && one(4L) == 1L && one(6L) == 2L)
  }

  test("distributed path equals the small path on a randomized graph") {
    val rnd = new scala.util.Random(42)
    val n = 60
    val pairs = (0 until 400).map { _ =>
      val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    for (k <- Seq(2, 4, 7)) {
      val small = collectCore(KCore.of(edgesDf(pairs), k))
      val dist = collectCore(
        KCore.of(edgesDf(pairs), k, smallEdgeCap = 0L))
      assert(dist == small, s"paths diverged at k=$k")
      // every member's in-core degree is >= k by definition
      small.values.foreach(d => assert(d >= k))
    }
  }

  test("distributed path matches on a worst-case chain (peels from " +
    "the ends inward) and the round guard throws when too tight") {
    val chain = (0L until 20L).map(i => (i, i + 1))
    // 2-core of a path graph is empty — the peel needs ~n/2 rounds
    assert(KCore.of(edgesDf(chain), 2, smallEdgeCap = 0L).count() == 0L)
    val ex = intercept[IllegalStateException](
      KCore.of(edgesDf(chain), 2, smallEdgeCap = 0L, maxRounds = 3)
        .count())
    assert(ex.getMessage.contains("no fixpoint"))
    // exactly-at-budget is NOT an overrun: the 21-node chain's 2-core
    // needs 10 edge-changing sweeps (distributed) and 11 node levels
    // (sequential — the final level removes only the edge-less center
    // node, the documented ≤ +1 conservatism); each path must succeed
    // at its own exact budget and throw one below it
    assert(KCore.of(edgesDf(chain), 2, smallEdgeCap = 0L,
      maxRounds = 10).count() == 0L)
    assert(KCore.of(edgesDf(chain), 2, maxRounds = 11).count() == 0L)
    intercept[IllegalStateException](
      KCore.of(edgesDf(chain), 2, smallEdgeCap = 0L, maxRounds = 9)
        .count())
    val seq = intercept[Exception](
      KCore.of(edgesDf(chain), 2, maxRounds = 10).count())
    assert(seq.getMessage.contains("synchronous peel"),
      s"sequential path must enforce the same round budget: $seq")
  }

  test("NULL endpoints fail loudly on both paths") {
    import spark.implicits._
    val bad = Seq((Some(1L), Some(2L)), (Some(2L), None))
      .toDF("u", "v")
    val e1 = intercept[Exception](KCore.of(bad, 2).count())
    assert(e1.getMessage.contains("NULL"))
    val e2 = intercept[Exception](
      KCore.of(bad, 2, smallEdgeCap = 0L).count())
    assert(e2.getMessage.contains("NULL"))
  }

  test("uncastable and fractional endpoints fail with their own " +
    "messages instead of a misleading NULL report or silent merge") {
    import spark.implicits._
    val strBad = Seq(("1", "2"), ("S123", "2")).toDF("u", "v")
    val e1 = intercept[Exception](KCore.of(strBad, 1).count())
    assert(e1.getMessage.contains("uncastable"), s"got: $e1")
    // doubles 1.3 and 1.9 would BOTH truncate to node 1 — the cast
    // may never silently merge two distinct nodes
    val fracBad = Seq((1.3, 2.0), (1.9, 2.0)).toDF("u", "v")
    val e2 = intercept[Exception](KCore.of(fracBad, 1).count())
    assert(e2.getMessage.contains("non-integer"), s"got: $e2")
    // integral-valued doubles and numeric strings are legitimate ids
    val ok = Seq(("1", "2"), ("2", "3")).toDF("u", "v")
    assert(collectCore(KCore.of(ok, 1)) ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }
}
