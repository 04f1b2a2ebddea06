package graft.operators

import graft.SparkSpec

/** Connected-components semantics: both execution modes must produce
  * identical exact min-id component labels, and the distributed path
  * must fail loudly rather than return unconverged labels (ADVICE r3).
  */
class ConnectedComponentsSpec extends SparkSpec {

  // two chains + a triangle + an isolated edge:
  //   {1,2,3,4}  {10,11,12}  {20,21,22}(triangle)  {30,31}
  private def edges = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (11L, 10L), (11L, 12L),
      (20L, 21L), (21L, 22L), (20L, 22L),
      (31L, 30L))
      .toDF("a_id", "b_id")
  }

  private val expected = Map(
    1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
    10L -> 10L, 11L -> 10L, 12L -> 10L,
    20L -> 20L, 21L -> 20L, 22L -> 20L,
    30L -> 30L, 31L -> 30L)

  private def labelsOf(cap: Long): Map[Long, Long] =
    ConnectedComponents.of(edges, smallEdgeCap = cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("single-partition union-find labels every component with its " +
    "min id") {
    assert(labelsOf(cap = 1000000L) == expected)
  }

  test("distributed min-label propagation matches union-find exactly") {
    assert(labelsOf(cap = 0L) == expected)
  }

  test("a long chain converges; clusters() sizes are exact") {
    import spark.implicits._
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    for (cap <- Seq(0L, 1000L)) {
      val cl = ConnectedComponents.clusters(chain, smallEdgeCap = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cl == Map(1L -> 40L), s"cap=$cap")
    }
  }

  test("both modes agree with a reference union-find on random graphs") {
    import spark.implicits._
    for (seed <- Seq(3, 17, 99)) {
      val rng = new scala.util.Random(seed)
      val n = 120
      val es = (1 to 150).map(_ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference: plain scala union-find with min-id roots
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val want = parent.keys.map(k => k -> find(k)).toMap
      val df = es.toDF("a_id", "b_id")
      for (cap <- Seq(0L, 1000000L)) {
        val got = ConnectedComponents.of(df, smallEdgeCap = cap)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"seed=$seed cap=$cap")
      }
    }
  }

  test("hitting the round cap without convergence throws instead of " +
    "returning unconverged labels (ADVICE r3)") {
    import spark.implicits._
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.of(chain, smallEdgeCap = 0L, maxRounds = 1)
        .count()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("pointer doubling resolves a 63-hop chain within O(log d) " +
    "rounds (plain propagation would need ~the diameter)") {
    import spark.implicits._
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    // 8 rounds << 63-hop diameter: only label-reach doubling gets there
    val cl = ConnectedComponents
      .clusters(chain, smallEdgeCap = 0L, maxRounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl == Map(1L -> 64L))
  }
}
