package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, concat, count, lit, raise_error, when}

/** Exact k-core extraction over an undirected edge list: repeatedly
  * delete every node whose degree is below `k` until none remains;
  * the surviving subgraph is the k-core (the unique maximal subgraph
  * with all degrees ≥ k — unique because the union of two subgraphs
  * with min degree ≥ k again has min degree ≥ k, so peeling order
  * cannot change the fixpoint). Returns every core member with its
  * degree INSIDE the core.
  *
  * Execution modes, picked by measured edge count (the
  * ConnectedComponents split, same rationale):
  *
  * - **Small graphs** (≤ `smallEdgeCap` edges): one-executor
  *   sequential peel via the classic O(E) queue algorithm (remove a
  *   sub-k node, decrement its neighbors, enqueue any that drop below
  *   k). Co-occurrence graphs are CATALOG-bounded (suppliers, parts),
  *   not corpus-bounded, so even a 100 TB corpus lands here.
  *
  * - **Large graphs**: distributed parallel peel — each round
  *   computes degrees (one co-partitioned aggregation over the
  *   directed edge set) and drops every edge with a sub-k endpoint
  *   (two semi-joins against the surviving-node set). The edge set
  *   shrinks monotonically; per-round localCheckpoint truncates the
  *   lineage (the PageRank/CC round discipline). Deleting ALL sub-k
  *   nodes per round reaches the same fixpoint as sequential peeling
  *   (uniqueness above).
  *
  * `maxRounds` bounds the SYNCHRONOUS round count — the number of
  * "delete every currently-sub-k node at once" sweeps to the fixpoint
  * — and is enforced on BOTH paths. Exhausting the guard THROWS: a
  * truncated peel is not a k-core, and a bounded-iteration oracle
  * (q101's recursive CTE snapshots at a fixed iteration) would
  * silently diverge past its cap — the guard makes that divergence
  * impossible by construction when the caller sets `maxRounds` to the
  * oracle's iteration budget. The sequential peel counts frontier
  * LEVELS, which can exceed the edge-changing sweep count by exactly
  * one (a last level that removes only already-edge-less nodes, which
  * never changes the output): the guard is conservative in the safe
  * direction — it can throw one round early on such graphs, never
  * pass one round late.
  */
object KCore {

  /** @return (id, core_degree) — members of the k-core of `edges`
    *         (distinct undirected pairs) with their in-core degree. */
  def of(edges: DataFrame, k: Int, aCol: String = "u", bCol: String = "v",
      smallEdgeCap: Long = 10000000L, maxRounds: Int = 100): DataFrame = {
    require(k >= 1, s"k-core needs k >= 1, got $k")
    val spark = edges.sparkSession
    import spark.implicits._
    // a malformed endpoint fails LOUDLY in-row (the
    // ConnectedComponents discipline), each class with its own
    // message: NULL input, an uncastable value (cast-to-long NULL
    // would otherwise be misreported as a NULL input), and a
    // fractional numeric id (cast would silently TRUNCATE, merging
    // distinct nodes into one). The double round-trip check is exact
    // for ids below 2^53; long-typed inputs skip it entirely (the
    // cast is the identity there).
    def req(name: String) = {
      val raw = col(name)
      // try_cast, not cast: ANSI cast would throw its own generic
      // CAST_INVALID_INPUT before these branches can label the edge
      val lng = raw.try_cast("long")
      when(raw.isNull, raise_error(lit(
        s"KCore: NULL $name endpoint in edges")).cast("long"))
        .when(lng.isNull, raise_error(concat(lit(
          s"KCore: uncastable $name endpoint in edges: "),
          raw.cast("string"))).cast("long"))
        .when(raw.try_cast("double") =!= lng.cast("double"),
          raise_error(concat(lit(
            s"KCore: non-integer $name endpoint in edges: "),
            raw.cast("string"))).cast("long"))
        .otherwise(lng)
    }
    val e = edges
      .select(req(aCol).as("a"), req(bCol).as("b"))
      .localCheckpoint(false)
    if (e.count() <= smallEdgeCap) {
      e.as[(Long, Long)].coalesce(1).mapPartitions { it =>
        val adj = scala.collection.mutable.LongMap
          .empty[scala.collection.mutable.ArrayBuffer[Long]]
        def add(x: Long, y: Long): Unit =
          adj.getOrElseUpdate(x,
            scala.collection.mutable.ArrayBuffer.empty[Long]) += y
        it.foreach { case (a, b) => add(a, b); add(b, a) }
        val deg = scala.collection.mutable.LongMap.empty[Long]
        adj.foreach { case (n, ns) => deg(n) = ns.length.toLong }
        val removed = scala.collection.mutable.Set.empty[Long]
        // level-synchronous peel: each frontier is EXACTLY one
        // synchronous round (all currently-sub-k nodes removed at
        // once), so the level count is the same round count the
        // distributed path and the q101 oracle iterate — total work
        // stays O(E), every edge is decremented at most twice.
        var frontier = adj.keys.filter(n => deg(n) < k).toArray
        var rounds = 0
        while (frontier.nonEmpty) {
          rounds += 1
          if (rounds > maxRounds)
            throw new IllegalStateException(
              s"KCore: synchronous peel needs more than $maxRounds " +
                "rounds — a fixed-iteration oracle would diverge " +
                "here; raise maxRounds")
          frontier.foreach(removed += _)
          val dropped = scala.collection.mutable.Set.empty[Long]
          frontier.foreach { n =>
            adj(n).foreach { m =>
              if (!removed(m)) {
                deg(m) -= 1
                if (deg(m) < k) dropped += m
              }
            }
          }
          frontier = dropped.toArray
        }
        adj.keys.toArray.iterator
          .filterNot(removed)
          .map(n => (n, deg(n)))
      }.toDF("id", "core_degree")
    } else {
      var dir = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint(false)
      var edgeCount = dir.count()
      var rounds = 0
      var converged = edgeCount == 0L
      while (!converged) {
        rounds += 1
        val keep = dir.groupBy(col("a")).agg(count(lit(1)).as("d"))
          .filter(col("d") >= k).select(col("a"))
        val next = dir
          .join(keep, Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("a", "b"), Seq("b"), "left_semi")
          .select(col("a"), col("b"))
          .localCheckpoint(false)
        val c = next.count()
        val changed = c != edgeCount
        // the guard bounds SYNCHRONOUS rounds that change the graph;
        // a final no-change sweep past the budget is the fixpoint
        // CONFIRMATION at round maxRounds and must not throw (it is
        // exactly the state a maxRounds-iteration oracle snapshots)
        if (changed && rounds > maxRounds)
          throw new IllegalStateException(
            s"KCore: no fixpoint after $maxRounds rounds " +
              s"($c directed edges left) — raise maxRounds")
        converged = !changed || c == 0L
        dir = next
        edgeCount = c
      }
      dir.groupBy(col("a")).agg(count(lit(1)).as("core_degree"))
        .select(col("a").as("id"), col("core_degree"))
    }
  }
}
