package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit, raise_error, when}

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
  *   (uniqueness above) in at most `maxRounds` rounds; exhausting the
  *   guard THROWS — a truncated peel is not a k-core.
  */
object KCore {

  /** @return (id, core_degree) — members of the k-core of `edges`
    *         (distinct undirected pairs) with their in-core degree. */
  def of(edges: DataFrame, k: Int, aCol: String = "u", bCol: String = "v",
      smallEdgeCap: Long = 10000000L, maxRounds: Int = 100): DataFrame = {
    require(k >= 1, s"k-core needs k >= 1, got $k")
    val spark = edges.sparkSession
    import spark.implicits._
    // a NULL endpoint is a malformed edge: fail LOUDLY in-row (the
    // ConnectedComponents discipline), not with a decode NPE or a
    // silently fabricated null node
    def req(c: org.apache.spark.sql.Column, side: String) =
      when(c.isNull, raise_error(lit(
        s"KCore: NULL $side endpoint in edges")).cast("long"))
        .otherwise(c)
    val e = edges
      .select(req(col(aCol).cast("long"), aCol).as("a"),
        req(col(bCol).cast("long"), bCol).as("b"))
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
        val queue = scala.collection.mutable.Queue.empty[Long]
        adj.keys.foreach(n => if (deg(n) < k) queue.enqueue(n))
        while (queue.nonEmpty) {
          val n = queue.dequeue()
          if (!removed(n)) {
            removed += n
            adj(n).foreach { m =>
              if (!removed(m)) {
                deg(m) -= 1
                if (deg(m) < k) queue.enqueue(m)
              }
            }
          }
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
        if (rounds > maxRounds)
          throw new IllegalStateException(
            s"KCore: no fixpoint after $maxRounds rounds " +
              s"($edgeCount directed edges left) — raise maxRounds")
        val keep = dir.groupBy(col("a")).agg(count(lit(1)).as("d"))
          .filter(col("d") >= k).select(col("a"))
        val next = dir
          .join(keep, Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("a", "b"), Seq("b"), "left_semi")
          .select(col("a"), col("b"))
          .localCheckpoint(false)
        val c = next.count()
        converged = c == edgeCount || c == 0L
        dir = next
        edgeCount = c
      }
      dir.groupBy(col("a")).agg(count(lit(1)).as("core_degree"))
        .select(col("a").as("id"), col("core_degree"))
    }
  }
}
