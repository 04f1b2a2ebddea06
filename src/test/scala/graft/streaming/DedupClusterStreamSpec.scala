package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.ConnectedComponents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The incrementally-maintained cluster labeling equals the one-shot
  * connected components of every pair seen, after every prefix —
  * including the merge case where a late edge joins two established
  * clusters and the larger-id cluster must fully relabel. Replays are
  * no-ops, empty batches commit, and the census view matches the
  * labeling.
  */
object DedupClusterStreamSpec {
  case class Pair(a_id: Long, b_id: Long)
}

class DedupClusterStreamSpec extends SparkSpec {
  import DedupClusterStreamSpec.Pair

  private def labelMap(out: String): Map[Long, Long] =
    DedupClusterStream.currentLabels(spark, out).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def batchLabels(pairs: Seq[Pair]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.of(pairs.toDF("a_id", "b_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("streamed labeling == one-shot components of the prefix after " +
    "every batch, incl. a cross-batch cluster MERGE; replay no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("dedupclusters").toString
    // batch 1: two separate clusters {1,2,3} and {10,11};
    // batch 2: growth of one, a fresh cluster {20,21};
    // batch 3: a MERGE edge 3–10 joining the two original clusters —
    // every member of {10,11,12} must relabel to 1
    val batches = Seq(
      Seq(Pair(1, 2), Pair(2, 3), Pair(10, 11)),
      Seq(Pair(11, 12), Pair(20, 21)),
      Seq(Pair(3, 10)))
    val mem = MemoryStream[Pair]
    val q = DedupClusterStream.clusterStream(mem.toDF(), out)
      .option("checkpointLocation", s"$out/_ckpt").start()
    try {
      var seen = Seq.empty[Pair]
      for (b <- batches) {
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        assert(labelMap(out) == batchLabels(seen),
          s"labeling diverges after ${seen.size} pairs")
      }
    } finally q.stop()
    // the merge really happened: 10/11/12 carry label 1
    assert(Seq(10L, 11L, 12L).forall(labelMap(out)(_) == 1L))
    // census view
    val census = DedupClusterStream.currentClusters(spark, out)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(census == Map(1L -> 6L, 20L -> 2L))
    // replay of a committed batch id: state unchanged even with
    // different (stale) data attached to the replay
    val before = labelMap(out)
    DedupClusterStream.updateBatch(
      Seq(Pair(77, 78)).toDF("a_id", "b_id"), out, 2L)
    assert(labelMap(out) == before, "replayed batch mutated state")
    // meta audit counter survived the chain
    val v = VersionedState.latestBefore(spark, out, Long.MaxValue).get
    val meta = spark.read
      .parquet(VersionedState.path(out, "meta", v)).collect()(0)
    assert(meta.getAs[Long]("n_pairs_folded") == 6L)
    assert(meta.getAs[Long]("n_clusters") == 2L)
    assert(meta.getAs[Long]("n_nodes") == 8L)
  }

  test("an empty FIRST batch starts the chain; an empty batch on an " +
    "established chain is a free no-op (no CC pass, no state rewrite)") {
    import spark.implicits._
    val out = Files.createTempDirectory("dedupclusters2").toString
    val none = Seq.empty[Pair].toDF("a_id", "b_id")
    DedupClusterStream.updateBatch(none, out, 0L)
    assert(DedupClusterStream.currentLabels(spark, out).count() == 0L)
    DedupClusterStream.updateBatch(
      Seq(Pair(5, 6)).toDF("a_id", "b_id"), out, 1L)
    DedupClusterStream.updateBatch(none, out, 2L)
    assert(labelMap(out) == Map(5L -> 5L, 6L -> 5L))
    // the idle trigger wrote NOTHING: version 1 is still the latest
    // (an O(labeled-nodes) rewrite per pair-less trigger is exactly
    // the cost a long-lived stream cannot pay)
    assert(!VersionedState.isCommitted(spark, out, 2L))
    assert(VersionedState.latestBefore(spark, out, Long.MaxValue)
      .contains(1L))
  }

  test("labeling matches the batch twin on the fixture's verified " +
    "pairs when fed in two arrival orders") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val pairs = graft.SparkEntry.queries("llm_minhash_lsh_dedup")(
      spark, dir).select(col("a_id"), col("b_id"))
      .collect().map(r => Pair(r.getLong(0), r.getLong(1))).toSeq
    val want = batchLabels(pairs)
    for ((order, tag) <- Seq(
        (pairs, "arrival"), (pairs.reverse, "reverse"))) {
      val out = Files.createTempDirectory(s"dedupclusters_$tag").toString
      order.grouped(math.max(1, order.size / 3 + 1)).zipWithIndex
        .foreach { case (b, i) =>
          DedupClusterStream.updateBatch(
            b.toDF("a_id", "b_id"), out, i.toLong)
        }
      assert(labelMap(out) == want, s"$tag-order labeling diverges")
    }
  }
}
