package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The maintained split report equals the one-shot
  * `llm_split_leakage_safe` after EVERY doc-batch prefix — including
  * prefixes whose late pairs MERGE established clusters and
  * retroactively move docs between splits (the maintainer pays
  * nothing: the correction reads the labeling's current version).
  * Replays no-op; the counters stay 10 rows. */
class SplitStreamSpec extends SparkSpec {

  private def report(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.select(col("split"), col("n_docs"), col("n_groups"),
      col("leakage_free")).orderBy(col("split")).collect().toSeq

  test("streamed split == one-shot split after every prefix, with " +
    "cluster merges across prefixes; replay no-op") {
    val srcDir = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, srcDir, "documents")
      .orderBy(col("doc_id")).collect()
    val splitDir = Files.createTempDirectory("splitstream").toString
    val clusterDir = Files.createTempDirectory("splitclusters").toString

    // three prefixes of the real fixture corpus; pair DELTAS feed the
    // cluster maintainer exactly as DedupIndexStream would emit them
    val cuts = Seq(docs.length / 3, 2 * docs.length / 3, docs.length)
    var prevPairs = Set.empty[(Long, Long)]
    var prevCut = 0
    cuts.zipWithIndex.foreach { case (cut, i) =>
      val prefixDir =
        Files.createTempDirectory(s"splitprefix$i").toString
      val schema = graft.Tables(spark, srcDir, "documents").schema
      spark.createDataFrame(
          new java.util.ArrayList[Row](
            java.util.Arrays.asList(docs.take(cut): _*)), schema)
        .write.mode("overwrite")
        .parquet(s"$prefixDir/documents.parquet")

      // batch-side oracle on the same prefix
      val want = report(graft.SparkEntry
        .queries("llm_split_leakage_safe")(spark, prefixDir))

      // stream side: new docs -> counters; new verified pairs ->
      // cluster labeling
      import spark.implicits._
      val newDocs = docs.slice(prevCut, cut).map(_.getLong(0)).toSeq
      SplitStream.updateBatch(newDocs.toDF("doc_id"), splitDir, i.toLong)
      val pairsNow = graft.queries.Llm
        .lshVerifiedPairsFor(
          spark.read.parquet(s"$prefixDir/documents.parquet"))
        .select(col("a_id"), col("b_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val delta = (pairsNow -- prevPairs).toSeq.sorted
      DedupClusterStream.updateBatch(
        delta.toDF("a_id", "b_id"), clusterDir, i.toLong)
      prevPairs = pairsNow; prevCut = cut

      val got = report(
        SplitStream.currentSplit(spark, splitDir, clusterDir))
      assert(got == want, s"split report diverges after prefix $i " +
        s"(${cut} docs):\ngot  $got\nwant $want")
      assert(got.forall(_.getAs[Boolean]("leakage_free")),
        "the maintained split must stay leakage-free")
    }

    // replay of a committed batch id mutates nothing, even with stale
    // data attached
    import spark.implicits._
    val before = report(
      SplitStream.currentSplit(spark, splitDir, clusterDir))
    SplitStream.updateBatch(Seq(99999L).toDF("doc_id"), splitDir, 1L)
    assert(report(SplitStream.currentSplit(spark, splitDir, clusterDir))
      == before, "replayed batch mutated the counters")

    // the state really is bounded: 10 counter rows max
    val v = VersionedState.latestBefore(spark, splitDir, Long.MaxValue).get
    assert(spark.read.parquet(
      VersionedState.path(splitDir, "counts", v)).count() <= 10L)
  }

  test("foreachBatch stream drives the maintainer end-to-end and an " +
    "idle trigger on an established chain is a free no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val splitDir = Files.createTempDirectory("splitstream2").toString
    val clusterDir = Files.createTempDirectory("splitclusters2").toString
    // a minimal labeling so the serving view has both stores
    DedupClusterStream.updateBatch(
      Seq((1L, 2L)).toDF("a_id", "b_id"), clusterDir, 0L)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val q = SplitStream
      .splitStream(mem.toDF().select(col("value").as("doc_id")), splitDir)
      .option("checkpointLocation", s"$splitDir/_ckpt").start()
    try {
      mem.addData(1L to 200L: _*)
      q.processAllAvailable()
      val rep = report(
        SplitStream.currentSplit(spark, splitDir, clusterDir))
      assert(rep.map(_.getAs[Long]("n_docs")).sum == 200L)
      // doc 2 inherits root 1: one fewer group than docs overall
      assert(rep.map(_.getAs[Long]("n_groups")).sum == 199L)
    } finally q.stop()
    // idle trigger: nothing new committed
    val vBefore =
      VersionedState.latestBefore(spark, splitDir, Long.MaxValue)
    SplitStream.updateBatch(
      Seq.empty[Long].toDF("doc_id"), splitDir, 777L)
    assert(VersionedState.latestBefore(spark, splitDir, Long.MaxValue)
      == vBefore, "idle trigger must not rewrite state")
  }
}
