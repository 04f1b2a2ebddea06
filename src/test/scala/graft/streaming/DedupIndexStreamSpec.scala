package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The incrementally-maintained near-dup index equals the batch build
  * over the documents streamed so far, replays are no-ops, and
  * re-delivered documents don't duplicate state.
  */
object DedupIndexStreamSpec {
  case class Doc(doc_id: Long, text: String)
}

class DedupIndexStreamSpec extends SparkSpec {
  import DedupIndexStreamSpec.Doc

  private val dir = "/root/testdata/sf0.001"

  private def fixtureDocs() = spark.read.parquet(s"$dir/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("streamed index == batch lshVerifiedPairsFor after every batch " +
    "prefix (fixture corpus in three appends)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = fixtureDocs().orderBy(col("doc_id"))
      .collect().map(r => Doc(r.getLong(0), r.getString(1))).toSeq
    assert(all.size >= 30, "fixture too small to split meaningfully")
    val batches = Seq(
      all.take(all.size / 3),
      all.slice(all.size / 3, 2 * all.size / 3),
      all.drop(2 * all.size / 3))
    val out = Files.createTempDirectory("dedupidx").toString
    val mem = MemoryStream[Doc]
    val q = DedupIndexStream.indexStream(mem.toDF(), out)
      .option("checkpointLocation", s"$out/_ckpt").start()
    try {
      var seen = Seq.empty[Doc]
      for (b <- batches) {
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        val want = graft.queries.Llm.lshVerifiedPairsFor(
          seen.toDF("doc_id", "text")).collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        val got = DedupIndexStream.currentPairs(spark, out).collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        assert(got == want,
          s"after ${seen.size} docs: index ${got.size} pairs vs batch " +
            s"build ${want.size}")
      }
      assert(DedupIndexStream.currentPairs(spark, out).count() > 0,
        "fixture corpus should contain verified near-dup pairs")
    } finally q.stop()
  }

  test("non-consecutive batch ids: the index is exact over committed " +
    "deltas regardless of id gaps") {
    import spark.implicits._
    val a = Seq(
      DedupIndexStreamSpec.Doc(1, "alpha beta gamma delta epsilon"),
      DedupIndexStreamSpec.Doc(2, "alpha beta gamma delta zeta"))
    val b = Seq(
      DedupIndexStreamSpec.Doc(3, "alpha beta gamma delta epsilon"))
    val c = Seq(
      DedupIndexStreamSpec.Doc(4, "alpha beta gamma delta zeta"))
    val out = Files.createTempDirectory("dedupidx3").toString
    DedupIndexStream.updateBatch(a.toDF("doc_id", "text"), out, batchId = 0)
    DedupIndexStream.updateBatch(b.toDF("doc_id", "text"), out, batchId = 5)
    DedupIndexStream.updateBatch(c.toDF("doc_id", "text"), out, batchId = 7)
    val want = graft.queries.Llm.lshVerifiedPairsFor(
      (a ++ b ++ c).toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = DedupIndexStream.currentPairs(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"$got vs $want")
  }

  test("compaction folds deltas into a base, preserves the index " +
    "exactly, and later batches keep appending on top of it") {
    import spark.implicits._
    val a = Seq(
      DedupIndexStreamSpec.Doc(1, "alpha beta gamma delta epsilon"),
      DedupIndexStreamSpec.Doc(2, "alpha beta gamma delta zeta"))
    val b = Seq(
      DedupIndexStreamSpec.Doc(3, "alpha beta gamma delta epsilon"))
    val c = Seq(
      DedupIndexStreamSpec.Doc(4, "alpha beta gamma delta zeta"))
    val out = Files.createTempDirectory("dedupidx4").toString
    DedupIndexStream.updateBatch(a.toDF("doc_id", "text"), out, batchId = 0)
    DedupIndexStream.updateBatch(b.toDF("doc_id", "text"), out, batchId = 1)
    val before = DedupIndexStream.currentPairs(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    DedupIndexStream.compact(spark, out)
    val after = DedupIndexStream.currentPairs(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before, s"compaction changed the index: $after")
    // covered deltas are gone; the base carries the state
    val pairsDir = new java.io.File(s"$out/pairs")
    val names = pairsDir.listFiles().map(_.getName).toSet
    assert(names.contains("base_v1") && !names.exists(_.startsWith("delta_")),
      s"unexpected layout after compaction: $names")
    // idempotent re-run
    DedupIndexStream.compact(spark, out)
    // appends after compaction verify against the base
    DedupIndexStream.updateBatch(c.toDF("doc_id", "text"), out, batchId = 2)
    val want = graft.queries.Llm.lshVerifiedPairsFor(
      (a ++ b ++ c).toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = DedupIndexStream.currentPairs(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"$got vs $want")
  }

  test("replayed batches and re-delivered documents are no-ops") {
    import spark.implicits._
    val docs = Seq(
      Doc(1, "alpha beta gamma delta epsilon"),
      Doc(2, "alpha beta gamma delta epsilon"),
      Doc(3, "zeta eta theta iota kappa"))
    val out = Files.createTempDirectory("dedupidx2").toString
    DedupIndexStream.updateBatch(
      docs.take(2).toDF("doc_id", "text"), out, batchId = 0)
    val v0 = DedupIndexStream.currentPairs(spark, out).collect().toSeq
    assert(v0.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 2L)))
    // replay of the committed batch 0: unchanged
    DedupIndexStream.updateBatch(
      docs.take(2).toDF("doc_id", "text"), out, batchId = 0)
    assert(DedupIndexStream.currentPairs(spark, out)
      .collect().toSeq == v0)
    // batch 1 re-delivers doc 1 (anti-joined away) plus a new doc
    DedupIndexStream.updateBatch(
      Seq(docs(0), docs(2)).toDF("doc_id", "text"), out, batchId = 1)
    val v1 = DedupIndexStream.currentPairs(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(v1 == Seq((1L, 2L)),
      s"re-delivered doc must not re-pair or duplicate: $v1")
  }
}
