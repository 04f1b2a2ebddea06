package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The incrementally-maintained BPE token store equals the batch
  * scorer under the COMMITTED merge table after every prefix, the
  * merges train exactly once, the fertility dial detects vocabulary
  * drift, and replays / re-delivered doc_ids are no-ops.
  */
object BpeStreamSpec {
  case class Doc(doc_id: Long, text: String)
}

class BpeStreamSpec extends SparkSpec {
  import BpeStreamSpec.Doc

  private def tokensMap(out: String) =
    BpeStream.currentTokens(spark, out).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  private def committed(out: String): Seq[(String, String)] =
    spark.read.parquet(s"$out/model/merges")
      .orderBy(col("merge_round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  private def fresh(): String =
    Files.createTempDirectory("bpestream").toString

  test("streamed token counts == bpeTokenCountsWith(committed merges) " +
    "after every batch prefix; the merges train once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = fresh()
    val b1 = Seq(Doc(1L, "table table scan filter"),
      Doc(2L, "table scan table"), Doc(3L, "scan filter table sort"))
    val b2 = Seq(Doc(4L, "filter table scan"), Doc(5L, "table scan"))
    val b3 = Seq(Doc(6L, "sort filter scan table"))
    val mem = MemoryStream[Doc]
    val q = BpeStream.tokenStream(mem.toDF(), out)
      .option("checkpointLocation", s"$out/_ckpt").start()
    try {
      var seen = Seq.empty[Doc]
      var committedMs: Seq[(String, String)] = null
      for (b <- Seq(b1, b2, b3)) {
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        val ms = committed(out)
        if (committedMs == null) committedMs = ms
        else assert(ms == committedMs,
          "appends must NOT retrain the merges (earlier token budgets " +
            "would silently re-price)")
        val want = graft.queries.Curation
          .bpeTokenCountsWith(seen.toDF("doc_id", "text"), committedMs)
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
            r.getLong(3)))
          .toMap
        assert(tokensMap(out) == want,
          s"streamed tokens diverge from the fixed-merges batch twin " +
            s"after prefix of ${seen.size} docs")
      }
      assert(committedMs.nonEmpty)
    } finally { q.stop() }
  }

  test("fertility falls to 1.0 on vocabulary drift, reads NULL on a " +
    "non-alphabetic batch, and replays / re-deliveries are no-ops") {
    import spark.implicits._
    val out = fresh()
    val b1 = (1L to 6L).map(i => Doc(i, "table table scan table"))
    BpeStream.updateBatch(b1.toDF("doc_id", "text"), out, 0L)
    val f0 = BpeStream.fertilities(spark, out)
      .filter(col("batch_id") === 0L).collect()(0).getDouble(2)
    assert(f0 > 1.0, s"in-distribution fertility must compress: $f0")
    // drifted batch: a letter alphabet disjoint from every merge
    BpeStream.updateBatch(
      Seq(Doc(7L, "zq vx zq"), Doc(8L, "vx zq")).toDF("doc_id", "text"),
      out, 1L)
    val f1 = BpeStream.fertilities(spark, out)
      .filter(col("batch_id") === 1L).collect()(0).getDouble(2)
    assert(f1 == 1.0,
      s"unmergeable drift batch must read fertility 1.0: $f1")
    // non-alphabetic batch: nothing priceable → NULL, not a number
    BpeStream.updateBatch(
      Seq(Doc(9L, "123 456")).toDF("doc_id", "text"), out, 2L)
    val meta2 = BpeStream.fertilities(spark, out)
      .filter(col("batch_id") === 2L).collect()(0)
    assert(meta2.isNullAt(2), s"non-alpha batch must read NULL: $meta2")
    assert(!tokensMap(out).contains(9L))
    // replay of batch 0 is a no-op
    val before = tokensMap(out)
    BpeStream.updateBatch(b1.toDF("doc_id", "text"), out, 0L)
    assert(tokensMap(out) == before, "replay must be a no-op")
    // re-delivered doc_id in a NEW batch is a no-op for that doc;
    // a re-delivered unpriceable doc must not recount into n_new
    BpeStream.updateBatch(
      Seq(Doc(9L, "123 456"), Doc(1L, "table scan"),
        Doc(10L, "table scan")).toDF("doc_id", "text"), out, 3L)
    val after = tokensMap(out)
    assert(after(1L) == before(1L),
      "a re-delivered doc_id must keep its original census")
    assert(after.contains(10L))
    val meta3 = BpeStream.fertilities(spark, out)
      .filter(col("batch_id") === 3L).collect()(0)
    assert(meta3.getLong(1) == 1L,
      s"re-delivered docs must not recount into n_new: $meta3")
  }

  test("auto-compaction soak: 16 batches with every=4 keep the delta " +
    "chain bounded and preserve the fixed-merges view") {
    import spark.implicits._
    val out = fresh()
    var seen = Seq.empty[Doc]
    for (b <- 0 until 16) {
      val batch = (0 until 10).map(i =>
        Doc(b * 10L + i, "table table scan filter table scan"))
      BpeStream.updateBatch(batch.toDF("doc_id", "text"), out,
        b.toLong, autoCompactEvery = 4)
      if (b % 4 == 3) // replay must be a no-op, not a double count
        BpeStream.updateBatch(batch.toDF("doc_id", "text"), out,
          b.toLong, autoCompactEvery = 4)
      seen = seen ++ batch
    }
    for (store <- Seq("meta", "seen", "tokens")) {
      val names = new java.io.File(s"$out/$store")
        .listFiles().map(_.getName).toSet
      assert(names.exists(_.startsWith("base_v")),
        s"$store: auto-compaction never folded: $names")
      assert(names.count(_.startsWith("delta_")) < 4,
        s"$store: delta chain not bounded: $names")
    }
    val want = graft.queries.Curation
      .bpeTokenCountsWith(seen.toDF("doc_id", "text"), committed(out))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(tokensMap(out) == want,
      "auto-compaction must preserve the fixed-merges view")
  }

  test("creation batch with no mergeable pair fails loudly; empty " +
    "creation batch commits nothing") {
    import spark.implicits._
    val out = fresh()
    BpeStream.updateBatch(
      Seq.empty[Doc].toDF("doc_id", "text"), out, 0L)
    intercept[IllegalStateException] {
      BpeStream.currentTokens(spark, out)
    }
    val ex = intercept[IllegalArgumentException] {
      BpeStream.updateBatch(
        Seq(Doc(1L, "a b a"), Doc(2L, null.asInstanceOf[String]))
          .toDF("doc_id", "text"), out, 1L)
    }
    assert(ex.getMessage.contains("no adjacent alphabetic symbol pair"),
      ex.getMessage)
  }
}
