package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The incrementally-maintained winnow overlap index equals the batch
  * build over the documents streamed so far — INCLUDING the df-cap
  * retraction case a pair-local index never faces — replays are
  * no-ops, and compaction preserves the view.
  */
object WinnowIndexStreamSpec {
  case class Doc(doc_id: Long, text: String)
}

class WinnowIndexStreamSpec extends SparkSpec {
  import WinnowIndexStreamSpec.Doc

  private val dir = "/root/testdata/sf0.001"

  private def batchPairs(docs: Seq[Doc]) = {
    import spark.implicits._
    graft.queries.Llm.winnowPairsFor(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
  }

  private def streamedPairs(out: String) =
    WinnowIndexStream.currentPairs(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("streamed index == batch winnowPairsFor after every batch " +
    "prefix (fixture corpus in three appends)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).orderBy(col("doc_id"))
      .collect().map(r => Doc(r.getLong(0), r.getString(1))).toSeq
    assert(all.size >= 30, "fixture too small to split meaningfully")
    val batches = Seq(
      all.take(all.size / 3),
      all.slice(all.size / 3, 2 * all.size / 3),
      all.drop(2 * all.size / 3))
    val out = Files.createTempDirectory("winidx").toString
    val mem = MemoryStream[Doc]
    val q = WinnowIndexStream.indexStream(mem.toDF(), out)
      .option("checkpointLocation", s"$out/_ckpt").start()
    try {
      var seen = Seq.empty[Doc]
      for (b <- batches) {
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        val want = batchPairs(seen)
        val got = streamedPairs(out)
        assert(got == want,
          s"after ${seen.size} docs: index ${got.size} pairs vs batch " +
            s"build ${want.size}")
      }
    } finally q.stop()
  }

  test("df-cap crossing RETRACTS: a fingerprint pushed past the cap " +
    "by an append withdraws its pair contributions, matching the " +
    "batch build exactly") {
    import spark.implicits._
    val cap = graft.queries.Llm.WinnowDfCap
    val text = "the quick brown fox jumps over the lazy dog while " +
      "seventeen amber lanterns flicker beside the winding canal road"
    // 10 identical docs: every fingerprint's posting is all 10 docs,
    // df = 10 <= cap, so all 45 pairs share every fingerprint
    val b1 = (1L to 10L).map(Doc(_, text))
    // +60 identical docs: df = 70 > cap, every fingerprint crosses —
    // the whole pair set must vanish, exactly as a batch rebuild says
    val b2 = (11L to 70L).map(Doc(_, text))
    val out = Files.createTempDirectory("winidx2").toString
    WinnowIndexStream.updateBatch(b1.toDF("doc_id", "text"), out, 0)
    val got1 = streamedPairs(out)
    assert(got1 == batchPairs(b1), "prefix 1 must match the batch build")
    assert(got1.size == 45, s"expected all C(10,2) pairs, got ${got1.size}")
    WinnowIndexStream.updateBatch(b2.toDF("doc_id", "text"), out, 1)
    val got2 = streamedPairs(out)
    assert(got2 == batchPairs(b1 ++ b2), "post-crossing parity")
    assert(got2.isEmpty,
      s"df=${b1.size + b2.size} > cap=$cap must retract every pair, " +
        s"got ${got2.size}")
  }

  test("compaction folds signed deltas (net-zero pairs drop out of " +
    "the base), preserves the view, and later appends continue on top") {
    import spark.implicits._
    val text = "pack my box with five dozen liquor jugs while zephyrs " +
      "vex the daft jumbled sphinx quietly after dusk settles in"
    val b1 = (1L to 4L).map(Doc(_, text))
    val b2 = (5L to 70L).map(Doc(_, text)) // crosses the cap
    val out = Files.createTempDirectory("winidx3").toString
    WinnowIndexStream.updateBatch(b1.toDF("doc_id", "text"), out, 0)
    WinnowIndexStream.updateBatch(b2.toDF("doc_id", "text"), out, 1)
    assert(streamedPairs(out).isEmpty)
    WinnowIndexStream.compact(spark, out)
    assert(streamedPairs(out) == batchPairs(b1 ++ b2),
      "compaction must preserve the (empty, post-retraction) view")
    // fully-retracted pairs fold to net zero and leave the base
    val baseDir = new java.io.File(s"$out/pairdelta")
    val names = baseDir.listFiles().map(_.getName).toSet
    assert(names.contains("base_v1") && !names.exists(_.startsWith("delta_")),
      s"unexpected layout after compaction: $names")
    assert(spark.read.parquet(s"$out/pairdelta/base_v1").count() == 0,
      "net-zero pair deltas must not survive compaction")
    // appends after compaction verify against the base
    val b3 = Seq(Doc(100L,
      "a completely different pair of matching documents about rivers " +
        "and the slow meander of silt through the delta plains at dawn"),
      Doc(101L,
        "a completely different pair of matching documents about rivers " +
          "and the slow meander of silt through the delta plains at dawn"))
    WinnowIndexStream.updateBatch(b3.toDF("doc_id", "text"), out, 2)
    assert(streamedPairs(out) == batchPairs(b1 ++ b2 ++ b3),
      "post-compaction appends must keep parity")
    assert(streamedPairs(out).nonEmpty)
  }

  test("seeded random corpora + random batch splits: streamed index " +
    "== batch build after every prefix (the retraction algebra under " +
    "arbitrary split points, cap crossings included)") {
    import spark.implicits._
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon",
      "one two three four five six seven eight nine ten eleven " +
        "twelve thirteen fourteen fifteen sixteen seventeen eighteen",
      "red orange yellow green blue indigo violet crimson amber " +
        "teal maroon navy olive coral silver golden bronze copper")
    for (seed <- 0 until 6) {
      val rng = new scala.util.Random(seed)
      // copy counts straddle the cap=64 boundary so some seeds cross
      // it mid-stream and exercise retraction, others stay under
      val counts = texts.map(_ => 20 + rng.nextInt(70))
      val docs = rng.shuffle(
        counts.zip(texts).zipWithIndex.flatMap { case ((n, tx), g) =>
          (0 until n).map(i => Doc((g * 1000 + i).toLong, tx))
        })
      val nBatches = 2 + rng.nextInt(3)
      val splits = docs.grouped(
        math.max(1, docs.size / nBatches + 1)).toSeq
      val out = Files.createTempDirectory(s"winrand$seed").toString
      var seen = Seq.empty[Doc]
      splits.zipWithIndex.foreach { case (b, i) =>
        WinnowIndexStream.updateBatch(b.toDF("doc_id", "text"), out, i)
        seen = seen ++ b
        val want = batchPairs(seen)
        val got = streamedPairs(out)
        assert(got == want,
          s"seed=$seed prefix=${seen.size} counts=$counts: " +
            s"${got.size} streamed vs ${want.size} batch pairs")
      }
    }
  }

  test("auto-compaction: once the configured batch count accumulates " +
    "the delta chain folds into a base, preserving the view") {
    import spark.implicits._
    val text = "sphinx of black quartz judge my vow while the jaded " +
      "zombies acted quaintly but kept driving their oxen forward"
    val out = Files.createTempDirectory("winauto").toString
    val all = (1L to 6L).map(Doc(_, text))
    all.grouped(2).zipWithIndex.foreach { case (b, i) =>
      WinnowIndexStream.updateBatch(
        b.toDF("doc_id", "text"), out, i, autoCompactEvery = 2)
    }
    // 3 batches with every=2: at least one fold ran — the pairdelta
    // chain is bounded by a base + fewer-than-every deltas
    val names = new java.io.File(s"$out/pairdelta")
      .listFiles().map(_.getName).toSet
    assert(names.exists(_.startsWith("base_v")),
      s"auto-compaction never folded: $names")
    assert(names.count(_.startsWith("delta_")) < 2,
      s"delta chain not bounded: $names")
    assert(streamedPairs(out) == batchPairs(all),
      "auto-compaction must preserve the view")
  }

  test("replayed batches and re-delivered documents are no-ops") {
    import spark.implicits._
    val text = "how vexingly quick daft zebras jump over the idle " +
      "fences beyond the quarry where the jackdaws gather at noon"
    val docs = (1L to 3L).map(Doc(_, text))
    val out = Files.createTempDirectory("winidx4").toString
    WinnowIndexStream.updateBatch(docs.toDF("doc_id", "text"), out, 0)
    val first = streamedPairs(out)
    // replay of a committed batch id: no-op
    WinnowIndexStream.updateBatch(docs.toDF("doc_id", "text"), out, 0)
    // same docs re-delivered under a NEW batch id: anti-joined away
    WinnowIndexStream.updateBatch(docs.toDF("doc_id", "text"), out, 1)
    assert(streamedPairs(out) == first,
      "replays and re-deliveries must not change the index")
    assert(streamedPairs(out) == batchPairs(docs))
    assert(first.size == 3, "C(3,2) pairs expected")
  }
}
