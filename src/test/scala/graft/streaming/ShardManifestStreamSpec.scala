package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The incrementally-merged shard manifest equals the batch
  * llm_shard_manifest over the whole prefix after every append
  * (additive counts/sums + xor-merged fingerprints through the shared
  * `Llm.shardStats` tree); replays are no-ops — load-bearing for the
  * fingerprint, where a double-xor would CANCEL a doc's contribution
  * instead of double-counting it; empty batches commit cleanly.
  */
class ShardManifestStreamSpec extends SparkSpec {
  import ProfileStreamSpec.Doc

  private def docs(ids: Range): Seq[Doc] =
    ids.map(i => Doc(i.toLong, s"text body $i word" * (1 + i % 3),
      Some("en"), s"src${i % 4}", (i % 23) * 300L)).toSeq

  private def manifestOf(df: DataFrame) =
    df.collect().map(r => r.getAs[Long]("shard") ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_chars"), r.getAs[Long]("fingerprint"))).toMap

  private def batchManifest(seen: Seq[Doc]): Map[Long, (Long, Long, Long, Long)] = {
    import spark.implicits._
    manifestOf(graft.queries.Llm.shardStats(seen.toDF()))
  }

  test("streamed manifest equals the batch form after every append; " +
    "a replay cannot double-xor a fingerprint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("shardstream").toString
    val mem = MemoryStream[Doc]
    val q = ShardManifestStream.manifestStream(mem.toDF(), out)
      .option("checkpointLocation", s"$out/_ckpt").start()
    val batches = Seq(docs(0 until 40), docs(40 until 90),
      docs(90 until 140))
    try {
      var seen = Seq.empty[Doc]
      for (b <- batches) {
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        val served = manifestOf(
          ShardManifestStream.currentManifest(spark, out))
        val batch = batchManifest(seen)
        assert(served == batch,
          s"served manifest diverges from batch over the prefix: " +
            s"$served vs $batch")
      }
    } finally q.stop()
    // replay the LATEST committed batch with ITS OWN data — the
    // dangerous case for xor state: un-guarded, the fingerprints of
    // batch 2's docs would cancel out of the manifest
    val before = manifestOf(ShardManifestStream.currentManifest(spark, out))
    ShardManifestStream.updateBatch(docs(90 until 140).toDF(), out, 2L)
    assert(manifestOf(ShardManifestStream.currentManifest(spark, out))
      == before, "replayed batch mutated committed state (fingerprint " +
      "xor is self-inverse — a double-apply cancels docs)")
  }

  test("fingerprint is order-insensitive and detects one missing doc") {
    import spark.implicits._
    val all = docs(0 until 60)
    val a = batchManifest(all)
    val b = batchManifest(scala.util.Random.shuffle(all))
    assert(a == b, "manifest must not depend on input order")
    val missing = batchManifest(all.filterNot(_.doc_id == 13L))
    val doc13 = all.find(_.doc_id == 13L).get
    val shard13 = graft.queries.Llm.shardStats(Seq(doc13).toDF())
      .collect().head.getAs[Long]("shard")
    assert(a(shard13) != missing.getOrElse(shard13, (0L, 0L, 0L, 0L)),
      "dropping a doc must flip its shard's manifest row")
    // a CONTENT edit (same doc_id, same token count, same stored
    // n_chars) must flip the fingerprint too — the fingerprint hashes
    // doc_id:text, not membership alone
    val edited = batchManifest(all.map(d =>
      if (d.doc_id == 13L) d.copy(text = d.text.replaceFirst("body", "bodz"))
      else d))
    assert(a(shard13)._4 != edited(shard13)._4,
      "a content edit left the fingerprint unchanged")
    assert(a(shard13)._1 == edited(shard13)._1 &&
      a(shard13)._2 == edited(shard13)._2,
      "the edit fixture must hold docs/tokens constant to isolate fp")
    // and routing is content-INDEPENDENT: the edited doc stays put
    assert(a.keySet == edited.keySet)
  }

  test("an empty batch 0 commits; the manifest appears with the first " +
    "real data") {
    import spark.implicits._
    val out = Files.createTempDirectory("shardempty").toString
    ShardManifestStream.updateBatch(Seq.empty[Doc].toDF(), out, 0L)
    assert(ShardManifestStream.currentManifest(spark, out)
      .collect().isEmpty)
    ShardManifestStream.updateBatch(docs(0 until 30).toDF(), out, 1L)
    assert(manifestOf(ShardManifestStream.currentManifest(spark, out))
      == batchManifest(docs(0 until 30)))
  }
}
