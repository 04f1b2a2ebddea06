package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The incrementally-merged ADC top-k serves the batch shortlist
  * exactly after every append — frozen codebook/query artifacts, one
  * shared `scoreAdc` tree, monoid top-k merge; replays are no-ops;
  * the full-corpus stream lands bit-identical to `llm_ann_pq`.
  */
object AnnTopKStreamSpec {
  // top-level case class: Spark cannot encode an inner class without
  // its enclosing instance scope
  case class Vec(vec_id: Long, embedding: Seq[Float])
}

class AnnTopKStreamSpec extends SparkSpec {
  import AnnTopKStreamSpec.Vec

  private val dir = "/root/testdata/sf0.01"

  private def fixtureVecs(): Seq[Vec] =
    graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => Vec(r.getLong(0), r.getSeq[Float](1)))
      .toSeq

  private def collectTopK(df: DataFrame): Seq[(Long, Double)] =
    df.collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[Double]("adc"))).toSeq

  private def batchReferent(seen: Seq[Vec], state: String)
      : Seq[(Long, Double)] = {
    import spark.implicits._
    val cb = spark.read.parquet(VersionedState.path(state, "cb", 0L))
    val qv = spark.read.parquet(VersionedState.path(state, "qv", 0L))
    collectTopK(
      AnnTopKStream.scoreAdc(
        seen.toDF()
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id"),
            expr("transform(embedding, x -> cast(x as double))")
              .as("ed")),
        cb, qv)
        .orderBy(col("adc").desc, col("vec_id"))
        .limit(AnnTopKStream.K))
  }

  test("streamed top-k equals the one-shot batch shortlist over every " +
    "prefix (exact doubles); a replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("anntopk").toString
    val all = fixtureVecs()
    AnnTopKStream.build(
      graft.Tables(spark, dir, "embeddings"), out)
    val mem = MemoryStream[Vec]
    val q = AnnTopKStream.topkStream(mem.toDF(), out)
      .option("checkpointLocation", s"$out/_ckpt").start()
    val batches = Seq(all.take(150), all.slice(150, 330), all.drop(330))
    try {
      var seen = Seq.empty[Vec]
      for (b <- batches) {
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        val served = collectTopK(AnnTopKStream.currentTopK(spark, out))
        val ref = batchReferent(seen, out)
        assert(served == ref,
          s"served shortlist diverges from the batch referent over " +
            s"the prefix: $served vs $ref")
      }
    } finally q.stop()
    // replay the LATEST committed batch with DIFFERENT data — the
    // genuinely replayable case after a crash; isCommitted must make
    // it a no-op
    val before = collectTopK(AnnTopKStream.currentTopK(spark, out))
    AnnTopKStream.updateBatch(
      all.take(50).map(v => Vec(v.vec_id + 900000, v.embedding))
        .toDF(), out, 2L)
    assert(collectTopK(AnnTopKStream.currentTopK(spark, out)) == before,
      "replayed batch mutated committed state")
  }

  test("the full-corpus stream serves llm_ann_pq's shortlist " +
    "bit-identically (same codebook, same scorer, same order)") {
    import spark.implicits._
    val out = Files.createTempDirectory("anntopkpq").toString
    AnnTopKStream.build(graft.Tables(spark, dir, "embeddings"), out)
    val all = fixtureVecs()
    AnnTopKStream.updateBatch(all.take(200).toDF(), out, 0L)
    AnnTopKStream.updateBatch(all.drop(200).toDF(), out, 1L)
    val served = AnnTopKStream.currentTopK(spark, out)
      .select(col("vec_id"), round(col("adc"), 4).as("adc_score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val batch = graft.SparkEntry.queries("llm_ann_pq")(spark, dir)
      .select(col("vec_id"), col("adc_score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served == batch,
      s"streamed shortlist != llm_ann_pq: $served vs $batch")
  }

  test("build() refuses to overwrite an already-maintained state " +
    "unless forced (score bases must not mix)") {
    import spark.implicits._
    val out = Files.createTempDirectory("anntopkguard").toString
    val emb = graft.Tables(spark, dir, "embeddings")
    AnnTopKStream.build(emb, out)
    // re-build before any batch is scored: harmless, codebook not yet
    // the base of any accumulated score
    AnnTopKStream.build(emb, out)
    AnnTopKStream.updateBatch(fixtureVecs().take(50).toDF(), out, 0L)
    val e = intercept[IllegalArgumentException] {
      AnnTopKStream.build(emb, out)
    }
    assert(e.getMessage.contains("mix score bases"))
    AnnTopKStream.build(emb, out, force = true) // explicit intent OK
  }

  test("an empty batch commits; update without build() fails loudly") {
    import spark.implicits._
    val out = Files.createTempDirectory("anntopkempty").toString
    val ex = intercept[IllegalArgumentException] {
      AnnTopKStream.updateBatch(
        Seq.empty[Vec].toDF(), out, 0L)
    }
    assert(ex.getMessage.contains("build()"),
      s"unexpected failure: ${ex.getMessage}")
    AnnTopKStream.build(graft.Tables(spark, dir, "embeddings"), out)
    AnnTopKStream.updateBatch(Seq.empty[Vec].toDF(), out, 0L)
    assert(AnnTopKStream.currentTopK(spark, out).collect().isEmpty)
    val some = fixtureVecs().take(40)
    AnnTopKStream.updateBatch(some.toDF(), out, 1L)
    assert(collectTopK(AnnTopKStream.currentTopK(spark, out)) ==
      batchReferent(some, out))
  }
}
