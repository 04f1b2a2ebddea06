package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The incrementally-merged KMV sketches equal the one-shot batch
  * derivation over every prefix (union monoid), the served report is
  * the batch q107 derivation by construction, replays are no-ops,
  * and empty batches commit cleanly.
  */
object KmvStreamSpec {
  // top-level case class: Spark cannot encode an inner class without
  // its enclosing instance scope
  case class Ev(event_id: Long, event_type: String, user_id: Long)
}

class KmvStreamSpec extends SparkSpec {
  import KmvStreamSpec.Ev

  // several types, heavy duplication, > k distinct users for t0 so
  // BOTH estimator branches exercise within one run
  private def evs(ids: Range): Seq[Ev] =
    ids.map(i => Ev(i.toLong, s"t${i % 2}",
      if (i % 2 == 0) (i * 13) % 300 else (i * 7) % 20)).toSeq

  private def sketchesOf(df: DataFrame): Map[String, Seq[Long]] =
    df.collect()
      .map(r => r.getString(r.fieldIndex("event_type")) ->
        r.getSeq[Long](r.fieldIndex("sk"))).toMap

  private def batchSketches(seen: Seq[Ev]): Map[String, Seq[Long]] = {
    import spark.implicits._
    sketchesOf(graft.queries.Events.kmvOf(seen.toDF()))
  }

  test("streamed sketches equal the one-shot batch derivation after " +
    "every append; the served report matches; a replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("kmvstream").toString
    val mem = MemoryStream[Ev]
    val q = KmvStream.kmvStream(mem.toDF(), out)
      .option("checkpointLocation", s"$out/_ckpt").start()
    val batches = Seq(evs(0 until 120), evs(120 until 400),
      evs(400 until 700))
    try {
      var seen = Seq.empty[Ev]
      for (b <- batches) {
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        val served = sketchesOf(KmvStream.currentSketches(spark, out))
        assert(served == batchSketches(seen),
          s"maintained sketches diverge from the batch derivation")
        val report = KmvStream.currentReport(spark, out).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSeq
        val batchReport = graft.queries.Events.kmvReport(
          graft.queries.Events.kmvOf(seen.toDF()))
          .orderBy(col("event_type")).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSeq
        assert(report == batchReport,
          s"served report diverges: $report vs $batchReport")
      }
      // t0 crossed k=64 distinct users, t1 stayed under — both
      // estimator branches live in the final state
      val sizes = sketchesOf(KmvStream.currentSketches(spark, out))
        .map { case (t, sk) => t -> sk.length }
      assert(sizes("t0") == 64 && sizes("t1") < 64,
        s"branch coverage lost: $sizes")
    } finally q.stop()
    // replay the LATEST committed batch with DIFFERENT data
    val before = sketchesOf(KmvStream.currentSketches(spark, out))
    import spark.implicits._
    KmvStream.updateBatch(evs(900 until 1000).toDF(), out, 2L)
    assert(sketchesOf(KmvStream.currentSketches(spark, out)) == before,
      "replayed batch mutated committed state")
  }

  test("an empty batch 0 commits; the sketch appears with the first " +
    "real data; the maintained report equals q107's sketch columns " +
    "on the fixture") {
    import spark.implicits._
    val out = Files.createTempDirectory("kmvempty").toString
    KmvStream.updateBatch(Seq.empty[Ev].toDF(), out, 0L)
    assert(KmvStream.currentSketches(spark, out).collect().isEmpty)
    val dir = "/root/testdata/sf0.01"
    val fixture = graft.queries.Events.events(spark, dir)
      .select(col("event_type"), col("user_id"))
    KmvStream.updateBatch(fixture, out, 1L)
    val served = KmvStream.currentReport(spark, out).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val q107 = graft.SparkEntry.queries("q107_kmv_distinct")(spark, dir)
      .select(col("event_type"), col("sketch_size"),
        col("kth_min_hash"), col("est_distinct"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(served == q107,
      s"maintained report != q107 sketch columns: $served vs $q107")
    // and the served pairwise overlap equals q108's sketch columns
    val overlap = KmvStream.currentOverlap(spark, out).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    val q108 = graft.SparkEntry.queries("q108_kmv_overlap")(spark, dir)
      .select(col("type_a"), col("type_b"), col("rho"),
        col("est_intersection"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(overlap == q108,
      s"maintained overlap != q108 sketch columns: $overlap vs $q108")
  }
}
