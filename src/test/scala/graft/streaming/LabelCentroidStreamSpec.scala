package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The incrementally-maintained centroid moments equal the one-shot
  * batch moments of the whole prefix EXACTLY after every append,
  * replays are no-ops, the cap fires loudly, and read-time centroids
  * match the direct per-label mean.
  */
object LabelCentroidStreamSpec {
  case class Emb(label: Int, embedding: Seq[Float])
}

class LabelCentroidStreamSpec extends SparkSpec {
  import LabelCentroidStreamSpec.Emb

  private def vecs(ids: Range): Seq[Emb] = {
    val rng = new scala.util.Random(7)
    ids.map(i => Emb(i % 3,
      Seq.fill(4)((rng.nextGaussian() * 0.3).toFloat)))
  }

  private def stateMap(out: String) =
    LabelCentroidStream.current(spark, out).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDecimal(3)))
      .toMap

  test("streamed moments == batch moments of the prefix EXACTLY " +
    "after every append; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = vecs(0 until 90)
    val out = Files.createTempDirectory("centroids").toString
    val mem = MemoryStream[Emb]
    val q = LabelCentroidStream.centroidStream(mem.toDF(), out)
      .option("checkpointLocation", s"$out/_ckpt").start()
    try {
      var seen = Seq.empty[Emb]
      for (b <- Seq(all.take(30), all.slice(30, 60), all.drop(60))) {
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        val want = LabelCentroidStream
          .batchMoments(seen.toDF("label", "embedding")).collect()
          .map(r => (r.getLong(0), r.getInt(1)) ->
            (r.getLong(2), r.getDecimal(3)))
          .toMap
        assert(stateMap(out) == want,
          s"streamed moments diverge after prefix ${seen.size}")
      }
    } finally { q.stop() }
    // replay: re-apply the last batch id directly; state unchanged
    val before = stateMap(out)
    LabelCentroidStream.updateBatch(
      all.take(5).toDF("label", "embedding"), out, 2L)
    assert(stateMap(out) == before, "replay must be a no-op")
    // read-time centroids match the direct per-label-component mean
    val cents = LabelCentroidStream.centroids(spark, out).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val direct = all.groupBy(_.label).flatMap { case (l, es) =>
      (0 until 4).map { i =>
        (l.toLong, i) -> es.map(_.embedding(i).toDouble).sum / es.size
      }
    }
    cents.foreach { case (k, c) =>
      assert(math.abs(c - direct(k)) < 1e-9,
        s"centroid drifted from the direct mean at $k: $c vs ${direct(k)}")
    }
  }

  test("a store past the |labels| x dim cap is refused loudly") {
    import spark.implicits._
    val out = Files.createTempDirectory("centcap").toString
    spark.range(LabelCentroidStream.MaxMomentRows + 1)
      .selectExpr("id AS label", "CAST(0 AS INT) AS idx", "1L AS n",
        "CAST(1 AS DECIMAL(38,18)) AS sx")
      .write.parquet(VersionedState.path(out, "moments", 0))
    Seq((LabelCentroidStream.MaxMomentRows + 1, 1L))
      .toDF("n_rows", "n_observations").coalesce(1)
      .write.parquet(VersionedState.path(out, "meta", 0))
    val ex = intercept[IllegalArgumentException] {
      LabelCentroidStream.updateBatch(
        Seq(Emb(0, Seq(1f))).toDF("label", "embedding"), out, 1L)
    }
    assert(ex.getMessage.contains("cap"), ex.getMessage)
  }
}
