package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The incrementally-merged profile equals a one-shot profile of the
  * whole prefix after every batch: additive stats exactly, distinct
  * estimates identically (HLL register max-merge is order-insensitive,
  * so union-of-batch-sketches carries the same state as one sketch
  * over the union). Replays are no-ops; nulls count but never poison
  * min/max.
  */
object ProfileStreamSpec {
  case class Doc(doc_id: Long, text: String, lang: Option[String],
    source: String, n_chars: Long)
}

class ProfileStreamSpec extends SparkSpec {
  import ProfileStreamSpec.Doc

  private def docs(ids: Range, langNullEvery: Int): Seq[Doc] =
    ids.map(i => Doc(i.toLong, s"text $i",
      if (langNullEvery > 0 && i % langNullEvery == 0) None
      else Some(Seq("en", "de", "fr")(i % 3)),
      s"src${i % 4}", 100L + (i % 37))).toSeq

  private def prefixDf(seen: Seq[Doc]): DataFrame = {
    import spark.implicits._
    seen.toDF()
  }

  test("streamed profile equals the one-shot whole-prefix profile " +
    "after every append") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("profstream").toString
    val mem = MemoryStream[Doc]
    val q = ProfileStream.profileStream(mem.toDF(), out)
      .option("checkpointLocation", s"$out/_ckpt").start()
    val batches = Seq(
      docs(0 until 40, 5), docs(40 until 90, 0), docs(90 until 140, 7))
    try {
      var seen = Seq.empty[Doc]
      for (b <- batches) {
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        val served = ProfileStream.current(spark, out).collect()
          .map(r => r.getAs[String]("col_name") -> r).toMap
        assert(served.keySet ==
          ProfileStream.Columns.map(_._1).toSet)
        // exact additive/lattice stats vs scratch recomputation
        val n = seen.size.toLong
        val langNulls = seen.count(_.lang.isEmpty).toLong
        served.values.foreach(r =>
          assert(r.getAs[Long]("n_rows") == n, s"n_rows: $r"))
        assert(served("lang").getAs[Long]("n_nulls") == langNulls)
        assert(served("doc_id").getAs[Long]("n_nulls") == 0L)
        assert(served("doc_id").getAs[Long]("min_num") ==
          seen.map(_.doc_id).min)
        assert(served("doc_id").getAs[Long]("max_num") ==
          seen.map(_.doc_id).max)
        assert(served("n_chars").getAs[Long]("min_num") ==
          seen.map(_.n_chars).min)
        val meanChars = served("n_chars").getAs[Double]("mean")
        val wantMean = seen.map(_.n_chars).sum.toDouble / n
        assert(math.abs(meanChars - wantMean) < 1e-9,
          s"mean $meanChars != $wantMean")
        assert(served("source").getAs[String]("min_str") == "src0")
        assert(served("source").getAs[String]("max_str") == "src3")
        assert(served("lang").getAs[String]("min_str") ==
          seen.flatMap(_.lang).min)
        // distinct estimates: prefix-invariant = identical to a
        // one-shot sketch over everything seen so far
        val oneShot = prefixDf(seen).agg(
            hll_sketch_estimate(hll_sketch_agg(col("doc_id"), lit(14)))
              .as("doc_id"),
            hll_sketch_estimate(hll_sketch_agg(col("lang"), lit(14)))
              .as("lang"),
            hll_sketch_estimate(hll_sketch_agg(col("source"), lit(14)))
              .as("source")).head()
        for (c <- Seq("doc_id", "lang", "source"))
          assert(served(c).getAs[Long]("n_distinct_est") ==
            oneShot.getAs[Long](c),
            s"estimate for $c diverged from the one-shot sketch")
        // at these cardinalities the sketch is in exact (coupon) mode
        assert(served("doc_id").getAs[Long]("n_distinct_est") == n)
        assert(served("lang").getAs[Long]("n_distinct_est") == 3L)
      }
    } finally q.stop()
  }

  test("replayed batch is a no-op; string columns carry no numeric " +
    "stats and numeric columns no string stats") {
    import spark.implicits._
    val out = Files.createTempDirectory("profreplay").toString
    ProfileStream.updateBatch(docs(0 until 30, 3).toDF(), out, 0L)
    val before = ProfileStream.current(spark, out).collect()
    // a replay of batch 0 with DIFFERENT data must not change state
    ProfileStream.updateBatch(docs(100 until 200, 0).toDF(), out, 0L)
    val after = ProfileStream.current(spark, out).collect()
    assert(before.map(_.toString).toSeq == after.map(_.toString).toSeq,
      "replayed batch mutated committed state")
    val byCol = before.map(r => r.getAs[String]("col_name") -> r).toMap
    for (c <- Seq("lang", "source")) {
      assert(byCol(c).isNullAt(byCol(c).fieldIndex("min_num")))
      assert(byCol(c).isNullAt(byCol(c).fieldIndex("mean")))
    }
    for (c <- Seq("doc_id", "n_chars"))
      assert(byCol(c).isNullAt(byCol(c).fieldIndex("min_str")))
  }

  test("an EMPTY batch 0 commits zero counts, not NULLs, and a later " +
    "batch merges cleanly on top of it") {
    import spark.implicits._
    val out = Files.createTempDirectory("profempty").toString
    ProfileStream.updateBatch(
      Seq.empty[Doc].toDF(), out, 0L)
    val empty = ProfileStream.current(spark, out).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    empty.values.foreach { r =>
      assert(r.getAs[Long]("n_rows") == 0L, s"n_rows: $r")
      // sum() over zero rows is NULL — the committed state must
      // coalesce counts to 0 and serve estimate 0, never NULL
      assert(!r.isNullAt(r.fieldIndex("n_nulls")) &&
        r.getAs[Long]("n_nulls") == 0L, s"NULL n_nulls committed: $r")
      assert(!r.isNullAt(r.fieldIndex("n_distinct_est")) &&
        r.getAs[Long]("n_distinct_est") == 0L, s"estimate: $r")
      assert(r.isNullAt(r.fieldIndex("mean")), s"mean of nothing: $r")
    }
    // state stays mergeable: the next real batch lands on top
    ProfileStream.updateBatch(docs(0 until 25, 5).toDF(), out, 1L)
    val after = ProfileStream.current(spark, out).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(after("doc_id").getAs[Long]("n_rows") == 25L)
    assert(after("doc_id").getAs[Long]("n_distinct_est") == 25L)
    assert(after("lang").getAs[Long]("n_nulls") == 5L)
  }
}
