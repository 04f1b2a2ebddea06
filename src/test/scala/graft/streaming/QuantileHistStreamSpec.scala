package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The incrementally-merged value histogram serves q80's witness
  * quantiles (median_cents_x2, mad_cents_x4) byte-identical to the
  * batch derivation over the whole prefix after every append —
  * additive integer cells + the shared `Stats.madOfCells` tree;
  * replays are no-ops; empty batches commit cleanly.
  */
object QuantileHistStreamSpec {
  // top-level case class: Spark cannot encode an inner class without
  // its enclosing instance scope
  case class Ev(event_id: Long, event_type: String, value: Double)
}

class QuantileHistStreamSpec extends SparkSpec {
  import QuantileHistStreamSpec.Ev

  // values on the 0.01 grid with per-type spread, including
  // duplicates (histogram counts > 1) and odd/even group sizes so
  // both witness-interpolation branches exercise
  private def evs(ids: Range): Seq[Ev] =
    ids.map(i => Ev(i.toLong, s"t${i % 3}",
      ((i * 37) % 500 + (i % 7) * 100) / 100.0)).toSeq

  private def prefixDf(seen: Seq[Ev]): DataFrame = {
    import spark.implicits._
    seen.toDF()
  }

  private def collectMad(df: DataFrame) =
    df.collect().map(r => r.getAs[String]("event_type") ->
      (r.getAs[Long]("median_cents_x2"), r.getAs[Long]("mad_cents_x4")))
      .toMap

  private def batchMad(seen: Seq[Ev]) =
    collectMad(graft.queries.Stats.madOfCells(
      graft.queries.Stats.valueCells(prefixDf(seen))))

  test("streamed histogram serves the batch q80 witness quantiles " +
    "exactly after every append; a replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("qhiststream").toString
    val mem = MemoryStream[Ev]
    val q = QuantileHistStream.quantileStream(mem.toDF(), out)
      .option("checkpointLocation", s"$out/_ckpt").start()
    val batches = Seq(evs(0 until 40), evs(40 until 91),
      evs(91 until 140))
    try {
      var seen = Seq.empty[Ev]
      for (b <- batches) {
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        val served = collectMad(
          QuantileHistStream.currentMad(spark, out))
        assert(served == batchMad(seen),
          s"served quantiles diverge from batch q80 over the prefix: " +
            s"$served vs ${batchMad(seen)}")
      }
    } finally q.stop()
    // replay the LATEST committed batch with DIFFERENT data — the
    // genuinely replayable case after a crash; isCommitted must make
    // it a no-op
    val before = collectMad(QuantileHistStream.currentMad(spark, out))
    QuantileHistStream.updateBatch(evs(500 until 600).toDF(), out, 2L)
    assert(collectMad(QuantileHistStream.currentMad(spark, out))
      == before, "replayed batch mutated committed state")
  }

  test("an empty batch 0 commits; the report appears with the first " +
    "real data") {
    import spark.implicits._
    val out = Files.createTempDirectory("qhistempty").toString
    QuantileHistStream.updateBatch(Seq.empty[Ev].toDF(), out, 0L)
    assert(QuantileHistStream.currentMad(spark, out).collect().isEmpty)
    QuantileHistStream.updateBatch(evs(0 until 31).toDF(), out, 1L)
    assert(collectMad(QuantileHistStream.currentMad(spark, out))
      == batchMad(evs(0 until 31)))
  }

  test("the served report also matches the REAL q80 query on the " +
    "fixture table (state built from the same rows)") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("qhistfixture").toString
    val ev = graft.queries.Events.events(spark, dir)
      .select("event_id", "event_type", "value")
    QuantileHistStream.updateBatch(ev, out, 0L)
    val served = collectMad(QuantileHistStream.currentMad(spark, out))
    val q80 = collectMad(
      graft.SparkEntry.queries("q80_mad")(spark, dir))
    assert(served == q80,
      s"state-served report diverges from q80 on the fixture: " +
        s"$served vs $q80")
  }
}
