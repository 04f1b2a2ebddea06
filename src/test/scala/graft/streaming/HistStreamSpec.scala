package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The incrementally-merged histogram serves a PSI report
  * byte-identical to the batch q104 over the whole prefix after every
  * append (additive integer cells + the shared expression tree);
  * replays are no-ops; empty batches commit cleanly.
  */
class HistStreamSpec extends SparkSpec {
  import ProfileStreamSpec.Doc

  private def docs(ids: Range): Seq[Doc] =
    ids.map(i => Doc(i.toLong, s"text $i", Some("en"),
      s"src${i % 4}", (i % 23) * 300L)).toSeq

  private def prefixDf(seen: Seq[Doc]): DataFrame = {
    import spark.implicits._
    seen.toDF()
  }

  private def collectPsi(df: DataFrame) =
    df.collect().map(r => r.getAs[String]("source") ->
      (r.getAs[Long]("n_docs"), r.getAs[Double]("psi"))).toMap

  test("streamed histogram serves the batch q104 PSI exactly after " +
    "every append; a replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("histstream").toString
    val mem = MemoryStream[Doc]
    val q = HistStream.histStream(mem.toDF(), out)
      .option("checkpointLocation", s"$out/_ckpt").start()
    val batches = Seq(docs(0 until 40), docs(40 until 90),
      docs(90 until 140))
    try {
      var seen = Seq.empty[Doc]
      for (b <- batches) {
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        val served = collectPsi(HistStream.currentPsi(spark, out))
        val batchPsi = collectPsi(
          graft.queries.Profiling.psiFor(prefixDf(seen)))
        assert(served == batchPsi,
          s"served PSI diverges from batch q104 over the prefix: " +
            s"$served vs $batchPsi")
      }
    } finally q.stop()
    // replay the LATEST committed batch (id 2) with DIFFERENT data —
    // the genuinely replayable case after a crash (earlier versions
    // are pruned, so only the newest commit's guard is load-bearing);
    // isCommitted must make it a no-op
    val before = collectPsi(HistStream.currentPsi(spark, out))
    HistStream.updateBatch(docs(500 until 600).toDF(), out, 2L)
    assert(collectPsi(HistStream.currentPsi(spark, out)) == before,
      "replayed batch mutated committed state")
  }

  test("an empty batch 0 commits; the report appears with the first " +
    "real data") {
    import spark.implicits._
    val out = Files.createTempDirectory("histempty").toString
    HistStream.updateBatch(Seq.empty[Doc].toDF(), out, 0L)
    // empty prefix: zero cells, so the report is a valid empty frame
    assert(HistStream.currentPsi(spark, out).collect().isEmpty)
    HistStream.updateBatch(docs(0 until 30).toDF(), out, 1L)
    val served = collectPsi(HistStream.currentPsi(spark, out))
    val batch = collectPsi(
      graft.queries.Profiling.psiFor(prefixDf(docs(0 until 30))))
    assert(served == batch)
  }
}
