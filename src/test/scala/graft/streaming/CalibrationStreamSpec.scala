package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The maintained calibration report equals the one-shot
  * `llm_score_calibration` derivation after EVERY doc-batch prefix;
  * replays no-op; empty first batch starts the chain; idle triggers
  * on an established chain rewrite nothing. */
class CalibrationStreamSpec extends SparkSpec {

  private def report(df: DataFrame): Seq[Row] =
    df.orderBy(col("bin")).collect().toSeq

  test("streamed report == one-shot report after every prefix; " +
    "replay no-op") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .orderBy(col("doc_id")).collect()
    val schema = graft.Tables(spark, "/root/testdata/sf0.001",
      "documents").schema
    def frameOf(rows: Seq[Row]): DataFrame =
      spark.createDataFrame(new java.util.ArrayList[Row](
        java.util.Arrays.asList(rows: _*)), schema)
    val out = Files.createTempDirectory("calibstream").toString
    val cuts = Seq(docs.length / 3, 2 * docs.length / 3, docs.length)
    var prev = 0
    cuts.zipWithIndex.foreach { case (cut, i) =>
      CalibrationStream.updateBatch(
        frameOf(docs.slice(prev, cut)), out, i.toLong)
      prev = cut
      val got = report(CalibrationStream.currentReport(spark, out))
      val want = report(graft.queries.Llm.calibrationReportOf(
        graft.queries.Llm.calibrationCells(frameOf(docs.take(cut)))))
      assert(got == want, s"calibration report diverges after prefix " +
        s"$i ($cut docs):\ngot  $got\nwant $want")
    }
    // replay of a committed batch: state unchanged despite stale data
    val before = report(CalibrationStream.currentReport(spark, out))
    CalibrationStream.updateBatch(frameOf(docs.take(5)), out, 1L)
    assert(report(CalibrationStream.currentReport(spark, out)) == before,
      "replayed batch mutated the cells")
  }

  test("empty FIRST batch starts the chain; the report then matches " +
    "the one-shot of whatever arrives later") {
    import spark.implicits._
    val out = Files.createTempDirectory("calibstream2").toString
    val schema = graft.Tables(spark, "/root/testdata/sf0.001",
      "documents").schema
    val empty = spark.createDataFrame(
      new java.util.ArrayList[Row](), schema)
    CalibrationStream.updateBatch(empty, out, 0L)
    // committed an empty cells table: serving view yields zero rows
    assert(CalibrationStream.currentReport(spark, out).collect().isEmpty)
    val batch = Seq(
      (1L, "the a of and to", "en", "s0", 15L),
      (2L, "x y z w v", "de", "s1", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    CalibrationStream.updateBatch(batch, out, 1L)
    val got = report(CalibrationStream.currentReport(spark, out))
    val want = report(graft.queries.Llm.calibrationReportOf(
      graft.queries.Llm.calibrationCells(batch)))
    assert(got == want)
    assert(got.map(_.getAs[Long]("n_docs")).sum == 2L)
  }
}
