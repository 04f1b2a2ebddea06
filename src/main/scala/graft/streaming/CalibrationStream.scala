package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{DecimalType, LongType}

/** INCREMENTAL maintenance of the score-calibration cells — the
  * streaming twin of `llm_score_calibration` (25th maintainer): a
  * long-lived curation pipeline re-checks its scorer's calibration on
  * every ingest batch without rescanning the corpus. The state is
  * PURELY ADDITIVE — per confidence bin, (n_docs, Σscore in exact
  * DECIMAL, n_positive) — so the merged cells after any batch prefix
  * equal a one-shot `Llm.calibrationCells` pass over everything
  * streamed, and the served report (`Llm.calibrationReportOf`, the
  * SAME derivation the batch key runs) is byte-identical to the batch
  * query on the prefix (pinned in CalibrationStreamSpec).
  *
  * State under `dir` (VersionedState protocol: meta LAST = commit
  * point; replays no-op; superseded versions pruned):
  * {{{
  *   dir/cells/state_vN  (bin, n_docs, ssum, npos)  — ≤ 10 rows
  *   dir/meta/state_vN   (n_docs)
  * }}}
  */
object CalibrationStream {

  private val Stores = Seq("cells", "meta")

  /** Fold one batch of documents (text, lang) into the cells. */
  def updateBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (VersionedState.isCommitted(spark, dir, batchId))
      return // replay of a committed batch
    val prevV = VersionedState.latestBefore(spark, dir, batchId)
    val delta = graft.queries.Llm.calibrationCells(batch).persist()
    try {
      val batchDocs = delta
        .agg(coalesce(sum(col("n_docs")), lit(0L))).head.getLong(0)
      val (merged, total) = prevV match {
        case None => (delta, batchDocs)
        case Some(v) =>
          val prevTotal = spark.read
            .parquet(VersionedState.path(dir, "meta", v))
            .head().getLong(0)
          (spark.read.parquet(VersionedState.path(dir, "cells", v))
            .unionByName(delta)
            .groupBy(col("bin"))
            .agg(sum(col("n_docs")).cast(LongType).as("n_docs"),
              sum(col("ssum")).cast(DecimalType(38, 12)).as("ssum"),
              sum(col("npos")).cast(LongType).as("npos")),
            prevTotal + batchDocs)
      }
      // ≤ 10 cell rows — a coalesce(1) rewrite per trigger; an empty
      // batch contributes no delta rows (the additive identity)
      merged.coalesce(1).write.mode("overwrite")
        .parquet(VersionedState.path(dir, "cells", batchId))
      import spark.implicits._
      Seq(total).toDF("n_docs").coalesce(1)
        .write.mode("overwrite") // meta LAST = the commit point
        .parquet(VersionedState.path(dir, "meta", batchId))
      VersionedState.prune(spark, dir, Stores, batchId, prevV)
    } finally delta.unpersist(false)
  }

  /** The streaming entry point: maintain the cells under `dir`. */
  def calibrationStream(docs: DataFrame, dir: String)
      : DataStreamWriter[Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), dir, batchId)
    }

  /** The served calibration report — `Llm.calibrationReportOf` over
    * the maintained cells, the exact derivation the one-shot key
    * runs. */
  def currentReport(spark: SparkSession, dir: String): DataFrame = {
    val v = VersionedState.latestBefore(spark, dir, Long.MaxValue)
    if (v.isEmpty)
      throw new IllegalStateException(s"no committed cells under $dir")
    graft.queries.Llm.calibrationReportOf(
      spark.read.parquet(VersionedState.path(dir, "cells", v.get)))
  }
}
