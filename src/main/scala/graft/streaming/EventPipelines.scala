package graft.streaming

import graft.Canon
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Structured Streaming pipelines over the `events` stream (SURVEY.md
  * §2.2 streaming row, §7.1 step 7): watermarked tumbling / sliding /
  * session windows. Each is the streaming twin of a batch query
  * (q22/q23/q24) — identical window semantics (epoch-aligned grids,
  * 30-min session gap), so replaying the same rows through
  * `readStream` produces the same aggregates the batch query returns
  * (asserted in StreamingSpec).
  *
  * These operate on any streaming (or batch) DataFrame with the events
  * schema; the source is the caller's choice — `readStream.format(
  * "parquet"/"kafka"/"rate")` or MemoryStream in tests. Sinks likewise
  * (`writeStream` + `foreachBatch` for idempotent parquet appends).
  */
object EventPipelines {
  import Canon._

  /** q22 twin: 1-hour tumbling event-time windows per event type. */
  def tumbling(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        d(sum(dec2(col("value")))).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** q23 twin: 1-hour windows sliding every 15 minutes. */
  def sliding(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_events"),
        d(sum(dec2(col("value")))).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("sum_value"))

  /** q24 twin: per-user sessions with a 30-minute inactivity gap,
    * using the native session_window operator. */
  def sessions(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .select(col("user_id"), col("n_events"),
        col("session_start"), col("session_end"))
}
