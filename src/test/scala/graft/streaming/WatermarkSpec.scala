package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Watermark semantics (SURVEY.md §2.2 streaming row: "late data
  * dropped per watermark"): in append mode a window only emits once
  * the watermark passes its end, and events arriving after the
  * watermark has moved past their window are dropped, not merged.
  */
class WatermarkSpec extends SparkSpec {

  private case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  private def ev(id: Long, minute: Int): Ev =
    Ev(id, Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00"),
      1L, "click", 1.0, "{}")

  test("append-mode windows finalize at the watermark and drop later " +
    "stragglers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = EventPipelines.tumbling(mem.toDF(), watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("wm")
      .outputMode(OutputMode.Append()).start()
    try {
      // two events in the 00:00 window, then advance event time far
      // enough (01:30) that the watermark (max - 10min) passes 01:00
      mem.addData(ev(1, 5), ev(2, 40))
      q.processAllAvailable()
      mem.addData(ev(3, 90))
      q.processAllAvailable()
      val emitted = spark.table("wm").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(2))).toMap
      assert(emitted == Map("2024-01-01 00:00:00.0" -> 2L))

      // a straggler for the already-finalized 00:00 window: dropped
      mem.addData(ev(4, 10))
      q.processAllAvailable()
      // close out remaining windows by advancing far ahead
      mem.addData(ev(5, 300))
      q.processAllAvailable()
      val finalRows = spark.table("wm").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(2))).toMap
      // 00:00 still counts 2 (straggler dropped); 01:30 window emitted
      assert(finalRows("2024-01-01 00:00:00.0") == 2L)
      assert(finalRows("2024-01-01 01:00:00.0") == 1L)
      assert(!finalRows.contains("2024-01-01 00:00:00.0") ||
        finalRows("2024-01-01 00:00:00.0") == 2L)
    } finally q.stop()
  }
}
