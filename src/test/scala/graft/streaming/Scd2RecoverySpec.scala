package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.types._

/** SCD2 stream state across restarts (the RecoverySpec treatment for
  * [[EventPipelines.scd2Intervals]]): a user's OPEN interval — tracked
  * state + valid_from — must survive a checkpointed stop/start, so an
  * interval that CLOSES after the restart carries the valid_from the
  * PREVIOUS run opened. Without durable state the post-restart close
  * would fabricate a late valid_from (or re-emit run-1 intervals).
  */
class Scd2RecoverySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("event_type", StringType)))

  test("an open interval's valid_from survives a checkpointed restart " +
    "and closes against a post-restart event") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("scd2rec").toString
    val inDir = s"$root/in"; val outDir = s"$root/out"
    val ckpt = s"$root/ckpt"
    new java.io.File(inDir).mkdirs()

    def t(minutes: Int) = new Timestamp(60000L * minutes)
    def writeEvents(rows: Seq[(Long, Long, Timestamp, String)]): Unit =
      rows.toDF("user_id", "event_id", "ts", "event_type").coalesce(1)
        .write.mode("append").parquet(inDir)

    def runOnce(): Unit = {
      val stream = Sources.readStream(spark, inDir, schema)
      val q = Sources.foreachBatchParquet(
        EventPipelines.scd2Intervals(stream), outDir)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    def closed(): Set[(Long, String, Timestamp, Timestamp)] = {
      val f = new java.io.File(outDir)
      if (!f.exists()) Set.empty
      else spark.read.parquet(outDir)
        .select("user_id", "state", "valid_from", "valid_to")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
          r.getTimestamp(3))).toSet
    }

    // run 1: view→click closes the view interval; click stays OPEN
    writeEvents(Seq((1L, 1L, t(0), "view"), (1L, 2L, t(10), "click")))
    runOnce()
    assert(closed() == Set((1L, "view", t(0), t(10))),
      s"after run 1: ${closed()}")

    // run 2 (restart): a same-state event extends silently, then a
    // purchase closes the click interval — valid_from must be t(10),
    // the timestamp run 1's state carried across the restart
    writeEvents(Seq((1L, 3L, t(20), "click"),
      (1L, 4L, t(30), "purchase")))
    runOnce()
    assert(closed() == Set(
      (1L, "view", t(0), t(10)),
      (1L, "click", t(10), t(30))),
      s"after run 2: ${closed()}")
  }
}
