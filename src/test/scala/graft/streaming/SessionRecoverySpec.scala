package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.types._

/** Session-window state across restarts (VERDICT r5 #7, the
  * RecoverySpec treatment applied to q24's streaming twin): an OPEN
  * session must survive a checkpointed stop/start and keep absorbing
  * events, a CLOSED session must stay closed — a late event below the
  * recovered watermark is dropped, never reopening or duplicating the
  * emitted row — and watermark eviction itself must be restart-
  * durable (the recovered run drops late data by the watermark the
  * PREVIOUS run advanced).
  */
class SessionRecoverySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("ts", TimestampType)))

  test("open sessions survive a checkpointed restart; late events " +
    "below the recovered watermark cannot reopen a closed session") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("sessrec").toString
    val inDir = s"$root/in"; val outDir = s"$root/out"
    val ckpt = s"$root/ckpt"
    new java.io.File(inDir).mkdirs()

    def t(minutes: Int) = new Timestamp(60000L * minutes)
    def writeEvents(rows: Seq[(Long, Timestamp)]): Unit =
      rows.toDF("user_id", "ts").coalesce(1)
        .write.mode("append").parquet(inDir)

    def runOnce(): Unit = {
      val stream = Sources.readStream(spark, inDir, schema)
      val q = Sources.foreachBatchParquet(
        EventPipelines.sessions(stream, watermark = "10 minutes"), outDir)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    def sessions(): Set[(Long, Long, Timestamp, Timestamp)] = {
      val f = new java.io.File(outDir)
      if (!f.exists()) Set.empty
      else spark.read.parquet(outDir)
        .select("user_id", "n_events", "session_start", "session_end")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
          r.getTimestamp(3))).toSet
    }

    // ---- run 1: two sessions close, one stays open -------------------
    // users 1 and 2 cluster at t≈600; user 3's lone event at t=840
    // advances the watermark to 830, far past 600+30(gap)+10(wm) —
    // both early sessions finalize and emit; user 3's stays OPEN
    writeEvents(Seq((1L, t(600)), (1L, t(610)), (2L, t(605))))
    writeEvents(Seq((3L, t(840))))
    writeEvents(Seq((3L, t(841)))) // next batch: watermark now 830+
    runOnce()
    val afterRun1 = sessions()
    assert(afterRun1 == Set(
      (1L, 2L, t(600), t(610)),
      (2L, 1L, t(605), t(605))),
      s"closed sessions after run 1: $afterRun1")

    // ---- run 2 (restart): late drop + open-session merge -------------
    // user 1 at t=620 is BELOW the recovered watermark (~831): dropped
    // by eviction state that survived the restart — it must neither
    // reopen user 1's emitted session nor start a new one. User 3 at
    // t=845 extends the OPEN pre-restart session (840/841 state
    // recovered from the checkpoint). User 4 then advances the
    // watermark so user 3's merged session closes.
    writeEvents(Seq((1L, t(620)), (3L, t(845))))
    writeEvents(Seq((4L, t(1300))))
    writeEvents(Seq((4L, t(1301)))) // advance watermark past 845+30+10
    runOnce()
    val afterRun2 = sessions()
    assert(afterRun2.count(_._1 == 1L) == 1,
      s"late event must not reopen/duplicate user 1's session: " +
        s"${afterRun2.filter(_._1 == 1L)}")
    assert(afterRun2.contains((3L, 3L, t(840), t(845))),
      s"user 3's open session must survive the restart and absorb " +
        s"the post-restart event as ONE session: $afterRun2")
    assert(!afterRun2.exists(_._1 == 4L),
      s"user 4's session is still open and must not emit: $afterRun2")
  }
}
