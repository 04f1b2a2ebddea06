package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Checkpoint recovery: the streaming dedup's state store must
  * survive a stop/restart, so a document that arrived before the
  * restart is still recognized as a duplicate after it — the
  * exactly-once contract a curation pipeline needs across deploys.
  * Uses a real file source + checkpoint dir + the idempotent
  * batch-id-partitioned parquet sink.
  */
class RecoverySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  test("streaming dedup state survives a checkpointed restart") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("recov").toString
    val inDir = s"$root/in"; val outDir = s"$root/out"
    val ckpt = s"$root/ckpt"
    new java.io.File(inDir).mkdirs()

    def writeBatch(name: String, rows: Seq[(Long, String, Timestamp)]): Unit =
      rows.toDF("doc_id", "text", "ts").coalesce(1)
        .write.mode("append").parquet(inDir)

    def runOnce(): Unit = {
      val stream = Sources.readStream(spark, inDir, schema)
      val q = Sources.foreachBatchParquet(
        DocumentStream.dedup(stream), outDir)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // nonzero event times: a row at ts <= the initial watermark (0)
    // would be dropped as late, not deduplicated
    def t(minutes: Int) = new Timestamp(60000L * minutes)
    writeBatch("b1", Seq(
      (1L, "alpha doc", t(10)), (2L, "beta doc", t(11))))
    runOnce()

    // after restart: 1 re-arrives (must be dropped — state recovered),
    // 3 is new (must pass)
    writeBatch("b2", Seq(
      (3L, "gamma doc", t(12)), (11L, "alpha doc", t(13))))
    runOnce()

    val out = spark.read.parquet(outDir)
    val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L),
      s"dedup state lost across restart: got $ids")
  }
}
