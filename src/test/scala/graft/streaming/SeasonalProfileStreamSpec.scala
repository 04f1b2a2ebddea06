package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The incrementally-merged seasonal profile equals the one-shot
  * batch profile of the whole prefix EXACTLY after every append
  * (decimal sums are order-independent), and replays are no-ops.
  */
object SeasonalProfileStreamSpec {
  case class Ev(ts: Timestamp, event_type: String, value: Double)
}

class SeasonalProfileStreamSpec extends SparkSpec {
  import SeasonalProfileStreamSpec.Ev

  private def ev(day: Int, hr: Int, t: String, v: Double): Ev =
    Ev(Timestamp.valueOf(f"2024-01-$day%02d $hr%02d:30:00"), t, v)

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("event_type"), col("hr"), col("n"),
        col("sx").cast("string"), col("sxx").cast("string"))
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("streamed profile equals the one-shot profile of the whole " +
    "prefix after every append") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batches = Seq(
      Seq(ev(1, 9, "click", 1.25), ev(1, 9, "click", 2.50),
        ev(1, 10, "view", 7.75)),
      Seq(ev(2, 9, "click", 4.00), ev(2, 23, "purchase", 100.01)),
      Seq(ev(3, 9, "click", 0.75), ev(3, 10, "view", 3.25),
        ev(3, 23, "purchase", 0.99)))
    val out = Files.createTempDirectory("seasonstream").toString
    val mem = MemoryStream[Ev]
    val q = SeasonalProfileStream.profileStream(mem.toDF(), out)
      .option("checkpointLocation", s"$out/_ckpt").start()
    try {
      var seen = Seq.empty[Ev]
      for (b <- batches) {
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        val streamed = SeasonalProfileStream.current(spark, out)
        val oneShot = SeasonalProfileStream.batchProfile(seen.toDF())
        assert(canon(streamed) == canon(oneShot),
          s"profile diverged after ${seen.size} events")
      }
    } finally q.stop()
  }

  test("replayed batch is a no-op; an empty first batch commits an " +
    "empty profile that later batches merge onto") {
    import spark.implicits._
    val out = Files.createTempDirectory("seasonreplay").toString
    SeasonalProfileStream.updateBatch(
      Seq.empty[Ev].toDF(), out, 0L) // empty prefix commits cleanly
    assert(SeasonalProfileStream.current(spark, out).count() == 0L)
    val b1 = Seq(ev(1, 9, "click", 1.00), ev(1, 9, "click", 2.00)).toDF()
    SeasonalProfileStream.updateBatch(b1, out, 1L)
    val before = canon(SeasonalProfileStream.current(spark, out))
    // replay with DIFFERENT content: committed batch id → ignored
    SeasonalProfileStream.updateBatch(
      Seq(ev(1, 9, "click", 99.0)).toDF(), out, 1L)
    assert(canon(SeasonalProfileStream.current(spark, out)) == before)
  }

  test("the maintained profile drives the q87 anomaly screen: z-score " +
    "flags computed from the streamed profile match the batch query's " +
    "flag counts on the same data") {
    import spark.implicits._
    val out = Files.createTempDirectory("seasonserve").toString
    // two batches of a known distribution + one wild outlier
    val base = (1 to 50).map(i => ev(1 + i % 20, 9, "click",
      10.0 + (i % 5))) // values 10..14
    val outlier = Seq(ev(25, 9, "click", 500.0))
    SeasonalProfileStream.updateBatch(base.toDF(), out, 0L)
    SeasonalProfileStream.updateBatch(outlier.toDF(), out, 1L)
    val prof = SeasonalProfileStream.current(spark, out)
      .withColumn("mean", col("sx").cast("double") / col("n"))
      .withColumn("std", sqrt((col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double") / col("n"))
        / (col("n") - 1)))
    val all = (base ++ outlier).toDF()
    val flagged = all.withColumn("hr", hour(col("ts")).cast("int"))
      .join(prof, Seq("event_type", "hr"))
      .filter(abs(col("value") - col("mean")) > lit(3.0) * col("std"))
      .count()
    assert(flagged == 1L, s"expected exactly the planted outlier, " +
      s"got $flagged")
  }
}
