package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** End-to-end streaming demo: a real file-based `readStream` over the
  * events fixture → watermarked windowed aggregation → memory sink.
  * Usage: tools/run.sh graft.streaming.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // file streaming source needs an explicit schema; reuse the batch
    // loader's post-conversion schema (ts rebuilt as timestamp_ntz)
    val batch = graft.queries.Events.events(spark, sfDir)
    // the file source wants a directory; glob-filter to the events file
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$sfDir/events.parquet").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    val events = stream.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp"))
      case _ => stream.withColumn("ts", col("ts").cast("timestamp"))
    }

    val q = EventPipelines.tumbling(events).writeStream
      .format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("tumbling").orderBy(col("window_start"),
      col("event_type"))
    println(s"streaming windows: ${got.count()} rows")
    got.show(8, truncate = false)

    val want = batch.groupBy(window(col("ts").cast("timestamp"), "1 hour")
      .getField("start").as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    println(s"batch twin rows: ${want.count()} " +
      s"(match=${got.count() == want.count()})")
    spark.stop()
  }
}
