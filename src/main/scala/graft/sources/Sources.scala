package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType

/** Batch + streaming sources and sinks (SURVEY.md §2.2 scans row).
  *
  * The reference's only I/O is broker queues in / Redis out; the
  * engine's equivalents are file formats and streams. Everything here
  * is a thin, schema-explicit wrapper over Spark's own readers so
  * Catalyst keeps pushdown/pruning; the value added is the uniform
  * `format` switch, streaming-vs-batch symmetry, and an idempotent
  * batch sink (exactly-once results under retry, SURVEY §1.3).
  */
object Sources {

  /** Batch read of a table in any supported format. */
  def read(spark: SparkSession, path: String, format: String = "parquet",
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format(format)
    val withSchema = schema.fold(
      if (format == "csv" || format == "json")
        r.option("inferSchema", "true").option("header", "true")
      else r)(r.schema)
    withSchema.load(path)
  }

  /** Streaming read with the same surface (schema mandatory for file
    * streams; glob filter narrows a directory to one logical table). */
  def readStream(spark: SparkSession, dir: String, schema: StructType,
      format: String = "parquet", globFilter: Option[String] = None)
      : DataFrame = {
    val r = spark.readStream.format(format).schema(schema)
    globFilter.fold(r)(g => r.option("pathGlobFilter", g)).load(dir)
  }

  /** Idempotent parquet append: partition-overwrite by batch id —
    * replays of a micro-batch rewrite the same directory rather than
    * duplicating rows (at-least-once attempts, exactly-once results). */
  def foreachBatchParquet[T](ds: Dataset[T], outDir: String)
      : DataStreamWriter[T] =
    ds.writeStream.foreachBatch { (batch: Dataset[T], batchId: Long) =>
      batch.toDF().write.mode("overwrite")
        .parquet(s"$outDir/batch_id=$batchId")
    }
}
