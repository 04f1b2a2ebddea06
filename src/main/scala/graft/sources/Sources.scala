package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
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
      schema: Option[StructType] = None,
      csvHeader: Boolean = true): DataFrame = {
    // header applies to CSV whether or not a schema is supplied — an
    // explicit schema must not demote the header line to a data row.
    // Headerless CSV + explicit schema: pass csvHeader = false, or
    // the first data line of every file is consumed as a header.
    val r0 = spark.read.format(format)
    val r = if (format == "csv")
      r0.option("header", csvHeader.toString) else r0
    val withSchema = schema.fold(
      if (format == "csv" || format == "json")
        r.option("inferSchema", "true")
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

  /** Exactly-once streaming MERGE: maintains a keyed running-aggregate
    * parquet table (additive measures) across micro-batches — the
    * lakehouse upsert-sink shape, without a table format. Each batch
    * version of the state is written to `outDir/state_v<batchId>`:
    * replayed batches find their version already committed (a
    * `_SUCCESS`-marked directory) and SKIP, so at-least-once attempts
    * yield exactly-once totals; a crash mid-write leaves no `_SUCCESS`
    * and the retry rewrites the same version. Readers
    * (`readRunningAgg`) resolve the highest committed version — a
    * half-written directory is never visible. State size is the key
    * cardinality, not the stream length; the per-batch merge is one
    * key-partitioned outer join of (state, batch-delta). Retention:
    * committed versions older than the previous one are pruned after
    * each commit (a restart replays at most the last batch, whose
    * predecessor is kept), so storage holds ≤2 snapshots, not the
    * stream's history. */
  def foreachBatchRunningAgg(df: DataFrame, outDir: String,
      keys: Seq[String], sums: Seq[String]): DataStreamWriter[Row] =
    df.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      mergeBatch(batch.toDF(), outDir, keys, sums, batchId)
    }

  /** One merge step (factored out so replay semantics are unit-testable
    * without a streaming query). */
  def mergeBatch(batch: DataFrame, outDir: String, keys: Seq[String],
      sums: Seq[String], batchId: Long): Unit = {
    val spark = batch.sparkSession
    val target = new Path(s"$outDir/state_v$batchId")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(target, "_SUCCESS"))) return // replay: done
    val delta = batch.groupBy(keys.map(col): _*)
      .agg(sums.map(c => sum(col(c)).as(c)).head,
        sums.map(c => sum(col(c)).as(c)).tail: _*)
    val merged = latestState(spark, outDir) match {
      case Some(state) =>
        // null-SAFE key equality: with === a NULL key never matches
        // itself, so null-key rows would survive unmatched on both
        // sides and duplicate every batch with totals that never
        // consolidate (r5 review fix)
        val joined = state.as("s").join(delta.as("d"),
          keys.map(k => col(s"s.$k") <=> col(s"d.$k")).reduce(_ && _),
          "full_outer")
        joined.select(
          keys.map(k => coalesce(col(s"s.$k"), col(s"d.$k")).as(k)) ++
          sums.map(c => (coalesce(col(s"s.$c"), lit(0L)) +
            coalesce(col(s"d.$c"), lit(0L))).as(c)): _*)
      case None => delta
    }
    merged.write.mode("overwrite").parquet(target.toString)
    pruneStateVersions(fs, outDir, batchId)
  }

  /** Retention: after version N commits, delete committed versions
    * < N-1 (one previous version is kept for crash safety while N's
    * readers may still be resolving). Without pruning, state storage
    * grows as batches × key-cardinality and every latestState listing
    * pays for the stream's whole history. Best-effort: a failed delete
    * is retried implicitly on the next batch's prune. */
  private def pruneStateVersions(fs: org.apache.hadoop.fs.FileSystem,
      outDir: String, committed: Long): Unit = {
    val base = new Path(outDir)
    scala.util.Try {
      fs.listStatus(base).foreach { s =>
        val n = s.getPath.getName
        if (s.isDirectory && n.startsWith("state_v")) {
          val v = scala.util.Try(n.stripPrefix("state_v").toLong)
          if (v.toOption.exists(_ < committed - 1) &&
              fs.exists(new Path(s.getPath, "_SUCCESS"))) {
            fs.delete(s.getPath, true)
            ()
          }
        }
      }
    }
    ()
  }

  /** The latest committed running-aggregate state, if any. */
  def latestState(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val base = new Path(outDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return None
    val versions = fs.listStatus(base).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("state_v") &&
        fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(s => s.getPath.getName.stripPrefix("state_v").toLong)
    if (versions.isEmpty) None
    else Some(spark.read.parquet(s"$outDir/state_v${versions.max}"))
  }

  /** Reader alias with the public sink-facing name. */
  def readRunningAgg(spark: SparkSession, outDir: String): DataFrame =
    latestState(spark, outDir).getOrElse(
      throw new IllegalStateException(s"no committed state under $outDir"))
}
