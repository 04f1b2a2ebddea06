package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Source/sink semantics: format round-trips preserve data; the
  * idempotent foreachBatch sink survives a stop/restart from
  * checkpoint without duplicating rows (SURVEY.md §7.4 risks 1 and 3 —
  * streaming pause/resume is stop + restart from checkpoint, and
  * at-least-once replays must yield exactly-once results).
  */
class SourcesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("csv, json, and orc round-trip the nation table") {
    val tmp = Files.createTempDirectory("srcfmt").toString
    val nation = Sources.read(spark, s"$dir/nation.parquet")
    nation.write.option("header", "true").csv(s"$tmp/csv")
    nation.write.json(s"$tmp/json")
    nation.write.orc(s"$tmp/orc")
    val fromCsv = Sources.read(spark, s"$tmp/csv", "csv")
    val fromJson = Sources.read(spark, s"$tmp/json", "json")
    val fromOrc = Sources.read(spark, s"$tmp/orc", "orc")
    assert(fromCsv.count() == nation.count())
    assert(fromJson.count() == nation.count())
    assert(fromOrc.count() == nation.count())
    assert(fromCsv.select(sum(col("n_nationkey"))).head().getLong(0) ==
      nation.select(sum(col("n_nationkey"))).head().getLong(0))
    // orc keeps the exact schema (columnar like parquet)
    assert(fromOrc.schema == nation.schema)
  }

  test("foreachBatch parquet sink is exactly-once across a " +
    "checkpointed stop/restart") {
    val tmp = Files.createTempDirectory("sink").toString
    val ckpt = s"$tmp/ckpt"
    val out = s"$tmp/out"
    val schema = spark.read.parquet(s"$dir/events.parquet").schema

    def startQuery() = Sources.foreachBatchParquet(
      Sources.readStream(spark, dir, schema,
        globFilter = Some("events.parquet"))
        .select(col("event_id"), col("user_id")),
      out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()

    val q1 = startQuery()
    q1.awaitTermination(120000)
    val n1 = spark.read.parquet(out).count()
    assert(n1 == 1000) // all fixture events, once

    // restart from the same checkpoint: nothing new -> no duplicates
    val q2 = startQuery()
    q2.awaitTermination(120000)
    val n2 = spark.read.parquet(out).count()
    assert(n2 == n1, "restart from checkpoint duplicated rows")
  }
}
