package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * One parquet file per table under `$dir/`; schemas documented in
  * FIXTURES.md. All reads go through here so every query benefits from
  * the same scan path (columnar parquet + pushdown + pruning).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // When set, reads for exactly this dir resolve to the registered
  // (persisted) temp views instead of re-reading parquet — the bench
  // fast path. Reads for any other dir keep full parquet semantics.
  @volatile private var viewDir: Option[String] = None

  /** Persist + materialize every table of `dir` and register it as a
    * temp view, so subsequent `Tables(spark, dir, _)` calls skip
    * parquet footer re-resolution (per-query planning floor).
    *
    * Tables are repartitioned to `parts` first: the local fixtures
    * are single small parquet files = ONE input split, which serializes
    * every pre-shuffle stage (e.g. shingle extraction ran 1-threaded,
    * 3.6 s; at 32 parts, 0.5 s). A production cluster gets thousands
    * of splits from the source layout naturally — this recreates that
    * parallelism at fixture scale. */
  def registerViews(spark: SparkSession, dir: String,
      level: org.apache.spark.storage.StorageLevel,
      parts: Int = 0): Unit = {
    all.foreach { n =>
      val raw = spark.read.parquet(s"$dir/$n.parquet")
      val df = if (parts > 0) raw.repartition(parts) else raw
      df.persist(level)
      df.count()
      df.createOrReplaceTempView(n)
    }
    viewDir = Some(dir)
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (viewDir.contains(dir)) spark.table(name)
    else spark.read.parquet(s"$dir/$name.parquet")
}

/** Cross-engine canonicalization helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running
  * the oracle SQL on the same inputs. Floating-point aggregation is
  * order-dependent, so every money aggregate is computed in exact
  * DECIMAL arithmetic (the fixtures' money columns are 2-decimal
  * doubles, which `DECIMAL(18,2)` recovers exactly) and only converted
  * to DOUBLE once, at the end — a single correctly-rounded conversion
  * that both engines perform identically. See SURVEY.md §7.4 (risk 4).
  */
object Canon {
  /** Exact decimal view of a 2-decimal money double. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Final exact-decimal → double conversion for output columns. */
  def d(c: Column): Column = c.cast(DoubleType)

  /** Timestamp literal pinned to UTC session time. */
  def ts(s: String): Column = to_timestamp(lit(s))
}
