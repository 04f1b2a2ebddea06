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

  /** Per-task row budget for LIGHT (relational) rows: a local task
    * costs ~2-5 ms to launch, so it needs ≥ tens of ms of real work
    * before parallelism pays — ~32k relational rows. The constant is
    * an overhead-amortization bound, not a fixture fit: a 100 TB
    * deployment derives tens of thousands of partitions from the same
    * rule (there it is expressed in bytes via maxPartitionBytes); a
    * 10 MB cached fixture derives single digits. Slicing every table
    * to `cpus` regardless of size (the r1-r6 scheme) paid 32 task
    * launches per stage for ~3k-row slivers — measured 6.35 s vs
    * 3.70 s over 14 representative queries (BASELINE.md, r7). */
  val TargetRowsPerTask: Long = 32768L

  /** Per-row kernel weight relative to a relational row, for tables
    * whose scans run CPU-heavy kernels: `documents` feeds
    * tokenization / shingling / rolling-hash expressions (~1 KB text,
    * 100s of ops per row) and `embeddings` feeds O(dim)-per-candidate
    * vector arithmetic. Their scans stay wide (the 1-part shingle
    * build measured 3.6 s vs 0.5 s at 32 parts) while light tables
    * stop paying 32 launches for 3k-row tasks. */
  val workWeight: Map[String, Long] =
    Map("documents" -> 256L, "embeddings" -> 1024L)

  /** Scan parallelism from the work model: weighted rows over the
    * per-task budget, clamped to [1, cap]. */
  def partsFor(name: String, rows: Long, cap: Int): Int = {
    val work = rows * workWeight.getOrElse(name, 1L)
    val p = (work + TargetRowsPerTask - 1) / TargetRowsPerTask
    math.min(cap.toLong, math.max(1L, p)).toInt
  }

  /** Persist + materialize every table of `dir` and register it as a
    * temp view, so subsequent `Tables(spark, dir, _)` calls skip
    * parquet footer re-resolution (per-query planning floor).
    *
    * `parts > 0` repartitions every table to that width; `parts = -1`
    * sizes each table individually from the work model (`partsFor`,
    * capped at the session's core count) — fixtures are single small
    * parquet files = ONE input split, which serializes CPU-heavy
    * scans, while a flat `cpus` width over-parallelizes light ones.
    * A production cluster gets bytes-sized splits from the source
    * layout naturally; this recreates the same sizing at fixture
    * scale. */
  def registerViews(spark: SparkSession, dir: String,
      level: org.apache.spark.storage.StorageLevel,
      parts: Int = 0): Unit = {
    val cap = spark.sparkContext.defaultParallelism
    all.foreach { n =>
      val raw = spark.read.parquet(s"$dir/$n.parquet")
      val p =
        if (parts == -1) partsFor(n, raw.count(), cap) // metadata count
        else parts
      val df = if (p > 0) raw.repartition(p) else raw
      df.persist(level)
      df.count()
      df.createOrReplaceTempView(n)
    }
    viewDir = Some(dir)
  }

  /** Test hook: unregister the cached views so reads fall back to
    * parquet-direct plans (shared test sessions must not leak the
    * bench fast path into other suites' plan pins). */
  private[graft] def clearViews(spark: SparkSession): Unit = {
    viewDir = None
    all.foreach { n =>
      try {
        spark.table(n).unpersist()
        spark.catalog.dropTempView(n)
      } catch { case _: Throwable => () }
    }
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

  /** Exact-integer HALF_UP of the non-negative rational `num/den` at
    * `scale` decimals, returned as DOUBLE: floor((2·num·10^s + den) /
    * (2·den)) then ONE correctly-rounded division by 10^s.
    * round(double, s) on a small-denominator rational is the
    * documented cross-engine tie class (Spark rounds the shortest
    * decimal repr, other engines the binary value or half-even —
    * version-dependent); this form has no tie to split. `num` and
    * `den` must be integral-valued columns (counts, cents, sizes),
    * den > 0, num >= 0; the mirrored DuckDB spelling is
    * `CAST((2*num*10^s + den) // (2*den) AS DOUBLE) / 10^s.0`.
    */
  def halfUp(num: Column, den: Column, scale: Int): Column = {
    import org.apache.spark.sql.functions.{lit, when}
    // DECIMAL(38,0) arithmetic: 2·num·10^s must not wrap — a Long
    // intermediate silently wrapped above ~4.6e14 at scale 4 (ADVICE
    // r10), and the DuckDB mirror's HUGEINT would NOT wrap, turning
    // an overflow into a cross-engine divergence. DECIMAL gives 38
    // digits of headroom and IntegralDivide on decimals is exact.
    val d38 = DecimalType(38, 0)
    val tenS = lit(math.pow(10, scale).toLong)
    val n2 = num.cast(d38) * lit(2L) * tenS + den.cast(d38)
    val d2 = den.cast(d38) * lit(2L)
    val q = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftBridge.expression(n2),
        org.apache.spark.sql.GraftBridge.expression(d2)))
      .cast(DoubleType) / lit(math.pow(10, scale))
    // precondition guard (ADVICE r10): the identity floor((2p+q)/(2q))
    // == round-half-up(p/q) holds for p ≥ 0, q > 0 only — and Spark
    // DIV truncates toward zero while DuckDB // floors, so a negative
    // fractional quotient would silently diverge cross-engine. NULL
    // keeps the engines mirrored (DuckDB's den=0 path yields NULL
    // too); any call site that hits this gets a visibly-null cell
    // instead of a silently-wrong one.
    when(den <= lit(0) || num < lit(0), lit(null)).otherwise(q)
  }
}

/** Rank-selected witness quantiles — the round-11 integer-cell
  * presentation discipline, in ONE place (review r11: the rank/
  * interpolation arithmetic was hand-expanded in five Scala sites and
  * six oracle spellings; a fix applied to one copy but not all would
  * silently diverge engines on one query).
  *
  * The exact interpolated percentile p = pNum/pDen over a group of n
  * values sorted ascending sits at 0-based position h = p·(n−1):
  * lower-witness 1-based rank lo = (pNum·(n−1)) div pDen + 1, fraction
  * numerator f = (pNum·(n−1)) mod pDen, and the value ×pDen is the
  * INTEGER (pDen−f)·v[lo] + f·v[lo+1] — no engine version has any
  * room to disagree on integer cells. Usage shape (the q90-family
  * conditional aggregation): a row frame carrying `rn` (row_number
  * over the group's sort) and `n` (group count) aggregates
  * `vaAgg`/`vbAgg`, then `scaled` presents the integer. The DuckDB
  * spellings are generated by the *Sql twins so both engines share
  * one formula by construction.
  */
object Witness {
  import org.apache.spark.sql.functions.{coalesce, expr, lit, min, when}

  /** min(value at the lower-witness rank) — aggregate over a frame
    * with columns `rn` and `n`. */
  def vaAgg(value: Column, pNum: Int, pDen: Int): Column =
    min(when(expr("rn") === expr(loRankExpr("n", pNum, pDen)), value))

  /** min(value at the upper-witness rank); NULL when lo = n (f = 0
    * there, so `scaled`'s coalesce never reads it). */
  def vbAgg(value: Column, pNum: Int, pDen: Int): Column =
    min(when(expr("rn") === expr(hiRankExpr("n", pNum, pDen)), value))

  /** The ×pDen integer interpolation of the two witnesses. */
  def scaled(va: Column, vb: Column, pNum: Int, pDen: Int): Column = {
    val f = s"(($pNum * (n - 1)) % $pDen)"
    expr(s"$pDen - $f") * va + expr(f) * coalesce(vb, lit(0L))
  }

  private def loRankExpr(n: String, pNum: Int, pDen: Int): String =
    s"($pNum * ($n - 1)) DIV $pDen + 1"
  private def hiRankExpr(n: String, pNum: Int, pDen: Int): String =
    s"($pNum * ($n - 1)) DIV $pDen + 2"

  /** DuckDB spelling of the whole witness aggregate: assumes the
    * surrounding query exposes `rn`, `n`, and groups by (…, n). */
  def scaledSql(value: String, pNum: Int, pDen: Int): String = {
    val f = s"(($pNum * (n - 1)) % $pDen)"
    s"CAST(($pDen - $f)\n" +
      s"    * min(CASE WHEN rn = ($pNum * (n - 1)) // $pDen + 1 " +
      s"THEN $value END)\n" +
      s"  + $f\n" +
      s"    * coalesce(min(CASE WHEN rn = ($pNum * (n - 1)) // $pDen + 2 " +
      s"THEN $value END), 0)\n" +
      s"  AS BIGINT)"
  }
}
