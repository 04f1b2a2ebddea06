package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional trailing args: restrict to these query names (iteration
    // aid, mirrors check.py's [query ...]); the driver passes none
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args.drop(2).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // shuffle width cpus/4: same overhead-amortization rule as Bench
    // (verify SFs are smaller still); see Tables.TargetRowsPerTask
    val shuffle = math.max(cpus.toInt / 4, 1).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // pyarrow/DuckDB-friendly timestamps in the dumped parquet
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // events.parquet has TIMESTAMP(NANOS); read as long, convert in loader
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // cache + view-register the inputs like Bench: 153 queries would
    // otherwise re-resolve parquet footers per query (driver-loop
    // wall-clock; results are identical either way)
    Tables.registerViews(spark, sfDir,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK, parts = -1)
    new java.io.File(outDir).mkdirs()
    // Gate-diff artifact (VERDICT r10 #2, widened r12 per VERDICT r11
    // #5): the driver's DuckDB version differs from the local one, so
    // a hash-red at the gate cannot be reproduced here. Dump EVERY
    // presented cell as a canonical string for every query whose
    // schema carries a cell OUTSIDE the two divergence-proof-by-
    // construction classes (exact BIGINT integers, strings/dates) —
    // i.e. any double/float/boolean column (the mirrored-
    // transcendental, integer-ratio, decimal-cast, and verdict
    // classes of the SURVEY §2.20 audit). Committed per round, the
    // artifact plus the gate's red/green localizes a divergence to a
    // specific cell without access to the driver's engine. Capped
    // loud at 1000 rows per query (truncation recorded, non-fatal).
    def atRisk(schema: org.apache.spark.sql.types.StructType): Boolean = {
      import org.apache.spark.sql.types._
      def risky(dt: DataType): Boolean = dt match {
        case DoubleType | FloatType | BooleanType => true
        case _: DecimalType => true
        case ArrayType(e, _) => risky(e)
        case s: StructType => s.fields.exists(f => risky(f.dataType))
        case MapType(k, v, _) => risky(k) || risky(v)
        case _ => false
      }
      schema.fields.exists(f => risky(f.dataType))
    }
    val cells = scala.collection.mutable.LinkedHashMap[String, String]()
    // JSON string escape: backslash, quote, and ALL control chars
    // (<0x20) — a tab or CR in builder-authored SQL (or in a dumped
    // CELL value or column name) would otherwise make the driver's
    // json.load fail and silently zero the artifact (review r11).
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def cellStr(v: Any): String = v match {
      case null => "NULL"
      case d: java.math.BigDecimal => d.toPlainString
      case a: Seq[_] => a.map(cellStr).mkString("[", ",", "]")
      case x => x.toString
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        if (atRisk(df.schema)) {
          // loud cap, non-fatal: an oversized at-risk dump records a
          // truncation note instead of failing the verify run
          val all = spark.read.parquet(s"$outDir/$name")
          val rows = all.limit(1001).collect()
          val truncated = rows.length > 1000
          val cols = df.columns
          val body = rows.take(1000).map(r => cols.indices.map(i =>
            q(cellStr(r.get(i)))).mkString("[", ",", "]"))
            .mkString("[", ",", "]")
          cells(name) =
            s"""{"cols": ${cols.map(q).mkString("[", ",", "]")}, """ +
              s""""truncated": $truncated, "rows": $body}"""
        }
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    if (cells.nonEmpty)
      Files.writeString(Paths.get(s"$outDir/verify_cells.json"),
        cells.map { case (k, v) => s"${q(k)}: $v" }
          .mkString("{", ",", "}"))
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
