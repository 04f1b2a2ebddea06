package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, IntegerType, LongType}

/** Synthesizes an sf1-equivalent fixture from sf0.1 by extending the
  * driver's OWN per-table scaling curve (TESTDATA.md, measured across
  * sf0.001→0.01→0.1): ×10 for the TPC-H-ish tables, events, and
  * documents; ×4 for embeddings; catalogs (region, nation) fixed.
  * The 10× posture proof (VERDICT r7 #1) runs the full inventory +
  * the DuckDB bracket against the output.
  *
  * Each replica r gets FRESH keys — every key column is offset by
  * r·10⁹, far above any sf0.1 key — so per-key cardinalities (orders
  * per customer, lineitems per order, events per user, basket sizes)
  * match the real curve: a 10× corpus has 10× customers, not 10×
  * orders per customer.
  *
  * Two columns need more than a key offset, because replicating their
  * CONTENT verbatim would create cross-replica duplicate classes that
  * a real 10× corpus does not have (every dup group ×10 in size ⇒
  * pairwise work ×100 — an artificial quadratic, not a scale test):
  *   - documents.text: replicas 1..9 prefix every token with "r{r}x",
  *     so within-replica shingle/dup structure is EXACTLY the
  *     original's (dedup work ×10) while cross-replica shingles never
  *     collide. The vocabulary grows ×10 — harsher than a real
  *     corpus's sublinear growth, which makes the model-table caps an
  *     explicit part of what the run stress-tests.
  *   - embeddings.embedding: replicas 1..3 apply a per-replica
  *     ORTHOGONAL transform (cyclic dimension shift by 16·r plus a
  *     parity sign flip): within-replica geometry (distances, cosines,
  *     cluster structure) is preserved exactly, cross-replica
  *     similarity scrambles to noise. Replica 0 is the identity.
  *
  * Usage: tools/run.sh graft.tools.ScaleUp [srcDir] [outDir]
  * (defaults /root/testdata/sf0.1 → /tmp/graft_sf1)
  */
object ScaleUp {

  /** One replica's key offset: far above every sf0.1 key. */
  val KeyOffset = 1000000000L

  private def replicate(spark: SparkSession, df: DataFrame, copies: Int)
      : DataFrame =
    df.crossJoin(
      spark.range(copies.toLong).toDF("rep").repartition(copies))

  private def off(c: String): Column =
    col(c) + col("rep") * KeyOffset

  def scaleTable(spark: SparkSession, name: String, df: DataFrame,
      copies: Int): DataFrame = {
    val rep = replicate(spark, df, copies)
    val out = name match {
      case "region" | "nation" => df
      case "customer" => rep.withColumn("c_custkey", off("c_custkey"))
      case "supplier" => rep.withColumn("s_suppkey", off("s_suppkey"))
      case "part" => rep.withColumn("p_partkey", off("p_partkey"))
      case "orders" => rep
        .withColumn("o_orderkey", off("o_orderkey"))
        .withColumn("o_custkey", off("o_custkey"))
      case "lineitem" => rep
        .withColumn("l_orderkey", off("l_orderkey"))
        .withColumn("l_partkey", off("l_partkey"))
        .withColumn("l_suppkey", off("l_suppkey"))
      case "events" => rep
        .withColumn("event_id", off("event_id"))
        .withColumn("user_id", off("user_id"))
      case "documents" => rep
        .withColumn("doc_id", off("doc_id"))
        .withColumn("text",
          when(col("rep") === 0, col("text")).otherwise(
            concat_ws(" ", transform(split(col("text"), " ", -1),
              w => concat(lit("r"), col("rep"), lit("x"), w)))))
        // the fixtures hold n_chars == length(text); token-salting
        // grows the text, so recompute or every char-weighted metric
        // (weighted sample, funnel clean_chars…) reads a stale weight
        .withColumn("n_chars", length(col("text")).cast(LongType))
      case "embeddings" => rep
        .withColumn("vec_id", off("vec_id"))
        .withColumn("embedding",
          when(col("rep") === 0, col("embedding")).otherwise(
            transform(sequence(lit(0), size(col("embedding")) - 1),
              j => {
                val d = size(col("embedding"))
                val src = (j + col("rep").cast(IntegerType) * 16) % d
                val sign = lit(1) - (j + col("rep")) % 2 * 2
                element_at(col("embedding"), src + 1) *
                  sign.cast(FloatType)
              }).cast("array<float>")))
      case other => sys.error(s"unknown table $other")
    }
    out.drop("rep")
  }

  /** Per-table copy counts extending the measured driver curve. */
  val Copies: Map[String, Int] = Map(
    "region" -> 1, "nation" -> 1, "customer" -> 10, "supplier" -> 10,
    "part" -> 10, "orders" -> 10, "lineitem" -> 10, "events" -> 10,
    "documents" -> 10, "embeddings" -> 4)

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    for ((t, copies) <- Copies.toSeq.sortBy(_._1)) {
      val df = spark.read.parquet(s"$src/$t.parquet")
      val n = writeFlat(spark, scaleTable(spark, t, df, copies), out, t)
      println(s"SCALED $t x$copies -> $n rows")
    }
    spark.stop()
  }

  /** Writes `df` as ONE flat parquet file `<out>/<name>.parquet`,
    * matching the testdata layout — DuckDB (the bracket partner)
    * reads a file path, not a directory. Returns the row count. */
  def writeFlat(spark: SparkSession, df: DataFrame, out: String,
      name: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    df.coalesce(1)
      .write.mode("overwrite").parquet(s"$out/_tmp_$name")
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(
        s"$out/_tmp_$name"))
      .map(_.getPath).find(_.getName.startsWith("part-")).get
    val dest = new org.apache.hadoop.fs.Path(s"$out/$name.parquet")
    fs.delete(dest, false)
    fs.rename(part, dest)
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/_tmp_$name"), true)
    spark.read.parquet(s"$out/$name.parquet").count()
  }
}
