package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Clones a fixture with PATHOLOGICAL key skew (VERDICT r7 #8): the
  * uniform driver fixtures never stress the skew paths end-to-end, so
  * this clone remaps
  *   - events.user_id: ~90% of event rows onto the single minimum
  *     user (the one-hot-user distribution every windowed/sessionized
  *     family must survive), and
  *   - lineitem.l_suppkey: ~90% of lineitems onto one supplier (the
  *     hot-join-key case q49's salting and AQE skew-join exist for).
  * Membership is md5-deterministic (rebuilds are identical); every
  * other table copies through unchanged, so the clone is a drop-in
  * sfDir for graft.Verify + tools/check.py — the full cross-engine
  * oracle machinery runs on the skewed data, not just a smoke test.
  *
  * Usage: tools/run.sh graft.tools.SkewClone [srcDir] [outDir]
  * (defaults /root/testdata/sf0.01 → /tmp/graft_skew)
  */
object SkewClone {

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/graft_skew")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-skewclone")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val hotUser = spark.read.parquet(s"$src/events.parquet")
      .agg(min(col("user_id"))).collect()(0).getLong(0)
    val hotSupp = spark.read.parquet(s"$src/supplier.parquet")
      .agg(min(col("s_suppkey"))).collect()(0).getLong(0)
    for (t <- tables) {
      val df = spark.read.parquet(s"$src/$t.parquet")
      val skewed = t match {
        case "events" => df.withColumn("user_id",
          when(substring(md5(col("event_id").cast("string")), 1, 1)
            =!= "0", lit(hotUser)).otherwise(col("user_id")))
        case "lineitem" => df.withColumn("l_suppkey",
          when(substring(md5(concat(col("l_orderkey").cast("string"),
            lit("#"), col("l_linenumber").cast("string"))), 1, 1)
            =!= "0", lit(hotSupp)).otherwise(col("l_suppkey")))
        case _ => df
      }
      val n = ScaleUp.writeFlat(spark, skewed, out, t)
      println(s"SKEWED $t -> $n rows")
    }
    spark.stop()
  }
}
