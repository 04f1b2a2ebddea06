package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Clones a fixture with PATHOLOGICAL key skew (VERDICT r7 #8): the
  * uniform driver fixtures never stress the skew paths end-to-end, so
  * this clone remaps
  *   - events.user_id: 15/16 (93.75%) of event rows onto the single
  *     minimum user (the one-hot-user distribution every windowed/
  *     sessionized family must survive), and
  *   - lineitem.l_suppkey: 15/16 of lineitems onto one supplier (the
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

  /** Remaps `keyCol` to `hotValue` on the 15/16 (93.75%) of rows whose
    * md5 over the '#'-joined `idCols` does not start with '0' —
    * the ONE deterministic one-hot-skew definition, shared by this
    * clone tool and RandomDifferentialSpec's skew axis so the two
    * cannot silently diverge. */
  def oneHot(df: DataFrame, keyCol: String, hotValue: Long,
      idCols: Column*): DataFrame =
    df.withColumn(keyCol,
      when(substring(md5(concat_ws("#",
        idCols.map(_.cast("string")): _*)), 1, 1) =!= "0",
        lit(hotValue)).otherwise(col(keyCol)))

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
        case "events" =>
          oneHot(df, "user_id", hotUser, col("event_id"))
        case "lineitem" =>
          oneHot(df, "l_suppkey", hotSupp,
            col("l_orderkey"), col("l_linenumber"))
        case _ => df
      }
      val n = ScaleUp.writeFlat(spark, skewed, out, t)
      println(s"SKEWED $t -> $n rows")
    }
    spark.stop()
  }
}
