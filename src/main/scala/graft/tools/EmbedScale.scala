package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, IntegerType, LongType}

/** Embeddings-only scale fixture (VERDICT r8 #8): the sf1 proof grew
  * embeddings x4 while tables grew x10, leaving the vector families'
  * slope the least-measured. This synthesizes `embeddings` x`copies`
  * (default 12) with every OTHER table copied through unchanged, so an
  * engine-only run isolates the vector-family slope: ANN recall
  * stability, IVF cell balance, SemDeDup / cosine-LSH timings.
  *
  * Replica transform: a per-replica SIGNED PERMUTATION (cyclic shift
  * by 5·r mod d, parity sign flip) — orthogonal, so within-replica
  * geometry (distances, cosines, cluster structure) is preserved
  * exactly while cross-replica similarity scrambles to noise. The
  * sf1 fixture's shift-by-16·r family aliases at r=4 on d=64
  * (16·4 ≡ 0), which is why x12 uses stride 5: gcd(5, 64) = 1 keeps
  * all 12 shifts distinct, so no two replicas share a map and no
  * artificial cross-replica duplicate classes appear.
  *
  * Usage: tools/run.sh graft.tools.EmbedScale [srcDir] [outDir] [copies]
  * (defaults /root/testdata/sf0.1 -> /tmp/graft_embx12, 12)
  */
object EmbedScale {

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_embx12")
    val copies = args.lift(2).map(_.toInt).getOrElse(12)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-embedscale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

    // unchanged tables: byte-copy the flat parquet files
    val fixed = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    for (t <- fixed) {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"COPIED $t")
    }

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val rep = emb.crossJoin(
      spark.range(copies.toLong).toDF("rep").repartition(copies))
    val scaled = rep
      .withColumn("vec_id", col("vec_id") + col("rep") * ScaleUp.KeyOffset)
      .withColumn("embedding",
        when(col("rep") === 0, col("embedding")).otherwise(
          transform(sequence(lit(0), size(col("embedding")) - 1),
            j => {
              val d = size(col("embedding"))
              val srcIx = (j + col("rep").cast(IntegerType) * 5) % d
              val sign = lit(1) - (j + col("rep")) % 2 * 2
              element_at(col("embedding"), srcIx + 1) *
                sign.cast(FloatType)
            }).cast("array<float>")))
      .drop("rep")
    val n = ScaleUp.writeFlat(spark, scaled, out, "embeddings")
    println(s"SCALED embeddings x$copies -> $n rows")
    spark.stop()
  }
}
