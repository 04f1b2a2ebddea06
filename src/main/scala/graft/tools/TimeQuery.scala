package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-bench one named query: N repetitions in one warmed JVM.
  * Usage: tools/run.sh graft.tools.TimeQuery <name> [sfDir] [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.all.foreach { n =>
      val df = spark.read.parquet(s"$sfDir/$n.parquet"); df.cache(); df.count()
    }
    val fn = graft.SparkEntry.queries(name)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"$name: min=${times.min}%.2f " +
      s"all=[${times.map(t => f"$t%.2f").mkString(", ")}]")
    spark.stop()
  }
}
