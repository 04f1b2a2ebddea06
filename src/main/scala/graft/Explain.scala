package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection aid: print the formatted physical plan of one or
  * more SparkEntry queries and time two runs (cold/warm) on a fixture
  * dir. Usage: `tools/run.sh graft.Explain <sfDir> <query> [query...]`
  * — the iterate-on-the-plan loop the project rules ask for
  * (".explain and iterate until it's the plan you'd want").
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q01_scan_filter")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"==== $name ====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      val t0 = System.nanoTime()
      println(s"rows=${df.count()}")
      println(f"cold ${(System.nanoTime() - t0) / 1e9}%.3f s")
      val t1 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"warm ${(System.nanoTime() - t1) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
