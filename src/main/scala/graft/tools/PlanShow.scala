package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints a named inventory query's initial physical plan plus its
  * Exchange/Sort/Window occurrence counts — the per-query diagnostic
  * companion to [[PlanCensus]] (which dumps counts for the whole
  * inventory). Usage:
  *   tools/run.sh graft.tools.PlanShow <query> [sfDir]
  */
object PlanShow {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: PlanShow <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plan-show")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plan = graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString
    println(plan)
    val (ex, so) = PlanCensus.counts(plan)
    val win = "\\bWindow ".r.findAllIn(plan).size
    println(s"COUNTS exchanges=$ex sorts=$so windows=$win")
    spark.stop()
  }
}
