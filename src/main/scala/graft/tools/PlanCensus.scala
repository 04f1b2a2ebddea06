package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps each inventory query's static plan-shape counts (exchanges,
  * sorts) as TSV — the generator for the PlanBudgetSpec baseline
  * (`src/test/resources/plan-budgets.tsv`). Individual exchange pins
  * exist for the queries whose shape was hand-tuned (q18, q51, q63,
  * q82, q94…); the budget table generalizes the guard to the WHOLE
  * inventory so a future edit cannot silently add a shuffle or a
  * global sort to any query (VERDICT r7 #7).
  *
  * Counts come from the UNEXECUTED physical plan string: AQE's
  * initial plan prints shared subtrees repeatedly (runtime stage reuse
  * dedups them), so the counts are an upper bound on real exchanges —
  * but a DETERMINISTIC one for a fixed fixture, and monotone in plan
  * edits, which is all a regression budget needs.
  *
  * Usage: tools/run.sh graft.tools.PlanCensus [sfDir]
  *        > src/test/resources/plan-budgets.tsv
  */
object PlanCensus {

  /** Exchange/sort occurrence counts in a query's initial plan. */
  def counts(plan: String): (Int, Int) =
    ("Exchange ".r.findAllIn(plan).size,
      // executed-plan Sort nodes print as "Sort [" (SortExec);
      // SortMergeJoin/sort_array etc. don't match
      "\\bSort \\[".r.findAllIn(plan).size)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plan-census")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val (ex, so) = counts(plan)
      println(s"$name\t$ex\t$so")
    }
    spark.stop()
  }
}
