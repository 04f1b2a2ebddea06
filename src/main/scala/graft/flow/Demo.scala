package graft.flow

import scala.concurrent.Await
import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession

/** End-to-end flow-engine demo: registers query handlers, submits a
  * reference-shaped flow JSON, runs it on local Spark, prints the
  * transition log and final status. Usage:
  *   tools/run.sh graft.flow.Demo [sfDir]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val registry = new HandlerRegistry
    registry.register(new QueryHandler("AggregateLineitems", SemVer(1, 2, 0),
      graft.SparkEntry.queries("q02_agg_tpch_q1")))
    registry.register(new QueryHandler("DedupDocuments", SemVer(1, 0, 0),
      graft.SparkEntry.queries("q27_dedup_exact")))

    val engine = new Engine(spark, registry, EngineConfig(sfDir = sfDir))
    val flow =
      """{
        |  "name": "nightly-report",
        |  "data": {"requested_by": "demo"},
        |  "phases": [
        |    {"name": "pending", "is_initial": true, "transitions_to": "aggregate"},
        |    {"name": "aggregate", "transitions_to": "dedup",
        |     "handlers": [{"name": "AggregateLineitems", "version": "~> 1.0"}]},
        |    {"name": "dedup", "transitions_to": "finished",
        |     "handlers": ["DedupDocuments"]},
        |    {"name": "finished", "is_final": true}
        |  ]
        |}""".stripMargin

    val run = engine.submit(flow)
    println(s"submitted flow ${run.id} (running=${engine.runningCount})")
    val result = Await.result(run.future, 5.minutes)
    println(s"finished in phase '${result.finalPhase}'")
    result.transitions.foreach { t =>
      println(f"  ${t.timestampMs}%d  ${t.from}%-10s -> ${t.to}%s")
    }
    println(s"status: ${run.status()}")
    spark.stop()
  }
}
