package graft.flow

import scala.concurrent.Await
import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The north-star use case end-to-end: a training-data curation
  * pipeline expressed as a distribot-shaped flow — fingerprint →
  * near-dup dedup (MinHash+LSH) → quality filter → corpus stats —
  * with cross-phase handoff through flow-namespaced tables
  * (`MaterializeHandler`). Each phase is declarative DataFrame code,
  * so the whole pipeline inherits Catalyst planning and scales by
  * partitioning, while the flow engine provides lifecycle control
  * (pause/resume/cancel/status) over it.
  *
  * Usage: tools/run.sh graft.flow.PipelineDemo [sfDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = java.nio.file.Files.createTempDirectory("pipeline").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val registry = new HandlerRegistry
    registry.register(new MaterializeHandler("Fingerprint", SemVer(1, 0, 0),
      graft.SparkEntry.queries("llm_fingerprint"), s"$out/{flow_id}/fp"))
    registry.register(new MaterializeHandler("NearDupPairs", SemVer(1, 0, 0),
      graft.SparkEntry.queries("llm_minhash_lsh_dedup"),
      s"$out/{flow_id}/dups"))
    registry.register(new MaterializeHandler("QualityFiltered", SemVer(1, 0, 0),
      (s, dir) => {
        val q = graft.SparkEntry.queries("llm_quality_score")(s, dir)
        q.filter(col("stopword_ratio") >= 0 && col("n_tokens") >= 5)
      }, s"$out/{flow_id}/quality"))
    registry.register(new QueryHandler("CorpusStats", SemVer(1, 0, 0),
      graft.SparkEntry.queries("llm_token_count")))

    val engine = new Engine(spark, registry, EngineConfig(sfDir = sfDir))
    val flow =
      """{
        |  "name": "curate-corpus",
        |  "data": {"corpus": "documents", "dedup_threshold": 0.6},
        |  "phases": [
        |    {"name": "ingest", "is_initial": true, "transitions_to": "fingerprint"},
        |    {"name": "fingerprint", "transitions_to": "dedup",
        |     "handlers": [{"name": "Fingerprint", "version": "~> 1.0"}]},
        |    {"name": "dedup", "transitions_to": "filter",
        |     "handlers": ["NearDupPairs"]},
        |    {"name": "filter", "transitions_to": "stats",
        |     "handlers": ["QualityFiltered"]},
        |    {"name": "stats", "transitions_to": "finished",
        |     "handlers": ["CorpusStats"]},
        |    {"name": "finished", "is_final": true}
        |  ]
        |}""".stripMargin

    val run = engine.submit(flow)
    val result = Await.result(run.future, 10.minutes)
    println(s"pipeline finished in phase '${result.finalPhase}'")
    result.transitions.foreach(t => println(s"  ${t.from} -> ${t.to}"))
    val fp = spark.read.parquet(s"$out/${run.id}/fp").count()
    val dups = spark.read.parquet(s"$out/${run.id}/dups").count()
    val quality = spark.read.parquet(s"$out/${run.id}/quality").count()
    println(s"artifacts: fingerprints=$fp nearDupPairs=$dups " +
      s"qualityRows=$quality (under $out/${run.id})")
    spark.stop()
  }
}
