package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming document-curation operators: exact dedup drops
  * re-arrivals but keeps first-seen docs; the quality gate matches its
  * batch predicate; throughput windows equal the batch aggregation of
  * the same rows.
  */
class DocumentStreamSpec extends SparkSpec {
  import DocumentStreamSpec.Doc

  private def t(minutes: Int) = new Timestamp(60000L * minutes)

  private val docs = Seq(
    Doc(1, "web", "en", "the quick brown fox", t(1)),
    Doc(2, "web", "en", "the quick brown fox", t(2)),      // dup of 1
    Doc(3, "books", "en", "a completely different text", t(3)),
    Doc(4, "web", "en", "The Quick Brown FOX", t(4)),      // case dup of 1
    Doc(5, "books", "en", "yet another unique document here", t(5)))

  private def runAppend(build: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame,
      mode: OutputMode = OutputMode.Append())
      : Array[org.apache.spark.sql.Row] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    mem.addData(docs)
    val qName = s"docs_${System.nanoTime()}"
    val q = build(mem.toDF()).writeStream.format("memory")
      .queryName(qName).outputMode(mode).start()
    try { q.processAllAvailable() } finally q.stop()
    spark.table(qName).collect()
  }

  test("streaming exact dedup keeps first-seen docs, drops re-arrivals " +
    "(case-insensitive fingerprint), and bounds state by watermark") {
    val out = runAppend(DocumentStream.dedup(_))
    val ids = out.map(_.getAs[Long]("doc_id")).toSet
    assert(ids == Set(1L, 3L, 5L), s"got $ids")
  }

  test("quality gate matches the equivalent batch filter") {
    import spark.implicits._
    val streamed = runAppend(DocumentStream.qualityGate(_, minTokens = 4))
      .map(_.getAs[Long]("doc_id")).toSet
    val batch = DocumentStream.qualityGate(docs.toDF(), minTokens = 4)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(streamed == batch)
    // 4-token docs pass, the 5-token ones too; nothing under 4 exists
    assert(streamed.nonEmpty)
  }

  test("streaming token throughput equals the batch aggregation") {
    import spark.implicits._
    val streamed = runAppend(DocumentStream.tokenThroughput(_),
      OutputMode.Complete())
      .map(r => (r.getAs[Timestamp]("window_start").getTime,
        r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("total_tokens"))).toSet
    val batch = docs.toDF()
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .groupBy(window(col("ts"), "1 hour"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      .select(col("window.start").as("window_start"), col("source"),
        col("n_docs"), col("total_tokens"))
      .collect()
      .map(r => (r.getAs[Timestamp]("window_start").getTime,
        r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("total_tokens"))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }
}

object DocumentStreamSpec {
  // top-level so Spark can derive a product Encoder (an inner class
  // would need the test instance's scope)
  final case class Doc(doc_id: Long, source: String, lang: String,
      text: String, ts: Timestamp)
}
