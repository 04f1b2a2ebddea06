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

  test("burst alerts fire per over-threshold micro-batch and carry " +
    "running totals across batches (flatMapGroupsWithState)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val qName = s"bursts_${System.nanoTime()}"
    val q = DocumentStream.burstAlerts(mem.toDF(), threshold = 2)
      .writeStream.format("memory").queryName(qName)
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(docs) // web x3 (burst), books x2 (no burst)
      q.processAllAvailable()
      val first = spark.table(qName).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(first.toSeq == Seq(("web", 3L, 3L)))
      // second batch: 3 more books docs — alert's total proves the
      // per-source state survived the batch boundary (2 + 3 = 5)
      mem.addData(Seq(
        Doc(6, "books", "en", "b1", t(6)),
        Doc(7, "books", "en", "b2", t(7)),
        Doc(8, "books", "en", "b3", t(8))))
      q.processAllAvailable()
      val all = spark.table(qName).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(all == Set(("web", 3L, 3L), ("books", 3L, 5L)))
    } finally q.stop()
  }
}

object DocumentStreamSpec {
  // top-level so Spark can derive a product Encoder (an inner class
  // would need the test instance's scope)
  final case class Doc(doc_id: Long, source: String, lang: String,
      text: String, ts: Timestamp)
}
