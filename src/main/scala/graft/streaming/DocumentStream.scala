package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming LLM-data ingestion operators (SURVEY.md §2.4 in streaming
  * form): a curation pipeline's firehose side. Each operator is the
  * streaming twin of a batch `llm_*` query and works on any streaming
  * (or batch) DataFrame with the `documents` schema plus an event-time
  * column.
  *
  * Scale posture: `dedup` keys state by content fingerprint, so state
  * size is bounded by the watermark horizon (expired keys are dropped),
  * never by corpus size — the streaming analogue of hash-groupBy exact
  * dedup. `qualityGate` is stateless (per-row filter; no shuffle at
  * all). Near-dup (MinHash/SRP) candidates remain a batch concern over
  * the deduped bronze table — banding joins need a bounded corpus.
  */
object DocumentStream {

  /** Exact streaming dedup: first-seen document (by lowercased-text
    * md5 fingerprint) wins; re-arrivals inside the watermark horizon
    * are dropped. `dropDuplicatesWithinWatermark` keeps one state row
    * per fingerprint only until the watermark passes it — bounded
    * state, exactly the at-most-once-emission contract a downstream
    * training-data sink wants. */
  def dedup(docs: DataFrame, tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", md5(encode(lower(col("text")), "UTF-8")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp") // internal fingerprint, not part of the output schema

  /** Stateless quality gate: the streaming twin of llm_quality_score's
    * thresholds — keeps docs with enough tokens and a sane
    * chars-per-token ratio. Pure filter: stays in whole-stage codegen,
    * no state store. */
  def qualityGate(docs: DataFrame, minTokens: Int = 5,
      maxCharsPerToken: Double = 12.0): DataFrame = {
    val nTokens = size(split(col("text"), " "))
    docs
      .withColumn("n_tokens", nTokens.cast("long"))
      .filter(col("n_tokens") >= minTokens &&
        (length(regexp_replace(col("text"), " ", "")).cast("double") /
          col("n_tokens")) <= maxCharsPerToken)
  }

  /** Running per-source totals carried across micro-batches. */
  final case class SourceTotals(totalDocs: Long)

  /** One emitted anomaly row: a single micro-batch delivered more than
    * the threshold from one source. */
  final case class BurstAlert(source: String, batchDocs: Long,
      totalDocs: Long)

  /** Stateful ingestion-burst detector via `flatMapGroupsWithState`
    * (the 0-to-N-outputs custom-state operator `mapGroupsWithState`
    * can't express): per source, accumulate a running document total
    * across micro-batches and emit an alert row whenever one batch
    * alone delivers more than `threshold` docs — the poisoned-crawl /
    * runaway-scraper tripwire a curation firehose runs inline. State
    * is one counter per source (bounded by source cardinality, not
    * corpus); emission is append-mode so downstream sinks see only
    * alerts, not state. */
  def burstAlerts(docs: DataFrame, threshold: Long = 1000): Dataset[BurstAlert] = {
    implicit val stateEnc = Encoders.product[SourceTotals]
    implicit val alertEnc = Encoders.product[BurstAlert]
    docs.select(col("source"))
      .groupByKey(_.getString(0))(Encoders.STRING)
      .flatMapGroupsWithState[SourceTotals, BurstAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (source, rows, state) =>
          val batchDocs = rows.size.toLong
          val total = state.getOption.fold(0L)(_.totalDocs) + batchDocs
          state.update(SourceTotals(total))
          if (batchDocs > threshold)
            Iterator(BurstAlert(source, batchDocs, total))
          else Iterator.empty
      }
  }

  /** Watermarked per-source token throughput: 1-hour tumbling windows
    * of document and token counts — the live ingestion dashboard a
    * curation pipeline runs next to its sinks. */
  def tokenThroughput(docs: DataFrame, tsCol: String = "ts",
      watermark: String = "2 hours"): DataFrame =
    docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .select(col("window.start").as("window_start"), col("source"),
        col("n_docs"), col("total_tokens"))

  /** Per-batch (source, word) deltas for the term-stats artifact:
    * tf = the word's count inside the doc (word_counts emits one row
    * per distinct word per doc, so summing the constant 1 per row IS
    * document frequency). Factored out so batch/streaming parity is
    * testable on the exact frame the sink merges. */
  def termStatsDeltas(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        explode(graft.functions.TokenOps.word_counts(
          split(col("text"), " "))).as(Seq("w", "tf")))
      .withColumn("sdf", lit(1L))

  /** INCREMENTAL maintenance of the term-stats artifact
    * (`Curation.termStats`'s streaming twin): each micro-batch's
    * per-(source, word) {tf, sdf} deltas MERGE into the exactly-once
    * versioned running state (`Sources.foreachBatchRunningAgg` — sums
    * are associative, so replayed batches are idempotent and the
    * state after any prefix of batches equals the batch-built
    * artifact over the documents streamed so far; parity pinned in
    * RunningAggSpec). This is how a 100 TB deployment keeps the
    * vocabulary/TF-IDF artifact current on corpus appends without
    * re-tokenizing the corpus. */
  def termStatsStream(docs: DataFrame, outDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    graft.sources.Sources.foreachBatchRunningAgg(
      termStatsDeltas(docs), outDir,
      keys = Seq("source", "w"), sums = Seq("tf", "sdf"))

  /** Per-batch (w1, w2) count deltas for the bigram-stats artifact —
    * the SAME `Curation.bigramRows` tokenization contract as the
    * batch build, so streamed state matches it exactly. */
  def bigramStatsDeltas(docs: DataFrame): DataFrame =
    graft.queries.Curation.bigramRows(docs)
      .filter(col("w1").isNotNull && col("w2").isNotNull)
      .select(col("w1"), col("w2"), lit(1L).as("b"))

  /** INCREMENTAL maintenance of the bigram-stats artifact
    * (`Curation.bigramStats`'s streaming twin, completing the r6
    * artifact set): bigram counts are plain associative SUMS — no
    * retraction case, unlike the winnow index — so each batch's
    * (w1, w2) deltas merge through the same exactly-once running-agg
    * sink as term-stats, and the state after any batch prefix equals
    * the batch-built artifact over the documents streamed so far
    * (parity pinned in RunningAggSpec). The LM weights and PMI
    * re-derive from this frame without re-tokenizing the corpus. */
  def bigramStatsStream(docs: DataFrame, outDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    graft.sources.Sources.foreachBatchRunningAgg(
      bigramStatsDeltas(docs), outDir,
      keys = Seq("w1", "w2"), sums = Seq("b"))
}
