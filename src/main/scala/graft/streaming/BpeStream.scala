package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** INCREMENTAL maintenance of the per-document BPE token census — the
  * streaming twin of `llm_bpe_apply` (26th maintainer): a pretraining
  * pipeline prices every ingest batch under its TRAINED tokenizer
  * without rescanning the corpus, and watches the fertility dial for
  * tokenizer drift.
  *
  * Lifecycle mirrors [[LmScoreStream]] (the fixed-model +
  * measured-drift shape): the FIRST non-empty batch trains the merge
  * table from its own documents (`Curation.bpeMergesUncached`) and
  * commits it durably under `dir/model`; every batch — including the
  * first — prices only its NEW documents (anti-join on doc_id)
  * against the COMMITTED merges via the same
  * `Curation.bpeTokenCountsWith` scorer the batch key's census rides,
  * and appends (doc_id, n_words, n_chars, n_tokens) deltas. The
  * merges are FIXED across appends: token counts must stay comparable
  * (a silently retrained merge table would re-price every earlier
  * document's token budget), so the maintainer never re-fits.
  *
  * Drift is measured instead: each batch's meta delta records its
  * chars-per-token fertility under the fixed merges. Appends drawn
  * from the training distribution hold the training fertility; a
  * drifted vocabulary (new domains, new languages) stops matching the
  * merges, so tokens stop compressing and the dial falls toward 1.0 —
  * the retrain signal. Pinned in BpeStreamSpec.
  *
  * The merge table itself is ≤ `Merges` rows and folds into each
  * batch's plan as literals (`replace` chains), so unlike the LM
  * model there is no broadcast to memoize — each batch re-reads the
  * tiny committed parquet, which also makes an in-session re-seed
  * visible with no fingerprint machinery.
  *
  * State layout rides [[DeltaStore]]:
  * {{{
  *   dir/model/merges      (merge_round, left_sym, right_sym)
  *                          committed once, creation batch
  *   dir/meta/delta_vN     (batch_id, n_new, chars_per_token — NULL
  *                          when the batch had no alphabetic token)
  *   dir/seen/delta_vN     (doc_id)  every new doc, priceable or not
  *   dir/tokens/delta_vN   (doc_id, n_words, n_chars, n_tokens)
  * }}}
  * `tokens` is written LAST and is the commit point; replays and
  * re-delivered doc_ids are no-ops. A crash after the model write but
  * before the tokens commit leaves no committed batch — the retry
  * finds the written merges and prices the replayed batch against
  * them (same creation batch by streaming replay semantics, so
  * reusing the written merges equals retraining them).
  */
object BpeStream {

  private val Commit = "tokens"
  private val Subs = Seq("meta", "seen", "tokens")
  private val Merges = 8

  private def modelPath(dir: String) = s"$dir/model/merges"

  /** The committed merge table, in training order — None before the
    * creation batch commits one. */
  private[streaming] def committedMerges(spark: SparkSession,
      dir: String): Option[Seq[(String, String)]] = {
    val fs = new org.apache.hadoop.fs.Path(modelPath(dir))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(
        modelPath(dir) + "/_SUCCESS"))) None
    else Some(spark.read.parquet(modelPath(dir))
      .orderBy(col("merge_round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq)
  }

  /** One incremental update. The creation batch trains + commits the
    * merges from its own documents (a batch with rows but no adjacent
    * alphabetic symbol pair fails loudly rather than committing an
    * empty merge table that would price every later document at one
    * token per character). */
  def updateBatch(batch: DataFrame, dir: String, batchId: Long,
      autoCompactEvery: Int = 0): Unit = {
    val spark = batch.sparkSession
    if (DeltaStore.isCommitted(spark, dir, Commit, batchId))
      return // replay of a committed batch: done
    // dedup against the SEEN store, not the tokens store: a doc with
    // no alphabetic word produces no token row but must still make
    // its re-delivery a no-op (the LmScoreStream seen-store lesson)
    val seen = DeltaStore.stored(spark, dir, "seen", Commit, batchId)
    val incoming = batch.select(col("doc_id"), col("text"))
      .dropDuplicates("doc_id")
    val newDocs = seen match {
      case Some(p) => incoming.join(p.select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      case None => incoming
    }
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pinned = newDocs.persist(lvl)
    try {
      val mergesOpt = committedMerges(spark, dir).orElse {
        if (pinned.isEmpty) None // empty creation batch: nothing to do
        else {
          // UNCACHED training: the creation batch's plan never
          // recurs, so the session artifact caches must not pin it
          val ms = graft.queries.Curation.bpeMergesUncached(pinned, Merges)
          require(ms.nonEmpty,
            s"BPE token store $dir: the creation batch has documents " +
              "but no adjacent alphabetic symbol pair — a merge table " +
              "trained from it would be empty and every later document " +
              "would price at one token per character; seed the store " +
              "from a representative corpus")
          import spark.implicits._
          ms.zipWithIndex
            .map { case ((l, r, _), i) => (i + 1L, l, r) }
            .toDF("merge_round", "left_sym", "right_sym")
            .coalesce(1).write.mode("overwrite").parquet(modelPath(dir))
          committedMerges(spark, dir)
        }
      }
      mergesOpt.foreach { ms =>
        val toks = graft.queries.Curation.bpeTokenCountsWith(pinned, ms)
          .persist(lvl)
        try {
          val nNew = pinned.count()
          // fertility of THIS batch under the fixed merges: total
          // chars over total tokens across its priceable docs. Zero
          // tokens means NOTHING PRICEABLE ARRIVED (all-null or
          // non-alphabetic text) — record NULL, not a number, so a
          // fertility monitor can tell it apart from genuine drift
          val sums = toks.agg(
            coalesce(sum(col("n_chars")), lit(0L)),
            coalesce(sum(col("n_tokens")), lit(0L))).collect()(0)
          val cpt: Option[Double] =
            if (sums.getLong(1) == 0L) None
            else Some(sums.getLong(0).toDouble / sums.getLong(1))
          import spark.implicits._
          Seq((batchId, nNew, cpt))
            .toDF("batch_id", "n_new", "chars_per_token").coalesce(1)
            .write.mode("overwrite").parquet(s"$dir/meta/delta_v$batchId")
          pinned.select(col("doc_id"))
            .write.mode("overwrite") // before the commit point: an
            .parquet(s"$dir/seen/delta_v$batchId") // uncommitted batch's
          // seen delta is invisible to stored() and overwritten on retry
          toks.write.mode("overwrite") // tokens LAST = commit point
            .parquet(s"$dir/tokens/delta_v$batchId")
        } finally { toks.unpersist(); () }
      }
    } finally { pinned.unpersist(); () }
    DeltaStore.autoCompact(spark, dir, Subs, Commit, autoCompactEvery)
  }

  /** Fold committed deltas into a new base (pure appends; the model
    * store is not touched). */
  def compact(spark: SparkSession, dir: String): Unit =
    DeltaStore.compact(spark, dir, Subs, Commit)

  /** The streaming entry point: maintain the token store under `dir`
    * from a streaming `documents` frame. */
  def tokenStream(docs: DataFrame, dir: String,
      autoCompactEvery: Int = 64): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), dir, batchId, autoCompactEvery)
    }

  /** The current token store (doc_id, n_words, n_chars, n_tokens) —
    * equal to `Curation.bpeTokenCountsWith` over every document
    * ingested so far, under the committed merges. */
  def currentTokens(spark: SparkSession, dir: String): DataFrame =
    DeltaStore.stored(spark, dir, "tokens", Commit, Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no committed token store under $dir"))

  /** Per-batch fertility rows (batch_id, n_new, chars_per_token) —
    * the retrain signal. */
  def fertilities(spark: SparkSession, dir: String): DataFrame =
    DeltaStore.stored(spark, dir, "meta", Commit, Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no committed token store under $dir"))
}
