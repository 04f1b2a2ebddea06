package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.queries.Llm

/** INCREMENTAL maintenance of the winnow-fingerprint overlap index
  * (`Llm.winnowPairs`'s streaming twin — VERDICT r5 #3, the same
  * artifact lifecycle as `DedupIndexStream`): build the MOSS overlap
  * index once per corpus snapshot, keep it current as the corpus
  * APPENDS, never rescan.
  *
  * The twist the MinHash pair index doesn't have: a verified Jaccard
  * pair is PAIR-LOCAL (depends only on the two docs), so its index
  * only ever grows. The winnow pair count is NOT —
  * `shared(a, b) = |{fp ∈ a ∩ b : df(fp) ≤ cap}|` counts fingerprints
  * through a CORPUS-GLOBAL df cap, and an append that pushes a hot
  * fingerprint past the cap must RETRACT that fingerprint's
  * contribution from every pair it ever counted toward. The store
  * therefore holds SIGNED per-pair count deltas:
  *
  *  - a fingerprint whose posting ends the batch at-or-under the cap
  *    emits +1 for every pair gaining a new member (new×stored,
  *    new×new);
  *  - a fingerprint CROSSING the cap this batch (old ≤ cap < old+new,
  *    old ≥ 2) emits −1 for every pair of its old posting;
  *  - a fingerprint already over the cap emits nothing (its net
  *    contribution is already zero, and df only grows).
  *
  * Invariant (induction over batches): after any committed prefix,
  * the per-fingerprint sum of emitted deltas is `pairs(posting)` if
  * `df ≤ cap` else 0 — so the group-summed view equals
  * `Llm.winnowPairsFor` over the documents streamed so far, exactly
  * (parity pinned per batch prefix in WinnowIndexStreamSpec).
  *
  * Per-batch work is O(new fps × bounded postings): posting lists are
  * only ever COLLECTED for fingerprints whose old posting is at-or-
  * under the cap (old side) or that end the batch at-or-under it (new
  * side) — the df counts are aggregated first, so a hot fingerprint's
  * million-doc posting is never materialized — and per-fingerprint
  * pair fan-out is ≤ C(cap+1, 2).
  *
  * State layout and commit protocol ride [[DeltaStore]] (shared with
  * DedupIndexStream):
  * {{{
  *   dir/docs/delta_vN       (doc_id)          batch N's new docs
  *   dir/fps/delta_vN        (doc_id, fp)      batch N's fingerprints
  *   dir/pairdelta/delta_vN  (a_id, b_id, d)   signed count deltas
  * }}}
  * `pairdelta` is written LAST and is the commit point. Idempotent
  * ingest: seen doc_ids are anti-joined away (the `docs` store exists
  * so zero-fingerprint docs are remembered too). At 100 TB the fps
  * store would additionally be bucketed by fp so the per-batch
  * posting joins prune to touched buckets (the DedupIndexStream
  * note).
  */
object WinnowIndexStream {

  private val Commit = "pairdelta"
  private val Subs = Seq("docs", "fps", "pairdelta")

  /** One incremental index update (factored out so replay/crash
    * semantics are unit-testable without a streaming query).
    * `autoCompactEvery` > 0 folds the delta chain into a base once
    * that many uncompacted batches accumulate. */
  def updateBatch(batch: DataFrame, dir: String, batchId: Long,
      autoCompactEvery: Int = 0): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    if (DeltaStore.isCommitted(spark, dir, Commit, batchId))
      return // replay of a committed batch: done
    val cap = Llm.WinnowDfCap.toLong
    val storedDocs = DeltaStore.stored(spark, dir, "docs", Commit, batchId)
    val storedFps = DeltaStore.stored(spark, dir, "fps", Commit, batchId)

    val incoming = batch.select(col("doc_id"), col("text"))
      .dropDuplicates("doc_id")
    val newDocs = storedDocs match {
      case Some(p) => incoming.join(p.select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      case None => incoming
    }
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val newFps = newDocs.select(col("doc_id"),
        explode(graft.functions.WinnowFingerprints
          .winnow_fingerprints(col("text"))).as("fp"))
      .persist(lvl)
    try {
      // df counts FIRST (no posting materialization), touched fps only
      val nNew = newFps.groupBy(col("fp")).agg(count(lit(1)).as("n_new"))
      val withOld = storedFps match {
        case Some(p) =>
          val oldDf = p.join(nNew.select(col("fp")), Seq("fp"), "left_semi")
            .groupBy(col("fp")).agg(count(lit(1)).as("old_df"))
          nNew.join(oldDf, Seq("fp"), "left")
            .select(col("fp"), col("n_new"),
              coalesce(col("old_df"), lit(0L)).as("old_df"))
        case None => nNew.withColumn("old_df", lit(0L))
      }
      // a fingerprint already over the cap emits nothing, ever
      val elig = withOld.filter(col("old_df") <= cap)
      // postings are collected ONLY where the emission rules can read
      // them — every collected list is ≤ cap (+ batch members) entries
      val needNew = elig.filter(col("old_df") + col("n_new") <= cap)
        .select(col("fp"))
      val newPost = newFps.join(needNew, Seq("fp"), "left_semi")
        .groupBy(col("fp")).agg(collect_list(col("doc_id")).as("new_ds"))
      val joined0 = elig.join(newPost, Seq("fp"), "left")
      val joined = storedFps match {
        case Some(p) =>
          val oldPost = p.join(elig.select(col("fp")), Seq("fp"), "left_semi")
            .groupBy(col("fp")).agg(collect_list(col("doc_id")).as("old_ds"))
          joined0.join(oldPost, Seq("fp"), "left")
        case None => joined0.withColumn("old_ds",
          lit(null).cast(ArrayType(LongType)))
      }
      val empty = array().cast(ArrayType(LongType, containsNull = false))
      val pairDelta = joined.select(col("old_df"), col("n_new"),
          coalesce(col("old_ds"), empty).as("old_ds"),
          coalesce(col("new_ds"), empty).as("new_ds"))
        .as[(Long, Long, Seq[Long], Seq[Long])]
        .flatMap { case (oldDf, nNewF, oldDs, newDs) =>
          val total = oldDf + nNewF
          val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
          if (total <= cap && total >= 2) {
            // +1 per pair gaining a new member: new×stored, new×new
            var i = 0
            while (i < newDs.length) {
              var j = 0
              while (j < oldDs.length) {
                val a = newDs(i); val b = oldDs(j)
                out += ((math.min(a, b), math.max(a, b), 1L))
                j += 1
              }
              i += 1
            }
            val s = newDs.sorted
            i = 0
            while (i < s.length) {
              var j = i + 1
              while (j < s.length) { out += ((s(i), s(j), 1L)); j += 1 }
              i += 1
            }
          } else if (total > cap && oldDf >= 2) {
            // crossed the cap: retract the old posting's pairs
            val s = oldDs.sorted
            var i = 0
            while (i < s.length) {
              var j = i + 1
              while (j < s.length) { out += ((s(i), s(j), -1L)); j += 1 }
              i += 1
            }
          }
          out.iterator
        }
        .toDF("a_id", "b_id", "d")
        .groupBy(col("a_id"), col("b_id")).agg(sum(col("d")).as("d"))

      // deltas only — O(new docs) written; pairdelta LAST = commit
      newDocs.select(col("doc_id")).write.mode("overwrite")
        .parquet(s"$dir/docs/delta_v$batchId")
      newFps.write.mode("overwrite")
        .parquet(s"$dir/fps/delta_v$batchId")
      pairDelta.write.mode("overwrite")
        .parquet(s"$dir/pairdelta/delta_v$batchId")
    } finally {
      newFps.unpersist(); ()
    }
    DeltaStore.autoCompact(spark, dir, Subs, Commit, autoCompactEvery,
      PairFold)
  }

  private val PairFold: Map[String, DataFrame => DataFrame] = Map(
    "pairdelta" -> ((df: DataFrame) =>
      df.groupBy(col("a_id"), col("b_id")).agg(sum(col("d")).as("d"))
        .filter(col("d") =!= 0L)))

  /** Fold committed deltas into a new base; pair deltas group-sum and
    * fully-retracted (net-zero) pairs drop out of the base. */
  def compact(spark: SparkSession, dir: String): Unit =
    DeltaStore.compact(spark, dir, Subs, Commit, PairFold)

  /** The streaming entry point: maintain the index under `dir` from a
    * streaming `documents` frame, auto-compacting every
    * `autoCompactEvery` batches. */
  def indexStream(docs: DataFrame, dir: String,
      autoCompactEvery: Int = 64): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), dir, batchId, autoCompactEvery)
    }

  /** The current overlap index (a_id, b_id, shared) — group-summed
    * deltas through the min-shared threshold, equal to the batch
    * build over every document ingested so far. */
  def currentPairs(spark: SparkSession, dir: String): DataFrame =
    DeltaStore.stored(spark, dir, "pairdelta", Commit, Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no committed index under $dir"))
      .groupBy(col("a_id"), col("b_id")).agg(sum(col("d")).as("shared"))
      .filter(col("shared") >= Llm.WinnowMinShared)
}
