package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.KMeans

/** INCREMENTAL maintenance of the IVF cell-assignment index — the
  * "invlists" of a classical IVF build (VERDICT r5 #4, completing the
  * artifact-lifecycle set: term-stats, LSH pairs, winnow overlap, and
  * now the ANN index all maintain on appends instead of rebuilding
  * per corpus snapshot; SemDeDup serves from the same assignment, so
  * it runs incrementally for free).
  *
  * Lifecycle: the FIRST non-empty batch trains the coarse quantizer
  * (sample-trained, k clamped to the batch's usable vectors so a
  * small first trigger cannot wedge the stream) and commits it
  * durably under `dir/quantizer`; every batch — including the first —
  * assigns only its NEW vectors against the committed quantizer (one
  * broadcast crossJoin + map-side argmax over the batch, never the
  * corpus) and appends them to the assignment store. The quantizer is
  * FIXED across appends — the store's k is authoritative and served
  * through `KMeans.loadCached` (one k×dim collect per store version,
  * not per micro-batch): cell ids must stay comparable, so the
  * trainer never silently re-fits.
  *
  * Drift is measured instead: each batch's meta delta records the
  * batch's mean max-cosine objective under the committed quantizer
  * (the Lloyd objective restricted to the new vectors). A deployment
  * watches the sequence — appends drawn from the training
  * distribution score near the training objective, while a
  * distribution shift (new domains, new embedding model) scores
  * visibly lower, the signal to rebuild the index. Pinned in
  * IvfAssignStreamSpec.
  *
  * State layout rides [[DeltaStore]]:
  * {{{
  *   dir/quantizer/...       KMeans durable store (VersionedState)
  *   dir/meta/delta_vN       (n_new, objective)   batch N's drift row
  *   dir/assign/delta_vN     (vec_id, cid, embedding, n2)
  * }}}
  * `assign` is written LAST and is the commit point; replays and
  * re-delivered vec_ids are no-ops. Zero-norm vectors carry no
  * direction: their cosine is floored below every real score (the
  * KMeans convention), so they land deterministically in cell 0
  * rather than poisoning the argmax with NaN.
  */
object IvfAssignStream {

  private val Commit = "assign"
  private val Subs = Seq("meta", "assign")

  private def dot = graft.functions.VectorOps.dot_product _

  /** Spherical cell assignment of `emb` against fixed centroids — the
    * batch-rebuild twin the streamed store is pinned against. One
    * broadcast crossJoin; argmax collapses map-side (max_by), the
    * (cs desc, cid asc) tie-break and NaN floor identical to the
    * KMeans training assignment. */
  def assignAgainst(emb: DataFrame,
      cents: IndexedSeq[Array[Double]]): DataFrame = {
    val spark = emb.sparkSession
    val centsDF = KMeans.centroidsDF(spark, cents, "cid", "ce")
      .withColumn("cn2", dot(col("ce"), col("ce")))
    emb.select(col("vec_id"), col("embedding"),
        dot(col("embedding"), col("embedding")).as("n2"))
      .crossJoin(broadcast(centsDF))
      // try_divide + coalesce: a zero-norm vector or centroid floors
      // to -2 below every real cosine (ANSI division would THROW on
      // the 0/0; plain nanvl never sees it)
      .withColumn("cs", coalesce(nanvl(
        try_divide(dot(col("embedding"), col("ce")),
          sqrt(col("n2")) * sqrt(col("cn2"))),
        lit(-2.0)), lit(-2.0)))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("cs"), -col("cid"))).as("cid"),
        first(col("embedding")).as("embedding"),
        first(col("n2")).as("n2"),
        max(col("cs")).as("best_cs"))
  }

  /** One incremental index update. `k`/`iters` only matter for the
    * FIRST committed batch (they train the quantizer — with k clamped
    * to the batch's usable-vector count, so a small first trigger
    * commits a working quantizer instead of wedging every later batch
    * on a k mismatch; r6 review). From then on the STORE's k is
    * authoritative — appends serve the committed centroids via the
    * memoized load path (no per-batch k×dim collect) and never
    * retrain. A first batch with rows but zero usable (non-zero-norm)
    * vectors fails loudly rather than silently dropping them. */
  def updateBatch(batch: DataFrame, dir: String, batchId: Long,
      k: Int, iters: Int, autoCompactEvery: Int = 0): Unit = {
    val spark = batch.sparkSession
    if (DeltaStore.isCommitted(spark, dir, Commit, batchId))
      return // replay of a committed batch: done
    val storedAssign = DeltaStore.stored(spark, dir, "assign", Commit, batchId)

    val incoming = batch.select(col("vec_id"), col("embedding"))
      .dropDuplicates("vec_id")
    val newVecs = storedAssign match {
      case Some(p) => incoming.join(p.select(col("vec_id")),
        Seq("vec_id"), "left_anti")
      case None => incoming
    }
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pinned = newVecs.persist(lvl)
    try {
      val quantDir = s"$dir/quantizer"
      val centsOpt = KMeans.loadCached(spark, quantDir).orElse {
        // no committed quantizer: this is the creation batch
        val nRows = pinned.count()
        if (nRows == 0L) None // empty creation batch: nothing to commit
        else {
          val dot = graft.functions.VectorOps.dot_product _
          val usable = pinned
            .filter(dot(col("embedding"), col("embedding")) > 0.0).count()
          require(usable > 0L,
            s"IVF index $dir: the creation batch has $nRows vectors " +
              "but none with a nonzero norm — a quantizer cannot be " +
              "trained; fix the source or seed the store with " +
              "KMeans.save")
          val kEff = math.min(k.toLong, usable).toInt
          val t = KMeans.fitStatsCached(
            pinned, "embedding", "vec_id", kEff, iters)
          KMeans.save(spark, t.cents, quantDir, iters, t.corpusN,
            t.corpusFp, t.sampleN)
          Some(t.cents)
        }
      }
      centsOpt.foreach { cents =>
        val assigned = assignAgainst(pinned, cents).persist(lvl)
        try {
          // drift row: the batch's Lloyd objective under the FIXED
          // quantizer (mean best cosine over this batch's real vectors)
          val objRow = assigned.filter(col("best_cs") > -2.0)
            .agg(count(lit(1)).as("n"), avg(col("best_cs")).as("obj"))
            .collect()(0)
          import spark.implicits._
          Seq((batchId,
              if (objRow.isNullAt(0)) 0L else objRow.getLong(0),
              if (objRow.isNullAt(1)) Double.NaN else objRow.getDouble(1)))
            .toDF("batch_id", "n_new", "objective").coalesce(1)
            .write.mode("overwrite").parquet(s"$dir/meta/delta_v$batchId")
          assigned.select(col("vec_id"), col("cid"), col("embedding"),
              col("n2"))
            .write.mode("overwrite") // assign LAST = commit point
            .parquet(s"$dir/assign/delta_v$batchId")
        } finally { assigned.unpersist(); () }
      }
    } finally { pinned.unpersist(); () }
    DeltaStore.autoCompact(spark, dir, Subs, Commit, autoCompactEvery)
  }

  /** Fold committed deltas into a new base (pure appends — no fold
    * transform needed; the quantizer store is not touched). */
  def compact(spark: SparkSession, dir: String): Unit =
    DeltaStore.compact(spark, dir, Subs, Commit)

  /** The streaming entry point: maintain the index under `dir` from a
    * streaming `embeddings` frame, auto-compacting every
    * `autoCompactEvery` batches. */
  def indexStream(emb: DataFrame, dir: String, k: Int, iters: Int,
      autoCompactEvery: Int = 64): DataStreamWriter[Row] =
    emb.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        updateBatch(batch.toDF(), dir, batchId, k, iters,
          autoCompactEvery)
    }

  /** The current assignment store (vec_id, cid, embedding, n2) —
    * equal to `assignAgainst` over every vector ingested so far. */
  def currentAssign(spark: SparkSession, dir: String): DataFrame =
    DeltaStore.stored(spark, dir, "assign", Commit, Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no committed index under $dir"))

  /** Per-batch drift rows (n_new, objective), one per committed
    * batch — the retrain signal. */
  def objectives(spark: SparkSession, dir: String): DataFrame =
    DeltaStore.stored(spark, dir, "meta", Commit, Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no committed index under $dir"))
}
