package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Deterministic spherical k-means for IVF coarse quantization
  * (VERDICT r4 #5: hash-sampled centroids are honest but untrained —
  * a 100 TB ANN corpus needs a TRAINED, persisted index with k scaled
  * to corpus size).
  *
  * Determinism (run-to-run AND engine-to-engine):
  *  - seeded init: the k vectors with the smallest md5(vec_id) — the
  *    same "deterministic sample" used across the repo, no RNG state;
  *  - assignment: cosine argmax with an explicit (score desc, cid asc)
  *    tie-break via max_by on a (cs, -cid) struct — no window sort;
  *  - update: the SPHERICAL mean — each member vector is first
  *    normalized to unit length (the cosine objective's optimal
  *    update direction is the normalized sum of unit vectors; summing
  *    RAW vectors would let one large-norm member drag the centroid
  *    off-direction and break Lloyd monotonicity on norm-
  *    heterogeneous corpora) — with component sums as DECIMAL(30,10):
  *    exact integer-scaled arithmetic, so the mean is independent of
  *    Spark's partial-aggregation order (a double sum would differ in
  *    ulps between runs and flip assignments near cell boundaries);
  *  - fixed iteration count (no data-dependent convergence test);
  *  - degenerate inputs handled loudly-or-safely: zero-norm vectors
  *    carry no direction and are excluded from training; a NaN cosine
  *    (zero-norm centroid) never wins an assignment (nanvl floor);
  *    a cell whose unit-vector sum cancels to zero keeps its previous
  *    centroid, like an empty cell.
  *
  * Scale shape: each iteration is one broadcast crossJoin (n·k cosine
  * rows, centroids always broadcast) + one (cid, dim) aggregation that
  * collects k·dim decimal sums to the driver — the index build is
  * O(iters · n · k · dim) executor work with only k·dim driver bytes,
  * the classic IVF training loop. Empty cells keep their previous
  * centroid (standard Lloyd handling, deterministic).
  */
object KMeans {

  /** Trained centroids, index 0..k-1: Seq(cid -> centroid vector). */
  def fit(emb: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int): IndexedSeq[Array[Double]] = {
    require(k >= 1 && iters >= 0)
    val dot = graft.functions.VectorOps.dot_product _
    // zero-norm vectors carry no direction: excluded from training
    // (they would make every cosine NaN and poison the spherical mean).
    // Persisted for the loop: each Lloyd iteration consumes `e` twice
    // (assignment crossJoin + sums join) — without this the index
    // build re-scans the corpus ~2x per iteration.
    val e = emb.select(col(idCol).as("__vid"), col(vecCol).as("__v"))
      .withColumn("__n2", dot(col("__v"), col("__v")))
      .filter(col("__n2") > 0.0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // seeded init: smallest md5(id), order = centroid index. Vectors
    // arrive as array<float> OR array<double> (DotProduct accepts
    // both) — unbox by runtime type, not a hardcoded getSeq[Float]
    var cents: IndexedSeq[Array[Double]] = e
      .withColumn("__hk", md5(col("__vid").cast("string")))
      .orderBy(col("__hk"))
      .limit(k)
      .select(col("__v")).collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
        case other => throw new IllegalArgumentException(
          s"k-means vector element must be float|double, got $other")
      }.toArray).toIndexedSeq
    val dim = cents.headOption.map(_.length).getOrElse(0)
    var it = 0
    while (it < iters && cents.nonEmpty) {
      val centsDF = centroidsDF(emb.sparkSession, cents, "__cid", "__ce")
      // spherical assignment: cosine argmax (norm of __v cancels in
      // argmax, so only the centroid norm is needed). nanvl floors a
      // NaN score (zero-norm centroid) below every real cosine, so a
      // degenerate centroid never wins an assignment
      val assigned = e.crossJoin(broadcast(centsDF))
        .withColumn("__cs", nanvl(
          dot(col("__v"), col("__ce")) / sqrt(dot(col("__ce"), col("__ce"))),
          lit(-2.0)))
        .groupBy(col("__vid"))
        .agg(max_by(col("__cid"),
          struct(col("__cs"), -col("__cid"))).as("__cid"))
      // spherical mean: exact-decimal sums of UNIT-vector components
      // -> order-independent, and optimal for the cosine objective
      val sums = e.join(assigned, "__vid")
        .select(col("__cid"), sqrt(col("__n2")).as("__nrm"),
          posexplode(col("__v")).as(Seq("__i", "__x")))
        .groupBy(col("__cid"), col("__i"))
        .agg(sum((col("__x") / col("__nrm")).cast(DecimalType(30, 10)))
          .as("__sx"),
          count(lit(1)).as("__c"))
        .collect()
      val next = Array.tabulate(cents.size)(i => cents(i).clone())
      val touched = Array.fill(cents.size)(false)
      sums.foreach { r =>
        val cid = r.getLong(0).toInt
        val i = r.getInt(1)
        if (cid < next.length && i < dim) {
          touched(cid) = true
          next(cid)(i) = (BigDecimal(r.getDecimal(2)) / r.getLong(3)).toDouble
        }
      }
      // a cell whose unit vectors cancel to the zero vector has no
      // mean direction: keep the previous centroid, like an empty cell
      var c = 0
      while (c < next.length) {
        if (touched(c) && next(c).forall(_ == 0.0)) next(c) = cents(c).clone()
        c += 1
      }
      cents = next.toIndexedSeq
      it += 1
    }
    e.unpersist()
    cents
  }

  /** Centroids as a 1-partition broadcastable frame (cid, vector) —
    * the single construction shared by the training loop and serving
    * paths (Multimodal), so schema/determinism tweaks happen once. */
  def centroidsDF(spark: org.apache.spark.sql.SparkSession,
      cents: IndexedSeq[Array[Double]],
      cidCol: String, vecCol: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(cents.zipWithIndex.map {
        case (c, i) => org.apache.spark.sql.Row(i.toLong, c.toSeq)
      }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(cidCol, LongType),
        org.apache.spark.sql.types.StructField(vecCol,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))

  // Trained quantizers are persisted per (input plan, params) for the
  // session — the index-build is the expensive phase of IVF and a real
  // deployment trains once, serves many queries (snapshot semantics
  // documented on PlanCache).
  private val cache =
    new PlanCache[(String, Int, Int), IndexedSeq[Array[Double]]]()

  def fitCached(emb: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int): IndexedSeq[Array[Double]] =
    cache.get(emb, (s"$vecCol/$idCol", k, iters))(
      fit(emb, vecCol, idCol, k, iters))

  /** Test hook: drop persisted quantizers. */
  def clearCache(): Unit = cache.clear()

  // ---- durable persistence: train once, serve from ANY process -----
  // The session PlanCache covers serve-many within one driver; a real
  // 100 TB deployment trains the quantizer in an index-build job and
  // SERVES it from query/dedup jobs in other processes. The store
  // rides graft.streaming.VersionedState (the same protocol as the
  // stream maintainers): each save writes a NEW version — centroids
  // first, a (k, dim) meta row LAST as the commit point — so a
  // crashed or in-flight save can never destroy or shadow the
  // previously committed quantizer, and readers only ever resolve
  // fully-committed versions. Exact-decimal-trained centroids
  // round-trip parquet bit-identically (doubles are stored exactly).
  // Single WRITER per store assumed (one index-build job), any number
  // of concurrent readers.
  import graft.streaming.VersionedState

  /** Persist trained centroids under `dir` as a new committed
    * version. Refuses an empty quantizer — committing one would make
    * every later `fitOrLoad` silently serve zero cells forever. */
  def save(spark: org.apache.spark.sql.SparkSession,
      cents: IndexedSeq[Array[Double]], dir: String): Unit = {
    require(cents.nonEmpty, "refusing to persist an EMPTY quantizer " +
      "(trained on an empty/zero-norm corpus?)")
    val prevV = VersionedState.latestBefore(spark, dir, Long.MaxValue)
    val v = prevV.map(_ + 1).getOrElse(0L)
    centroidsDF(spark, cents, "cid", "vec").coalesce(1)
      .write.mode("overwrite")
      .parquet(VersionedState.path(dir, "cents", v))
    import spark.implicits._
    Seq((cents.size, cents.head.length)).toDF("k", "dim").coalesce(1)
      .write.mode("overwrite") // meta LAST = the commit point
      .parquet(VersionedState.path(dir, "meta", v))
    VersionedState.prune(spark, dir, Seq("cents", "meta"), v, prevV)
  }

  /** Latest committed quantizer under `dir`, if any. */
  private def loadIfCommitted(spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[IndexedSeq[Array[Double]]] =
    VersionedState.latestBefore(spark, dir, Long.MaxValue).map { v =>
      val cents = spark.read
        .parquet(VersionedState.path(dir, "cents", v)).collect()
        .sortBy(_.getLong(0))
        .map(_.getSeq[Double](1).toArray).toIndexedSeq
      val meta = spark.read
        .parquet(VersionedState.path(dir, "meta", v)).collect()(0)
      require(cents.size == meta.getInt(0),
        s"corrupt quantizer store $dir: ${cents.size} centroids, " +
          s"meta says k=${meta.getInt(0)}")
      cents
    }

  /** Load the latest committed quantizer; throws if `dir` holds no
    * committed version. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String)
      : IndexedSeq[Array[Double]] =
    loadIfCommitted(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"no committed quantizer under $dir"))

  /** The serve-side entry: serve the committed quantizer under `dir`
    * if one exists — FAILING LOUDLY if its k differs from the
    * requested k (a silently-wrong cell granularity degrades ANN
    * recall and dedup bounding with no signal; delete or rebuild the
    * store to change k) — else train (via the session cache) and
    * persist. The cross-process twin of `fitCached`: the first
    * process pays the build, every later process or session restart
    * loads. */
  def fitOrLoad(emb: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int, dir: String): IndexedSeq[Array[Double]] = {
    val spark = emb.sparkSession
    loadIfCommitted(spark, dir) match {
      case Some(cents) =>
        if (cents.size != k)
          throw new IllegalStateException(
            s"quantizer store $dir has k=${cents.size}, requested " +
              s"k=$k — rebuild the store to change cell granularity")
        cents
      case None =>
        val cents = fitCached(emb, vecCol, idCol, k, iters)
        save(spark, cents, dir)
        cents
    }
  }
}
