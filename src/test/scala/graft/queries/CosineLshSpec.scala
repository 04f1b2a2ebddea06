package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SRP-LSH quality on data with real near-dup structure. The parquet
  * fixtures are isotropic random vectors — SRP's worst case (the
  * shipped 16×2 geometry holds recall there but prunes little, which
  * the brute-force oracle tolerates at fixture scale). This spec
  * builds CLUSTERED data — duplicated base vectors with small noise,
  * the distribution an embedding-dedup actually targets — and pins
  * the scale claims: at cos ≥ 0.9 with 8 bands × 8 bits, candidates
  * are a small fraction of all pairs AND the verified output equals
  * brute force.
  */
class CosineLshSpec extends SparkSpec {

  private val dim = 32
  private val nBase = 60
  private val dupsPerBase = 3 // 60 clusters x 3 = 180 vectors

  private lazy val clustered = {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val rows = for {
      b <- 0 until nBase
      base = Array.fill(dim)(rng.nextGaussian())
      d <- 0 until dupsPerBase
      // small perturbation: near-dups inside a cluster have cos ~0.99
      noisy = base.zip(Array.fill(dim)(rng.nextGaussian() * 0.05))
        .map { case (x, e) => x + e }
    } yield ((b * dupsPerBase + d).toLong, unit(noisy).toSeq)
    rows.toDF("vec_id", "embedding")
  }

  private def brutePairs(threshold: Double) = {
    val e = clustered.select(col("vec_id"), col("embedding"),
      sqrt(graft.functions.VectorOps.dot_product(
        col("embedding"), col("embedding"))).as("nrm"))
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(graft.functions.VectorOps.dot_product(col("ea"), col("eb")) /
          (col("na") * col("nb")), 4).as("score"))
      .filter(col("score") > threshold)
  }

  test("fused srp_bits equals per-plane dot_product signs bit for bit") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val planes = Array.fill(24)(Array.fill(dim)(
      if (rng.nextBoolean()) 1.0 else -1.0))
    val df = Seq.tabulate(50)(i =>
      (i.toLong, Array.fill(dim)(rng.nextGaussian()).toSeq))
      .toDF("vec_id", "embedding")
    val fused = df.select(col("vec_id"),
      graft.functions.SrpBits.srp_bits(col("embedding"), planes).as("bits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unfused = df.select(col("vec_id") +: planes.zipWithIndex.map {
        case (p, b) => (when(graft.functions.VectorOps.dot_product(
          col("embedding"), typedLit(p.toSeq)) > 0.0, 1L).otherwise(0L) *
          (1L << b)).as(s"b$b")
      }: _*)
      .collect().map(r => r.getLong(0) ->
        (1 to planes.length).map(r.getLong).sum).toMap
    assert(fused == unfused)
  }

  test("an empty embeddings table yields the empty candidate frame " +
    "(ADVICE r3: head() threw)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    assert(Llm.srpCandidatesFor(empty, nBands = 8, bandBits = 8)
      .count() == 0)
  }

  test("an embedding dim past the 256-component planes fails loudly " +
    "(ADVICE r3: silent truncation degraded recall)") {
    import spark.implicits._
    val wide = Seq((1L, Seq.fill(300)(0.1))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Llm.srpCandidatesFor(wide, nBands = 8, bandBits = 8).count()
    }
    assert(e.getMessage.contains("256"))
  }

  test("tight banding (8x8) on clustered data: few candidates, " +
    "exact brute-force output at cos > 0.9") {
    val nVec = clustered.count()
    val allPairs = nVec * (nVec - 1) / 2
    val cands = Llm.srpCandidatesFor(clustered, nBands = 8, bandBits = 8)
      .count()
    info(f"candidates: $cands of $allPairs pairs " +
      f"(${100.0 * cands / allPairs}%.1f%%)")
    // the pruning claim: candidates are a small fraction of all pairs
    assert(cands < allPairs / 5,
      s"banding failed to prune: $cands of $allPairs")
    val lsh = Llm.cosineLshPairsFor(clustered, threshold = 0.9,
      nBands = 8, bandBits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = brutePairs(0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "clustered data must contain near-dups")
    // the recall claim: nothing above threshold is missed
    assert(lsh == brute,
      s"missed ${(brute -- lsh).size}, extra ${(lsh -- brute).size}")
  }

  test("adaptive planner stat: clustered data keeps the LSH path, " +
    "isotropic data routes to the brute verify") {
    import spark.implicits._
    // clustered + tight banding: candidate estimate prunes hard
    val nC = clustered.count()
    val estC = Llm.srpCandidateEstimate(clustered, nBands = 8, bandBits = 8)
    assert(estC < nC * (nC - 1) / 2 / 2,
      s"clustered estimate $estC did not prune")
    // isotropic + the shipped wide geometry: estimate shows banding
    // emits at least half of all-pairs — the brute plan is cheaper
    val rng = new scala.util.Random(23)
    val iso = (0 until 300).map(i =>
      (i.toLong, Seq.fill(dim)(rng.nextGaussian()))).toDF("vec_id", "embedding")
    val estI = Llm.srpCandidateEstimate(iso, nBands = 16, bandBits = 2)
    assert(estI >= 300L * 299 / 2 / 2,
      s"isotropic estimate $estI unexpectedly sparse")
  }

  test("shipped geometry (16x2) still matches brute force at the " +
    "fixture threshold on clustered data") {
    val lsh = Llm.cosineLshPairsFor(clustered, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = brutePairs(0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute)
  }
}
