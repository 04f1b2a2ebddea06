package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row

/** ANN-IVF quality (VERDICT r1 #8): quantify recall of the bucketed
  * index against the brute-force cosine top-k baseline (q29), and pin
  * the quantizer's determinism. Recall@10 = |ivf top-10 ∩ brute
  * top-10| / 10 on the sf0.01 fixture (2k vectors, 8 cells).
  */
class MultimodalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  private def top10(rows: Array[Row]): Set[Long] =
    rows.map(_.getLong(0)).toSet

  test("IVF recall@10 curve vs brute force: above the random-probe " +
    "floor at the shipped nProbe=2, monotone in probe width, exact " +
    "at full probe") {
    val brute = top10(graft.SparkEntry.queries("q29_similarity_topk")(
      spark, dir).collect())
    assert(brute.size == 10)
    val recalls = Seq(1, 2, 4, 8).map { p =>
      val ivf = top10(Multimodal.annIvfWith(spark, dir, p).collect())
      val r = (ivf & brute).size / 10.0
      info(f"recall@10 nProbe=$p: $r%.2f")
      p -> r
    }.toMap
    // Fixture embeddings are ISOTROPIC unit vectors (top-10 cosines
    // are only ~0.26-0.37) — the worst case for any coarse quantizer:
    // true neighbors spread near-uniformly over cells, so expected
    // recall at p probes of 8 cells has a p/8 floor plus whatever
    // directional lift the spherical assignment buys. Measured: 0.50
    // at nProbe=2 vs the 0.25 random floor — the index IS steering
    // probes toward the query's cone. Pin "well above random", not a
    // clustered-data fantasy number.
    assert(recalls(2) >= 2.0 / 8 + 0.1,
      s"nProbe=2 recall ${recalls(2)} not above the random-probe floor")
    // probing every cell IS brute force — recall must be exactly 1
    assert(recalls(8) == 1.0, "nProbe=8 must equal brute force")
    // monotone non-decreasing in probe width
    assert(recalls(1) <= recalls(2) && recalls(2) <= recalls(4) &&
      recalls(4) <= recalls(8))
  }

  test("hash-sampled quantizer is deterministic across runs") {
    val a = Multimodal.annIvfWith(spark, dir, 2).collect().toSeq
    val b = Multimodal.annIvfWith(spark, dir, 2).collect().toSeq
    assert(a == b)
  }
}
