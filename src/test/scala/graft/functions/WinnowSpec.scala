package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WinnowFingerprints (MOSS, SIGMOD'03): the rolling hash must equal
  * the per-window naive polynomial hash; winnowing must honor the
  * paper's two guarantees (shared-substring detection, selection
  * density); the expression path must equal the compiled helper.
  */
class WinnowSpec extends SparkSpec {

  private def naiveHashes(s: String, k: Int): Array[Long] = {
    val M = WinnowFingerprints.Mod
    val B = WinnowFingerprints.Base
    (0 to s.length - k).map { i =>
      s.substring(i, i + k).foldLeft(0L)((h, c) => (h * B + c) % M)
    }.toArray
  }

  test("rolling hashes equal naive per-window recomputation") {
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaa", "abcdefghij klmnop qrstu vwxyz 0123456789")
    for (t <- texts; k <- Seq(4, 8)) {
      val naive = naiveHashes(t, k)
      // windows of w=1 winnow to every hash → compare against naive set
      val got = WinnowFingerprints.compute(t, k, 1)
      assert(got.toSet == naive.toSet, s"k=$k text='$t'")
    }
  }

  test("documents sharing >= w+k-1 chars share a fingerprint; " +
    "disjoint documents share none") {
    val shared = "zqxjkvbwpfmzyg hrldtcn aeiou substring"  // 38 > 23
    val a = "left padding words here " + shared + " and a tail"
    val b = "completely different prefix " + shared + " other suffix"
    val fa = WinnowFingerprints.compute(a, 8, 16).toSet
    val fb = WinnowFingerprints.compute(b, 8, 16).toSet
    assert((fa & fb).nonEmpty, "shared substring produced no shared print")
    val c = "entirely unrelated content with no overlap at all present"
    val fc = WinnowFingerprints.compute(c, 8, 16).toSet
    assert((fa & fc).isEmpty, "disjoint docs should not collide at this size")
  }

  test("selection density: at least one hash kept per w positions") {
    val rng = new scala.util.Random(5)
    val t = (1 to 400).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val k = 8; val w = 16
    val h = naiveHashes(t, k)
    val sel = WinnowFingerprints.compute(t, k, w).toSet
    // every full window of w consecutive hashes contains a selected one
    for (p <- 0 to h.length - w)
      assert(h.slice(p, p + w).exists(sel.contains),
        s"window at $p has no selected fingerprint")
  }

  test("short and null inputs are safe") {
    assert(WinnowFingerprints.compute("tiny", 8, 16).isEmpty)
    assert(WinnowFingerprints.compute("", 8, 16).isEmpty)
    import spark.implicits._
    val df = Seq(Some("abc"), None, Some("x" * 50)).toDF("text")
      .select(WinnowFingerprints.winnow_fingerprints(col("text")).as("fp"))
    val rows = df.collect()
    assert(rows(0).getSeq[Long](0).isEmpty)
    assert(rows(1).isNullAt(0))
    assert(rows(2).getSeq[Long](0).nonEmpty)
  }

  test("supplementary-plane text hashes per CODE POINT (one position " +
    "per astral char), matching the oracle's ord()/substring()") {
    // reference: explicit code-point polynomial hash + winnow-by-set
    def ref(s: String, k: Int, w: Int): Set[Long] = {
      val cps = s.codePoints().toArray
      val M = WinnowFingerprints.Mod
      val B = WinnowFingerprints.Base
      val h = (0 to cps.length - k).map { i =>
        (i until i + k).foldLeft(0L)((acc, j) => (acc * B + cps(j)) % M)
      }.toArray
      if (h.length < w) Set.empty
      else (0 to h.length - w).map(i => h.slice(i, i + w).min).toSet
    }
    // 𝕊 (U+1D54A) and 😀 (U+1F600) are surrogate PAIRS in UTF-16: the
    // old code-unit loop counted them as two positions and hashed the
    // surrogate halves, silently diverging from the oracle (ADVICE r4)
    val astral = "math 𝕊 symbols and emoji 😀 mixed " +
      "into otherwise plain ascii text long enough to winnow properly"
    val plain = "just plain ascii text long enough to winnow here too ok"
    for (s <- Seq(astral, plain)) {
      assert(WinnowFingerprints.compute(s, 8, 16).toSet == ref(s, 8, 16),
        s"text='$s'")
    }
    // one astral char = ONE window position: a string of n astral chars
    // has n-k+1 windows, not 2n-k+1
    val allAstral = "😀" * 40 // 40 code points, 80 chars
    assert(WinnowFingerprints.compute(allAstral, 8, 16).toSet ==
      ref(allAstral, 8, 16))
  }

  test("codegen path equals the compiled helper on fixture docs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val viaExpr = docs.select(col("doc_id"),
        WinnowFingerprints.winnow_fingerprints(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val viaHelper = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        WinnowFingerprints.compute(r.getString(1), 8, 16).toVector).toMap
    assert(viaExpr == viaHelper)
  }
}
