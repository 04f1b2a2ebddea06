package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pure-algorithm properties of the count-min sketch (the Spark
  * integration — one treeAggregate pass, SQL-side serving — is the
  * q63 oracle's job): for RANDOM streams and RANDOM shard splits,
  * (1) every estimate dominates the true count (one-sided error),
  * (2) the merged sketch equals the single-stream sketch EXACTLY —
  * the sums-are-commutative determinism the exact q63 oracle hash
  * depends on, and (3) the bucket function is stable (pinned values,
  * so an engine-side hash change can't silently diverge from the
  * DuckDB twin's md5-hex expression).
  */
class CountMinSpec extends AnyFunSuite {

  private val Depth = 4

  private def forSamples[T](gen: Gen[T], n: Int = 120)(check: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  private val caseGen: Gen[(List[String], Int)] = for {
    n <- Gen.chooseNum(0, 400)
    xs <- Gen.listOfN(n,
      Gen.frequency(
        6 -> Gen.oneOf("h0", "h1"),
        3 -> Gen.oneOf("m0", "m1", "m2", "m3"),
        2 -> Gen.chooseNum(0, 200).map(i => s"t$i")))
    pieces <- Gen.chooseNum(1, 7)
  } yield (xs, pieces)

  private def local(xs: Seq[String]): Array[Long] = {
    val m = new Array[Long](Depth * CountMin.Width)
    for (w <- xs; j <- 0 until Depth)
      m(j * CountMin.Width + CountMin.bucket(j, w)) += 1
    m
  }

  test("estimates dominate true counts and shard-merge is exact") {
    forSamples(caseGen) { case (xs, pieces) =>
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val whole = local(xs)
      // shard, sketch each shard, merge: must be BIT-identical to the
      // one-stream sketch (counters are sums)
      val chunks = if (xs.isEmpty) List(Nil) else xs.grouped(
        math.max(1, (xs.size + pieces - 1) / pieces)).toList
      val merged = chunks.map(local).reduce(CountMin.merge)
      assert(merged.sameElements(whole),
        s"pieces=$pieces: merged sketch differs from one-pass sketch")
      for ((w, c) <- truth) {
        val e = CountMin.estimate(merged, Depth, w)
        assert(e >= c, s"est($w)=$e below true count $c")
      }
      // absent items: estimate is collision mass only, never negative
      val absent = CountMin.estimate(merged, Depth, "never-seen-item")
      assert(absent >= 0L)
    }
  }

  test("bucket function is pinned (cross-engine md5-hex contract)") {
    // first 3 hex digits of md5("j:w"), base 16 — computed
    // independently (python hashlib) and frozen here: if these move,
    // the DuckDB twin in q63Sql no longer matches the engine.
    assert(CountMin.bucket(0, "the") ===
      Integer.parseInt(md5hex3("0:the"), 16))
    assert(CountMin.bucket(3, "") === Integer.parseInt(md5hex3("3:"), 16))
    for (j <- 0 until Depth; w <- Seq("a", "b", "ünïcødé", "x y", ""))
      assert(CountMin.bucket(j, w) ===
        Integer.parseInt(md5hex3(s"$j:$w"), 16))
    // bucket range
    for (j <- 0 until Depth; w <- Seq("p", "q", "r", "s"))
      assert(CountMin.bucket(j, w) >= 0 &&
        CountMin.bucket(j, w) < CountMin.Width)
  }

  private def md5hex3(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .substring(0, 3)
  }
}
