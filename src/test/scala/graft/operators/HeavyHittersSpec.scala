package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pure-algorithm properties of the Misra-Gries summary (the Spark
  * integration is covered in OperatorsSpec): on RANDOM streams, for
  * RANDOM k and RANDOM split/merge trees, every estimate must sit in
  * [true − n/(k+1), true] and every item with true count > n/(k+1)
  * must be present — the mergeable-summaries guarantee the q59
  * oracle verdict rides on.
  */
class HeavyHittersSpec extends AnyFunSuite {

  private def forSamples[T](gen: Gen[T], n: Int = 150)(check: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  private val caseGen: Gen[(List[String], Int, Int)] = for {
    n <- Gen.chooseNum(0, 400)
    // zipf-ish: small ids frequent, long tail rare
    xs <- Gen.listOfN(n,
      Gen.frequency(
        6 -> Gen.oneOf("h0", "h1"),
        3 -> Gen.oneOf("m0", "m1", "m2", "m3"),
        2 -> Gen.chooseNum(0, 200).map(i => s"t$i")))
    k <- Gen.chooseNum(1, 12)
    pieces <- Gen.chooseNum(1, 7)
  } yield (xs, k, pieces)

  test("bound and heavy-presence hold for random streams, k, and " +
    "merge trees") {
    forSamples(caseGen) { case (xs, k, pieces) =>
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = xs.size.toLong
      // split into `pieces` chunks, summarize each, fold-merge
      val chunks = if (xs.isEmpty) List(Nil) else xs.grouped(
        math.max(1, (xs.size + pieces - 1) / pieces)).toList
      val summaries = chunks.map { c =>
        c.foldLeft(new HeavyHitters.Summary)(
          (m, w) => HeavyHitters.add(m, w, k))
      }
      val merged = summaries.reduce(
        (a, b) => HeavyHitters.merge(a, b, k))
      val bound = n.toDouble / (k + 1)
      for ((w, c) <- truth) {
        val e = merged.getOrElse(w, 0L)
        assert(e <= c && e >= c - bound,
          s"k=$k pieces=$pieces: est($w)=$e outside [${c - bound}, $c]")
        if (c > bound)
          assert(merged.contains(w),
            s"k=$k pieces=$pieces: heavy $w (count $c > $bound) missing")
      }
      assert(merged.size <= k, s"summary exceeded k: ${merged.size} > $k")
    }
  }
}
