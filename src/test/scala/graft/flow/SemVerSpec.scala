package graft.flow

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins the reference's semver routing semantics (SURVEY.md §2.1 O20;
  * behavioral cases mirror
  * `/root/reference/spec/distribot/phase_started_handler_spec.rb:93-128`:
  * highest version matching the constraint wins; no match → none).
  */
class SemVerSpec extends AnyFunSuite {

  /** Deterministic sampling harness (scalatestplus bridge isn't on the
    * offline classpath, so properties are checked by explicit Gen
    * sampling). */
  private def forSamples[T](gen: Gen[T], n: Int = 200)(check: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach(check)
    }

  private def v(s: String) = SemVer.parse(s).get

  test("parses full, two-segment and one-segment versions") {
    assert(v("1.2.3") == SemVer(1, 2, 3))
    assert(v("1.2") == SemVer(1, 2, 0))
    assert(v("2") == SemVer(2, 0, 0))
    assert(SemVer.parse("nope").isEmpty)
    assert(SemVer.parse("1.2.x").isEmpty)
  }

  test("ordering is lexicographic on (major, minor, patch)") {
    assert(v("1.2.3") < v("1.2.10"))
    assert(v("1.9.9") < v("2.0.0"))
    assert(v("0.0.1") < v("0.1.0"))
  }

  test("pessimistic ~> with two segments allows minor drift") {
    val c = SemVer.parseConstraint("~> 1.0").get
    assert(c.matches(v("1.0.0")))
    assert(c.matches(v("1.9.9")))
    assert(!c.matches(v("2.0.0")))
    assert(!c.matches(v("0.9.9")))
  }

  test("pessimistic ~> with three segments allows patch drift only") {
    val c = SemVer.parseConstraint("~> 1.2.3").get
    assert(c.matches(v("1.2.3")))
    assert(c.matches(v("1.2.9")))
    assert(!c.matches(v("1.3.0")))
    assert(!c.matches(v("1.2.2")))
  }

  test("comparison operators") {
    assert(SemVer.parseConstraint(">= 2.0").get.matches(v("2.0.0")))
    assert(!SemVer.parseConstraint("> 2.0").get.matches(v("2.0.0")))
    assert(SemVer.parseConstraint("<= 2.0").get.matches(v("2.0.0")))
    assert(!SemVer.parseConstraint("< 2.0").get.matches(v("2.0.0")))
    assert(SemVer.parseConstraint("= 1.5.0").get.matches(v("1.5.0")))
    assert(!SemVer.parseConstraint("= 1.5.0").get.matches(v("1.5.1")))
    assert(SemVer.parseConstraint("1.5.0").get.matches(v("1.5.0")))
  }

  test("empty/missing spec matches anything") {
    assert(SemVer.parseConstraint("").get.matches(v("0.0.1")))
    assert(SemVer.parseConstraint(null).get.matches(v("9.9.9")))
  }

  test("bestMatch picks the highest satisfying version") {
    val avail = Seq(v("0.9.0"), v("1.0.0"), v("1.4.2"), v("2.0.0"))
    assert(SemVer.bestMatch("~> 1.0", avail).contains(v("1.4.2")))
    assert(SemVer.bestMatch(">= 1.0", avail).contains(v("2.0.0")))
    assert(SemVer.bestMatch("", avail).contains(v("2.0.0")))
    assert(SemVer.bestMatch("~> 3.0", avail).isEmpty)
  }

  private val genVer: Gen[SemVer] = for {
    a <- Gen.choose(0, 20); b <- Gen.choose(0, 20); c <- Gen.choose(0, 20)
  } yield SemVer(a, b, c)

  test("property: bestMatch result always satisfies the constraint and " +
    "dominates every other satisfying version") {
    val gen = for {
      vs <- Gen.listOf(genVer)
      spec <- Gen.oneOf("~> 1.2", ">= 2.0", "< 3", "~> 0.5.1")
    } yield (vs, spec)
    forSamples(gen) { case (vs, spec) =>
      val c = SemVer.parseConstraint(spec).get
      SemVer.bestMatch(spec, vs) match {
        case Some(best) =>
          assert(c.matches(best))
          assert(vs.filter(c.matches).forall(_ <= best))
        case None => assert(!vs.exists(c.matches))
      }
    }
  }

  test("property: parse/toString round-trips") {
    forSamples(genVer) { ver =>
      assert(SemVer.parse(ver.toString).contains(ver))
    }
  }
}
