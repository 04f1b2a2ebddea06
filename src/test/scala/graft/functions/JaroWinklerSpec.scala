package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JaroWinklerSim semantics pinned to DuckDB's
  * jaro_winkler_similarity (the q77 oracle function): textbook
  * values, the DuckDB edge conventions (either-empty → 0, ab/ba → 0),
  * null propagation, and codegen ≡ interpreted.
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.scoreStr(a, b)

  test("matches DuckDB's jaro_winkler_similarity on reference pairs") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("cold widget", "small widget") -
      0.7146464646464646) < 1e-15)
    assert(math.abs(jw("large bolt", "large gear") -
      0.8400000000000001) < 1e-15)
    assert(jw("same", "same") == 1.0)
  }

  test("DuckDB edge conventions: either-empty scores 0, no matches " +
    "within the window scores 0, boost only above jaro 0.7") {
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0: no same-position match
    // below the 0.7 boost threshold the raw jaro passes through
    // (jaro = (0.4+0.4+1)/3 = 0.6; DuckDB agrees: 0.6 exactly)
    assert(jw("abcdxxxxxx", "abcdyyyyyy") == 0.6)
    // above it the prefix boost applies, capped at 4 chars even with
    // a 7-char common prefix (jaro 0.8 → 0.8 + 4·0.1·0.2 = 0.88)
    assert(math.abs(jw("abcdefgxxx", "abcdefgyyy") - 0.88) < 1e-15)
  }

  test("expression: null propagation, symmetry on fixture names, " +
    "codegen result equals the direct implementation") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("large bolt", "large gear"))
      .toDF("a", "b")
    val got = df.select(
      JaroWinkler.jaro_winkler(col("a"), col("b")).as("s1"),
      JaroWinkler.jaro_winkler(col("b"), col("a")).as("s2"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "not symmetric")
    }
    assert(got.map(_.getDouble(0)).toSeq ==
      Seq(jw("martha", "marhta"), jw("large bolt", "large gear")))
    val withNull = Seq((Option("x"), Option.empty[String]))
      .toDF("a", "b")
      .select(JaroWinkler.jaro_winkler(col("a"), col("b")))
      .head()
    assert(withNull.isNullAt(0), "null input must yield null")
  }

  test("rejects non-string inputs loudly") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(JaroWinkler.jaro_winkler(col("a"), col("b"))).head()
    }
    assert(ex.getMessage.toLowerCase.contains("string"), ex.getMessage)
  }
}
