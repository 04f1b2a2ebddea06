package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `word_shingles` must be a drop-in for the HOF formulation it
  * replaces — same shingles, same first-occurrence order — and guard
  * its edges (short arrays, nulls, width) at analysis time.
  */
class ShinglesSpec extends SparkSpec {
  import Shingles.word_shingles

  private val hof = expr("array_distinct(transform(sequence(0, size(tk)-3), " +
    "i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))")

  test("matches the transform/array_distinct formulation on the fixture " +
    "corpus, order included") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
    val both = docs.select(col("doc_id"),
      word_shingles(col("tk"), 3).as("fast"), hof.as("slow"))
    assert(both.filter(not(col("fast") === col("slow"))).count() == 0)
    assert(both.count() > 0)
  }

  test("edge cases: fewer tokens than the width -> empty; duplicates " +
    "collapse to first occurrence") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b")),                     // too short
      (2L, Seq("a", "b", "c")),                // exactly one shingle
      (3L, Seq("x", "y", "x", "y", "x", "y"))  // repeating: dups collapse
    ).toDF("id", "tk")
    val out = df.select(col("id"), word_shingles(col("tk"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq())
    assert(out(2L) == Seq("a b c"))
    assert(out(3L) == Seq("x y x", "y x y"))
  }

  test("rejects non-array<string> input and width < 1 at analysis time") {
    import spark.implicits._
    val bad = Seq(Tuple1(Seq(1L, 2L, 3L))).toDF("tk")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(word_shingles(col("tk"), 3)).collect()
    }
    val ok = Seq(Tuple1(Seq("a", "b", "c"))).toDF("tk")
    intercept[org.apache.spark.sql.AnalysisException] {
      ok.select(word_shingles(col("tk"), 0)).collect()
    }
  }
}
