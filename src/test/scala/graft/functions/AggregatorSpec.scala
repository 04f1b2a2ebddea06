package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Typed Aggregator semantics + dedup invariants (SURVEY.md §5 test
  * plan items 2: property-based dedup invariants).
  */
class AggregatorSpec extends SparkSpec {

  test("vocabRichness aggregates distinct tokens per language") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("lang"), split(col("text"), " ").as("tokens"))
      .as[(String, Seq[String])]
    val out = docs.groupByKey(_._1)
      .mapValues(_._2)
      .agg(TextAggregators.vocabRichness.toColumn)
      .collect().toMap
    assert(out.keySet == Set("de", "en", "es", "fr", "zh"))
    out.values.foreach { v =>
      assert(v.docs > 0 && v.tokens > 0)
      assert(v.vocabSize <= v.tokens)
      assert(v.typeTokenRatio > 0 && v.typeTokenRatio <= 1.0)
    }
    // cross-check one group against a declarative computation
    val en = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("lang") === "en")
      .select(explode(split(col("text"), " ")).as("t"))
    assert(out("en").vocabSize == en.distinct().count())
    assert(out("en").tokens == en.count())
  }

  test("property: aggregator merge is associative-equivalent to " +
    "sequential reduce (partial aggregation safety)") {
    val gen = Gen.listOfN(30, Gen.listOfN(5,
      Gen.oneOf("a", "b", "c", "d", "e", "f")))
    (0 until 50).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { docs =>
        val agg = TextAggregators.vocabRichness
        val whole = docs.foldLeft(agg.zero)(agg.reduce)
        val (l, r) = docs.splitAt(docs.size / 2)
        val merged = agg.merge(
          l.foldLeft(agg.zero)(agg.reduce),
          r.foldLeft(agg.zero)(agg.reduce))
        assert(agg.finish(whole) == agg.finish(merged))
      }
    }
  }

  test("property: dedup invariants — jaccard pairs are bounded, " +
    "keyed a<b, and exact-dup docs always pair at 1.0") {
    // run the real pipeline once on the fixtures and check invariants
    val pairs = graft.SparkEntry.queries("llm_ngram_jaccard_dedup")(
      spark, "/root/testdata/sf0.001").collect()
    pairs.foreach { r =>
      val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(a < b, "pair keys must be ordered")
      assert(j >= 0.6 && j <= 1.0, s"jaccard $j out of threshold range")
    }
    // minhash+LSH output equals the exact pipeline on the fixtures
    val lsh = graft.SparkEntry.queries("llm_minhash_lsh_dedup")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, "LSH recall/precision must be exact after verify")
  }
}
