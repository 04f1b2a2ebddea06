package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ordered_pairs ≡ the HOF formulation it replaced, property-tested —
  * the custom expression must be a pure speedup, never a semantic
  * change (the same contract WordShingles carries vs array_distinct∘
  * transform).
  */
class ArrayPairsSpec extends SparkSpec {
  import spark.implicits._

  private val hof = expr(
    "flatten(transform(sequence(0, size(xs) - 2), i -> " +
      "transform(slice(xs, i + 2, size(xs) - i - 1), x -> " +
      "struct(xs[i] AS a, x AS b))))")

  test("100 seeded random arrays: ordered_pairs matches the HOF chain") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 100).map { _ =>
      val n = 2 + rnd.nextInt(15)
      Seq.fill(n)(rnd.nextLong() % 1000).distinct.sorted
    }
    val df = rows.toDF("xs").persist()
    val viaExpr = df.select(explode(ArrayPairs.ordered_pairs(col("xs")))
      .as("p")).select("p.a", "p.b").collect().map(_.toSeq).toSeq
    val viaHof = df.select(explode(hof).as("p"))
      .select("p.a", "p.b").collect().map(_.toSeq).toSeq
    df.unpersist()
    assert(viaExpr == viaHof)
  }

  test("degenerate arrays: empty and singleton yield no pairs; " +
    "pair count is C(n,2)") {
    val df = Seq(Seq.empty[Long], Seq(7L), (1L to 10L).toSeq).toDF("xs")
    val counts = df.select(size(ArrayPairs.ordered_pairs(col("xs")))
      .as("c")).collect().map(_.getInt(0)).toSeq
    assert(counts == Seq(0, 0, 45))
  }

  test("null elements are skipped, never fabricated as zeros") {
    val viaCol = Seq(Tuple1(Seq[java.lang.Long](1L, null, 3L)))
      .toDF("xs")
      .select(ArrayPairs.ordered_pairs(col("xs")).as("p"))
      .selectExpr("explode(p) AS e").select("e.a", "e.b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaCol == Seq((1L, 3L)),
      s"null element fabricated a pair: $viaCol")
  }

  test("non-bigint input is rejected at analysis with a typed error") {
    val df = Seq(Seq("a", "b")).toDF("xs")
    val ex = intercept[Exception] {
      df.select(ArrayPairs.ordered_pairs(col("xs"))).collect()
    }
    assert(ex.getMessage.contains("array<bigint>"), ex.getMessage)
  }
}
