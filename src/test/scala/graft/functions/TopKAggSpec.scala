package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** top_k_by ≡ the window idiom it replaces, with the PLAN SHAPE that
  * justifies it pinned: a k-bounded heap aggregate (map-side
  * partials, k rows per group on the wire) instead of a full
  * per-group sort behind a full-width shuffle.
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def randomDf(seed: Int, rows: Int, groups: Int,
      parts: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until rows).map { i =>
      (s"g${rnd.nextInt(groups)}", rnd.nextInt(50).toDouble, i.toLong)
    }.toDF("g", "score", "id").repartition(parts)
  }

  test("matches the row_number window idiom on seeded random data " +
    "across partitionings (merge path exercised)") {
    for (seed <- 1 to 5; parts <- Seq(1, 7)) {
      val df = randomDf(seed, 500, 6, parts).persist()
      val viaAgg = df.groupBy($"g")
        .agg(TopKAgg.top_k_by($"score",
          struct($"score", $"id"), 4).as("top"))
        .select($"g", posexplode($"top").as(Seq("rk0", "t")))
        .select($"g", ($"rk0" + 1).as("rk"), $"t.score", $"t.id")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      // ties: score desc, then payload (score, id) desc → id desc
      val w = Window.partitionBy($"g")
        .orderBy($"score".desc, $"id".desc)
      val viaWindow = df
        .withColumn("rk", row_number().over(w)).filter($"rk" <= 4)
        .select($"g", $"rk".cast("int").as("rk"), $"score", $"id")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      df.unpersist()
      assert(viaAgg == viaWindow, s"diverged at seed=$seed parts=$parts")
    }
  }

  test("plans as an object hash aggregate — no Window, no per-group " +
    "full sort") {
    val plan = graft.SparkEntry.queries("q94_grouped_topk")(
      spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"plan:\n$plan")
    assert(!plan.contains("Window"), s"window sneaked in:\n$plan")
  }

  test("null scores and null payloads are skipped; groups smaller " +
    "than k return all rows") {
    val df = Seq(("a", Some(1.0), 1L), ("a", None, 2L),
      ("b", Some(2.0), 3L)).toDF("g", "score", "id")
    val out = df.groupBy($"g")
      .agg(TopKAgg.top_k_by($"score", $"id", 5).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(out("a") == Seq(1L)) // null score skipped
    assert(out("b") == Seq(3L))
  }

  test("re-aggregatable: top-k of per-shard top-ks equals the global " +
    "top-k (the rollup property the docs claim)") {
    val df = randomDf(11, 800, 5, 8).persist()
    // shard by an arbitrary extra key, take top-k per (g, shard),
    // then roll the partials up to per-g top-k
    val sharded = df.withColumn("shard", pmod($"id", lit(4)))
      .groupBy($"g", $"shard")
      .agg(TopKAgg.top_k_by($"score", struct($"score", $"id"), 4)
        .as("partial"))
      .select($"g", explode($"partial").as("t"))
      .select($"g", $"t.score".as("score"), $"t.id".as("id"))
    val rolled = sharded.groupBy($"g")
      .agg(TopKAgg.top_k_by($"score", struct($"score", $"id"), 4)
        .as("top"))
      .select($"g", $"top")
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.toSeq)).toMap
    val global = df.groupBy($"g")
      .agg(TopKAgg.top_k_by($"score", struct($"score", $"id"), 4)
        .as("top"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.toSeq)).toMap
    df.unpersist()
    assert(rolled == global, "per-shard partials did not roll up")
  }

  test("negative zero scores order as zero (SQL semantics), so the " +
    "k-boundary matches the window idiom") {
    // -0.0 vs 0.0 with k=1: SQL ordering ties them, so the payload
    // tiebreak (id desc) must decide — Double.compare alone would
    // pick the +0.0 row
    val df = Seq(("a", -0.0, 9L), ("a", 0.0, 1L)).toDF("g", "score", "id")
    val out = df.groupBy($"g")
      .agg(TopKAgg.top_k_by($"score", $"id", 1).as("top"))
      .collect().head.getSeq[Long](1)
    assert(out == Seq(9L), s"negative zero broke the tie order: $out")
  }

  test("k outside the heap bound fails loudly") {
    val ex = intercept[IllegalArgumentException] {
      Seq(("a", 1.0, 1L)).toDF("g", "score", "id").groupBy($"g")
        .agg(TopKAgg.top_k_by($"score", $"id",
          TopKAgg.MaxK + 1).as("top")).collect()
    }
    assert(ex.getMessage.contains("top_k_by"), ex.getMessage)
  }
}
