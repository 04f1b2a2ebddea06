package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DistributedNtile must equal the window ntile under every total
  * order — including the n < k, n % k != 0, and k = 1 edges — while
  * planning NO Window node and reusing its one range exchange. */
class DistributedNtileSpec extends SparkSpec {

  private def randomFrame(n: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // duplicate-heavy value column: ties are the dangerous case (the
    // unique id tiebreak must resolve them identically in both forms)
    (0 until n).map(i => (i.toLong, rnd.nextInt(math.max(n / 4, 1))))
      .toDF("id", "v")
  }

  test("matches window ntile across sizes, bucket counts, and tie-" +
    "heavy orders") {
    for (n <- Seq(0, 1, 2, 3, 4, 5, 17, 100, 1001); k <- Seq(1, 3, 4, 7)) {
      val df = randomFrame(n, seed = 31 * n + k)
      val got = DistributedNtile
        .withNtile(df, k, "t", col("v").desc, col("id"))
        .select(col("id"), col("t"))
      val want = df.select(col("id"),
        ntile(k).over(Window.orderBy(col("v").desc, col("id"))).as("t"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"ntile mismatch at n=$n k=$k")
    }
  }

  test("plans no Window node and reuses the single range exchange") {
    val df = randomFrame(1000, seed = 7)
    val out = DistributedNtile.withNtile(df, 4, "t", col("v").desc,
      col("id"))
    out.collect() // materialize so AQE prints the FINAL plan: exchange
    // reuse is a runtime stage-level decision under AQE
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"distributed ntile must not plan a window:\n$plan")
    assert(plan.contains("ReusedExchange") ||
      plan.contains("ReusedQueryStage"),
      s"the range exchange must be reused across the rank/count " +
        s"subtrees:\n$plan")
  }

  test("never silently wrong without exchange reuse: either matches " +
    "window ntile or raises the boundary-divergence guard") {
    // With reuse disabled the count and rank subtrees range-partition
    // independently; RangePartitioner's seed is rdd.id-derived, so the
    // slicings MAY diverge — the operator's contract is that a
    // divergence raises (offsets carry per-partition counts; a row
    // outside its counted slot errors) rather than corrupting ranks.
    // At spec scale the reservoir keeps every row, so boundaries
    // coincide and this pins the guard against false positives; the
    // raise branch is accepted so the pin stays honest if sampling
    // behavior ever changes underneath.
    val keys = Seq("spark.sql.exchangeReuseEnabled",
      "spark.sql.adaptive.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    keys.foreach(spark.conf.set(_, "false"))
    try {
      val df = randomFrame(500, seed = 11)
      try {
        val got = DistributedNtile
          .withNtile(df, 4, "t", col("v").desc, col("id"))
          .select(col("id"), col("t"))
        val want = df.select(col("id"),
          ntile(4).over(Window.orderBy(col("v").desc, col("id"))).as("t"))
        assert(got.except(want).isEmpty && want.except(got).isEmpty,
          "no-reuse execution returned WRONG tiles without raising " +
            "the divergence guard")
      } catch {
        case e: Throwable if e.getMessage != null &&
          e.getMessage.contains("range boundaries diverged") => ()
      }
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("withGroupRank matches the per-group window row_number + " +
    "count across group counts, sizes, and tie-heavy orders") {
    import spark.implicits._
    for (n <- Seq(0, 1, 2, 5, 17, 100, 1001); g <- Seq(1, 2, 5)) {
      val rnd = new scala.util.Random(31 * n + g)
      val df = (0 until n).map(i =>
          (i.toLong, s"g${rnd.nextInt(g)}",
            rnd.nextInt(math.max(n / 4, 1))))
        .toDF("id", "grp", "v")
      val got = DistributedNtile
        .withGroupRank(df, "grp", "rn", "cnt", col("v").desc, col("id"))
        .select(col("id"), col("rn"), col("cnt"))
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("v").desc, col("id"))
      val want = df.select(col("id"),
        row_number().over(w).cast("long").as("rn"),
        count(lit(1)).over(Window.partitionBy(col("grp"))).as("cnt"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"group rank mismatch at n=$n g=$g")
    }
  }

  test("withGroupRank plans no corpus Window node") {
    val df = randomFrame(1000, seed = 3)
      .withColumn("grp", (col("id") % 3).cast("string"))
    val out = DistributedNtile.withGroupRank(df, "grp", "rn", "cnt",
      col("v").desc, col("id"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"withGroupRank must not plan a window:\n$plan")
  }

  test("refuses k < 1 and an empty ordering") {
    val df = randomFrame(10, seed = 1)
    intercept[IllegalArgumentException] {
      DistributedNtile.withNtile(df, 0, "t", col("id"))
    }
    intercept[IllegalArgumentException] {
      DistributedNtile.withNtile(df, 4, "t")
    }
  }
}
