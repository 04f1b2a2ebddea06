package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DistributedNtile must equal the window forms under every total
  * order — including the n < k, n % k != 0, k = 1, null-group and
  * null-order-value edges — while planning NO single-partition or
  * bounded-alphabet window and NO pinned (checkpoint) blocks: ranks
  * are a pure function of row values against plan-frozen boundaries
  * (round-13), so they must also be invariant to input partitioning
  * and to exchange-reuse/AQE being disabled. */
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

  test("plans no single-partition exchange, no corpus-straggler " +
    "window, and no pinned checkpoint blocks") {
    val df = randomFrame(1000, seed = 7)
    val out = DistributedNtile.withNtile(df, 4, "t", col("v").desc,
      col("id"))
    out.collect() // materialize so AQE prints the FINAL plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"distributed ntile must not plan a single-partition exchange:\n$plan")
    // the one corpus exchange hashes on the plan-frozen bucket id —
    // per-bucket window groups stay ~TargetRowsPerBucket rows, and the
    // bucket count grows with the data (WindowAuditSpec pins the
    // growth over the full inventory)
    assert(plan.contains("hashpartitioning(____t_rank_pid"),
      s"the rank exchange must hash on the explicit bucket id:\n$plan")
    // round-13: no localCheckpoint freeze — nothing is pinned to
    // unreplicated executor memory; lineage recomputes deterministically
    assert(!plan.contains("ExistingRDD"),
      s"no checkpointed RDD scan may remain in the rank plan:\n$plan")
  }

  test("ranks are boundary-independent: identical with exchange reuse " +
    "and AQE disabled, and under different input partitioning") {
    // The round-12 form relied on physical consistency between two
    // reads of a range exchange (reuse / checkpoint); round-13 bucket
    // ids are a pure function of row values, so NO execution mode may
    // change a single rank — not reuse-off, not AQE-off, not a
    // different input slicing.
    val keys = Seq("spark.sql.exchangeReuseEnabled",
      "spark.sql.adaptive.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    keys.foreach(spark.conf.set(_, "false"))
    try {
      val df = randomFrame(500, seed = 11)
      val want = df.select(col("id"),
        ntile(4).over(Window.orderBy(col("v").desc, col("id"))).as("t"))
      for (parts <- Seq(1, 3, 13)) {
        val got = DistributedNtile
          .withNtile(df.repartition(parts), 4, "t", col("v").desc,
            col("id"))
          .select(col("id"), col("t"))
        assert(got.except(want).isEmpty && want.except(got).isEmpty,
          s"rank drift at input partitioning $parts with reuse/AQE off")
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

  test("NULL group keys rank as their own partition, exactly like " +
    "Window.partitionBy (ADVICE r12: no silent null-row loss)") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val df = (0 until 200).map { i =>
      val g = rnd.nextInt(4) match {
        case 0 => None
        case j => Some(s"g$j")
      }
      (i.toLong, g, rnd.nextInt(40))
    }.toDF("id", "grp", "v")
    val got = DistributedNtile
      .withGroupRank(df, "grp", "rn", "cnt", col("v").desc, col("id"))
      .select(col("id"), col("rn"), col("cnt"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("v").desc, col("id"))
    val want = df.select(col("id"),
      row_number().over(w).cast("long").as("rn"),
      count(lit(1)).over(Window.partitionBy(col("grp"))).as("cnt"))
    assert(got.count() === 200L,
      "null-group rows must not vanish from the output")
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "null-group ranks must match the window form")
  }

  test("null ORDER values place identically to the window form " +
    "(desc => nulls last, asc => nulls first)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (0 until 300).map { i =>
      val v: Option[Int] =
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(30))
      (i.toLong, v)
    }.toDF("id", "v")
    for (ord <- Seq(col("v").desc, col("v"), col("v").asc_nulls_last,
      col("v").desc_nulls_first)) {
      val got = DistributedNtile.withGlobalRank(df, "rk", ord, col("id"))
        .select(col("id"), col("rk"))
      val want = df.select(col("id"),
        row_number().over(Window.orderBy(ord, col("id")))
          .cast("long").as("rk"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"global rank mismatch under ordering $ord with null values")
    }
  }

  test("withGroupRank plans no corpus-straggler window") {
    val df = randomFrame(1000, seed = 3)
      .withColumn("grp", (col("id") % 3).cast("string"))
    val out = DistributedNtile.withGroupRank(df, "grp", "rn", "cnt",
      col("v").desc, col("id"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"withGroupRank must not plan a single-partition exchange:\n$plan")
    assert(plan.contains("hashpartitioning(__rn_pid"),
      s"the rank exchange must hash on the explicit bucket id:\n$plan")
  }

  test("a per-entity group key raises the bounded-G guard loudly " +
    "(VERDICT r12 #2) instead of building a corpus-sized offsets frame") {
    import spark.implicits._
    val n = 3 * (DistributedNtile.MaxGroups + 7)
    val df = (0 until n).map(i => (i.toLong, s"u${i % (n / 3)}", i % 11))
      .toDF("id", "grp", "v")
    val e = intercept[IllegalArgumentException] {
      DistributedNtile.withGroupRank(df, "grp", "rn", "cnt",
        col("v").desc, col("id"))
    }
    assert(e.getMessage.contains("per-entity Window"),
      s"the guard must route the caller to the per-entity window " +
        s"form, got: ${e.getMessage}")
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

  test("tilesMany equals independent tiles calls on every axis " +
    "(shared sketch/count jobs change nothing observable)") {
    import spark.implicits._
    val rnd = new scala.util.Random(91)
    val df = (0 until 500).map(i =>
      (i.toLong, rnd.nextInt(120), rnd.nextInt(40), rnd.nextDouble()))
      .toDF("id", "a", "b", "c")
    val axes = Seq(
      ("ta", Seq(col("a").desc, col("id"))),
      ("tb", Seq(col("b").asc, col("id"))),
      ("tc", Seq(col("c").desc, col("id"))))
    val many = DistributedNtile.tilesMany(df, 4, Seq("id"), axes)
    axes.zip(many).foreach { case ((out, order), got) =>
      val want = DistributedNtile.tiles(df, 4, out, Seq("id"), order: _*)
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"tilesMany axis $out diverges from tiles()")
      // and against the plain window ntile, the ground truth
      val win = df.select(col("id"),
        ntile(4).over(Window.orderBy(order: _*)).as(out))
      assert(got.except(win).isEmpty && win.except(got).isEmpty,
        s"tilesMany axis $out diverges from window ntile")
    }
    // the shared-jobs form must keep the per-axis plan shape: bucket-id
    // hash exchange, no single-partition exchange
    val p = many.head.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition") &&
      p.contains("hashpartitioning(____ta_rank_pid"),
      s"tilesMany must keep the per-axis bucket exchange shape:\n$p")
  }

  test("tilesFused equals independent tiles calls on every axis " +
    "(one fused exchange changes nothing observable)") {
    import spark.implicits._
    val rnd = new scala.util.Random(417)
    // duplicate-heavy axes with mixed directions and types — ties are
    // the dangerous case (the masked-order window must break them by
    // the same unique id as the per-axis windows); n % k != 0 so the
    // uneven-tile arithmetic is exercised too
    val df = (0 until 503).map(i =>
      (i.toLong, rnd.nextInt(120), rnd.nextInt(40), rnd.nextDouble()))
      .toDF("id", "a", "b", "c")
    val axes = Seq(
      ("ta", Seq(col("a").desc, col("id"))),
      ("tb", Seq(col("b").asc, col("id"))),
      ("tc", Seq(col("c").desc, col("id"))))
    val fused = DistributedNtile.tilesFused(df, 4, Seq("id"), axes)
    axes.foreach { case (out, order) =>
      val got = fused.select(col("id"), col(out))
      val want = DistributedNtile.tiles(df, 4, out, Seq("id"), order: _*)
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"tilesFused axis $out diverges from tiles()")
      val win = df.select(col("id"),
        ntile(4).over(Window.orderBy(order: _*)).as(out))
      assert(got.except(win).isEmpty && win.except(got).isEmpty,
        s"tilesFused axis $out diverges from window ntile")
    }
    // ONE fused window exchange on (__ax, __pid), no single-partition
    // exchange, and no per-axis rank exchanges left
    val p = fused.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition") &&
      p.contains("hashpartitioning(__ax") &&
      !p.contains("hashpartitioning(____ta_rank_pid"),
      s"tilesFused must serve every axis from the fused exchange:\n$p")
  }

  test("tilesFused handles null order values and n < k like the " +
    "window form") {
    import spark.implicits._
    val df = Seq[(Long, java.lang.Integer)](
      (1L, 5), (2L, null), (3L, 5), (4L, null), (5L, 1))
      .toDF("id", "v")
    val axes = Seq(
      ("td", Seq(col("v").desc, col("id"))),
      ("tu", Seq(col("v").asc_nulls_first, col("id"))))
    val fused = DistributedNtile.tilesFused(df, 7, Seq("id"), axes)
    axes.foreach { case (out, order) =>
      val got = fused.select(col("id"), col(out))
      val win = df.select(col("id"),
        ntile(7).over(Window.orderBy(order: _*)).as(out))
      assert(got.except(win).isEmpty && win.except(got).isEmpty,
        s"tilesFused axis $out diverges from window ntile on nulls")
    }
  }
}
