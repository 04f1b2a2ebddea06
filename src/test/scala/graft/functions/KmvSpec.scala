package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV sketch: buffer algebra unit pins (cap, dedupe, merge), a
  * differential against a window-derived k-smallest-distinct, and the
  * q107/q108 fixture behavior (both estimator branches, identical
  * user pools detected as full overlap).
  */
class KmvSpec extends SparkSpec {

  test("insert keeps a sorted distinct buffer capped at k") {
    var hs: Seq[Long] = Vector.empty
    for (h <- Seq(5L, 3L, 9L, 3L, 1L, 7L, 2L, 8L, 2L))
      hs = Kmv.insert(hs, h, 4)
    assert(hs == Seq(1L, 2L, 3L, 5L),
      s"expected the 4 smallest distinct values, got $hs")
    // an incoming value above the cap's max is a no-op
    assert(Kmv.insert(hs, 100L, 4) == hs)
    // a smaller value displaces the max
    assert(Kmv.insert(hs, 0L, 4) == Seq(0L, 1L, 2L, 3L))
  }

  test("union merges sorted distinct buffers exactly (monoid)") {
    val a = Seq(1L, 4L, 6L, 9L)
    val b = Seq(2L, 4L, 5L, 11L)
    assert(Kmv.union(a, b, 4) == Seq(1L, 2L, 4L, 5L))
    assert(Kmv.union(a, b, 8) == Seq(1L, 2L, 4L, 5L, 6L, 9L, 11L))
    assert(Kmv.union(Seq.empty, b, 4) == b)
    // commutative
    assert(Kmv.union(a, b, 4) == Kmv.union(b, a, 4))
  }

  test("the Aggregator equals a window-derived k-smallest-distinct " +
    "over the fixture, independent of partitioning") {
    val dir = "/root/testdata/sf0.01"
    val k = 16
    val kmvU = udaf(Kmv.sketch(k), org.apache.spark.sql.Encoders.scalaLong)
    val h = graft.queries.Events.events(spark, dir)
      .select(col("event_type"),
        conv(substring(md5(col("user_id").cast("string")), 1, 15),
          16, 10).cast("long").as("h"))
    for (parts <- Seq(1, 7)) {
      val agg = h.repartition(parts)
        .groupBy(col("event_type")).agg(kmvU(col("h")).as("b"))
        .select(col("event_type"), col("b.hs").as("sk"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val ref = h.distinct()
        .groupBy(col("event_type"))
        .agg(slice(sort_array(collect_set(col("h"))), 1, k).as("sk"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(agg == ref,
        s"Aggregator sketch diverges from the reference at $parts " +
          s"partitions")
    }
  }

  test("q107/q108 fixture posture: both estimator branches exercise " +
    "across SFs and an identical user pool reads as full overlap") {
    val small = graft.SparkEntry
      .queries("q107_kmv_distinct")(spark, "/root/testdata/sf0.001")
      .collect()
    // 15 distinct users < k=64: the sketch IS the distinct set
    small.foreach { r =>
      assert(r.getAs[Long]("sketch_size") < 64)
      assert(r.getAs[Long]("est_distinct") ==
        r.getAs[Long]("exact_distinct"),
        s"sub-k sketch must estimate exactly: $r")
      assert(r.getAs[Boolean]("within_40pct"))
    }
    val mid = graft.SparkEntry
      .queries("q107_kmv_distinct")(spark, "/root/testdata/sf0.01")
      .collect()
    mid.foreach { r =>
      assert(r.getAs[Long]("sketch_size") == 64,
        s"estimation branch not exercised: $r")
    }
    // the 40% fence is probabilistic (~3 sigma at k=64's SE 12.7%):
    // a regenerated fixture can legitimately land a row outside it
    // (ADVICE r11). Cross-engine agreement on the BOOLEAN is the
    // driver gate's job; here pin the aggregate posture instead — a
    // majority inside the fence catches a broken estimator (whose
    // rows would blow the fence together) without flaking on one
    // legitimate tail draw.
    val inside = mid.count(_.getAs[Boolean]("within_40pct"))
    assert(inside * 2 > mid.length,
      s"k=64 estimator: only $inside/${mid.length} rows inside the " +
        "40% fence — the estimate formula is off, not a tail draw")
    val overlap = graft.SparkEntry
      .queries("q108_kmv_overlap")(spark, "/root/testdata/sf0.01")
      .collect()
    // every event type draws from the same user pool, so every pair's
    // union sketch is fully contained in both sides
    overlap.foreach { r =>
      assert(r.getAs[Long]("rho") == 64, s"expected full inclusion: $r")
      assert(r.getAs[Long]("exact_intersection") > 0)
    }
  }
}
