package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Crash-WINDOW simulations for the two durable-state protocols: the
  * invariants the comments promise ("every committed version is fully
  * readable", "a crash mid-compaction leaves the delta view
  * authoritative") exercised by reconstructing the exact on-disk
  * state a crash between two protocol steps leaves behind.
  */
class StateCrashRecoverySpec extends SparkSpec {
  import SeasonalProfileStreamSpec.Ev

  private def ev(day: Int, hr: Int, t: String, v: Double): Ev =
    Ev(Timestamp.valueOf(f"2024-01-$day%02d $hr%02d:30:00"), t, v)

  private def fs(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("VersionedState: a crash mid-prune (meta deleted, data dir " +
    "left) cannot break serving, and later commits proceed") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vsprune").toString
    SeasonalProfileStream.updateBatch(
      Seq(ev(1, 9, "click", 1.0)).toDF(), dir, 0L)
    SeasonalProfileStream.updateBatch(
      Seq(ev(1, 9, "click", 2.0)).toDF(), dir, 1L)
    // prune keeps the version a batch READ, so after batch 1 both v0
    // and v1 are committed. Build the exact crash state on v0: the
    // protocol deletes the COMMIT store (meta) first — interrupt it
    // there, leaving the data dir orphaned
    fs(dir).delete(new Path(VersionedState.path(dir, "meta", 0L)), true)
    assert(fs(dir).exists(new Path(
      VersionedState.path(dir, "profile", 0L))))
    // serving consults only COMMITTED meta: v1 is served, the orphan
    // data dir is invisible
    val served = SeasonalProfileStream.current(spark, dir)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(served == 2L, s"orphan data dir affected serving: $served")
    // and the maintainer keeps committing on top of the crash state
    SeasonalProfileStream.updateBatch(
      Seq(ev(2, 9, "click", 3.0)).toDF(), dir, 2L)
    assert(SeasonalProfileStream.current(spark, dir)
      .agg(sum(col("n"))).collect()(0).getLong(0) == 3L)
  }

  test("DeltaStore: an interrupted post-compaction CLEANUP (covered " +
    "delta left behind) does not double-count and heals on re-run") {
    val dir = Files.createTempDirectory("dscleanup").toString
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_partkey").limit(400)
    (0 until 2).foreach(i => BasketIndexStream.updateBatch(
      li.filter(pmod(col("l_partkey"), lit(2)) === i), dir, i.toLong))
    def pairTotal: Long = BasketIndexStream.pairCounts(spark, dir).get
      .agg(sum(col("pc"))).collect()(0).getLong(0)
    val before = pairTotal
    val fold = Map("pairs" -> ((df: org.apache.spark.sql.DataFrame) =>
      df.groupBy(col("part_a"), col("part_b"))
        .agg(sum(col("dc")).cast("long").as("dc"))))
    DeltaStore.compact(spark, dir, Seq("items", "pairs"), "pairs", fold)
    assert(pairTotal == before)
    // crash state: cleanup died before deleting a covered pairs delta
    // — recreate delta_v0 with content that WOULD double-count if the
    // read path consulted it
    spark.range(1).selectExpr("1L AS part_a", "2L AS part_b",
        "1000000L AS dc")
      .write.parquet(s"$dir/pairs/delta_v0")
    assert(pairTotal == before,
      "covered delta below the base double-counted")
    // a compact re-run takes the interrupted-cleanup branch: finishes
    // the deletes, leaves the view unchanged
    DeltaStore.compact(spark, dir, Seq("items", "pairs"), "pairs", fold)
    assert(pairTotal == before)
    assert(!fs(dir).exists(new Path(s"$dir/pairs/delta_v0")),
      "re-run did not finish the interrupted cleanup")
  }

  test("DeltaStore: a crash mid-compaction (data base written, commit " +
    "base not) leaves the delta view authoritative; a re-run heals") {
    val dir = Files.createTempDirectory("dscrash").toString
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_partkey").limit(600)
    val batches = (0 until 3).map(i =>
      li.filter(pmod(col("l_partkey"), lit(3)) === i))
    batches.zipWithIndex.foreach { case (b, i) =>
      BasketIndexStream.updateBatch(b, dir, i.toLong)
    }
    def pairTotal: Long = BasketIndexStream.pairCounts(spark, dir).get
      .agg(sum(col("pc"))).collect()(0).getLong(0)
    val before = pairTotal
    // crash state: compaction wrote the ITEMS base (data store) but
    // died before the PAIRS base (the commit store, written last) —
    // the items base must be invisible because the commit store has
    // no base at that id
    DeltaStore.stored(spark, dir, "items", "pairs", Long.MaxValue).get
      .write.parquet(s"$dir/items/base_v2")
    assert(pairTotal == before,
      "orphan data base changed the served view")
    val items = BasketIndexStream.itemCounts(spark, dir).get.count()
    // a full (healing) compaction reproduces the same views
    DeltaStore.compact(spark, dir, Seq("items", "pairs"), "pairs",
      Map("pairs" -> ((df: org.apache.spark.sql.DataFrame) =>
        df.groupBy(col("part_a"), col("part_b"))
          .agg(sum(col("dc")).cast("long").as("dc")))))
    assert(pairTotal == before, "healing compaction changed the view")
    assert(BasketIndexStream.itemCounts(spark, dir).get.count() == items)
  }
}
