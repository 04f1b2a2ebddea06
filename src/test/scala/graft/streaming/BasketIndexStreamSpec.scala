package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streamed basket index equals the batch derivation over the
  * whole prefix after every append — under ROW-LEVEL splits, so
  * baskets straddle batches and the new×stored ∪ new×new pair
  * decomposition is what is actually exercised.
  */
class BasketIndexStreamSpec extends SparkSpec {

  private lazy val li = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")
    .select("l_orderkey", "l_partkey")
    .persist()

  private def batchPairs(prefix: DataFrame): Seq[((Long, Long), Long)] = {
    val b = prefix.distinct()
    val a = b.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val c = b.select(col("l_orderkey"), col("l_partkey").as("pb"))
    a.join(c, Seq("l_orderkey")).filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("pc"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .sortBy(_._1).toSeq
  }

  private def streamedPairs(dir: String): Seq[((Long, Long), Long)] =
    BasketIndexStream.pairCounts(spark, dir).get
      .filter(col("pc") > 0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("streamed pair/item/order stats equal the batch derivation " +
    "after every row-level append, through compaction") {
    val dir = Files.createTempDirectory("basketidx").toString
    // row-level split: orders straddle batches by construction
    val parts = li.withColumn("b",
      pmod(col("l_orderkey") * 7 + col("l_partkey"), lit(10)))
    val batches = (0 until 10).map(i =>
      parts.filter(col("b") === i).drop("b"))
    var prefix: DataFrame = null
    for ((b, i) <- batches.zipWithIndex) {
      BasketIndexStream.updateBatch(b, dir, i.toLong)
      prefix = if (prefix == null) b else prefix.unionByName(b)
      if (i % 3 == 2 || i == 9) { // spot-check (each check is costly)
        assert(streamedPairs(dir) == batchPairs(prefix),
          s"pair counts diverged after batch $i")
        val items = BasketIndexStream.itemCounts(spark, dir).get
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val truth = prefix.distinct().groupBy(col("l_partkey"))
          .agg(count(lit(1))).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(items == truth, s"item counts diverged after batch $i")
        assert(BasketIndexStream.orderCount(spark, dir) ==
          prefix.select("l_orderkey").distinct().count())
      }
    }
    // 10 batches with CompactEvery=8: compaction ran mid-stream; the
    // final parity above therefore covers the folded base too. Force
    // one more compaction explicitly and re-check.
    DeltaStore.compact(spark, dir, Seq("items", "pairs"), "pairs",
      Map("pairs" -> ((df: DataFrame) =>
        df.groupBy(col("part_a"), col("part_b"))
          .agg(sum(col("dc")).cast("long").as("dc")))))
    assert(streamedPairs(dir) == batchPairs(li.toDF()),
      "pair counts diverged after explicit compaction")
  }

  test("replayed batch is a no-op; re-delivered rows are idempotent") {
    val dir = Files.createTempDirectory("basketreplay").toString
    val b0 = li.limit(200)
    BasketIndexStream.updateBatch(b0, dir, 0L)
    val before = streamedPairs(dir)
    // same id, different content → ignored
    BasketIndexStream.updateBatch(li.limit(500), dir, 0L)
    assert(streamedPairs(dir) == before)
    // new id, SAME rows → anti-join makes it a no-op
    BasketIndexStream.updateBatch(b0, dir, 1L)
    assert(streamedPairs(dir) == before)
  }
}
