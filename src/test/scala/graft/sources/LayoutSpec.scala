package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Data-layout levers for the 100 TB posture, proven on the plan:
  * hive-partitioned writes give partition-pruned scans (a filter on
  * the partition key never touches other directories), and bucketed
  * tables co-locate join keys so an equi-join plans with NO exchange
  * on the bucketed sides — the offline answer to "big joins shuffle".
  */
class LayoutSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("partitionBy write -> filter prunes to one partition directory") {
    val tmp = java.nio.file.Files.createTempDirectory("part").toString
    spark.read.parquet(s"$dir/orders.parquet")
      .write.partitionBy("o_orderpriority").mode("overwrite")
      .parquet(s"$tmp/orders_p")
    val scan = spark.read.parquet(s"$tmp/orders_p")
      .filter(col("o_orderpriority") === "1-URGENT")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("o_orderpriority"), plan)
    // pruned read returns exactly the partition's rows
    val expected = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(scan.count() == expected && expected > 0)
  }

  test("bucketed tables join without any exchange on the bucketed key") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    orders.write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    customer.write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")
    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
    // disable broadcast so the join would otherwise shuffle both sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.substring(0, plan.indexOf("HashAggregate")
        .max(plan.length - 1))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan)
      // the join's inputs read bucketed files directly: no Exchange
      // between the join and its scans
      val joinIdx = plan.indexOf("Join")
      val tail = plan.substring(joinIdx)
      assert(!tail.contains("Exchange hashpartitioning(o_custkey") &&
        !tail.contains("Exchange hashpartitioning(c_custkey"), plan)
      // and the result matches the unbucketed join
      val expected = orders.join(customer,
        col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
