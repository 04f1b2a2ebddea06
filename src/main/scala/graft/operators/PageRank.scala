package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Damped PageRank power iteration over a weighted edge list
  * (src, dst, w) with Σ_dst w(src→dst) = 1 per src.
  *
  * Two execution shapes, IDENTICAL arithmetic (pinned in
  * OperatorsSpec):
  *
  *  - [[run]] — the distributed loop: each step is ONE node-keyed
  *    join + ONE aggregation. This is the billion-node shape (ranks
  *    and edges never leave the executors; a long chain additionally
  *    wants a localCheckpoint every few steps to truncate lineage).
  *  - [[runBounded]] — the driver-resident variant for graphs that
  *    are BOUNDED BY CONSTRUCTION (label alphabets, category
  *    taxonomies, state machines — the q74 use case): one collect
  *    behind a loud cap, zero per-iteration Spark stages. At fixture
  *    scale the distributed loop pays ~20 × the per-stage scheduling
  *    floor for a 25-edge graph; a bounded graph should not.
  *
  * Cross-engine / cross-shape determinism: per-edge contributions are
  * rounded to DECIMAL(38,18) before summing (exact and
  * order-independent — a double cannot tie exactly at the 18th
  * decimal, so the rounding is unambiguous), and each iteration's
  * rank is rounded to 12 decimals (HALF_UP on both paths), so
  * per-step agreement never decays across 20 iterations.
  */
object PageRank {
  val Iters = 20
  val Damping = 0.85

  /** Node set of an edge list: distinct src ∪ dst. */
  def nodesOf(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()

  /** Distributed damped power iteration; returns (node, rank) with
    * rank rounded to 12 decimals. */
  def run(edges: DataFrame, n: Long, iters: Int = Iters,
      damping: Double = Damping): DataFrame = {
    // checkpoint inputs + each iterate: without truncation the plan
    // nests `iters` joins deep — Catalyst analysis cost grows
    // superlinearly and a late-task failure recomputes every
    // iteration (ConnectedComponents' round discipline, applied here)
    val nodes = nodesOf(edges).localCheckpoint(false)
    val e = edges.localCheckpoint(false)
    val invN = 1.0 / n
    var ranks = nodes.select(col("node"), lit(invN).as("rank"))
    for (_ <- 1 to iters) {
      val inflow = ranks
        .join(e, ranks("node") === e("src"))
        .select(col("dst"),
          (col("rank") * col("w")).cast(DecimalType(38, 18)).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).cast(DoubleType).as("inflow"))
      ranks = nodes
        .join(inflow, nodes("node") === inflow("dst"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) * invN +
            lit(damping) * coalesce(col("inflow"), lit(0.0)), 12)
            .as("rank"))
        .localCheckpoint(false)
    }
    ranks
  }

  private def halfUp(v: Double, scale: Int): Double =
    BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** Driver-resident iteration for bounded graphs: same arithmetic as
    * [[run]] (decimal-exact inflow sums, per-step round(12)), one
    * bounded collect, no per-iteration stages. Fails loudly BEFORE
    * collecting if the edge list exceeds `maxEdges`. */
  def runBounded(edges: DataFrame, iters: Int = Iters,
      damping: Double = Damping, maxEdges: Int = 100000): DataFrame = {
    val spark = edges.sparkSession
    // ONE action: fetch cap+1 rows — the guard fires on the (cap+1)th
    // row's existence without a separate count pass over the edge
    // derivation (which may itself be a full corpus aggregation)
    val es = edges.select(col("src").cast(StringType),
        col("dst").cast(StringType), col("w").cast(DoubleType))
      .limit(maxEdges + 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    require(es.length <= maxEdges,
      s"PageRank.runBounded: edge list exceeds the driver cap " +
        s"$maxEdges — use PageRank.run (the distributed loop) for " +
        "unbounded graphs")
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val schema = StructType(Seq(StructField("node", StringType),
      StructField("rank", DoubleType)))
    if (nodes.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    val invN = 1.0 / nodes.length
    val bySrc = es.groupBy(_._1)
    var ranks: Map[String, Double] = nodes.map(_ -> invN).toMap
    for (_ <- 1 to iters) {
      // mirror of the distributed plan: contribution = double product
      // rounded to scale 18 (exact decimal), summed exactly, once
      // back to double
      val inflow = scala.collection.mutable.Map[String, BigDecimal]()
      for ((src, outs) <- bySrc; (_, dst, w) <- outs) {
        val c = BigDecimal(ranks(src) * w)
          .setScale(18, BigDecimal.RoundingMode.HALF_UP)
        inflow(dst) = inflow.getOrElse(dst, BigDecimal(0)) + c
      }
      ranks = nodes.map { nd =>
        val in = inflow.get(nd).map(_.toDouble).getOrElse(0.0)
        nd -> halfUp((1.0 - damping) * invN + damping * in, 12)
      }.toMap
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        nodes.map(nd => Row(nd, ranks(nd))).toSeq, 1), schema)
  }
}
