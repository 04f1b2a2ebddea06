package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, Row}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Ascending, BaseOrdering, BoundReference, CreateStruct, Descending, Expression, InterpretedOrdering, NullsFirst, NullsLast, SortOrder, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** Explicit range bucketing: ONE sketch pass (count + per-partition
  * reservoir) picks ≤ [[RangeBuckets.MaxBuckets]] boundary keys on the
  * driver, and every consumer derives a deterministic bucket id column
  * by BINARY SEARCH against that frozen boundary list.
  *
  * This is `repartitionByRange` with the implicit made explicit — and
  * that explicitness is the point (VERDICT r12 #3): Spark's
  * `RangePartitioner` seeds its sample from `rdd.id`, so two physical
  * executions of the "same" range exchange can slice the order
  * differently, and any operator whose math spans two reads of the
  * exchange (rank = per-partition offset + local row number) must
  * either pin the blocks (`localCheckpoint` — unreplicated executor
  * memory, a query-killing availability tax under node churn) or trust
  * exchange-reuse canonicalization (which broke for the group-rank
  * shape at sf1). A bucket id computed from a boundary list that lives
  * in the PLAN has neither problem: it is a pure function of the row's
  * key values, identical under task retry, stage re-execution, AQE
  * re-planning, and executor loss — lineage recomputes it exactly.
  *
  * Boundary QUALITY only affects balance, never correctness: every
  * consumer's arithmetic (rank = bucket offset + within-bucket row
  * number) holds for ANY boundary list, so the sample needs no
  * determinism guarantee at all — the list is simply frozen as data at
  * plan time.
  *
  * Scale shape: bucket count grows with the data
  * (`ceil(n / TargetRowsPerBucket)`, floored at the session's default
  * parallelism) up to [[MaxBuckets]], so per-bucket work stays ~flat
  * until the cap and the boundary list stays a bounded driver/plan
  * artifact (≤ 64 Ki keys). At the cap a 10^12-row corpus still sorts
  * only ~15 M rows per bucket — an ordinary task-sized sort. The
  * sketch collects ≤ max([[MaxSampleRows]], 8 × input partitions)
  * keys total (reservoir per input partition, weighted merge — the
  * public `RangePartitioner.sketch` recipe); keys are pruned order
  * columns, so even a 100k-partition scan stays tens of MB of driver
  * residency.
  */
object RangeBuckets {

  /** Mean rows per bucket the boundary pick aims for. Small enough
    * that per-bucket sorts are cache-friendly and the plan-audit
    * invariant (bucket count grows with the corpus) holds from fixture
    * scale up; large enough that a bucket amortizes its task-launch
    * and window-group overhead. */
  val TargetRowsPerBucket: Int = 128

  /** Boundary-list cap: keeps the driver sort, the plan reference
    * object, and the broadcast offset frames bounded (64 Ki keys)
    * no matter the corpus. */
  val MaxBuckets: Int = 1 << 16

  /** Total sketch rows collected to the driver across all input
    * partitions. */
  val MaxSampleRows: Int = 1 << 20

  /** A planned bucketing: `pid` assigns every row of the source frame
    * its 0-based bucket (IntegerType, never null, pure function of the
    * row's key values), `totalRows` is the exact sketch-time row
    * count, `keySchema`/`keyOrdering` expose the key layout for
    * callers that need driver-side comparisons consistent with the
    * bucketing (group-start derivation in DistributedNtile). */
  final case class Bucketing(
      pid: Column,
      numBuckets: Int,
      totalRows: Long,
      keySchema: StructType,
      keyOrdering: BaseOrdering)

  /** Normalize a caller ordering Column (`col("x")`, `col("x").desc`)
    * to a catalyst SortOrder over the stripped key expression. The
    * decomposition happens on the ColumnNode ([[GraftBridge.sortSpec]])
    * — Spark 4 converts sort decorations lazily, so matching the
    * converted Expression against SortOrder would miss and leak the
    * sort into value position. */
  private[operators] def sortOrderOf(c: Column): SortOrder = {
    val (key, asc, nullsFirst) = GraftBridge.sortSpec(c)
    val dir = if (asc) Ascending else Descending
    val no = if (nullsFirst) NullsFirst else NullsLast
    SortOrder(GraftBridge.expression(key), dir, no, Seq.empty)
  }

  /** Plan a bucketing of `df` under the (possibly desc) total order
    * `order`. Runs ONE Spark job (the sketch pass over the pruned key
    * columns); everything else is driver arithmetic. */
  def plan(df: DataFrame, order: Seq[Column]): Bucketing =
    planMany(df, Seq(order)).head

  /** Plan SEVERAL bucketings of the same frame — one per ordering —
    * from ONE shared sketch job. A multi-axis consumer (q82 tiles the
    * customer aggregate on three independent orders) otherwise pays
    * one sketch pass per axis over the identical input; the sampled
    * rows carry every axis's key columns, so each axis's boundary pick
    * is driver arithmetic over the same reservoir. Boundary quality is
    * per-axis identical to [[plan]]'s (same reservoir discipline, same
    * weighted merge); only the number of input passes changes. */
  def planMany(df: DataFrame, orders: Seq[Seq[Column]]): Seq[Bucketing] = {
    require(orders.nonEmpty && orders.forall(_.nonEmpty),
      "range bucketing needs at least one ordering column per axis")
    val axes = orders.map(_.map(sortOrderOf))
    // one flat projection of every axis's key columns; axis i's keys
    // live at offsets off(i) until off(i+1)
    val flat = axes.flatten
    val keyed = df.select(
      flat.zipWithIndex.map { case (so, i) =>
        GraftBridge.column(so.child).as(s"k$i")
      }: _*)
    val schema = keyed.schema
    val offsets = axes.scanLeft(0)(_ + _.length)

    // per-axis ordering over the axis's key sub-struct (offsets are
    // LOCAL to the axis struct: the boundary rows and the per-row
    // binary-search struct both contain only that axis's keys) —
    // honoring each column's direction and null placement, shared by
    // the driver boundary sort and the per-row binary search, so they
    // cannot disagree
    val axisOrderings = axes.zipWithIndex.map { case (sos, a) =>
      val base = offsets(a)
      new InterpretedOrdering(sos.zipWithIndex.map { case (so, i) =>
        SortOrder(
          BoundReference(i, schema(base + i).dataType,
            schema(base + i).nullable),
          so.direction, so.nullOrdering, Seq.empty)
      })
    }

    // one pass: exact per-partition counts + a fixed-size reservoir
    // per partition (deterministically seeded; determinism is a
    // nicety, not a requirement — see scaladoc)
    val rdd = keyed.rdd
    val parts = math.max(rdd.getNumPartitions, 1)
    // no large per-partition floor: at 100k input partitions (a 100 TB
    // scan) a floor of 64 would collect 6.4 M keys and break the
    // bounded-driver claim — a handful of samples per partition is
    // plenty when the total is already ~1 M keys for ≤ 64 Ki
    // boundaries (boundary quality affects only balance, never ranks)
    val perPart = math.max(8, MaxSampleRows / parts)
    val sketch: Array[(Long, Array[Row])] =
      rdd.mapPartitionsWithIndex { (i, it) =>
        val rng = new java.util.Random(0x9E3779B97F4A7C15L ^ i.toLong)
        val res = new Array[Row](perPart)
        var n = 0L
        while (it.hasNext) {
          val r = it.next()
          if (n < perPart) res(n.toInt) = r
          else {
            val j = (rng.nextDouble() * (n + 1)).toLong
            if (j < perPart) res(j.toInt) = r
          }
          n += 1
        }
        Iterator.single((n, res.take(math.min(n, perPart.toLong).toInt)))
      }.collect()

    val total = sketch.map(_._1).sum
    // clamp in LONG before narrowing: at 10^12 rows the quotient is
    // ~7.8e9, and a bare .toInt would wrap negative, collapsing the
    // bucket count to defaultParallelism (multi-billion-row buckets —
    // the exact straggler this operator exists to eliminate)
    val wanted = (total + TargetRowsPerBucket - 1) / TargetRowsPerBucket
    val numBuckets = math.max(
      math.min(wanted, MaxBuckets.toLong).toInt,
      df.sparkSession.sparkContext.defaultParallelism)

    axes.zipWithIndex.map { case (sos, a) =>
      val base = offsets(a)
      val width = sos.length
      val axisSchema = StructType(schema.fields.slice(base, base + width))
      val ordering = axisOrderings(a)
      // weighted merge of the reservoirs, projected to THIS axis's
      // keys: a row sampled from a partition of n_i rows with
      // reservoir size s_i stands for n_i / s_i rows
      val conv = CatalystTypeConverters.createToCatalystConverter(axisSchema)
      def proj(r: Row): Row =
        if (offsets.last == width) r // single axis: rows are the keys
        else Row.fromSeq((0 until width).map(i => r.get(base + i)))
      val weighted: Array[(InternalRow, Double)] = sketch.flatMap {
        case (n, rows) =>
          if (rows.isEmpty) Iterator.empty
          else {
            val w = n.toDouble / rows.length
            rows.iterator.map(r =>
              (conv(proj(r)).asInstanceOf[InternalRow], w))
          }
      }
      java.util.Arrays.sort(weighted,
        (x: (InternalRow, Double), y: (InternalRow, Double)) =>
          ordering.compare(x._1, y._1))

      // evenly-spaced-by-weight boundary pick; equal keys never repeat
      // (a duplicate boundary would only create an empty bucket, but
      // the skip keeps pid = bucket index honest)
      val step = total.toDouble / numBuckets
      val bnds = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      var cum = 0.0
      var target = step
      var i = 0
      while (i < weighted.length && bnds.length < numBuckets - 1) {
        cum += weighted(i)._2
        if (cum >= target &&
          (bnds.isEmpty || ordering.compare(bnds.last, weighted(i)._1) < 0)) {
          bnds += weighted(i)._1
          target += step
        }
        i += 1
      }

      val pid = GraftBridge.column(RangeBucketSearch(
        CreateStruct(sos.map(_.child)), bnds.toArray, ordering))
      Bucketing(pid, bnds.length + 1, total, axisSchema, ordering)
    }
  }
}

/** 0-based range-bucket id by binary search of the row's key struct
  * against a boundary list frozen at plan time. `boundaries` is sorted
  * under `ordering`; the result is the number of boundaries ≤ the key
  * (upper bound), so bucket b holds exactly the keys in
  * (boundaries(b-1), boundaries(b)]. Ships to executors as ONE codegen
  * reference object (the `InSet` pattern), O(log B) comparisons per
  * row inside whole-stage codegen.
  */
case class RangeBucketSearch(
    child: Expression,
    boundaries: Array[InternalRow],
    ordering: BaseOrdering)
  extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val key = child.eval(input).asInstanceOf[InternalRow]
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordering.compare(boundaries(mid), key) <= 0) lo = mid + 1
      else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bnds = ctx.addReferenceObj("rangeBucketBoundaries", boundaries,
      "org.apache.spark.sql.catalyst.InternalRow[]")
    val ord = ctx.addReferenceObj("rangeBucketOrdering", ordering,
      classOf[BaseOrdering].getName)
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    nullSafeCodeGen(ctx, ev, key =>
      s"""
         |int $lo = 0;
         |int $hi = $bnds.length;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($ord.compare($bnds[$mid], $key) <= 0) $lo = $mid + 1;
         |  else $hi = $mid;
         |}
         |${ev.value} = $lo;
       """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
