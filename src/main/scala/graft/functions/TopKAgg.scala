package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Grouped top-k as a NATIVE aggregate — `top_k_by(score, payload, k)`
  * returns the k payloads with the largest (score, payload) keys,
  * score-descending.
  *
  * Why an aggregate and not a window: Spark 3.5+ does optimize the
  * idiomatic `row_number() OVER (...) <= k` with a PARTIAL
  * WindowGroupLimit before the exchange (verified on this build), so
  * the shuffle is already k-bounded per map partition — but both
  * sides of that plan still SORT every map partition (O(n log n)
  * ahead of the partial limit, again after the exchange). The heap
  * aggregate does O(n log k) with no sort at all, and its output is
  * an ordinary aggregation state: re-aggregatable (top-k of top-ks
  * rolls up across levels) and servable from the same partial-merge
  * machinery as any sketch — which a window result is not.
  *
  * Determinism: ties on score are broken by the PAYLOAD's natural
  * ordering (payload must be an orderable type; include a unique key
  * in it for a total order). The result is then independent of input
  * partitioning and arrival order — the oracle-hash requirement.
  */
case class TopKByScore(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[UnsafeRow]] {

  require(k >= 1 && k <= TopKAgg.MaxK,
    s"top_k_by: k must be in [1, ${TopKAgg.MaxK}], got $k — a heap " +
      "past this is no longer 'top-k', use a sort")

  override def children: Seq[Expression] = Seq(score, payload)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(payload.dataType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    score.dataType match {
      case DoubleType =>
        TypeUtils.checkForOrderingExpr(payload.dataType, "top_k_by")
      case other => TypeCheckResult.TypeCheckFailure(
        s"top_k_by score must be DOUBLE, got ${other.sql}")
    }

  // buffer rows are (score: double, payload) UnsafeRows; the heap is a
  // MIN-heap (head = weakest entry) so bounding to k is O(log k)
  @transient private lazy val payloadOrd =
    TypeUtils.getInterpretedOrdering(payload.dataType)
  @transient private lazy val keyOrdering = new Ordering[UnsafeRow] {
    override def compare(a: UnsafeRow, b: UnsafeRow): Int = {
      val c = java.lang.Double.compare(a.getDouble(0), b.getDouble(0))
      if (c != 0) c
      else payloadOrd.compare(a.get(1, payload.dataType),
        b.get(1, payload.dataType))
    }
  }
  @transient private lazy val project =
    UnsafeProjection.create(Array(DoubleType, payload.dataType))
  @transient private lazy val inputRow = new org.apache.spark.sql
    .catalyst.expressions.GenericInternalRow(2)

  override def createAggregationBuffer()
      : mutable.PriorityQueue[UnsafeRow] =
    mutable.PriorityQueue.empty[UnsafeRow](keyOrdering.reverse)

  /** `owned` = the row is already detached from any reused buffer
    * (deserialized or heap-resident); the update path passes false and
    * pays the copy only when the row actually enters the heap. */
  private def push(heap: mutable.PriorityQueue[UnsafeRow],
      row: UnsafeRow, owned: Boolean): Unit =
    if (heap.size < k) heap.enqueue(if (owned) row else row.copy())
    else if (keyOrdering.compare(row, heap.head) > 0) {
      heap.dequeue()
      heap.enqueue(if (owned) row else row.copy())
    }

  override def update(heap: mutable.PriorityQueue[UnsafeRow],
      input: InternalRow): mutable.PriorityQueue[UnsafeRow] = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      // + 0.0 collapses -0.0 to 0.0: SQL ordering treats them equal,
      // Double.compare does not — without this the k-boundary could
      // diverge from the window idiom on negative zero
      inputRow.update(0, s.asInstanceOf[Double] + 0.0)
      inputRow.update(1, p)
      push(heap, project(inputRow), owned = false)
    }
    heap
  }

  override def merge(a: mutable.PriorityQueue[UnsafeRow],
      b: mutable.PriorityQueue[UnsafeRow])
      : mutable.PriorityQueue[UnsafeRow] = {
    b.foreach(push(a, _, owned = true)) // deserialized rows: no alias
    a
  }

  override def eval(heap: mutable.PriorityQueue[UnsafeRow]): Any = {
    val sorted = heap.toArray.sorted(keyOrdering.reverse) // score desc
    new GenericArrayData(sorted.map(r =>
      r.get(1, payload.dataType)).asInstanceOf[Array[Any]])
  }

  override def serialize(heap: mutable.PriorityQueue[UnsafeRow])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(heap.size)
    heap.foreach { r =>
      val bytes = r.getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[UnsafeRow] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val heap = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      val row = new UnsafeRow(2)
      row.pointTo(buf, len)
      heap.enqueue(row)
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), payload = newChildren(1))
  override def prettyName: String = "top_k_by"
}

object TopKAgg {
  /** Heap bound: top-k past this should be a sort, not an aggregate. */
  val MaxK = 10000

  /** `array<payload>` of the k payloads with the largest
    * (score, payload) keys, score-descending. */
  def top_k_by(score: Column, payload: Column, k: Int): Column =
    GraftBridge.column(TopKByScore(GraftBridge.expression(score),
      GraftBridge.expression(payload), k)
      .toAggregateExpression())
}
