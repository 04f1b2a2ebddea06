package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All position-ordered element pairs (i < j) of a bigint array, as
  * `array<struct<a,b>>` — the market-basket pair generator.
  *
  * Equivalent to `flatten(transform(sequence(0, size(xs)-2), i ->
  * transform(slice(xs, i+2, size(xs)-i-1), x -> struct(xs[i], x))))`
  * but in one tight loop: the HOF pipeline evaluates interpreted,
  * allocating an index sequence, a lambda frame per element, and a
  * sliced array copy per i (measured 1.5 s of the 1.9 s q83 total at
  * sf0.1; the WordShingles lesson again). Over a SORTED DISTINCT
  * array the position order i < j is also the value order a < b.
  * Output size is C(n,2) per row — callers bound n by construction
  * (basket size ≤ order lines).
  */
case class OrderedPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private val structType = StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false)))

  override def dataType: DataType =
    ArrayType(structType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ordered_pairs needs array<bigint>, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val m = xs.numElements()
    // null elements are SKIPPED (an unsafe getLong would silently
    // read them as 0 and fabricate pairs); the output struct fields
    // stay non-null by construction
    val vals = new Array[Long](m)
    var n = 0
    var p = 0
    while (p < m) {
      if (!xs.isNullAt(p)) { vals(n) = xs.getLong(p); n += 1 }
      p += 1
    }
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val pairCount = n.toLong * (n - 1) / 2
    if (pairCount > OrderedPairs.MaxPairsPerRow)
      throw new IllegalArgumentException(
        s"ordered_pairs: $n elements expand to $pairCount pairs, over " +
          s"the ${OrderedPairs.MaxPairsPerRow} per-row cap — a row " +
          "this wide is a memory bomb; pre-bucket or cap the array")
    val out = new Array[Any](pairCount.toInt)
    var k = 0
    var i = 0
    while (i < n - 1) {
      val a = vals(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(
          Array[Any](a, vals(j))): InternalRow
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): OrderedPairs =
    copy(child = c)
}

object OrderedPairs {
  /** Per-row expansion cap: C(n,2) past this is a memory bomb (and
    * n*(n-1)/2 past Int.MaxValue cannot even allocate). */
  val MaxPairsPerRow = 4000000L
}

object ArrayPairs {
  /** `array<struct<a,b>>` of all i<j element pairs of a bigint array. */
  def ordered_pairs(xs: Column): Column =
    GraftBridge.column(OrderedPairs(GraftBridge.expression(xs)))
}
