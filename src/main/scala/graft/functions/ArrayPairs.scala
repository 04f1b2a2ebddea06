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
    val n = xs.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n - 1) {
      val a = xs.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(
          Array[Any](a, xs.getLong(j))): InternalRow
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

object ArrayPairs {
  /** `array<struct<a,b>>` of all i<j element pairs of a bigint array. */
  def ordered_pairs(xs: Column): Column =
    GraftBridge.column(OrderedPairs(GraftBridge.expression(xs)))
}
