package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Codegen'd dot product over two float/double array columns.
  *
  * The built-in route (`aggregate(zip_with(...))`) evaluates an
  * interpreted lambda per element per row — ~40x slower on the
  * brute-force similarity join. This expression stays inside
  * whole-stage codegen with a primitive loop: elements are widened to
  * double and accumulated sequentially (index order), so results are
  * bit-identical to a sequential SQL fold — which is what the DuckDB
  * oracles compute.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product needs array<float|double> inputs, " +
            s"got ${left.dataType} / ${right.dataType}")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // dimension mismatch is data corruption (a mixed-dim embedding
    // table): fail loudly — a truncated partial sum would silently
    // poison every similarity/clustering result built on it
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"dot_product dimension mismatch: ${a.numElements()} vs " +
          s"${b.numElements()}")
    val n = a.numElements()
    val la = elemType(left) == FloatType
    val rb = elemType(right) == FloatType
    var sum = 0.0
    var i = 0
    while (i < n) {
      val x = if (la) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rb) b.getFloat(i).toDouble else b.getDouble(i)
      sum += x * y
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    def get(v: String, i: String, t: DataType): String = t match {
      case FloatType => s"(double) $v.getFloat($i)"
      case _ => s"$v.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product dimension mismatch: " + $a.numElements() +
         |    " vs " + $b.numElements());
         |}
         |int $n = $a.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ${get(a, i, elemType(left))} * ${get(b, i, elemType(right))};
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Sequential-fold dot product, codegen'd. */
  def dot_product(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Squared L2 norm. */
  def norm2(a: Column): Column = dot_product(a, a)
}
