package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Fused signed-random-projection sign bits: bit b of the result is
  * set iff `dot(embedding, planes(b)) > 0`.
  *
  * The unfused form — one `dot_product` column per plane — traverses
  * the embedding array once PER PLANE per row (32 planes × dim element
  * reads, 32 null checks, 32 loop setups). This expression makes ONE
  * traversal with a per-plane accumulator array (element-outer loop:
  * each embedding value is read once and broadcast across the plane
  * accumulators, cache-friendly on the fixed plane matrix), then packs
  * the signs into a single long — so the banding stage is one column
  * of long bit-ops instead of 32 fold columns. Accumulation per plane
  * is in ascending index order, bit-identical to the sequential
  * `dot_product` fold it replaces.
  *
  * `planes` is bound at plan time (already sliced to the embedding
  * dim) and ships to executors as a codegen reference object — not as
  * 32 array literals copied per row.
  */
case class SrpBits(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 64,
    s"srp_bits packs into one long: need 1..64 planes, got ${planes.length}")

  override def dataType: DataType = LongType

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(t, _) if t == FloatType || t == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"srp_bits needs array<float|double> input, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val nb = planes.length
    val acc = new Array[Double](nb)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
      var b = 0
      while (b < nb) {
        if (i < planes(b).length) acc(b) += x * planes(b)(i)
        b += 1
      }
      i += 1
    }
    var bits = 0L
    var b = 0
    while (b < nb) {
      if (acc(b) > 0.0) bits |= 1L << b
      b += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("srpPlanes", planes, "double[][]")
    val nb = planes.length
    val acc = ctx.addMutableState("double[]", "srpAcc",
      v => s"$v = new double[$nb];")
    val get =
      if (elemIsFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val bits = ctx.freshName("bits")
      s"""
         |java.util.Arrays.fill($acc, 0.0);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${get(a, i)};
         |  for (int $b = 0; $b < $nb; $b++) {
         |    if ($i < $planesRef[$b].length) {
         |      $acc[$b] += $x * $planesRef[$b][$i];
         |    }
         |  }
         |}
         |long $bits = 0L;
         |for (int $b = 0; $b < $nb; $b++) {
         |  if ($acc[$b] > 0.0) $bits |= 1L << $b;
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBits =
    copy(child = newChild)
}

object SrpBits {
  /** Packed SRP sign bits (bit b = sign of projection onto plane b). */
  def srp_bits(embedding: Column, planes: Array[Array[Double]]): Column =
    GraftBridge.column(SrpBits(GraftBridge.expression(embedding), planes))
}
