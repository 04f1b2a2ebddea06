package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe over a serialized
  * `org.apache.spark.util.sketch.BloomFilter` (the public sketch
  * `DataFrame.stat.bloomFilter` builds): TRUE means "possibly in the
  * build set", FALSE means "definitely not" — no false negatives, so
  * `filter(might_contain(key))` before an exact join is a pure
  * shuffle reduction that never changes the join's result.
  *
  * The filter ships inside the expression (task binary, once per
  * stage, megabytes at most — the operator bounds the build side),
  * and each task deserializes it once (transient lazy).
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"might_contain needs an integral or string key, got ${other.sql}")
    }

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override protected def nullSafeEval(input: Any): Any = input match {
    case l: Long => bf.mightContainLong(l)
    case i: Int => bf.mightContainLong(i.toLong)
    case s: Short => bf.mightContainLong(s.toLong)
    case b: Byte => bf.mightContainLong(b.toLong)
    case u: org.apache.spark.unsafe.types.UTF8String =>
      bf.mightContainBinary(u.getBytes)
    case other => throw new IllegalStateException(
      s"unsupported bloom key: ${other.getClass}")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

object BloomOps {
  /** Membership probe column: boolean (null on null key). */
  def might_contain(key: Column, filterBytes: Array[Byte]): Column =
    GraftBridge.column(
      BloomMightContain(GraftBridge.expression(key), filterBytes))
}
