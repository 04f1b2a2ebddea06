package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass MinHash signature over a string array.
  *
  * Each element is XXH64-hashed once; the `numHashes` permutations are
  * derived with universal hashing (`a_j * h + b_j` over fixed odd
  * multipliers), so a row costs |shingles| string hashes + 64·|shingles|
  * multiply-adds in a primitive loop. The interpreted-HOF equivalent
  * (`transform(sequence(0,63), j -> array_min(transform(sh, x ->
  * xxhash64(x, j))))`) re-hashes every string 64 times through
  * per-element lambda dispatch — ~10x slower. Deterministic across
  * runs and partitionings (pure function of the array contents).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // analysis-time guards (ADVICE r1): demand array<string> input and a
  // hash count within the fixed coefficient tables, instead of a
  // ClassCastException / ArrayIndexOutOfBoundsException at eval time
  override def checkInputDataTypes(): TypeCheckResult =
    if (numHashes < 1 || numHashes > MinHashSignature.MaxHashes)
      TypeCheckResult.TypeCheckFailure(
        s"numHashes must be in [1, ${MinHashSignature.MaxHashes}], got $numHashes")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_signature needs array<string>, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val a = MinHashSignature.A
    val b = MinHashSignature.B
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { // null shingles contribute nothing
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        var j = 0
        while (j < numHashes) {
          val v = a(j) * h + b(j)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

object MinHashSignature {
  private[functions] val MaxHashes = 256
  // fixed universal-hash parameters (odd multipliers), seeded rng
  private[functions] val (a0, b0) = {
    val rng = new java.util.Random(0x5eed5eedL)
    val a = Array.fill(MaxHashes)(rng.nextLong() | 1L)
    val b = Array.fill(MaxHashes)(rng.nextLong())
    (a, b)
  }
  private val A = a0
  private val B = b0
}

object MinHash {
  /** MinHash signature column: array<bigint> of length `numHashes`. */
  def minhash_signature(shingles: Column, numHashes: Int = 64): Column =
    GraftBridge.column(MinHashSignature(
      GraftBridge.expression(shingles), numHashes))
}
