package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken:
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003 — the MOSS algorithm).
  *
  * Stage 1 — ROLLING HASH: polynomial hash of every `k`-char window,
  * h_i = Σ c_{i+j}·B^(k-1-j) mod M, computed in O(n) with the
  * Rabin-Karp rolling update (subtract the outgoing char's B^(k-1)
  * term, multiply by B, add the incoming char) — not O(n·k)
  * recomputation. B = 257, M = 2^31−1; characters are Unicode code
  * points (matching the oracle's ord()/substring() recomputation even
  * on supplementary-plane text; BMP-only strings take an
  * allocation-free charAt fast path).
  *
  * Stage 2 — WINNOWING: over each window of `w` consecutive hashes,
  * keep the minimum (single-pass monotonic-deque sliding minimum,
  * O(n)); the result is the sorted distinct selected values. The
  * paper's guarantee: any shared substring of length ≥ w+k−1 between
  * two documents yields at least one shared fingerprint, while within
  * any w consecutive positions at least one hash is kept — a
  * density-bounded, position-independent signature (pinned in
  * WinnowSpec).
  *
  * Per-row compute, no state across rows: embarrassingly parallel at
  * any scale. The generated code delegates the loop to this object's
  * compiled method — whole-stage codegen stays intact (no
  * CodegenFallback interpretation of the surrounding tree).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // parameter guards live here, not in a constructor require: through
  // the SQL surface (GraftExtensions) a bad k/w should surface as an
  // AnalysisException at resolution, like MinHashSignature's numHashes
  // guard (ADVICE r1 convention)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (k < 2 || w < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints needs k >= 2 and w >= 1, got k=$k w=$w")
    else child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fingerprints needs a string input, got $t")
    }

  override def nullSafeEval(input: Any): Any = eval0(input)

  /** Invoked from both the interpreted path and the generated code. */
  def eval0(input: Any): ArrayData =
    new GenericArrayData(
      WinnowFingerprints.compute(input.asInstanceOf[UTF8String].toString, k, w))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("winnow", this,
      classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $self.eval0($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)
}

object WinnowFingerprints {
  val Mod: Long = 2147483647L // 2^31 − 1 (Mersenne prime)
  val Base: Long = 257L

  /** Sorted distinct winnowed fingerprints of `s` (k-gram hashes,
    * winnow window w). Empty when the text has fewer than w full
    * k-windows — winnowing needs at least one full hash window.
    *
    * Windows are over Unicode CODE POINTS, not UTF-16 code units, so
    * supplementary (non-BMP) characters count as one position and hash
    * as their full code-point value — matching the DuckDB oracle's
    * ord()/substring() semantics instead of silently diverging on
    * astral text. For BMP-only strings (the common case) the cheap
    * charAt path is taken with zero extra allocation.
    */
  def compute(s: String, k: Int, w: Int): Array[Long] = {
    val cps: Array[Int] =
      if (s.length == s.codePointCount(0, s.length)) null // BMP fast path
      else s.codePoints().toArray
    val n = if (cps == null) s.length else cps.length
    @inline def cp(i: Int): Long =
      (if (cps == null) s.charAt(i).toInt else cps(i)).toLong
    val nh = n - k + 1
    if (nh < w) return Array.emptyLongArray
    // B^(k-1) mod M for the rolling subtraction
    var bk = 1L
    var j = 1
    while (j < k) { bk = bk * Base % Mod; j += 1 }
    // all window hashes via the rolling update
    val h = new Array[Long](nh)
    var cur = 0L
    var i = 0
    while (i < k) { cur = (cur * Base + cp(i)) % Mod; i += 1 }
    h(0) = cur
    i = 1
    while (i < nh) {
      val out = cp(i - 1) * bk % Mod
      cur = ((cur - out + Mod) % Mod * Base + cp(i + k - 1)) % Mod
      h(i) = cur
      i += 1
    }
    // sliding minimum over windows of w hashes (monotonic deque)
    val sel = scala.collection.mutable.SortedSet.empty[Long]
    val dq = new java.util.ArrayDeque[Int]()
    var p = 0
    while (p < nh) {
      while (!dq.isEmpty && h(dq.peekLast()) >= h(p)) dq.pollLast()
      dq.addLast(p)
      if (dq.peekFirst() <= p - w) dq.pollFirst()
      if (p >= w - 1) sel += h(dq.peekFirst())
      p += 1
    }
    sel.toArray
  }

  /** Winnowed k-gram fingerprints of a text column (k=8, w=16 default:
    * 8-char shingles, guarantee threshold w+k−1 = 23 chars). */
  def winnow_fingerprints(text: Column, k: Int = 8, w: Int = 16): Column =
    GraftBridge.column(WinnowFingerprints(GraftBridge.expression(text), k, w))
}
