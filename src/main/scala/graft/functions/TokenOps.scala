package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sorted-distinct 64-bit hashes of the word-n-gram shingles of a
  * token array — the string-free twin of [[WordShingles]] for
  * consumers that only ever SHUFFLE or COUNT shingles (the Jaccard
  * posting-list pipeline): `word_shingles` materializes a ~30-byte
  * UTF8String per window (concat allocation + a string hash-set) only
  * for the very next operator to xxhash64 it back down to 8 bytes.
  * Here each token is xxhash64'd once and windows combine token hashes
  * with a multiply-mix — O(tokens) hashing instead of O(windows ×
  * window bytes) — then sort+dedupe on a primitive long array (no
  * boxing). Jaccard over the hashes equals Jaccard over the strings
  * modulo 64-bit collisions (P ≈ D²/2⁶⁵ — the same exactness budget
  * the minhash seeds ride).
  *
  * The mix is order-sensitive (h = h·P ⊕ tokenHash per position), so
  * "a b c" and "c b a" stay distinct; it is NOT xxhash64 of the
  * concatenated string — any injective-modulo-collision 64-bit code
  * works, since every consumer is hash-domain-only.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"shingle width must be >= 1, got $n")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes needs array<string>, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val tk = input.asInstanceOf[ArrayData]
    val cnt = tk.numElements()
    val m = cnt - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    // hash every token once. A null token hashes like the empty
    // string — the same null→"" mapping WordShingles uses, preserving
    // the string/hash Jaccard parity contract on arrays containing
    // nulls (r5 review fix: a bare 0L here diverged from the twin)
    val empty = org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
    val emptyHash = XXH64.hashUnsafeBytes(
      empty.getBaseObject, empty.getBaseOffset, empty.numBytes, 42L)
    val th = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      val t = tk.getUTF8String(i)
      th(i) =
        if (t == null) emptyHash
        else XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
          t.numBytes, 42L)
      i += 1
    }
    // order-sensitive window mix
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = -7046029254386353131L // xxh64 prime_1 as seed
      var j = 0
      while (j < n) {
        h = h * -4417276706812531889L ^ th(i + j) // prime_2 multiply-mix
        j += 1
      }
      out(i) = h
      i += 1
    }
    // sort + dedupe in place (order is immaterial downstream: every
    // consumer explodes into an aggregation)
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == m) out else java.util.Arrays.copyOf(out, w))
  }

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

/** Per-row windowHash→count map of the POSITIONAL word-n-gram windows
  * of a token array — the non-distinct twin of [[ShingleHashes]] for
  * span-level duplicate detection (every window position counts, so a
  * window repeated inside one document keeps its multiplicity). The
  * within-document collapse happens map-side, like [[WordCounts]]:
  * the first exchange a substring-dedup pipeline pays is already
  * per-(doc, window) counts, one row per DISTINCT window per doc.
  * Token and window hashing are identical to [[ShingleHashes]] (same
  * order-sensitive multiply-mix, same null→"" mapping), so count
  * parity with string windows holds modulo 64-bit collisions.
  */
case class WindowHashCounts(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    MapType(LongType, IntegerType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"window width must be >= 1, got $n")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"window_hash_counts needs array<string>, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val tk = input.asInstanceOf[ArrayData]
    val cnt = tk.numElements()
    val m = cnt - n + 1
    if (m <= 0) return ArrayBasedMapData(Array.empty[Any], Array.empty[Any])
    val empty = org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
    val emptyHash = XXH64.hashUnsafeBytes(
      empty.getBaseObject, empty.getBaseOffset, empty.numBytes, 42L)
    val th = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      val t = tk.getUTF8String(i)
      th(i) =
        if (t == null) emptyHash
        else XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
          t.numBytes, 42L)
      i += 1
    }
    val counts = new java.util.LinkedHashMap[java.lang.Long, Integer](m * 2)
    val one = Integer.valueOf(1)
    i = 0
    while (i < m) {
      var h = -7046029254386353131L // same mix as ShingleHashes
      var j = 0
      while (j < n) {
        h = h * -4417276706812531889L ^ th(i + j)
        j += 1
      }
      counts.merge(java.lang.Long.valueOf(h), one, WordCounts.SumInts)
      i += 1
    }
    val keys = new Array[Any](counts.size)
    val vals = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = e.getKey.longValue()
      vals(k) = e.getValue
      k += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override protected def withNewChildInternal(c: Expression): WindowHashCounts =
    copy(child = c)
}

/** Per-row word→count map of a token array: the map-side collapse of
  * `explode(tokens)` + `groupBy(doc, word)`. A document's term counts
  * are a ROW-LOCAL fact; aggregating them through a cluster-wide
  * (doc, word) exchange ships one row per token occurrence — this
  * expression collapses each document in place, so the first exchange
  * a TF-IDF-shape pipeline pays is already per-(source, word) partial
  * counts. First-occurrence key order (LinkedHashMap), deterministic.
  */
case class WordCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    MapType(StringType, IntegerType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_counts needs array<string>, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val tk = input.asInstanceOf[ArrayData]
    val cnt = tk.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, Integer](cnt * 2)
    val one = Integer.valueOf(1)
    var i = 0
    while (i < cnt) {
      val t0 = tk.getUTF8String(i)
      val t = if (t0 == null) UTF8String.EMPTY_UTF8 else t0
      // single hash probe per token (this loop runs once per token of
      // every document in the corpus-wide scan)
      m.merge(t, one, WordCounts.SumInts)
      i += 1
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = e.getKey
      vals(k) = e.getValue
      k += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override protected def withNewChildInternal(c: Expression): WordCounts =
    copy(child = c)
}

object WordCounts {
  // shared BiFunction instance: no per-row allocation in the hot loop
  private[functions] val SumInts:
      java.util.function.BiFunction[Integer, Integer, Integer] =
    (a, b) => Integer.valueOf(a.intValue() + b.intValue())
}

object TokenOps {
  /** Sorted-distinct hashed word-n-gram shingles: array<long>. */
  def shingle_hashes(tokens: Column, n: Int = 3): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(tokens), n))

  /** Per-row word→count map: map<string,int>. */
  def word_counts(tokens: Column): Column =
    GraftBridge.column(WordCounts(GraftBridge.expression(tokens)))

  /** Per-row positional window-hash→count map: map<long,int>. */
  def window_hash_counts(tokens: Column, n: Int): Column =
    GraftBridge.column(WindowHashCounts(GraftBridge.expression(tokens), n))
}
