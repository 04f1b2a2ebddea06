package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct sketch — Bar-Yossef et al.,
  * "Counting distinct elements in a data stream" (RANDOM 2002); the
  * θ-sketch family's simplest member. The sketch of a column is the k
  * SMALLEST DISTINCT hash values; it estimates the distinct count as
  * (k−1)·H / h_(k) (H = hash-space size) and — unlike HLL — supports
  * SET ALGEBRA: the k smallest of A∪B are all contained in
  * kmv(A) ∪ kmv(B), so union sketches compose from per-side sketches
  * and intersection cardinality estimates follow by inclusion
  * counting (the q107/q108 queries).
  *
  * The buffer is a sorted distinct Vector capped at k: a true
  * bounded-size commutative monoid, so Spark's map-side partial
  * aggregation keeps the per-task state at k longs regardless of
  * input size — the 100 TB shape (contrast an exact distinct, which
  * shuffles every distinct value). Hashes here are the house 60-bit
  * md5 integers (exactly mirrorable in SQL), so the sketch content is
  * deterministic and engine-independent: every derived statistic is
  * an exact integer both engines agree on.
  */
object Kmv {

  /** Sorted-ascending distinct hash buffer, size ≤ k. */
  final case class KmvBuf(hs: Seq[Long])

  /** Insert one hash into a sorted distinct capped buffer. */
  private[functions] def insert(hs: Seq[Long], h: Long, k: Int)
      : Seq[Long] = {
    if (hs.length == k && h >= hs.last) hs
    else {
      val i = hs.search(h)(Ordering.Long) match {
        case scala.collection.Searching.Found(_) => -1 // already present
        case scala.collection.Searching.InsertionPoint(p) => p
      }
      if (i < 0) hs
      else {
        val grown = (hs.take(i) :+ h) ++ hs.drop(i)
        if (grown.length > k) grown.take(k) else grown
      }
    }
  }

  /** Merge two sorted distinct capped buffers. */
  private[functions] def union(a: Seq[Long], b: Seq[Long], k: Int)
      : Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0; var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (out.isEmpty || out.last != v) out += v
    }
    out.toSeq
  }

  /** The Aggregator: k smallest distinct hashes of a LongType column.
    * Use via `udaf(Kmv.sketch(k))`. */
  def sketch(k: Int): Aggregator[Long, KmvBuf, KmvBuf] =
    new Aggregator[Long, KmvBuf, KmvBuf] {
      def zero: KmvBuf = KmvBuf(Vector.empty)
      def reduce(b: KmvBuf, h: Long): KmvBuf = KmvBuf(insert(b.hs, h, k))
      def merge(a: KmvBuf, b: KmvBuf): KmvBuf = KmvBuf(union(a.hs, b.hs, k))
      def finish(r: KmvBuf): KmvBuf = r
      def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
      def outputEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    }
}
