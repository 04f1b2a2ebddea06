package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions.col

/** Count-min sketch: a depth x width counter matrix estimating the
  * frequency of any item in one pass (Cormode & Muthukrishnan '05).
  * est(x) = min over rows j of counter(j, h_j(x)); always >= the true
  * count, over by at most n/width per row with high probability.
  *
  * The complement to operators.HeavyHitters: Misra-Gries answers
  * "which items are frequent" with an order-DEPENDENT summary whose
  * only deterministic surface is the error bound; the CMS answers
  * "how often does item x occur" with counters that are plain SUMS —
  * commutative and associative — so the merged sketch, and therefore
  * every estimate, is BIT-IDENTICAL regardless of partitioning, merge
  * order, or engine. That makes the estimate itself oracle-checkable
  * (q63's DuckDB twin rebuilds the very same counters in SQL), the
  * strongest check any sketch in the repo can carry.
  *
  * The 100 TB role: point-frequency lookups without the full-key-
  * domain shuffle of the term-stats artifact — depth*width longs per
  * partition, merged by elementwise sum (treeAggregate, driver
  * receives one array per tree level, never per partition at high
  * fan-in). Mergeable across days/shards by the same elementwise sum.
  *
  * Hashing: row j hashes item w to the first 3 hex digits of
  * md5("j:w") — 12 independent-enough bits per row, and exactly
  * reproducible in any engine with an md5() (the simhash/q42 hex
  * trick). Width is fixed at 4096 (= 16^3) so the bucket IS the
  * 3-digit value: no modulo, no bias, one less thing for a twin
  * implementation to get subtly wrong.
  */
object CountMin {

  val Width = 4096 // 16^3: bucket = value of the first 3 md5 hex digits

  // one digest instance per executor thread: bucket() runs
  // depth-times per token over the whole corpus, so no per-call
  // getInstance/boxing/hex-string work in the hot loop
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Bucket of item `w` in sketch row `j`: the value of the first 3
    * hex digits of md5("j:w") — i.e. the digest's first 12 bits —
    * in [0, 4096). Computed from the raw digest bytes; equality with
    * the hex-string formulation (the q63 DuckDB twin) is pinned in
    * CountMinSpec. */
  private[graft] def bucket(j: Int, w: String): Int = {
    val d = md.get().digest(s"$j:$w".getBytes("UTF-8"))
    ((d(0) & 0xff) << 4) | ((d(1) & 0xff) >>> 4)
  }

  /** One pass over `df`'s `column` (strings, nulls dropped): the
    * merged depth x Width counter matrix, flattened row-major
    * (row j, bucket b at index j*Width + b), plus the item count n.
    * Deterministic: counters are sums, so any partitioning and any
    * merge order produce the identical array. */
  def sketch(df: DataFrame, column: String, depth: Int)
      : (Array[Long], Long) = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    val d = depth
    df.select(col(column)).na.drop()
      .as(Encoders.STRING).rdd
      .treeAggregate((new Array[Long](d * Width), 0L))(
        seqOp = { case ((m, n), w) =>
          var j = 0
          while (j < d) { m(j * Width + bucket(j, w)) += 1; j += 1 }
          (m, n + 1)
        },
        combOp = { case ((a, na), (b, nb)) =>
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          (a, na + nb)
        })
  }

  /** Point estimate for `w` from a flattened sketch: the min counter
    * across rows. Never below the true count. */
  def estimate(m: Array[Long], depth: Int, w: String): Long = {
    var best = Long.MaxValue
    var j = 0
    while (j < depth) {
      val c = m(j * Width + bucket(j, w))
      if (c < best) best = c
      j += 1
    }
    best
  }

  /** Merge two flattened sketches of the same depth (elementwise sum)
    * — the cross-shard/cross-day rollup. */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length,
      s"sketch shapes differ: ${a.length} vs ${b.length}")
    val out = new Array[Long](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
    out
  }
}
