package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions.col
import scala.collection.mutable

/** Misra-Gries heavy-hitters summary: at most `k` counters over a
  * stream of items, mergeable across partitions, with the classic
  * deterministic guarantee for the merged result (Agarwal et al.,
  * "Mergeable Summaries", PODS'12):
  *
  *   c(x) - n/(k+1)  <=  est(x)  <=  c(x)
  *
  * for every item x (est(x) = 0 when absent), where n is the TOTAL
  * number of items — regardless of partition count, partitioning, or
  * merge order. Any item with true frequency above n/(k+1) is
  * guaranteed present.
  *
  * The 100 TB role: exact top-k term counting shuffles the full
  * (item, count) key domain (the term-stats artifact's cost); the MG
  * sketch finds the heavy tail-free items in ONE pass with k counters
  * per partition and k·partitions bytes of driver merge — the
  * frequent-items complement to the HLL/KLL sketches behind
  * q26/q52. The estimates are order-dependent (not bit-reproducible),
  * but the BOUND above is deterministic — queries assert the bound,
  * never the raw estimate, the same tolerance-oracle discipline as
  * the other sketch operators.
  */
object HeavyHitters {

  /** One MG summary: value → counter, size bounded by k. */
  type Summary = mutable.HashMap[String, Long]

  private[graft] def add(m: Summary, w: String, k: Int): Summary = {
    m.get(w) match {
      case Some(c) => m.update(w, c + 1)
      case None if m.size < k => m.update(w, 1L)
      case None =>
        // decrement-all: k+1 distinct items each give up one count
        val dead = mutable.ArrayBuffer.empty[String]
        for ((key, c) <- m) {
          if (c == 1L) dead += key else m.update(key, c - 1)
        }
        m --= dead
    }
    m
  }

  /** Merge two summaries back under k counters: sum matching
    * counters, then subtract the (k+1)-th largest count from all and
    * drop non-positive ones (the mergeable-summaries offset step). */
  private[graft] def merge(a: Summary, b: Summary, k: Int): Summary = {
    for ((w, c) <- b) a.update(w, a.getOrElse(w, 0L) + c)
    if (a.size > k) {
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val offset = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      for ((w, c) <- a) {
        if (c - offset <= 0L) dead += w else a.update(w, c - offset)
      }
      a --= dead
    }
    a
  }

  /** One pass over `df`'s `column` (strings): the merged summary and
    * the total item count n. Error bound of every estimate:
    * ±n/(k+1) below the true count, never above. */
  def sketch(df: DataFrame, column: String, k: Int)
      : (Map[String, Long], Long) = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ((m, n)) = df.select(col(column)).na.drop()
      .as(Encoders.STRING).rdd
      .treeAggregate((new Summary, 0L))(
        seqOp = { case ((m, n), w) => (add(m, w, k), n + 1) },
        combOp = { case ((a, na), (b, nb)) => (merge(a, b, k), na + nb) })
    (m.toMap, n)
  }
}
