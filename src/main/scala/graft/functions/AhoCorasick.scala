package graft.functions

import scala.collection.mutable

/** Aho-Corasick multi-pattern substring automaton (Aho & Corasick,
  * CACM 1975): trie + BFS failure links + output links. One pass over
  * the text finds every occurrence of every pattern — the
  * decontamination scan's scale path: with P probe phrases the naive
  * plan multiplies the corpus ×P (explode + contains), while the
  * automaton is O(len(text) + matches) per row regardless of P.
  *
  * Built once per partition from the broadcast probe list (the trie is
  * O(Σ pattern lengths) memory — thousands of probes is a few MB) and
  * reused across the partition's rows; the class itself is
  * Serializable so it can also ride a closure directly.
  */
final class AhoCorasick(patterns: Array[String]) extends Serializable {

  // trie: per-node char→child transitions; patEnds = pattern indices
  // ending at the node (duplicates in `patterns` all get reported)
  private val next = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val patEnds = mutable.ArrayBuffer[List[Int]](Nil)
  private val fail = mutable.ArrayBuffer(0)
  // nearest fail-ancestor (inclusive) that ends a pattern, 0 = none:
  // match-time output collection follows only these links, so cost is
  // O(actual matches), not O(fail-chain length)
  private val outLink = mutable.ArrayBuffer(0)

  locally {
    var p = 0
    while (p < patterns.length) {
      val s = patterns(p)
      require(s.nonEmpty, s"empty probe at index $p")
      var v = 0
      var i = 0
      while (i < s.length) {
        v = next(v).getOrElseUpdate(s.charAt(i), {
          next += mutable.HashMap.empty[Char, Int]
          patEnds += Nil
          fail += 0
          outLink += 0
          next.size - 1
        })
        i += 1
      }
      patEnds(v) = p :: patEnds(v)
      p += 1
    }
    // BFS failure links
    val queue = mutable.Queue.empty[Int]
    next(0).valuesIterator.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      outLink(v) =
        if (patEnds(v).nonEmpty) v
        else outLink(fail(v))
      next(v).foreach { case (ch, c) =>
        var f = fail(v)
        while (f != 0 && !next(f).contains(ch)) f = fail(f)
        fail(c) = next(f).get(ch).filter(_ != c).getOrElse(0)
        queue += c
      }
    }
  }

  /** Distinct indices (into the constructor's `patterns`) of every
    * pattern occurring in `text`, ascending. */
  def findDistinct(text: String): Array[Int] = {
    var found: mutable.BitSet = null
    var v = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (v != 0 && !next(v).contains(ch)) v = fail(v)
      v = next(v).getOrElse(ch, 0)
      var o = outLink(v)
      while (o != 0) {
        if (found == null) found = mutable.BitSet.empty
        patEnds(o).foreach(found += _)
        o = outLink(fail(o))
      }
      i += 1
    }
    if (found == null) Array.emptyIntArray else found.toArray
  }

  /** Number of automaton states (spec/diagnostics). */
  def size: Int = next.size
}
