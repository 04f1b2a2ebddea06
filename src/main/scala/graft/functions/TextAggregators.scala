package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation (SURVEY.md §2.2 UDF/UDAF row): the
  * `Aggregator[IN, BUF, OUT]` path for stats Spark's built-ins don't
  * compose directly. Buffers are mergeable (map-side partial
  * aggregation works), so these scale like any hash aggregate.
  */
object TextAggregators {

  final case class VocabStats(docs: Long, tokens: Long, vocab: Set[String])
  final case class VocabOut(docs: Long, tokens: Long, vocabSize: Long,
      typeTokenRatio: Double)

  /** Vocabulary richness per group: distinct-token count and
    * type/token ratio over tokenized documents. The buffer carries the
    * distinct-token set (bounded by vocabulary, not corpus — fine for
    * natural-language token spaces; switch the set for an HLL sketch
    * when the domain is unbounded). */
  val vocabRichness: Aggregator[Seq[String], VocabStats, VocabOut] =
    new Aggregator[Seq[String], VocabStats, VocabOut] {
      def zero: VocabStats = VocabStats(0L, 0L, Set.empty)
      def reduce(b: VocabStats, tokens: Seq[String]): VocabStats =
        VocabStats(b.docs + 1, b.tokens + tokens.size, b.vocab ++ tokens)
      def merge(a: VocabStats, b: VocabStats): VocabStats =
        VocabStats(a.docs + b.docs, a.tokens + b.tokens, a.vocab ++ b.vocab)
      def finish(r: VocabStats): VocabOut =
        VocabOut(r.docs, r.tokens, r.vocab.size.toLong,
          if (r.tokens == 0) 0.0 else r.vocab.size.toDouble / r.tokens)
      def bufferEncoder: Encoder[VocabStats] = Encoders.product[VocabStats]
      def outputEncoder: Encoder[VocabOut] = Encoders.product[VocabOut]
    }
}
