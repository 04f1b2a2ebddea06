package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotProduct, MinHashSignature, WinnowFingerprints, WordShingles}

/** Session extension (SURVEY §7.3 mechanism c): registers the engine's
  * custom Catalyst expressions as SQL functions, so the pure-SQL
  * surface (`spark.sql`, thrift, notebooks) reaches them without the
  * Scala Column API. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  *
  * Registered: `dot_product(a, b)`, `minhash_signature(shingles, k)`,
  * `word_shingles(tokens, n)`, `winnow_fingerprints(text, k, w)`,
  * `jaro_winkler(a, b)`, `ordered_pairs(xs)`, `top_k_by(score,
  * payload, k)`, `word_counts(tokens)`, `shingle_hashes(tokens, n)`,
  * `window_hash_counts(tokens, n)` — the numeric arguments must be
  * integer literals (they parameterize the expression, not the
  * row).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "dot_product(a, b) takes 2 arguments")
        DotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName,
        "minhash_signature"),
      (args: Seq[Expression]) => {
        require(args.size == 2,
          "minhash_signature(shingles, numHashes) takes 2 arguments")
        MinHashSignature(args(0), intLit(args(1), "numHashes"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        require(args.size == 2,
          "word_shingles(tokens, n) takes 2 arguments")
        WordShingles(args(0), intLit(args(1), "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName,
        "winnow_fingerprints"),
      (args: Seq[Expression]) => {
        require(args.size == 3,
          "winnow_fingerprints(text, k, w) takes 3 arguments")
        WinnowFingerprints(args(0), intLit(args(1), "k"),
          intLit(args(2), "w"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("top_k_by"),
      new ExpressionInfo(classOf[graft.functions.TopKByScore].getName,
        "top_k_by"),
      (args: Seq[Expression]) => {
        require(args.size == 3,
          "top_k_by(score, payload, k) takes 3 arguments")
        graft.functions.TopKByScore(args(0), args(1),
          intLit(args(2), "k")).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("ordered_pairs"),
      new ExpressionInfo(classOf[graft.functions.OrderedPairs].getName,
        "ordered_pairs"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "ordered_pairs(xs) takes 1 argument")
        graft.functions.OrderedPairs(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[graft.functions.JaroWinklerSim].getName,
        "jaro_winkler"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "jaro_winkler(a, b) takes 2 arguments")
        graft.functions.JaroWinklerSim(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_counts"),
      new ExpressionInfo(classOf[graft.functions.WordCounts].getName,
        "word_counts"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "word_counts(tokens) takes 1 argument")
        graft.functions.WordCounts(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[graft.functions.ShingleHashes].getName,
        "shingle_hashes"),
      (args: Seq[Expression]) => {
        require(args.size == 2,
          "shingle_hashes(tokens, n) takes 2 arguments")
        graft.functions.ShingleHashes(args(0), intLit(args(1), "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("window_hash_counts"),
      new ExpressionInfo(classOf[graft.functions.WindowHashCounts].getName,
        "window_hash_counts"),
      (args: Seq[Expression]) => {
        require(args.size == 2,
          "window_hash_counts(tokens, n) takes 2 arguments")
        graft.functions.WindowHashCounts(args(0), intLit(args(1), "n"))
      }))
    // NOT registered, by design: SrpBits (parameterized by a
    // hyperplane matrix — not a SQL literal) and BloomMightContain
    // (parameterized by a built filter's bytes) — both are
    // artifact-parameterized expressions a SQL caller cannot
    // construct meaningfully; the Column API builds them from their
    // artifacts.
  }
}
