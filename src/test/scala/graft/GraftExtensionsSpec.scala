package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface reaches the custom expressions through
  * SparkSessionExtensions — pure `spark.sql` text, no Column API. The
  * spec builds its own session (extensions bind at session creation)
  * over the shared SparkContext, then restores the default session.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private def withExtSession[T](f: SparkSession => T): T = {
    val base = SparkSpec.session // ensure the shared context exists
    SparkSpec.session.synchronized {
      val prevDefault = SparkSession.getDefaultSession
      val prevActive = SparkSession.getActiveSession
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      try {
        // withExtensions (not the spark.sql.extensions static conf):
        // the shared SparkContext already exists, and static confs
        // only bind when the context is created
        val s = SparkSession.builder()
          .master("local[2]")
          .withExtensions(new GraftExtensions)
          .getOrCreate()
        f(s)
      } finally {
        prevDefault.fold(SparkSession.clearDefaultSession())(
          SparkSession.setDefaultSession)
        prevActive.fold(SparkSession.clearActiveSession())(
          SparkSession.setActiveSession)
      }
    }
  }

  test("dot_product / word_shingles / minhash_signature are callable " +
    "from SQL text") {
    withExtSession { s =>
      val dot = s.sql(
        "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head().getDouble(0)
      assert(dot == 11.0)

      val sh = s.sql(
        "SELECT word_shingles(array('a','b','c','d'), 3) AS sh")
        .head().getSeq[String](0)
      assert(sh == Seq("a b c", "b c d"))

      val mh = s.sql(
        "SELECT minhash_signature(array('x','y','z'), 16) AS mh")
        .head().getSeq[Long](0)
      assert(mh.size == 16)

      val wf = s.sql(
        "SELECT winnow_fingerprints('the quick brown fox jumps over', 8, 4)" +
          " AS fp").head().getSeq[Long](0)
      assert(wf.nonEmpty && wf == wf.sorted)
      assert(wf == graft.functions.WinnowFingerprints
        .compute("the quick brown fox jumps over", 8, 4).toSeq)

      val jw = s.sql(
        "SELECT jaro_winkler('martha', 'marhta') AS jw")
        .head().getDouble(0)
      assert(math.abs(jw - 0.9611111111111111) < 1e-15)

      val op = s.sql(
        "SELECT ordered_pairs(array(1L, 2L, 3L)) AS p")
        .head().getSeq[org.apache.spark.sql.Row](0)
      assert(op.map(r => (r.getLong(0), r.getLong(1))) ==
        Seq((1L, 2L), (1L, 3L), (2L, 3L)))

      val tk = s.sql(
        "SELECT g, top_k_by(s, id, 2) AS top FROM VALUES " +
          "('a', 1.0D, 1L), ('a', 3.0D, 2L), ('a', 2.0D, 3L), " +
          "('b', 9.0D, 4L) AS t(g, s, id) GROUP BY g ORDER BY g")
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(tk("a") == Seq(2L, 3L) && tk("b") == Seq(4L))

      // SQL and Column API produce identical results
      import s.implicits._
      val viaCol = Seq(Tuple1(Seq("a", "b", "c", "d"))).toDF("tk")
        .select(graft.functions.Shingles.word_shingles(
          org.apache.spark.sql.functions.col("tk"), 3))
        .head().getSeq[String](0)
      assert(viaCol == sh)
    }
  }

  test("word_counts / shingle_hashes / window_hash_counts are " +
    "callable from pure SQL and equal the Column API") {
    withExtSession { s =>
      import s.implicits._
      val toks = Seq("a", "b", "a", "c", "a", "b")
      // word_counts: multiset of (word, count)
      val viaSqlWc = s.sql(
        "SELECT word_counts(array('a','b','a','c','a','b')) AS m")
        .head().getMap[String, Int](0)
      val viaColWc = Seq(Tuple1(toks)).toDF("tk")
        .select(graft.functions.TokenOps.word_counts(
          org.apache.spark.sql.functions.col("tk")))
        .head().getMap[String, Int](0)
      assert(viaSqlWc == viaColWc)
      assert(viaSqlWc("a") == 3 && viaSqlWc("b") == 2)
      // shingle_hashes
      val viaSqlSh = s.sql(
        "SELECT shingle_hashes(array('a','b','a','c'), 2) AS h")
        .head().getSeq[Long](0)
      val viaColSh = Seq(Tuple1(Seq("a", "b", "a", "c"))).toDF("tk")
        .select(graft.functions.TokenOps.shingle_hashes(
          org.apache.spark.sql.functions.col("tk"), 2))
        .head().getSeq[Long](0)
      assert(viaSqlSh == viaColSh && viaSqlSh.nonEmpty)
      // window_hash_counts
      val viaSqlWh = s.sql(
        "SELECT window_hash_counts(array('a','b','a','c','a'), 3) AS m")
        .head().getMap[Long, Long](0)
      val viaColWh = Seq(Tuple1(Seq("a", "b", "a", "c", "a"))).toDF("tk")
        .select(graft.functions.TokenOps.window_hash_counts(
          org.apache.spark.sql.functions.col("tk"), 3))
        .head().getMap[Long, Long](0)
      assert(viaSqlWh == viaColWh && viaSqlWh.nonEmpty)
    }
  }

  test("bad arguments fail with a clear message") {
    withExtSession { s =>
      val e = intercept[Exception] {
        s.sql("SELECT minhash_signature(array('x'), 'not-a-literal')")
          .collect()
      }
      assert(e.getMessage.contains("integer literal") ||
        e.getMessage.contains("numHashes"))
    }
  }
}
