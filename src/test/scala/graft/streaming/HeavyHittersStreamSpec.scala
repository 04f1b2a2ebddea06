package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The incrementally-merged MG summary keeps the n/(k+1) bound
  * against whole-prefix truth after every batch, replays are no-ops,
  * and the summary is exact when the domain fits the counters.
  */
object HeavyHittersStreamSpec {
  case class Tok(w: String)
}

class HeavyHittersStreamSpec extends SparkSpec {
  import HeavyHittersStreamSpec.Tok

  private def check(summary: Map[String, Long], n: Long,
      seen: Seq[String], k: Int): Unit = {
    val truth = seen.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(n == seen.size.toLong, s"n_total $n != ${seen.size}")
    val bound = n.toDouble / (k + 1)
    for ((w, c) <- truth) {
      val e = summary.getOrElse(w, 0L)
      assert(e <= c && e >= c - bound,
        s"est($w)=$e outside [${c - bound}, $c] after ${seen.size}")
      if (c > bound)
        assert(summary.contains(w), s"heavy $w missing after ${seen.size}")
    }
  }

  test("streamed summary holds the MG bound against whole-prefix " +
    "truth after every append (tail-heavy batches, k=8)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val k = 8
    val batches = Seq(
      Seq.fill(60)("h0") ++ Seq.fill(25)("h1") ++
        (1 to 40).map(i => s"a$i"),
      Seq.fill(50)("h0") ++ (1 to 60).map(i => s"b$i"),
      Seq.fill(40)("h1") ++ Seq.fill(30)("h2") ++
        (1 to 50).map(i => s"c$i"))
    val out = Files.createTempDirectory("hhstream").toString
    val mem = MemoryStream[Tok]
    val q = HeavyHittersStream.summaryStream(mem.toDF(), "w", out, k)
      .option("checkpointLocation", s"$out/_ckpt").start()
    try {
      var seen = Seq.empty[String]
      for (b <- batches) {
        mem.addData(b.map(Tok): _*)
        q.processAllAvailable()
        seen = seen ++ b
        val (summary, n) = HeavyHittersStream.current(spark, out)
        check(summary, n, seen, k)
        assert(summary.size <= k)
      }
    } finally q.stop()
  }

  test("replayed batches are no-ops and the summary is exact when " +
    "the domain fits the counters") {
    import spark.implicits._
    val out = Files.createTempDirectory("hhstream2").toString
    val b0 = Seq.fill(10)("x") ++ Seq.fill(3)("y")
    val b1 = Seq.fill(5)("y") ++ Seq.fill(2)("z")
    HeavyHittersStream.updateBatch(b0.toDF("w"), "w", out, 0L, k = 16)
    HeavyHittersStream.updateBatch(b1.toDF("w"), "w", out, 1L, k = 16)
    // replay both (crash-recovery re-delivery)
    HeavyHittersStream.updateBatch(b0.toDF("w"), "w", out, 0L, k = 16)
    HeavyHittersStream.updateBatch(b1.toDF("w"), "w", out, 1L, k = 16)
    val (summary, n) = HeavyHittersStream.current(spark, out)
    assert(n == 20L, s"replay double-counted: n=$n")
    assert(summary == Map("x" -> 10L, "y" -> 8L, "z" -> 2L), summary)
  }
}
