package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.CountMin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The incrementally-merged CMS equals the one-shot sketch of the
  * whole prefix EXACTLY after every batch (sum-merge is lossless —
  * stronger than the MG twin's bound), and replays are no-ops.
  */
object CountMinStreamSpec {
  case class Tok(w: String)
}

class CountMinStreamSpec extends SparkSpec {
  import CountMinStreamSpec.Tok

  private val Depth = 4

  private def wholePrefix(seen: Seq[String]): Array[Long] = {
    val m = new Array[Long](Depth * CountMin.Width)
    for (w <- seen; j <- 0 until Depth)
      m(j * CountMin.Width + CountMin.bucket(j, w)) += 1
    m
  }

  test("streamed sketch is bit-identical to the one-shot sketch of " +
    "the whole prefix after every append") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batches = Seq(
      Seq.fill(60)("h0") ++ (1 to 40).map(i => s"a$i"),
      Seq.fill(50)("h1") ++ (1 to 60).map(i => s"b$i"),
      Seq.fill(40)("h0") ++ (1 to 50).map(i => s"c$i"))
    val out = Files.createTempDirectory("cmsstream").toString
    val mem = MemoryStream[Tok]
    val q = CountMinStream.sketchStream(mem.toDF(), "w", out, Depth)
      .option("checkpointLocation", s"$out/_ckpt").start()
    try {
      var seen = Seq.empty[String]
      for (b <- batches) {
        mem.addData(b.map(Tok): _*)
        q.processAllAvailable()
        seen = seen ++ b
        val (m, n) = CountMinStream.current(spark, out, Depth)
        assert(n == seen.size.toLong, s"n $n != ${seen.size}")
        assert(m.sameElements(wholePrefix(seen)),
          s"streamed sketch diverged after ${seen.size} items")
        // and estimates dominate whole-prefix truth
        val truth = seen.groupBy(identity).view
          .mapValues(_.size.toLong).toMap
        for ((w, c) <- truth)
          assert(CountMin.estimate(m, Depth, w) >= c)
      }
    } finally q.stop()
  }

  test("replayed batches are no-ops; depth mismatch fails loudly") {
    import spark.implicits._
    val out = Files.createTempDirectory("cmsstream2").toString
    val b0 = Seq.fill(10)("x") ++ Seq.fill(3)("y")
    val b1 = Seq.fill(5)("y") ++ Seq.fill(2)("z")
    CountMinStream.updateBatch(b0.toDF("w"), "w", out, 0L, Depth)
    CountMinStream.updateBatch(b1.toDF("w"), "w", out, 1L, Depth)
    // replay both (crash-recovery re-delivery)
    CountMinStream.updateBatch(b0.toDF("w"), "w", out, 0L, Depth)
    CountMinStream.updateBatch(b1.toDF("w"), "w", out, 1L, Depth)
    val (m, n) = CountMinStream.current(spark, out, Depth)
    assert(n == 20L, s"replay double-counted: n=$n")
    assert(CountMin.estimate(m, Depth, "x") >= 10L)
    assert(m.sameElements(wholePrefix(b0 ++ b1)))
    intercept[IllegalArgumentException] {
      CountMinStream.current(spark, out, Depth + 1)
    }
    intercept[IllegalStateException] {
      CountMinStream.current(spark,
        Files.createTempDirectory("cmsempty").toString, Depth)
    }
  }
}
