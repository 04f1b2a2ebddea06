package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Per-query job/stage/task census — the diagnostic behind the bench
  * floor: at local fixture scale each Spark stage costs a roughly
  * constant scheduling quantum, so a query's wall-clock is mostly
  * `stages × quantum` once inputs are cached. This main mirrors
  * graft.Bench's session (views registered, best-of-N) and prints one
  * line per query: best seconds, jobs, stages, tasks — so plan work
  * targets the queries whose stage count is out of proportion to
  * their semantics. Usage:
  *   SPARK_GRAFT_ONLY=q87,q82 tools/run.sh graft.tools.Profile [sfDir]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "-1").toInt
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      math.max(cpus.toInt / 4, 1).toString)
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.registerViews(spark, sfDir, StorageLevel.MEMORY_AND_DISK,
      parts = parts)

    val listener = new org.apache.spark.scheduler.SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val stages = new java.util.concurrent.atomic.AtomicInteger
      val tasks = new java.util.concurrent.atomic.AtomicInteger
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
      def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0) }
    }
    spark.sparkContext.addSparkListener(listener)

    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val ordered = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (k, _) => only.forall(_.contains(k)) }

    // warm round (artifact builds, codegen) — not measured
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }

    println(f"${"query"}%-28s ${"best_s"}%7s ${"jobs"}%5s ${"stages"}%6s " +
      f"${"tasks"}%6s")
    val rows = ordered.map { case (name, fn) =>
      var best = Double.MaxValue
      var meta = (0, 0, 0)
      (1 to rounds).foreach { _ =>
        // listener events post asynchronously; give the bus a beat to
        // drain the previous run before resetting (diagnostic tool —
        // a lost event skews a count by 1, not the ranking)
        Thread.sleep(120)
        listener.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(120)
        if (dt < best) {
          best = dt
          meta = (listener.jobs.get, listener.stages.get,
            listener.tasks.get)
        }
      }
      (name, best, meta)
    }
    rows.sortBy(-_._2).foreach { case (n, b, (j, s, t)) =>
      println(f"$n%-28s $b%7.3f $j%5d $s%6d $t%6d")
    }
    val (tb, tj, ts, tt) = rows.foldLeft((0.0, 0, 0, 0)) {
      case ((b, j, s, t), (_, b2, (j2, s2, t2))) =>
        (b + b2, j + j2, s + s2, t + t2)
    }
    println(f"TOTAL best=$tb%.2f s jobs=$tj stages=$ts tasks=$tt")
    spark.stop()
  }
}
