package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.CountMin
import org.apache.hadoop.fs.Path

/** SOAK pin for the versioned-state maintainers: across MANY batches
  * the on-disk footprint must stay BOUNDED — prune after every commit
  * leaves at most the just-committed version plus the one it read
  * (the crash-window pair), for every store, at every step. Without
  * this discipline a long-lived maintainer leaks one parquet
  * directory per trigger: at 100 TB / minutes-cadence triggers that
  * is thousands of small-file versions per day on the state volume —
  * exactly the unbounded-small-files failure the per-batch parity
  * specs cannot see because they never look at the directory.
  */
class StateSoakSpec extends SparkSpec {

  private val Batches = 16

  private def versionDirs(dir: String, store: String): Seq[String] = {
    val p = new Path(s"$dir/$store")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("state_v"))
  }

  test("count-min maintainer: 16 batches leave <= 2 versions per " +
    "store on disk at every step, and the final sketch is exact") {
    import spark.implicits._
    val out = Files.createTempDirectory("cmssoak").toString
    val depth = 4
    var seen = Seq.empty[String]
    for (b <- 0 until Batches) {
      val words = (0 until 30).map(i => s"w${(b * 7 + i) % 40}")
      CountMinStream.updateBatch(
        words.toDF("w"), "w", out, b.toLong, depth)
      seen = seen ++ words
      for (store <- Seq("sketch", "meta")) {
        val dirs = versionDirs(out, store)
        // committed current + the version it read; an uncommitted
        // crash leftover would add one more — steady state must not
        assert(dirs.size <= 2,
          s"batch $b: $store holds ${dirs.size} versions " +
            s"(${dirs.sorted.mkString(", ")}) — prune is leaking")
      }
      // prune keeps the version this batch READ (crash insurance):
      // both the new commit and its read-version stay listed
      val committed = VersionedState.committed(spark, out, "meta")
      assert(committed.contains(b.toLong))
    }
    val (m, n) = CountMinStream.current(spark, out, depth)
    assert(n == seen.size.toLong)
    val truth = new Array[Long](depth * CountMin.Width)
    for (w <- seen; j <- 0 until depth)
      truth(j * CountMin.Width + CountMin.bucket(j, w)) += 1
    assert(m.sameElements(truth),
      "soaked sketch diverged from the whole-prefix one-shot")
  }

  test("heavy-hitters maintainer: bounded versions across 16 batches " +
    "with a replay every 4th batch (replays must not defeat prune)") {
    import spark.implicits._
    val out = Files.createTempDirectory("hhsoak").toString
    for (b <- 0 until Batches) {
      val words = Seq.fill(20)(s"hot${b % 3}") ++
        (0 until 10).map(i => s"t$b-$i")
      HeavyHittersStream.updateBatch(
        words.toDF("w"), "w", out, b.toLong, k = 8)
      if (b % 4 == 3) // crash-recovery re-delivery of the same batch
        HeavyHittersStream.updateBatch(
          words.toDF("w"), "w", out, b.toLong, k = 8)
      for (store <- Seq("summary", "meta")) {
        val dirs = versionDirs(out, store)
        assert(dirs.size <= 2,
          s"batch $b: $store holds ${dirs.size} versions " +
            s"(${dirs.sorted.mkString(", ")}) — prune is leaking")
      }
    }
    // 16 batches x 20 occurrences each: the three hot rotating keys
    // dominate every deletion-free summary of this stream
    val (summary, n) = HeavyHittersStream.current(spark, out)
    assert(n == Batches.toLong * 30)
    for (h <- 0 until 3)
      assert(summary.contains(s"hot$h"),
        s"hot$h missing from the soaked summary: $summary")
  }

  test("histogram/PSI maintainer: bounded versions across 16 batches " +
    "with a replay every 4th batch; final PSI equals the one-shot") {
    import spark.implicits._
    import ProfileStreamSpec.Doc
    val out = Files.createTempDirectory("histsoak").toString
    var seen = Seq.empty[Doc]
    for (b <- 0 until Batches) {
      val batch = (0 until 25).map(i => Doc((b * 25 + i).toLong,
        "t", Some("en"), s"src${(b + i) % 5}", ((b * 25 + i) % 19) * 400L))
      HistStream.updateBatch(batch.toDF(), out, b.toLong)
      if (b % 4 == 3) // crash-recovery re-delivery of the same batch
        HistStream.updateBatch(batch.toDF(), out, b.toLong)
      seen = seen ++ batch
      for (store <- Seq("hist", "meta")) {
        val dirs = versionDirs(out, store)
        assert(dirs.size <= 2,
          s"batch $b: $store holds ${dirs.size} versions " +
            s"(${dirs.sorted.mkString(", ")}) — prune is leaking")
      }
    }
    val served = HistStream.currentPsi(spark, out).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val oneShot = graft.queries.Profiling.psiFor(seen.toDF()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(served == oneShot,
      "soaked PSI diverged from the whole-prefix one-shot")
  }

  test("quantile-histogram maintainer: bounded versions across 16 " +
    "batches with a replay every 4th batch; final witness quantiles " +
    "equal the one-shot") {
    import spark.implicits._
    import QuantileHistStreamSpec.Ev
    val out = Files.createTempDirectory("qhistsoak").toString
    var seen = Seq.empty[Ev]
    for (b <- 0 until Batches) {
      val batch = (0 until 25).map(i => Ev((b * 25 + i).toLong,
        s"t${(b + i) % 3}", (((b * 25 + i) * 37) % 500) / 100.0))
      QuantileHistStream.updateBatch(batch.toDF(), out, b.toLong)
      if (b % 4 == 3) // crash-recovery re-delivery of the same batch
        QuantileHistStream.updateBatch(batch.toDF(), out, b.toLong)
      seen = seen ++ batch
      for (store <- Seq("hist", "meta")) {
        val dirs = versionDirs(out, store)
        assert(dirs.size <= 2,
          s"batch $b: $store holds ${dirs.size} versions " +
            s"(${dirs.sorted.mkString(", ")}) — prune is leaking")
      }
    }
    val served = QuantileHistStream.currentMad(spark, out).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val oneShot = graft.queries.Stats.madOfCells(
      graft.queries.Stats.valueCells(seen.toDF())).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(served == oneShot,
      "soaked witness quantiles diverged from the whole-prefix one-shot")
  }

  test("shard-manifest maintainer: bounded versions across 16 batches " +
    "with a replay every 4th batch; final manifest equals the one-shot") {
    import spark.implicits._
    import ProfileStreamSpec.Doc
    val out = Files.createTempDirectory("shardsoak").toString
    var seen = Seq.empty[Doc]
    for (b <- 0 until Batches) {
      val batch = (0 until 25).map(i => Doc((b * 25 + i).toLong,
        s"w${i % 7} " * (1 + i % 4), Some("en"), s"src${(b + i) % 5}",
        ((b * 25 + i) % 19) * 400L))
      ShardManifestStream.updateBatch(batch.toDF(), out, b.toLong)
      if (b % 4 == 3) // re-delivery: a double-xor would CANCEL docs
        ShardManifestStream.updateBatch(batch.toDF(), out, b.toLong)
      seen = seen ++ batch
      for (store <- Seq("manifest", "meta")) {
        val dirs = versionDirs(out, store)
        assert(dirs.size <= 2,
          s"batch $b: $store holds ${dirs.size} versions " +
            s"(${dirs.sorted.mkString(", ")}) — prune is leaking")
      }
    }
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("shard") -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("fingerprint"))).toMap
    val served = key(ShardManifestStream.currentManifest(spark, out))
    val oneShot = key(graft.queries.Llm.shardStats(seen.toDF()))
    assert(served == oneShot,
      "soaked manifest diverged from the whole-prefix one-shot")
  }

  test("dedup-cluster maintainer: bounded versions across 16 batches " +
    "with a replay every 4th batch; final labeling equals the one-shot") {
    import spark.implicits._
    import DedupClusterStreamSpec.Pair
    val out = Files.createTempDirectory("clustersoak").toString
    var seen = Seq.empty[Pair]
    for (b <- 0 until Batches) {
      // chains that keep extending earlier clusters plus fresh pairs —
      // exercises both growth and steady relabeling
      val batch = (0 until 6).map(i =>
        Pair((b * 3 + i * 5) % 50, (b * 3 + i * 5) % 50 + 100 + b % 4))
      DedupClusterStream.updateBatch(batch.toDF(), out, b.toLong)
      if (b % 4 == 3) // replay must be a no-op, not a re-merge
        DedupClusterStream.updateBatch(batch.toDF(), out, b.toLong)
      seen = seen ++ batch
      for (store <- Seq("labels", "meta")) {
        val dirs = versionDirs(out, store)
        assert(dirs.size <= 2,
          s"batch $b: $store holds ${dirs.size} versions " +
            s"(${dirs.sorted.mkString(", ")}) — prune is leaking")
      }
    }
    val served = DedupClusterStream.currentLabels(spark, out).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oneShot = graft.operators.ConnectedComponents
      .of(seen.toDF("a_id", "b_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(served == oneShot,
      "soaked labeling diverged from the whole-prefix one-shot")
  }

  test("ann-topk maintainer: bounded versions across 16 batches with " +
    "a replay every 4th batch; final shortlist equals the one-shot") {
    import spark.implicits._
    import AnnTopKStreamSpec.Vec
    val out = Files.createTempDirectory("anntopksoak").toString
    val all = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .collect()
      .map(r => Vec(r.getAs[Long]("vec_id"),
        r.getSeq[Float](r.fieldIndex("embedding"))))
      .toSeq
    AnnTopKStream.build(
      graft.Tables(spark, "/root/testdata/sf0.001", "embeddings"), out)
    val per = (all.size + Batches - 1) / Batches
    var seen = Seq.empty[Vec]
    for (b <- 0 until Batches) {
      val batch = all.slice(b * per, (b + 1) * per)
      AnnTopKStream.updateBatch(batch.toDF(), out, b.toLong)
      if (b % 4 == 3) // replay must be a no-op, not a re-merge
        AnnTopKStream.updateBatch(batch.toDF(), out, b.toLong)
      seen = seen ++ batch
      for (store <- Seq("topk", "meta")) {
        val dirs = versionDirs(out, store)
        assert(dirs.size <= 2,
          s"batch $b: $store holds ${dirs.size} versions " +
            s"(${dirs.sorted.mkString(", ")}) — prune is leaking")
      }
    }
    val served = AnnTopKStream.currentTopK(spark, out).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("adc"))).toSeq
    val cb = spark.read.parquet(VersionedState.path(out, "cb", 0L))
    val qv = spark.read.parquet(VersionedState.path(out, "qv", 0L))
    val oneShot = AnnTopKStream.scoreAdc(
      seen.toDF().filter(org.apache.spark.sql.functions.col("vec_id")
        =!= 0)
        .selectExpr("vec_id",
          "transform(embedding, x -> cast(x as double)) as ed"),
      cb, qv)
      .orderBy(org.apache.spark.sql.functions.col("adc").desc,
        org.apache.spark.sql.functions.col("vec_id"))
      .limit(AnnTopKStream.K)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("adc"))).toSeq
    assert(served == oneShot,
      "soaked shortlist diverged from the whole-prefix one-shot")
  }

  test("kmv maintainer: bounded versions across 16 batches with a " +
    "replay every 4th batch; final sketches equal the one-shot") {
    import spark.implicits._
    import KmvStreamSpec.Ev
    val out = Files.createTempDirectory("kmvsoak").toString
    var seen = Seq.empty[Ev]
    for (b <- 0 until Batches) {
      val batch = (0 until 40).map(i => Ev((b * 40 + i).toLong,
        s"t${i % 3}", ((b * 17 + i * 5) % 200).toLong))
      KmvStream.updateBatch(batch.toDF(), out, b.toLong)
      if (b % 4 == 3) // replay must be a no-op, not a re-merge
        KmvStream.updateBatch(batch.toDF(), out, b.toLong)
      seen = seen ++ batch
      for (store <- Seq("kmv", "meta")) {
        val dirs = versionDirs(out, store)
        assert(dirs.size <= 2,
          s"batch $b: $store holds ${dirs.size} versions " +
            s"(${dirs.sorted.mkString(", ")}) — prune is leaking")
      }
    }
    val served = KmvStream.currentSketches(spark, out).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val oneShot = graft.queries.Events.kmvOf(seen.toDF()).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(served == oneShot,
      "soaked sketches diverged from the whole-prefix one-shot")
  }

  test("split maintainer: bounded versions across 16 batches with a " +
    "replay every 4th batch; counters stay 10 rows and the served " +
    "doc total is exact") {
    import spark.implicits._
    val out = Files.createTempDirectory("splitsoak").toString
    val clusterDir = Files.createTempDirectory("splitsoakcl").toString
    // a small fixed labeling so the serving view has its second leg
    DedupClusterStream.updateBatch(
      Seq((3L, 4L), (10L, 11L)).toDF("a_id", "b_id"), clusterDir, 0L)
    var fed = 0L
    for (b <- 0 until Batches) {
      val batch = (0 until 25).map(i => (b * 25L + i))
      SplitStream.updateBatch(batch.toDF("doc_id"), out, b.toLong)
      if (b % 4 == 3) // replay must be a no-op, not a double count
        SplitStream.updateBatch(batch.toDF("doc_id"), out, b.toLong)
      fed += batch.size
      for (store <- Seq("counts", "meta")) {
        val dirs = versionDirs(out, store)
        assert(dirs.size <= 2,
          s"batch $b: $store holds ${dirs.size} versions " +
            s"(${dirs.sorted.mkString(", ")}) — prune is leaking")
      }
      val v = VersionedState.latestBefore(spark, out, Long.MaxValue).get
      assert(spark.read.parquet(
        VersionedState.path(out, "counts", v)).count() <= 10L,
        s"batch $b: the own-bucket counter store must stay <= 10 rows")
    }
    val rep = SplitStream.currentSplit(spark, out, clusterDir).collect()
    assert(rep.map(_.getAs[Long]("n_docs")).sum == fed,
      s"served doc total diverged from the ${fed} docs fed (replay " +
        "double-count or lost batch)")
    assert(rep.forall(_.getAs[Boolean]("leakage_free")))
  }

  test("calibration maintainer: bounded versions across 16 batches " +
    "with a replay every 4th batch; final report equals the one-shot") {
    import spark.implicits._
    val out = Files.createTempDirectory("calibsoak").toString
    def docOf(i: Int) = {
      val words = if (i % 3 == 0) "the a of and to x"
        else if (i % 3 == 1) "alpha the beta gamma"
        else "x y z"
      (i.toLong, words, if (i % 2 == 0) "en" else "de", "s0",
        words.length.toLong)
    }
    var seen = Seq.empty[(Long, String, String, String, Long)]
    for (b <- 0 until Batches) {
      val batch = (0 until 20).map(i => docOf(b * 20 + i))
      CalibrationStream.updateBatch(
        batch.toDF("doc_id", "text", "lang", "source", "n_chars"),
        out, b.toLong)
      if (b % 4 == 3) // replay must be a no-op, not a double count
        CalibrationStream.updateBatch(
          batch.toDF("doc_id", "text", "lang", "source", "n_chars"),
          out, b.toLong)
      seen = seen ++ batch
      for (store <- Seq("cells", "meta")) {
        val dirs = versionDirs(out, store)
        assert(dirs.size <= 2,
          s"batch $b: $store holds ${dirs.size} versions " +
            s"(${dirs.sorted.mkString(", ")}) — prune is leaking")
      }
    }
    val served = CalibrationStream.currentReport(spark, out)
      .orderBy(org.apache.spark.sql.functions.col("bin"))
      .collect().toSeq
    val oneShot = graft.queries.Llm.calibrationReportOf(
        graft.queries.Llm.calibrationCells(
          seen.toDF("doc_id", "text", "lang", "source", "n_chars")))
      .orderBy(org.apache.spark.sql.functions.col("bin"))
      .collect().toSeq
    assert(served == oneShot,
      "soaked calibration report diverged from the whole-prefix " +
        "one-shot")
  }
}
