package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint}
import org.apache.spark.sql.functions._

/** The heavy-duplication contract (VERDICT r12 #1/#6): every join of
  * the corpus against a PAIR-INDEX-DERIVED frame (near-dup component
  * labels, dedup losers) must be AQE-DECIDED, never hint-forced — the
  * frames are small under the sparse-dup house contract, but real web
  * corpora run 30-60 % near-duplicate, where they grow O(corpus) and
  * a forced broadcast OOMs instead of degrading to a shuffle join.
  *
  * Three locks:
  *   1. the logical plans carry NO join hint on those joins;
  *   2. at sparse fixture scale AQE still picks the broadcast join at
  *      runtime (the perf the hint used to buy is not lost);
  *   3. on a generated 56 %-near-dup corpus with broadcast DISABLED
  *      (the stand-in for "labels too big to broadcast") the family
  *      executes green end-to-end through shuffle joins — correct
  *      split counts, zero leakage, consistent dedup stats.
  */
class DedupScaleSpec extends SparkSpec {

  private val sparseDir = "/root/testdata/sf0.001"

  /** The target joins: corpus ⋈ labels (LeftOuter, right side carries
    * `lbl`) and corpus ⋈ losers (LeftAnti). */
  private def pairFrameJoins(df: DataFrame): Seq[Join] =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == LeftAnti => j
      case j: Join if j.joinType == LeftOuter &&
        j.right.output.exists(_.name == "lbl") => j
    }

  test("pair-index joins carry no forced broadcast hint (the labels/" +
    "losers frames are O(corpus) on heavy-dup corpora)") {
    for (key <- Seq("llm_split_leakage_safe", "llm_dedup_apply")) {
      val joins =
        pairFrameJoins(SparkEntry.queries(key)(spark, sparseDir))
      assert(joins.nonEmpty, s"$key: expected to find the pair-frame " +
        "join in the optimized plan (matcher drifted?)")
      joins.foreach { j =>
        assert(j.hint == JoinHint.NONE,
          s"$key: the pair-frame join must be AQE-decided, found " +
            s"hint ${j.hint}")
      }
    }
  }

  test("sparse corpus: AQE still picks the broadcast join at runtime " +
    "(dropping the hint costs nothing at fixture scale)") {
    for (key <- Seq("llm_split_leakage_safe", "llm_dedup_apply")) {
      val df = SparkEntry.queries(key)(spark, sparseDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$key: AQE should broadcast the small pair-derived frame at " +
          s"sparse fixture scale:\n$plan")
    }
  }

  /** ~56 % near-dup corpus, documents-table schema: 2200 unique bases
    * + 2800 near-copies (each copy mutates ONE of 24 tokens, so
    * 3-gram Jaccard vs its base ≈ 19/25 = 0.76 ≥ the 0.6 verify
    * threshold, and base/copy ids keep copies as the higher — losing
    * — pair side). */
  private def heavyDupCorpus(): String = {
    import spark.implicits._
    val nBase = 2200
    val rows = (0 until nBase).flatMap { b =>
      val toks = (0 until 24).map(j => s"w${(b * 31 + j * 7) % 1997}x$j")
      val base = (b.toLong, toks.mkString(" "), if (b % 5 == 0) "de"
        else "en", s"src${b % 4}")
      val copies = (0 until (b % 3)).map { c =>
        val mut = toks.updated(5 + c, s"mut${b}c$c")
        ((nBase + b * 2 + c).toLong, mut.mkString(" "),
          base._3, s"src${(b + c + 1) % 4}")
      }
      base +: copies
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft-heavydup").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("heavy-dup corpus with broadcast disabled: the dedup/split/" +
    "cluster family degrades to shuffle joins and stays correct") {
    val dir = heavyDupCorpus()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    keys.foreach(spark.conf.set(_, "-1"))
    try {
      // split: zero leakage, every doc in exactly one split, the plan
      // must NOT contain a broadcast of the pair-derived labels (a
      // reintroduced hint would override the disabled threshold —
      // exactly the OOM path this spec locks out)
      val split = SparkEntry
        .queries("llm_split_leakage_safe")(spark, dir)
      val rows = split.collect()
      val plan = split.queryExecution.executedPlan.toString
      assert(rows.forall(_.getAs[Boolean]("leakage_free")),
        s"near-dup components must never straddle splits:\n" +
          rows.mkString("\n"))
      assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs,
        "every doc lands in exactly one split")
      assert(!plan.contains("BroadcastHashJoin LeftOuter"),
        s"with broadcast disabled the labels join must degrade to a " +
          s"shuffle join (no forced hint):\n$plan")

      // apply: survivors = corpus − losers; with the copy-heavy corpus
      // the drop rate must land in the designed band
      val apply = SparkEntry.queries("llm_dedup_apply")(spark, dir)
      val aPlan = { apply.collect();
        apply.queryExecution.executedPlan.toString }
      assert(!aPlan.contains("BroadcastHashJoin LeftAnti"),
        s"with broadcast disabled the losers anti-join must degrade " +
          s"to a shuffle join:\n$aPlan")
      val survivors = apply.collect().map(_.getAs[Long]("n_docs")).sum
      val dropRate = 1.0 - survivors.toDouble / nDocs
      assert(dropRate > 0.4 && dropRate < 0.7,
        s"designed ~56% near-dup rate, measured drop $dropRate")

      // stats: self-consistent on the same corpus
      val st = SparkEntry.queries("llm_dedup_stats")(spark, dir)
        .collect().head
      assert(st.getAs[Long]("n_docs") == nDocs)
      assert(st.getAs[Long]("n_dropped") ==
        st.getAs[Long]("n_clustered") - st.getAs[Long]("n_clusters"),
        "components drop all but one keeper each")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
