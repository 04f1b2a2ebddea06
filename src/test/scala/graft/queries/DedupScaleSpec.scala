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
    for ((key, joinType) <- Seq(
      "llm_split_leakage_safe" -> "LeftOuter",
      "llm_dedup_apply" -> "LeftAnti")) {
      val df = SparkEntry.queries(key)(spark, sparseDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(s"BroadcastHashJoin.*$joinType".r.findFirstIn(plan)
        .isDefined,
        s"$key: AQE should broadcast the small pair-derived frame " +
          s"($joinType) at sparse fixture scale:\n$plan")
    }
  }

  /** ~56 % near-dup corpus, documents-table schema — the drill tool's
    * shared recipe (`tools.HeavyDup.writeCorpus`: one definition for
    * the spec and the BASELINE drill, so a threshold or schema change
    * cannot drift them apart) at spec scale. */
  private def heavyDupCorpus(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-heavydup").toString
    graft.tools.HeavyDup.writeCorpus(spark, nBase = 2200,
      vocabMod = 1997, parts = 4, out = dir)
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
      // the node prints its join keys between name and type, so the
      // lock must be a same-line regex, not a contiguous substring
      // (a contiguous match can never fire — review r13)
      assert("BroadcastHashJoin.*LeftOuter".r.findFirstIn(plan).isEmpty,
        s"with broadcast disabled the labels join must degrade to a " +
          s"shuffle join (no forced hint):\n$plan")

      // apply: survivors = corpus − losers; with the copy-heavy corpus
      // the drop rate must land in the designed band
      val apply = SparkEntry.queries("llm_dedup_apply")(spark, dir)
      val aPlan = { apply.collect();
        apply.queryExecution.executedPlan.toString }
      assert("BroadcastHashJoin.*LeftAnti".r.findFirstIn(aPlan).isEmpty,
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
