package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Structural invariants of the sample-preparation operators, checked
  * against the documents table they derive from (the DuckDB oracle
  * already pins exact values; these pin the semantics a consumer
  * relies on).
  */
class ChunkPackSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("chunks tile every document: contiguous indices, stride-32/24 " +
    "sizes, full token coverage") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
    val chunks = SparkEntry.queries("llm_chunk")(spark, dir)
    val byDoc = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      max("chunk_idx").as("max_idx"),
      sum("chunk_tokens").as("sum_ct"),
      max(col("chunk_idx") * 24 + col("chunk_tokens")).as("covered"))
    val joined = byDoc.join(docs, "doc_id")
    // indices are 0..k dense
    assert(joined.filter(col("max_idx") =!= col("n_chunks") - 1)
      .count() == 0)
    // the last chunk reaches the end of the doc: coverage == n
    assert(joined.filter(col("covered") =!= col("n")).count() == 0)
    // every chunk's size is exactly min(32, n - stride*idx) — note
    // that with stride 24 < width 32 the trailing TWO chunks may both
    // be short (n = 50 tiles as 32, 26, 2)
    val wrongSize = chunks.join(docs, "doc_id")
      .filter(col("chunk_tokens") =!=
        least(lit(32L), col("n") - col("chunk_idx") * 24))
    assert(wrongSize.count() == 0)
  }

  test("dedup clusters resolve transitive chains: a~b and b~c land in " +
    "ONE cluster even when a and c are not pairwise near-dups") {
    import spark.implicits._
    // b overlaps heavily with both a and c; a vs c share less
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),   // ~1
      (3L, "beta gamma delta epsilon zeta eta iota kappa"),   // ~2, not ~1
      (10L, "one two three four five six"),
      (11L, "one two three four five six"),                   // exact dup of 10
      (20L, "completely unrelated text lives here alone")
    ).toDF("doc_id", "text")
    val out = Llm.dedupClustersFor(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // chain {1,2,3} -> keeper 1 size 3; {10,11} -> keeper 10 size 2;
    // 20 is a singleton (no edges, not a cluster)
    assert(out == Map(1L -> 3L, 10L -> 2L), s"got $out")
  }

  test("packing conserves tokens and respects the budget up to one " +
    "straddling document") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n"))
    val perSource = docs.groupBy("source")
      .agg(sum("n").as("total"), max("n").as("max_doc"))
    val packed = SparkEntry.queries("llm_pack_sequences")(spark, dir)
    val agg = packed.groupBy("source").agg(
      sum("bin_tokens").as("packed_total"),
      max("bin").as("max_bin"),
      count(lit(1)).as("n_bins"))
    val j = agg.join(perSource, "source")
    // conservation: every token lands in exactly one bin
    assert(j.filter(col("packed_total") =!= col("total")).count() == 0)
    // bins are dense 0..max
    assert(j.filter(col("max_bin") =!= col("n_bins") - 1).count() == 0)
    // budget: a bin holds at most 2048 tokens plus one straddling doc
    val over = packed.join(perSource, "source")
      .filter(col("bin_tokens") > lit(2048) + col("max_doc"))
    assert(over.count() == 0)
  }
}
