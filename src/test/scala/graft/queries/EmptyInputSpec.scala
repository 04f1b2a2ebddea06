package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Empty-corpus robustness: a production pipeline's first run, a
  * filtered-to-nothing partition, or a fresh tenant all present EMPTY
  * tables. Every query must either return an empty (or
  * empty-aggregate) result, or fail LOUDLY through one of the
  * documented bound/validation messages — never an opaque NPE /
  * head-of-empty / ArithmeticException from deep inside a plan.
  */
class EmptyInputSpec extends SparkSpec {

  // one empty twin of every fixture table, schemas preserved
  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_empty_sf").toString
    graft.Tables.all.foreach { n =>
      spark.read.parquet(s"/root/testdata/sf0.001/$n.parquet")
        .limit(0).write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  // Queries that MUST fail loudly on an empty corpus, with the
  // substring their message must carry. Currently NONE: every query —
  // including the IVF/quantizer family — degrades to an empty (or
  // null-estimate) result. The first run of this spec found two that
  // did not: q58's bloom build NPE'd serializing the zero-row sketch
  // (fixed in BloomJoin.bloomBytesFor) and q62's quantile extractor
  // rejected the NULL merged sketch (guarded in the query). If a
  // future operator legitimately cannot degrade, register it here
  // with its documented message fragment.
  private val loud: Map[String, String] = Map.empty

  test("every query on an EMPTY corpus returns empty/empty-aggregate " +
    "rows or fails loudly with its documented validation message") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val rows = fn(spark, emptyDir).collect()
        if (loud.contains(name))
          failures += s"$name: expected a loud failure, got ${rows.length} rows"
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse("") +
            Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
          loud.get(name) match {
            case Some(frag) if msg.toLowerCase.contains(frag) => ()
            case Some(frag) =>
              failures += s"$name: loud failure lacks '$frag': $msg"
            case None =>
              failures += s"$name: unexpected ${e.getClass.getSimpleName}: " +
                msg.take(200)
          }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
