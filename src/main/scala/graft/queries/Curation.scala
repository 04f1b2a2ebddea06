package graft.queries

import graft.{Canon, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-4 curation + relational coverage additions:
  * corpus vocabulary, regex scrubbing/redaction, calendar rollups,
  * edit-distance matching, and the salted skew join as an
  * oracle-checked query (not just a unit test).
  *
  * Scale posture: vocab/redact are per-row + one aggregation; the
  * edit-distance join is over a FIXED small dimension (broadcast,
  * never corpus²); the salted join is the skew path for fact-fact
  * equi-joins whose hot keys would otherwise straggle a 1000-executor
  * shuffle.
  */
object Curation {
  import Canon._
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  // ---- llm_vocab_topk: corpus vocabulary, top-k by frequency --------
  // The tokenizer-training precursor: global word counts + document
  // frequency. One explode + one groupBy (map-side partial agg); at
  // 100 TB the word-key shuffle carries only (word, partial counts).
  private val vocab: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("doc_id")).as("doc_frequency"))
      .orderBy(col("n_occurrences").desc, col("w"))
      .limit(20)

  private val vocabSql =
    """SELECT w, count(*) AS n_occurrences,
      |  count(DISTINCT doc_id) AS doc_frequency
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |      FROM documents)
      |GROUP BY w ORDER BY n_occurrences DESC, w LIMIT 20""".stripMargin

  // ---- llm_redact_terms: regex scrubbing / redaction ----------------
  // The PII-scrub operator shape: a lexicon/pattern match is replaced
  // with a sentinel and the hit count is kept for audit. The fixture
  // corpus has no emails/phones, so the pattern here is the stopword
  // lexicon — same regexp_replace/regexp_extract_all machinery a
  // production pattern ('[\w.]+@[\w.]+' etc.) would ride. Pure
  // per-row work: embarrassingly parallel at any scale.
  private val RedactPattern = "\\b(the|a|of|and|to)\\b"

  private val redact: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(RedactPattern), lit(0)))
          .cast(LongType).as("n_redacted"),
        length(regexp_replace(col("text"), RedactPattern, "<X>"))
          .cast(LongType).as("redacted_len"))
      .orderBy(col("doc_id"))

  private val redactSql =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$RedactPattern'))
       |    AS BIGINT) AS n_redacted,
       |  CAST(strlen(regexp_replace(text, '$RedactPattern', '<X>', 'g'))
       |    AS BIGINT) AS redacted_len
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---- q47_date_funcs: calendar rollup -------------------------------
  // year/quarter extraction + per-bucket aggregates; partition-pruning
  // twin lives in sources.LayoutSpec — here the functions themselves
  // are under oracle check.
  private val q47: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"),
        quarter(col("o_orderdate")).cast(LongType).as("o_quarter"))
      .agg(count(lit(1)).as("n_orders"),
        d(sum(dec2(col("o_totalprice")))).as("revenue"),
        min(to_date(col("o_orderdate"))).as("first_day"),
        max(to_date(col("o_orderdate"))).as("last_day"))
      .orderBy(col("o_year"), col("o_quarter"))

  private val q47Sql =
    """SELECT EXTRACT(year FROM o_orderdate) AS o_year,
      |  EXTRACT(quarter FROM o_orderdate) AS o_quarter,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  CAST(min(o_orderdate) AS DATE) AS first_day,
      |  CAST(max(o_orderdate) AS DATE) AS last_day
      |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_quarter""".stripMargin

  // ---- q48_edit_distance: fuzzy string matching -----------------------
  // Nearest other nation by Levenshtein distance — the
  // entity-resolution primitive. The self-join is over a fixed small
  // dimension (25 rows): Spark broadcasts it; cost is |dim|², never
  // data-dependent.
  private val q48: Q = (s, dir) => {
    val n = t(s, dir, "nation").select(col("n_name"))
    val pairs = n.as("x")
      .join(broadcast(n.as("y")), col("x.n_name") =!= col("y.n_name"))
      .select(col("x.n_name").as("name"), col("y.n_name").as("other"),
        levenshtein(col("x.n_name"), col("y.n_name")).as("dist"))
    pairs
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("name"))
          .orderBy(col("dist"), col("other"))))
      .filter(col("rk") === 1)
      .select(col("name"), col("other").as("nearest"),
        col("dist").cast(LongType).as("distance"))
      .orderBy(col("name"))
  }

  private val q48Sql =
    """WITH pairs AS (
      |  SELECT x.n_name AS name, y.n_name AS other,
      |    levenshtein(x.n_name, y.n_name) AS dist
      |  FROM nation x JOIN nation y ON x.n_name <> y.n_name),
      |rk AS (
      |  SELECT name, other, dist,
      |    row_number() OVER (PARTITION BY name ORDER BY dist, other) AS rk
      |  FROM pairs)
      |SELECT name, other AS nearest, CAST(dist AS BIGINT) AS distance
      |FROM rk WHERE rk = 1 ORDER BY name""".stripMargin

  // ---- q49_salted_join: skew-mitigated equi-join under oracle check ---
  // operators.SkewJoin.saltedEquiJoin replicates the build side over
  // `salts` buckets so one hot key spreads across `salts` reducers —
  // the manual fallback when AQE skew-split can't kick in (e.g. the
  // skew is in a single key, not a partition). Result must equal the
  // plain join: the oracle IS the plain join.
  private val q49: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    graft.operators.SkewJoin.saltedEquiJoin(li, o,
        "l_orderkey", "o_orderkey", salts = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        d(sum(dec2(col("l_quantity")))).as("total_qty"))
      .orderBy(col("o_orderpriority"))
  }

  private val q49Sql =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, Q] = Map(
    "llm_vocab_topk" -> vocab,
    "llm_redact_terms" -> redact,
    "q47_date_funcs" -> q47,
    "q48_edit_distance" -> q48,
    "q49_salted_join" -> q49,
  )

  val oracles: Map[String, String] = Map(
    "llm_vocab_topk" -> vocabSql,
    "llm_redact_terms" -> redactSql,
    "q47_date_funcs" -> q47Sql,
    "q48_edit_distance" -> q48Sql,
    "q49_salted_join" -> q49Sql,
  )
}
