package graft

import graft.queries.{Curation, Events, Extended, Llm, Multimodal, Profiling, Relational, Stats}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full SURVEY §2.3 inventory plus the §2.4
  * LLM-pipeline operators; `oracleSql` carries the DuckDB twin for
  * every deterministic query (same column names, same ORDER BY).
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_agg_tpch_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Events.queries ++ Llm.queries ++
    Multimodal.queries ++ Extended.queries ++ Curation.queries ++
    Stats.queries ++ Profiling.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted for non-SQL-expressible or
    * approximate ops (driver records a weaker rows-only check). */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Events.oracles ++ Llm.oracles ++
    Multimodal.oracles ++ Extended.oracles ++ Curation.oracles ++
    Stats.oracles ++ Profiling.oracles
}
