package graft.tools

/** Inventory audit: counts `SparkEntry.queries` vs `oracleSql` keys and
  * prints any asymmetry. Driver-side sanity tool, no Spark session.
  */
object KeyCount {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracle=${o.size}")
    println("missingOracle=" + (q -- o).toList.sorted.mkString(","))
    println("orphanOracle=" + (o -- q).toList.sorted.mkString(","))
  }
}
