package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent
  * right row with the same key and time <= left time.
  *
  * Spark has no built-in as-of join; rather than a planner extension
  * this is the union-sort-window rewrite (SURVEY.md §7.3): tag both
  * sides, sort within key by (time, side) so right rows precede left
  * rows at equal times (inclusive match), and carry the last non-null
  * right value forward. One shuffle on the key, linear scan within
  * partitions — at 100 TB this is a single co-partitioned
  * sort-exchange, never a range cross product.
  */
object AsofJoin {

  /** @param rightVals right-side columns to carry (propagated as
    *                  as-of values of the latest matching right row
    *                  onto left rows)
    *
    * Null semantics (ADVICE r1): every right row is packed into ONE
    * non-null struct and `last(ignoreNulls)` runs over the struct, so
    * a matched right row whose carried value is NULL propagates that
    * NULL (not an older non-null value). Right rows with a NULL key
    * are dropped before the union — SQL ASOF equality never matches
    * NULL — so null-keyed left rows get NULL as-of values instead of
    * picking up null-keyed right rows from the shared null window
    * partition. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rTagged = right
      .filter(col(rightKey).isNotNull)
      .select(
        col(rightKey).as("__key"), col(rightTime).as("__t"),
        lit(0).as("__side"),
        struct(rightVals.map(c => col(c).as(s"__r_$c")): _*).as("__rv"))
    val rvType = rTagged.schema("__rv").dataType
    val lTagged = left
      .withColumn("__key", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    // align schemas for the union
    val rAll = leftCols.foldLeft(rTagged)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val shape = leftCols.map(col) ++
      Seq(col("__key"), col("__t"), col("__side"), col("__rv"))
    val unioned = lTagged.select(shape: _*).unionByName(rAll.select(shape: _*))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightVals.map(c => col("__asof").getField(s"__r_$c").as(s"asof_$c"))): _*)
  }
}
