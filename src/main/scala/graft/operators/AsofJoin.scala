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
    *                  `last non-null as-of` values onto left rows) */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__key", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val rTagged = right.select(
      (col(rightKey).as("__key") +: col(rightTime).as("__t")
        +: lit(0).as("__side")
        +: rightVals.map(c => col(c).as(s"__r_$c"))): _*)
    // align schemas for the union
    val lAll = rightVals.foldLeft(lTagged)((df, c) =>
      df.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType)))
    val rAll = leftCols.foldLeft(rTagged)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lAll.select(
      (leftCols.map(col) ++ Seq(col("__key"), col("__t"), col("__side"))
        ++ rightVals.map(c => col(s"__r_$c"))): _*)
      .unionByName(rAll.select(
        (leftCols.map(col) ++ Seq(col("__key"), col("__t"), col("__side"))
          ++ rightVals.map(c => col(s"__r_$c"))): _*))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(unioned)((df, c) =>
      df.withColumn(s"asof_$c",
        last(col(s"__r_$c"), ignoreNulls = true).over(w)))
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightVals.map(c => col(s"asof_$c"))): _*)
  }
}
