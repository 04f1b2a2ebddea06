package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the nearest right
  * row with the same key — at-or-before the left time (`backward`,
  * the default) or at-or-after it (`forward`), optionally within a
  * `tolerance` of the left time (the full pandas `merge_asof`
  * surface).
  *
  * Spark has no built-in as-of join; rather than a planner extension
  * this is the union-sort-window rewrite (SURVEY.md §7.3): tag both
  * sides, sort within key by (time, side) so right rows sort before
  * left rows at equal times for backward (after, for forward —
  * inclusive match either way), and carry the nearest right struct
  * across with `last`/`first(ignoreNulls)`. One shuffle on the key,
  * linear scan within partitions — at 100 TB this is a single
  * co-partitioned sort-exchange, never a range cross product.
  */
object AsofJoin {

  /** @param rightVals right-side columns to carry (propagated as
    *                  as-of values of the nearest matching right row
    *                  onto left rows)
    * @param direction "backward" (nearest right time <= left time) or
    *                  "forward" (nearest right time >= left time)
    * @param tolerance max allowed |left time − right time| as a
    *                  Column (e.g. `expr("INTERVAL 1 HOUR")` for
    *                  timestamps, a numeric literal for numeric
    *                  times); a nearest match farther than this
    *                  yields NULL as-of values
    *
    * Null semantics (ADVICE r1): every right row is packed into ONE
    * non-null struct (which also carries the right time for the
    * tolerance check) and `last/first(ignoreNulls)` runs over the
    * struct, so a matched right row whose carried value is NULL
    * propagates that NULL (not an older non-null value). Right rows
    * with a NULL key are dropped before the union — SQL ASOF equality
    * never matches NULL — so null-keyed left rows get NULL as-of
    * values instead of picking up null-keyed right rows from the
    * shared null window partition. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[String],
      direction: String = "backward",
      tolerance: Option[Column] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val backward = direction == "backward"
    val leftCols = left.columns.toSeq
    // internal plumbing names must not silently overwrite user columns
    // (withColumn replaces same-named columns and the window would key
    // on corrupted data) — fail loudly instead
    val reserved = Set("__key", "__t", "__side", "__rv", "__asof")
    val clash = leftCols.filter(c =>
      reserved.contains(c) || rightVals.exists(v => s"asof_$v" == c))
    require(clash.isEmpty,
      s"asofJoin reserved column names clash with left columns: " +
        clash.mkString(", "))
    val (rSide, lSide) = if (backward) (0, 1) else (1, 0)
    val rTagged = right
      .filter(col(rightKey).isNotNull)
      .select(
        col(rightKey).as("__key"), col(rightTime).as("__t"),
        lit(rSide).as("__side"),
        struct(col(rightTime).as("__r___t") +:
          rightVals.map(c => col(c).as(s"__r_$c")): _*).as("__rv"))
    val rvType = rTagged.schema("__rv").dataType
    val lTagged = left
      .withColumn("__key", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(lSide))
      .withColumn("__rv", lit(null).cast(rvType))
    // align schemas for the union — ONE projection, not a withColumn
    // per left column (hundreds of nested Projects on a wide frame is
    // quadratic analyzer cost)
    val rAll = rTagged.select(
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__key"), col("__t"), col("__side"), col("__rv")): _*)
    val shape = leftCols.map(col) ++
      Seq(col("__key"), col("__t"), col("__side"), col("__rv"))
    val unioned = lTagged.select(shape: _*).unionByName(rAll.select(shape: _*))
    val base = Window.partitionBy(col("__key"))
      .orderBy(col("__t"), col("__side"))
    val asof =
      if (backward)
        last(col("__rv"), ignoreNulls = true).over(
          base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        first(col("__rv"), ignoreNulls = true).over(
          base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val withAsof = unioned
      .withColumn("__asof", asof)
      .filter(col("__side") === lSide)
    val asofT = col("__asof").getField("__r___t")
    val within = tolerance.fold(lit(true)) { tol =>
      if (backward) col("__t") - asofT <= tol
      else asofT - col("__t") <= tol
    }
    withAsof.select((leftCols.map(col) ++
      rightVals.map(c =>
        when(asofT.isNotNull && within,
          col("__asof").getField(s"__r_$c")).as(s"asof_$c"))): _*)
  }
}
