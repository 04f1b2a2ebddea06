package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §2.4 "100 TB posture").
  *
  * AQE's skew-join handles most cases at runtime; explicit salting is
  * the fallback when one side's hot keys overwhelm even split
  * partitions (classic hot-shingle / hot-user joins in dedup
  * pipelines). The big side gets a deterministic salt derived from a
  * hash of its row, the small side is exploded across all salt values,
  * and the join key becomes (key, salt) — spreading each hot key over
  * `salts` reducers. Result set is identical to the plain equi-join.
  */
object SkewJoin {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0)
    // deterministic per-row salt (hash of the whole row, not random():
    // retries/recomputation must land rows in the same bucket)
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts.toLong))
        .cast("int"))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigSalted
      .join(smallExploded,
        bigSalted(bigKey) === smallExploded(smallKey) &&
          bigSalted("__salt") === smallExploded("__salt"))
      .drop("__salt")
  }
}
