package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for hot-key skew: when one join key holds a large
  * fraction of the probe side (a hot contract address, a viral token),
  * a plain shuffle join puts that key's rows in ONE task. Salting
  * splits the probe side's key into `salts` sub-keys and explodes the
  * build side across all salts — same rows out, skew spread across
  * `salts` tasks.
  *
  * AQE's skew-join handles sort-merge skew at runtime; explicit salting
  * remains the tool for broadcast-ineligible build sides and for
  * aggregations (`saltedCount`).
  */
object SkewJoin {

  /** Inner equi-join `left(keyCol) = right(keyCol)` with the left side
    * treated as the (large, possibly skewed) probe side. */
  def salted(left: DataFrame, right: DataFrame, keyCol: String,
      salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLeft.join(saltedRight, Seq(keyCol, "_salt")).drop("_salt")
  }

  /** Two-phase skew-safe count per key: partial count over (key, salt),
    * then final sum over key — the hot key's first-phase work spreads
    * over `salts` tasks. */
  def saltedCount(df: DataFrame, keyCol: String, salts: Int): DataFrame =
    df.withColumn("_salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).as("cnt"))
}
