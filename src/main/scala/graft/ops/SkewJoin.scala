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

  /** Salt derived from the full row content — deterministic under task
    * retry. An id-based salt (monotonically_increasing_id) re-salts rows
    * differently when a lost shuffle-map output is recomputed, which can
    * duplicate or drop rows exactly on the multi-executor clusters the
    * operator targets. Identical rows share a salt; that only matters if
    * one KEY's rows are ALSO massively duplicated row-for-row. */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(salts.toLong))

  /** Inner equi-join `left(keyCol) = right(keyCol)` with the left side
    * treated as the (large, possibly skewed) probe side. */
  def salted(left: DataFrame, right: DataFrame, keyCol: String,
      salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt", rowSalt(left, salts))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLeft.join(saltedRight, Seq(keyCol, "_salt")).drop("_salt")
  }

  /** Two-phase skew-safe count per key: partial count over (key, salt),
    * then final sum over key — the hot key's first-phase work spreads
    * over `salts` tasks. */
  def saltedCount(df: DataFrame, keyCol: String, salts: Int): DataFrame =
    df.withColumn("_salt", rowSalt(df, salts))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).as("cnt"))
}
