package graft.write

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional
  * clustering move for 100 TB scan efficiency: interleave the bits of
  * two scan dimensions so that files sorted by the interleaved key are
  * simultaneously clustered on BOTH dimensions, and parquet row-group
  * min/max pruning works for either predicate. A linear sort gives
  * perfect pruning on its leading column and none on the second; the
  * Morton layout gives ~√-locality on each — the right trade whenever
  * two independent predicates (user and time, chain and block range)
  * both hit the same table.
  *
  * The key is pure integer bit arithmetic (shift/mask spreads —
  * the standard "part1by1" magic-mask construction), codegen'd
  * end-to-end and exactly replayable in the DuckDB oracle via the
  * generated SQL twins below, so the layout key itself is
  * value-oracled, not just spec'd.
  */
object ZOrder {

  /** (shift, mask) steps spreading a 16-bit value over even bit
    * positions; masks kept as Longs so the SQL twin interpolates the
    * same decimal constants. */
  private val Steps: Seq[(Int, Long)] =
    Seq(8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L,
      1 -> 0x55555555L)

  /** Spread the low 16 bits of x to even positions (bit i → bit 2i). */
  def part1by1(x: Column): Column =
    Steps.foldLeft(x.bitwiseAND(lit(0xFFFFL))) { case (v, (s, m)) =>
      v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton key of two 16-bit dimensions (a even bits, b odd). */
  def mortonKey(a: Column, b: Column): Column =
    part1by1(a).bitwiseOR(shiftleft(part1by1(b), 1))

  /** DuckDB replay of [[part1by1]], generated from the same Steps. */
  def part1by1Sql(x: String): String =
    Steps.foldLeft(s"($x & 65535)") { case (v, (s, m)) =>
      s"(($v | ($v << $s)) & $m)"
    }

  /** DuckDB replay of [[mortonKey]]. */
  def mortonKeySql(a: String, b: String): String =
    s"(${part1by1Sql(a)} | (${part1by1Sql(b)} << 1))"

  /** Write df into `numFiles` files range-partitioned AND sorted by the
    * Morton key of the two dimensions. At cluster scale this is the
    * layout job run once per ingest partition: the range exchange is
    * the only shuffle, each output task writes one sorted file, and
    * every later scan with a predicate on either dimension prunes
    * row groups by footer min/max. The key is dropped before write —
    * it is derivable, not data. */
  def writeZOrdered(df: DataFrame, a: Column, b: Column, numFiles: Int,
      path: String): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.withColumn("__zkey", mortonKey(a, b))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }
}
