package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: for every left row, attach the single latest right row
  * with the same key whose time is <= the left row's time — "the token
  * price in effect when this transfer happened". Spark has no native
  * ASOF operator; the scalable formulation is the UNION + running
  * `last(ignoreNulls)` window:
  *
  *   1. tag right rows (updates) and left rows (probes), union them;
  *   2. one hash-partition by key, sort by (time, isUpdate DESC) inside
  *      each partition — an update at t is visible to a probe at the
  *      same t;
  *   3. running `last(value, ignoreNulls = true)` carries the latest
  *      update forward; probes read it; updates are dropped.
  *
  * Cost: ONE shuffle of |left| + |right| rows and a sort — no
  * per-probe range explosion, no broadcast requirement on either side,
  * skew-bounded by the key distribution exactly like any keyed window.
  * The equivalent point-in-time left-join subquery is O(|left|·|right
  * per key|). (DuckDB's native ASOF JOIN is the differential oracle.)
  *
  * Right rows with duplicate (key, time) must be pre-deduplicated by
  * the caller if "which update wins" matters; otherwise the last in
  * sort order wins (ties on time are broken arbitrarily among equal
  * updates, matching ASOF engines).
  */
object AsOfJoin {

  /** `left` (probe) gains `valueCols` from the latest `right` row per
    * `keyCols` with `rightTime` <= `leftTime`. Left rows with no prior
    * update get nulls (ASOF LEFT JOIN semantics). Time columns must be
    * mutually comparable (use epoch longs for cross-engine tests).
    *
    * All carried values come from the SAME matched update row: the
    * window carries one `struct(valueCols*)` (null for probes, present
    * for every update), so an update whose value column is null still
    * wins over an older non-null update — matching native ASOF engines.
    *
    * Contract: `valueCols` must not collide with `left`'s columns, and
    * neither input may already contain the reserved `_t` / `_isUpdate`
    * / `_upd` working columns. */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("_t", "_isUpdate", "_upd")
    val collisions = valueCols.filter(leftCols.contains)
    require(collisions.isEmpty,
      s"valueCols collide with left columns: ${collisions.mkString(", ")}")
    val reservedHits =
      (leftCols ++ right.columns).distinct.filter(reserved.contains)
    require(reservedHits.isEmpty,
      s"inputs must not contain reserved columns: ${reservedHits.mkString(", ")}")
    val updStruct = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c)))
    val probes = left
      .withColumn("_t", col(leftTime))
      .withColumn("_isUpdate", lit(0))
      .select((keyCols.map(col) :+ col("_t") :+ col("_isUpdate") :+
        lit(null).cast(updStruct).as("_upd")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    val updates = right
      .withColumn("_t", col(rightTime))
      .withColumn("_isUpdate", lit(1))
      .select((keyCols.map(col) :+ col("_t") :+ col("_isUpdate") :+
        struct(valueCols.map(col): _*).as("_upd")) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // updates sort BEFORE probes at equal time → visible at their own t
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").asc, col("_isUpdate").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the struct is null iff no update precedes — ignoreNulls skips
    // probe placeholders but keeps updates with null-valued fields
    probes.unionByName(updates)
      .withColumn("_upd", last(col("_upd"), ignoreNulls = true).over(w))
      .filter(col("_isUpdate") === 0)
      .select(leftCols.map(col) ++
        valueCols.map(c => col("_upd").getField(c).as(c)): _*)
  }
}
