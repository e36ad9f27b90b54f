package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension merge — the warehouse operation the
  * reference's daily dimension loads imply but hand off to overwrite
  * semantics (`/root/reference/dags/templates/evm_load_template.py`
  * keeps only latest-state dims): keep EVERY historical version of a
  * dimension row, each with a validity interval, so facts can join to
  * the version that was current at their event time.
  *
  * Semantics per key, given the current table and an updates batch at
  * `effectiveDate`:
  *   - tracked attributes changed → close the open version
  *     (`valid_to = effectiveDate`, `is_current = false`) and open a
  *     new one (`valid_from = effectiveDate`, open-ended, current);
  *   - update row identical on all tracked attributes → no-op;
  *   - key only in updates → brand-new current version;
  *   - key not in updates, and all already-closed history → pass
  *     through untouched.
  *
  * Scale shape: ONE equi-shuffle join of the open-version slice with
  * the updates batch on the business key (history rows never join —
  * they're unioned straight through), map-side change detection via
  * null-safe attribute comparison, then a union of three projections
  * of that single join. A daily dim batch is typically ≪ the dim —
  * broadcast-eligible under AQE; nothing here is quadratic or
  * driver-bound.
  */
object Scd {

  /** Merge `updates` into the SCD2 `current` table. `current` must
    * carry `keyCol`, the tracked columns, and `valid_from`/`valid_to`/
    * `is_current` bookkeeping; `updates` carries `keyCol` + tracked
    * columns. Returns the full post-merge SCD2 table.
    *
    * The three merge branches are emitted from ONE pass over the
    * full-outer join: each joined row builds an array of its 0-2
    * applicable branch structs (untouched / close / open) and explodes
    * the non-null ones. Filtering three projections of the join
    * instead reads cleaner but physically plans the JOIN — and the
    * dim-side scan+shuffle under it — three times (measured: 3 joins,
    * 0 reused exchanges); at warehouse scale that triples the
    * dominant cost. ExplainSpec pins the single-join shape. */
  def scd2Merge(current: DataFrame, updates: DataFrame, keyCol: String,
      trackedCols: Seq[String], effectiveDate: String): DataFrame = {
    require(trackedCols.nonEmpty, "trackedCols must be non-empty")
    val book = Seq("valid_from", "valid_to", "is_current")
    val open = current.filter(col("is_current"))
    val hist = current.filter(!col("is_current"))

    val u = updates.select(
      col(keyCol).as("_uk") +: trackedCols.map(c => col(c).as(s"_u_$c")): _*)
    // the ONE shuffle (or AQE-broadcast) join of the merge
    val joined = open.join(u, open(keyCol) === col("_uk"), "full_outer")
    val changed = trackedCols
      .map(c => !(col(c) <=> col(s"_u_$c"))).reduce(_ || _)

    def branch(key: Column, tracked: Seq[Column], from: Column,
        to: Column, cur: Column): Column =
      struct(key.as(keyCol) +:
        tracked.zip(trackedCols).map { case (c, n) => c.as(n) } :+
        from.cast("string").as("valid_from") :+
        to.cast("string").as("valid_to") :+
        cur.as("is_current"): _*)

    val nullStr = lit(null).cast("string")
    val branches = array(
      // open version survives as-is: no update row, or a no-op one
      when(col("_uk").isNull || (col(keyCol).isNotNull && !changed),
        branch(col(keyCol), trackedCols.map(col), col("valid_from"),
          col("valid_to"), col("is_current"))),
      // open version closed by a genuinely-different update row
      when(col(keyCol).isNotNull && col("_uk").isNotNull && changed,
        branch(col(keyCol), trackedCols.map(col), col("valid_from"),
          lit(effectiveDate), lit(false))),
      // new version: changed key re-opens, brand-new key inserts
      when(col("_uk").isNotNull && (col(keyCol).isNull || changed),
        branch(col("_uk"), trackedCols.map(c => col(s"_u_$c")),
          lit(effectiveDate), nullStr, lit(true))))
    val mergedOpen = joined
      .select(explode(filter(branches, b => b.isNotNull)).as("_r"))
      .select(col("_r.*"))

    val ordered = Seq(keyCol) ++ trackedCols ++ book
    hist.select(ordered.map(col): _*).unionByName(mergedOpen)
  }

  /** Point-in-time (as-of) join: each fact row picks up the dimension
    * VERSION that was valid at its event date — the read-side half of
    * SCD2 (facts must never see attributes from the future, the
    * classic time-travel-leak bug in training-data joins).
    *
    * `dim` is an SCD2 table ([[scd2Merge]] output shape): `dimKeyCol`,
    * the tracked columns, `valid_from`/`valid_to` (ISO date strings —
    * lexicographic order IS date order — with NULL `valid_to` = open).
    * A fact whose date falls in no version's `[valid_from, valid_to)`
    * interval keeps NULL attributes (LEFT join) — the honest answer
    * for facts predating the dimension. Version intervals per key are
    * non-overlapping by SCD2 construction, so each fact matches at
    * most one version and the output is exactly one row per fact.
    *
    * Scale shape: ONE equi-shuffle join on the business key (the
    * interval predicate rides along as a join-side filter, not a
    * range-join explosion — versions per key are few), AQE-broadcast
    * when the dim is small. Nothing quadratic or driver-bound.
    *
    * @return all fact columns + the tracked columns + `valid_from`
    *         (version provenance) */
  def pointInTime(facts: DataFrame, dim: DataFrame,
      factKeyCol: String, factDateCol: String,
      dimKeyCol: String, trackedCols: Seq[String]): DataFrame = {
    require(trackedCols.nonEmpty, "trackedCols must be non-empty")
    val d = dim.select(
      col(dimKeyCol).as("_pit_k") +: trackedCols.map(col) :+
        col("valid_from") :+ col("valid_to"): _*)
    val fd = facts(factDateCol)
    facts.join(d,
        facts(factKeyCol) === d("_pit_k") &&
          fd >= d("valid_from") &&
          (d("valid_to").isNull || fd < d("valid_to")),
        "left")
      .select(facts.columns.map(facts(_)) ++ trackedCols.map(col) :+
        d("valid_from"): _*)
  }
}
