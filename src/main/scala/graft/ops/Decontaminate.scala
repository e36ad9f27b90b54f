package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eval-set decontamination: flag (or drop) training documents that
  * share any word n-gram with an evaluation corpus — the standard
  * leakage guard before a training run (the GPT-3/PaLM-style 8-13-gram
  * overlap rule, re-expressed as a Spark semi join).
  *
  * Scale shape: the eval side collapses to a DISTINCT n-gram-hash set —
  * eval benchmarks are tiny next to a 100 TB corpus, so that set is
  * broadcast and the train side is a single map-side semi join probe;
  * no shuffle of the corpus at all. Grams travel as xxhash64 longs, not
  * strings (8 bytes vs ~50; a 64-bit collision falsely flags one doc —
  * harmless for a filter whose job is over-approximate safety).
  */
object Decontaminate {

  private def grams(textCol: String, n: Int) =
    explode(Dedup.shingles(col(textCol), n)).as("g")

  /** @return train with a `contaminated` boolean appended */
  def flag(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int, broadcastEval: Boolean = true): DataFrame = {
    val evalGrams = {
      val g = evalSet.select(grams(textCol, n))
        .select(xxhash64(col("g")).as("gh")).distinct()
      if (broadcastEval) broadcast(g) else g
    }
    val hit = train
      .select(col(idCol), grams(textCol, n))
      .select(col(idCol), xxhash64(col("g")).as("gh"))
      .join(evalGrams, Seq("gh"), "left_semi")
      .select(col(idCol).as("__hit_id")).distinct()
    train.join(hit, col(idCol) === col("__hit_id"), "left")
      .withColumn("contaminated", col("__hit_id").isNotNull)
      .drop("__hit_id")
  }

  /** The kept corpus: train minus every doc sharing an n-gram with the
    * eval set. */
  def clean(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    flag(train, evalSet, idCol, textCol, n)
      .filter(!col("contaminated")).drop("contaminated")

  /** GRADED contamination: per-doc overlap fraction
    * |distinct grams ∩ eval| / |distinct grams| — the thresholdable
    * signal (drop above x%, down-weight above y%) where the any-hit
    * flag is too blunt (one stock phrase shared with a benchmark
    * should not nuke a 10-page document).
    *
    * Same scale shape as [[flag]]: the denominator is map-side
    * `size(shingles)` (no explode, no shuffle), and only HIT grams —
    * a tiny fraction of the corpus — survive the broadcast semi probe
    * into the per-doc count aggregate. Shingles are distinct per doc
    * on both sides of the oracle, so n_hit counts distinct
    * overlapping grams. Docs shorter than n have no gram evidence:
    * n_grams = 0, overlap = NULL (not 0 — "no evidence" and "clean"
    * must stay distinguishable downstream). The single long/long
    * division is IEEE-identical cross-engine. */
  def overlapScore(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int, broadcastEval: Boolean = true): DataFrame = {
    val evalGrams = {
      val g = evalSet.select(grams(textCol, n))
        .select(xxhash64(col("g")).as("gh")).distinct()
      if (broadcastEval) broadcast(g) else g
    }
    val totals = train.select(col(idCol),
      size(Dedup.shingles(col(textCol), n)).cast("long").as("n_grams"))
    val hits = train
      .select(col(idCol), grams(textCol, n))
      .select(col(idCol), xxhash64(col("g")).as("gh"))
      .join(evalGrams, Seq("gh"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hit"))
    totals.join(hits, Seq(idCol), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("overlap", when(col("n_grams") > 0,
        col("n_hit").cast("double") / col("n_grams").cast("double")))
  }
}
