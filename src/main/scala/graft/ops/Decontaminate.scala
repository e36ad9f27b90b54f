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
}
