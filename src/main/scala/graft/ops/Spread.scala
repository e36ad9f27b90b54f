package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** The ONE partition-spreading policy for CPU-dense per-row operators
  * (shingling, tokenizing, hashing, vector math): small/single-file
  * inputs arrive with 1-3 partitions, so operator parallelism must not
  * depend on input file layout — but an input that already has enough
  * partitions (any real-scale scan: a 100 TB read arrives with
  * thousands of splits) must NOT pay an extra shuffle. Shared by
  * Dedup / Similarity / TextAnalysis so a future change to the policy
  * (e.g. AQE-aware partition counting) lands everywhere at once.
  */
private[ops] object Spread {
  /** Keyed spread hash-partitions (co-locates a later keyed stage);
    * unkeyed spread round-robins (pure per-row work). */
  def apply(df: DataFrame, key: Option[Column] = None): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else key.fold(df.repartition(target))(k => df.repartition(target, k))
  }
}
