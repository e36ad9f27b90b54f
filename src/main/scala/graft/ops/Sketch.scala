package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (the public Cormode–Muthukrishnan 2005 structure):
  * a depth×width grid of counters; each item increments one counter
  * per row (chosen by d independent hashes) and reads back the MIN of
  * its d counters — an overestimate with error ≤ εN at probability
  * 1−δ for width = e/ε, depth = ln(1/δ).
  *
  * Why it earns a place next to the exact `vocabulary` top-k: the
  * sketch is a FIXED-SIZE (depth·width counters), MERGEABLE summary —
  * two sketches of two corpus halves sum cell-wise into the sketch of
  * the union (SketchSpec pins that algebra), so a 100 TB corpus or an
  * infinite stream folds into a few KB per source/day that can be
  * combined later, while the exact path must carry a vocabulary-sized
  * shuffle per question asked.
  *
  * Engine-exactness: the row hashes derive from the same unsigned
  * Spark-Murmur3 value the Bloom decontaminator replays in DuckDB
  * integer SQL, fanned to `depth` rows by Knuth multiplicative mixing
  * (2654435761 = ⌊2³²/φ⌋) and a Lehmer step (48271 mod 2³¹−1) — every
  * intermediate < 2⁶³, so the oracle rebuilds the exact grid and
  * reproduces every collision-inflated estimate.
  *
  * Scale shape: token counts partial-aggregate map-side (vocab-sized
  * shuffle — needed to weight the grid); the grid itself is
  * depth·width rows, BROADCAST back for the estimate probe, so the
  * min-of-d read is a map-only pass over the vocabulary. Nothing is
  * corpus-quadratic or driver-bound.
  */
object Sketch {

  /** Unsigned Spark-Murmur3 of a string column — the
    * [[Decontaminate]] Bloom spelling. */
  private def unsignedHash(c: Column): Column =
    hash(c).cast("long").bitwiseAND(lit(0xFFFFFFFFL))

  /** Row-r bucket for hash value u: Knuth-mix then Lehmer, mod width. */
  private def bucket(u: Column, r: Column, width: Int): Column =
    ((u + r * lit(2654435761L)) % lit(4294967296L) * lit(48271L)) %
      lit(2147483647L) % lit(width)

  /** Per-token exact counts (the grid weights and the report column). */
  private def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("exact"))

  private def tableFrom(tf: DataFrame, depth: Int, width: Int): DataFrame =
    tf.withColumn("u", unsignedHash(col("token")))
      .select(col("exact"), col("u"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("bucket", bucket(col("u"), col("r"), width))
      .groupBy("r", "bucket").agg(sum(col("exact")).as("c"))

  /** The mergeable sketch: (r, bucket, c) — depth·width cells (empty
    * cells omitted; they merge as zero). Summing the cells of two
    * corpus parts' tables yields the table of their union. */
  def cmsTable(df: DataFrame, textCol: String, depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch dims: $depth x $width")
    tableFrom(tokenCounts(df, textCol), depth, width)
  }

  /** Cell-wise merge of sketch tables built with identical dims. */
  def mergeCmsTables(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy("r", "bucket").agg(sum(col("c")).as("c"))

  /** Top-k heavy hitters by CMS estimate: (token, est, exact) with
    * est ≥ exact always (the sketch only over-counts), ordered and
    * tie-broken deterministically. */
  def cmsHeavyHitters(df: DataFrame, textCol: String, depth: Int = 4,
      width: Int = 1024, k: Int = 20): DataFrame = {
    // grid and probes both consume the vocabulary frame — checkpoint
    // it once (vocab-sized, the same budget the TF-IDF path carries)
    // instead of re-running the corpus tokenize for each consumer
    val tf = tokenCounts(df, textCol).localCheckpoint()
    val probes = tf
      .withColumn("u", unsignedHash(col("token")))
      .select(col("token"), col("exact"), col("u"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("bucket", bucket(col("u"), col("r"), width))
    probes
      .join(broadcast(tableFrom(tf, depth, width)), Seq("r", "bucket"))
      .groupBy("token")
      .agg(min(col("c")).as("est"), first(col("exact")).as("exact"))
      .orderBy(col("est").desc, col("token"))
      .limit(k)
  }
}
