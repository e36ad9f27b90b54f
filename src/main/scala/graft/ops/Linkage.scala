package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage: fuzzy (edit-distance-bounded) equi-join between two
  * entity tables — "which dirty/OCR'd/re-keyed names refer to which
  * canonical rows". The naive formulation is an all-pairs Levenshtein
  * scan (quadratic — the labeled oracle twin); the scalable production
  * path is SEGMENT BLOCKING, the pigeonhole at the heart of the public
  * PassJoin algorithm (Li, Deng, Wang, Feng — PVLDB 2011):
  *
  * split a string of length m into d+1 contiguous segments. Any b with
  * edit(a, b) ≤ d contains at least one of a's segments EXACTLY (d
  * edits can touch at most d segments), and the surviving segment's
  * start position in b shifts by at most d (each edit before it moves
  * it by ≤ 1). So:
  *
  *   1. the left side emits d+1 keys per row: (m, segIdx, segment);
  *   2. the right side emits, for each candidate left length
  *      m ∈ [n−d, n+d], each segment slot, and each shift ∈ [−d, d],
  *      the substring of b at the shifted segment window — at most
  *      (2d+1)²·(d+1) keys, a constant for constant d;
  *   3. equi-join on the key, dedup, verify with the exact (codegen'd)
  *      `levenshtein` ≤ d.
  *
  * Cost: one hash shuffle of O(d²·rows) key rows and block-bounded
  * candidate volume — no quadratic term, so the shape survives a 100×
  * corpus. Strings shorter than d+1 can't be segmented (an empty
  * segment key would match everything); they fall into one shared
  * "short" block that pairs all left strings of length ≤ d with all
  * right strings of length ≤ 2d — a corner bounded by how rare
  * ≤ d-char entity names are (here: none).
  */
object Linkage {

  /** (m, segIdx, segment) blocking keys for the SEGMENTED side: the
    * even split of a length-m string into d+1 slices. */
  private def leftKeys(name: Column, d: Int): Column = {
    val m = length(name)
    when(m < d + 1, array(struct(lit(-1).as("m"), lit(-1).as("i"),
        lit("").as("seg"))))
      .otherwise(transform(sequence(lit(0), lit(d)), i => {
        val p  = floor(i * m.cast("long") / (d + 1)).cast("int")
        val p2 = floor((i + 1) * m.cast("long") / (d + 1)).cast("int")
        struct(m.as("m"), i.as("i"), name.substr(p + 1, p2 - p).as("seg"))
      }))
  }

  /** Probe keys for the other side: every (candidate m, segment slot,
    * shift) substring window that a surviving segment could occupy. */
  private def rightKeys(name: Column, d: Int): Column = {
    val n = length(name)
    val probes = flatten(transform(
      sequence(greatest(n - d, lit(d + 1)), n + d), mC =>
        flatten(transform(sequence(lit(0), lit(d)), i => {
          val p = floor(i * mC.cast("long") / (d + 1)).cast("int")
          val l = (floor((i + 1) * mC.cast("long") / (d + 1)) - p)
            .cast("int")
          transform(sequence(lit(-d), lit(d)), sh => {
            val start = p + sh
            when(l >= 1 && start >= 0 && start + l <= n,
              struct(mC.as("m"), i.as("i"),
                name.substr(start + 1, l).as("seg")))
          })
        }))))
    val withShort = when(n <= 2 * d,
      array_union(array(struct(lit(-1).as("m"), lit(-1).as("i"),
        lit("").as("seg"))), probes)).otherwise(probes)
    array_distinct(filter(withShort, k => k.isNotNull))
  }

  /** Fuzzy inner join: rows `(leftId, rightId, dist)` for every pair
    * with `levenshtein(leftName, rightName) <= maxEdit`. Exact — the
    * blocking has recall 1 by the pigeonhole above; the final filter
    * removes block-collision false candidates. */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
      leftId: String, leftName: String,
      rightId: String, rightName: String,
      maxEdit: Int = 1): DataFrame = {
    require(maxEdit >= 1, "maxEdit must be >= 1")
    val l = left.select(col(leftId), col(leftName),
      explode(leftKeys(col(leftName), maxEdit)).as("_k"))
    val r = right.select(col(rightId), col(rightName),
      explode(rightKeys(col(rightName), maxEdit)).as("_k"))
    l.join(r, l("_k") === r("_k"))
      .select(col(leftId), col(leftName), col(rightId), col(rightName))
      .distinct()
      .withColumn("dist", levenshtein(col(leftName), col(rightName)))
      .filter(col("dist") <= maxEdit)
      .select(col(leftId), col(rightId), col("dist").cast("long").as("dist"))
  }
}
