package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: match each left point row to the
  * right interval rows of the same key that contain its time —
  * "which maintenance window / session / price epoch was this event
  * inside". Spark plans a raw inequality join as a nested-loop, which
  * is quadratic per key; the scalable formulation BUCKETIZES the time
  * axis:
  *
  *   1. each interval explodes into the fixed-width bins it overlaps
  *      (⌈len/width⌉ + 1 rows — bounded when intervals are bounded);
  *   2. each point maps to exactly ONE bin;
  *   3. equi-join on (key, bin) + exact containment filter.
  *
  * A (point, interval) pair can meet in at most one bin (the point's),
  * so no dedup pass is needed. Cost: one hash shuffle of
  * |points| + |interval bins| — the nested loop never happens. Pick
  * `binWidth` near the typical interval length: too small explodes
  * intervals into many bins, too large packs many intervals per bin
  * and pushes work into the post-filter.
  */
object RangeJoin {

  /** Inner containment join: rows of `points` gain the columns of the
    * `intervals` rows (same `keyCols`) with
    * `startCol <= pointTime <= endCol`. Time columns must be numeric
    * (use epoch millis). Non-key column names must not collide. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], pointTime: String, startCol: String,
      endCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binnedPoints = points.withColumn("_bin",
      floor(col(pointTime) / binWidth))
    // sequence() with start > stop counts DOWN — same bin SET, and an
    // inverted (empty) interval is removed by the containment filter
    val binnedIntervals = intervals.withColumn("_bin",
      explode(sequence(floor(col(startCol) / binWidth),
        floor(col(endCol) / binWidth))))
    binnedPoints.join(binnedIntervals, keyCols :+ "_bin")
      .filter(col(pointTime) >= col(startCol) &&
        col(pointTime) <= col(endCol))
      .drop("_bin")
  }
}
