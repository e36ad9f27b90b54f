package graft.write

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data-skipping manifest — the lakehouse move (Delta/
  * Iceberg-style min/max statistics, public design) that turns a
  * [[ZOrder]] layout into actual FILE pruning: Spark's parquet reader
  * skips row groups by footer stats, but it still LISTS and OPENS
  * every file; at 100 TB the listing+open tax alone dominates a
  * selective query. A manifest of per-file min/max for the indexed
  * columns lets the read path select matching files BEFORE the scan —
  * driver-side, against a #files-sized table.
  *
  * Build is one distributed scan of the table grouped by
  * `input_file_name()` (partial-agg'd min/max — no extra infrastructure,
  * no footer parsing); reads collect only the matching file list
  * (bounded by #files, the same bounded-collect budget as the Pack
  * shard offsets). Correctness does not depend on the manifest:
  * pruning keeps every file whose [min,max] intersects the predicate
  * range, so the pruned scan + the original filter is exactly the full
  * scan + filter (spec-asserted), and a stale manifest row can only
  * cause over-reading, never wrong answers — provided it is rebuilt
  * after compaction/overwrite, the same hygiene the bucketed indexes
  * document. */
object Manifest {

  /** Scan `path` once and write `path/_graft_manifest` with per-file
    * min/max for `cols`. */
  def build(spark: SparkSession, path: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "cols must be non-empty")
    val df = spark.read.parquet(path)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestPath(path))
  }

  def manifestPath(path: String): String = s"$path/_graft_manifest"

  /** The manifest table (file, min_c, max_c per indexed column). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(manifestPath(path))

  /** Read only the files whose [min,max] ranges intersect every
    * requested (column → (lo, hi)) predicate range. The caller still
    * applies its row-level filter — pruning is a superset selection,
    * so results are identical to a full scan by construction. Returns
    * (frame, filesRead, filesTotal) so callers and specs can see the
    * skipping actually happen. */
  def prunedRead(spark: SparkSession, path: String,
      ranges: Map[String, (Long, Long)]): (DataFrame, Int, Int) = {
    require(ranges.nonEmpty, "ranges must be non-empty")
    val m = read(spark, path)
    // A file whose indexed column is all-NULL has NULL min/max stats,
    // making the interval test NULL. Such files are CONSERVATIVELY
    // READ (coalesce → true), never silently dropped: the superset
    // contract must hold for ANY caller row filter, including ones
    // that keep NULL rows ("c IS NULL OR …"). Explicit, not left to
    // Row.getBoolean's null-unboxing.
    val keep = ranges.map { case (c, (lo, hi)) =>
      coalesce(col(s"min_$c") <= hi && col(s"max_$c") >= lo, lit(true))
    }.reduce(_ && _)
    // bounded collect: one row per FILE of one table
    val all = m.select(col("file"), keep.as("k")).collect()
    val files = all.filter(_.getBoolean(1)).map(_.getString(0))
    val df =
      if (files.isEmpty)
        spark.read.parquet(path).limit(0)
      else spark.read.parquet(files.toIndexedSeq: _*)
    (df, files.length, all.length)
  }
}
