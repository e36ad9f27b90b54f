package graft.write

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** S3/S4/S5: the partitioned warehouse sinks.
  *
  * Reference semantics (`/root/reference/dags/templates/evm_load_template
  * .py`):
  *  - `INSERT OVERWRITE … PARTITION (dt = date '{ds}')` — idempotent daily
  *    overwrite of one static partition (S3);
  *  - logs/traces add dynamic `address_hash`/`selector_hash` partition
  *    columns → 100 sub-dirs per day for parse-time pruning (S4);
  *  - tokens use `INSERT INTO` append (S5).
  *
  * The reference forces one output file per partition with
  * `/*+ REPARTITION(1) */`; at 100 TB one file per (dt,bucket) partition
  * is still right-sized for logs/traces (daily volume / 100), but we
  * expose it as a knob instead of hard-coding 1.
  *
  * Overwrite uses `partitionOverwriteMode=dynamic` (as a per-write
  * option, so it holds in any session) — only partitions present in the
  * batch are replaced, and a re-run of one day never clears other days.
  */
object PartitionedWriter {

  /** Daily overwrite into dt=… (+ optional extra dynamic partition cols).
    * `filesPerPartition` replaces the reference's REPARTITION(1) hint. */
  def overwriteDaily(df: DataFrame, path: String, ds: java.sql.Date,
                     extraPartitionCols: Seq[String] = Nil,
                     filesPerPartition: Int = 1): Unit = {
    val partCols = "dt" +: extraPartitionCols
    val withDt = df.withColumn("dt", lit(ds))
    val sized =
      if (extraPartitionCols.isEmpty) withDt.repartition(filesPerPartition)
      else {
        // co-locate each (bucket) partition into `filesPerPartition`
        // tasks: hash-partition on the bucket cols plus a row-content
        // split key, so each partition dir gets at most that many files
        // instead of one per upstream task
        val split =
          if (filesPerPartition <= 1) Nil
          else Seq(pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*),
            lit(filesPerPartition.toLong)))
        withDt.repartition(extraPartitionCols.map(col) ++ split: _*)
      }
    sized.write
      .mode(SaveMode.Overwrite)
      // per-write option, not the session conf: the "a re-run of one
      // day never clears other days" contract must hold in ANY session,
      // not only ones built by GraftSession (static overwrite here
      // silently truncates every other day's partition)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .parquet(path)
  }

  /** Multi-day dynamic overwrite — the synopsis-warehouse CELL sink:
    * like [[overwriteDaily]] but `dt` comes from the DATA (`dayCol`,
    * renamed), so one backfill job lands every day it touched in one
    * pass, each under its own `dt=…` directory. Dynamic overwrite
    * keeps the daily idempotence contract day-wise: a re-run replaces
    * exactly the days present in the batch and never clears others —
    * which is what lets a 100 TB warehouse maintain per-day sketch
    * cells (rank grid / CMS / KMV) incrementally and answer any range
    * query from PARTITION-PRUNED cell scans, zero corpus I/O.
    * Day cells are synopsis-sized, so the default is one file per day
    * (the repartition on dt co-locates each day into one task). */
  def overwriteDays(df: DataFrame, path: String, dayCol: String,
                    filesPerPartition: Int = 1): Unit = {
    val withDt = df.withColumnRenamed(dayCol, "dt")
    val split =
      if (filesPerPartition <= 1) Nil
      else Seq(pmod(xxhash64(withDt.columns.toIndexedSeq.map(col): _*),
        lit(filesPerPartition.toLong)))
    withDt.repartition(col("dt") +: split: _*).write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("dt")
      .parquet(path)
  }

  /** Retention vacuum for a dt-partitioned table (the
    * [[overwriteDays]] sink): drop every `dt=…` directory except the
    * newest `keepDays`, by partition-value order. The persisted twin
    * of [[graft.streaming.IngestStream.compactToNewestDays]]'s live-
    * state horizon — together they bound BOTH copies of the synopsis
    * warehouse's day dimension. Directory-level deletes only: a
    * surviving day's cells are untouched bytes (spec-pinned), and the
    * operation is idempotent. Returns the dropped partition values.
    * Values compare in DIRECTORY-NAME form (Spark writes dt=2024-01-07
    * style ISO dates and plain integers, both of which order
    * correctly as strings of equal length); mixed-width integer day
    * keys should use a fixed-width or date type. */
  def vacuumDays(path: String, keepDays: Int): Seq[String] = {
    require(keepDays >= 1, s"vacuumDays: keepDays must be >= 1: $keepDays")
    val root = new java.io.File(path)
    val parts = Option(root.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("dt="))
      .sortBy(_.getName)
    val drop = parts.dropRight(keepDays)
    drop.foreach(d => graft.core.Fs.deleteRecursively(d))
    drop.map(_.getName.stripPrefix("dt="))
  }

  /** S5 append (tokens incremental load). */
  def append(df: DataFrame, path: String, filesPerPartition: Int = 1): Unit =
    df.repartition(filesPerPartition).write
      .mode(SaveMode.Append)
      .parquet(path)
}
