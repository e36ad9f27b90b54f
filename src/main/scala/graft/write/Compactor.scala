package graft.write

import org.apache.spark.sql.SparkSession

/** Small-file COMPACTION for a parquet directory — the warehouse
  * maintenance op every long-lived partitioned table eventually needs:
  * streaming ingest, per-day overwrites, and incremental appends all
  * accrete files far below the scan-efficient size, and a 100 TB table
  * with 10⁷ tiny files spends more time in listing + task scheduling +
  * footer reads than in actual IO. Compaction rewrites a directory to
  * ⌈bytes / targetBytes⌉ files with identical row content.
  *
  * Mechanics: size the target file count from the CURRENT on-disk
  * bytes (a listing, no data read), read → `repartition(n)` (a full
  * shuffle — deliberate: `coalesce` would chain narrow dependencies
  * and produce skewed merged files from skewed inputs) → write to a
  * sibling staging dir → atomically swap via two renames (the staging
  * dir is complete and fsync'd by the committer before the old dir is
  * touched, so a crash leaves either the old or the new directory —
  * never a half state; the reference-shaped warehouse treats a
  * partition dir as the atomic unit the same way).
  *
  * Scale notes: compaction is embarrassingly parallel ACROSS
  * partitions — at warehouse scale run one compact() per (dt, bucket)
  * partition dir (the [[PartitionedWriter]] layout), each sized by its
  * own bytes, rather than one giant job over the table root. Rows are
  * preserved but ORDER IS NOT (parquet directories carry no order
  * contract; consumers that need one sort on read).
  *
  * @return (filesBefore, filesAfter, rows) for the caller's audit log. */
object Compactor {

  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int, Long) = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val dir = new java.io.File(path)
    require(dir.isDirectory, s"not a directory: $path")
    def parquetFiles(d: java.io.File): Array[java.io.File] =
      d.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val before = parquetFiles(dir)
    val totalBytes = before.map(_.length()).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val staging = new java.io.File(dir.getParentFile,
      dir.getName + ".compact_tmp")
    val retired = new java.io.File(dir.getParentFile,
      dir.getName + ".compact_old")
    graft.core.Fs.deleteRecursively(staging)
    graft.core.Fs.deleteRecursively(retired)
    val rows = try {
      val df = spark.read.parquet(path)
      df.repartition(n).write.mode("overwrite")
        .parquet(staging.getAbsolutePath)
      val written = spark.read.parquet(staging.getAbsolutePath).count()
      // two-rename swap: old dir aside, staging into place, old dropped
      require(dir.renameTo(retired),
        s"compact: could not retire $path")
      if (!staging.renameTo(dir)) {
        // roll back so the caller still has the original data
        retired.renameTo(dir)
        throw new IllegalStateException(
          s"compact: could not move staging into place for $path")
      }
      written
    } finally {
      graft.core.Fs.deleteRecursively(retired)
      graft.core.Fs.deleteRecursively(staging)
    }
    (before.length, parquetFiles(dir).length, rows)
  }
}
