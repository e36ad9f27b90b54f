package graft.write

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * sibling staging dir → swap via two renames (the staging dir is
  * complete and committed before the old dir is touched, so a crash
  * leaves either the old or the new directory — never a half state;
  * the reference-shaped warehouse treats a partition dir as the
  * atomic unit the same way).
  *
  * Filesystem: resolved from the PATH via the Hadoop FileSystem API,
  * so the same call compacts `file:`, `hdfs:` and `s3a:` directories —
  * `java.io.File` would silently find no files on anything non-local
  * (an empty-looking table is exactly the failure a maintenance job
  * must be loud about; a missing root THROWS). Note the rename swap
  * is atomic on HDFS/local; on object stores it is copy-backed — the
  * same caveat every rename-based committer carries there.
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
    val dir = new Path(path)
    val fs: FileSystem =
      dir.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(dir) && fs.getFileStatus(dir).isDirectory,
      s"compact: not a directory: $path")
    def parquetFiles(d: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(d).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles(dir)
    val totalBytes = before.map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val parent = dir.getParent
    val staging = new Path(parent, dir.getName + ".compact_tmp")
    val retired = new Path(parent, dir.getName + ".compact_old")
    fs.delete(staging, true)
    fs.delete(retired, true)
    val rows = try {
      val df = spark.read.parquet(path)
      df.repartition(n).write.mode("overwrite")
        .parquet(staging.toString)
      val written = spark.read.parquet(staging.toString).count()
      // two-rename swap: old dir aside, staging into place, old dropped
      require(fs.rename(dir, retired),
        s"compact: could not retire $path")
      if (!fs.rename(staging, dir)) {
        // roll back so the caller still has the original data
        fs.rename(retired, dir)
        throw new IllegalStateException(
          s"compact: could not move staging into place for $path")
      }
      written
    } finally {
      fs.delete(retired, true)
      fs.delete(staging, true)
    }
    (before.length, parquetFiles(dir).length, rows)
  }
}
