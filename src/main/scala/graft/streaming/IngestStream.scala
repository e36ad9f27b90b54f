package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming document ingest against a STATIC warehouse index — the
  * micro-batch spelling of [[graft.ops.Dedup.incrementalExact]]'s
  * daily-batch shape: documents stream in, fingerprint map-side,
  * first-occurrence-dedup within the stream (stateful, keyed on the
  * fingerprint), and anti-join the ingested corpus's fingerprint index
  * as a stream-static join — the static side never streams, never
  * shuffles per batch, and the stream side carries 8-byte-keyed rows
  * only. The batch twin is exactly `incrementalExact`; the surviving
  * FINGERPRINT SET is arrival-order-independent (each fp emits at most
  * once, membership depends only on content), which is what the
  * catalog oracle compares — the kept doc id is arrival-order within a
  * micro-batched stream and intentionally not part of the contract
  * (the batch operator's min-id rule needs a total order a stream
  * does not have).
  */
object IngestStream {

  /** documents schema as stored. */
  val docsFileSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocs(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(docsFileSchema).parquet(path)

  /** The streaming pipeline: null-text rows excluded (the
    * incrementalExact null contract), fingerprint, stream-internal
    * first-occurrence dedup, stream-static anti join. Output:
    * (fpCol, idCol) append rows — at most one per fingerprint. */
  def dedupAgainstIndex(docs: DataFrame, seenFps: DataFrame,
      idCol: String, textCol: String,
      fpCol: String = "text_md5"): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(md5(col(textCol).cast("binary")).as(fpCol), col(idCol))
      .dropDuplicates(fpCol)
      .join(seenFps.select(col(fpCol)), Seq(fpCol), "left_anti")

  /** Bounded run → batch DataFrame (memory sink), for the correctness
    * gate. `pre` filters the raw stream (e.g. selecting the day's
    * batch slice out of a mixed file). */
  def runDedupToBatch(spark: SparkSession, path: String,
      seenFps: DataFrame, queryName: String,
      pre: DataFrame => DataFrame = identity): DataFrame = {
    StreamRun.bounded(spark, path, readDocs,
      df => dedupAgainstIndex(pre(df), seenFps, "doc_id", "text")) { out =>
      out.writeStream.format("memory").queryName(queryName)
        .outputMode("append")
    }
    spark.table(queryName)
  }
}

/** Shared bounded-run scaffolding for file-source streaming twins:
  * stage the single parquet file into a directory (FileStreamSource
  * requires one), drop shuffle partitions to 8 for the run (each
  * shuffle partition owns a state store; fixed per-store setup
  * dominates a bounded local run), drain, restore, clean up. The
  * [[EventsStream]] runners share this via their own reader. */
private[streaming] object StreamRun {
  def bounded(spark: SparkSession, path: String,
      read: (SparkSession, String) => DataFrame,
      pipeline: DataFrame => DataFrame)(
      sink: DataFrame => org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row]): Unit = {
    val src = java.nio.file.Paths.get(path)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(src, dir.resolve(src.getFileName))
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = sink(pipeline(read(spark, dir.toString))).start()
      try q.processAllAvailable()
      finally q.stop()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      graft.core.Fs.deleteRecursively(dir)
    }
  }

  /** Convenience for pipelines that prefilter with a Column predicate. */
  def boundedFiltered(spark: SparkSession, path: String,
      read: (SparkSession, String) => DataFrame, keep: Column,
      pipeline: DataFrame => DataFrame)(
      sink: DataFrame => org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row]): Unit =
    bounded(spark, path, read, df => pipeline(df.filter(keep)))(sink)
}
