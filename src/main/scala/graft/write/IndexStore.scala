package graft.write

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed storage for the incremental-dedup indexes — the piece that
  * turns the 100 TB ingest claims in [[graft.ops.Dedup.incrementalExact]]
  * / [[graft.ops.Dedup.incrementalNearDup]] from scaladoc prose into a
  * checked plan property.
  *
  * Both incremental operators join a small daily batch against a
  * corpus-scale index (the md5 fingerprint table, the MinHash band
  * table). Stored as plain parquet, every probe join re-shuffles the
  * INDEX side too — a corpus-scale exchange per ingest batch, which at
  * 100 TB dominates the whole job. Stored `bucketBy` the join key, the
  * index's on-disk layout IS the join's required hash distribution:
  * Spark's bucketed scan reports `HashPartitioning(bucket cols)`, the
  * planner inserts an Exchange ONLY under the batch side (sized to the
  * bucket count), and index buckets stream through the join map-side.
  * ExplainSpec pins exactly that: no Exchange between the join and the
  * bucketed index scan.
  *
  * Sizing contract: `buckets` is a BUILD-TIME budget like every other
  * knob in this engine (LSH planes, IVF cells) — pick it so one bucket
  * of the index fits an executor's shuffle memory at the target corpus
  * (e.g. ~4096 for a 10⁹-row fingerprint table). Daily ingest APPENDS
  * new survivors' rows with the same bucket spec (`SaveMode.Append` on
  * a bucketed table adds one file per bucket per batch — compact
  * periodically, the standard bucketed-table hygiene).
  *
  * Bucketed metadata lives in the session catalog (`saveAsTable`) —
  * path-only parquet cannot carry it. The in-memory catalog works; no
  * Hive needed.
  */
object IndexStore {

  /** Write [[graft.ops.Dedup.exact]]'s fingerprint column as the exact
    * dedup index, bucketed (and in-bucket sorted) on the fingerprint.
    * Pass the frame `exact` returns (or any frame carrying `fpCol`). */
  def writeFingerprints(fps: DataFrame, table: String, buckets: Int,
      fpCol: String = "text_md5",
      mode: SaveMode = SaveMode.Overwrite): Unit =
    fps.select(col(fpCol)).write.mode(mode).format("parquet")
      .bucketBy(buckets, fpCol).sortBy(fpCol)
      .saveAsTable(table)

  /** Write [[graft.ops.Dedup.lshBands]]'s (doc, band_id, band_key)
    * frame as the near-dup band index, bucketed on the probe key
    * (band_id, band_key) — the exact join key
    * [[graft.ops.Dedup.incrementalNearDupCandidates]] probes with. */
  def writeBands(bands: DataFrame, table: String, buckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    bands.select(col("doc"), col("band_id"), col("band_key"))
      .write.mode(mode).format("parquet")
      .bucketBy(buckets, "band_id", "band_key")
      .saveAsTable(table)

  /** General bucketed-table writer for CO-LOCATED joins: two tables
    * written with the SAME key and bucket count join with zero
    * exchanges on BOTH sides — the layout move for a recurring
    * fact⋈fact join at 100 TB (the dedup-index writers above are the
    * one-bucketed-side special case). Callers should `repartition`
    * by the key first if they want one file per bucket (bucketed
    * APPEND otherwise adds a file per task per bucket — compact
    * periodically, as above). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keyCols: Seq[String], mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    df.write.mode(mode).format("parquet")
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(table)
  }

  /** The stored index, with its bucketing metadata intact — feed this
    * (not `spark.read.parquet(path)`, which loses the bucket spec) to
    * the incremental operators. */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
