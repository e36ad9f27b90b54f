package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import graft.core.Tables
import graft.write.PartitionedWriter

/** SURVEY §2.1 source/sink surface on real files: schema-on-read JSON and
  * header-CSV scans (S1/S2) proven by lossless round-trips, and the
  * partitioned daily-overwrite sink (S3/S4) proven by write+readback.
  */
object SourceQueries extends QueryGroup {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  val queries: Seq[Q] = Seq(
    q("q_source_json_roundtrip", "source",
      "SELECT n_nationkey, n_name, n_regionkey FROM nation") { (spark, dir) =>
      val n = Tables.df(spark, dir, "nation")
      val out = tmpDir("graft_json")
      n.write.mode("overwrite").json(out)
      // S1: schema-on-read JSON scan with a declared StructType (no
      // inference pass — at 100 TB inference would double the scan)
      spark.read.schema(n.schema).json(out)
    },

    q("q_source_csv_roundtrip", "source",
      "SELECT r_regionkey, r_name FROM region") { (spark, dir) =>
      val r = Tables.df(spark, dir, "region")
      val out = tmpDir("graft_csv")
      r.write.mode("overwrite").option("header", "true").csv(out)
      // S2: header CSV scan with declared schema (prices-table path)
      spark.read.schema(r.schema).option("header", "true").csv(out)
    },

    q("q_partitioned_write", "sink",
      """SELECT '2026-01-01' AS dt, l_returnflag,
           count(*) AS cnt,
           sum(CAST(l_orderkey AS DECIMAL(38,0))) AS sum_key
         FROM lineitem GROUP BY l_returnflag""") { (spark, dir) =>
      val li = Tables.df(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"))
      val out = tmpDir("graft_part")
      // S3/S4: static dt partition + dynamic sub-partition, idempotent
      // overwrite. Second write re-overwrites ONE partition with the
      // same rows: dynamic mode must replace it without clobbering the
      // sibling partitions (final state identical → oracle unchanged).
      val ds = java.sql.Date.valueOf("2026-01-01")
      PartitionedWriter.overwriteDaily(li, out, ds, Seq("l_returnflag"))
      PartitionedWriter.overwriteDaily(li.filter(col("l_returnflag") === "A"),
        out, ds, Seq("l_returnflag"))
      spark.read.parquet(out)
        .groupBy(col("dt").cast("string").as("dt"), col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_orderkey").cast(DecimalType(38, 0))).as("sum_key"))
    })
}
