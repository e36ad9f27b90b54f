package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import graft.core.Tables
import graft.sources.{DerivedExtractors, EvmFixtures}
import graft.write.PartitionedWriter

/** SURVEY §2.1 source/sink surface on real files: schema-on-read JSON and
  * header-CSV scans (S1/S2) proven by lossless round-trips, and the
  * partitioned daily-overwrite sink (S3/S4) proven by write+readback.
  */
object SourceQueries extends QueryGroup {

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

    // ORC sink + scan roundtrip (Spark-native ORC; DuckDB cannot read
    // ORC, so the oracle is the roundtrip IDENTITY against the source
    // table — any write/read corruption breaks the hash)
    q("q_source_orc_roundtrip", "source",
      "SELECT n_nationkey, n_name, n_regionkey FROM nation") {
      (spark, dir) =>
      val n = Tables.df(spark, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      val out = tmpDir("graft_orc")
      n.write.mode("overwrite").orc(out)
      spark.read.schema(n.schema).orc(out)
    },

    q("q_partitioned_write", "sink",
      """SELECT '2026-01-01' AS dt, l_returnflag,
           count(*) AS cnt,
           CAST(sum(CAST(l_orderkey AS DECIMAL(38,0))) AS VARCHAR) AS sum_key
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
          sum(col("l_orderkey").cast(DecimalType(38, 0))).cast("string")
            .as("sum_key"))
    },

    // S12 — cross-warehouse transfer, end to end over a REAL JDBC
    // warehouse (embedded Derby, the one JDBC engine on the Spark
    // classpath): Transfer.run ships the table through JdbcTransferSink,
    // then the result is what the client warehouse holds.
    q("q_transfer_jdbc", "sink",
      "SELECT n_nationkey, n_name, n_regionkey FROM nation") { (spark, dir) =>
      import graft.pipeline.{JdbcTransferSink, Transfer, TransferClientSpec,
        TransferRawTable}
      val n = Tables.df(spark, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      val url = "jdbc:derby:memory:graft_transfer;create=true"
      Transfer.run(
        TransferClientSpec("client",
          raws = Seq(TransferRawTable("ethereum", "nation"))),
        graft.parse.ContractCatalog.inMemory(Nil),
        new JdbcTransferSink(url, numPartitions = 4),
        _ => n)
      spark.read.format("jdbc")
        .option("url", url).option("dbtable", "nation").load()
    },

    // S9 — derived extraction sources (reference: ethereum-etl CLI jobs)
    q("q_extract_contracts", "source",
      """SELECT '0xa' || l_partkey AS address,
           '0x' || lpad(hex(l_suppkey), 64, '0') AS bytecode,
           l_orderkey AS block_number
         FROM lineitem WHERE l_linenumber % 5 = 0""") { (spark, dir) =>
      val traces = EvmFixtures.traces(Tables.df(spark, dir, "lineitem"))
      DerivedExtractors.contractsFromTraces(traces)
        .select("address", "bytecode", "block_number")
    },

    q("q_extract_tokens", "source",
      """SELECT '0xc' || o_custkey AS address, o_orderkey AS block_number
         FROM orders WHERE o_orderkey % 2 = 0 OR o_orderkey % 3 = 0""") {
      (spark, dir) =>
        val contracts = EvmFixtures.contracts(Tables.df(spark, dir, "orders"))
        DerivedExtractors.tokensFromContracts(contracts)
          .select("address", "block_number")
    },

    q("q_extract_token_transfers", "source",
      """WITH li AS (
            SELECT l_orderkey, l_linenumber,
                   min(l_partkey) AS l_partkey, min(l_suppkey) AS l_suppkey
            FROM lineitem GROUP BY l_orderkey, l_linenumber)
          SELECT '0xa' || (l_partkey % 97) AS token_address,
                 '0x' || lpad(lower(hex(l_suppkey)), 40, '0') AS from_address,
                 '0x' || lpad(lower(hex(l_partkey % 97)), 40, '0') AS to_address,
                 CAST(l_partkey AS VARCHAR) AS value,
                 '0xt' || l_orderkey || '_' || l_linenumber
                   AS transaction_hash,
                 CAST(l_linenumber AS BIGINT) AS log_index,
                 l_orderkey AS block_number
          FROM li WHERE l_linenumber % 2 = 0""") { (spark, dir) =>
      val li = EvmFixtures.lineitemTx(Tables.df(spark, dir, "lineitem"))
      val otherTopic =
        graft.abi.Keccak256.eventTopic("Approval(address,address,uint256)")
      val pad64 = (c: org.apache.spark.sql.Column) =>
        lpad(lower(hex(c)), 64, "0")
      val logs = li.select(
        when(col("l_linenumber") % 2 === 0,
          lit(DerivedExtractors.TransferTopic))
          .otherwise(lit(otherTopic)).as("t0"),
        concat(lit("0x"), pad64(col("l_suppkey"))).as("t1"),
        concat(lit("0x"), pad64(col("l_partkey") % 97)).as("t2"),
        unhex(lpad(hex(col("l_partkey")), 64, "0")).as("unhex_data"),
        concat(lit("0xt"), col("l_orderkey").cast("string"), lit("_"),
          col("l_linenumber").cast("string")).as("transaction_hash"),
        col("l_linenumber").cast(LongType).as("log_index"),
        col("l_orderkey").as("block_number"),
        concat(lit("0xa"), (col("l_partkey") % 97).cast("string"))
          .as("address"))
        .withColumn("topics_arr", array(col("t0"), col("t1"), col("t2")))
        .drop("t0", "t1", "t2")
      DerivedExtractors.tokenTransfersFromLogs(logs)
        .withColumn("value", col("value").cast("string"))
    })
}
