package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.abi._
import graft.core.Tables
import graft.parse.ParseJob
import graft.sources.EvmFixtures

/** M4 — ABI decode (SURVEY §2.9), driven end to end through
  * ParseJob + the AbiDecodeEvent/AbiDecodeCall Catalyst expressions.
  * Fixtures ABI-encode deterministic values derived from the testdata in
  * SQL (event topics / call input hex built with lpad(hex(..))), decode
  * them with the engine, and the DuckDB oracle recomputes the expected
  * decoded values directly — so topic matching, selector matching, and
  * the binary head/tail decoder are all differential-tested.
  */
object AbiQueries extends QueryGroup {

  private val transferAbi =
    """{"name":"Transfer","type":"event","anonymous":false,"inputs":[
      {"indexed":true,"name":"from","type":"address"},
      {"indexed":true,"name":"to","type":"address"},
      {"indexed":false,"name":"value","type":"uint256"}]}"""
  private val transferEvent = AbiJson.parseEvent(transferAbi)

  private val transferFnAbi =
    """{"name":"transfer","type":"function","inputs":[
      {"name":"to","type":"address"},{"name":"amount","type":"uint256"}],
      "outputs":[{"name":"","type":"bool"}]}"""
  private val transferFn = AbiJson.parseFunction(transferFnAbi)

  private val erc20Contract =
    EvmContract("common", "erc20", None, List(transferEvent),
      List(transferFn))

  private def pad64(c: org.apache.spark.sql.Column) =
    lpad(lower(hex(c)), 64, "0")

  val queries: Seq[Q] = Seq(
    q("q_abi_decode_transfer", "abi", {
      val otherTopic = Keccak256.eventTopic("Approval(address,address,uint256)")
      s"""WITH li AS (
            SELECT l_orderkey, l_linenumber,
                   min(l_partkey) AS l_partkey, min(l_suppkey) AS l_suppkey
            FROM lineitem GROUP BY l_orderkey, l_linenumber)
          SELECT '0x' || lpad(lower(hex(l_suppkey)), 40, '0') AS "from",
                 '0x' || lpad(lower(hex(l_partkey % 97)), 40, '0') AS "to",
                 CAST(l_partkey AS VARCHAR) AS value,
                 '0xt' || l_orderkey || '_' || l_linenumber
                   AS transaction_hash,
                 CAST(l_linenumber AS BIGINT) AS log_index,
                 l_orderkey AS block_number,
                 '0xa' || (l_partkey % 97) AS address
          FROM li WHERE l_linenumber % 2 = 0
          -- rows with topic0 = $otherTopic must be filtered out"""
    }) { (spark, dir) =>
      val li = EvmFixtures.lineitemTx(Tables.df(spark, dir, "lineitem"))
      val otherTopic =
        Keccak256.eventTopic("Approval(address,address,uint256)")
      val logs = li.select(
        when(col("l_linenumber") % 2 === 0, lit(transferEvent.topic0))
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
      ParseJob.decodeEvents(logs, erc20Contract, transferEvent, transferAbi)
        .withColumn("value", col("value").cast("string"))
    },

    q("q_abi_decode_call", "abi", {
      s"""WITH li AS (
            SELECT l_orderkey, l_linenumber,
                   min(l_partkey) AS l_partkey, min(l_suppkey) AS l_suppkey
            FROM lineitem GROUP BY l_orderkey, l_linenumber)
          SELECT '0x' || lpad(lower(hex(l_partkey % 97)), 40, '0') AS "to",
                 CAST(l_suppkey AS VARCHAR) AS amount,
                 (l_linenumber % 2 <> 0) AS output_0,
                 '0xa' || (l_partkey % 97) AS to_address,
                 '0xt' || l_orderkey || '_' || l_linenumber
                   AS transaction_hash
          FROM li WHERE l_linenumber % 3 <> 0"""
    }) { (spark, dir) =>
      val li = EvmFixtures.lineitemTx(Tables.df(spark, dir, "lineitem"))
      val sel = transferFn.selector // 0x + 8 hex chars
      val badSel = "0xdeadbeef"
      val selCol = when(col("l_linenumber") % 3 =!= 0, lit(sel))
        .otherwise(lit(badSel))
      val traces = li.select(
        selCol.as("selector"),
        unhex(concat(substring(selCol, 3, 8),
          pad64(col("l_partkey") % 97),
          pad64(col("l_suppkey")))).as("unhex_input"),
        unhex(lpad(hex(col("l_linenumber") % 2), 64, "0"))
          .as("unhex_output"),
        concat(lit("0xa"), (col("l_partkey") % 97).cast("string"))
          .as("to_address"),
        concat(lit("0xt"), col("l_orderkey").cast("string"), lit("_"),
          col("l_linenumber").cast("string")).as("transaction_hash"))
      ParseJob.decodeCalls(traces, erc20Contract, transferFn, transferFnAbi)
        .withColumn("amount", col("amount").cast("string"))
    },

    // Seaport-shaped nested tuple[] round-trip: encode with AbiCodec
    // (UDF, test-harness only — not an engine hot path), decode with the
    // engine expression, count field mismatches. The oracle states the
    // invariant: every row decodes, zero mismatches.
    q("q_abi_roundtrip_nested", "abi",
      """SELECT (SELECT count(*) FROM
           (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem) t)
             AS n_rows,
           CAST(0 AS BIGINT) AS n_mismatch""") { (spark, dir) =>
      val li = EvmFixtures.lineitemTx(Tables.df(spark, dir, "lineitem"))
      val dataUdf = udf((ok: Long, ln: Long, pk: Long, sk: Long) =>
        SeaportRoundtrip.encode(ok, ln, pk, sk))
      val logs = li.select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"),
        array(lit(SeaportRoundtrip.event.topic0),
          concat(lit("0x"), pad64(col("l_suppkey"))),
          concat(lit("0x"), pad64(col("l_partkey")))).as("topics_arr"),
        dataUdf(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey")).as("unhex_data"))
      val decoded = logs.withColumn("d",
        AbiDecode.event(SeaportRoundtrip.abiJson, col("topics_arr"),
          col("unhex_data")))
      val ok = col("d").isNotNull &&
        col("d.orderHash") ===
          concat(lit("0x"), lpad(lower(hex(col("l_orderkey"))), 64, "0")) &&
        col("d.offerer") ===
          concat(lit("0x"), lpad(lower(hex(col("l_suppkey"))), 40, "0")) &&
        col("d.fulfiller") ===
          concat(lit("0x"), lpad(lower(hex(col("l_partkey") % 97)), 40, "0")) &&
        size(col("d.offer")) === 1 &&
        col("d.offer").getItem(0).getField("itemType") ===
          (col("l_linenumber") % 4).cast(LongType) &&
        col("d.offer").getItem(0).getField("amount") ===
          col("l_suppkey").cast("decimal(38,0)") &&
        size(col("d.consideration")) === 2 &&
        col("d.consideration").getItem(1).getField("recipient") ===
          concat(lit("0x"), lpad(lower(hex(col("l_suppkey") + 1)), 40, "0")) &&
        col("d.consideration").getItem(0).getField("identifier") ===
          col("l_orderkey").cast("decimal(38,0)")
      decoded.agg(count(lit(1)).as("n_rows"),
        sum(when(ok, 0L).otherwise(1L)).as("n_mismatch"))
    })
}

/** Seaport OrderFulfilled-shaped test event (nested tuple[] with dynamic
  * offsets — the hardest ABI shape, SURVEY §7.3 #1). Shape mirrors
  * `/root/reference/dags/resources/contracts/ethereum/seaport/
  * Seaport.json` OrderFulfilled. */
object SeaportRoundtrip {
  val abiJson: String =
    """{"name":"OrderFulfilled","type":"event","anonymous":false,"inputs":[
      {"indexed":false,"name":"orderHash","type":"bytes32"},
      {"indexed":true,"name":"offerer","type":"address"},
      {"indexed":true,"name":"zone","type":"address"},
      {"indexed":false,"name":"fulfiller","type":"address"},
      {"indexed":false,"name":"offer","type":"tuple[]","components":[
        {"name":"itemType","type":"uint8"},
        {"name":"token","type":"address"},
        {"name":"identifier","type":"uint256"},
        {"name":"amount","type":"uint256"}]},
      {"indexed":false,"name":"consideration","type":"tuple[]","components":[
        {"name":"itemType","type":"uint8"},
        {"name":"token","type":"address"},
        {"name":"identifier","type":"uint256"},
        {"name":"amount","type":"uint256"},
        {"name":"recipient","type":"address"}]}]}"""

  val event: AbiEvent = AbiJson.parseEvent(abiJson)

  private def addr(v: Long): String = f"0x$v%040x"
  private def b32(v: Long): String = f"0x$v%064x"

  /** Encode the non-indexed data region for one row (deterministic from
    * the four lineitem keys). */
  def encode(ok: Long, ln: Long, pk: Long, sk: Long): Array[Byte] = {
    val nonIndexed = event.inputs.filterNot(_.indexed)
    val types = nonIndexed.map(_.abiType)
    val offer = Seq(Seq(BigInt(ln % 4), addr(pk % 1000), BigInt(ok), BigInt(sk)))
    val consideration = Seq(
      Seq(BigInt(ln % 4), addr(pk % 1000), BigInt(ok), BigInt(sk), addr(sk)),
      Seq(BigInt((ln + 1) % 4), addr(pk % 1000 + 1), BigInt(ok + 1),
        BigInt(sk + 1), addr(sk + 1)))
    AbiCodec.encodeSeq(types,
      Seq(b32(ok), addr(pk % 97), offer, consideration))
  }
}
