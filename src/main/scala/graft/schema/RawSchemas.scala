package graft.schema

import org.apache.spark.sql.types._

/** The nine raw EVM resource schemas, transcribed from the reference DDL
  * (`/root/reference/dags/templates/evm_load_template.py:4-149`). These are
  * schema-on-read StructTypes applied to exported JSON lines (CSV for
  * prices) — see graft.source.RawTableReader.
  */
object RawSchemas {
  private def dec38: DecimalType = DecimalType(38, 0)

  /** evm_load_template.py:4-26 */
  val blocks: StructType = StructType(Seq(
    StructField("number", LongType),
    StructField("hash", StringType),
    StructField("parent_hash", StringType),
    StructField("nonce", StringType),
    StructField("sha3_uncles", StringType),
    StructField("logs_bloom", StringType),
    StructField("transactions_root", StringType),
    StructField("state_root", StringType),
    StructField("receipts_root", StringType),
    StructField("miner", StringType),
    StructField("difficulty", dec38),
    StructField("total_difficulty", dec38),
    StructField("size", LongType),
    StructField("extra_data", StringType),
    StructField("gas_limit", LongType),
    StructField("gas_used", LongType),
    StructField("timestamp", LongType),
    StructField("transaction_count", LongType),
    StructField("base_fee_per_gas", LongType)))

  /** evm_load_template.py:29-38 */
  val contracts: StructType = StructType(Seq(
    StructField("address", StringType),
    StructField("bytecode", StringType),
    StructField("function_sighashes", StringType),
    StructField("is_erc20", BooleanType),
    StructField("is_erc721", BooleanType),
    StructField("block_number", LongType)))

  /** evm_load_template.py:41-52 */
  val logs: StructType = StructType(Seq(
    StructField("log_index", LongType),
    StructField("transaction_hash", StringType),
    StructField("transaction_index", LongType),
    StructField("block_hash", StringType),
    StructField("block_number", LongType),
    StructField("address", StringType),
    StructField("data", StringType),
    StructField("topics", StringType)))

  /** evm_load_template.py:55-64 (CSV with header) */
  val prices: StructType = StructType(Seq(
    StructField("minute", TimestampType),
    StructField("price", DoubleType),
    StructField("decimals", LongType),
    StructField("contract_address", StringType),
    StructField("symbol", StringType),
    StructField("dt", DateType)))

  /** evm_load_template.py:67-80 */
  val receipts: StructType = StructType(Seq(
    StructField("transaction_hash", StringType),
    StructField("transaction_index", LongType),
    StructField("block_hash", StringType),
    StructField("block_number", LongType),
    StructField("cumulative_gas_used", LongType),
    StructField("gas_used", LongType),
    StructField("contract_address", StringType),
    StructField("root", StringType),
    StructField("status", LongType),
    StructField("effective_gas_price", LongType)))

  /** evm_load_template.py:83-93 */
  val tokenTransfers: StructType = StructType(Seq(
    StructField("token_address", StringType),
    StructField("from_address", StringType),
    StructField("to_address", StringType),
    StructField("value", dec38),
    StructField("transaction_hash", StringType),
    StructField("log_index", LongType),
    StructField("block_number", LongType)))

  /** evm_load_template.py:96-105 — decimals/total_supply are STRING on
    * purpose (uint256 can overflow DECIMAL(38,0)). */
  val tokens: StructType = StructType(Seq(
    StructField("address", StringType),
    StructField("symbol", StringType),
    StructField("name", StringType),
    StructField("decimals", StringType),
    StructField("total_supply", StringType),
    StructField("block_number", LongType)))

  /** evm_load_template.py:108-129 (shared by traces and geth_traces) */
  val traces: StructType = StructType(Seq(
    StructField("block_number", LongType),
    StructField("transaction_hash", StringType),
    StructField("transaction_index", LongType),
    StructField("from_address", StringType),
    StructField("to_address", StringType),
    StructField("value", dec38),
    StructField("input", StringType),
    StructField("output", StringType),
    StructField("trace_type", StringType),
    StructField("call_type", StringType),
    StructField("reward_type", StringType),
    StructField("gas", LongType),
    StructField("gas_used", LongType),
    StructField("subtraces", LongType),
    StructField("trace_address", StringType),
    StructField("error", StringType),
    StructField("status", LongType),
    StructField("trace_id", StringType)))

  /** evm_load_template.py:132-149 */
  val transactions: StructType = StructType(Seq(
    StructField("hash", StringType),
    StructField("nonce", LongType),
    StructField("block_hash", StringType),
    StructField("block_number", LongType),
    StructField("transaction_index", LongType),
    StructField("from_address", StringType),
    StructField("to_address", StringType),
    StructField("value", dec38),
    StructField("gas", LongType),
    StructField("gas_price", LongType),
    StructField("input", StringType),
    StructField("max_fee_per_gas", LongType),
    StructField("max_priority_fee_per_gas", LongType),
    StructField("transaction_type", LongType)))

  val byResource: Map[String, StructType] = Map(
    "blocks" -> blocks,
    "contracts" -> contracts,
    "logs" -> logs,
    "prices" -> prices,
    "receipts" -> receipts,
    "token_transfers" -> tokenTransfers,
    "tokens" -> tokens,
    "traces" -> traces,
    "geth_traces" -> traces,
    "transactions" -> transactions)
}
