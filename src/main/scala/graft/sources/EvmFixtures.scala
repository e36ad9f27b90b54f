package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Deterministic EVM-shaped raw tables derived from the driver's TPC-H-ish
  * testdata (`/root/repo/TESTDATA.md`, read-only). This is how the enrich
  * operators (`graft.enrich.Enrich`) get oracle-checked: the same
  * derivation is expressed in DuckDB SQL in `SparkEntry.oracleSql`, so the
  * whole enrich pipeline (derive → join → project → normalize) is
  * differential-tested end to end.
  *
  * Mapping: orders → blocks, lineitem → transactions/receipts/traces/
  * token_transfers, events → logs, part → tokens/contracts. All derived
  * values come from integer/string columns only (cross-engine exact).
  */
object EvmFixtures {

  /** blocks from orders: number = o_orderkey, timestamp = epoch seconds of
    * o_orderdate. */
  def blocks(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey").as("number"),
      concat(lit("0xb"), col("o_orderkey").cast("string")).as("hash"),
      concat(lit("0xp"), col("o_orderkey").cast("string")).as("parent_hash"),
      lit("0x0").as("nonce"),
      lit("0x0").as("sha3_uncles"),
      lit("0x0").as("logs_bloom"),
      lit("0x0").as("transactions_root"),
      lit("0x0").as("state_root"),
      lit("0x0").as("receipts_root"),
      concat(lit("0xm"), col("o_custkey").cast("string")).as("miner"),
      col("o_orderkey").cast(DecimalType(38, 0)).as("difficulty"),
      col("o_custkey").cast(DecimalType(38, 0)).as("total_difficulty"),
      (col("o_orderkey") % 1000).as("size"),
      lit("0x").as("extra_data"),
      lit(30000000L).as("gas_limit"),
      (col("o_custkey") * 21000).as("gas_used"),
      unix_timestamp(col("o_orderdate")).as("timestamp"),
      (col("o_orderkey") % 100).as("transaction_count"),
      (col("o_custkey") % 1000000000).as("base_fee_per_gas"))

  /** (l_orderkey, l_linenumber) is NOT unique in the testdata, but a
    * transaction hash must be: dedupe to one row per key (deterministic
    * min aggregates) before deriving transactions/receipts. */
  def lineitemTx(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(min(col("l_partkey")).as("l_partkey"),
        min(col("l_suppkey")).as("l_suppkey"))

  /** raw transactions from deduped lineitem ([[lineitemTx]]):
    * block_number = l_orderkey (FK into blocks), hash unique per
    * (orderkey, linenumber). */
  def transactions(lineitem: DataFrame): DataFrame =
    lineitemTx(lineitem).select(
      txHash.as("hash"),
      col("l_linenumber").cast(LongType).as("nonce"),
      concat(lit("0xb"), col("l_orderkey").cast("string")).as("block_hash"),
      col("l_orderkey").as("block_number"),
      col("l_linenumber").cast(LongType).as("transaction_index"),
      concat(lit("0xf"), col("l_suppkey").cast("string")).as("from_address"),
      concat(lit("0xa"), col("l_partkey").cast("string")).as("to_address"),
      col("l_partkey").cast(DecimalType(38, 0)).as("value"),
      col("l_partkey").as("gas"),
      col("l_suppkey").as("gas_price"),
      concat(lit("0x"), lpad(hex(col("l_partkey")), 8, "0"),
        lpad(hex(col("l_suppkey")), 64, "0")).as("input"),
      (col("l_suppkey") * 2).as("max_fee_per_gas"),
      col("l_suppkey").as("max_priority_fee_per_gas"),
      (col("l_linenumber") % 3).cast(LongType).as("transaction_type"))

  private def txHash =
    concat(lit("0xt"), col("l_orderkey").cast("string"), lit("_"),
      col("l_linenumber").cast("string"))

  /** receipts 1:1 with transactions (join key transaction_hash). */
  def receipts(lineitem: DataFrame): DataFrame =
    lineitemTx(lineitem).select(
      txHash.as("transaction_hash"),
      col("l_linenumber").cast(LongType).as("transaction_index"),
      concat(lit("0xb"), col("l_orderkey").cast("string")).as("block_hash"),
      col("l_orderkey").as("block_number"),
      (col("l_partkey") + col("l_suppkey")).as("cumulative_gas_used"),
      col("l_partkey").as("gas_used"),
      when(col("l_linenumber") === 1,
        concat(lit("0xn"), col("l_partkey").cast("string")))
        .otherwise(lit(null).cast("string")).as("contract_address"),
      lit("0x0").as("root"),
      (col("l_linenumber") % 2).cast(LongType).as("status"),
      col("l_suppkey").as("effective_gas_price"))

  /** raw logs from events: the three `topics` encodings of the reference
    * exporter, cycled by event_id % 3 (FIXTURES.md family A):
    *   0 → comma-joined, 1 → JSON array, 2 → bare single topic.
    * block_number joins into blocks on (event_id % 1500)+1 … instead we
    * reuse orders keys: block_number = user_id-th order is not stable, so
    * logs carry their own blocks via [[blocksForLogs]].
    */
  def logs(events: DataFrame): DataFrame = {
    val t0 = concat(lit("0xe"), (col("user_id") % 7).cast("string"))
    val t1 = concat(lit("0xd"), (col("event_id") % 5).cast("string"))
    events.select(
      col("event_id").as("log_index"),
      concat(lit("0xt"), col("event_id").cast("string")).as("transaction_hash"),
      (col("event_id") % 50).as("transaction_index"),
      concat(lit("0xb"), col("user_id").cast("string")).as("block_hash"),
      col("user_id").as("block_number"),
      concat(lit("0xa"), (col("user_id") % 97).cast("string")).as("address"),
      concat(lit("0x"), lpad(hex(col("event_id")), 64, "0")).as("data"),
      when(col("event_id") % 3 === 0, concat(t0, lit(","), t1))
        .when(col("event_id") % 3 === 1,
          concat(lit("[\""), t0, lit("\",\""), t1, lit("\"]")))
        .otherwise(t0).as("topics"))
  }

  /** blocks keyed by user_id so every logs row joins (distinct users). */
  def blocksForLogs(events: DataFrame): DataFrame =
    events.select(
      col("user_id").as("number"),
      concat(lit("0xb"), col("user_id").cast("string")).as("hash"),
      (col("user_id") * 1000 + 1600000000L).as("timestamp"))
      .distinct()

  /** raw traces from lineitem; trace_address '[]' marks root traces
    * (verify invariant, SURVEY §2.4 A2). */
  def traces(lineitem: DataFrame): DataFrame =
    lineitem.select(
      col("l_orderkey").as("block_number"),
      when(col("l_linenumber") % 7 === 0, lit(null).cast("string"))
        .otherwise(txHash).as("transaction_hash"),
      col("l_linenumber").cast(LongType).as("transaction_index"),
      concat(lit("0xf"), col("l_suppkey").cast("string")).as("from_address"),
      concat(lit("0xa"), col("l_partkey").cast("string")).as("to_address"),
      col("l_suppkey").cast(DecimalType(38, 0)).as("value"),
      concat(lit("0x"), lpad(hex(col("l_partkey") % 16), 8, "0"),
        lpad(hex(col("l_orderkey")), 64, "0")).as("input"),
      concat(lit("0x"), lpad(hex(col("l_suppkey")), 64, "0")).as("output"),
      when(col("l_linenumber") % 5 === 0, lit("create"))
        .otherwise(lit("call")).as("trace_type"),
      when(col("l_linenumber") % 2 === 0, lit("call"))
        .otherwise(lit("delegatecall")).as("call_type"),
      lit(null).cast("string").as("reward_type"),
      col("l_partkey").as("gas"),
      (col("l_partkey") % 10000).as("gas_used"),
      (col("l_linenumber") % 4).cast(LongType).as("subtraces"),
      when(col("l_linenumber") % 3 === 0, lit("[]"))
        .otherwise(concat(lit("["), (col("l_linenumber") % 3).cast("string"),
          lit("]"))).as("trace_address"),
      lit(null).cast("string").as("error"),
      lit(1L).as("status"),
      concat(lit("call_"), col("l_orderkey").cast("string"), lit("_"),
        col("l_linenumber").cast("string")).as("trace_id"))

  /** raw token_transfers from lineitem. */
  def tokenTransfers(lineitem: DataFrame): DataFrame =
    lineitem.select(
      concat(lit("0xk"), col("l_partkey").cast("string")).as("token_address"),
      concat(lit("0xf"), col("l_suppkey").cast("string")).as("from_address"),
      concat(lit("0xa"), (col("l_partkey") % 97).cast("string")).as("to_address"),
      // floor before decimal-cast: double→decimal rounding of .5 cents is
      // not guaranteed identical cross-engine, floor is
      floor(col("l_extendedprice")).cast(DecimalType(38, 0)).as("value"),
      txHash.as("transaction_hash"),
      col("l_linenumber").cast(LongType).as("log_index"),
      col("l_orderkey").as("block_number"))

  /** staged tokens from part (SO1/P5 incremental-load input). */
  def tokensStaged(part: DataFrame): DataFrame =
    part.select(
      concat(lit("0xk"), col("p_partkey").cast("string")).as("address"),
      col("p_brand").as("symbol"),
      col("p_name").as("name"),
      (col("p_size") % 19).cast("string").as("decimals"),
      // decimal-cast before string: double→string formatting is not
      // cross-engine stable, decimal→string is
      col("p_retailprice").cast(DecimalType(12, 2)).cast("string")
        .as("total_supply"),
      col("p_partkey").as("block_number"))

  /** Staged minute-price table from events (the prices enrich input,
    * `evm_load_template.py:246-257`): the five price columns plus the
    * staging `dt` the enrich projection must drop. Prices are
    * quarter-step doubles (exact binary fractions), so the
    * pass-through projection stringifies identically cross-engine. */
  def pricesStaged(events: DataFrame): DataFrame =
    events.select(
      date_trunc("minute", col("ts")).as("minute"),
      ((col("event_id") % 500).cast("double") / 4.0).as("price"),
      (col("user_id") % 18).as("decimals"),
      concat(lit("0xk"), col("user_id").cast("string"))
        .as("contract_address"),
      concat(lit("SYM"), (col("event_id") % 50).cast("string"))
        .as("symbol"),
      to_date(col("ts")).as("dt"))

  /** raw contracts from orders (1:1 with blocks so J1 always hits). */
  def contracts(orders: DataFrame): DataFrame =
    orders.select(
      concat(lit("0xc"), col("o_custkey").cast("string")).as("address"),
      lit("0x60806040").as("bytecode"),
      lit("0x06fdde03,0x95d89b41").as("function_sighashes"),
      (col("o_orderkey") % 2 === 0).as("is_erc20"),
      (col("o_orderkey") % 3 === 0).as("is_erc721"),
      col("o_orderkey").as("block_number"))
}
