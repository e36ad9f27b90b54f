package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.abi.{AbiDecode, Keccak256}

/** S9 — derived extraction sources
  * (`/root/reference/dags/chains/exporters/python.py:149-168,171-191,
  * 194-212,271-290`): the reference shells out to ethereum-etl CLI jobs
  * that re-derive contracts from traces, tokens from contracts, and
  * token_transfers from logs. Re-expressed as DataFrame transforms so
  * they run inside the engine (filter + project + ABI decode — no
  * subprocess, no driver loop).
  */
object DerivedExtractors {

  /** contracts ⟵ create-type traces: the deployed address is the trace's
    * to_address, bytecode is the create output. */
  def contractsFromTraces(traces: DataFrame): DataFrame =
    traces
      .filter(col("trace_type") === "create" && col("status") === 1 &&
        col("to_address").isNotNull)
      .select(
        col("to_address").as("address"),
        col("output").as("bytecode"),
        lit(null).cast("string").as("function_sighashes"),
        lit(null).cast("boolean").as("is_erc20"),
        lit(null).cast("boolean").as("is_erc721"),
        col("block_number"))

  /** tokens ⟵ ERC-20/721 contracts (symbol/name/decimals come from RPC
    * calls in the reference exporter — out-of-engine → null here). */
  def tokensFromContracts(contracts: DataFrame): DataFrame =
    contracts
      .filter(col("is_erc20") === true || col("is_erc721") === true)
      .select(
        col("address"),
        lit(null).cast("string").as("symbol"),
        lit(null).cast("string").as("name"),
        lit(null).cast("string").as("decimals"),
        lit(null).cast("string").as("total_supply"),
        col("block_number"))

  val TransferTopic: String =
    Keccak256.eventTopic("Transfer(address,address,uint256)")

  private val transferAbi =
    """{"name":"Transfer","type":"event","anonymous":false,"inputs":[
      {"indexed":true,"name":"from","type":"address"},
      {"indexed":true,"name":"to","type":"address"},
      {"indexed":false,"name":"value","type":"uint256"}]}"""

  /** token_transfers ⟵ logs with the ERC-20 Transfer topic (3 topics =
    * both addresses indexed), decoded with the engine's ABI decoder. */
  def tokenTransfersFromLogs(enrichedLogs: DataFrame): DataFrame =
    enrichedLogs
      .filter(col("topics_arr").getItem(0) === TransferTopic &&
        size(col("topics_arr")) === 3)
      .withColumn("decoded",
        AbiDecode.event(transferAbi, col("topics_arr"), col("unhex_data")))
      .filter(col("decoded").isNotNull)
      .select(
        col("address").as("token_address"),
        col("decoded.from").as("from_address"),
        col("decoded.to").as("to_address"),
        col("decoded.value").as("value"),
        col("transaction_hash"),
        col("log_index"),
        col("block_number"))
}

/** S11 — token-list source (`/root/reference/dags/offchains/tokens.py:
  * 45-59`): the reference pulls a Dune spellbook YAML over the GitHub
  * API; here the YAML travels as a config string/file (zero-egress) and
  * is parsed with the bundled jackson-yaml. Shape mirrors the spellbook
  * `tokens` list: `- {address, symbol, decimals}`. */
object TokenListSource {
  import com.fasterxml.jackson.databind.ObjectMapper
  import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

  final case class TokenRef(address: String, symbol: String, decimals: Int)

  def parse(yaml: String): Seq[TokenRef] = {
    val mapper = new ObjectMapper(new YAMLFactory())
    val root = mapper.readTree(yaml)
    val tokens = root.path("tokens")
    (0 until tokens.size()).map { i =>
      val t = tokens.get(i)
      TokenRef(
        address = t.path("address").asText(),
        symbol = t.path("symbol").asText(),
        decimals = t.path("decimals").asInt())
    }
  }
}
