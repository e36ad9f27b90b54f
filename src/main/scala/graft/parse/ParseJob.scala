package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.abi.{AbiDecode, AbiEvent, AbiFunction, EvmContract}
import graft.functions.hashBucket

/** The parse stage (SURVEY §2.9/§3.2): enriched logs/traces → one typed
  * table per contract event/function, named
  * `{dataset}.{contract}_evt_{Name}` / `{contract}_call_{Name}`.
  *
  * Scale design: the filter includes the `address_hash`/`selector_hash`
  * bucket predicates built with the SAME `abs(hash(..))%10` expression
  * the writer used — on a partitioned warehouse these fold to constants
  * and prune to 1/100th of a day's files before any scan.
  */
object ParseJob {

  private def bucketPrune(partCol: String, value: Column, df: DataFrame): Column =
    if (df.columns.contains(partCol)) col(partCol) === hashBucket(value)
    else lit(true)

  /** Decode one event over enriched logs. `contract_address` absent in
    * the contract JSON (e.g. common/erc20) → decode every log matching
    * topic0 (`/root/reference/dags/resources/contracts/ethereum/common/
    * erc20.json` has no contract_address). */
  def decodeEvents(logs: DataFrame, contract: EvmContract,
      event: AbiEvent, abiJson: String): DataFrame = {
    // bucket-prune conjuncts LEAD: on a partitioned warehouse they fold
    // against partition values at planning time, and everywhere else
    // the codegen'd And short-circuits — a cheap int compare (the
    // bucket) gates the string/array compare, which matters when the
    // input is a derived view whose topics column is itself computed
    val topicPred =
      if (event.anonymous) lit(true)
      else bucketPrune("selector_hash", lit(event.topic0), logs) &&
        col("topics_arr").getItem(0) === lit(event.topic0)
    val addrPred = contract.contractAddress match {
      case Some(a) =>
        bucketPrune("address_hash", lit(a.toLowerCase), logs) &&
          col("address") === lit(a.toLowerCase)
      case None => lit(true)
    }
    val metaCols = Seq("block_timestamp", "block_number", "block_hash",
      "transaction_hash", "transaction_index", "log_index", "address", "dt")
      .filter(logs.columns.contains).map(col)
    logs.filter(topicPred && addrPred)
      .withColumn("decoded",
        AbiDecode.event(abiJson, col("topics_arr"), col("unhex_data")))
      .filter(col("decoded").isNotNull)
      .select(col("decoded.*") +: metaCols: _*)
  }

  /** Decode one function call over enriched traces (selector match on
    * `substr(input,1,10)`, materialized as `selector`). */
  def decodeCalls(traces: DataFrame, contract: EvmContract,
      fn: AbiFunction, abiJson: String): DataFrame = {
    // bucket prune leads, same short-circuit rationale as decodeEvents
    val selPred = bucketPrune("selector_hash", lit(fn.selector), traces) &&
      col("selector") === lit(fn.selector)
    val addrPred = contract.contractAddress match {
      case Some(a) =>
        bucketPrune("address_hash", lit(a.toLowerCase), traces) &&
          col("to_address") === lit(a.toLowerCase)
      case None => lit(true)
    }
    val metaCols = Seq("block_timestamp", "block_number", "block_hash",
      "transaction_hash", "transaction_index", "trace_address", "to_address",
      "from_address", "trace_id", "status", "error", "dt")
      .filter(traces.columns.contains).map(col)
    traces.filter(selPred && addrPred)
      .withColumn("decoded",
        AbiDecode.call(abiJson, col("unhex_input"), col("unhex_output")))
      .filter(col("decoded").isNotNull)
      .select(col("decoded.*") +: metaCols: _*)
  }
}
