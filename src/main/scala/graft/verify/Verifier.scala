package graft.verify

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's verify DAG (SURVEY §2.4, §5): per-day SQL assertions
  * of the form `if(cond, 1, raise_error(msg))`
  * (`/root/reference/dags/resources/verify/` SQL files). Exposed both
  * ways:
  *  - [[check]] — typed `Either` result for orchestration;
  *  - [[raiseSql]] — `raise_error` parity (the query itself throws on a
  *    violated invariant, exactly like the reference's Spark SQL).
  */
object Verifier {

  final case class VerifyError(name: String, message: String)

  /** blocks/transactions/logs/traces `_have_latest.sql`: the day's
    * partition is non-empty. */
  def haveLatest(df: DataFrame, name: String): Either[VerifyError, Long] = {
    val n = df.count()
    if (n > 0) Right(n)
    else Left(VerifyError(name, s"$name partition is empty"))
  }

  /** traces_null_address_equal_to_transaction_count.sql: #root traces
    * (trace_address = '[]') with non-null transaction_hash == #txs. */
  def rootTraceCountMatches(traces: DataFrame, transactions: DataFrame)
      : Either[VerifyError, Long] = {
    val rootTraces = traces
      .filter(col("trace_address") === "[]" &&
        col("transaction_hash").isNotNull)
      .count()
    val txs = transactions.count()
    if (rootTraces == txs) Right(txs)
    else Left(VerifyError("traces_vs_transactions",
      s"root traces $rootTraces != transactions $txs"))
  }

  /** `raise_error` parity: evaluates `if(cond, 1, raise_error(msg))`
    * over a 1-row aggregate, throwing inside the engine like the
    * reference verify SQL. Returns the probe DataFrame (collect to
    * trigger). */
  def raiseSql(spark: SparkSession, countDf: DataFrame,
      minRows: Long, msg: String): DataFrame = {
    countDf.agg(count(lit(1)).as("c"))
      .select(when(col("c") >= minRows, lit(1))
        .otherwise(raise_error(lit(msg))).as("ok"))
  }

  /** Run all five reference invariants over enriched frames. */
  def runAll(blocks: DataFrame, transactions: DataFrame, logs: DataFrame,
      traces: DataFrame): Seq[Either[VerifyError, Long]] = Seq(
    haveLatest(blocks, "blocks"),
    haveLatest(transactions, "transactions"),
    haveLatest(logs, "logs"),
    haveLatest(traces, "traces"),
    rootTraceCountMatches(traces, transactions))
}
