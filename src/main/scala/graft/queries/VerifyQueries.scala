package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sources.EvmFixtures

/** SURVEY §2.4 verification aggregates (A1 scalar count, A2 null-skipping
  * count vs count(*), A3 scalar-subquery comparison) — the reference's
  * verify DAG invariants re-expressed over the testdata.
  */
object VerifyQueries extends QueryGroup {

  val queries: Seq[Q] = Seq(
    q("q_verify_counts", "verify",
      """SELECT (SELECT count(*) FROM lineitem) AS lineitem_cnt,
           (SELECT count(*) FROM orders) AS orders_cnt,
           (SELECT count(*) FROM events) AS events_cnt""") { (spark, dir) =>
      Tables.registerAll(spark, dir)
      spark.sql(
        """SELECT (SELECT count(*) FROM lineitem) AS lineitem_cnt,
             (SELECT count(*) FROM orders) AS orders_cnt,
             (SELECT count(*) FROM events) AS events_cnt""")
    },

    // the reference's root-trace invariant (verify/traces_null_address_
    // equal_to_transaction_count.sql): count(transaction_hash) skips nulls
    q("q_verify_null_counts", "verify",
      """SELECT
           (SELECT count(CASE WHEN l_linenumber % 7 <> 0 THEN 1 END)
            FROM lineitem WHERE l_linenumber % 3 = 0) AS root_tx_cnt,
           (SELECT count(*) FROM lineitem WHERE l_linenumber % 3 = 0)
             AS root_cnt,
           (SELECT count(*) FROM
              (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem) t)
             AS tx_cnt""") { (spark, dir) =>
      val li = Tables.df(spark, dir, "lineitem")
      val roots = EvmFixtures.traces(li)
        .filter(col("trace_address") === "[]")
        .agg(count(col("transaction_hash")).as("root_tx_cnt"),
          count(lit(1)).as("root_cnt"))
      val txs = EvmFixtures.transactions(li).agg(count(lit(1)).as("tx_cnt"))
      roots.crossJoin(txs)
    })
}
