package graft.tools

import graft.core.GraftSession
import graft.queries.Catalog

/** Plan auditor (dev tool): dumps formatted physical plans for selected
  * queries so scan pruning (PushedFilters/ReadSchema), join strategy
  * (BroadcastHashJoin vs SortMergeJoin) and WholeStageCodegen coverage
  * can be reviewed. Usage: runMain graft.tools.Explain [query ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q_join_broadcast", "q_enrich_transactions",
        "q_enrich_logs", "q_abi_decode_transfer", "q_knn_bruteforce")
    val sb = new StringBuilder
    names.foreach { n =>
      sb.append(s"\n========== $n ==========\n")
      val df = Catalog.byName(n).fn(spark, dir)
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/explain.txt"), sb.toString)
    println(s"[explain] wrote /tmp/explain.txt (${names.size} plans)")
    spark.stop()
  }
}
