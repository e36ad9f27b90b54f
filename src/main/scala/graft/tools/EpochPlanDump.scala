package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.ops.Classifier

/** Dev tool (r20 optimization round): dumps EVERY executed plan a
  * 2-epoch classifier training emits, via QueryExecutionListener, so
  * the per-epoch plan shape (the loop the final frame's explain
  * cannot show) is reviewable as a text artifact — the evidence
  * behind plans/r20/classifier_epoch_{before,after}.txt.
  * Usage: runMain graft.tools.EpochPlanDump [outFile]
  */
object EpochPlanDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/epoch_plans.txt")
    val spark = GraftSession.local(8)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        plans.add(s"\n========== action=$f ==========\n" +
          qe.executedPlan.toString): Unit
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(ql)
    val labeled = Classifier.realVsShuffled(
      Tables.df(spark, dir, "documents"), "doc_id", "text")
    Classifier.train(labeled, "doc_id", "text", "y",
      Classifier.Config(epochs = 2))
    // listener bus is async — settle
    var i = 0
    var last = -1
    while (i < 100 && plans.size != last) {
      last = plans.size; Thread.sleep(50); i += 1
    }
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      plans.asScala.mkString("\n"))
    println(s"[epoch-plan-dump] wrote $out (${plans.size} plans)")
    spark.stop()
  }
}
