package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query execution decomposition — the adjudication instrument
  * behind Bench's cross-round regression detector. Runs one catalog
  * query N times in a fresh JVM under a SparkListener and prints, per
  * run: wall time, job/stage/task counts, summed executor task time,
  * summed GC time, shuffle bytes, and the scheduler gap (wall − the
  * span actually covered by running jobs). Separates the three
  * mechanisms a slow reading can hide: tasks got slower (task-time
  * up), the JVM paused (GC up), or the driver/scheduler floor grew
  * (gap up, task-time flat) — exactly the classes the scan-shaped
  * calibration probe cannot tell apart.
  *
  * Usage: SPARK_GRAFT_DIAG_QUERY=q_pagerank [SPARK_GRAFT_DIAG_RUNS=3]
  * sbt "runMain graft.BenchDiag". One line per run + a summary line.
  */
object BenchDiag {

  private class Acc extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    @volatile var gcTimeMs = 0L
    @volatile var shuffleReadB = 0L
    @volatile var shuffleWriteB = 0L
    // job-active coverage: sum of per-job wall spans (jobs don't
    // overlap under a single sequential action)
    @volatile var jobSpanMs = 0L
    private val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs += 1; jobStart.put(j.jobId, j.time): Unit
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = {
      val s = jobStart.remove(j.jobId)
      if (s != 0L) jobSpanMs += j.time - s
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages += 1
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks += 1
      val m = t.taskMetrics
      if (m != null) {
        taskTimeMs += m.executorRunTime
        gcTimeMs += m.jvmGCTime
        shuffleReadB += m.shuffleReadMetrics.totalBytesRead
        shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val name = sys.env.getOrElse("SPARK_GRAFT_DIAG_QUERY",
      sys.error("set SPARK_GRAFT_DIAG_QUERY"))
    val runs = sys.env.get("SPARK_GRAFT_DIAG_RUNS").map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // "_trigger" — the streaming trigger-size amortization measurement
    // behind SCALE.md (r16 verdict #3): stages the events table as 12
    // time-scattered files and runs the OOO funnel fold with 1, 4,
    // and all-12 files per micro-batch; prints wall + a result hash
    // per setting. Result hashes must agree (FunnelReorderSpec pins
    // the invariance); walls show the per-batch floor amortizing.
    if (name == "_trigger") {
      val spark1 = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark1.sparkContext.setLogLevel("WARN")
      graft.core.GraftSession.tune(spark1)
      val ev = graft.core.Tables.df(spark1, sfDir, "events")
      val staged = java.nio.file.Files.createTempDirectory("graft_trig")
      val tmp = java.nio.file.Files.createTempDirectory("graft_trig_w")
      try {
        val base = System.currentTimeMillis()
        (0 until 12).foreach { i =>
          val d = tmp.resolve(s"b$i")
          ev.filter(org.apache.spark.sql.functions.col("event_id")
            % 12 === i).coalesce(1).write.parquet(d.toString)
          val part = java.nio.file.Files.list(d).toArray
            .map(_.toString).filter(_.endsWith(".parquet")).head
          val dst = staged.resolve(s"b$i.parquet")
          java.nio.file.Files.copy(java.nio.file.Paths.get(part), dst)
          dst.toFile.setLastModified(base - (13 - i) * 60000L): Unit
        }
        val steps = Seq("view", "click", "purchase")
        // one untimed warm run so stream-engine JIT doesn't land on
        // the first timed setting
        graft.streaming.FunnelStream.runFunnelToBatchReordered(spark1,
          staged.toString, steps, Some(604800L), 40L * 86400L,
          Some(12)).count()
        Seq(Some(1), Some(4), None).foreach { trig =>
          (1 to runs).foreach { i =>
            val t0 = System.nanoTime()
            val res = graft.streaming.FunnelStream
              .runFunnelToBatchReordered(spark1, staged.toString,
                steps, Some(604800L), 40L * 86400L, trig)
              .collect().map(_.toString).sorted.mkString("|")
            val w = (System.nanoTime() - t0) / 1e9
            println(f"diag _trigger files=${trig.getOrElse(12)}%2d " +
              f"run$i wall=$w%.3fs hash=${res.hashCode}")
          }
        }
      } finally {
        graft.core.Fs.deleteRecursively(staged)
        graft.core.Fs.deleteRecursively(tmp)
      }
      spark1.stop()
      return
    }
    // "_floor" — not a catalog query: measures the bare per-action
    // driver floor (plan → submit → 1 task → collect) with a trivial
    // 1-partition count, 100 reps after 20 warm reps. The number that
    // multiplies into every round-dominated query's wall time.
    val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      if (name == "_floor") { (s, _) => s.range(1).toDF() }
      else SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
    if (name == "_floor") {
      val spark0 = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark0.sparkContext.setLogLevel("WARN")
      (1 to 20).foreach(_ => spark0.range(1).count())
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        (1 to 100).foreach(_ => spark0.range(1).count())
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"diag _floor run$i perAction=${ms / 100}%.2fms " +
          f"total=${ms / 1000}%.3fs/100")
      }
      // same but through a small SQL plan (filter+agg over cached
      // range): adds Catalyst analysis+optimization per action
      val df = spark0.range(1000).toDF("v")
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        (1 to 100).foreach(_ =>
          df.filter(org.apache.spark.sql.functions.col("v") % 7 === 1)
            .groupBy((org.apache.spark.sql.functions.col("v") % 3)
              .as("g"))
            .count().count())
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"diag _floorSql run$i perAction=${ms / 100}%.2fms " +
          f"total=${ms / 1000}%.3fs/100")
      }
      // bare RDD job — no Catalyst, no AQE: isolates the raw
      // DAGScheduler → executor → result path
      val rdd = spark0.sparkContext.parallelize(Seq(1), 1)
      (1 to 20).foreach(_ => rdd.count())
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        (1 to 100).foreach(_ => rdd.count())
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"diag _floorRdd run$i perAction=${ms / 100}%.2fms")
      }
      // planning only: analysis + optimization + physical planning of
      // a fresh tiny plan, zero jobs
      (1 to 20).foreach(_ =>
        spark0.range(1).groupBy().count().queryExecution.executedPlan)
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        (1 to 100).foreach(_ =>
          spark0.range(1).groupBy().count().queryExecution.executedPlan)
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"diag _floorPlan run$i perAction=${ms / 100}%.2fms")
      }
      // same trivial count with AQE off — isolates the AQE
      // stage-materialization loop's contribution
      spark0.conf.set("spark.sql.adaptive.enabled", "false")
      (1 to 20).foreach(_ => spark0.range(1).count())
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        (1 to 100).foreach(_ => spark0.range(1).count())
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"diag _floorNoAqe run$i perAction=${ms / 100}%.2fms")
      }
      spark0.conf.set("spark.sql.adaptive.enabled", "true")
      // job floor vs task count: is the floor per JOB or per TASK?
      Seq(8, 32, 128).foreach { np =>
        val r = spark0.sparkContext.parallelize(1 to np, np)
        (1 to 10).foreach(_ => r.count())
        val t0 = System.nanoTime()
        (1 to 50).foreach(_ => r.count())
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"diag _floorRdd$np perAction=${ms / 50}%.2fms")
      }
      // one-task SQL count: range(1,2,1,numPartitions=1) — same plan
      // shape as _floor but 1-task stages
      val one = spark0.range(0, 1, 1, 1)
      (1 to 20).foreach(_ => one.count())
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        (1 to 100).foreach(_ => one.count())
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"diag _floorSql1p run$i perAction=${ms / 100}%.2fms")
      }
      spark0.stop()
      return
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SPARK_GRAFT_DIAG_NOAQE"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    (1 to runs).foreach { i =>
      val acc = new Acc
      spark.sparkContext.addSparkListener(acc)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wallMs = (System.nanoTime() - t0) / 1e6
      // listener bus is async (private API) — settle before reading
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(acc)
      println(f"diag $name run$i wall=${wallMs / 1000}%.3fs " +
        f"jobs=${acc.jobs} stages=${acc.stages} tasks=${acc.tasks} " +
        f"taskTime=${acc.taskTimeMs / 1000.0}%.2fs " +
        f"gc=${acc.gcTimeMs / 1000.0}%.2fs " +
        f"jobSpan=${acc.jobSpanMs / 1000.0}%.2fs " +
        f"gap=${(wallMs - acc.jobSpanMs) / 1000.0}%.2fs " +
        f"shufR=${acc.shuffleReadB / 1048576.0}%.1fMB " +
        f"shufW=${acc.shuffleWriteB / 1048576.0}%.1fMB")
    }
    spark.stop()
  }
}
