package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** STREAMING funnel progression — the conversion face of the custom-
  * state family ([[Sessionize]] is its session-window sibling): each
  * user's funnel stage is a tiny state machine ((t1, prev, stage), 20
  * bytes) advanced per micro-batch via mapGroupsWithState, so a live
  * product stream answers "how many users have reached checkout
  * TODAY" per trigger without ever rescanning history — the batch
  * [[graft.ops.Events.funnel]] costs one pass per step over the full
  * event table every time it is asked.
  *
  * Semantics contract: the state machine replays the batch operator's
  * earliest-completion greedy EXACTLY — provided per-user event-time
  * order is preserved ACROSS batches (within a batch the group
  * iterator is sorted here). Out-of-order cross-batch delivery can
  * under-advance a stage the batch operator would have credited —
  * the same order-dependence the SCD2 fold documents — so the catalog
  * oracle stages the stream as ordered files and the spec pins the
  * multi-batch fold ≡ batch equality under time-split staging (the
  * in-order shape a replayed log or watermarked upstream produces).
  */
object FunnelStream {

  final case class FEvent(user_id: Long, ts_us: Long, event_type: String)
  final case class FState(t1: Long, prev: Long, stage: Int)
  final case class FProgress(user_id: Long, stage: Int)

  /** Per-user stage progression: 0 = not entered, i = reached step i.
    * Stage is monotone nondecreasing across emissions, so the final
    * per-user value is the max over the run's update-mode output. */
  def stages(events: Dataset[FEvent], steps: Seq[String],
      horizonUs: Option[Long]): Dataset[FProgress] = {
    require(steps.nonEmpty, "funnel: steps must be non-empty")
    require(horizonUs.forall(_ > 0), s"horizon must be positive")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[FState, FProgress](GroupStateTimeout.NoTimeout) {
        (u: Long, rows: Iterator[FEvent], state) =>
          var st = state.getOption.getOrElse(FState(0L, 0L, 0))
          // within a batch the iterator is unordered → sort; equal
          // timestamps are order-insensitive here (at most one equal-ts
          // event can advance: the next needs ts STRICTLY > prev)
          rows.toSeq.sortBy(_.ts_us).foreach { e =>
            if (st.stage == 0) {
              if (e.event_type == steps.head)
                st = FState(e.ts_us, e.ts_us, 1)
            } else if (st.stage < steps.length &&
                e.event_type == steps(st.stage) &&
                e.ts_us > st.prev &&
                horizonUs.forall(h => e.ts_us <= st.t1 + h)) {
              st = FState(st.t1, e.ts_us, st.stage + 1)
            }
          }
          state.update(st)
          FProgress(u, st.stage)
      }
  }

  /** Bounded run → the batch funnel report (step_idx, step, users,
    * permille) — schema-identical to [[graft.ops.Events.funnel]], so
    * the two share an oracle. `path` may be a single parquet file's
    * directory staging or a multi-file directory; with
    * `maxFilesPerTrigger = 1` each file is one micro-batch in
    * modification-time order. */
  def runFunnelToBatch(spark: SparkSession, path: String,
      steps: Seq[String], horizonSeconds: Option[Long],
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val qn = s"graft_funnel_${System.nanoTime()}"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fckpt")
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val reader = spark.readStream.schema(EventsStream.eventsFileSchema)
      val src = maxFilesPerTrigger
        .fold(reader)(m => reader.option("maxFilesPerTrigger", m))
        .parquet(path)
      val ev = src.select(col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type"))
        .as[FEvent]
      val q = stages(ev, steps, horizonSeconds.map(_ * 1000000L)).toDF()
        .writeStream.format("memory").queryName(qn)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("update").start()
      try q.processAllAvailable()
      finally q.stop()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      graft.core.Fs.deleteRecursively(ckpt)
    }
    // stage is monotone per user: the final value is the max emission
    val byStage = spark.table(qn)
      .groupBy("user_id").agg(max(col("stage")).as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val counts = steps.indices.map(i =>
      byStage.filter(_._1 >= i + 1).values.sum)
    val first = counts.head
    steps.zipWithIndex.map { case (s, i) =>
      (i + 1, s, counts(i),
        if (first == 0) 0L else counts(i) * 1000L / first)
    }.toDF("step_idx", "step", "users", "permille")
  }
}
