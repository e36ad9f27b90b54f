package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming: per-user session windows via
  * flatMapGroupsWithState (gap-based sessionization — the canonical
  * stateful-op shape the reference's batch model cannot express).
  * Works identically over a bounded file stream (tests) and a live one.
  */
object Sessionize {

  final case class Event(user_id: Long, ts_ms: Long, event_type: String)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Int)

  /** Close a session after `gapMs` of inactivity. A session is emitted
    * when a later event (or a downstream heartbeat/sentinel) proves the
    * gap elapsed — no wall-clock timeouts, so results are deterministic
    * and `processAllAvailable` terminates on bounded inputs. (A live
    * deployment would add EventTimeTimeout + watermark to also flush
    * trailing sessions on idle streams.) */
  def sessionize(events: Dataset[Event], gapMs: Long)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Event],
         state: GroupState[SessionState]) =>
          // events within a micro-batch arrive unordered → sort
          val sorted = rows.toSeq.sortBy(_.ts_ms)
          var cur = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.ts_ms - s.last <= gapMs =>
                cur = Some(SessionState(s.start, e.ts_ms, s.n + 1))
              case Some(s) =>
                closed += Session(user, s.start, s.last, s.n)
                cur = Some(SessionState(e.ts_ms, e.ts_ms, 1))
              case None =>
                cur = Some(SessionState(e.ts_ms, e.ts_ms, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  /** Batch twin for differential testing: same gap semantics with a
    * window-function pipeline (lag → session boundary → cumulative id →
    * group). */
  def sessionizeBatch(spark: SparkSession, events: Dataset[Event],
      gapMs: Long): Dataset[Session] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_ms")
    events.toDF()
      .withColumn("prev", lag($"ts_ms", 1).over(w))
      .withColumn("new_session",
        when($"prev".isNull || $"ts_ms" - $"prev" > gapMs, 1).otherwise(0))
      .withColumn("session_id",
        sum($"new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts_ms").as("start_ms"), max($"ts_ms").as("end_ms"),
        count(lit(1)).cast("int").as("n_events"))
      .select($"user_id", $"start_ms", $"end_ms", $"n_events")
      .as[Session]
  }
}
