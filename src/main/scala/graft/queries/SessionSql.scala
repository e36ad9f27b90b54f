package graft.queries

/** Shared DuckDB replay of gap-based sessionization
  * ([[graft.streaming.Sessionize.sessionizeBatch]]) — the
  * [[MurmurSql]]/[[CmsSql]]/graph-fixture discipline applied to the
  * session family: the lag → boundary → cumulative-id chain had grown
  * to two inline copies (q_sessionize, q_stream_sessionize_ooo) with a
  * third consumer arriving (session-duration quantiles); one spelling,
  * one gap constant, rendered into all of them.
  */
object SessionSql {

  /** Session gap — the single constant both engines use. */
  val GapMs: Long = 600000L

  /** CTE chain ending in `g(user_id, ts_ms, sid)`: every event of
    * `events` labeled with its session id. Splice as `WITH $ctes, …`
    * (or pass as [[RankSketchSql.oracleOver]]'s prefix). */
  val ctes: String =
    s"""e AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
       s AS (SELECT user_id, ts_ms,
               CASE WHEN lag(ts_ms) OVER w IS NULL
                      OR ts_ms - lag(ts_ms) OVER w > $GapMs
                    THEN 1 ELSE 0 END AS ns
             FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)),
       g AS (SELECT user_id, ts_ms,
               sum(ns) OVER (PARTITION BY user_id ORDER BY ts_ms
                 ROWS UNBOUNDED PRECEDING) AS sid
             FROM s)"""

  /** The whole session report — the oracle q_sessionize and
    * q_stream_sessionize_ooo share. */
  val report: String =
    s"""WITH $ctes
       SELECT user_id, min(ts_ms) AS start_ms, max(ts_ms) AS end_ms,
              CAST(count(*) AS INT) AS n_events
       FROM g GROUP BY user_id, sid"""
}
