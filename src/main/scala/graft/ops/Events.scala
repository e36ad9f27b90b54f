package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Checkpoints

/** Event-sequence analytics over an (user, type, timestamp) event
  * stream: ordered-step funnel conversion and cohort retention — the
  * two warehouse questions every product-event table answers weekly,
  * and for an LLM-data pipeline the same shapes measure annotator /
  * user engagement with a labeling or feedback tool.
  *
  * Both operators are engine-exact (timestamp comparisons and integer
  * divisions only — no floats) and their only corpus-sized operations
  * are per-step filtered scans and user-keyed partial aggregations.
  */
object Events {

  /** Ordered-step funnel: for steps s₁…s_k, a user reaches step i when
    * an event of type sᵢ exists STRICTLY after their step-(i−1) time
    * (earliest-completion greedy — exact, because taking the earliest
    * feasible event only widens every later step's window), where the
    * step-1 time is the user's EARLIEST s₁ event. With `horizonSeconds`
    * set, steps 2…k must also land within that horizon of the step-1
    * time (the "converted within N days" gate).
    *
    * Scale shape: one pass per step — each scans only that step's
    * type-filtered slice (the predicate reaches the parquet scan) and
    * shuffles it once on the user key into a user-sized frame; the
    * previous step's frame joins co-partitioned (both sides hash on
    * the user). Reached frames are rotating-localCheckpointed and the
    * per-step cardinality is read off the checkpoint, so executor
    * storage holds at most two user-sized copies and nothing
    * corpus-sized. The k-row result is built driver-side from the k
    * scalar counts — the only driver data is the counts themselves.
    *
    * @return (step_idx, step, users, permille) — `permille` is the
    *         floor of users·1000 / step-1 users (1000 for step 1;
    *         all zeros when nobody reaches step 1). */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      horizonSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel: steps must be non-empty")
    require(horizonSeconds.forall(_ > 0),
      s"funnel: horizon must be positive: $horizonSeconds")
    val spark = events.sparkSession
    val ev = events.select(col(userCol).as("_u"), col(typeCol).as("_t"),
      col(tsCol).as("_ts"))
    val rotate = new Checkpoints.Rotating
    var reached = rotate(ev.filter(col("_t") === steps.head)
      .groupBy("_u")
      .agg(min(col("_ts")).as("_t1"))
      .select(col("_u").as("_ru"), col("_t1"), col("_t1").as("_tp")))
    // k driver ACTIONS (one count per step) is the intended shape,
    // not an accident: each count reads a frame that is already
    // localCheckpoint'd for the next step's join, so the marginal
    // cost is a cached-scan count job — cheaper than assembling the
    // k scalars through an extra union+agg job over the same frames,
    // and the per-step frames must exist anyway.
    val counts = ArrayBuffer(reached.count())
    for (s <- steps.tail) {
      val f = ev.filter(col("_t") === s)
      val inOrder = f("_ts") > reached("_tp")
      val cond = horizonSeconds.fold(inOrder) { h =>
        inOrder && f("_ts") <= reached("_t1") + expr(s"INTERVAL $h SECOND")
      }
      reached = rotate(f.join(reached, f("_u") === reached("_ru") && cond)
        .groupBy(col("_u").as("_ru"))
        .agg(min(col("_t1")).as("_t1"), min(col("_ts")).as("_tp")))
      counts += reached.count()
    }
    rotate.releaseLast()
    val first = counts.head
    import spark.implicits._
    steps.zipWithIndex.map { case (s, i) =>
      (i + 1, s, counts(i),
        if (first == 0) 0L else counts(i) * 1000L / first)
    }.toDF("step_idx", "step", "users", "permille")
  }

  /** Linear multi-touch attribution — the sibling of the as-of-join
    * last-touch model: every touch in the window before a conversion
    * shares the credit equally, in INTEGER PERMILLE (1000 div k per
    * touch, the division remainder granted to the LATEST touch — the
    * "adjusted linear" convention — so each conversion distributes
    * exactly 1000 and the totals are engine-exact). Conversions with
    * no in-window touch carry no credit rows.
    *
    * Scale shape: one per-user interval join (conversions × touches
    * within the window — shuffled on the user key, pair volume
    * bounded by per-user touch density × window), one per-conversion
    * window for k and the latest-touch rank (tie-broken by the id
    * column so equal timestamps stay deterministic), then a
    * types-sized aggregation.
    *
    * @return (touch_type, credit, conversions, touches) — `credit` in
    *         permille units (Σ over types = 1000 × attributed
    *         conversions), `conversions` = distinct conversions the
    *         type touched, `touches` = credited pair count. */
  def linearAttribution(events: DataFrame, idCol: String,
      userCol: String, typeCol: String, tsCol: String,
      conversionType: String, touchTypes: Seq[String],
      windowSeconds: Long): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(conversionType),
      s"conversion type '$conversionType' cannot also be a touch type")
    require(windowSeconds > 0, s"window must be positive: $windowSeconds")
    val base = events.select(col(idCol).as("_id"), col(userCol).as("_u"),
      col(typeCol).as("_t"), unix_micros(col(tsCol)).as("_ts"))
    val conv = base.filter(col("_t") === conversionType)
      .select(col("_id").as("_cid"), col("_u").as("_cu"),
        col("_ts").as("_cts"))
    val touch = base.filter(col("_t").isin(touchTypes: _*))
    val w = windowSeconds * 1000000L
    val pairs = touch.join(conv,
      touch("_u") === conv("_cu") &&
        touch("_ts") <= conv("_cts") &&
        touch("_ts") > conv("_cts") - lit(w))
    val byConv = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_cid"))
    val latestFirst = byConv
      .orderBy(col("_ts").desc, col("_id").desc)
    pairs
      .withColumn("_k", count(lit(1)).over(byConv))
      .withColumn("_rn", row_number().over(latestFirst))
      .select(col("_t").as("touch_type"), col("_cid"),
        (expr("1000L div _k") +
          when(col("_rn") === 1, expr("1000L % _k"))
            .otherwise(lit(0L))).as("_credit"))
      .groupBy("touch_type")
      .agg(sum(col("_credit")).as("credit"),
        count_distinct(col("_cid")).as("conversions"),
        count(lit(1)).as("touches"))
  }

  /** Time-to-convert quantiles — the metric that rides alongside
    * [[funnel]]'s conversion counts: among users who complete ALL
    * steps (under the same earliest-completion greedy and optional
    * horizon), the exact type-1 permille quantiles of the
    * whole-funnel duration (last-step time − first-step time) in
    * FLOOR SECONDS. Integer-exact end to end: µs difference, integer
    * division to seconds, then [[Stats.exactQuantiles]]'s integer
    * rank machinery (durations are bounded by the horizon — or the
    * corpus time span — so the bounded-cardinality contract holds by
    * construction at second granularity; quantize coarser for
    * multi-year spans).
    *
    * Same per-step scale shape as [[funnel]]; the extra work is one
    * users-sized duration projection and the quantile value-groupBy.
    *
    * @return (permille, v_at) — v_at in whole seconds; empty when no
    *         user completes the funnel. */
  def funnelDurations(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, steps: Seq[String],
      permilles: Seq[Int], horizonSeconds: Option[Long] = None)
      : DataFrame = {
    require(steps.size >= 2, s"funnelDurations: need >= 2 steps")
    require(horizonSeconds.forall(_ > 0),
      s"funnel: horizon must be positive: $horizonSeconds")
    val ev = events.select(col(userCol).as("_u"), col(typeCol).as("_t"),
      unix_micros(col(tsCol)).as("_ts"))
    val rotate = new Checkpoints.Rotating
    var reached = rotate(ev.filter(col("_t") === steps.head)
      .groupBy("_u")
      .agg(min(col("_ts")).as("_t1"))
      .select(col("_u").as("_ru"), col("_t1"), col("_t1").as("_tp")))
    for (s <- steps.tail) {
      val f = ev.filter(col("_t") === s)
      val inOrder = f("_ts") > reached("_tp")
      val cond = horizonSeconds.fold(inOrder) { h =>
        inOrder && f("_ts") <= reached("_t1") + lit(h * 1000000L)
      }
      reached = rotate(f.join(reached, f("_u") === reached("_ru") && cond)
        .groupBy(col("_u").as("_ru"))
        .agg(min(col("_t1")).as("_t1"), min(col("_ts")).as("_tp")))
    }
    val out = Stats.exactQuantiles(
      reached.select(expr("(_tp - _t1) div 1000000").as("_sec")),
      col("_sec"), permilles).localCheckpoint()
    rotate.releaseLast()
    out
  }

  /** Event-type transition matrix (first-order Markov counts): for
    * each user's event sequence ordered by (time, tiebreakCol), count
    * consecutive (from → to) type pairs across all users, with an
    * integer-permille row normalization (the empirical transition
    * probability, floor-divided — engine-exact, no doubles). The
    * explicit tiebreak makes simultaneous events deterministically
    * ordered on any engine — without it, equal timestamps would make
    * the matrix run-dependent.
    *
    * Scale shape: ONE user-keyed shuffle + per-user sort (the same
    * cost class as sessionization), a lag window, then a
    * types²-sized aggregation; the normalizer is a per-from window
    * over the tiny matrix itself.
    *
    * @return (from_type, to_type, transitions, permille) */
  def transitionMatrix(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, tiebreakCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_u")).orderBy(col("_ts"), col("_tb"))
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("from_type"))
    events
      .select(col(userCol).as("_u"), col(typeCol).as("_t"),
        col(tsCol).as("_ts"), col(tiebreakCol).as("_tb"))
      .select(col("_t").as("to_type"),
        lag(col("_t"), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("transitions"))
      .withColumn("_n", sum(col("transitions")).over(wf))
      .select(col("from_type"), col("to_type"), col("transitions"),
        expr("transitions * 1000L div _n").as("permille"))
  }

  /** Rolling N-day active users (the DAU/WAU/MAU family): for each
    * report day, the count of distinct users with ≥1 event in the
    * trailing `windowDays`-day window ending that day. A report day
    * exists iff its window contains at least one active user — i.e.
    * days [d, d+N) for every active day d; leading/trailing all-idle
    * days are absent rather than zero.
    *
    * Exact rolling distinct without a per-day window sort: the
    * (day, user) DISTINCT pairs (the only corpus-sized agg,
    * partial-aggregated map-side) fan out over the N offsets each pair
    * covers, dedup again per (report day, user) — a bounded ×N blowup
    * of an already days×users-sized frame — then count per day. Every
    * step is a set operation; no approximation, no floats.
    *
    * @return (day yyyy-MM-dd, active_users) */
  def rollingActive(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    events
      .select(to_date(col(tsCol)).as("_day"), col(userCol).as("_u"))
      .distinct()
      .select(col("_day"), col("_u"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("_o"))
      .select(date_add(col("_day"), col("_o")).as("_rd"), col("_u"))
      .distinct()
      .groupBy(date_format(col("_rd"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** Weekly cohort retention matrix: users are cohorted by the ISO
    * week (Monday-start, both engines' `date_trunc('week', …)`) of
    * their FIRST event; each (user, activity-week) pair counts once
    * toward (cohort_week, offset_week) where the offset is whole
    * weeks between the two week STARTS — an exact integer because
    * both endpoints are week-truncated dates (`datediff div 7`, no
    * epoch floats, no DST hazard under the pinned UTC session).
    *
    * Scale shape: one user-keyed partial agg for first-event times,
    * one co-partitioned join back (the groupBy output and the join
    * reuse the same user hash), a (user, cohort, week)-distinct that
    * partial-aggregates map-side, and a cohort×offset-sized final
    * agg. Nothing is ever wider than the event table itself.
    *
    * @return (cohort_week yyyy-MM-dd, offset_week, active_users) */
  def retentionMatrix(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val ev = events.select(col(userCol).as("_u"), col(tsCol).as("_ts"))
    val wk = (c: Column) => to_date(date_trunc("week", c))
    val first = ev.groupBy("_u").agg(min(col("_ts")).as("_f"))
      .select(col("_u").as("_fu"), wk(col("_f")).as("_cw"))
    ev.join(first, ev("_u") === first("_fu"))
      .select(col("_u"), col("_cw"),
        datediff(wk(col("_ts")), col("_cw")).cast("long").as("_d"))
      .select(col("_u"), col("_cw"), expr("_d div 7").as("offset_week"))
      .distinct()
      .groupBy(date_format(col("_cw"), "yyyy-MM-dd").as("cohort_week"),
        col("offset_week"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** Top-k entry paths: each user's first `pathLen` event types in
    * (time, tiebreak) order joined with `>`, counted across users,
    * top k by (users desc, path) — the sankey/"how do sessions start"
    * warehouse question. The explicit `tieCol` makes simultaneous
    * events engine-deterministic (the [[transitionMatrix]]
    * discipline); truncation to `pathLen` happens BEFORE the count so
    * a user with fewer events contributes their full shorter path.
    *
    * Scale shape: ONE user-keyed sort window (the only corpus-sized
    * shuffle), the per-user path assembled by a map-side
    * sort_array(collect_list) over ≤ pathLen structs, a paths-sized
    * partial-aggregated count, and the top-k planned as
    * TakeOrderedAndProject (per-partition heads merged — never a
    * global sort).
    *
    * @return (path, users), k rows. */
  def topPaths(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String, pathLen: Int = 3,
      k: Int = 10): DataFrame = {
    require(pathLen >= 1, s"topPaths: pathLen must be >= 1: $pathLen")
    require(k >= 1, s"topPaths: k must be >= 1: $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_u"))
      .orderBy(col("_ts"), col("_tie"))
    events
      .select(col(userCol).as("_u"), col(typeCol).as("_t"),
        col(tsCol).as("_ts"), col(tieCol).as("_tie"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= pathLen)
      .groupBy("_u")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("_rn"),
          col("_t")))), s => s.getField("_t")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("users"))
      .orderBy(col("users").desc, col("path"))
      .limit(k)
  }
}
