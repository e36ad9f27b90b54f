package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import graft.core.Tables

/** Core relational surface: aggregation, joins, set ops, windows — the
  * Spark-built-in operators the engine leans on (SURVEY §2.3-2.6 + §7.4
  * extensions). All numeric aggregates go through DECIMAL so the DuckDB
  * comparison is exact (double summation order is engine-dependent;
  * decimal addition is associative).
  */
object CoreQueries extends QueryGroup {
  private val dec = DecimalType(38, 6)

  val queries: Seq[Q] = Seq(
    q("q1_agg", "agg",
      """SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR)
             AS sum_price,
           count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus""") {
      (spark, dir) =>
        // decimal internally (associative, engine-independent sums); the
        // output column is its exact string rendering — DuckDB's pandas
        // bridge degrades DECIMAL to float64, so a decimal-typed output
        // can never byte-compare across engines
        Tables.df(spark, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity").cast(dec)).cast("string").as("sum_qty"),
            sum(col("l_extendedprice").cast(dec)).cast("string")
              .as("sum_price"),
            count(lit(1)).as("cnt"))
    },

    q("q_join_broadcast", "join",
      """SELECT p_brand,
           count(*) AS cnt,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS sum_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""") {
      (spark, dir) =>
        val li = Tables.df(spark, dir, "lineitem")
        val p = Tables.df(spark, dir, "part")
        // part is the small dimension → broadcast, no shuffle of lineitem
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "inner")
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("l_quantity").cast(dec)).cast("string").as("sum_qty"))
    },

    // the canonical dimension-chain rollup (supplier ⋈ nation ⋈
    // region): BOTH dimension joins broadcast — a fact-side row never
    // shuffles for a dimension attach, the first rule of warehouse
    // join planning. Also the query that exercises the last otherwise
    // untouched testdata table (supplier).
    q("q_dim_rollup", "join",
      """SELECT r.r_name AS region,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS sum_acctbal_cents
         FROM supplier s
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY r.r_name""") { (spark, dir) =>
      val s = Tables.df(spark, dir, "supplier")
      val n = Tables.df(spark, dir, "nation")
      val r = Tables.df(spark, dir, "region")
      // acctbal sums in exact integer CENTS (floor(x·100 + 0.5) is
      // engine-exact on doubles; a double→DECIMAL cast is not
      // guaranteed to round identically across engines)
      s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name").as("region"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(floor(col("s_acctbal") * 100 + 0.5).cast("long"))
            .as("sum_acctbal_cents"))
    },

    q("q_semi_anti_join", "join",
      """SELECT
           (SELECT count(*) FROM orders WHERE o_custkey IN
              (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'))
             AS building_orders,
           (SELECT count(*) FROM orders WHERE o_custkey NOT IN
              (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'))
             AS other_orders""") {
      (spark, dir) =>
        val o = Tables.df(spark, dir, "orders")
        val cust = Tables.df(spark, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("o_custkey"))
        val semi = o.join(cust, Seq("o_custkey"), "left_semi")
          .agg(count(lit(1)).as("building_orders"))
        val anti = o.join(cust, Seq("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("other_orders"))
        semi.crossJoin(anti)
    },

    q("q_except_setop", "setop",
      """SELECT CAST(k AS BIGINT) AS k FROM
           (SELECT l_partkey AS k FROM lineitem
            EXCEPT
            SELECT p_partkey AS k FROM part WHERE p_size < 25) t""") {
      (spark, dir) =>
        val li = Tables.df(spark, dir, "lineitem").select(col("l_partkey").as("k"))
        val p = Tables.df(spark, dir, "part")
          .filter(col("p_size") < 25).select(col("p_partkey").as("k"))
        li.except(p)
    },

    q("q_topk_window", "window",
      """SELECT o_custkey, o_orderkey, rnk FROM (
           SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rnk
           FROM orders) t
         WHERE rnk <= 3""") {
      (spark, dir) =>
        import org.apache.spark.sql.expressions.Window
        val o = Tables.df(spark, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.select(col("o_custkey"), col("o_orderkey"),
            row_number().over(w).as("rnk"))
          .filter(col("rnk") <= 3)
          .withColumn("rnk", col("rnk").cast(LongType))
    },

    // AS-OF join — "price in effect at event time". Sparse updates
    // (every 10th event) joined point-in-time onto the full stream;
    // DuckDB's native ASOF LEFT JOIN is the oracle for our union +
    // running-last formulation.
    q("q_asof_price", "join",
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS t_ms
                    FROM events),
          p AS (SELECT user_id, epoch_ms(ts) AS p_ms, max(value) AS price
                FROM events WHERE event_id % 10 = 0 GROUP BY 1, 2)
          SELECT e.event_id, e.user_id, e.t_ms, p.price
          FROM e ASOF LEFT JOIN p
            ON e.user_id = p.user_id AND e.t_ms >= p.p_ms""") {
      (spark, dir) =>
        val ev = Tables.df(spark, dir, "events")
        val left = ev.select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("t_ms"))
        // dedup updates at identical (key, time) so "which wins" is
        // deterministic on both engines
        val prices = ev.filter(col("event_id") % 10 === 0)
          .groupBy(col("user_id"), unix_millis(col("ts")).as("p_ms"))
          .agg(max(col("value")).as("price"))
        graft.ops.AsOfJoin.asOf(left, prices, Seq("user_id"),
          "t_ms", "p_ms", Seq("price"))
    },

    // range (containment) join — every event matched to the ±5-minute
    // windows around each 20th event of the same user. The bucketized
    // equi-join formulation differentials against DuckDB's native
    // inequality join.
    q("q_range_join", "join",
      """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS t_ms
                    FROM events),
          iv AS (SELECT event_id AS window_id, user_id,
                   epoch_ms(ts) - 300000 AS w_start,
                   epoch_ms(ts) + 300000 AS w_end
                 FROM events WHERE event_id % 20 = 0)
          SELECT p.event_id, p.t_ms, iv.window_id, iv.w_start, iv.w_end
          FROM p JOIN iv ON p.user_id = iv.user_id
            AND p.t_ms >= iv.w_start AND p.t_ms <= iv.w_end""") {
      (spark, dir) =>
        val ev = Tables.df(spark, dir, "events")
        val points = ev.select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("t_ms"))
        val intervals = ev.filter(col("event_id") % 20 === 0)
          .select(col("event_id").as("window_id"), col("user_id"),
            (unix_millis(col("ts")) - 300000L).as("w_start"),
            (unix_millis(col("ts")) + 300000L).as("w_end"))
        graft.ops.RangeJoin.pointInInterval(points, intervals,
            Seq("user_id"), "t_ms", "w_start", "w_end",
            binWidth = 600000L)
          .select(col("event_id"), col("t_ms"), col("window_id"),
            col("w_start"), col("w_end"))
    },

    // running balance per user — cumulative DECIMAL sum in a unique
    // total order (engines disagree on float window-sum association:
    // DuckDB uses a segment tree; decimal is associative so exact)
    q("q_running_balance", "window",
      """SELECT user_id, event_id, epoch_ms(ts) AS t_ms,
           CAST(sum(CAST(value AS DECIMAL(38,6))) OVER (
             PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
             ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS balance
         FROM events""") {
      (spark, dir) =>
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.df(spark, dir, "events")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("t_ms"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.select(col("user_id"), col("event_id"),
            unix_millis(col("ts")).as("t_ms"), col("value"))
          .withColumn("balance",
            sum(col("value").cast(dec)).over(w).cast("string"))
          .drop("value")
    },

    // HLL sketch invariant: the approximate distinct count must land
    // within 5% of truth (deterministic per dataset — no RNG). The
    // oracle states the invariant, q_abi_roundtrip_nested-style.
    q("q_approx_distinct", "agg",
      """SELECT count(DISTINCT user_id) AS n_exact,
           CAST(1 AS BIGINT) AS within_5pct
         FROM events""") {
      (spark, dir) =>
        Tables.df(spark, dir, "events")
          .agg(countDistinct(col("user_id")).as("n_exact"),
            approx_count_distinct(col("user_id")).as("n_approx"))
          .select(col("n_exact"),
            (abs(col("n_approx") - col("n_exact")) <=
              col("n_exact") * 0.05).cast("long").as("within_5pct"))
    },

    q("q_time_window_agg", "window",
      """SELECT strftime(time_bucket(INTERVAL 5 MINUTE, date_trunc('second', ts)),
                '%Y-%m-%d %H:%M:%S') AS window_start,
              event_type, count(*) AS n,
              CAST(sum(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS sum_value
         FROM events GROUP BY 1, 2""") {
      (spark, dir) =>
        // batch twin of the Structured Streaming tumbling-window agg
        // (graft.streaming.EventsStream uses the same expression)
        val ev = Tables.df(spark, dir, "events")
        ev.groupBy(
            window(date_trunc("second", col("ts")), "5 minutes"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(dec)).as("sum_value"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
              .as("window_start"),
            col("event_type"), col("n"),
            col("sum_value").cast("string").as("sum_value"))
    },

    // the Z-order layout key, value-oracled: user dimension × minute
    // bucket, bit-interleaved by the generated SQL twin of the same
    // shift/mask spread the writer sorts by (write.ZOrder; the layout
    // property itself — per-file min/max narrowing on BOTH dims — is
    // asserted in ZOrderSpec against a linear-sort baseline)
    q("q_zorder_keys", "layout",
      s"""SELECT event_id,
            ${graft.write.ZOrder.mortonKeySql("ua", "tb")} AS zkey
          FROM (SELECT event_id, user_id % 65536 AS ua,
                       (epoch_ms(ts) // 60000) % 65536 AS tb
                FROM events)""") { (spark, dir) =>
      val ev = Tables.df(spark, dir, "events")
      ev.select(col("event_id"),
        graft.write.ZOrder.mortonKey(
          col("user_id") % 65536,
          // `div` (not `/`): long / long in Spark is DOUBLE division,
          // whose rounding can cross an integer boundary; div matches
          // DuckDB's `//` exactly
          expr("(unix_millis(ts) div 60000) % 65536"))
          .as("zkey"))
    },

    // SLIDING windows (10 min span, 5 min slide): every event lands in
    // exactly span/slide = 2 windows; the oracle materializes both via
    // unnest — epoch-aligned on both engines
    q("q_sliding_window_agg", "window",
      """WITH e AS (
           SELECT time_bucket(INTERVAL 5 MINUTE,
                    date_trunc('second', ts)) AS w0,
                  event_type, CAST(value AS DECIMAL(38,6)) AS v
           FROM events),
          x AS (SELECT unnest([w0, w0 - INTERVAL 5 MINUTE]) AS ws,
                       event_type, v FROM e)
          SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
                 event_type, count(*) AS n,
                 CAST(sum(v) AS VARCHAR) AS sum_value
          FROM x GROUP BY 1, 2""") { (spark, dir) =>
      val ev = Tables.df(spark, dir, "events")
      ev.groupBy(
          window(date_trunc("second", col("ts")), "10 minutes",
            "5 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).as("sum_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("window_start"),
          col("event_type"), col("n"),
          col("sum_value").cast("string").as("sum_value"))
    },

    // INTERSECT (distinct semantics — the EXCEPT sibling): users who
    // both viewed and purchased
    q("q_intersect_setop", "setop",
      """SELECT user_id FROM events WHERE event_type = 'view'
         INTERSECT
         SELECT user_id FROM events WHERE event_type = 'purchase'""") {
      (spark, dir) =>
      val ev = Tables.df(spark, dir, "events")
      ev.filter(col("event_type") === "view").select("user_id")
        .intersect(
          ev.filter(col("event_type") === "purchase").select("user_id"))
    },

    // PIVOT with an explicit column domain (never the two-pass
    // inferred form — at 100 TB the inference pass is a full extra
    // scan and an unbounded output schema); oracle is the portable
    // CASE-sum spelling
    q("q_pivot_events", "agg", {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val cases = types.map(t =>
        s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t")
        .mkString(",\n              ")
      s"""SELECT user_id,
              $cases
          FROM events GROUP BY user_id"""
    }) { (spark, dir) =>
      val types = Seq("click", "view", "purchase", "signup", "error")
      val ev = Tables.df(spark, dir, "events")
      val p = ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
      types.foldLeft(p) { (d, t) =>
        d.withColumnRenamed(t, s"n_$t")
          .withColumn(s"n_$t", coalesce(col(s"n_$t"), lit(0L)))
      }
    },

    // UNPIVOT (melt) — the pivot inverse: the wide per-user counts
    // back to (user_id, event_type, n) long form. Like the pivot, the
    // column domain is EXPLICIT (schema-bounded at plan time, a pure
    // per-row Expand — map-only, no shuffle beyond the upstream agg);
    // round-tripping pivot∘unpivot reproduces the plain groupBy
    // counts, which is exactly what the oracle computes directly.
    // Zero cells survive the round trip (pivot fills them), so the
    // oracle's cross join keeps them too.
    q("q_unpivot_events", "agg",
      """SELECT u.user_id, t.event_type,
              CAST(coalesce(c.n, 0) AS BIGINT) AS n
          FROM (SELECT DISTINCT user_id FROM events) u
          CROSS JOIN (SELECT unnest(['click', 'view', 'purchase',
                        'signup', 'error']) AS event_type) t
          LEFT JOIN (SELECT user_id, event_type, count(*) AS n
                     FROM events GROUP BY 1, 2) c
            ON c.user_id = u.user_id AND c.event_type = t.event_type""") {
      (spark, dir) =>
      val types = Seq("click", "view", "purchase", "signup", "error")
      val ev = Tables.df(spark, dir, "events")
      val wide = types.foldLeft(
        ev.groupBy("user_id").pivot("event_type", types)
          .agg(count(lit(1)))) { (d, t) =>
        d.withColumn(t, coalesce(col(t), lit(0L)))
      }
      wide.unpivot(Array(col("user_id")), types.map(col).toArray,
        "event_type", "n")
    },

    // ROLLUP grouping sets with grouping_id — the warehouse subtotal
    // shape; DECIMAL sums emitted as strings (the round-2 rule)
    q("q_rollup_orders", "agg",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
              coalesce(o_orderpriority, 'ALL') AS priority,
              count(*) AS n,
              CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR)
                AS total,
              CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid
          FROM orders
          GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""") {
      (spark, dir) =>
      Tables.df(spark, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).as("total"),
          grouping_id().as("gid"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total").cast("string").as("total"),
          col("gid"))
    },

    // CUBE — the ROLLUP sibling with cross-dimension subtotals (the
    // priority-only rows ROLLUP never emits)
    q("q_cube_orders", "agg",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
              coalesce(o_orderpriority, 'ALL') AS priority,
              count(*) AS n,
              CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid
          FROM orders
          GROUP BY CUBE (o_orderstatus, o_orderpriority)""") {
      (spark, dir) =>
      Tables.df(spark, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("gid"))
    },

    // RANGE-frame window: per-user trailing 1-hour event-value sum at
    // every event — the time-decayed feature shape; RANGE frames bound
    // by the ORDER BY value, not row counts, so ties and gaps behave
    // identically across engines. DECIMAL sum → string (round-2 rule)
    q("q_range_frame_window", "window",
      """SELECT event_id, user_id,
              CAST(sum(CAST(value AS DECIMAL(38,6))) OVER (
                     PARTITION BY user_id ORDER BY epoch_ms(ts)
                     RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
                AS VARCHAR) AS sum_1h
          FROM events""") { (spark, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t_ms"))
        .rangeBetween(-3600000L, Window.currentRow)
      Tables.df(spark, dir, "events")
        .withColumn("t_ms", unix_millis(col("ts")))
        .select(col("event_id"), col("user_id"),
          sum(col("value").cast(dec)).over(w)
            .cast("string").as("sum_1h"))
    },

    // lag/lead over a UNIQUE total order (ts can tie; event_id breaks
    // it) — inter-event gap per user, the feature-engineering staple
    q("q_window_lag", "window",
      """SELECT event_id, user_id,
              epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
                PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
                AS gap_ms,
              lead(event_type) OVER (
                PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
                AS next_type
          FROM events""") { (spark, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t_ms"), col("event_id"))
      Tables.df(spark, dir, "events")
        .withColumn("t_ms", unix_millis(col("ts")))
        .select(col("event_id"), col("user_id"),
          (col("t_ms") - lag(col("t_ms"), 1).over(w)).as("gap_ms"),
          lead(col("event_type"), 1).over(w).as("next_type"))
    },

    // key-skew diagnosis: heaviest users by event count with exact
    // ppm share — the pre-join report that decides salting/AQE knobs
    q("q_skew_report", "diagnostic",
      """WITH c AS (SELECT user_id AS key, count(*) AS n_rows
                    FROM events GROUP BY user_id),
          t AS (SELECT sum(n_rows) AS total FROM c)
          SELECT key, CAST(n_rows AS BIGINT) AS n_rows,
                 CAST((n_rows * 1000000) // total AS BIGINT) AS share_ppm
          FROM c CROSS JOIN t
          ORDER BY n_rows DESC, key LIMIT 20""") { (spark, dir) =>
      graft.ops.Stats.skewReport(
        Tables.df(spark, dir, "events"), col("user_id"), 20)
    })
}
