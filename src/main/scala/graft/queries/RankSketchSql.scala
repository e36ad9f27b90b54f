package graft.queries

/** Shared DuckDB replay of the dyadic rank sketch
  * ([[graft.ops.Sketch.rankGrid]] / `rankQuantiles`) — grid build AND
  * quantile descent, kept in ONE place next to the Scala constants the
  * Spark side uses (the [[MurmurSql]] / graph-fixture discipline: a
  * correctness-critical integer replay must have exactly one SQL
  * spelling, and the dims the two engines build with must be the same
  * compile-time constant or a silent fork yields a hash mismatch that
  * LOOKS like sketch error).
  *
  * The walk is a recursive CTE advancing ONE (level, child) probe per
  * step — at most 16 children × 16 levels = 256 steps per permille —
  * with the grid lookups as plain equi-joins on (level, r, bucket)
  * (the decorrelation shape DuckDB's recursive planner needs; a
  * correlated scalar subquery here is the known 28× cliff). The
  * bucket mixer is rendered by [[bucketCols]], byte-identical to
  * [[graft.ops.Sketch.rankBucket]] and its driver-side twin.
  */
object RankSketchSql {

  /** Grid dims + probe points — the single source both engines use.
    * depth 2 × width 8192: ≤ 16·2·8192 = 262,144 cells whatever the
    * corpus (the driver-side walk's bounded collect), with per-node
    * collision mass ~n/8192 — ~±2% rank error at sf0.1's 600k events,
    * shrinking as width is raised, independent of value-domain size. */
  val Depth = 2
  val Width = 8192
  val Permilles: Seq[Int] = Seq(10, 250, 500, 750, 990, 1000)

  /** Lateral-alias column chain computing the Lehmer–xorshift bucket
    * of (`prefix`, `rr`) into `b$sfx` — intermediates suffixed so two
    * chains can share one SELECT. `//` replays the unsigned shifts
    * (all operands are non-negative; every product < 2⁶³). */
  def bucketCols(prefix: String, rr: String, sfx: String): String =
    s"""($prefix % 2147483647 + 1) * 48271 % 2147483647 AS a$sfx,
       $prefix // 2147483648 AS hi$sfx,
       (a$sfx * 65537 + hi$sfx * 8191 + $rr * 2654435761)
         % 4294967296 AS m0$sfx,
       xor(m0$sfx, m0$sfx // 65536) AS m1$sfx,
       m1$sfx * 48271 % 2147483647 AS m2$sfx,
       xor(m2$sfx, m2$sfx // 8192) AS m3$sfx,
       m3$sfx % $Width AS b$sfx"""

  /** All 16 levels × [[Depth]] rows, one grid row per (v, level, r). */
  private val levelList: String = (0 until 16).mkString("[", ", ", "]")
  private val rList: String = (0 until Depth).mkString("[", ", ", "]")
  private val pList: String = Permilles.mkString("[", ", ", "]")

  /** Full oracle over `events`: build the grid from epoch-micro
    * timestamps, then descend it for each probe permille. Must splice
    * after nothing — it is the whole statement. */
  val oracle: String =
    oracleOver("SELECT epoch_us(ts) AS v FROM events WHERE ts IS NOT NULL")

  /** [[oracle]] parameterized over the sketched value: `vSelect` must
    * produce a single non-negative BIGINT column `v`; `prefixCtes`
    * (optional, trailing-comma-free) splice before it — so a derived
    * series (session durations, per-doc token counts) reuses the grid
    * build and the recursive descent verbatim instead of re-spelling
    * them (the graph-fixture / CmsSql discipline). */
  def oracleOver(vSelect: String, prefixCtes: String = ""): String =
    s"""WITH RECURSIVE
       ${if (prefixCtes.isEmpty) "" else prefixCtes + ","}
       v AS ($vSelect),
       cells AS (
         SELECT level, r, bg AS bucket, CAST(count(*) AS BIGINT) AS c
         FROM (
           SELECT level, r,
             ${bucketCols("(g.v // (CAST(1 AS BIGINT) << (4 * level)))",
                          "(level * " + Depth + " + r)", "g")}
           FROM v g
           CROSS JOIN (SELECT unnest($levelList) AS level) lv
           CROSS JOIN (SELECT unnest($rList) AS r) rs
         ) GROUP BY 1, 2, 3),
       n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
       t AS (SELECT p, (p * n.n + 999) // 1000 AS target
             FROM (SELECT unnest($pList) AS p) ps CROSS JOIN n),
       walk AS (
         SELECT p, target, 15 AS level, CAST(0 AS BIGINT) AS pfx,
                CAST(0 AS BIGINT) AS base, 0 AS j
         FROM t
         UNION ALL
         SELECT p, target,
           CASE WHEN go THEN level - 1 ELSE level END,
           CASE WHEN go THEN cp ELSE pfx END,
           CASE WHEN go THEN base ELSE base + e END,
           CASE WHEN go THEN 0 ELSE j + 1 END
         FROM (
           SELECT s.*,
             least(coalesce(c0.c, 0), coalesce(c1.c, 0)) AS e,
             (s.base + least(coalesce(c0.c, 0), coalesce(c1.c, 0))
                >= s.target OR s.j = 15) AS go
           FROM (
             SELECT w.p, w.target, w.level, w.pfx, w.base, w.j,
               w.pfx * 16 + w.j AS cp,
               ${bucketCols("cp", "(w.level * " + Depth + " + 0)", "0")},
               ${bucketCols("cp", "(w.level * " + Depth + " + 1)", "1")}
             FROM walk w WHERE w.level >= 0
           ) s
           LEFT JOIN cells c0 ON c0.level = s.level AND c0.r = 0
             AND c0.bucket = s.b0
           LEFT JOIN cells c1 ON c1.level = s.level AND c1.r = 1
             AND c1.bucket = s.b1
         )
       )
       SELECT CAST(p AS BIGINT) AS permille, pfx AS q_est
       FROM walk WHERE level = -1"""

  /** Grouped twin of [[oracle]] — per-event_type grids and walks
    * ([[graft.ops.Sketch.rankGridBy]]/`rankQuantilesBy`): the cells
    * carry the group key, the walk recursion carries it, and the two
    * grid lookups join on it — otherwise byte-identical arithmetic
    * (same [[bucketCols]] mixer, same [[Depth]]/[[Width]]/
    * [[Permilles]] constants). */
  val groupedOracle: String =
    s"""WITH RECURSIVE
       ${groupedWalkCtes(
         "SELECT event_type AS g, epoch_us(ts) AS v FROM events " +
           "WHERE ts IS NOT NULL")}
       SELECT g AS event_type, CAST(p AS BIGINT) AS permille,
              pfx AS q_est
       FROM walk WHERE level = -1"""

  /** The grouped grid + descent as a bare CTE block ending in
    * `walk(g, p, target, level, pfx, base, j)` — quantiles read off
    * `WHERE level = -1` as (g, p, pfx). `vSelect` must produce
    * (g, v: non-negative BIGINT). Embeddable into larger statements
    * (the source-dashboard composition) — the caller owns the
    * `WITH RECURSIVE` prefix and the trailing comma placement; CTE
    * names used: v, cells, n, t, walk. */
  def groupedWalkCtes(vSelect: String): String =
    s"""v AS ($vSelect),
       cells AS (
         SELECT g, level, r, bg AS bucket, CAST(count(*) AS BIGINT) AS c
         FROM (
           SELECT gg.g, level, r,
             ${bucketCols("(gg.v // (CAST(1 AS BIGINT) << (4 * level)))",
                          "(level * " + Depth + " + r)", "g")}
           FROM v gg
           CROSS JOIN (SELECT unnest($levelList) AS level) lv
           CROSS JOIN (SELECT unnest($rList) AS r) rs
         ) GROUP BY 1, 2, 3, 4),
       n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
       t AS (SELECT g, p, (p * n.n + 999) // 1000 AS target
             FROM (SELECT unnest($pList) AS p) ps CROSS JOIN n),
       walk AS (
         SELECT g, p, target, 15 AS level, CAST(0 AS BIGINT) AS pfx,
                CAST(0 AS BIGINT) AS base, 0 AS j
         FROM t
         UNION ALL
         SELECT g, p, target,
           CASE WHEN go THEN level - 1 ELSE level END,
           CASE WHEN go THEN cp ELSE pfx END,
           CASE WHEN go THEN base ELSE base + e END,
           CASE WHEN go THEN 0 ELSE j + 1 END
         FROM (
           SELECT s.*,
             least(coalesce(c0.c, 0), coalesce(c1.c, 0)) AS e,
             (s.base + least(coalesce(c0.c, 0), coalesce(c1.c, 0))
                >= s.target OR s.j = 15) AS go
           FROM (
             SELECT w.g, w.p, w.target, w.level, w.pfx, w.base, w.j,
               w.pfx * 16 + w.j AS cp,
               ${bucketCols("cp", "(w.level * " + Depth + " + 0)", "0")},
               ${bucketCols("cp", "(w.level * " + Depth + " + 1)", "1")}
             FROM walk w WHERE w.level >= 0
           ) s
           LEFT JOIN cells c0 ON c0.g = s.g AND c0.level = s.level
             AND c0.r = 0 AND c0.bucket = s.b0
           LEFT JOIN cells c1 ON c1.g = s.g AND c1.level = s.level
             AND c1.r = 1 AND c1.bucket = s.b1
         )
       )"""
}
