package graft.queries

/** Shared DuckDB replay of the count-min sketch grid
  * ([[graft.ops.Sketch.cmsTable]]) — the [[MurmurSql]] /
  * [[RankSketchSql]] discipline applied to the CMS family: the grid
  * rebuild (tokenize → exact token counts → unsigned Murmur3 →
  * Knuth/Lehmer row-mixed buckets → cell sums) must have exactly ONE
  * SQL spelling, and the dims both engines build with must be the
  * same compile-time constants, or a silent fork yields a hash
  * mismatch that looks like sketch error. Rendered into
  * `q_heavy_hitters_cms` (grid + top-k probe) and `q_stream_cms`
  * (the streamed fold's grid — cell-wise additive, so the streamed
  * grid IS this batch rebuild bit for bit).
  */
object CmsSql {

  /** Grid dims — the single source both engines use. depth 4 ×
    * width 1024: 4,096 cells whatever the corpus. */
  val Depth = 4
  val Width = 1024

  private val rList: String = (0 until Depth).mkString("[", ", ", "]")

  /** The Knuth/Lehmer row-mixed bucket — the one drift-risky line,
    * spelled once for the global and grouped grids. */
  private val mixer: String =
    s"""((u + rr.r * 2654435761) % 4294967296 * 48271)
        % 2147483647 % $Width"""

  /** [[gridCtes]] parameterized over the sketched corpus: `srcSelect`
    * must produce a single VARCHAR column `text` (the
    * [[RankSketchSql.oracleOver]] discipline — a derived or filtered
    * corpus reuses the tokenize → murmur → mixer → cell chain
    * verbatim instead of re-spelling it). Ends in
    * `cms(r, bucket, c)`; also leaves `tf(s, exact)` and
    * `tb(s, r, bucket)` for the probe SELECT. */
  def gridCtesOver(srcSelect: String): String =
    s"""tok AS (SELECT unnest(string_split(text, ' ')) AS s
                FROM ($srcSelect)),
       tf AS (SELECT s, CAST(count(*) AS BIGINT) AS exact
              FROM tok WHERE len(s) > 0 GROUP BY 1),
       strs AS (SELECT s FROM tf),
       ${MurmurSql.chain},
       tb AS (SELECT mm.s, rr.r, $mixer AS bucket
              FROM mm CROSS JOIN (SELECT unnest($rList) AS r) rr),
       cms AS (SELECT r, bucket, SUM(tf.exact) AS c
               FROM tb JOIN tf ON tb.s = tf.s GROUP BY 1, 2)"""

  /** CTE block ending in `cms(r, bucket, c)` — the grid over the
    * whitespace tokens of `documents.text`. Splice as
    * `WITH $gridCtes, …` (it already chains [[MurmurSql.chain]],
    * which consumes the `strs(s)` CTE it contains). */
  val gridCtes: String = gridCtesOver("SELECT text FROM documents")

  /** Grouped twin of [[gridCtesOver]]: per-group grids over one token
    * space. `srcSelect` must produce (g, text); ends in
    * `cms(g, r, bucket, c)`; `tb(s, r, bucket)` stays group-free (the
    * hash doesn't see the group — exactly like the Spark side, where
    * the bucket rides the token). */
  def gridCtesByOver(srcSelect: String): String =
    s"""tok AS (SELECT g,
                  unnest(string_split(text, ' ')) AS s
                FROM ($srcSelect)),
       tf AS (SELECT g, s, CAST(count(*) AS BIGINT) AS exact
              FROM tok WHERE len(s) > 0 GROUP BY 1, 2),
       strs AS (SELECT DISTINCT s FROM tf),
       ${MurmurSql.chain},
       tb AS (SELECT mm.s, rr.r, $mixer AS bucket
              FROM mm CROSS JOIN (SELECT unnest($rList) AS r) rr),
       cms AS (SELECT tf.g, tb.r, tb.bucket, SUM(tf.exact) AS c
               FROM tb JOIN tf ON tb.s = tf.s GROUP BY 1, 2, 3)"""

  /** [[gridCtesByOver]] over the documents table — the spelling the
    * two grouped heavy-hitter faces share. */
  def gridCtesBy(groupCol: String): String =
    gridCtesByOver(s"SELECT $groupCol AS g, text FROM documents")
}
