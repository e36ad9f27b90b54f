package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Similarity

/** ANN over the embeddings table: exact brute-force cosine top-k
  * (oracled — the double arithmetic is bit-identical to DuckDB's
  * list-lambda formulation, verified empirically) and the LSH-bucketed
  * scale paths, ALSO fully oracled: hyperplanes derive from a 3-round
  * Lehmer permutation whose arithmetic fits 64-bit integers (see
  * [[graft.ops.Similarity.planeComponent]]), so DuckDB rebuilds the
  * identical planes in plain BIGINT SQL and the whole operator —
  * planes → sign buckets → (multi-)probe join → exact verify → rank —
  * differentials cross-engine. Recall floors remain spec-pinned.
  */
object SimilarityQueries extends QueryGroup {

  /** `planes(t, p, pv)` CTE: component i of plane (t, p) is the
    * multiply–xorshift mixer of seed (t·1000+p)·2¹⁶+i scaled to
    * [−1, 1) — the EXACT integer/power-of-two-divide formula of
    * `Similarity.planeComponent` (u>>>15 ≡ u//32768, u>>>13 ≡ u//8192
    * on the non-negative BIGINT representation), so both engines see
    * bit-identical plane arrays. */
  private def planesSql(nTables: Int, nPlanes: Int, dim: Int): String =
    s"""planes AS (
          SELECT t, p, list(comp ORDER BY i) AS pv
          FROM (
            SELECT t, p, i,
              CAST(u4 * 16807 % 2147483647 AS DOUBLE)
                / 1073741824.0 - 1.0 AS comp
            FROM (
              SELECT t, p, i, xor(u3, u3 // 8192) AS u4 FROM (
                SELECT t, p, i, xor(u1, u1 // 32768) * 69621
                  % 2147483647 AS u3 FROM (
                  SELECT tt.t AS t, pp.p AS p, ii.i AS i,
                    (((tt.t * 1000 + pp.p) * 65536 + ii.i)
                      % 2147483646 + 1) * 48271 % 2147483647 AS u1
                  FROM generate_series(0, ${nTables - 1}) tt(t),
                       generate_series(0, ${nPlanes - 1}) pp(p),
                       generate_series(0, ${dim - 1}) ii(i)) s1) s2) s3) c
          GROUP BY t, p)"""

  /** `emb` (vectors as DOUBLE[] + norm, null-component rows excluded —
    * Spark's fold nulls the norm where DuckDB's list_sum would skip) and
    * `idx` (the indexable subset: corpus-dimensional, positive finite
    * norm — the isIndexable mirror). */
  private def embSql(src: String, dim: Int): String =
    s"""emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
            sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
              x -> x * x))) AS nrm
          FROM $src
          WHERE len(list_filter(embedding, x -> x IS NULL)) = 0),
        idx AS (SELECT * FROM emb
                WHERE len(v) = $dim AND nrm > 0 AND NOT isnan(nrm))"""

  /** `buckets(vec_id, t, b)`: the nPlanes-bit sign bucket per table —
    * bit p set iff the sequential-fold projection onto plane (t, p) is
    * ≥ 0, same IEEE accumulation order as DotProductFold. */
  private val bucketsSql: String =
    """buckets AS (
         SELECT e.vec_id, pl.t,
           CAST(SUM(CASE WHEN list_sum(list_transform(
                 list_zip(e.v, pl.pv), x -> x[1] * x[2])) >= 0
               THEN (CAST(1 AS BIGINT) << pl.p) ELSE 0 END) AS BIGINT) AS b
         FROM idx e CROSS JOIN planes pl
         GROUP BY e.vec_id, pl.t)"""

  /** Full PQ/ADC oracle: m=16 subspaces of 4 dims, ksub=64
    * Lehmer-sampled codebook vectors, shortlist 10·k, exact re-rank —
    * the DuckDB replay of `Similarity.pqTopK`'s every step. The
    * winner selection spells argmin as row_number (independent
    * formulation of the engine's min(struct)); d2/lut/ADC folds are
    * the same sequential arithmetic on both sides. */
  /** The k=4 greedy k-center trajectory as chained CTEs over source
    * table `src`, ending in {p}q8 (quantized corpus) and {p}c1..c4
    * (the picked centers, with v8 and md). `p` prefixes every CTE
    * name so the block composes next to other chains (the v6 curation
    * oracle runs it beside the SemDeDup CTEs, which also define `n`).
    * Shared by the selection, assignment, and v6 oracles. */
  private def kcenterCtes(src: String, p: String): String =
    s"""${p}n AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
               x -> x * x))) AS nrm
           FROM $src
           WHERE len(list_filter(embedding, x -> x IS NULL)) = 0),
         ${p}q8 AS (
           SELECT vec_id,
             list_transform(v, x -> CAST(floor(127.0 * (x / nrm) + 0.5)
               AS BIGINT)) AS v8
           FROM ${p}n WHERE nrm > 0),
         ${p}c1 AS (SELECT vec_id AS id, v8 FROM ${p}q8
                ORDER BY vec_id LIMIT 1),
         ${p}m1 AS (SELECT q8.vec_id, q8.v8,
                  CAST(list_sum(list_transform(list_zip(q8.v8, c1.v8),
                    p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS md
                FROM ${p}q8 q8 CROSS JOIN ${p}c1 c1),
         ${p}c2 AS (SELECT vec_id AS id, v8, md FROM ${p}m1
                ORDER BY md DESC, vec_id LIMIT 1),
         ${p}m2 AS (SELECT m1.vec_id, m1.v8,
                  least(m1.md,
                    CAST(list_sum(list_transform(list_zip(m1.v8, c2.v8),
                      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT))
                    AS md
                FROM ${p}m1 m1 CROSS JOIN ${p}c2 c2),
         ${p}c3 AS (SELECT vec_id AS id, v8, md FROM ${p}m2
                ORDER BY md DESC, vec_id LIMIT 1),
         ${p}m3 AS (SELECT m2.vec_id, m2.v8,
                  least(m2.md,
                    CAST(list_sum(list_transform(list_zip(m2.v8, c3.v8),
                      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT))
                    AS md
                FROM ${p}m2 m2 CROSS JOIN ${p}c3 c3),
         ${p}c4 AS (SELECT vec_id AS id, v8, md FROM ${p}m3
                ORDER BY md DESC, vec_id LIMIT 1)"""

  private def knnPqSql: String = {
    val (m, dsub, ksub, k, short) = (16, 4, 64, 5, 50)
    s"""WITH n0 AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
            sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
              x -> x * x))) AS nrm
          FROM embeddings
          WHERE len(list_filter(embedding, x -> x IS NULL)) = 0),
        emb AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS u
                FROM n0 WHERE len(v) = 64 AND nrm > 0 AND NOT isnan(nrm)),
        cb AS (SELECT row_number() OVER (ORDER BY hk, vec_id) - 1 AS cid, u
               FROM (SELECT vec_id, u,
                       ((((((vec_id % 2147483646 + 1) * 48271) % 2147483647)
                          * 48271) % 2147483647) * 48271) % 2147483647 AS hk
                     FROM emb) t
               ORDER BY hk, vec_id LIMIT $ksub),
        cbsub AS (SELECT jj.j AS j, cid,
                    u[jj.j*$dsub+1 : jj.j*$dsub+$dsub] AS cv,
                    list_sum(list_transform(
                      u[jj.j*$dsub+1 : jj.j*$dsub+$dsub],
                      x -> x * x)) AS cn2
                  FROM cb, generate_series(0, ${m - 1}) jj(j)),
        dists AS (
          SELECT e.vec_id, c.j, c.cid,
            c.cn2 - 2.0 * list_sum(list_transform(
              list_zip(e.u[c.j*$dsub+1 : c.j*$dsub+$dsub], c.cv),
              x -> x[1] * x[2])) AS d2
          FROM emb e CROSS JOIN cbsub c),
        codes AS (
          SELECT vec_id, list(cid ORDER BY j) AS code FROM (
            SELECT vec_id, j, cid,
              row_number() OVER (PARTITION BY vec_id, j
                ORDER BY d2, cid) AS rn
            FROM dists) t WHERE rn = 1 GROUP BY vec_id),
        luts AS (
          SELECT vec_id AS q_id, list(lv ORDER BY j, cid) AS lut FROM (
              SELECT e2.vec_id, c.j, c.cid,
                list_sum(list_transform(
                  list_zip(e2.u[c.j*$dsub+1 : c.j*$dsub+$dsub], c.cv),
                  x -> x[1] * x[2])) AS lv
              FROM emb e2 CROSS JOIN cbsub c
              WHERE e2.vec_id % 50 = 0) t GROUP BY vec_id),
        s AS (
          SELECT l.q_id, c.vec_id AS n_id,
            list_sum([l.lut[j*$ksub + c.code[j+1] + 1]
              for j in generate_series(0, ${m - 1})]) AS adc
          FROM luts l CROSS JOIN codes c WHERE l.q_id <> c.vec_id),
        short AS (SELECT q_id, n_id FROM (
            SELECT q_id, n_id,
              row_number() OVER (PARTITION BY q_id
                ORDER BY adc DESC, n_id) AS r
            FROM s) t WHERE r <= $short)
        SELECT q_id, n_id, rank, sim FROM (
          SELECT sh.q_id, sh.n_id,
            list_sum(list_transform(list_zip(q.u, c.u),
              x -> x[1] * x[2])) AS sim,
            CAST(row_number() OVER (PARTITION BY sh.q_id ORDER BY
              list_sum(list_transform(list_zip(q.u, c.u),
                x -> x[1] * x[2])) DESC, sh.n_id) AS BIGINT) AS rank
          FROM short sh JOIN emb q ON q.vec_id = sh.q_id
                        JOIN emb c ON c.vec_id = sh.n_id) t
        WHERE rank <= $k"""
  }

  /** Full IVF×PQ oracle: [[knnPqSql]]'s codebook/encode/LUT/ADC/re-rank
    * CTEs with the ADC cross product replaced by the IVF probe join —
    * cells/probes are `q_knn_ivf`'s coarse quantizer re-spelled on UNIT
    * vectors (norms are 1, so nearest-by-dot ≡ nearest-by-cosine; the
    * engine's min(struct(−dot, c_id)) is ORDER BY dot DESC, c_id). */
  /** DuckDB replay of the append path: frozen quantizers from the base
    * slice (centroid id-slice + Lehmer-ordered ksub codebook), then
    * nearest-cell assignment and per-subspace argmin-d2 encode of the
    * batch — the knnIvfPqSql building blocks with base/batch split
    * roles and no search stage. */
  private def ivfPqAppendSql: String = {
    val (m, dsub, ksub) = (16, 4, 64)
    val centEvery = 50
    s"""WITH n0 AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
            sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
              x -> x * x))) AS nrm
          FROM embeddings
          WHERE len(list_filter(embedding, x -> x IS NULL)) = 0),
        emb AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS u
                FROM n0 WHERE len(v) = 64 AND nrm > 0 AND NOT isnan(nrm)),
        base AS (SELECT * FROM emb WHERE vec_id % 7 != 3),
        batch AS (SELECT * FROM emb WHERE vec_id % 7 = 3),
        cent AS (SELECT vec_id AS c_id, u AS cu FROM base
                 WHERE vec_id % $centEvery = 0),
        cells AS (
          SELECT vec_id, c_id FROM (
            SELECT b.vec_id, ct.c_id,
              row_number() OVER (PARTITION BY b.vec_id ORDER BY
                list_sum(list_transform(list_zip(b.u, ct.cu),
                  x -> x[1] * x[2])) DESC, ct.c_id) AS rnk
            FROM batch b CROSS JOIN cent ct) t
          WHERE rnk = 1),
        cb AS (SELECT row_number() OVER (ORDER BY hk, vec_id) - 1 AS cid, u
               FROM (SELECT vec_id, u,
                       ((((((vec_id % 2147483646 + 1) * 48271) % 2147483647)
                          * 48271) % 2147483647) * 48271) % 2147483647 AS hk
                     FROM base) t
               ORDER BY hk, vec_id LIMIT $ksub),
        cbsub AS (SELECT jj.j AS j, cid,
                    u[jj.j*$dsub+1 : jj.j*$dsub+$dsub] AS cv,
                    list_sum(list_transform(
                      u[jj.j*$dsub+1 : jj.j*$dsub+$dsub],
                      x -> x * x)) AS cn2
                  FROM cb, generate_series(0, ${m - 1}) jj(j)),
        dists AS (
          SELECT b.vec_id, c.j, c.cid,
            c.cn2 - 2.0 * list_sum(list_transform(
              list_zip(b.u[c.j*$dsub+1 : c.j*$dsub+$dsub], c.cv),
              x -> x[1] * x[2])) AS d2
          FROM batch b CROSS JOIN cbsub c),
        codes AS (
          SELECT vec_id, list(cid ORDER BY j) AS code FROM (
            SELECT vec_id, j, cid,
              row_number() OVER (PARTITION BY vec_id, j
                ORDER BY d2, cid) AS rn
            FROM dists) t WHERE rn = 1 GROUP BY vec_id)
        SELECT ce.vec_id, ce.c_id,
               array_to_string(c.code, ',') AS code_csv
        FROM cells ce JOIN codes c USING (vec_id)"""
  }

  private def knnIvfPqSql: String = {
    val (m, dsub, ksub, k, short) = (16, 4, 64, 5, 50)
    val (centEvery, nProbe) = (50, 4)
    s"""WITH n0 AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
            sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
              x -> x * x))) AS nrm
          FROM embeddings
          WHERE len(list_filter(embedding, x -> x IS NULL)) = 0),
        emb AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS u
                FROM n0 WHERE len(v) = 64 AND nrm > 0 AND NOT isnan(nrm)),
        cent AS (SELECT vec_id AS c_id, u AS cu FROM emb
                 WHERE vec_id % $centEvery = 0),
        cells AS (
          SELECT vec_id AS n_id, c_id FROM (
            SELECT e.vec_id, ct.c_id,
              row_number() OVER (PARTITION BY e.vec_id ORDER BY
                list_sum(list_transform(list_zip(e.u, ct.cu),
                  x -> x[1] * x[2])) DESC, ct.c_id) AS rnk
            FROM emb e CROSS JOIN cent ct) t
          WHERE rnk = 1),
        probes AS (
          SELECT vec_id AS q_id, c_id FROM (
            SELECT e.vec_id, ct.c_id,
              row_number() OVER (PARTITION BY e.vec_id ORDER BY
                list_sum(list_transform(list_zip(e.u, ct.cu),
                  x -> x[1] * x[2])) DESC, ct.c_id) AS rnk
            FROM emb e CROSS JOIN cent ct WHERE e.vec_id % 50 = 0) t
          WHERE rnk <= $nProbe),
        cb AS (SELECT row_number() OVER (ORDER BY hk, vec_id) - 1 AS cid, u
               FROM (SELECT vec_id, u,
                       ((((((vec_id % 2147483646 + 1) * 48271) % 2147483647)
                          * 48271) % 2147483647) * 48271) % 2147483647 AS hk
                     FROM emb) t
               ORDER BY hk, vec_id LIMIT $ksub),
        cbsub AS (SELECT jj.j AS j, cid,
                    u[jj.j*$dsub+1 : jj.j*$dsub+$dsub] AS cv,
                    list_sum(list_transform(
                      u[jj.j*$dsub+1 : jj.j*$dsub+$dsub],
                      x -> x * x)) AS cn2
                  FROM cb, generate_series(0, ${m - 1}) jj(j)),
        dists AS (
          SELECT e.vec_id, c.j, c.cid,
            c.cn2 - 2.0 * list_sum(list_transform(
              list_zip(e.u[c.j*$dsub+1 : c.j*$dsub+$dsub], c.cv),
              x -> x[1] * x[2])) AS d2
          FROM emb e CROSS JOIN cbsub c),
        codes AS (
          SELECT vec_id, list(cid ORDER BY j) AS code FROM (
            SELECT vec_id, j, cid,
              row_number() OVER (PARTITION BY vec_id, j
                ORDER BY d2, cid) AS rn
            FROM dists) t WHERE rn = 1 GROUP BY vec_id),
        luts AS (
          SELECT vec_id AS q_id, list(lv ORDER BY j, cid) AS lut FROM (
              SELECT e2.vec_id, c.j, c.cid,
                list_sum(list_transform(
                  list_zip(e2.u[c.j*$dsub+1 : c.j*$dsub+$dsub], c.cv),
                  x -> x[1] * x[2])) AS lv
              FROM emb e2 CROSS JOIN cbsub c
              WHERE e2.vec_id % 50 = 0) t GROUP BY vec_id),
        s AS (
          SELECT l.q_id, ce.n_id,
            list_sum([l.lut[j*$ksub + c.code[j+1] + 1]
              for j in generate_series(0, ${m - 1})]) AS adc
          FROM luts l JOIN probes p ON p.q_id = l.q_id
                      JOIN cells ce ON ce.c_id = p.c_id
                      JOIN codes c ON c.vec_id = ce.n_id
          WHERE l.q_id <> ce.n_id),
        short AS (SELECT q_id, n_id FROM (
            SELECT q_id, n_id,
              row_number() OVER (PARTITION BY q_id
                ORDER BY adc DESC, n_id) AS r
            FROM s) t WHERE r <= $short)
        SELECT q_id, n_id, rank, sim FROM (
          SELECT sh.q_id, sh.n_id,
            list_sum(list_transform(list_zip(q.u, c.u),
              x -> x[1] * x[2])) AS sim,
            CAST(row_number() OVER (PARTITION BY sh.q_id ORDER BY
              list_sum(list_transform(list_zip(q.u, c.u),
                x -> x[1] * x[2])) DESC, sh.n_id) AS BIGINT) AS rank
          FROM short sh JOIN emb q ON q.vec_id = sh.q_id
                        JOIN emb c ON c.vec_id = sh.n_id) t
        WHERE rank <= $k"""
  }

  /** Full LSH top-k oracle (nPlanes=4, nTables=4, queries vec_id%50=0,
    * k=5), optionally with Hamming-1 multi-probe on the query side. */
  private def knnLshSql(multiProbe: Boolean): String = {
    val cand =
      if (!multiProbe)
        """cand AS (
             SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS n_id
             FROM buckets q JOIN buckets c ON q.t = c.t AND q.b = c.b
             WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id)"""
      else
        """probes AS (
             SELECT bq.vec_id, bq.t,
               CASE WHEN ff.f < 0 THEN bq.b
                    ELSE xor(bq.b, CAST(1 AS BIGINT) << ff.f) END AS b
             FROM buckets bq, generate_series(-1, 3) ff(f)
             WHERE bq.vec_id % 50 = 0),
           cand AS (
             SELECT DISTINCT p.vec_id AS q_id, c.vec_id AS n_id
             FROM probes p JOIN buckets c ON p.t = c.t AND p.b = c.b
             WHERE p.vec_id <> c.vec_id)"""
    s"""WITH ${embSql("embeddings", 64)},
        ${planesSql(4, 4, 64)},
        $bucketsSql,
        $cand,
        s AS (
          SELECT q_id, n_id,
            list_sum(list_transform(list_zip(qe.v, ne.v),
              x -> x[1] * x[2])) / (qe.nrm * ne.nrm) AS sim
          FROM cand JOIN idx qe ON qe.vec_id = cand.q_id
                    JOIN idx ne ON ne.vec_id = cand.n_id)
        SELECT q_id, n_id,
          CAST(row_number() OVER (PARTITION BY q_id
            ORDER BY sim DESC, n_id) AS BIGINT) AS rank, sim
        FROM s QUALIFY rank <= 5"""
  }

  /** Full LSH near-dup oracle (nPlanes=8, nTables=4, threshold 0.99)
    * over the injected-duplicate corpus; multi-probe expands the a-side
    * of the self-join exactly as the engine does. */
  private def nearDupLshSql(multiProbe: Boolean): String = {
    val cand =
      if (!multiProbe)
        """cand AS (
             SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
             FROM buckets a JOIN buckets b ON a.t = b.t AND a.b = b.b
             WHERE a.vec_id < b.vec_id)"""
      else
        """probes AS (
             SELECT bq.vec_id, bq.t,
               CASE WHEN ff.f < 0 THEN bq.b
                    ELSE xor(bq.b, CAST(1 AS BIGINT) << ff.f) END AS b
             FROM buckets bq, generate_series(-1, 7) ff(f)),
           cand AS (
             SELECT DISTINCT p.vec_id AS a_id, c.vec_id AS b_id
             FROM probes p JOIN buckets c ON p.t = c.t AND p.b = c.b
             WHERE p.vec_id < c.vec_id)"""
    s"""WITH corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 100000, embedding FROM embeddings
          WHERE vec_id % 10 = 0),
        ${embSql("corpus", 64)},
        ${planesSql(4, 8, 64)},
        $bucketsSql,
        $cand
        SELECT a_id, b_id, sim FROM (
          SELECT a_id, b_id,
            list_sum(list_transform(list_zip(ea.v, eb.v),
              x -> x[1] * x[2])) / (ea.nrm * eb.nrm) AS sim
          FROM cand JOIN emb ea ON ea.vec_id = cand.a_id
                    JOIN emb eb ON eb.vec_id = cand.b_id) t
        WHERE sim >= 0.99"""
  }

  /** `exact_pairs(a_id, b_id, sim)` CTE: the duplicate-injected
    * embedding corpus and its exact all-pairs cosine ≥ 0.99 pairs —
    * the labeled O(n²) oracle twin of the LSH near-dup path. Shared
    * by q_embed_neardup and q_embed_dedup_clusters so the two oracles
    * cannot drift. */
  private val exactNearDupPairsSql =
    """corpus AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         UNION ALL
         SELECT vec_id + 100000, CAST(embedding AS DOUBLE[])
         FROM embeddings WHERE vec_id % 10 = 0),
       exact_pairs AS (
         SELECT a_id, b_id, sim FROM (
           SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             list_sum(list_transform(list_zip(a.v, b.v),
               x -> x[1] * x[2])) /
             (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
              sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS sim
           FROM corpus a, corpus b WHERE a.vec_id < b.vec_id) t
         WHERE sim >= 0.99)"""

  /** Spark twin of [[exactNearDupPairsSql]]: (a_id, b_id, sim). The
    * double arithmetic is bit-identical cross-engine (sequential fold
    * dot product, per-row norms — identical doubles to per-pair
    * recomputation). */
  private[graft] def exactNearDupPairs(spark: SparkSession,
      dir: String): DataFrame = {
    val emb = Tables.df(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val corpus = emb.unionAll(
      emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
    val a = corpus.select(col("vec_id").as("a_id"),
      col("embedding").as("va"),
      Similarity.norm(col("embedding")).as("na"))
      .repartition(spark.sparkContext.defaultParallelism)
    val b = corpus.select(col("vec_id").as("b_id"),
      col("embedding").as("vb"),
      Similarity.norm(col("embedding")).as("nb"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("sim", Similarity.dot(col("va"), col("vb")) /
        (col("na") * col("nb")))
      .filter(col("sim") >= 0.99)
      .select("a_id", "b_id", "sim")
  }

  /** One kmeans assign/update round in SQL: assignment is the
    * row_number argmin over u × prev-centroids (independent spelling
    * of the engine's min(struct)); the update quantizes members to
    * exact ints (floor(u·2²⁴+0.5)), BIGINT-sums per (c_id, pos), and
    * renormalizes with the same fixed-order fold — the arithmetic
    * that lets an ITERATIVE fp algorithm differential exactly. */
  private def kmeansRound(prev: String, a: String,
      out: String): String =
    s"""$a AS (SELECT id, u, c_id FROM (
          SELECT u.id, u.u, $prev.c_id,
            row_number() OVER (PARTITION BY u.id ORDER BY
              list_sum(list_transform(list_zip(u.u, $prev.cu),
                x -> x[1] * x[2])) DESC, $prev.c_id) AS rnk
          FROM u CROSS JOIN $prev) t WHERE rnk = 1),
        ${a}q AS (SELECT c_id, e.pos AS pos, e.q AS q FROM (
          SELECT c_id, unnest([{'pos': i - 1,
              'q': CAST(floor(u[i] * 16777216.0 + 0.5) AS BIGINT)}
            for i in generate_series(1, len(u))]) AS e
          FROM $a) t),
        ${a}s AS (SELECT c_id, pos, sum(q) AS sq, count(*) AS cnt
                  FROM ${a}q GROUP BY 1, 2),
        ${a}m AS (SELECT c_id,
                    list(CAST(sq AS DOUBLE) / CAST(cnt AS DOUBLE)
                      ORDER BY pos) AS mv
                  FROM ${a}s GROUP BY c_id),
        ${a}r AS (SELECT c_id, mv,
                    sqrt(list_sum(list_transform(mv, x -> x * x)))
                      AS nrm
                  FROM ${a}m),
        $out AS (SELECT $prev.c_id,
                   CASE WHEN ${a}r.c_id IS NULL OR ${a}r.nrm = 0
                        THEN $prev.cu
                        ELSE list_transform(${a}r.mv,
                          x -> x / ${a}r.nrm) END AS cu
                 FROM $prev LEFT JOIN ${a}r USING (c_id))"""

  /** The 2-round kmeans chain over a `src(vec_id, v)` CTE (raw
    * DOUBLE[] vectors), ending in `c2(c_id, cu)` — shared verbatim by
    * q_kmeans_centroids and q_semdedup_kmeans so the clustering the
    * dedup runs on and the clustering the centroid query checks can
    * never drift. Also defines `kn(vec_id, v, nrm)` (null-element
    * rows excluded) and `u(id, u)` (unit vectors, nrm > 0). */
  private def kmeansChainCtes(stride: Int): String =
    s"""kn AS (SELECT vec_id, v,
              sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
            FROM src
            WHERE len(list_filter(v, x -> x IS NULL)) = 0),
        u AS (SELECT vec_id AS id, list_transform(v, x -> x / nrm) AS u
              FROM kn WHERE nrm > 0),
        c0 AS (SELECT id AS c_id, u AS cu FROM u WHERE id % $stride = 0),
        ${kmeansRound("c0", "a1", "c1")},
        ${kmeansRound("c1", "a2", "c2")}"""

  /** q_semdedup oracle: the duplicate-injected corpus, HIERARCHICAL
    * deterministic cells — the exact two-level routing semDedupPairs
    * runs (super slice at stride 50·8=400, each centroid keeps its
    * top-2 supers, each vector routes to its single nearest super and
    * argmins over that super-cell's centroids only) — then within-cell
    * exact-cosine pairs ≥ 0.95, recursive-CTE connected components,
    * min-id survivor — SemDeDup end to end in SQL. Spark's
    * `min(struct(-cos, id))` argmin ≡ row_number rank 1 here: both
    * take the head of the identical (cos DESC, id ASC) total order. */
  /** The hierarchical SemDeDup chain from a caller-supplied corpus
    * SELECT to `kept(vec_id)` (the surviving representatives) —
    * shared by q_semdedup and the v6 curation composition. */
  private def semDedupCtes(corpusSelect: String): String =
    s"""corpus AS ($corpusSelect),
       n AS (SELECT vec_id, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
             FROM corpus),
       cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cnrm
                FROM n WHERE vec_id % 50 = 0),
       sup AS (SELECT c_id AS s_id, cv AS sv, cnrm AS snrm
               FROM cent WHERE c_id % 400 = 0),
       cr AS (
         SELECT s_id, c_id, cv, cnrm FROM (
           SELECT sup.s_id, cent.c_id, cent.cv, cent.cnrm,
             row_number() OVER (PARTITION BY cent.c_id ORDER BY
               list_sum(list_transform(list_zip(cent.cv, sup.sv),
                 x -> x[1] * x[2])) / (cent.cnrm * sup.snrm) DESC,
               sup.s_id) AS rnk
           FROM cent CROSS JOIN sup) t
         WHERE rnk <= 2),
       vr AS (
         SELECT vec_id AS m_id, v, nrm, s_id FROM (
           SELECT a.vec_id, a.v, a.nrm, sup.s_id,
             row_number() OVER (PARTITION BY a.vec_id ORDER BY
               list_sum(list_transform(list_zip(a.v, sup.sv),
                 x -> x[1] * x[2])) / (a.nrm * sup.snrm) DESC,
               sup.s_id) AS rnk
           FROM n a CROSS JOIN sup) t
         WHERE rnk = 1),
       cells AS (
         SELECT m_id, v, nrm, c_id FROM (
           SELECT vr.m_id, vr.v, vr.nrm, cr.c_id,
             row_number() OVER (PARTITION BY vr.m_id ORDER BY
               list_sum(list_transform(list_zip(vr.v, cr.cv),
                 x -> x[1] * x[2])) / (vr.nrm * cr.cnrm) DESC,
               cr.c_id) AS rnk
           FROM vr JOIN cr ON vr.s_id = cr.s_id) t
         WHERE rnk = 1),
       prs AS (
         SELECT x.m_id AS a, y.m_id AS b
         FROM cells x JOIN cells y
           ON x.c_id = y.c_id AND x.m_id < y.m_id
         WHERE list_sum(list_transform(list_zip(x.v, y.v),
             p -> p[1] * p[2])) / (x.nrm * y.nrm) >= 0.95),
       edges AS (SELECT a, b FROM prs UNION SELECT b, a FROM prs),
       reach(id, r) AS (
         SELECT a, a FROM edges
         UNION
         SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b),
       losers AS (SELECT id FROM (SELECT id, min(r) AS component
                                  FROM reach GROUP BY id) c
                  WHERE component <> id),
       kept AS (SELECT vec_id FROM corpus
                WHERE vec_id NOT IN (SELECT id FROM losers))"""

  private val semDedupSql =
    s"""WITH RECURSIVE ${semDedupCtes(
         """SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            UNION ALL
            SELECT vec_id + 100000, CAST(embedding AS DOUBLE[])
            FROM embeddings WHERE vec_id % 10 = 0""")}
       SELECT vec_id FROM kept"""

  val queries: Seq[Q] = Seq(
    q("q_knn_bruteforce", "similarity",
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id % 50 = 0),
          c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv
                FROM embeddings),
          s AS (SELECT q_id, n_id,
                  list_sum(list_transform(list_zip(qv, nv),
                    x -> x[1] * x[2])) /
                  (sqrt(list_sum(list_transform(qv, x -> x * x))) *
                   sqrt(list_sum(list_transform(nv, x -> x * x)))) AS sim
                FROM q, c WHERE q_id <> n_id)
          SELECT q_id, n_id, rank, sim FROM (
            SELECT q_id, n_id, sim,
              CAST(row_number() OVER (PARTITION BY q_id
                ORDER BY sim DESC, n_id) AS BIGINT) AS rank
            FROM s) t
          WHERE rank <= 5""") { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 50 === 0)
      Similarity.bruteForceTopK(emb, queries, 5)
    },

    // embedding-cosine near-duplicate detection, ORACLE TWIN: the
    // all-pairs crossJoin is exactly DuckDB-reproducible and verifies
    // the sim arithmetic, but it is O(n²) by construction — the
    // production path is q_embed_neardup_lsh below (Similarity
    // .lshNearDup), whose recall this query also anchors in
    // SimilaritySpec. Corpus = embeddings with injected identical
    // vectors (+100000 ids), all pairs with cos ≥ 0.99.
    q("q_embed_neardup", "similarity",
      s"""WITH $exactNearDupPairsSql
         SELECT a_id, b_id, sim FROM exact_pairs""") { (spark, dir) =>
      exactNearDupPairs(spark, dir)
    },

    // cross-modality composition: the exact near-dup pairs feed the
    // SAME connected-components resolution the text dedup path uses —
    // embedding-level duplicate CLUSTERS, not just pairs (a—b—c chains
    // collapse to one component, where dropping both sides of every
    // pair independently would over-delete). The edge list is tiny
    // next to the corpus, so the CC label table stays pairs-sized —
    // the 100 TB argument is unchanged from q_dedup_clusters; swap
    // the labeled O(n²) pair twin for lshNearDup in production
    q("q_embed_dedup_clusters", "similarity",
      s"""WITH RECURSIVE $exactNearDupPairsSql,
          edges AS (SELECT a_id AS a, b_id AS b FROM exact_pairs
                    UNION SELECT b_id, a_id FROM exact_pairs),
          reach(id, r) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b)
          SELECT id AS vec_id, min(r) AS component
          FROM reach GROUP BY id""") { (spark, dir) =>
      graft.ops.Dedup.connectedComponents(
          exactNearDupPairs(spark, dir), "a_id", "b_id")
        .select(col("id").as("vec_id"), col("comp").as("component"))
    },

    // SemDeDup (Abbas et al. 2023): semantic dedup = coarse cells +
    // within-cell cosine pruning + CC survivors. Fully deterministic
    // (fixed-slice centroids, total-order tie-breaks, exact cosine), so
    // the WHOLE approximate operator differentials against DuckDB —
    // same corpus as q_embed_neardup (injected identical vectors, which
    // MUST land in the same cell: equal sims, equal tie-break).
    // Production scale shape: Σ|cell|² candidate volume — #centroids
    // tracks corpus size, the same knob contract as LSH planes.
    q("q_semdedup", "similarity", semDedupSql) { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val corpus = emb.unionAll(
        emb.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      Similarity.semDedup(corpus, 0.95).select("vec_id")
    },

    // curation composition v6 — the D4 shape (Tirumala et al. 2023:
    // semantic dedup THEN a diversity-aware pass): hierarchical
    // SemDeDup removes near-duplicate extras, greedy k-center picks
    // the 4 most mutually-distant survivors as strata anchors, and
    // the cluster-balanced subset keeps each anchor's 8 nearest
    // survivors — coverage-stratified sampling where every region of
    // embedding space contributes, instead of frequency-weighted
    // sampling that over-draws dense regions. Single oracle end to
    // end: the SemDeDup chain, the unrolled greedy trajectory, the
    // assignment argmin, and the per-center window all replay in one SQL
    // statement built from the SAME CTE blocks the standalone queries
    // verify — the composition cannot drift from the parts.
    q("q_curate_corpus_v6", "similarity",
      s"""WITH RECURSIVE ${semDedupCtes(
           "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings")},
         surv AS (SELECT e.vec_id, e.embedding FROM embeddings e
                  JOIN kept USING (vec_id)),
         ${kcenterCtes("surv", "k")},
         cents AS (SELECT id, v8, 1 AS rnd FROM kc1
                   UNION ALL SELECT id, v8, 2 FROM kc2
                   UNION ALL SELECT id, v8, 3 FROM kc3
                   UNION ALL SELECT id, v8, 4 FROM kc4),
         av AS (SELECT kq8.vec_id, cents.id AS center_id, cents.rnd,
                  CAST(list_sum(list_transform(
                    list_zip(kq8.v8, cents.v8),
                    p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT)
                    AS d2
                FROM kq8 CROSS JOIN cents),
         best AS (SELECT vec_id, center_id, d2 FROM (
                    SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY d2, rnd) AS pr FROM av) t
                  WHERE pr = 1)
         SELECT vec_id, center_id, CAST(rk AS BIGINT) AS rank_in_center,
                d2
         FROM (SELECT *, row_number() OVER (PARTITION BY center_id
                 ORDER BY d2, vec_id) AS rk FROM best) t
         WHERE rk <= 8""") { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.df(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      // checkpoint between stages (the curate-v5 discipline): the
      // survivor frame feeds the selection AND the assignment
      val surv = Similarity.semDedup(emb, 0.95).localCheckpoint()
      val centers = Similarity.kCenterSelect(surv, 4)
      val w = Window.partitionBy(col("center_id"))
        .orderBy(col("d2"), col("vec_id"))
      Similarity.kCenterAssign(surv, centers)
        .withColumn("rank_in_center", row_number().over(w).cast("long"))
        .filter(col("rank_in_center") <= 8)
        .select(col("vec_id"), col("center_id"), col("rank_in_center"),
          col("d2"))
    },

    // the near-dup SCALE path: sign-LSH blocking + exact cosine verify.
    // FULLY oracled since r10: Lehmer-derived planes rebuild in BIGINT
    // SQL, so blocking + verify differential end-to-end; recall vs the
    // all-pairs twin stays asserted in SimilaritySpec.
    q("q_embed_neardup_lsh", "similarity",
      nearDupLshSql(multiProbe = false)) { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val corpus = emb.unionAll(
        emb.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      Similarity.lshNearDup(corpus, 0.99)
    },

    // near-dup with Hamming-1 multi-probe on the probe side of the
    // self-join (r9), full oracle since r10; SimilaritySpec asserts
    // its pairs are a superset of the single-probe run above and its
    // recall vs the all-pairs twin dominates on perturbed near-misses.
    q("q_embed_neardup_lsh_multiprobe", "similarity",
      nearDupLshSql(multiProbe = true)) { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val corpus = emb.unionAll(
        emb.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      Similarity.lshNearDup(corpus, 0.99, multiProbe = true)
    },

    // LSH top-k, full oracle since r10 (Lehmer planes); recall vs
    // brute force stays asserted in SimilaritySpec.
    q("q_knn_lsh", "similarity",
      knnLshSql(multiProbe = false)) { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 50 === 0)
      Similarity.lshTopK(emb, queries, 5, nPlanes = 4)
    },

    // multi-probe variant (Hamming-1 query buckets), full oracle;
    // SimilaritySpec asserts its recall dominates the single-probe run
    // above on the identical deterministic inputs. Bench note (r10):
    // the xorshift plane mixer made buckets uniformly occupied, so
    // probing 5 of 16 buckets per table now touches ~24% more REAL
    // candidates than the old skewed planes did — ~0.35 s more verify
    // work at sf0.1 that buys recall@5 0.775 → 0.950 (measured
    // cross-engine in DuckDB). A recall jump, not a plan regression.
    q("q_knn_lsh_multiprobe", "similarity",
      knnLshSql(multiProbe = true)) { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 50 === 0)
      Similarity.lshTopK(emb, queries, 5, nPlanes = 4, multiProbe = true)
    },

    // Product-quantization ANN with ADC + exact re-rank: codebooks are
    // the subvectors of the 64 Lehmer-permutation-ranked corpus
    // vectors, encode is argmin-L2 with cid tie-break, the ADC fold is
    // j-ordered, and the shortlist re-ranks exactly — every step is
    // exact double arithmetic with total-order tie-breaks, so the
    // whole approximate operator differentials against DuckDB (same
    // stance as q_knn_ivf/q_knn_int8). Recall vs brute force is
    // additionally floor-pinned in SimilaritySpec.
    q("q_knn_pq", "similarity", knnPqSql) { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 50 === 0)
      Similarity.pqTopK(emb, queries, 5)
    },

    // IVF×PQ composition: IVF cells prune WHICH codes the ADC scan
    // reads (equi-join on cell id instead of the PQ cross product),
    // PQ codes bound what each read costs — the composed web-scale
    // index shape. Deterministic end to end (fixed-slice centroids ∘
    // Lehmer codebooks, both oracle-green precedents), so the whole
    // operator differentials against DuckDB; recall vs brute force is
    // floor-pinned in OpsSpec alongside the ivf-alone / pq-alone runs.
    q("q_knn_ivfpq", "similarity", knnIvfPqSql) { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 50 === 0)
      Similarity.ivfPqTopK(emb, queries, 5)
    },

    // incremental IVF×PQ ingest: the vec_id%7==3 slice arrives as the
    // "new batch" and is assigned + PQ-encoded against quantizers
    // derived from the REST of the corpus and frozen (cells re-train
    // offline; ingest appends). Every step is deterministic, so the
    // appended (cell, code) rows differential value-exactly — codes as
    // a CSV string (list-typed output columns don't survive the
    // comparator's pandas bridge uniformly)
    q("q_ivfpq_append", "similarity", ivfPqAppendSql) { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
      graft.ops.Similarity.ivfPqEncodeBatch(
          emb.filter(col("vec_id") % 7 === 3),
          emb.filter(col("vec_id") % 7 =!= 3))
        .select(col("vec_id"), col("c_id"),
          concat_ws(",",
            transform(col("code"), c => c.cast("string"))).as("code_csv"))
    },

    // IVF is fully deterministic given the bit-exact cosine: centroids
    // are a fixed slice (vec_id % 50 = 0), cell assignment / probe
    // ranking break ties by c_id, final rank by (sim DESC, n_id) — so
    // the whole operator differentials against DuckDB, not just rows.
    q("q_knn_ivf", "similarity",
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                      sqrt(list_sum(list_transform(
                        CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
                    FROM embeddings),
          cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cnrm
                   FROM n WHERE vec_id % 50 = 0),
          cells AS (
            SELECT vec_id AS n_id, c_id FROM (
              SELECT a.vec_id, cent.c_id,
                row_number() OVER (PARTITION BY a.vec_id ORDER BY
                  list_sum(list_transform(list_zip(a.v, cent.cv),
                    x -> x[1] * x[2])) / (a.nrm * cent.cnrm) DESC,
                  cent.c_id) AS rnk
              FROM n a CROSS JOIN cent) t
            WHERE rnk = 1),
          probes AS (
            SELECT vec_id AS q_id, c_id FROM (
              SELECT q.vec_id, cent.c_id,
                row_number() OVER (PARTITION BY q.vec_id ORDER BY
                  list_sum(list_transform(list_zip(q.v, cent.cv),
                    x -> x[1] * x[2])) / (q.nrm * cent.cnrm) DESC,
                  cent.c_id) AS rnk
              FROM n q CROSS JOIN cent WHERE q.vec_id % 50 = 0) t
            WHERE rnk <= 4),
          s AS (
            SELECT p.q_id, c.n_id,
              list_sum(list_transform(list_zip(qn.v, nn.v),
                x -> x[1] * x[2])) / (qn.nrm * nn.nrm) AS sim
            FROM probes p JOIN cells c USING (c_id)
            JOIN n qn ON qn.vec_id = p.q_id
            JOIN n nn ON nn.vec_id = c.n_id
            WHERE p.q_id <> c.n_id)
          SELECT q_id, n_id,
            CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY sim DESC, n_id) AS BIGINT) AS rank, sim
          FROM s QUALIFY rank <= 5""") { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 50 === 0)
      Similarity.ivfTopK(emb, queries, 5)
    },

    // top-k over the int8-QUANTIZED corpus (store int8, search int8 —
    // the memory-bound ANN shape). Fully deterministic: floor-based
    // quantization and integer dot products are engine-exact, so the
    // WHOLE approximate operator differentials against DuckDB;
    // SimilaritySpec additionally pins its recall vs full precision.
    q("q_knn_int8", "similarity",
      """WITH n AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
               x -> x * x))) AS nrm
           FROM embeddings
           WHERE len(list_filter(embedding, x -> x IS NULL)) = 0),
         q8 AS (
           SELECT vec_id,
             list_transform(v, x -> CAST(floor(127.0 * (x / nrm) + 0.5)
               AS BIGINT)) AS v8
           FROM n WHERE nrm > 0),
         s AS (
           SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             CAST(list_sum(list_transform(list_zip(q.v8, c.v8),
               p -> p[1] * p[2])) AS DOUBLE) / 16129.0 AS sim
           FROM q8 q JOIN q8 c ON q.vec_id <> c.vec_id
           WHERE q.vec_id % 50 = 0)
         SELECT q_id, n_id,
           CAST(row_number() OVER (PARTITION BY q_id
             ORDER BY sim DESC, n_id) AS BIGINT) AS rank, sim
         FROM s QUALIFY rank <= 5""") { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 50 === 0)
      Similarity.bruteForceTopKInt8(emb, queries, 5)
    },

    // greedy k-center diversity selection (farthest-point traversal)
    // over the int8-quantized corpus — the coreset/diverse-subset
    // primitive. Every step is integer-exact (floor quantization,
    // integer squared L2, ties to smallest id), so the oracle replays
    // the ENTIRE greedy trajectory with the k=4 rounds unrolled as
    // chained argmax CTEs — a wrong pick at any round cascades into a
    // hash mismatch.
    q("q_kcenter_select", "similarity",
      s"""WITH ${kcenterCtes("embeddings", "")}
         SELECT id AS vec_id, CAST(1 AS BIGINT) AS sel_round,
                CAST(0 AS BIGINT) AS d2_prev FROM c1
         UNION ALL SELECT id, 2, md FROM c2
         UNION ALL SELECT id, 3, md FROM c3
         UNION ALL SELECT id, 4, md FROM c4""") { (spark, dir) =>
      Similarity.kCenterSelect(Tables.df(spark, dir, "embeddings"), 4)
    },

    // nearest-center assignment against the k-center coreset — the
    // consumption half: per-point closest center (ties to the lowest
    // round), giving per-center occupancy and the realized covering
    // radius. Selection CTEs shared with q_kcenter_select so the two
    // oracles cannot drift.
    q("q_kcenter_assign", "similarity",
      s"""WITH ${kcenterCtes("embeddings", "")},
         cents AS (
           SELECT id, v8, 1 AS rnd FROM c1
           UNION ALL SELECT id, v8, 2 FROM c2
           UNION ALL SELECT id, v8, 3 FROM c3
           UNION ALL SELECT id, v8, 4 FROM c4),
         a AS (SELECT q8.vec_id, cents.id AS center_id, cents.rnd,
                 CAST(list_sum(list_transform(list_zip(q8.v8, cents.v8),
                   p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS d2
               FROM q8 CROSS JOIN cents)
         SELECT vec_id, center_id, CAST(rnd AS BIGINT) AS center_round,
                d2
         FROM a QUALIFY row_number() OVER (PARTITION BY vec_id
           ORDER BY d2, rnd) = 1""") { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
      Similarity.kCenterAssign(emb, Similarity.kCenterSelect(emb, 4))
    },

    // unit-normalize + symmetric int8 quantization, exploded to scalar
    // rows; floor(127x + 0.5) is engine-exact (no HALF_UP tie rules)
    q("q_embed_quantize", "similarity",
      """WITH n AS (
           SELECT vec_id, embedding AS v,
             sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
           FROM embeddings
           -- null-element semantics differ (Spark's fold nulls the
           -- whole norm, DuckDB's list_sum skips nulls): exclude such
           -- vectors explicitly so both engines agree by construction
           WHERE len(list_filter(embedding, x -> x IS NULL)) = 0)
         SELECT vec_id, u.i - 1 AS idx, u.q FROM (
           SELECT vec_id, unnest([{'i': i,
             'q': CAST(floor(127.0 * (CAST(v[i] AS DOUBLE) / nrm) + 0.5)
                       AS INT)}
             for i in generate_series(1, len(v))]) AS u
           FROM n WHERE nrm > 0) t""") { (spark, dir) =>
      val unit = Similarity.normalized(
        Tables.df(spark, dir, "embeddings"), "embedding")
        .filter(col("embedding_unit").isNotNull)
      unit.select(col("vec_id"),
          posexplode(Similarity.quantizeInt8(col("embedding_unit"))))
        .select(col("vec_id"), col("pos").cast("long").as("idx"),
          col("col").as("q"))
    },

    // deterministic spherical k-means, 2 Lloyd rounds from the stride
    // seeds — an ITERATIVE floating-point algorithm with a FULL value
    // oracle, possible because the mean is never an fp sum: member
    // components quantize to exact ints (floor(u·2^24 + 0.5)), sums
    // run in BIGINT (order-free), and the one division + fixed-order
    // renorm fold replay bit-identically. Output exploded to
    // (c_id, pos, val) scalar rows. Empty clusters and zero-norm
    // means fall back to the previous centroid on both engines.
    q("q_kmeans_centroids", "similarity",
      s"""WITH src AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
          ${kmeansChainCtes(25)}
          SELECT c_id, e.pos AS pos, e.val AS val FROM (
            SELECT c_id, unnest([{'pos': i - 1, 'val': cu[i]}
              for i in generate_series(1, len(cu))]) AS e
            FROM c2) t""") { (spark, dir) =>
      Similarity.kmeansCentroids(Tables.df(spark, dir, "embeddings"),
          seedEvery = 25, iters = 2)
        .select(col("c_id"), posexplode(col("cu")))
        .select(col("c_id"), col("pos").cast("long").as("pos"),
          col("col").as("val"))
    },

    // SemDeDup over k-means cells — the paper-faithful composition
    // (Abbas et al. cluster with k-means; q_semdedup stride-samples):
    // 2-round kmeans chain (shared CTEs with q_kmeans_centroids), flat
    // assignment against the learned unit centroids (cos = dot/|v|),
    // within-cell exact-cosine pairs, recursive-CTE CC, min-id
    // survivors — a fully-oracled iterative-clustering dedup, end to
    // end. Same injected-duplicate fixture as q_semdedup.
    q("q_semdedup_kmeans", "similarity",
      s"""WITH RECURSIVE src AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
            UNION ALL
            SELECT vec_id + 100000, CAST(embedding AS DOUBLE[])
            FROM embeddings WHERE vec_id % 10 = 0),
          ${kmeansChainCtes(25)},
          cells AS (
            SELECT m_id, v, nrm, c_id FROM (
              SELECT kn.vec_id AS m_id, kn.v, kn.nrm, c2.c_id,
                row_number() OVER (PARTITION BY kn.vec_id ORDER BY
                  list_sum(list_transform(list_zip(kn.v, c2.cu),
                    x -> x[1] * x[2])) / kn.nrm DESC, c2.c_id) AS rnk
              FROM kn CROSS JOIN c2 WHERE kn.nrm > 0) t
            WHERE rnk = 1),
          prs AS (
            SELECT x.m_id AS a, y.m_id AS b
            FROM cells x JOIN cells y
              ON x.c_id = y.c_id AND x.m_id < y.m_id
            WHERE list_sum(list_transform(list_zip(x.v, y.v),
                p -> p[1] * p[2])) / (x.nrm * y.nrm) >= 0.95),
          edges AS (SELECT a, b FROM prs UNION SELECT b, a FROM prs),
          reach(id, r) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.a, reach.r FROM edges e
            JOIN reach ON reach.id = e.b),
          losers AS (SELECT id FROM (SELECT id, min(r) AS component
                                     FROM reach GROUP BY id) c
                     WHERE component <> id)
          SELECT vec_id FROM src
          WHERE vec_id NOT IN (SELECT id FROM losers)""") { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val corpus = emb.unionAll(
        emb.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      val km = Similarity.kmeansCentroids(corpus, seedEvery = 25,
        iters = 2)
      Similarity.semDedupWithCentroids(corpus, 0.95, km)
        .select("vec_id")
    },

    // per-query recall@5 of the IVF index against brute-force ground
    // truth — the measurement that prices the nprobe/nlist knobs.
    // Both sides are the already-oracled q_knn_ivf / q_knn_bruteforce
    // formulations verbatim (deterministic centroids, total-order
    // tie-breaks), so the recall JOIN of two engine-exact frames is
    // engine-exact too: a FULL value oracle over an approximate
    // index's quality report. The exact side drives the join — a
    // query the index dropped entirely surfaces as 0, not as a
    // missing row.
    q("q_knn_recall_ivf", "similarity",
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                      sqrt(list_sum(list_transform(
                        CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
                    FROM embeddings),
          cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cnrm
                   FROM n WHERE vec_id % 50 = 0),
          cells AS (
            SELECT vec_id AS n_id, c_id FROM (
              SELECT a.vec_id, cent.c_id,
                row_number() OVER (PARTITION BY a.vec_id ORDER BY
                  list_sum(list_transform(list_zip(a.v, cent.cv),
                    x -> x[1] * x[2])) / (a.nrm * cent.cnrm) DESC,
                  cent.c_id) AS rnk
              FROM n a CROSS JOIN cent) t
            WHERE rnk = 1),
          probes AS (
            SELECT vec_id AS q_id, c_id FROM (
              SELECT q.vec_id, cent.c_id,
                row_number() OVER (PARTITION BY q.vec_id ORDER BY
                  list_sum(list_transform(list_zip(q.v, cent.cv),
                    x -> x[1] * x[2])) / (q.nrm * cent.cnrm) DESC,
                  cent.c_id) AS rnk
              FROM n q CROSS JOIN cent WHERE q.vec_id % 50 = 0) t
            WHERE rnk <= 4),
          si AS (
            SELECT p.q_id, c.n_id,
              list_sum(list_transform(list_zip(qn.v, nn.v),
                x -> x[1] * x[2])) / (qn.nrm * nn.nrm) AS sim
            FROM probes p JOIN cells c USING (c_id)
            JOIN n qn ON qn.vec_id = p.q_id
            JOIN n nn ON nn.vec_id = c.n_id
            WHERE p.q_id <> c.n_id),
          ivf AS (SELECT q_id, n_id FROM (
              SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
                ORDER BY sim DESC, n_id) AS rnk FROM si) t
            WHERE rnk <= 5),
          sb AS (
            SELECT q.vec_id AS q_id, c.vec_id AS n_id,
              list_sum(list_transform(list_zip(q.v, c.v),
                x -> x[1] * x[2])) / (q.nrm * c.nrm) AS sim
            FROM n q JOIN n c ON q.vec_id <> c.vec_id
            WHERE q.vec_id % 50 = 0),
          brute AS (SELECT q_id, n_id FROM (
              SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
                ORDER BY sim DESC, n_id) AS rnk FROM sb) t
            WHERE rnk <= 5)
          SELECT b.q_id, CAST(count(i.n_id) AS BIGINT) AS n_hits,
                 CAST(count(i.n_id) AS DOUBLE) / 5 AS recall_at_k
          FROM brute b LEFT JOIN ivf i
            ON b.q_id = i.q_id AND b.n_id = i.n_id
          GROUP BY b.q_id""") { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 50 === 0)
      Similarity.recallAtK(
        Similarity.ivfTopK(emb, queries, 5),
        Similarity.bruteForceTopK(emb, queries, 5), 5)
    },

    // hard-negative mining (contrastive/retrieval training data): the
    // k nearest DIFFERENT-label vectors per query. ORACLE TWIN — the
    // exact all-pairs formulation; production is hardNegativesIvf
    // (cell-routed, label filter inside the probed cells), whose
    // recall SimilaritySpec anchors against this frame
    q("q_hard_negatives", "similarity",
      """WITH q AS (SELECT vec_id AS q_id, label AS q_label,
                      CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id % 50 = 0),
          c AS (SELECT vec_id AS n_id, label AS n_label,
                  CAST(embedding AS DOUBLE[]) AS nv
                FROM embeddings),
          s AS (SELECT q_id, q_label, n_id, n_label,
                  list_sum(list_transform(list_zip(qv, nv),
                    x -> x[1] * x[2])) /
                  (sqrt(list_sum(list_transform(qv, x -> x * x))) *
                   sqrt(list_sum(list_transform(nv, x -> x * x)))) AS sim
                FROM q, c
                WHERE q_id <> n_id AND q_label <> n_label)
          SELECT q_id, q_label, n_id, n_label, rank, sim FROM (
            SELECT q_id, q_label, n_id, n_label, sim,
              CAST(row_number() OVER (PARTITION BY q_id
                ORDER BY sim DESC, n_id) AS BIGINT) AS rank
            FROM s) t
          WHERE rank <= 5""") { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 50 === 0)
      Similarity.hardNegatives(emb, queries, 5)
    },

    // chunk→doc mean pooling, fixed-point exact (groups of 5 chunks
    // per synthetic doc): floor-quantized components summed as longs,
    // floor(sum/n) mean — order-free, so the whole pooled matrix
    // differentials bit-exactly
    q("q_embed_pool", "similarity",
      """WITH ex AS (
           SELECT vec_id // 5 AS grp, u.dim AS dim, u.x AS x FROM (
             SELECT vec_id,
               unnest([{'dim': i - 1, 'x': e[i]}
                 for i in generate_series(1, len(e))]) AS u
             FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings WHERE embedding IS NOT NULL))),
          g AS (SELECT grp, dim, count(*) AS n_chunks,
                  sum(CAST(floor(x * 1048576.0) AS BIGINT)) AS sum_fp
                FROM ex GROUP BY grp, dim)
          SELECT CAST(grp AS BIGINT) AS grp, CAST(dim AS BIGINT) AS dim,
                 CAST(n_chunks AS BIGINT) AS n_chunks,
                 CAST(sum_fp AS BIGINT) AS sum_fp,
                 CAST(floor(CAST(sum_fp AS DOUBLE) / n_chunks) AS BIGINT)
                   AS pool_fp
          FROM g""") { (spark, dir) =>
      Similarity.meanPoolFp(
        Tables.df(spark, dir, "embeddings"),
        expr("vec_id div 5"), "embedding")
    })
}
