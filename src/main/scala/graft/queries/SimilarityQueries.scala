package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Similarity

/** ANN over the embeddings table: exact brute-force cosine top-k
  * (oracled — the double arithmetic is bit-identical to DuckDB's
  * list-lambda formulation, verified empirically) and the LSH-bucketed
  * scale path (Spark-hash planes → rows-only; recall is spec-tested).
  */
object SimilarityQueries extends QueryGroup {

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
      """WITH corpus AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
           UNION ALL
           SELECT vec_id + 100000, CAST(embedding AS DOUBLE[])
           FROM embeddings WHERE vec_id % 10 = 0)
         SELECT a_id, b_id, sim FROM (
           SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             list_sum(list_transform(list_zip(a.v, b.v),
               x -> x[1] * x[2])) /
             (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
              sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS sim
           FROM corpus a, corpus b WHERE a.vec_id < b.vec_id) t
         WHERE sim >= 0.99""") { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val corpus = emb.unionAll(
        emb.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      // per-row norms (identical doubles to per-pair recomputation)
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
    },

    // the near-dup SCALE path: sign-LSH blocking + exact cosine verify.
    // Planes derive from Spark xxhash64 → no cross-engine oracle;
    // recall vs the all-pairs twin is asserted in SimilaritySpec.
    qNoOracle("q_embed_neardup_lsh", "similarity") { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val corpus = emb.unionAll(
        emb.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      Similarity.lshNearDup(corpus, 0.99)
    },

    // near-dup with Hamming-1 multi-probe on the probe side of the
    // self-join (r9): same no-oracle rationale; SimilaritySpec asserts
    // its pairs are a superset of the single-probe run above and its
    // recall vs the all-pairs twin dominates on perturbed near-misses.
    qNoOracle("q_embed_neardup_lsh_multiprobe", "similarity") { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val corpus = emb.unionAll(
        emb.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      Similarity.lshNearDup(corpus, 0.99, multiProbe = true)
    },

    // LSH planes derive from Spark xxhash64 → no cross-engine oracle;
    // recall vs brute force is asserted in SimilaritySpec.
    qNoOracle("q_knn_lsh", "similarity") { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 50 === 0)
      Similarity.lshTopK(emb, queries, 5, nPlanes = 4)
    },

    // multi-probe variant (Hamming-1 query buckets): same no-oracle
    // rationale; SimilaritySpec asserts its recall dominates the
    // single-probe run above on the identical deterministic inputs.
    qNoOracle("q_knn_lsh_multiprobe", "similarity") { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 50 === 0)
      Similarity.lshTopK(emb, queries, 5, nPlanes = 4, multiProbe = true)
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
    })
}
