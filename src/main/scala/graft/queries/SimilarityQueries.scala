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

    // LSH planes derive from Spark xxhash64 → no cross-engine oracle;
    // recall vs brute force is asserted in SimilaritySpec.
    qNoOracle("q_knn_lsh", "similarity") { (spark, dir) =>
      val emb = Tables.df(spark, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 50 === 0)
      Similarity.lshTopK(emb, queries, 5, nPlanes = 4)
    })
}
