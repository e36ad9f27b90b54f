package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.ops.{Dedup, Similarity}

/** Measured scale-ramp harness behind `SCALE.md` (round-4 verdict #7 /
  * round-7 verdict #2): runs the dedup/ANN candidate generators on 1×,
  * 3× and 10× replicas of the `documents`/`embeddings` tables and fits
  * the wall-time growth exponent, turning the "bucketed, therefore
  * ~linear" plan-shape argument into an empirical number.
  *
  * Replication is DISTINCT-corpus replication, not duplication: copy k
  * prefixes every token with `z{k}` (so every token n-gram shingle
  * differs across copies) and shifts every embedding component by
  * k·0.173 (so cross-copy cosines fall far below any near-dup
  * threshold). That keeps the true duplicate structure per unit of
  * corpus constant — exact duplication instead would grow every
  * duplicate cluster by the replication factor and the PAIR OUTPUT
  * quadratically, measuring the data change rather than the operator.
  *
  * Each replica is materialized to parquet and read back before the
  * clock starts, so input synthesis is not timed and scans see a
  * realistic multi-file layout. Usage:
  * `sbt "runMain graft.ScaleRamp"` with `SPARK_GRAFT_SF_DIR` (defaults
  * to sf0.1); prints the SCALE.md markdown rows on stdout.
  */
object ScaleRamp {

  private def timeIt(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = f
    ((System.nanoTime() - t0) / 1e9, n)
  }

  /** Least-squares slope of log(t) over log(k) — the growth exponent:
    * 1.0 = linear, 2.0 = quadratic. */
  private def exponent(points: Seq[(Int, Double)]): Double = {
    val xs = points.map(p => math.log(p._1.toDouble))
    val ys = points.map(p => math.log(p._2))
    val n = xs.size.toDouble
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val varx = xs.map(x => (x - mx) * (x - mx)).sum
    cov / varx
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
        .getOrElse(Runtime.getRuntime.availableProcessors()))
    val out = java.nio.file.Files.createTempDirectory("graft_scale").toString

    val docs0 = Tables.df(spark, sfDir, "documents").select("doc_id", "text")
    val emb0 = Tables.df(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")

    /** k distinct-corpus replicas, materialized once + read back. */
    val docCache = scala.collection.mutable.Map.empty[Int, DataFrame]
    def docsAt(k: Int): DataFrame = docCache.getOrElseUpdate(k, {
      val path = s"$out/docs_x$k"
      (0 until k).map { i =>
        docs0.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          (if (i == 0) col("text")
           // prefix EVERY token of copy i with z{i}: all shingles
           // (n-grams over tokens) become copy-local, so no cross-copy
           // near-dups exist and output volume scales with k
           else regexp_replace(col("text"), " ", s" z$i")).as("text"))
      }.reduce(_ unionAll _).write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    })
    val embCache = scala.collection.mutable.Map.empty[Int, DataFrame]
    def embAt(k: Int): DataFrame = embCache.getOrElseUpdate(k, {
      val path = s"$out/emb_x$k"
      (0 until k).map { i =>
        emb0.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          (if (i == 0) col("embedding")
           else transform(col("embedding"),
             x => x + lit(i.toFloat * 0.173f))).as("embedding"))
      }.reduce(_ unionAll _).write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    })

    // each op prepares its input OUTSIDE the timed window
    val ops: Seq[(String, Int => (Double, Long))] = Seq(
      "minhash_lsh_candidates" -> { k =>
        val d = docsAt(k)
        timeIt(Dedup.minhashCandidates(d, "doc_id", "text").count())
      },
      "ngram_jaccard_pairs" -> { k =>
        val d = docsAt(k)
        timeIt(Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.8).count())
      },
      "simhash_pairs" -> { k =>
        val d = docsAt(k)
        timeIt(Dedup.simhashPairs(d, "doc_id", "text").count())
      },
      "connected_components" -> { k =>
        // isolate CC from candidate generation: the edge list is
        // materialized before the clock starts
        val pairs = Dedup.minhashCandidates(docsAt(k), "doc_id", "text")
          .localCheckpoint()
        pairs.count()
        timeIt(Dedup.connectedComponents(pairs, "a_id", "b_id").count())
      },
      "lsh_embed_neardup" -> { k =>
        val e = embAt(k)
        timeIt(Similarity.lshNearDup(e, 0.99).count())
      })

    // JIT/codegen warmup outside every timed window
    Dedup.minhashCandidates(docs0.limit(500), "doc_id", "text").count()
    Similarity.lshNearDup(emb0.limit(500), 0.99).count()

    val scales = Seq(1, 3, 10)
    println("| operator | " +
      scales.map(k => s"t(${k}x) s | rows(${k}x) |").mkString(" ") +
      " exponent |")
    println("|---|" + scales.map(_ => "---|---|").mkString + "---|")
    ops.foreach { case (name, run) =>
      val rows = scales.map { k => val (t, n) = run(k); (k, t, n) }
      val e = exponent(rows.map(r => (r._1, r._2)))
      println(f"| $name | " + rows.map { case (_, t, n) =>
        f"$t%.2f | $n%d |" }.mkString(" ") + f" $e%.2f |")
    }
    spark.stop()
  }
}
