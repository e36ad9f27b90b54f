package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Classifier, Pack}

/** The quality-classifier trainer ([[graft.ops.Classifier]]) under
  * full DuckDB oracles: the 8-epoch fixed-point gradient-descent
  * trajectory replays as an unrolled CTE chain (the q_bpe_learn
  * discipline applied to training), the learned gate's confusion
  * matrix pins that it actually LEARNED, and the score →
  * selectUnderBudget composition pins the artifact handoff into the
  * curation pipeline.
  *
  * Labeled set: every document (positive) vs its word-sorted twin
  * (negative) — [[graft.ops.Classifier.realVsShuffled]]. Unigram
  * features are identical within each pair, so separation comes
  * entirely from bigram structure: the gate the trainer must learn is
  * "natural word order vs degenerate order", the fastText-style
  * quality construction with an exact, engine-independent label. */
object ClassifierQueries extends QueryGroup {

  private val B = 4096
  private val Epochs = 8
  private val S = 1000000L
  private val Slope = 4L
  private val LrNum = 1L
  private val LrDen = 200L
  private val Budget = 15000L

  private val cfg =
    Classifier.Config(B, Epochs, LrNum, LrDen, S, Slope)

  /** The training replay: labeled docs → gram rows → Murmur buckets
    * (the shared [[MurmurSql.chain]]) → sparse count features with
    * the bias pseudo-bucket −1 → epochs e = 1..8 each as four
    * MATERIALIZED tables (per-doc dot product z, hard-sigmoid error,
    * per-bucket gradient, weight update). Every quantity is a BIGINT
    * at scale 10⁶; truncating division is spelled
    * `(x − x % d) // d` — the dividend is made exactly divisible, so
    * floor (DuckDB) and trunc (Spark `div`, Scala `/`) agree on any
    * sign. Ends at `w<nEpochs>` (b, w); parameterized so the stream
    * gate can train a DIFFERENT (4-epoch) model — its hash then
    * cannot pass by coinciding with the 8-epoch queries'. */
  /** The unrolled epoch chain e = 1..n, PARAMETERIZED (r20): `pfx`
    * namespaces the per-epoch CTEs, `feats`/`nn` name the feature and
    * doc-count tables the phase trains on, `w0` names the INITIAL
    * weight table — zeros for a cold start, a previous phase's final
    * weights for the warm-started retrain replay. Ends at
    * `${pfx}w<nEpochs>` (b, w). */
  private def epochCtes(nEpochs: Int, pfx: String, feats: String,
      nn: String, w0: String): String =
    (1 to nEpochs).map { e =>
      val pw = if (e == 1) w0 else s"${pfx}w${e - 1}"
      s"""${pfx}z$e AS MATERIALIZED (
           SELECT f.uid, f.y, sum(w.w * f.cnt) AS z
           FROM $feats f JOIN $pw w USING (b) GROUP BY 1, 2),
         ${pfx}e$e AS MATERIALIZED (
           SELECT uid,
             greatest(0, least($S,
               (z - z % $Slope) // $Slope + ${S / 2}))
               - y * $S AS err
           FROM ${pfx}z$e),
         ${pfx}g$e AS MATERIALIZED (
           SELECT f.b, sum(e.err * f.cnt) AS g
           FROM $feats f JOIN ${pfx}e$e e USING (uid) GROUP BY 1),
         ${pfx}w$e AS MATERIALIZED (
           SELECT w.b,
             CAST(w.w - (($LrNum * COALESCE(g.g, 0))
               - ($LrNum * COALESCE(g.g, 0)) % ($LrDen * nn.n))
               // ($LrDen * nn.n) AS BIGINT) AS w
           FROM $pw w LEFT JOIN ${pfx}g$e g USING (b)
           CROSS JOIN $nn nn)"""
    }.mkString(",\n")

  private def trainCtes(nEpochs: Int = Epochs,
      src: String = "documents"): String = {
    // nEpochs = 0 ends the chain at w0 (retrainCtes appends its own
    // phase-prefixed epochs) — no dangling comma
    val epochs = Option(epochCtes(nEpochs, "", "feats", "nn", "w0"))
      .filter(_.nonEmpty).map(",\n" + _).getOrElse("")
    s"""d0 AS (SELECT doc_id,
           list_filter(string_split(text, ' '), t -> t <> '') AS toks
         FROM $src WHERE text IS NOT NULL),
       ld AS (SELECT 2 * doc_id AS uid, toks, 1 AS y FROM d0
              UNION ALL
              SELECT 2 * doc_id + 1, list_sort(toks), 0 FROM d0),
       gr AS (SELECT uid, y, unnest(list_concat(toks,
                [toks[i] || ' ' || toks[i + 1]
                 for i in generate_series(1,
                   greatest(len(toks) - 1, 0))])) AS g
              FROM ld),
       strs AS (SELECT DISTINCT g AS s FROM gr),
       ${MurmurSql.chain},
       feats AS MATERIALIZED (
         SELECT uid, y, CAST(u % $B AS INT) AS b,
                CAST(count(*) AS BIGINT) AS cnt
         FROM gr JOIN mm ON gr.g = mm.s GROUP BY 1, 2, 3
         UNION ALL
         SELECT uid, y, -1, CAST(1 AS BIGINT) FROM ld),
       nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ld),
       w0 AS (SELECT unnest(generate_series(-1, ${B - 1})) AS b,
                CAST(0 AS BIGINT) AS w)$epochs"""
  }

  /** The warm-start replay (r20): ONE gram/feature build over the
    * whole corpus, split doc-wise into the BASE slice (doc_id mod 4 ≠
    * 3 — uid // 2 recovers doc_id, and a doc's word-sorted twin
    * follows it into its slice) and the APPENDED delta (mod 4 = 3);
    * `nEpochs` cold epochs over the base end at `bw<n>`, then
    * `nEpochs` WARM epochs over the delta start FROM `bw<n>` — the
    * same epoch template parameterized by nonzero initial weights
    * (the bpeEncCtesWith precedent applied to training). Ends at
    * `dw<nEpochs>`. */
  private def retrainCtes(nEpochs: Int): String =
    s"""${trainCtes(0)},
       fb AS MATERIALIZED (
         SELECT * FROM feats WHERE (uid // 2) % 4 <> 3),
       fd AS MATERIALIZED (
         SELECT * FROM feats WHERE (uid // 2) % 4 = 3),
       bn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ld
              WHERE (uid // 2) % 4 <> 3),
       dn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ld
              WHERE (uid // 2) % 4 = 3),
       ${epochCtes(nEpochs, "b", "fb", "bn", "w0")},
       ${epochCtes(nEpochs, "d", "fd", "dn", s"bw$nEpochs")}"""

  val queries: Seq[Q] = Seq(
    // DISTRIBUTED QUALITY-CLASSIFIER TRAINING: the full 8-epoch
    // fixed-point GD trajectory differentials weight for weight
    // against the unrolled SQL replay — 4097 weights, one hash. The
    // second learned artifact (after q_bpe_learn's vocabulary): the
    // engine now trains both components a production curation
    // pipeline carries.
    q("q_classifier_train", "llm-classifier",
      s"""WITH ${trainCtes()}
          SELECT CAST(b AS INT) AS bucket, w FROM w$Epochs""") {
      (spark, dir) =>
      import spark.implicits._
      val labeled = Classifier.realVsShuffled(
        Tables.df(spark, dir, "documents"), "doc_id", "text")
      Classifier.train(labeled, "doc_id", "text", "y", cfg)
        .toDF("bucket", "w")
    },

    // the learned gate actually LEARNS: confusion matrix of the
    // trained model on its corpus (measured 99.9% at the catalog
    // cell — separation comes from bigram buckets alone, the
    // unigrams cancel within every real/twin pair). The oracle
    // recomputes training AND inference in SQL.
    q("q_classifier_eval", "llm-classifier",
      s"""WITH ${trainCtes()},
          zf AS (SELECT f.uid, f.y, sum(w.w * f.cnt) AS z
                 FROM feats f JOIN w$Epochs w USING (b)
                 GROUP BY 1, 2)
          SELECT CAST(y AS INT) AS y,
                 CAST(CASE WHEN z > 0 THEN 1 ELSE 0 END AS INT)
                   AS pred,
                 CAST(count(*) AS BIGINT) AS n_docs
          FROM zf GROUP BY 1, 2""") { (spark, dir) =>
      val labeled = Classifier.realVsShuffled(
        Tables.df(spark, dir, "documents"), "doc_id", "text")
      // trainWithScores: the confusion matrix reads the TRAINING
      // feature table's final-model scores — no second corpus pass
      val (_, scored) = Classifier.trainWithScores(
        labeled, "doc_id", "text", "y", cfg)
      scored
        .groupBy(col("_y").cast("int").as("y"),
          when(col("score") > 0, 1).otherwise(0).as("pred"))
        .agg(count(lit(1)).as("n_docs"))
    },

    // learn → score → SELECT composition: the trained gate scores
    // the REAL corpus and the token budget is spent highest-score
    // first (Pack.selectUnderBudget — the sharded exact prefix sum).
    // Pins the artifact handoff end to end: a weight drift, a score
    // drift, or a selection-order drift all land in this hash.
    q("q_classifier_select", "llm-classifier",
      s"""WITH ${trainCtes()},
          rd AS (SELECT doc_id, len(toks) AS tokens FROM d0),
          sc AS (SELECT f.uid // 2 AS doc_id,
                   sum(w.w * f.cnt) AS z
                 FROM feats f JOIN w$Epochs w USING (b)
                 WHERE f.uid % 2 = 0 GROUP BY 1),
          c AS (SELECT r.doc_id, r.tokens,
                  CAST(s.z AS DOUBLE) AS score,
                  CAST(sum(r.tokens) OVER (
                    ORDER BY s.z DESC, r.doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_tokens
                FROM rd r JOIN sc s USING (doc_id))
          SELECT doc_id, CAST(tokens AS BIGINT) AS tokens, score,
                 cum_tokens
          FROM c WHERE cum_tokens <= $Budget""") { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      val labeled = Classifier.realVsShuffled(docs, "doc_id", "text")
      // the real corpus's scores come straight off the training
      // feature table: the positive rows (uid = 2·doc_id) carry
      // exactly the real docs' features by construction, so no
      // second corpus pass — uid div 2 recovers doc_id
      val (_, scoredAll) = Classifier.trainWithScores(
        labeled, "doc_id", "text", "y", cfg)
      val scored = scoredAll.filter(col("_y") === 1L)
        .select(expr("doc_id div 2").as("doc_id"),
          col("score").cast("double").as("score"))
        .join(docs.select(col("doc_id"),
          size(filter(split(col("text"), " "), w => w =!= lit("")))
            .cast("long").as("toks")), Seq("doc_id"))
      Pack.selectUnderBudget(scored, "doc_id", "toks", "score",
        Budget)
    },

    // the gate DEPLOYED ON INGEST: a 4-epoch model (≠ the other
    // queries' 8 — this hash cannot pass by coincidence) trained
    // batch-side, then every streamed document scored by the
    // map-only literal-map expression (scoreExpr: no join, no agg,
    // no state store — batch-partitioning invariance is structural,
    // each row scores alone). Oracle = the batch scorer's spelling
    // over the real docs verbatim, so streamed ≡ batch ≡ SQL replay
    // is one hash. The production shape: the corpus gate rides the
    // ingest scan as one projection.
    q("q_stream_classifier_gate", "streaming",
      s"""WITH ${trainCtes(4)},
          sc AS (SELECT f.uid // 2 AS doc_id,
                   sum(w.w * f.cnt) AS z
                 FROM feats f JOIN w4 w USING (b)
                 WHERE f.uid % 2 = 0 GROUP BY 1)
          SELECT doc_id, CAST(z AS BIGINT) AS score, z > 0 AS kept
          FROM sc""") { (spark, dir) =>
      val labeled = Classifier.realVsShuffled(
        Tables.df(spark, dir, "documents"), "doc_id", "text")
      val weights = Classifier.train(labeled, "doc_id", "text", "y",
        cfg.copy(epochs = 4))
      graft.streaming.IngestStream.runClassifierGateToBatch(
        spark, s"$dir/documents.parquet", weights, B,
        s"clf_gate_${System.nanoTime()}")
    },

    // INCREMENTAL RETRAIN (r20 — the incremental-triple discipline
    // applied to the trainer): 3 cold epochs on the base slice
    // (doc_id mod 4 ≠ 3), then 3 WARM epochs on the appended delta
    // starting from the stored base weights — the daily-ingest shape
    // for a deployed gate, with the base corpus never re-touched. The
    // oracle replays BOTH phases as one unrolled CTE chain whose
    // second phase is parameterized by the first's final weights, so
    // a drift in either trajectory — or in the warm-start handoff —
    // lands in this hash. All 4097 weights, one hash.
    q("q_classifier_retrain", "llm-classifier",
      s"""WITH ${retrainCtes(3)}
          SELECT CAST(b AS INT) AS bucket, w FROM dw3""") {
      (spark, dir) =>
      import spark.implicits._
      val docs = Tables.df(spark, dir, "documents")
      val cfg3 = cfg.copy(epochs = 3)
      val wBase = Classifier.train(
        Classifier.realVsShuffled(
          docs.filter(pmod(col("doc_id"), lit(4)) =!= 3),
          "doc_id", "text"),
        "doc_id", "text", "y", cfg3)
      Classifier.retrain(
        Classifier.realVsShuffled(
          docs.filter(pmod(col("doc_id"), lit(4)) === 3),
          "doc_id", "text"),
        "doc_id", "text", "y", wBase, cfg3)
        .toDF("bucket", "w")
    },

    // the retrain's MODEL-DRIFT report: the real corpus scored by the
    // stored model AND the warm-retrained one in a single map-only
    // projection (two scoreExpr literal-map folds over the same scan
    // — the deployed inference shape), then the existing
    // thresholdSweep over each score column, union'd under a model
    // tag. The report a daily gate refresh reads before swapping
    // weights: how much corpus volume moves across every cutoff. The
    // oracle recomputes both trainings, both scorings, and both
    // sweeps — score drift, bin drift, and volume drift all land in
    // one hash.
    q("q_classifier_drift", "llm-classifier",
      s"""WITH ${retrainCtes(3)},
          sco AS MATERIALIZED (
            SELECT f.uid // 2 AS doc_id,
                   CAST(sum(wo.w * f.cnt) AS DOUBLE) AS s_old,
                   CAST(sum(wn.w * f.cnt) AS DOUBLE) AS s_new
            FROM feats f JOIN bw3 wo USING (b) JOIN dw3 wn USING (b)
            WHERE f.uid % 2 = 0 GROUP BY 1),
          sc AS (SELECT s.doc_id, s.s_old, s.s_new,
                   CAST(len(d.toks) AS BIGINT) AS t
                 FROM sco s JOIN d0 d USING (doc_id)),
          mmo AS (SELECT min(s_old) AS mn, max(s_old) AS mx FROM sc),
          bo AS (SELECT CASE WHEN mx = mn THEN 0
                   ELSE least(CAST(floor((s_old - mn) / (mx - mn)
                          * 1024.0) AS BIGINT), 1023) END AS bin,
                   count(*) AS n_docs,
                   CAST(sum(t) AS BIGINT) AS n_tokens
                 FROM sc CROSS JOIN mmo GROUP BY 1),
          swo AS (SELECT 'old' AS model, bin,
                    mn + CAST(bin AS DOUBLE) * (mx - mn) / 1024.0
                      AS thr_lo,
                    n_docs, n_tokens,
                    CAST(SUM(n_docs) OVER (ORDER BY bin DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum_docs,
                    CAST(SUM(n_tokens) OVER (ORDER BY bin DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum_tokens
                  FROM bo CROSS JOIN mmo),
          mmn AS (SELECT min(s_new) AS mn, max(s_new) AS mx FROM sc),
          bn2 AS (SELECT CASE WHEN mx = mn THEN 0
                    ELSE least(CAST(floor((s_new - mn) / (mx - mn)
                           * 1024.0) AS BIGINT), 1023) END AS bin,
                    count(*) AS n_docs,
                    CAST(sum(t) AS BIGINT) AS n_tokens
                  FROM sc CROSS JOIN mmn GROUP BY 1),
          swn AS (SELECT 'new' AS model, bin,
                    mn + CAST(bin AS DOUBLE) * (mx - mn) / 1024.0
                      AS thr_lo,
                    n_docs, n_tokens,
                    CAST(SUM(n_docs) OVER (ORDER BY bin DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum_docs,
                    CAST(SUM(n_tokens) OVER (ORDER BY bin DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum_tokens
                  FROM bn2 CROSS JOIN mmn)
          SELECT model, bin, thr_lo, n_docs, n_tokens, cum_docs,
                 cum_tokens
          FROM swo UNION ALL SELECT * FROM swn""") { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      val cfg3 = cfg.copy(epochs = 3)
      val wOld = Classifier.train(
        Classifier.realVsShuffled(
          docs.filter(pmod(col("doc_id"), lit(4)) =!= 3),
          "doc_id", "text"),
        "doc_id", "text", "y", cfg3)
      val wNew = Classifier.retrain(
        Classifier.realVsShuffled(
          docs.filter(pmod(col("doc_id"), lit(4)) === 3),
          "doc_id", "text"),
        "doc_id", "text", "y", wOld, cfg3)
      // one corpus scan scores BOTH models map-only; checkpointed
      // because each sweep consumes it twice (min/max + binning — the
      // multi-consumer discipline, else the double literal-map fold
      // over the corpus executes four times). The split and the
      // gram-hash run ONCE into shared array columns (stacked
      // projections — CollapseProject declines to re-inline a
      // non-cheap expression referenced twice) and each model folds
      // over the shared bucket array: the old spelling re-split and
      // re-hashed every gram per model (r20 optimization, guide §2.3)
      val scored = docs.filter(col("text").isNotNull)
        .select(col("doc_id"),
          Classifier.wordsExpr(col("text")).as("_ws"))
        .select(col("doc_id"),
          Classifier.bucketsExpr(col("_ws"), B).as("_bs"),
          size(col("_ws")).cast("long").as("t"))
        .select(col("doc_id"),
          Classifier.scoreExprOverBuckets(col("_bs"), wOld)
            .cast("double").as("s_old"),
          Classifier.scoreExprOverBuckets(col("_bs"), wNew)
            .cast("double").as("s_new"),
          col("t"))
        .localCheckpoint()
      graft.ops.Stats.thresholdSweep(scored, col("s_old"), col("t"))
        .withColumn("model", lit("old"))
        .unionByName(
          graft.ops.Stats.thresholdSweep(scored, col("s_new"),
            col("t")).withColumn("model", lit("new")))
        .select(col("model"), col("bin"), col("thr_lo"),
          col("n_docs"), col("n_tokens"), col("cum_docs"),
          col("cum_tokens"))
    },

    // Curation composition v12 — the DEPLOYMENT composition of the
    // second learned artifact (v3's LM-gate shape with the LEARNED
    // model): train the quality gate in-engine (2 epochs), score the
    // duplicate-injected corpus with the map-only scoreExpr
    // projection (the deployed inference shape — no join, no agg),
    // gate at a RELATIVE threshold from the score quantiles (the
    // lowest score bin keeping at most half the corpus by docs, via
    // thresholdSweep + the shared scoreBins arithmetic so grid and
    // cutoff cannot desync — the curate-v3 lm_score lesson), exact
    // dedup to representatives (the injected copies score identically
    // to their originals and lose to them), then sequence packing.
    // The oracle chains the classifier replay CTEs into the existing
    // sweep/dedup/pack spellings — one hash over the whole handoff.
    q("q_curate_corpus_v12", "llm-classifier",
      s"""WITH ${DedupQueries.corpusSql},
          ${trainCtes(2, "corpus")},
          sc AS MATERIALIZED (
            SELECT f.uid // 2 AS doc_id, sum(w.w * f.cnt) AS z
            FROM feats f JOIN w2 w USING (b)
            WHERE f.uid % 2 = 0 GROUP BY 1),
          scd AS (SELECT s.doc_id, CAST(s.z AS DOUBLE) AS x,
                    CAST(len(d.toks) AS BIGINT) AS t
                  FROM sc s JOIN d0 d USING (doc_id)),
          mm2 AS (SELECT min(x) AS mn, max(x) AS mx FROM scd),
          b2 AS (SELECT doc_id, t,
                   CASE WHEN mx = mn THEN 0
                        ELSE least(CAST(floor((x - mn) / (mx - mn)
                               * 1024.0) AS BIGINT), 1023) END AS bin
                 FROM scd CROSS JOIN mm2),
          agg2 AS (SELECT bin, count(*) AS n_docs FROM b2
                   GROUP BY bin),
          cum2 AS (SELECT bin,
                     SUM(n_docs) OVER (ORDER BY bin DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum_docs
                   FROM agg2),
          ntot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scd),
          cut AS (SELECT min(bin) AS cut_bin FROM cum2 CROSS JOIN ntot
                  WHERE cum_docs * 2 <= n),
          gated AS (SELECT b.doc_id, b.t, c.text
                    FROM b2 b CROSS JOIN cut
                    JOIN corpus c ON c.doc_id = b.doc_id
                    WHERE b.bin >= cut_bin),
          rep AS (SELECT min(doc_id) AS doc_id FROM gated
                  GROUP BY text),
          kept AS (SELECT g.doc_id, g.t FROM gated g
                   JOIN rep r ON g.doc_id = r.doc_id)
          SELECT doc_id, CAST(t AS BIGINT) AS tokens,
                 CAST(COALESCE(SUM(t) OVER (
                        ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING),
                      0) // $Budget AS BIGINT) AS pack_id
          FROM kept""") { (spark, dir) =>
      val corpus = DedupQueries.corpus(spark, dir)
      val w = Classifier.train(
        Classifier.realVsShuffled(corpus, "doc_id", "text"),
        "doc_id", "text", "y", cfg.copy(epochs = 2))
      // one corpus scan scores AND measures map-only; checkpointed —
      // the sweep's min/max, the sweep's binning, the re-binning, and
      // the dedup all consume it (the multi-consumer discipline). The
      // split runs ONCE into a shared word-array column feeding both
      // the score fold and the token count (r20, guide §2.3)
      val scored = corpus.filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"),
          Classifier.wordsExpr(col("text")).as("_ws"))
        .select(col("doc_id"), col("text"),
          Classifier.scoreExprOverBuckets(
            Classifier.bucketsExpr(col("_ws"), B), w)
            .cast("double").as("x"),
          size(col("_ws")).cast("long").as("t"))
        .localCheckpoint()
      // relative threshold: the lowest bin whose descending doc
      // cumulative stays within HALF the corpus — integer compare
      // against the materialized count, exact on both engines
      val nTot = scored.count()
      val cut = graft.ops.Stats.thresholdSweep(scored, col("x"),
          col("t"))
        .filter(col("cum_docs") * 2 <= lit(nTot))
        .agg(min(col("bin")).as("cut_bin"))
      val gated = graft.ops.Stats.scoreBins(scored, col("x"),
          col("t"), 10)
        .crossJoin(broadcast(cut))
        .filter(col("bin") >= col("cut_bin"))
        .select(col("doc_id"), col("text"), col("t"))
      val rep = graft.ops.Dedup.exact(gated, col("doc_id"),
          col("text"))
        .select(col("keep_id").as("doc_id"))
      val kept = gated.join(rep, "doc_id")
        .select(col("doc_id"), col("t"))
      Pack.sequencePack(kept, "doc_id", "t", Budget)
    })
}
