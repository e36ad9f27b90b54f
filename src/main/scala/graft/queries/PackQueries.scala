package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Decontaminate, Dedup, Pack, Sampling, TextAnalysis}

/** Training-data assembly operators over the documents table: sequence
  * packing (fixed token-budget packs in global doc_id order) and
  * deterministic mixture sampling (per-source keep probabilities).
  *
  * Both are exactly oracle-able: pack_id depends only on the global
  * running token total (shard boundaries cancel out — see Pack scaladoc)
  * and the sampling decision is pure integer arithmetic, so DuckDB can
  * spell the identical semantics.
  */
object PackQueries extends QueryGroup {

  /** tokens per pack for the oracled query; ~37 packs at sf0.01 */
  private val Budget = 4096L

  /** v4: near-dup clustering applies from this many tokens up; shorter
    * span-dedup remnants go through EXACT dedup instead. Load-bearing
    * at scale, not a tuning nicety: span dedup CONCENTRATES shared
    * boilerplate into short residual docs (a doc reduced to its novel
    * tail keeps the same few tokens every sibling kept), and for a doc
    * shorter than the shingle prefix can discriminate, its "prefix" IS
    * the shared boilerplate shingle — the frequent-shingle posting
    * join the PPJoin rarest-first defense cannot prune. Measured: the
    * un-gated composition built a 32 000-doc posting list for the
    * shared 3-token tail at ramp 64× and died allocating a 5 GB
    * aggregation page. Exact dedup (hash group on the full remnant)
    * handles short docs with no posting list at all — the split real
    * pipelines use. (Declared ABOVE `queries`: interpolated into the
    * oracle SQL — a val below the `queries` init would read 0.) */
  private[graft] val MinNearDupTokens = 8

  /** src0..src19 → cycling keep probabilities 0.25/0.5/0.75/1.0 */
  private[graft] val mixtureWeights: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> ((i % 4) + 1) * 0.25).toMap

  /** epoch weights exercising all shapes: sub-1, fractional >1, whole,
    * whole+fraction (0.5 / 1.25 / 2.0 / 2.75 cycling) */
  private[graft] val epochWeights: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> (0.5 + (i % 4) * 0.75)).toMap

  val queries: Seq[Q] = Seq(
    q("q_pack_sequence", "llm-pack",
      s"""SELECT doc_id,
                 COALESCE(n_chars, 0) AS tokens,
                 CAST(COALESCE(SUM(COALESCE(n_chars, 0)) OVER (
                        ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) // $Budget AS BIGINT) AS pack_id
          FROM documents""") { (spark, dir) =>
      Pack.sequencePack(Tables.df(spark, dir, "documents"),
        "doc_id", "n_chars", Budget)
    },

    // token-budget corpus selection, global: spend 13 000 tokens on the
    // stop-ratio-ranked (score desc, doc_id) prefix — roughly half the
    // sf corpus, so the budget edge cuts mid-distribution. Spark runs
    // the SHARDED prefix sum (score-quantile shards + broadcast
    // offsets, no global window); the oracle is the single-window
    // spelling — shard boundaries must cancel exactly. The ranking
    // score is q_text_stats' stop_ratio (one IEEE division of exact
    // ints, bit-identical cross-engine).
    q("q_select_budget", "llm-pack", selectBudgetSql(13000L)) {
      (spark, dir) =>
      val feats = TextAnalysis.qualityFeatures(
          Tables.df(spark, dir, "documents"), col("text"))
        .select(col("doc_id"), col("n_words").cast("long").as("toks"),
          col("stop_ratio"))
      Pack.selectUnderBudget(feats, "doc_id", "toks", "stop_ratio", 13000L)
        .withColumnRenamed("score", "stop_ratio")
    },

    // the budget surface in MODEL tokens: the same sharded prefix-sum
    // selection, but budgeted on the real BPE tokenizer's counts
    // (q_tokenize_bpe) instead of whitespace words — longest-doc-first
    // (score = n_tokens_bpe, ties by doc_id), budget ~half the
    // corpus's BPE mass so the edge cuts mid-distribution. The oracle
    // recomputes the tokenizer via TextQueries' shared recursive CTE
    // and re-spells the selection as one global window.
    q("q_select_budget_bpe", "llm-pack",
      s"""WITH RECURSIVE ${TextQueries.bpeEncCtes},
          c AS (SELECT doc_id, n_tokens_bpe,
                  CAST(SUM(n_tokens_bpe) OVER (
                    ORDER BY n_tokens_bpe DESC, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_tokens
                FROM bdocs)
          SELECT doc_id, n_tokens_bpe, cum_tokens FROM c
          WHERE cum_tokens <= 35000""") { (spark, dir) =>
      val toks = TextAnalysis.bpeTokenize(
        Tables.df(spark, dir, "documents"), "doc_id", "text")
        .withColumn("score", col("n_tokens_bpe").cast("double"))
      Pack.selectUnderBudget(toks, "doc_id", "n_tokens_bpe", "score", 35000L)
        .select(col("doc_id"), col("tokens").as("n_tokens_bpe"),
          col("cum_tokens"))
    },

    // per-source variant: every source spends its own 700 tokens in
    // parallel — no global structure at all (the dashboard-friendly
    // shape when sources must stay balanced)
    q("q_select_budget_source", "llm-pack", selectBudgetSourceSql(700L)) {
      (spark, dir) =>
      val feats = TextAnalysis.qualityFeatures(
          Tables.df(spark, dir, "documents"), col("text"))
        .select(col("doc_id"), col("source"),
          col("n_words").cast("long").as("toks"), col("stop_ratio"))
      Pack.selectUnderBudgetBySource(feats, "doc_id", "toks",
          "stop_ratio", "source", 700L)
        .withColumnRenamed("score", "stop_ratio")
    },

    // thresholds below are math.round(w * 2147483647) for w in
    // {0.25, 0.5, 0.75, 1.0} — mirrored exactly from Sampling
    q("q_sample_mixture", "llm-pack",
      """WITH h AS (
           SELECT doc_id, source,
             ((((((doc_id % 2147483646 + 1) * 48271) % 2147483647)
                * 48271) % 2147483647) * 48271) % 2147483647 AS u
           FROM documents)
         SELECT doc_id, source, u FROM h
         WHERE u < CASE (CAST(substr(source, 4) AS BIGINT) % 4)
             WHEN 0 THEN 536870912
             WHEN 1 THEN 1073741824
             WHEN 2 THEN 1610612735
             WHEN 3 THEN 2147483647
           END""") { (spark, dir) =>
      import org.apache.spark.sql.functions.col
      Sampling.weightedBySource(Tables.df(spark, dir, "documents"),
          "doc_id", "source", mixtureWeights)
        .select(col("doc_id"), col("source"),
          Sampling.hashU31(col("doc_id")).as("u"))
    },

    // temperature-flattened source mixing, α = 1/4 (2 sqrt halvings —
    // IEEE sqrt is correctly rounded, so the weights are bit-identical
    // cross-engine where pow would not be); the Σw normalization
    // cancels out of the acceptance rate, so the only float reduction
    // is an order-free MAX. Output = the resampled (doc_id, source)
    // rows, decided per-row by the Lehmer hash against the derived
    // threshold.
    q("q_sample_temperature", "llm-pack",
      """WITH skew AS (
           SELECT doc_id, source FROM documents
           WHERE doc_id % 23 < CAST(substr(source, 4) AS INT) + 1),
         c AS (SELECT source, count(*) AS ns FROM skew GROUP BY source),
         tot AS (SELECT SUM(ns) AS n FROM c),
         r AS (SELECT source,
                 sqrt(sqrt(CAST(ns AS DOUBLE) / n)) / CAST(ns AS DOUBLE)
                   AS rate
               FROM c CROSS JOIN tot),
         mx AS (SELECT MAX(rate) AS m FROM r),
         thr AS (SELECT source,
                   CAST(floor(rate / m * 2147483647.0) AS BIGINT) AS t
                 FROM r CROSS JOIN mx)
         SELECT d.doc_id, d.source
         FROM (SELECT doc_id, source,
                 ((((((doc_id % 2147483646 + 1) * 48271) % 2147483647)
                    * 48271) % 2147483647) * 48271) % 2147483647 AS u
               FROM skew) d
         JOIN thr ON d.source = thr.source
         WHERE d.u < thr.t""") { (spark, dir) =>
      import org.apache.spark.sql.functions.col
      // the sf sources are uniform AND source = src(doc_id%20), so the
      // skew modulus must be COPRIME with the assignment: srcK keeps
      // ~(K+1)/23 of its docs, sizes range ~1:20 and the α=1/4
      // flattening has real work (small sources keep all, the largest
      // is downsampled hardest)
      val skew = Tables.df(spark, dir, "documents")
        .filter(col("doc_id") % 23 <
          substring(col("source"), 4, 10).cast("int") + 1)
      Sampling.temperatureMixture(skew, "doc_id", "source", halvings = 2)
        .select(col("doc_id"), col("source"))
    },

    // deterministic train/val/test split: permille thresholds on the
    // Lehmer id hash — a doc's split NEVER changes as the corpus grows
    // (eval hygiene: no val→train migration between snapshots), and
    // the assignment reproduces in any engine (no randomSplit, whose
    // result depends on partitioning)
    q("q_split_assign", "llm-pack",
      """SELECT doc_id,
           CASE WHEN u % 1000 < 100 THEN 'val'
                WHEN u % 1000 < 200 THEN 'test'
                ELSE 'train' END AS split
         FROM (SELECT doc_id,
                 ((((((doc_id % 2147483646 + 1) * 48271) % 2147483647)
                    * 48271) % 2147483647) * 48271) % 2147483647 AS u
               FROM documents) t""") { (spark, dir) =>
      import org.apache.spark.sql.functions.col
      Sampling.assignSplit(Tables.df(spark, dir, "documents"),
          "doc_id", valPermille = 100, testPermille = 100)
        .select(col("doc_id"), col("split"))
    },

    // exact-k strata by deterministic hash order (5 per source)
    q("q_sample_stratified", "llm-pack",
      """WITH h AS (
           SELECT *, ((((((doc_id % 2147483646 + 1) * 48271) % 2147483647)
                       * 48271) % 2147483647) * 48271) % 2147483647 AS u
           FROM documents),
         r AS (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY u, doc_id) AS rn
               FROM h)
         SELECT doc_id, source FROM r WHERE rn <= 5""") { (spark, dir) =>
      import org.apache.spark.sql.functions.col
      Sampling.stratifiedK(Tables.df(spark, dir, "documents"),
          "doc_id", "source", k = 5)
        .select(col("doc_id"), col("source"))
    },

    // epochs: CASE constants are floor(w) and round(frac(w)*2147483647)
    // for w in {0.5, 1.25, 2.0, 2.75} — mirrored from epochWeights
    q("q_sample_epochs", "llm-pack",
      """WITH h AS (
           SELECT doc_id, source,
             ((((((doc_id % 2147483646 + 1) * 48271) % 2147483647)
                * 48271) % 2147483647) * 48271) % 2147483647 AS u,
             CAST(substr(source, 4) AS BIGINT) % 4 AS m
           FROM documents),
         n AS (
           SELECT doc_id, source,
             CASE m WHEN 0 THEN 0 WHEN 1 THEN 1
                    WHEN 2 THEN 2 WHEN 3 THEN 2 END
             + CASE WHEN u < CASE m WHEN 0 THEN 1073741824
                                    WHEN 1 THEN 536870912
                                    WHEN 2 THEN 0
                                    WHEN 3 THEN 1610612735 END
                    THEN 1 ELSE 0 END AS n
           FROM h)
         SELECT doc_id, source,
                unnest([i for i in generate_series(0, n - 1)]) AS epoch
         FROM n""") { (spark, dir) =>
      import org.apache.spark.sql.functions.col
      Sampling.epochRepeat(Tables.df(spark, dir, "documents"),
          "doc_id", "source", epochWeights)
        .select(col("doc_id"), col("source"), col("epoch"))
    },

    // deterministic training order: Lehmer shard + in-shard hash
    // order, round-robin-interleaved global positions — no global
    // sort (and no single-reducer stage) at any corpus size
    q("q_training_order", "llm-pack",
      """WITH h AS (
           SELECT doc_id,
             ((((((doc_id % 2147483646 + 1) * 48271) % 2147483647)
                * 48271) % 2147483647) * 48271) % 2147483647 AS u
           FROM documents)
         SELECT doc_id, CAST(u % 8 AS INT) AS shard,
                CAST((row_number() OVER (PARTITION BY u % 8
                        ORDER BY u, doc_id) - 1) * 8 + u % 8 AS BIGINT)
                  AS global_pos
         FROM h""") { (spark, dir) =>
      Sampling.trainingOrder(Tables.df(spark, dir, "documents"),
          "doc_id", shards = 8)
        .select(col("doc_id"), col("shard"), col("global_pos"))
    },

    // deterministic exact-k sample: smallest-Lehmer-hash rows, the
    // re-drawable debug/eval sample (TakeOrderedAndProject, no global
    // sort)
    q("q_sample_k", "llm-pack",
      """SELECT doc_id, lang, source FROM (
           SELECT doc_id, lang, source,
             ((((((doc_id % 2147483646 + 1) * 48271) % 2147483647)
                * 48271) % 2147483647) * 48271) % 2147483647 AS u
           FROM documents
           ORDER BY u, doc_id LIMIT 100)""") { (spark, dir) =>
      Sampling.sampleK(
        Tables.df(spark, dir, "documents")
          .select("doc_id", "lang", "source"),
        "doc_id", 100)
    },

    // UniMax sampling (Chung et al. 2023): per-source epoch-capped
    // budget allocation, smallest sources first — the fairer
    // replacement for temperature mixing. Sources are a synthesized
    // SKEWED grouping (floor(sqrt(doc_id%400)) → sizes ~2g+1, so the
    // small groups hit the 2-epoch cap and the large ones split the
    // leftover fair shares — both branches of the allocator exercised
    // and hash-checked). The oracle replays the sequential allocation
    // walk as a recursive CTE and the partial-epoch draw with the
    // q_sample_k hash spelling.
    q("q_sample_unimax", "llm-pack",
      """WITH RECURSIVE d AS (
           SELECT doc_id,
             's' || CAST(CAST(floor(sqrt(doc_id % 400)) AS BIGINT)
                         AS VARCHAR) AS src_grp
           FROM documents),
         cnt AS (SELECT src_grp, count(*) AS n FROM d GROUP BY 1),
         ord AS (SELECT src_grp, n,
                   CAST(row_number() OVER (ORDER BY n, src_grp)
                        AS BIGINT) AS i,
                   CAST(count(*) OVER () AS BIGINT) AS s
                 FROM cnt),
         walk(i, src_grp, n, alloc, rem) AS (
           SELECT i, src_grp, n,
             least(2 * n, 600 // s),
             600 - least(2 * n, 600 // s)
           FROM ord WHERE i = 1
           UNION ALL
           SELECT o.i, o.src_grp, o.n,
             least(2 * o.n, w.rem // (o.s - w.i)),
             w.rem - least(2 * o.n, w.rem // (o.s - w.i))
           FROM walk w JOIN ord o ON o.i = w.i + 1),
         thr AS (SELECT src_grp, alloc // n AS f, alloc % n AS extra
                 FROM walk),
         rk AS (SELECT d.doc_id, d.src_grp,
                  row_number() OVER (PARTITION BY d.src_grp ORDER BY
                    ((((((doc_id % 2147483646 + 1) * 48271)
                        % 2147483647) * 48271) % 2147483647) * 48271)
                      % 2147483647, doc_id) AS r
                FROM d)
         SELECT rk.doc_id, rk.src_grp,
           CAST(t.f + CASE WHEN rk.r <= t.extra THEN 1 ELSE 0 END
                AS BIGINT) AS n_copies
         FROM rk JOIN thr t USING (src_grp)
         WHERE t.f + CASE WHEN rk.r <= t.extra THEN 1 ELSE 0 END
               > 0""") { (spark, dir) =>
      val d = Tables.df(spark, dir, "documents")
        .select(col("doc_id"),
          concat(lit("s"),
            floor(sqrt((col("doc_id") % 400).cast("double")))
              .cast("long").cast("string")).as("src_grp"))
      Sampling.unimaxSample(d, "doc_id", "src_grp",
        budget = 600L, maxEpochs = 2)
    },

    // curriculum ordering: 4 equal-mass score tiers (easy→hard macro
    // order), trainingOrder's Lehmer shard shuffle within each tier,
    // tier offsets from the bounded per-tier max (ordinal gaps
    // preserved — the oracle replays max+1, not count). Composes the
    // already-oracled quantileBuckets and trainingOrder spellings
    q("q_curriculum_order", "llm-pack",
      """WITH vals AS (
           SELECT doc_id,
             CASE WHEN len(toks) < 1 THEN 0.0
                  ELSE 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
                    / len(toks) END AS x
           FROM (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents)),
         clean AS (SELECT doc_id, x FROM vals
                   WHERE x IS NOT NULL AND NOT isnan(x)),
         mm AS (SELECT min(x) AS mn, max(x) AS mx, count(*) AS n
                FROM clean),
         b AS (SELECT doc_id,
                 CASE WHEN mx = mn THEN 0
                      ELSE least(CAST(floor((x - mn) / (mx - mn)
                             * 1024.0) AS BIGINT), 1023) END AS bin
               FROM clean CROSS JOIN mm),
         binned AS (SELECT bin, count(*) AS c FROM b GROUP BY bin),
         cum AS (SELECT bin, SUM(c) OVER (ORDER BY bin) AS cum
                 FROM binned),
         ranks AS (SELECT p, (p * n + 999) // 1000 AS r
                   FROM (VALUES (250), (500), (750), (1000)) t(p)
                   CROSS JOIN mm),
         edges AS (SELECT p, MIN(bin) AS ebin
                   FROM ranks JOIN cum ON cum.cum >= ranks.r
                   GROUP BY p),
         tiers AS (SELECT doc_id,
                     CAST(1 + (SELECT count(*) FROM edges e
                               WHERE e.ebin < b.bin) AS BIGINT) AS tier
                   FROM b),
         h AS (SELECT doc_id,
                 ((((((doc_id % 2147483646 + 1) * 48271) % 2147483647)
                    * 48271) % 2147483647) * 48271) % 2147483647 AS u
               FROM documents),
         tp AS (SELECT t.doc_id, tier, CAST(u % 8 AS INT) AS shard,
                  CAST((row_number() OVER (PARTITION BY tier, u % 8
                          ORDER BY u, t.doc_id) - 1) * 8 + u % 8
                    AS BIGINT) AS tier_pos
                FROM tiers t JOIN h USING (doc_id)),
         off AS (SELECT tier, max(tier_pos) + 1 AS sz FROM tp
                 GROUP BY tier),
         off2 AS (SELECT tier,
                    CAST(coalesce(SUM(sz) OVER (ORDER BY tier
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS ofs
                  FROM off)
         SELECT tp.doc_id, tp.tier, tp.shard, tp.tier_pos,
                ofs + tier_pos AS curriculum_pos
         FROM tp JOIN off2 USING (tier)""") { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      Sampling.curriculumOrder(
        graft.ops.TextAnalysis.repetitionFeatures(docs, col("text")),
        "doc_id", col("dup_token_frac"), tiers = 4, shards = 8)
    },

    // 120-char windows, 30-char overlap (stride 90); integer-exact
    // chunk counts so both engines cut identical windows
    q("q_chunk_docs", "llm-pack",
      """WITH k AS (
           SELECT doc_id, text,
             CASE WHEN length(text) <= 120 THEN 1
                  ELSE (length(text) - 120 + 89) // 90 + 1 END AS n
           FROM documents WHERE text IS NOT NULL AND length(text) > 0)
         SELECT doc_id, u.cid AS chunk_id, u.chunk AS chunk FROM (
           SELECT doc_id,
             unnest([{'cid': i - 1,
                      'chunk': substr(text, (i-1)*90 + 1, 120)}
               for i in generate_series(1, n)]) AS u
           FROM k) t""") { (spark, dir) =>
      Pack.chunkDocs(Tables.df(spark, dir, "documents"),
        "doc_id", "text", maxChars = 120, overlap = 30)
    },

    // the end-to-end curation pipeline every training corpus goes
    // through, composed from the operators above: quality filter →
    // eval-slice exclusion → decontamination → exact-dedup
    // representative → mixture sampling → sequence packing. Runs on the
    // duplicate-injected corpus so the dedup stage has real work; every
    // stage is engine-exact, so the whole composition oracles in DuckDB
    q("q_curate_corpus", "llm-pack",
      s"""WITH ${DedupQueries.corpusSql},
          wm AS (
            SELECT c.doc_id, c.text, c.doc_id % 100000 AS orig_id,
                   m.source, m.n_chars
            FROM corpus c
            JOIN documents m ON c.doc_id % 100000 = m.doc_id),
          quality AS (
            SELECT * FROM wm WHERE len(string_split(text, ' ')) >= 20),
          train AS (SELECT * FROM quality WHERE orig_id % 7 != 0),
          evg AS (
            SELECT DISTINCT unnest([array_to_string(toks[i:i+3], ' ')
              for i in generate_series(1, greatest(len(toks)-3, 0))]) AS g
            FROM (SELECT string_split(text, ' ') AS toks FROM documents
                  WHERE doc_id % 7 = 0)),
          tg AS (
            SELECT doc_id, unnest([array_to_string(toks[i:i+3], ' ')
              for i in generate_series(1, greatest(len(toks)-3, 0))]) AS g
            FROM (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM train)),
          hit AS (SELECT DISTINCT doc_id FROM tg
                  WHERE g IN (SELECT g FROM evg)),
          decon AS (SELECT * FROM train
                    WHERE doc_id NOT IN (SELECT doc_id FROM hit)),
          rep AS (SELECT min(doc_id) AS doc_id FROM decon GROUP BY text),
          kept AS (SELECT d.* FROM decon d
                   JOIN rep r ON d.doc_id = r.doc_id),
          samp AS (
            SELECT doc_id, COALESCE(n_chars, 0) AS tokens FROM kept
            WHERE ((((((doc_id % 2147483646 + 1) * 48271) % 2147483647)
                     * 48271) % 2147483647) * 48271) % 2147483647 <
              CASE (CAST(substr(source, 4) AS BIGINT) % 4)
                WHEN 0 THEN 536870912
                WHEN 1 THEN 1073741824
                WHEN 2 THEN 1610612735
                WHEN 3 THEN 2147483647
              END)
          SELECT doc_id, tokens,
                 CAST(COALESCE(SUM(tokens) OVER (
                        ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) // $Budget AS BIGINT) AS pack_id
          FROM samp""") { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      val meta = docs.select(col("doc_id").as("orig_id"),
        col("source"), col("n_chars"))
      val withMeta = DedupQueries.corpus(spark, dir)
        .withColumn("orig_id", col("doc_id") % 100000)
        .join(meta, "orig_id")
      val quality = withMeta.filter(size(split(col("text"), " ")) >= 20)
      val train = quality.filter(col("orig_id") % 7 =!= 0)
      val evalSet = docs.filter(col("doc_id") % 7 === 0)
      // decon feeds both the representative agg and the keep join;
      // materialize it once instead of recomputing the gram semi join
      // per consumer (localCheckpoint blocks are context-cleaned once
      // the result goes unreachable — nothing leaks into the session)
      val decon = Decontaminate.clean(train, evalSet, "doc_id", "text", 4)
        .localCheckpoint()
      val rep = Dedup.exact(decon, col("doc_id"), col("text"))
        .select(col("keep_id").as("doc_id"))
      val kept = decon.join(rep, "doc_id")
      val sampled = Sampling.weightedBySource(kept, "doc_id", "source",
        mixtureWeights)
      Pack.sequencePack(sampled, "doc_id", "n_chars", Budget)
    },

    // Curation composition v2 over the round-9 operators: repetition
    // gate (Gopher-style duplicate-token fraction) → PII redaction →
    // exact dedup ON THE REDACTED TEXT → sequence packing. The
    // injected PII is CONSTANT (not doc_id-derived) so redaction is
    // uniform and dedup-on-redacted remains equivalent to
    // dedup-on-raw; the per-doc redaction regexes themselves are
    // byte-validated by q_text_pii.
    q("q_curate_corpus_v2", "llm-pack",
      s"""WITH base AS (
            SELECT doc_id, n_chars,
              regexp_replace(regexp_replace(regexp_replace(
                text || ' contact bob@example.com or 10.0.0.7 tel 555-867-5309',
                '${TextAnalysis.EmailPattern}',
                '<EMAIL>', 'g'),
                '${TextAnalysis.Ipv4Pattern}',
                '<IP>', 'g'),
                '${TextAnalysis.PhonePattern}', '<PHONE>', 'g') AS rtext,
              string_split(text, ' ') AS toks
            FROM documents),
          quality AS (
            SELECT * FROM base
            WHERE len(toks) >= 20
              AND 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
                / len(toks) <= 0.6),
          rep AS (SELECT min(doc_id) AS doc_id FROM quality GROUP BY rtext),
          kept AS (SELECT q.doc_id, q.n_chars FROM quality q
                   JOIN rep r ON q.doc_id = r.doc_id)
          SELECT doc_id, n_chars AS tokens,
                 CAST(COALESCE(SUM(n_chars) OVER (
                        ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) // $Budget AS BIGINT) AS pack_id
          FROM kept""") { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      val base = docs.select(col("doc_id"), col("n_chars"), col("text"),
        TextAnalysis.redactPii(concat(col("text"),
          lit(" contact bob@example.com or 10.0.0.7 tel 555-867-5309")))
          .as("rtext"))
      val quality = TextAnalysis.repetitionFeatures(base, col("text"))
        .filter(size(split(col("text"), " ")) >= 20 &&
          col("dup_token_frac") <= 0.6)
      val rep = Dedup.exact(quality, col("doc_id"), col("rtext"))
        .select(col("keep_id").as("doc_id"))
      val kept = quality.join(rep, "doc_id")
        .select(col("doc_id"), col("n_chars"))
      Pack.sequencePack(kept, "doc_id", "n_chars", Budget)
    },

    // Curation composition v3 over the round-10 operators: bigram-LM
    // typicality gate (keep docs whose LM score is ≥ 0.95× the corpus
    // average — the relative threshold derives from ORDER-FREE integer
    // totals, so it is deterministic cross-engine) → sub-document unit
    // dedup (the injected exact copies lose every unit to their
    // originals and vanish; tail variants keep only their novel tail)
    // → sequence packing on the REASSEMBLED text length. Runs on the
    // duplicate-injected corpus so unit dedup has real work; every
    // stage is engine-exact, so the whole composition oracles.
    q("q_curate_corpus_v3", "llm-pack",
      s"""WITH ${DedupQueries.corpusSql},
          toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                   FROM corpus),
          bgw AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM (
                    SELECT doc_id, unnest([array_to_string(tk[i:i+1], ' ')
                      for i in generate_series(1, len(tk)-1)]) AS bg
                    FROM toks) t),
          bc AS (SELECT bg, count(*) AS c_bg FROM bgw GROUP BY bg),
          uc AS (SELECT w1, count(*) AS c_w1 FROM (
                   SELECT unnest(tk) AS w1 FROM toks) u GROUP BY w1),
          v AS (SELECT count(*) AS v FROM uc),
          lm AS (
            SELECT doc_id, count(*) AS n_bigrams,
                   CAST(sum((c_bg * 1000000) // (c_w1 + v)) AS BIGINT)
                     AS lm_fp_sum
            FROM bgw JOIN bc USING (bg) JOIN uc USING (w1) CROSS JOIN v
            GROUP BY doc_id),
          tot AS (SELECT CAST(sum(lm_fp_sum) AS BIGINT) AS tf,
                         CAST(sum(n_bigrams) AS BIGINT) AS tn FROM lm),
          gated AS (
            SELECT c.doc_id, c.text FROM corpus c
            JOIN lm USING (doc_id) CROSS JOIN tot
            WHERE CAST(lm_fp_sum AS DOUBLE) / (n_bigrams * 1000000)
                  >= 0.95 * (CAST(tf AS DOUBLE) / (tn * 1000000))),
          raw AS (SELECT doc_id, string_split(text, '. ') AS us
                  FROM gated),
          u AS (SELECT doc_id, uu.pos AS pos, uu.unit AS unit
                FROM (SELECT doc_id, unnest([{'pos': i - 1, 'unit': us[i]}
                        for i in generate_series(1, len(us))]) AS uu
                      FROM raw) t),
          kept_u AS (SELECT doc_id, pos, unit FROM (
                       SELECT doc_id, pos, unit,
                              row_number() OVER (PARTITION BY unit
                                ORDER BY doc_id, pos) AS rn
                       FROM u) t WHERE rn = 1),
          dedup AS (SELECT doc_id,
                           array_to_string(list(unit ORDER BY pos), '. ')
                             AS dtext
                    FROM kept_u GROUP BY doc_id)
          SELECT doc_id, CAST(length(dtext) AS BIGINT) AS tokens,
                 CAST(COALESCE(SUM(length(dtext)) OVER (
                        ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) // $Budget AS BIGINT) AS pack_id
          FROM dedup""") { (spark, dir) => curateV3(spark, dir)._3 },

    // Curation composition v4 over the round-11 operators: span dedup
    // (remove every ≥8-token span already seen elsewhere, reassemble),
    // drop empty remnants, then SPLIT — short remnants (<8 tokens)
    // resolve by EXACT dedup (hash group, min id; no posting lists —
    // span dedup concentrates shared boilerplate into short docs whose
    // shingle prefix IS the boilerplate, the frequent-shingle blowup
    // the PPJoin prefix cannot prune below its own window), long docs
    // by n-gram Jaccard clusters resolved keep-LONGEST (ties → min id
    // — representativesBy, not min-id) — then sequence packing on the
    // deduped length. Runs on the duplicate-bearing slice (the jaccard
    // join's cost is already benched standalone; q_dedup_clusters'
    // stance). Every stage is engine-exact, so the whole composition
    // oracles end to end; the span CTE chain is shared VERBATIM with
    // q_dedup_spans (DedupQueries.spanDedupCtes), so the two cannot
    // drift.
    q("q_curate_corpus_v4", "llm-pack",
      s"""WITH RECURSIVE ${DedupQueries.clustersCorpusSql},
          ${DedupQueries.spanDedupCtes(8)},
          ne AS (SELECT doc_id, dtext, string_split(dtext, ' ') AS tk2
                 FROM sd WHERE dtext <> ''),
          shrt AS (SELECT doc_id, dtext FROM ne
                   WHERE len(tk2) < $MinNearDupTokens),
          skeep AS (SELECT min(doc_id) AS doc_id FROM shrt GROUP BY dtext),
          lng AS (SELECT doc_id, dtext, tk2 FROM ne
                  WHERE len(tk2) >= $MinNearDupTokens),
          sh AS (
            SELECT doc_id,
              list_distinct([array_to_string(tk2[i:i+2], ' ')
                for i in generate_series(1, greatest(len(tk2)-2, 0))]) AS shl
            FROM lng),
          inv AS (SELECT doc_id, len(shl) AS n_sh, unnest(shl) AS s FROM sh),
          prs AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
            HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*))
                   >= 0.8),
          edges AS (SELECT a_id AS a, b_id AS b FROM prs
                    UNION SELECT b_id, a_id FROM prs),
          reach(id, r) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b),
          comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
          keepr AS (SELECT component, id AS keeper FROM (
                      SELECT comp.id, comp.component, row_number() OVER (
                        PARTITION BY component
                        ORDER BY strlen(s2.dtext) DESC, comp.id) AS rn
                      FROM comp JOIN lng s2 ON s2.doc_id = comp.id) t
                    WHERE rn = 1),
          losers AS (SELECT comp.id FROM comp JOIN keepr USING (component)
                     WHERE comp.id <> keepr.keeper),
          surv AS (SELECT doc_id, length(dtext) AS tokens FROM shrt
                   WHERE doc_id IN (SELECT doc_id FROM skeep)
                   UNION ALL
                   SELECT doc_id, length(dtext) AS tokens FROM lng
                   WHERE doc_id NOT IN (SELECT id FROM losers))
          SELECT doc_id, CAST(tokens AS BIGINT) AS tokens,
                 CAST(COALESCE(SUM(tokens) OVER (
                        ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) // $Budget AS BIGINT) AS pack_id
          FROM surv""") { (spark, dir) =>
      curateV4Frames(DedupQueries.clustersCorpus(spark, dir))._2
    })

  /** The v3 composition with its stage frames exposed so the spec can
    * pin the boundary materialization (returns (lm, gated, result)).
    *
    * Composition boundaries are MATERIALIZED or the chain re-executes
    * its upstream DAGs multiplicatively: lm is consumed twice (the
    * corpus-total aggregate and the per-doc join) and unitDedup
    * consumes its input twice (winner agg + keep join), so without
    * these boundaries the whole two-wordcount LM pipeline runs ~4-6x
    * per invocation (measured 8.4 s vs 2 s at sf0.1). Eager
    * localCheckpoint, NOT a lazy persist: a lazy cache still
    * double-computes when two consumers race the fill inside the
    * chain's first action, and its entry would outlive the query in
    * the session's storage memory — checkpoint blocks compute exactly
    * once. The two corpus-sized frames (lm, and gated carrying full
    * text) are RELEASED EAGERLY before returning: sequencePack eagerly
    * checkpoints its own small, text-free input, so by return time
    * nothing downstream references their blocks — waiting for the
    * ContextCleaner (result unreachable + a driver GC) would leave a
    * near-full copy of the corpus text in executor storage for a
    * nondeterministic window across the rest of a catalog run. The
    * release goes through [[graft.core.Checkpoints.release]] (unpersist
    * of the underlying checkpoint RDD): `Dataset.unpersist` only clears
    * CacheManager entries and is a silent no-op on checkpoint blocks. The
    * returned lm/gated stay explainable (the spec pins their boundary
    * plans) but their blocks are freed — explain-only frames.
    *
    * Measured stage split at sf0.1 (warm JVM, 32 threads): LM score
    * ~2.2 s, gate ~0.3 s, unit dedup ~0.8 s, pack ~1.0 s. The LM
    * wordcounts dominate because they run on the duplicate-injected
    * corpus (~5× the raw documents table); per-row cost matches the
    * standalone q_text_lm_score, so the time is intrinsic linear
    * work, not plan waste — all three heavy stages are single-pass
    * corpus scans with shuffle-bounded aggregations. */
  private[graft] def curateV3(spark: SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame) =
    curateV3Frames(DedupQueries.corpus(spark, dir))

  /** Frame-based core of [[curateV3]] — the catalog wrapper binds it to
    * the duplicate-injected corpus; ScaleRamp drives THIS on replicated
    * corpora so the ramp measures the production composition, not a
    * re-spelling. */
  private[graft] def curateV3Frames(
      corpus: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val lm = TextAnalysis.bigramLmScore(corpus, "doc_id", "text")
      .localCheckpoint()
    val tot = lm.agg(sum(col("lm_fp_sum")).as("tf"),
      sum(col("n_bigrams")).as("tn"))
    val gated = corpus.join(lm, "doc_id")
      .crossJoin(broadcast(tot))
      // degenerate (<2-token) docs have no LM evidence: excluded
      // explicitly, matching the oracle's inner join — and keeping
      // the 0/0 NaN out of the gate predicate
      .filter(col("n_bigrams") > 0)
      // the operator's own lm_score column IS the fixed-point→double
      // conversion (bit-identical for n_bigrams > 0) — re-spelling
      // the formula here would silently desync the gate if the
      // scale factor or smoothing in bigramLmScore ever changed
      .filter(col("lm_score") >=
        lit(0.95) * (col("tf").cast("double") /
          (col("tn") * 1000000L).cast("double")))
      .select(col("doc_id"), col("text"))
      .localCheckpoint()
    val deduped = Dedup.unitDedup(gated, "doc_id", "text")
      .select(col("doc_id"),
        length(col("deduped_text")).cast("long").as("tokens"))
    val packed = Pack.sequencePack(deduped, "doc_id", "tokens", Budget)
    // Dataset.unpersist would be a silent no-op here (checkpoint blocks
    // are not CacheManager entries) — release the underlying RDD blocks
    graft.core.Checkpoints.release(lm)
    graft.core.Checkpoints.release(gated)
    (lm, gated, packed)
  }

  /** Frame-based core of the v4 composition: span dedup → (short
    * remnants: exact dedup | long docs: Jaccard clusters resolved by
    * keep-LONGEST) → pack; returns (pairs, packed). Empty remnants
    * (docs wholly composed of already-seen spans) are dropped — the
    * unitDedup vanishing-copy precedent. Same boundary discipline as
    * [[curateV3Frames]]: the corpus-sized span-deduped frame is
    * eagerly localCheckpoint'd — it is consumed four times
    * (short/long splits, shingle pass, priority projection, keep
    * joins) and each re-execution would re-run the whole span-dedup
    * DAG — then RELEASED before returning (ngramJaccardPairs
    * checkpoints its own pair list, representativesBy's CC labels are
    * checkpointed internally, and sequencePack eagerly checkpoints its
    * small text-free input, so by return time nothing references the
    * blocks). The span-deduped frame is deliberately NOT returned:
    * its checkpoint blocks are freed here, so executing it later
    * would fail at runtime — a tuple slot that only works under
    * .explain invites misuse. */
  private[graft] def curateV4Frames(
      corpus: DataFrame): (DataFrame, DataFrame) = {
    val sd = Dedup.spanDedup(corpus, "doc_id", "text", 8)
      .localCheckpoint()
    val nTok = size(split(col("deduped_text"), " "))
    val nonEmpty = sd.filter(col("deduped_text") =!= "")
    val short = nonEmpty.filter(nTok < MinNearDupTokens)
    val long = nonEmpty.filter(nTok >= MinNearDupTokens)
    val shortKept = short.join(
      Dedup.exact(short, col("doc_id"), col("deduped_text"))
        .select(col("keep_id").as("doc_id")), "doc_id")
    val pairs = Dedup.ngramJaccardPairs(
      long.select(col("doc_id"), col("deduped_text").as("text")),
      "doc_id", "text", 3, 0.8)
    val longKept = Dedup.representativesBy(long, pairs, "doc_id",
      octet_length(col("deduped_text")))
    val kept = shortKept.unionByName(longKept)
      .select(col("doc_id"),
        length(col("deduped_text")).cast("long").as("tokens"))
    val packed = Pack.sequencePack(kept, "doc_id", "tokens", Budget)
    graft.core.Checkpoints.release(sd)
    (pairs, packed)
  }

  // lazy: referenced from `queries` (declared ABOVE) during object
  // init — a plain val here is still null at that point and would
  // interpolate "null" into the oracle SQL (caught by the r11
  // differential: every stop_ratio read 0.0 and the DESC order
  // degenerated to doc_id)
  private lazy val stopSet =
    TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")

  /** Single-window oracle spelling of the budget selection: the global
    * running total over (stop_ratio DESC, doc_id) — Spark's
    * score-sharded prefix sum must cancel its shard boundaries against
    * this exactly. stop_ratio is q_text_stats' formulation verbatim. */
  private def selectBudgetSql(budget: Long): String =
    s"""WITH f AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
             CAST(len(list_filter(string_split(text, ' '),
               w -> w IN ($stopSet))) AS DOUBLE)
               / len(string_split(text, ' ')) AS stop_ratio
           FROM documents),
         c AS (SELECT doc_id, tokens, stop_ratio,
                 CAST(SUM(tokens) OVER (ORDER BY stop_ratio DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_tokens
               FROM f)
       SELECT doc_id, tokens, stop_ratio, cum_tokens FROM c
       WHERE cum_tokens <= $budget"""

  private def selectBudgetSourceSql(budget: Long): String =
    s"""WITH f AS (SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
             CAST(len(list_filter(string_split(text, ' '),
               w -> w IN ($stopSet))) AS DOUBLE)
               / len(string_split(text, ' ')) AS stop_ratio
           FROM documents),
         c AS (SELECT doc_id, source, tokens, stop_ratio,
                 CAST(SUM(tokens) OVER (PARTITION BY source
                   ORDER BY stop_ratio DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_tokens
               FROM f)
       SELECT doc_id, source, tokens, stop_ratio, cum_tokens FROM c
       WHERE cum_tokens <= $budget"""
}
