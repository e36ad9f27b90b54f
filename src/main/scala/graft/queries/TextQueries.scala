package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.core.Tables
import graft.ops.TextAnalysis

/** Text-analysis operators over the documents table: quality features,
  * BPE-ish token counting, language-ID heuristic, fingerprinting. All
  * counts are integer-exact; ratios are IEEE-double divisions of exact
  * ints (bit-identical cross-engine).
  */
object TextQueries extends QueryGroup {

  private val stopSet =
    TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")

  /** The BPE encode loop as recursive-CTE SQL, ending in `bdocs`
    * (doc_id, n_tokens_bpe, bpe_text) — shared by q_tokenize_bpe and
    * the budget composition in PackQueries so the two cannot drift.
    * A `def` (not a val below `queries`): object-init order would
    * interpolate null otherwise — the r11 stop_ratio lesson.
    *
    * Replay mechanics: per (doc, word) the state is the token list;
    * each recursive step merges the LEFTMOST occurrence of the
    * lowest-rank pair (rank = `list_position` into the literal merges
    * array — exactly BpeEncode's HashMap rank), terminal states are
    * rows where no pair ranks. DuckDB struct lists sort
    * lexicographically by field order, so `list_sort(...)[1]` over
    * {'r', 'i'} structs IS the (rank, position) argmin. */
  private[queries] def bpeEncCtes: String =
    bpeEncCtesWith(graft.functions.BpeFixture.sqlLiteral, "")

  /** [[bpeEncCtes]] with the rank table pluggable: `mergesExpr` is the
    * DuckDB list expression ranks come from (the fixture literal, or a
    * column cross-joined in via `encFrom` — subqueries can't appear
    * inside DuckDB lambdas, so a LEARNED table rides in as
    * `encFrom = " CROSS JOIN mlist"` exposing its 1-row list column). */
  private[queries] def bpeEncCtesWith(mergesExpr: String,
      encFrom: String): String = {
    val best =
      s"""list_sort(list_filter(
            [{'r': coalesce(list_position($mergesExpr,
                toks[i] || ' ' || toks[i + 1]), 0), 'i': i}
             for i in generate_series(1, greatest(len(toks) - 1, 0))],
            x -> x.r > 0))[1].i"""
    s"""bw AS (
         SELECT doc_id, wi, word FROM (
           SELECT doc_id, unnest([{'wi': i, 'word': ws[i]}
                    for i in generate_series(1, len(ws))],
                  recursive := true)
           FROM (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents WHERE text IS NOT NULL) s0) s1
         WHERE word <> ''),
       enc(doc_id, wi, toks) AS (
         SELECT doc_id, wi, regexp_extract_all(word, '[\\s\\S]') FROM bw
         UNION ALL
         SELECT doc_id, wi,
           toks[1:b - 1] || [toks[b] || toks[b + 1]] || toks[b + 2:]
         FROM (SELECT doc_id, wi, toks, $best AS b
               FROM enc$encFrom) t
         WHERE b IS NOT NULL),
       bterm AS (
         SELECT doc_id, wi, toks
         FROM (SELECT doc_id, wi, toks, $best AS b
               FROM enc$encFrom) t
         WHERE b IS NULL),
       bagg AS (
         SELECT doc_id, CAST(sum(len(toks)) AS BIGINT) AS n,
                string_agg(array_to_string(toks, ' '), ' '
                  ORDER BY wi) AS s
         FROM bterm GROUP BY doc_id),
       bdocs AS (
         SELECT d.doc_id, CAST(coalesce(a.n, 0) AS BIGINT) AS n_tokens_bpe,
                coalesce(a.s, '') AS bpe_text
         FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d
         LEFT JOIN bagg a USING (doc_id))"""
  }

  /** The BPE TRAINING loop as an unrolled DuckDB CTE chain, ending in
    * `bmerges` (rank, pair, cnt) and `mlist` (the 1-row ordered merge
    * list) — the oracle twin of [[graft.ops.Bpe.learnMerges]]. Per
    * round r: `p{r}` counts adjacent pairs over the surviving word
    * table weighted by word frequency, `b{r}` is the (count DESC,
    * pair ASC) argmax with the count ≥ 2 stop, `f{r}` replays the
    * merge as the SAME left fold the engine's `aggregate` lambda runs
    * (recursive over token position; `acc[-1] = a AND toks[i] = b` →
    * fold the last accumulator token), `w{r}` keeps words still ≥ 2
    * tokens. `AS MATERIALIZED` pins each round's table: without it
    * DuckDB re-inlines the upstream chain per recursive iteration and
    * the plan goes exponential in k (measured: k=8 plain times out,
    * k=40 materialized runs ~1 s). Unrolling is the honest SQL shape
    * for a loop whose rounds are data-dependent sequential. */
  private[queries] def bpeLearnCtes(k: Int): String = {
    val rounds = (1 to k).map { r =>
      val p = r - 1
      s"""p$r AS MATERIALIZED (
           SELECT toks[i] || ' ' || toks[i + 1] AS pair,
                  CAST(sum(freq) AS BIGINT) AS cnt
           FROM w$p, unnest(generate_series(1, len(toks) - 1)) AS u(i)
           GROUP BY 1),
         b$r AS MATERIALIZED (
           SELECT pair, cnt FROM p$r WHERE cnt >= 2
           ORDER BY cnt DESC, pair LIMIT 1),
         f$r(toks, freq, i, acc) AS (
           SELECT toks, freq, 1, CAST([] AS VARCHAR[]) FROM w$p
           UNION ALL
           SELECT toks, freq, i + 1,
             CASE WHEN len(acc) > 0
                   AND acc[-1] =
                     (SELECT string_split(pair, ' ')[1] FROM b$r)
                   AND toks[i] =
                     (SELECT string_split(pair, ' ')[2] FROM b$r)
                  THEN acc[1:len(acc) - 1] || [acc[-1] || toks[i]]
                  ELSE acc || [toks[i]] END
           FROM f$r WHERE i <= len(toks)),
         w$r AS MATERIALIZED (
           SELECT acc AS toks, freq FROM f$r
           WHERE i = len(toks) + 1 AND len(acc) >= 2)"""
    }
    val union = (1 to k)
      .map(r => s"SELECT CAST($r AS INT) AS rank, pair, cnt FROM b$r")
      .mkString("\nUNION ALL\n")
    s"""w0 AS MATERIALIZED (
         SELECT regexp_extract_all(word, '[\\s\\S]') AS toks,
                CAST(count(*) AS BIGINT) AS freq
         FROM (SELECT unnest(string_split(text, ' ')) AS word
               FROM documents WHERE text IS NOT NULL)
         WHERE word <> ''
           AND len(regexp_extract_all(word, '[\\s\\S]')) >= 2
         GROUP BY word),
       ${rounds.mkString(",\n")},
       bmerges AS MATERIALIZED ($union),
       mlist AS MATERIALIZED (
         SELECT list(pair ORDER BY rank) AS ml FROM bmerges)"""
  }

  val queries: Seq[Q] = Seq(
    // DISTRIBUTED BPE VOCABULARY LEARNING (graft.ops.Bpe.learnMerges):
    // the full training loop — corpus-weighted pair counts, (count
    // DESC, pair ASC) argmax, left-to-right non-overlapping merge —
    // differentials round for round against the unrolled recursive-CTE
    // replay, counts included. 40 merges reproduces BpeFixture.Merges
    // exactly (BpeSpec pins that equality), so the shipped tokenizer
    // vocabulary is itself an output of the engine under test.
    q("q_bpe_learn", "text",
      s"""WITH RECURSIVE ${bpeLearnCtes(40)}
          SELECT rank, pair, cnt FROM bmerges""") { (spark, dir) =>
      import spark.implicits._
      val learned = graft.ops.Bpe.learnMerges(
        Tables.df(spark, dir, "documents"), "text", maxMerges = 40)
      learned.zipWithIndex
        .map { case (m, i) => (i + 1, m.pair, m.cnt) }
        .toDF("rank", "pair", "cnt")
    },

    // the INCREMENTAL trainer face (Bpe.learnMergesIncremental):
    // pair counts maintained as a second loop state, updated by the
    // delta of only the words containing each merge — the corpus-
    // scale face that retires the per-round vocab explode. Shares
    // q_bpe_learn's oracle VERBATIM: identical total order, identical
    // trajectory, one hash pins recount ≡ incremental ≡ SQL replay.
    q("q_bpe_learn_incremental", "text",
      s"""WITH RECURSIVE ${bpeLearnCtes(40)}
          SELECT rank, pair, cnt FROM bmerges""") { (spark, dir) =>
      import spark.implicits._
      val learned = graft.ops.Bpe.learnMergesIncremental(
        Tables.df(spark, dir, "documents"), "text", maxMerges = 40)
      learned.zipWithIndex
        .map { case (m, i) => (i + 1, m.pair, m.cnt) }
        .toDF("rank", "pair", "cnt")
    },

    // the MEASURED face chooser under the same oracle (r20): the
    // 3-round probe measures affected/vocab and commits the run to
    // the winning face (this corpus reads ~0.12 → recount) — one hash
    // now pins auto ≡ recount ≡ incremental ≡ SQL replay, so a
    // chooser that ever changed the total order would fail the gate,
    // not just a spec.
    q("q_bpe_learn_auto", "text",
      s"""WITH RECURSIVE ${bpeLearnCtes(40)}
          SELECT rank, pair, cnt FROM bmerges""") { (spark, dir) =>
      import spark.implicits._
      val learned = graft.ops.Bpe.learnMergesAuto(
        Tables.df(spark, dir, "documents"), "text", maxMerges = 40)
      learned.merges.zipWithIndex
        .map { case (m, i) => (i + 1, m.pair, m.cnt) }
        .toDF("rank", "pair", "cnt")
    },

    // learn → tokenize COMPOSITION: fertility report under a
    // 24-merge vocabulary learned by the engine in the same query —
    // pins the artifact handoff (learned table → BpeEncode's rank
    // map) end to end. 24 ≠ the fixture's 40, so this cannot pass by
    // coinciding with q_bpe_fertility's fixed table.
    q("q_bpe_learn_fertility", "text", {
      val enc = bpeEncCtesWith("ml", " CROSS JOIN mlist")
      s"""WITH RECURSIVE ${bpeLearnCtes(24)},
          $enc,
          wl AS (SELECT doc_id, lang,
                   len(string_split(text, ' ')) AS nw
                 FROM documents WHERE text IS NOT NULL)
          SELECT lang,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(nw) AS BIGINT) AS n_words,
            CAST(sum(b.n_tokens_bpe) AS BIGINT) AS n_tokens,
            CAST(sum(b.n_tokens_bpe) AS DOUBLE) /
              CAST(sum(nw) AS DOUBLE) AS fertility
          FROM wl JOIN bdocs b USING (doc_id)
          GROUP BY lang"""
    }) { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      val learned = graft.ops.Bpe
        .learnMerges(docs, "text", maxMerges = 24).map(_.pair)
      TextAnalysis.bpeFertility(docs, "doc_id", "text", "lang",
        learned)
    },

    // REAL deterministic BPE tokenization (graft.functions.BpeEncode):
    // greedy rank-merge encode against the fixture-trained merges
    // table. The WHOLE tokenizer — seed chars, merge order, terminal
    // states, reassembly — differentials against the recursive-CTE
    // replay; n_tokens_bpe is the model-token count the budget/pack
    // surface composes on (q_select_budget_bpe).
    q("q_tokenize_bpe", "text",
      s"""WITH RECURSIVE $bpeEncCtes
          SELECT doc_id, n_tokens_bpe, bpe_text FROM bdocs""") {
      (spark, dir) =>
      TextAnalysis.bpeTokenize(
        Tables.df(spark, dir, "documents"), "doc_id", "text")
    },

    // Unicode NFC normalization (codegen'd NfcNormalize expression vs
    // DuckDB's nfc_normalize — both implement the Unicode standard):
    // even docs get a DECOMPOSED e+U+0301 suffix (changed=true after
    // normalization), odd docs the precomposed U+00E9 (NFC no-op) —
    // the canonicalization step hash-keyed dedup needs first
    q("q_text_nfc", "text",
      """WITH a AS (
           SELECT doc_id,
             text || CASE WHEN doc_id % 2 = 0 THEN ' cafe' || chr(769)
                          ELSE ' caf' || chr(233) END AS aug
           FROM documents)
         SELECT doc_id, nfc_normalize(aug) AS nfc_text,
                aug <> nfc_normalize(aug) AS changed
         FROM a""") { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      val aug = concat(col("text"),
        when(col("doc_id") % 2 === 0, lit(" cafe\u0301"))
          .otherwise(lit(" caf\u00e9")))
      docs.select(col("doc_id"),
        TextAnalysis.nfc(aug).as("nfc_text"),
        (aug =!= TextAnalysis.nfc(aug)).as("changed"))
    },

    // tokenizer fertility (BPE tokens per word, by language): the
    // multilingual-tokenizer health metric. Reuses the bdocs replay so
    // the encode under test is the identical recursive-CTE contract
    q("q_bpe_fertility", "text",
      s"""WITH RECURSIVE $bpeEncCtes,
          wl AS (SELECT doc_id, lang,
                   len(string_split(text, ' ')) AS nw
                 FROM documents WHERE text IS NOT NULL)
          SELECT lang,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(nw) AS BIGINT) AS n_words,
            CAST(sum(b.n_tokens_bpe) AS BIGINT) AS n_tokens,
            CAST(sum(b.n_tokens_bpe) AS DOUBLE) /
              CAST(sum(nw) AS DOUBLE) AS fertility
          FROM wl JOIN bdocs b USING (doc_id)
          GROUP BY lang""") { (spark, dir) =>
      TextAnalysis.bpeFertility(
        Tables.df(spark, dir, "documents"), "doc_id", "text", "lang")
    },

    q("q_text_stats", "text",
      s"""SELECT doc_id,
            CAST(length(text) AS BIGINT) AS n_chars_m,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
            CAST(len(regexp_extract_all(text,
              '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpeish,
            CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT)
              AS n_punct,
            CAST(len(list_filter(string_split(text, ' '),
              w -> w IN ($stopSet))) AS BIGINT) AS n_stop,
            CAST(len(list_filter(string_split(text, ' '),
              w -> w IN ($stopSet))) AS DOUBLE) /
              len(string_split(text, ' ')) AS stop_ratio,
            CAST(length(text) AS DOUBLE) /
              len(string_split(text, ' ')) AS mean_word_len
          FROM documents""") { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      TextAnalysis.qualityFeatures(docs, col("text"))
        .select(col("doc_id"),
          col("n_chars_m").cast(LongType).as("n_chars_m"),
          col("n_words").cast(LongType).as("n_words"),
          col("n_bpeish").cast(LongType).as("n_bpeish"),
          col("n_punct").cast(LongType).as("n_punct"),
          col("n_stop").cast(LongType).as("n_stop"),
          col("stop_ratio"), col("mean_word_len"))
    },

    q("q_lang_id", "text", {
      val hitCols = TextAnalysis.LangProfiles.map { case (lang, words) =>
        val set = words.map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(string_split(text, ' '), w -> w IN ($set))) AS BIGINT) AS hits_$lang"
      }.mkString(",\n            ")
      val langs = TextAnalysis.LangProfiles.map(_._1)
      val cases = langs.map { l =>
        val geConds = langs.filter(_ != l)
          .map(o => s"hits_$l >= hits_$o").mkString(" AND ")
        s"WHEN hits_$l > 0 AND $geConds THEN '$l'"
      }.mkString("\n              ")
      s"""SELECT doc_id, lang,
            CASE $cases
              ELSE 'und' END AS lang_pred,
            hits_en, hits_es, hits_fr, hits_de
          FROM (SELECT doc_id, lang,
            $hitCols
          FROM documents)"""
    }) { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      TextAnalysis.langId(docs, col("text"))
        .select(Seq(col("doc_id"), col("lang"), col("lang_pred")) ++
          TextAnalysis.LangProfiles.map { case (l, _) =>
            col(s"hits_$l").cast(LongType).as(s"hits_$l") }: _*)
    },

    // invariant oracle: the 64-bit fingerprint is collision-free on this
    // corpus, so distinct fingerprints == distinct texts
    q("q_doc_fingerprint", "text",
      """SELECT count(DISTINCT text) AS n_fp,
           count(DISTINCT text) AS n_text,
           count(*) AS n_docs
         FROM documents""") { (spark, dir) =>
      Tables.df(spark, dir, "documents")
        .select(TextAnalysis.fingerprint(col("text")).as("fp"), col("text"))
        .agg(countDistinct(col("fp")).as("n_fp"),
          countDistinct(col("text")).as("n_text"),
          count(lit(1)).as("n_docs"))
    },

    // eval-set decontamination: docs sharing any word 4-gram with the
    // doc_id%7==0 "benchmark" slice are flagged. Spark probes a
    // broadcast xxhash64 gram set; DuckDB compares the raw grams — the
    // outputs agree exactly absent a 64-bit collision (none here, and
    // deterministic: green once is green always)
    q("q_decontaminate", "text",
      """WITH g AS (
           SELECT doc_id, unnest([array_to_string(toks[i:i+3], ' ')
             for i in generate_series(1, greatest(len(toks)-3, 0))]) AS g
           FROM (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents)),
         ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 7 = 0),
         hit AS (SELECT DISTINCT doc_id FROM g
                 WHERE doc_id % 7 != 0 AND g IN (SELECT g FROM ev))
         SELECT d.doc_id,
                d.doc_id IN (SELECT doc_id FROM hit) AS contaminated
         FROM documents d WHERE d.doc_id % 7 != 0""") { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      graft.ops.Decontaminate.flag(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0),
          "doc_id", "text", n = 4)
        .select(col("doc_id"), col("contaminated"))
    },

    // graded decontamination: per-doc fraction of DISTINCT 4-grams
    // shared with the benchmark slice — the thresholdable form of the
    // binary flag above. Counts are exact longs; the one double is a
    // single long/long division, IEEE-identical cross-engine; docs
    // with no gram evidence (< 4 tokens) score NULL, not 0
    q("q_decontaminate_score", "text",
      """WITH g AS (
           SELECT doc_id, unnest(list_distinct(
             [array_to_string(toks[i:i+3], ' ')
              for i in generate_series(1, greatest(len(toks)-3, 0))])) AS g
           FROM (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents)),
         ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 7 = 0),
         tot AS (SELECT doc_id, len(list_distinct(
                   [array_to_string(toks[i:i+3], ' ')
                    for i in generate_series(1, greatest(len(toks)-3, 0))]))
                     ::BIGINT AS n_grams
                 FROM (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents)
                 WHERE doc_id % 7 != 0),
         hit AS (SELECT doc_id, count(*)::BIGINT AS n_hit FROM g
                 WHERE doc_id % 7 != 0 AND g IN (SELECT g FROM ev)
                 GROUP BY doc_id)
         SELECT tot.doc_id, tot.n_grams,
                COALESCE(hit.n_hit, 0) AS n_hit,
                CASE WHEN tot.n_grams > 0
                     THEN CAST(COALESCE(hit.n_hit, 0) AS DOUBLE)
                          / CAST(tot.n_grams AS DOUBLE) END AS overlap
         FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id""") {
      (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      graft.ops.Decontaminate.overlapScore(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0),
          "doc_id", "text", n = 4)
        .select(col("doc_id"), col("n_grams"), col("n_hit"),
          col("overlap"))
    },

    // Bloom-filter decontamination — the 100 TB form of q_decontaminate:
    // eval grams collapse to a 64 KB bitset (mBits=2^19) probed inside a
    // single `exists` over each doc's shingle array, so the corpus plan
    // is scan → project (no explode, no join, no shuffle; BloomSpec pins
    // that). FULLY oracled including the false positives: the probe is
    // Spark Murmur3 (replayed in DuckDB integer SQL, the q_hash_buckets
    // machinery over gram strings) + Kirsch–Mitzenmacher double hashing
    // in BIGINT-safe arithmetic, so DuckDB rebuilds the exact bitset and
    // reproduces every FP. mBits is sized DOWN at this sf so FPs
    // actually occur — the compare then proves Bloom semantics, not
    // just the exact-overlap subset.
    q("q_bloom_decontaminate", "text", bloomDecontaminateSql) {
      (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      graft.ops.Decontaminate.bloomFlag(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0),
          "doc_id", "text", n = 4, mBits = 1 << 19, k = 3)
        .select(col("doc_id"), col("contaminated"))
    },

    // DSIR importance resampling (target = the doc_id%7==0 slice):
    // per-doc fixed-point bigram importance score (target LM minus
    // corpus LM) plus a deterministic murmur3(doc_id)-randomized
    // linear-ramp acceptance — engine-exact end to end (integer terms,
    // cross-multiplied keep test, no negative integer division; the id
    // hash replays through the 2-word murmur pipeline). θ=-10000 and
    // P=12000 straddle the sf score distribution (min -15.9k, median
    // -6.0k, max +4.2k) so `kept` is a nontrivial subset decided by
    // BOTH the score and the hash draw.
    q("q_dsir_resample", "text", dsirResampleSql) { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      TextAnalysis.dsirResample(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0),
          "doc_id", "text", thetaFp = -10000L, rampFp = 12000L)
        .select(col("doc_id"), col("n_bigrams"), col("diff_fp_sum"),
          col("dsir_score"), col("kept"))
    },

    // PII scrub pass: deterministic synthetic PII (an email, an IPv4,
    // a leading-zero-octet IPv4 as logs spell them, a US phone, a
    // +CC-prefixed phone, all derived from doc_id) is appended to
    // every document on BOTH engines, then redacted — the hash compare
    // validates the three regexes byte-for-byte. The tail also injects
    // NEGATIVE cases that must SURVIVE: 999.999.999.999 (octets out of
    // bounds — not an address) and 1234-567-8901 (no phone boundary).
    // The oracle interpolates the engine's own pattern constants, so
    // the two sides cannot drift. Patterns behave identically in Java
    // regex and RE2 (char classes, bounded quantifiers, \b); DuckDB
    // needs the 'g' flag to match Spark's replace-all semantics.
    q("q_text_pii", "text",
      s"""SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(
             text || ' contact u' || doc_id || '@example.com or 10.0.'
               || (doc_id % 256) || '.7 zp 192.168.001.042 tel'
               || ' 555-867-5309 alt'
               || ' +1-555-867-5309 not 999.999.999.999 nor 1234-567-8901',
             '${TextAnalysis.EmailPattern}',
             '<EMAIL>', 'g'),
             '${TextAnalysis.Ipv4Pattern}', '<IP>', 'g'),
             '${TextAnalysis.PhonePattern}', '<PHONE>', 'g') AS redacted
         FROM documents""") { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      docs.select(col("doc_id"),
        TextAnalysis.redactPii(concat(col("text"),
          lit(" contact u"), col("doc_id").cast("string"),
          lit("@example.com or 10.0."),
          (col("doc_id") % 256).cast("string"),
          lit(".7 zp 192.168.001.042 tel 555-867-5309 alt" +
            " +1-555-867-5309 not 999.999.999.999 nor 1234-567-8901")))
          .as("redacted"))
    },

    // repetition quality signals: duplicate-token and duplicate-bigram
    // fractions (boilerplate/spam flags). Integer counts, one double
    // division — exact cross-engine; DuckDB list slices are 1-based
    // inclusive, so toks[i:i+1] is the 2-element bigram window
    q("q_text_repetition", "text",
      """SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens_r,
           CASE WHEN len(toks) < 1 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
                  / len(toks) END AS dup_token_frac,
           CASE WHEN len(toks) < 2 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(
                    [array_to_string(toks[i:i+1], ' ')
                     for i in generate_series(1, len(toks)-1)]))
                  AS DOUBLE) / (len(toks) - 1) END AS dup_bigram_frac
         FROM (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents)""") { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      TextAnalysis.repetitionFeatures(docs, col("text"))
        .select(col("doc_id"),
          col("n_tokens_r").cast(LongType).as("n_tokens_r"),
          col("dup_token_frac"), col("dup_bigram_frac"))
    },

    // corpus-trained bigram-LM quality score (CCNet-style typicality
    // signal, exact-arithmetic variant): per-term fixed-point integer
    // (c_bg*10^6) div (c_w1 + V) — no libm log whose last ulp could
    // differ across engines — summed as integers (order-free), one
    // final exact-long division. Fully oracled, value-for-value.
    q("q_text_lm_score", "text",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                       FROM documents),
         bgw AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM (
                   SELECT doc_id, unnest([array_to_string(tk[i:i+1], ' ')
                     for i in generate_series(1, len(tk)-1)]) AS bg
                   FROM toks) t),
         bc AS (SELECT bg, count(*) AS c_bg FROM bgw GROUP BY bg),
         uc AS (SELECT w1, count(*) AS c_w1 FROM (
                  SELECT unnest(tk) AS w1 FROM toks) u GROUP BY w1),
         v AS (SELECT count(*) AS v FROM uc),
         terms AS (
           SELECT doc_id, count(*) AS n_bigrams,
                  CAST(sum((c_bg * 1000000) // (c_w1 + v)) AS BIGINT)
                    AS lm_fp_sum
           FROM bgw JOIN bc USING (bg) JOIN uc USING (w1) CROSS JOIN v
           GROUP BY doc_id)
         SELECT d.doc_id,
                COALESCE(n_bigrams, 0) AS n_bigrams,
                COALESCE(lm_fp_sum, 0) AS lm_fp_sum,
                CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN 0.0
                     ELSE CAST(lm_fp_sum AS DOUBLE)
                          / (n_bigrams * 1000000) END AS lm_score
         FROM documents d LEFT JOIN terms USING (doc_id)""") {
      (spark, dir) =>
      TextAnalysis.bigramLmScore(
        Tables.df(spark, dir, "documents"), "doc_id", "text")
    },

    // vocabulary building: top-20 tokens by count, lexicographic
    // tie-break makes the cut deterministic cross-engine
    q("q_vocab_topk", "text",
      """SELECT w AS word, count(*) AS n
         FROM (SELECT unnest(string_split(text, ' ')) AS w
               FROM documents)
         WHERE w != ''
         GROUP BY w ORDER BY n DESC, w LIMIT 20""") { (spark, dir) =>
      TextAnalysis.vocabulary(Tables.df(spark, dir, "documents"),
        col("text"), 20)
    },

    // boilerplate survey: the 20 4-grams present in the most DOCUMENTS
    // (within-doc distinct, so a doc repeating its own header doesn't
    // inflate the count) — what span-dedup/filters are about to remove
    q("q_boilerplate_grams", "text",
      """SELECT g AS gram, count(*) AS n_docs
         FROM (SELECT doc_id, unnest(list_distinct(
                 [array_to_string(toks[i:i+3], ' ')
                  for i in generate_series(1, greatest(len(toks)-3, 0))]))
                 AS g
               FROM (SELECT doc_id, string_split(text, ' ') AS toks
                     FROM documents))
         GROUP BY g ORDER BY n_docs DESC, g LIMIT 20""") { (spark, dir) =>
      TextAnalysis.boilerplateGrams(
        Tables.df(spark, dir, "documents"), col("text"), 4, 20)
    },

    // vocabulary drift between the even- and odd-id halves of the
    // corpus — the distribution monitor pairing with q_corpus_diff:
    // exact fixed-point per-million frequencies, |fp_a − fp_b| top-20
    // with the (drift DESC, word) total order. Words absent from one
    // side count 0 there — appearing/disappearing vocabulary is the
    // signal
    q("q_vocab_drift", "text",
      """WITH ea AS (SELECT unnest(string_split(text, ' ')) AS w
                     FROM documents WHERE doc_id % 2 = 0),
         eb AS (SELECT unnest(string_split(text, ' ')) AS w
                FROM documents WHERE doc_id % 2 = 1),
         ca AS (SELECT w AS word, count(*) AS n FROM ea
                WHERE w != '' GROUP BY 1),
         cb AS (SELECT w AS word, count(*) AS n FROM eb
                WHERE w != '' GROUP BY 1),
         ta AS (SELECT CAST(sum(n) AS BIGINT) AS tot_a FROM ca),
         tb AS (SELECT CAST(sum(n) AS BIGINT) AS tot_b FROM cb)
         SELECT word, n_a, n_b, fp_a, fp_b, drift_fp FROM (
           SELECT COALESCE(ca.word, cb.word) AS word,
             CAST(COALESCE(ca.n, 0) AS BIGINT) AS n_a,
             CAST(COALESCE(cb.n, 0) AS BIGINT) AS n_b,
             CAST(COALESCE(ca.n, 0) * 1000000 // tot_a AS BIGINT)
               AS fp_a,
             CAST(COALESCE(cb.n, 0) * 1000000 // tot_b AS BIGINT)
               AS fp_b,
             CAST(abs(COALESCE(ca.n, 0) * 1000000 // tot_a
                      - COALESCE(cb.n, 0) * 1000000 // tot_b)
               AS BIGINT) AS drift_fp
           FROM ca FULL OUTER JOIN cb ON ca.word = cb.word
           CROSS JOIN ta CROSS JOIN tb) t
         ORDER BY drift_fp DESC, word LIMIT 20""") { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      TextAnalysis.vocabDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        col("text"), 20)
    },

    // per-language length profile: the grouped variant of the exact
    // quantile operator — same integer rank arithmetic per group
    q("q_lang_length_quantiles", "text",
      """WITH counts AS (SELECT lang AS g,
                                CAST(length(text) AS BIGINT) AS v,
                                count(*) AS c
                         FROM documents
                         WHERE text IS NOT NULL GROUP BY 1, 2),
          cum AS (SELECT g, v,
                         SUM(c) OVER (PARTITION BY g ORDER BY v) AS cum
                  FROM counts),
          tot AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n
                  FROM counts GROUP BY 1),
          ranks AS (SELECT g, p, (p * n + 999) // 1000 AS r
                    FROM tot CROSS JOIN
                         (VALUES (500), (900), (990)) t(p))
         SELECT cum.g AS lang, CAST(p AS BIGINT) AS permille,
                MIN(v) AS v_at
         FROM ranks JOIN cum
           ON cum.g IS NOT DISTINCT FROM ranks.g AND cum.cum >= ranks.r
         GROUP BY 1, 2""") { (spark, dir) =>
      graft.ops.Stats.exactQuantilesBy(Tables.df(spark, dir, "documents"),
        "lang", length(col("text")), Seq(500, 900, 990))
    },

    // per-source quality dashboard: integer sums per group, ratios as
    // single divisions of exact longs (no double accumulation)
    q("q_source_report", "text",
      """WITH per AS (SELECT source,
              CAST(length(text) AS BIGINT) AS chars,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
              CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                AS n_dis
            FROM documents)
         SELECT source, count(*) AS n_docs,
                CAST(SUM(chars) AS BIGINT) AS total_chars,
                CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
                CAST(SUM(n_tok - n_dis) AS BIGINT) AS dup_tokens,
                CAST(SUM(n_tok - n_dis) AS DOUBLE) / SUM(n_tok)
                  AS dup_token_frac,
                CAST(SUM(chars) AS DOUBLE) / count(*) AS mean_chars
         FROM per GROUP BY source""") { (spark, dir) =>
      TextAnalysis.sourceReport(Tables.df(spark, dir, "documents"),
        "source", "text")
    },

    // top-5 TF-IDF keywords per doc: fixed-point integer IDF
    // (N·10⁶ div df) — monotone in N/df, so ranking agrees with the
    // log form while staying engine-exact; ties broken by term text
    q("q_tfidf_keywords", "text",
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                      FROM documents),
          tok2 AS (SELECT doc_id, w FROM tok WHERE w != ''),
          tf AS (SELECT doc_id, w, count(*) AS tf
                 FROM tok2 GROUP BY 1, 2),
          dfreq AS (SELECT w, count(*) AS dfr FROM tf GROUP BY 1),
          nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
         SELECT doc_id, w AS term, tf, score_fp, rank
         FROM (SELECT doc_id, w, tf,
                      tf * ((n * 1000000) // dfr) AS score_fp,
                      row_number() OVER (PARTITION BY doc_id
                        ORDER BY tf * ((n * 1000000) // dfr) DESC, w)
                        AS rank
               FROM tf JOIN dfreq USING (w) CROSS JOIN nd) t
         WHERE rank <= 5""") { (spark, dir) =>
      TextAnalysis.tfidfKeywords(Tables.df(spark, dir, "documents"),
        "doc_id", "text", 5)
    },

    // corpus length profile: exact type-1 quantiles by count-based
    // rank selection — integer arithmetic end to end (see Stats)
    q("q_length_quantiles", "text",
      """WITH counts AS (SELECT CAST(length(text) AS BIGINT) AS v,
                                count(*) AS c
                         FROM documents
                         WHERE text IS NOT NULL GROUP BY 1),
          cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM counts),
          tot AS (SELECT SUM(c) AS n FROM counts),
          ranks AS (SELECT p, (p * n + 999) // 1000 AS r
                    FROM (VALUES (100), (250), (500), (750), (900),
                                 (990), (1000)) t(p)
                    CROSS JOIN tot)
         SELECT CAST(p AS BIGINT) AS permille, MIN(v) AS v_at
         FROM ranks JOIN cum ON cum.cum >= ranks.r
         GROUP BY 1""") { (spark, dir) =>
      graft.ops.Stats.exactQuantiles(Tables.df(spark, dir, "documents"),
        length(col("text")), Seq(100, 250, 500, 750, 900, 990, 1000))
    },

    // binned quantiles for a CONTINUOUS column (dup_token_frac — the
    // q_text_repetition formulation verbatim): exactQuantiles would
    // reject its per-doc cardinality, so the range is binned into 2^10
    // equal-width bins (one min/max pass, floor over IEEE doubles with
    // a pinned operation order) and the same integer rank machinery
    // runs over the ≤1024-row bin table. The bracket bounds are
    // double arithmetic in the identical spelling on both engines.
    q("q_quantiles_binned", "text",
      """WITH vals AS (
           SELECT CASE WHEN len(toks) < 1 THEN 0.0
                       ELSE 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
                         / len(toks) END AS x
           FROM (SELECT string_split(text, ' ') AS toks FROM documents)),
         clean AS (SELECT x FROM vals
                   WHERE x IS NOT NULL AND NOT isnan(x)),
         mm AS (SELECT min(x) AS mn, max(x) AS mx, count(*) AS n
                FROM clean),
         binned AS (
           SELECT CASE WHEN mx = mn THEN 0
                       ELSE least(CAST(floor((x - mn) / (mx - mn)
                              * 1024.0) AS BIGINT), 1023) END AS bin,
                  count(*) AS c
           FROM clean CROSS JOIN mm GROUP BY 1),
         cum AS (SELECT bin, SUM(c) OVER (ORDER BY bin) AS cum
                 FROM binned),
         ranks AS (SELECT p, (p * n + 999) // 1000 AS r, mn, mx
                   FROM (VALUES (100), (250), (500), (750), (900),
                                (990)) t(p)
                   CROSS JOIN mm),
         sel AS (SELECT p, mn, mx, MIN(bin) AS bin
                 FROM ranks JOIN cum ON cum.cum >= ranks.r
                 GROUP BY p, mn, mx)
         SELECT CAST(p AS BIGINT) AS permille, bin,
                mn + CAST(bin AS DOUBLE) * (mx - mn) / 1024.0 AS q_lo,
                mn + CAST(bin + 1 AS DOUBLE) * (mx - mn) / 1024.0 AS q_hi
         FROM sel""") { (spark, dir) =>
      graft.ops.Stats.binnedQuantiles(
        TextAnalysis.repetitionFeatures(
          Tables.df(spark, dir, "documents"), col("text")),
        col("dup_token_frac"), Seq(100, 250, 500, 750, 900, 990))
    },

    // mergeable per-source profile, exercised through the MERGE path:
    // Spark profiles three disjoint doc_id%3 shards independently and
    // folds them with mergeProfiles; DuckDB computes the union profile
    // DIRECTLY over the full corpus. The hash compare therefore proves
    // the merge identity merge(profile(s0..s2)) ≡ profile(corpus) —
    // counts, sums, extremes, the 16-slot KMV distinct-content sketch
    // (k smallest distinct unsigned Spark-Murmur3 text hashes,
    // replayed through MurmurSql.chain and CSV'd for the comparator),
    // AND the integer-floor kmvEstimate read off it (63·2³²-style
    // BIGINT floor — the estimator itself is in the hash)
    q("q_profile_merge", "text", profileDirectSql) {
      (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      val shards = (0 until 3).map(i =>
        graft.ops.Stats.sourceProfile(
          docs.filter(col("doc_id") % 3 === i),
          "source", "text", size(split(col("text"), " ")), k = 16))
      val merged = graft.ops.Stats.mergeProfiles(
        shards.reduce(_ unionByName _), "source", k = 16)
      merged.select(col("source"), col("n_docs"), col("n_tokens"),
        col("min_tokens"), col("max_tokens"),
        concat_ws(",", transform(col("kmv"), h => h.cast("string")))
          .as("kmv_csv"),
        graft.ops.Sketch.kmvEstimate(col("kmv"), 16).as("est_distinct"))
    },

    // quality-threshold sweep: stop_ratio (q_text_stats' formulation
    // verbatim) binned into 2^10 equal-width bins, with doc and token
    // volume cumulated from the TOP — the calibration table that maps
    // a score cutoff to the corpus volume it keeps, read once instead
    // of filter-counting per candidate threshold. Identical floor/
    // window arithmetic to q_quantiles_binned, so the whole sweep
    // differentials value-exactly.
    q("q_threshold_sweep", "text",
      s"""WITH f AS (SELECT
             CAST(len(list_filter(string_split(text, ' '),
               w -> w IN ($stopSet))) AS DOUBLE) /
               len(string_split(text, ' ')) AS x,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS t
           FROM documents),
         clean AS (SELECT x, t FROM f
                   WHERE x IS NOT NULL AND NOT isnan(x)
                     AND t IS NOT NULL),
         mm AS (SELECT min(x) AS mn, max(x) AS mx FROM clean),
         binned AS (
           SELECT CASE WHEN mx = mn THEN 0
                       ELSE least(CAST(floor((x - mn) / (mx - mn)
                              * 1024.0) AS BIGINT), 1023) END AS bin,
                  count(*) AS n_docs,
                  CAST(sum(t) AS BIGINT) AS n_tokens
           FROM clean CROSS JOIN mm GROUP BY 1)
         SELECT bin,
                mn + CAST(bin AS DOUBLE) * (mx - mn) / 1024.0 AS thr_lo,
                n_docs, n_tokens,
                CAST(SUM(n_docs) OVER (ORDER BY bin DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_docs,
                CAST(SUM(n_tokens) OVER (ORDER BY bin DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_tokens
         FROM binned CROSS JOIN mm""") { (spark, dir) =>
      graft.ops.Stats.thresholdSweep(
        TextAnalysis.qualityFeatures(
          Tables.df(spark, dir, "documents"), col("text")),
        col("stop_ratio"), col("n_words"))
    },

    // the sweep's intended USE, composed: pick the lowest score
    // cutoff whose kept volume fits a 15k-token budget (~55% of the sf corpus, so the cutoff BITES) (min bin with
    // cum_tokens <= B on the descending cumulative), then keep every
    // doc at or above it. The engine re-bins docs through
    // Stats.scoreBins — the sweep's own arithmetic, shared, so grid
    // and cutoff cannot desync (the curate-v3 lm_score lesson). An
    // infeasible budget (even the top bin overshoots) yields an empty
    // keep set on both engines (min over empty = NULL, bin >= NULL
    // keeps nothing)
    q("q_sweep_budget_cutoff", "text",
      s"""WITH f AS (SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '),
               w -> w IN ($stopSet))) AS DOUBLE) /
               len(string_split(text, ' ')) AS x,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS t
           FROM documents),
         clean AS (SELECT doc_id, x, t FROM f
                   WHERE x IS NOT NULL AND NOT isnan(x)
                     AND t IS NOT NULL),
         mm AS (SELECT min(x) AS mn, max(x) AS mx FROM clean),
         b AS (SELECT doc_id, t,
                 CASE WHEN mx = mn THEN 0
                      ELSE least(CAST(floor((x - mn) / (mx - mn)
                             * 1024.0) AS BIGINT), 1023) END AS bin
               FROM clean CROSS JOIN mm),
         agg AS (SELECT bin, sum(t) AS n_tokens FROM b GROUP BY bin),
         cum AS (SELECT bin,
                   CAST(SUM(n_tokens) OVER (ORDER BY bin DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_tokens
                 FROM agg),
         cut AS (SELECT min(bin) AS cut_bin FROM cum
                 WHERE cum_tokens <= 15000)
         SELECT doc_id, bin, t AS tokens
         FROM b CROSS JOIN cut WHERE bin >= cut_bin""") { (spark, dir) =>
      // checkpoint the shared feature frame (the curate-v5 multi-
      // consumer discipline): scoreBins AND thresholdSweep both
      // consume it — un-materialized, the full qualityFeatures
      // subtree (tokenize + ratio arithmetic over every doc) executes
      // twice, once per consumer (the r12 verdict's nit)
      val feat = TextAnalysis.qualityFeatures(
          Tables.df(spark, dir, "documents"), col("text"))
        .localCheckpoint()
      val bins = graft.ops.Stats.scoreBins(feat, col("stop_ratio"),
        col("n_words"), 10)
      val cut = graft.ops.Stats.thresholdSweep(feat, col("stop_ratio"),
          col("n_words"), 10)
        .filter(col("cum_tokens") <= 15000L)
        .agg(min(col("bin")).as("cut_bin"))
      bins.crossJoin(broadcast(cut)).filter(col("bin") >= col("cut_bin"))
        .select(col("doc_id"), col("bin"), col("t").as("tokens"))
    },

    // equal-mass decile assignment by the repetition score — the
    // curriculum primitive: edges are the binned decile bins
    // (q_quantiles_binned's machinery at permilles 100..1000), each
    // doc's bucket is the first edge at or above its own bin. The
    // oracle recomputes edges independently and assigns via a
    // correlated edge count — different spelling, same totals
    q("q_quantile_buckets", "text",
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
                   FROM (VALUES (100), (200), (300), (400), (500),
                                (600), (700), (800), (900), (1000)) t(p)
                   CROSS JOIN mm),
         edges AS (SELECT p, MIN(bin) AS ebin
                   FROM ranks JOIN cum ON cum.cum >= ranks.r
                   GROUP BY p)
         SELECT doc_id, bin,
                CAST(1 + (SELECT count(*) FROM edges e
                          WHERE e.ebin < b.bin) AS BIGINT) AS bucket
         FROM b""") { (spark, dir) =>
      graft.ops.Stats.quantileBuckets(
        TextAnalysis.repetitionFeatures(
          Tables.df(spark, dir, "documents"), col("text")),
        "doc_id", col("dup_token_frac"), nBuckets = 10)
    },

    // CCNet-style per-language head/middle/tail: each lang's docs
    // bucketed into tertiles of ITS OWN score distribution — the
    // public multilingual-curation split (Wenzek et al. 2020)
    q("q_ccnet_buckets", "text",
      """WITH vals AS (
           SELECT doc_id, lang AS g,
             CASE WHEN len(toks) < 1 THEN 0.0
                  ELSE 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
                    / len(toks) END AS x
           FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks
                 FROM documents)),
         clean AS (SELECT doc_id, g, x FROM vals
                   WHERE x IS NOT NULL AND NOT isnan(x)),
         mm AS (SELECT g, min(x) AS mn, max(x) AS mx, count(*) AS n
                FROM clean GROUP BY g),
         b AS (SELECT doc_id, c.g, CASE WHEN mx = mn THEN 0
                 ELSE least(CAST(floor((x - mn) / (mx - mn) * 1024.0)
                   AS BIGINT), 1023) END AS bin
               FROM clean c JOIN mm USING (g)),
         binned AS (SELECT g, bin, count(*) AS c FROM b GROUP BY g, bin),
         cum AS (SELECT g, bin,
                   SUM(c) OVER (PARTITION BY g ORDER BY bin) AS cum
                 FROM binned),
         ranks AS (SELECT g, p, (p * n + 999) // 1000 AS r
                   FROM mm CROSS JOIN (VALUES (333), (666), (1000)) t(p)),
         edges AS (SELECT ranks.g AS g, p, MIN(bin) AS ebin
                   FROM ranks JOIN cum ON ranks.g = cum.g
                     AND cum.cum >= ranks.r
                   GROUP BY ranks.g, p)
         SELECT b.doc_id, b.g AS lang, b.bin,
                CAST(1 + (SELECT count(*) FROM edges e
                          WHERE e.g = b.g AND e.ebin < b.bin) AS BIGINT)
                  AS bucket
         FROM b""") { (spark, dir) =>
      graft.ops.Stats.quantileBucketsBy(
        TextAnalysis.repetitionFeatures(
          Tables.df(spark, dir, "documents"), col("text"))
          .select(col("doc_id"), col("lang"), col("dup_token_frac")),
        "lang", "doc_id", col("dup_token_frac"), nBuckets = 3)
    },

    // per-language binned profile of the same continuous column — each
    // lang gets its OWN 2^10 grid from its own min/max (narrow-range
    // groups keep full resolution); null-safe group handling is
    // inherited from the exact grouped variant
    q("q_lang_quantiles_binned", "text",
      """WITH vals AS (
           SELECT lang AS g,
             CASE WHEN len(toks) < 1 THEN 0.0
                  ELSE 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
                    / len(toks) END AS x
           FROM (SELECT lang, string_split(text, ' ') AS toks
                 FROM documents)),
         clean AS (SELECT g, x FROM vals
                   WHERE x IS NOT NULL AND NOT isnan(x)),
         mm AS (SELECT g, min(x) AS mn, max(x) AS mx, count(*) AS n
                FROM clean GROUP BY g),
         binned AS (
           SELECT c.g,
                  CASE WHEN mx = mn THEN 0
                       ELSE least(CAST(floor((x - mn) / (mx - mn)
                              * 1024.0) AS BIGINT), 1023) END AS bin,
                  count(*) AS c
           FROM clean c JOIN mm ON c.g IS NOT DISTINCT FROM mm.g
           GROUP BY 1, 2),
         cum AS (SELECT g, bin,
                        SUM(c) OVER (PARTITION BY g ORDER BY bin) AS cum
                 FROM binned),
         ranks AS (SELECT g, p, (p * n + 999) // 1000 AS r, mn, mx
                   FROM mm CROSS JOIN (VALUES (500), (900)) t(p)),
         sel AS (SELECT cum.g, p, mn, mx, MIN(bin) AS bin
                 FROM ranks JOIN cum
                   ON cum.g IS NOT DISTINCT FROM ranks.g
                  AND cum.cum >= ranks.r
                 GROUP BY 1, 2, 3, 4)
         SELECT g AS lang, CAST(p AS BIGINT) AS permille, bin,
                mn + CAST(bin AS DOUBLE) * (mx - mn) / 1024.0 AS q_lo,
                mn + CAST(bin + 1 AS DOUBLE) * (mx - mn) / 1024.0 AS q_hi
         FROM sel""") { (spark, dir) =>
      val feats = TextAnalysis.repetitionFeatures(
        Tables.df(spark, dir, "documents"), col("text"))
      graft.ops.Stats.binnedQuantilesBy(feats, "lang",
        col("dup_token_frac"), Seq(500, 900))
    })

  /** DuckDB replay of the DSIR pipeline: both bigram LMs in the
    * q_text_lm_score fixed-point form (target counts left-joined with
    * absent=0), the per-doc integer diff sum, and the sampler —
    * Spark's Murmur3 over the doc_id LONG (two 32-bit words, little-
    * endian: [id mod 2³², id div 2³²], total length 8, no tail bytes —
    * ids are non-negative here so the word split needs no sign
    * handling), signed + pmod'd to u ∈ [0, 10⁶), then the exact
    * cross-multiplied keep test. */
  private def dsirResampleSql: String =
    s"""WITH tr AS (SELECT doc_id, string_split(text, ' ') AS tk
                   FROM documents WHERE doc_id % 7 != 0),
       tg AS (SELECT doc_id, string_split(text, ' ') AS tk
              FROM documents WHERE doc_id % 7 = 0),
       trbg AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM (
                  SELECT doc_id,
                         unnest([array_to_string(tk[i:i+1], ' ')
                           for i in generate_series(1, len(tk)-1)]) AS bg
                  FROM tr) t),
       tgbg AS (SELECT bg, string_split(bg, ' ')[1] AS w1 FROM (
                  SELECT unnest([array_to_string(tk[i:i+1], ' ')
                    for i in generate_series(1, len(tk)-1)]) AS bg
                  FROM tg) t),
       bc AS (SELECT bg, count(*) AS c_bg FROM trbg GROUP BY bg),
       uc AS (SELECT w1, count(*) AS c_w1 FROM (
                SELECT unnest(tk) AS w1 FROM tr) u GROUP BY w1),
       v AS (SELECT count(*) AS v FROM uc),
       bt AS (SELECT bg, count(*) AS c_bg_t FROM tgbg GROUP BY bg),
       ut AS (SELECT w1, count(*) AS c_w1_t FROM (
                SELECT unnest(tk) AS w1 FROM tg) u GROUP BY w1),
       vt AS (SELECT count(*) AS v_t FROM ut),
       terms AS (
         SELECT t.doc_id, count(*) AS n,
                CAST(sum(
                  (COALESCE(bt.c_bg_t, 0) * 1000000)
                    // (COALESCE(ut.c_w1_t, 0) + vt.v_t)
                  - (bc.c_bg * 1000000) // (uc.c_w1 + v.v)) AS BIGINT)
                  AS diff
         FROM trbg t JOIN bc USING (bg) JOIN uc USING (w1) CROSS JOIN v
         LEFT JOIN bt USING (bg) LEFT JOIN ut USING (w1) CROSS JOIN vt
         GROUP BY t.doc_id),
       ids AS (SELECT DISTINCT doc_id FROM tr),
       ${MurmurSql.chainLong("doc_id")},
       samp AS (SELECT doc_id,
                  ((CASE WHEN u >= 2147483648 THEN u - 4294967296
                         ELSE u END) % 1000000 + 1000000) % 1000000 AS uu
                FROM mm)
       SELECT d.doc_id,
              COALESCE(terms.n, 0) AS n_bigrams,
              COALESCE(terms.diff, 0) AS diff_fp_sum,
              CASE WHEN COALESCE(terms.n, 0) = 0 THEN 0.0
                   ELSE CAST(terms.diff AS DOUBLE)
                        / (terms.n * 1000000) END AS dsir_score,
              COALESCE(terms.n, 0) > 0 AND
                samp.uu * 12000 * terms.n <
                  greatest(0, least(terms.diff - (-10000) * terms.n,
                                    12000 * terms.n)) * 1000000
                AS kept
       FROM (SELECT doc_id FROM documents WHERE doc_id % 7 != 0) d
       LEFT JOIN terms USING (doc_id)
       JOIN samp USING (doc_id)""" + "\n"

  /** DIRECT full-corpus per-source profile — the oracle for BOTH
    * merge spellings (q_profile_merge's shard fold and
    * q_stream_profile's micro-batch fold): the merge identity says
    * every partitioning of the corpus must land on exactly this
    * frame, sums, extremes, 16-slot KMV sketch, and the integer-floor
    * estimate included. The sketch replays the engine's unsigned
    * Spark-Murmur3 over each DISTINCT document text (the
    * [[MurmurSql.chain]] pipeline the Bloom/CMS oracles already
    * prove), ranks the per-source bottom-16, and reads the estimator
    * as `15·2³² // (u₁₆+1)` in plain BIGINT — exactly
    * [[graft.ops.Sketch.kmvEstimate]]'s corrected floor. */
  private[queries] def profileDirectSql: String =
    s"""WITH t AS (SELECT source, text,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS tk
                  FROM documents),
       st AS (SELECT source, count(*) AS n_docs,
                CAST(sum(tk) AS BIGINT) AS n_tokens,
                min(tk) AS min_tokens, max(tk) AS max_tokens
              FROM t GROUP BY source),
       strs AS (SELECT DISTINCT text AS s FROM documents
                WHERE text IS NOT NULL),
       ${MurmurSql.chain},
       d AS (SELECT DISTINCT t.source, mm.u FROM t
             JOIN mm ON t.text = mm.s),
       sk AS (SELECT source, u, row_number() OVER (
                PARTITION BY source ORDER BY u) AS rn FROM d),
       kmv AS (SELECT source,
                 string_agg(CAST(u AS VARCHAR), ',' ORDER BY u)
                   AS kmv_csv,
                 count(*) AS nh,
                 max(CASE WHEN rn = 16 THEN u END) AS uk
               FROM sk WHERE rn <= 16 GROUP BY source)
       SELECT st.source, st.n_docs, st.n_tokens, st.min_tokens,
              st.max_tokens, COALESCE(kmv.kmv_csv, '') AS kmv_csv,
              CAST(CASE WHEN COALESCE(kmv.nh, 0) < 16
                        THEN COALESCE(kmv.nh, 0)
                        ELSE 15 * 4294967296 // (kmv.uk + 1)
                   END AS BIGINT) AS est_distinct
       FROM st LEFT JOIN kmv
         ON st.source IS NOT DISTINCT FROM kmv.source"""

  /** DuckDB replay of the full Bloom pipeline (mBits = 2¹⁹ = 524288,
    * k = 3, 4-grams, eval = doc_id%7==0 slice): Spark's
    * Murmur3_x86_32(utf8, seed 42) over every distinct gram string —
    * the q_hash_buckets pipeline, here ending at the UNSIGNED value u
    * (Spark probes `hash(g) & 0xFFFFFFFF`, no abs) — then
    * h2 = ((u ⊕ u≫16)·1103515245 mod 2³²) | 1 (`// 2 * 2 + 1` is
    * `| 1` for non-negatives) and positions (u + i·h2) mod 2¹⁹,
    * mirroring [[graft.ops.BloomProbe.positions]] constant for
    * constant. Every product stays under 2⁶³ (multiplier < 2³¹), so
    * plain BIGINT arithmetic replays the Scala exactly; a doc is
    * contaminated iff ANY of its grams finds all 3 positions in the
    * eval bitset — false positives included, by construction. */
  private def bloomDecontaminateSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents),
       g AS (SELECT doc_id, unnest(list_distinct(
               [array_to_string(toks[i:i+3], ' ')
                for i in generate_series(1, greatest(len(toks)-3, 0))]))
               AS g
             FROM t),
       strs AS (SELECT DISTINCT g AS s FROM g),
       ${MurmurSql.chain},
       pos AS (SELECT s, u,
                 ((xor(u, u // 65536) * 1103515245) % 4294967296)
                   // 2 * 2 + 1 AS h2
               FROM mm),
       evp AS (SELECT DISTINCT (p.u + t.i * p.h2) % 524288 AS pos
               FROM g JOIN pos p ON g.g = p.s
               CROSS JOIN (SELECT unnest([0, 1, 2]) AS i) t
               WHERE g.doc_id % 7 = 0),
       hitg AS (SELECT p.s FROM pos p
                WHERE p.u % 524288 IN (SELECT pos FROM evp)
                  AND (p.u + p.h2) % 524288 IN (SELECT pos FROM evp)
                  AND (p.u + 2 * p.h2) % 524288 IN (SELECT pos FROM evp)),
       hit AS (SELECT DISTINCT doc_id FROM g
               WHERE doc_id % 7 != 0 AND g IN (SELECT s FROM hitg))
       SELECT d.doc_id,
              d.doc_id IN (SELECT doc_id FROM hit) AS contaminated
       FROM documents d WHERE d.doc_id % 7 != 0"""
}
