package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.core.Tables
import graft.ops.Dedup

/** Deduplication operators over the documents table. The corpus has no
  * native duplicates, so the fixture injects them deterministically:
  * every doc_id%10==0 doc gets an exact copy (+100000), every
  * doc_id%10==5 doc a near-copy with 3 appended tokens (+200000). The
  * same derivation is a CTE in each DuckDB oracle.
  *
  * MinHash/SimHash signatures are Spark-hash-based (no cross-engine
  * value oracle); their oracles assert the recall invariant instead:
  * exact-duplicate pairs MUST all be found (identical text → identical
  * signature → same LSH bucket / hamming 0), so candidates filtered to
  * text-equality must equal the exact-dup pair set.
  */
object DedupQueries extends QueryGroup {

  val corpusSql: String =
    """corpus AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
         UNION ALL
         SELECT doc_id + 200000, text || ' graft tail token'
         FROM documents WHERE doc_id % 10 = 5)"""

  def corpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.df(spark, dir, "documents")
    docs.select(col("doc_id"), col("text"))
      .unionAll(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      .unionAll(docs.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" graft tail token")).as("text")))
  }

  /** The duplicate-bearing slice: originals with an injected copy plus
    * every injected copy — the cheap edge-generation corpus for the
    * clusters query. */
  val clustersCorpusSql: String =
    """corpus AS (
         SELECT doc_id, text FROM documents WHERE doc_id % 10 IN (0, 5)
         UNION ALL
         SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
         UNION ALL
         SELECT doc_id + 200000, text || ' graft tail token'
         FROM documents WHERE doc_id % 10 = 5)"""

  def clustersCorpus(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir)
      .filter(col("doc_id") % 100000 % 10 isin (0, 5))

  /** q_dedup_incremental_near's oracle, shared VERBATIM with its
    * streaming twin (q_stream_incremental_neardup) so the two cannot
    * drift — the streaming run is one staged file → one micro-batch →
    * exactly the batch operator: survivors = batch docs (ids ≥
    * 100000) with no shingle-set-identical partner among ingested
    * docs or earlier batch docs (minJaccard = 1.0 ⟺ set equality). */
  private[queries] def incrementalNearSql: String =
    s"""WITH $clustersCorpusSql,
        sh AS (SELECT doc_id,
                 CASE WHEN len(toks) < 3 THEN [text]
                      ELSE list_sort(list_distinct(
                        [array_to_string(toks[i:i+2], ' ')
                         for i in generate_series(1,
                           greatest(len(toks) - 2, 0))])) END AS shl
               FROM (SELECT doc_id, text,
                       string_split(text, ' ') AS toks
                     FROM corpus WHERE text IS NOT NULL) t),
        base AS (SELECT doc_id, shl FROM sh WHERE doc_id < 100000),
        batch AS (SELECT doc_id, shl FROM sh WHERE doc_id >= 100000)
        SELECT b.doc_id FROM batch b
        WHERE NOT EXISTS (SELECT 1 FROM base s WHERE s.shl = b.shl)
          AND NOT EXISTS (SELECT 1 FROM batch b2
                          WHERE b2.doc_id < b.doc_id
                            AND b2.shl = b.shl)"""

  /** Span-dedup oracle CTE chain (after a `corpus` CTE), ending in
    * `sd(doc_id, dtext, n_removed)` — shared verbatim by the
    * standalone q_dedup_spans oracle and the curate-v4 composition
    * (PackQueries) so the two formulations cannot drift. DuckDB list
    * slices are 1-based inclusive both ends (tk[i:i+7] = 8 tokens,
    * pos = i − 1); generate_series is inclusive like Spark's
    * sequence. */
  private[queries] def spanDedupCtes(w: Int): String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                 FROM corpus WHERE text IS NOT NULL),
        wins AS (SELECT doc_id, ww.pos AS pos, ww.g AS g FROM (
                   SELECT doc_id,
                          unnest([{'pos': i - 1,
                                   'g': array_to_string(tk[i:i+${w - 1}], ' ')}
                            for i in generate_series(1, greatest(len(tk) - ${w - 1}, 0))]) AS ww
                   FROM toks) t),
        dup AS (SELECT doc_id, pos FROM (
                  SELECT doc_id, pos, row_number() OVER (
                           PARTITION BY g ORDER BY doc_id, pos) AS rn
                  FROM wins) WHERE rn > 1),
        removed AS (SELECT DISTINCT doc_id, tpos FROM (
                      SELECT doc_id,
                             unnest(generate_series(pos, pos + ${w - 1})) AS tpos
                      FROM dup) t),
        remcnt AS (SELECT doc_id, count(*) AS n_removed
                   FROM removed GROUP BY doc_id),
        alltok AS (SELECT doc_id, tt.tpos AS tpos, tt.tok AS tok FROM (
                     SELECT doc_id,
                            unnest([{'tpos': i - 1, 'tok': tk[i]}
                              for i in generate_series(1, len(tk))]) AS tt
                     FROM toks
                     WHERE doc_id IN (SELECT doc_id FROM removed)) t),
        kept AS (SELECT a.doc_id, a.tpos, a.tok FROM alltok a
                 WHERE NOT EXISTS (SELECT 1 FROM removed r
                   WHERE r.doc_id = a.doc_id AND r.tpos = a.tpos)),
        reasm AS (SELECT doc_id,
                         array_to_string(list(tok ORDER BY tpos), ' ') AS dt
                  FROM kept GROUP BY doc_id),
        sd AS (SELECT c.doc_id,
                      CASE WHEN rc.doc_id IS NULL THEN c.text
                           ELSE coalesce(m.dt, '') END AS dtext,
                      coalesce(rc.n_removed, 0) AS n_removed
               FROM corpus c
               LEFT JOIN remcnt rc ON c.doc_id = rc.doc_id
               LEFT JOIN reasm m ON c.doc_id = m.doc_id)"""

  private val spanDedupSql: String =
    s"""WITH $clustersCorpusSql,
        ${spanDedupCtes(8)}
        SELECT doc_id, dtext AS deduped_text, n_removed FROM sd"""

  private val exactDupPairsSql =
    s"""WITH $corpusSql
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM corpus a JOIN corpus b
          ON a.text = b.text AND a.doc_id < b.doc_id"""

  val queries: Seq[Q] = Seq(
    q("q_dedup_exact", "dedup",
      s"""WITH $corpusSql
          SELECT md5(text) AS text_md5, min(doc_id) AS keep_id,
                 count(*) AS n_copies, max(doc_id) AS max_id
          FROM corpus GROUP BY 1""") { (spark, dir) =>
      Dedup.exact(corpus(spark, dir), col("doc_id"), col("text"))
    },

    // sub-document unit dedup: drop every occurrence of a '. '-unit
    // except the globally first (smallest (doc_id, pos)), reassemble
    // survivors in document order. The injected exact copies
    // (+100000 ids) lose ALL their units to the originals and vanish;
    // the '+200000 tail token' variants keep only their novel tail.
    // The oracle derives first-occurrence via row_number, NOT the
    // engine's min(struct) aggregation — independent formulations, so
    // a winner-selection bug can't cancel out across engines.
    q("q_dedup_units", "dedup",
      s"""WITH $corpusSql,
          raw AS (SELECT doc_id, string_split(text, '. ') AS us
                  FROM corpus),
          u AS (SELECT doc_id, uu.pos AS pos, uu.unit AS unit
                FROM (SELECT doc_id, unnest([{'pos': i - 1, 'unit': us[i]}
                        for i in generate_series(1, len(us))]) AS uu
                      FROM raw) t),
          kept AS (SELECT doc_id, pos, unit FROM (
                     SELECT doc_id, pos, unit,
                            row_number() OVER (PARTITION BY unit
                              ORDER BY doc_id, pos) AS rn
                     FROM u) WHERE rn = 1)
          SELECT doc_id,
                 array_to_string(list(unit ORDER BY pos), '. ')
                   AS deduped_text
          FROM kept GROUP BY doc_id""") { (spark, dir) =>
      Dedup.unitDedup(corpus(spark, dir), "doc_id", "text")
    },

    q("q_dedup_ngram_jaccard", "dedup",
      s"""WITH $corpusSql,
          sh AS (
            SELECT doc_id,
              list_distinct([array_to_string(toks[i:i+2], ' ')
                for i in generate_series(1, greatest(len(toks)-2, 0))]) AS shl
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)),
          inv AS (SELECT doc_id, len(shl) AS n_sh, unnest(shl) AS s FROM sh)
          SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 CAST(a.n_sh AS BIGINT) AS na, CAST(b.n_sh AS BIGINT) AS nb,
                 count(*) AS common,
                 CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*))
                   AS jaccard
          FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
          HAVING jaccard >= 0.8""") { (spark, dir) =>
      Dedup.ngramJaccardPairs(corpus(spark, dir), "doc_id", "text", 3, 0.8)
        .select(col("a_id"), col("b_id"), col("na").cast(LongType).as("na"),
          col("nb").cast(LongType).as("nb"), col("common"), col("jaccard"))
    },

    // per-doc n-gram novelty: fraction of a doc's 8-token windows
    // first seen in that doc (spanDedup's winner rule, scoring
    // instead of removing). Injected +100000 exact copies score 0.0
    // (every window first occurs in the original); tail variants
    // score low-nonzero (only the tail's windows are novel)
    q("q_span_novelty", "dedup",
      s"""WITH $clustersCorpusSql,
          toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                   FROM corpus WHERE text IS NOT NULL),
          wins AS (SELECT doc_id, ww.pos AS pos, ww.g AS g FROM (
                     SELECT doc_id,
                            unnest([{'pos': i - 1,
                                     'g': array_to_string(tk[i:i+7], ' ')}
                              for i in generate_series(1,
                                greatest(len(tk) - 7, 0))]) AS ww
                     FROM toks) t),
          f AS (SELECT doc_id, count(*) AS n_first FROM (
                  SELECT doc_id, row_number() OVER (
                           PARTITION BY g ORDER BY doc_id, pos) AS rn
                  FROM wins) w WHERE rn = 1 GROUP BY doc_id),
          -- tot reads CORPUS, not the text-filtered toks CTE: the
          -- engine emits a (NULL n_windows, NULL novelty) row for
          -- null-text docs ("no evidence", the overlapScore
          -- contract), so the oracle must carry those docs too or a
          -- regenerated fixture with one null-text row breaks the
          -- differential on row count alone
          tot AS (SELECT doc_id,
                    CASE WHEN text IS NOT NULL
                          AND len(string_split(text, ' ')) >= 8
                         THEN CAST(len(string_split(text, ' ')) - 7
                                   AS BIGINT) END AS n_windows
                  FROM corpus)
          SELECT t.doc_id, t.n_windows,
                 CASE WHEN t.n_windows IS NOT NULL
                      THEN COALESCE(f.n_first, 0) END AS n_first,
                 CASE WHEN t.n_windows IS NOT NULL
                      THEN CAST(COALESCE(f.n_first, 0) AS DOUBLE)
                           / t.n_windows END AS novelty
          FROM tot t LEFT JOIN f USING (doc_id)""") { (spark, dir) =>
      Dedup.spanNovelty(clustersCorpus(spark, dir), "doc_id", "text", 8)
    },

    // cross-source duplication matrix: near-dup pair volume per
    // unordered source pair, over the duplicate-injected corpus WITH
    // its source column carried through (copies keep their original
    // row's source). The diagnostic that says where duplication comes
    // from; same verified-Jaccard pair set as q_dedup_ngram_jaccard,
    // so the matrix is exactly oracle-able
    q("q_dedup_source_matrix", "dedup",
      """WITH corpus AS (
           SELECT doc_id, text, source FROM documents
           UNION ALL
           SELECT doc_id + 100000, text, source FROM documents
           WHERE doc_id % 10 = 0
           UNION ALL
           SELECT doc_id + 200000, text || ' graft tail token', source
           FROM documents WHERE doc_id % 10 = 5),
         sh AS (
           SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
               for i in generate_series(1, greatest(len(toks)-2, 0))]) AS shl
           FROM (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM corpus)),
         inv AS (SELECT doc_id, len(shl) AS n_sh, unnest(shl) AS s FROM sh),
         p AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id
           FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
           HAVING CAST(count(*) AS DOUBLE)
                  / (a.n_sh + b.n_sh - count(*)) >= 0.8)
         -- null-first CASE, not least/greatest: both engines' least/
         -- greatest SKIP nulls, which would fold a (null, srcX) pair
         -- into (srcX, srcX) — the engine routes nulls first
         -- explicitly, and the oracle spells the same rule
         SELECT CASE WHEN ca.source IS NULL OR (cb.source IS NOT NULL
                       AND ca.source <= cb.source)
                     THEN ca.source ELSE cb.source END AS src_a,
                CASE WHEN ca.source IS NULL OR (cb.source IS NOT NULL
                       AND ca.source <= cb.source)
                     THEN cb.source ELSE ca.source END AS src_b,
                count(*) AS n_pairs
         FROM p JOIN corpus ca ON p.a_id = ca.doc_id
                JOIN corpus cb ON p.b_id = cb.doc_id
         GROUP BY 1, 2""") { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      val c = docs.select(col("doc_id"), col("text"), col("source"))
        .unionAll(docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text"),
            col("source")))
        .unionAll(docs.filter(col("doc_id") % 10 === 5)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(col("text"), lit(" graft tail token")).as("text"),
            col("source")))
      Dedup.crossSourceDupMatrix(c, "doc_id", "text", "source", 3, 0.8)
    },

    // formatting-insensitive dedup: canonicalize (lowercase, strip
    // punctuation class, collapse whitespace, trim) then exact-group.
    // The fixture injects an UPPERCASED copy per %10==3 doc and a
    // trailing-double-space copy per %10==7 doc — byte-exact dedup
    // misses both; the canonical groups absorb them (n_copies=2).
    // NFC runs first on both sides (decomposed-accent fixture pair
    // collapses only through it); DuckDB regexp_replace needs the 'g'
    // flag to match Spark's
    // replace-all; the whitespace class is explicit (Java \s ⊃ RE2 \s)
    q("q_dedup_canonical", "dedup",
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 300000, upper(text) FROM documents
           WHERE doc_id % 10 = 3
           UNION ALL
           SELECT doc_id + 400000, text || '  ' FROM documents
           WHERE doc_id % 10 = 7
           UNION ALL
           SELECT doc_id + 500000, text || ' cafe' || chr(769)
           FROM documents WHERE doc_id % 10 = 5
           UNION ALL
           SELECT doc_id + 600000, text || ' caf' || chr(233)
           FROM documents WHERE doc_id % 10 = 5)
         SELECT md5(trim(regexp_replace(regexp_replace(
                  lower(nfc_normalize(text)),
                  '[.,!?;:''"()\[\]{}<>_/\\|`~*#-]', '', 'g'),
                  '[ \t\n\r]+', ' ', 'g'))) AS canon_md5,
                min(doc_id) AS keep_id, count(*) AS n_copies,
                max(doc_id) AS max_id
         FROM corpus GROUP BY 1""") { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      val c = docs.select(col("doc_id"), col("text"))
        .unionAll(docs.filter(col("doc_id") % 10 === 3)
          .select((col("doc_id") + 300000).as("doc_id"),
            upper(col("text")).as("text")))
        .unionAll(docs.filter(col("doc_id") % 10 === 7)
          .select((col("doc_id") + 400000).as("doc_id"),
            concat(col("text"), lit("  ")).as("text")))
        // decomposed vs precomposed accent pair: collapses into ONE
        // canonical group only because canonicalText runs NFC first
        .unionAll(docs.filter(col("doc_id") % 10 === 5)
          .select((col("doc_id") + 500000).as("doc_id"),
            concat(col("text"), lit(" cafe\u0301")).as("text")))
        .unionAll(docs.filter(col("doc_id") % 10 === 5)
          .select((col("doc_id") + 600000).as("doc_id"),
            concat(col("text"), lit(" caf\u00e9")).as("text")))
      Dedup.canonicalExact(c, col("doc_id"), col("text"))
    },

    // snapshot diff between two synthetic curation runs: the old run
    // lacks the %13==1 docs (added), the new run lacks %13==2
    // (removed), and %5==0 docs gained a revision suffix (changed);
    // unchanged docs are absent from the report by contract. Both
    // engines fingerprint with md5 over utf8 bytes, so the whole
    // report differentials value-exactly including the fp columns
    q("q_corpus_diff", "dedup",
      """WITH o AS (SELECT doc_id, md5(text) AS old_fp, 1 AS po
                    FROM documents WHERE doc_id % 13 <> 1),
          n AS (SELECT doc_id,
                  md5(CASE WHEN doc_id % 5 = 0 THEN text || ' rev2'
                           ELSE text END) AS new_fp, 1 AS pn
                FROM documents WHERE doc_id % 13 <> 2),
          j AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                       old_fp, new_fp, po, pn
                FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
          SELECT doc_id,
                 CASE WHEN po IS NULL THEN 'added'
                      WHEN pn IS NULL THEN 'removed'
                      WHEN old_fp IS DISTINCT FROM new_fp THEN 'changed'
                 END AS status, old_fp, new_fp
          FROM j
          WHERE po IS NULL OR pn IS NULL
             OR old_fp IS DISTINCT FROM new_fp""") { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      val oldSnap = docs.filter(col("doc_id") % 13 =!= 1)
        .select(col("doc_id"), col("text"))
      val newSnap = docs.filter(col("doc_id") % 13 =!= 2)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")).as("text"))
      Dedup.corpusDiff(oldSnap, newSnap, "doc_id", "text")
    },

    // the maintenance family COMPOSING: corpusDiff picks the docs that
    // moved (added/changed) between the two snapshot fixtures, and
    // ONLY those route through incrementalExact against the old
    // snapshot's fingerprint index — the daily-reprocess shape where
    // diff bounds the work and the index bounds the dedup. Survivors
    // are moved docs whose content the old corpus had never seen
    // (a changed doc whose new text equals some OTHER old doc's text
    // is caught by the index, not re-ingested)
    q("q_diff_incremental_ingest", "dedup",
      """WITH o AS (SELECT doc_id, text FROM documents
                    WHERE doc_id % 13 <> 1),
          n AS (SELECT doc_id,
                  CASE WHEN doc_id % 5 = 0 THEN text || ' rev2'
                       ELSE text END AS text
                FROM documents WHERE doc_id % 13 <> 2),
          moved AS (
            SELECT n.doc_id, n.text FROM n
            LEFT JOIN o ON n.doc_id = o.doc_id
            WHERE o.doc_id IS NULL
               OR md5(o.text) IS DISTINCT FROM md5(n.text)),
          seen AS (SELECT DISTINCT md5(text) AS fp FROM o
                   WHERE text IS NOT NULL),
          firsts AS (SELECT md5(text) AS fp, min(doc_id) AS keep_id
                     FROM moved WHERE text IS NOT NULL GROUP BY 1)
          SELECT keep_id AS doc_id, fp AS text_md5 FROM firsts
          WHERE fp NOT IN (SELECT fp FROM seen)""") { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
      val oldSnap = docs.filter(col("doc_id") % 13 =!= 1)
        .select(col("doc_id"), col("text"))
      val newSnap = docs.filter(col("doc_id") % 13 =!= 2)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")).as("text"))
      val moved = Dedup.corpusDiff(oldSnap, newSnap, "doc_id", "text")
        .filter(col("status").isin("added", "changed"))
        .select("doc_id")
      val batch = newSnap.join(moved, Seq("doc_id"), "left_semi")
      val index = Dedup.exact(oldSnap, col("doc_id"), col("text"))
        .select(col("text_md5"))
      Dedup.incrementalExact(batch, index, "doc_id", "text")
    },

    q("q_dedup_minhash_lsh", "dedup", exactDupPairsSql) { (spark, dir) =>
      val c = corpus(spark, dir)
      val cands = Dedup.minhashCandidates(c, "doc_id", "text")
      val ta = c.select(col("doc_id").as("a_id"), col("text").as("ta"))
      val tb = c.select(col("doc_id").as("b_id"), col("text").as("tb"))
      cands.join(ta, "a_id").join(tb, "b_id")
        .filter(col("ta") === col("tb"))
        .select(col("a_id"), col("b_id"))
    },

    q("q_dedup_simhash", "dedup", exactDupPairsSql) { (spark, dir) =>
      val c = corpus(spark, dir)
      val pairs = Dedup.simhashPairs(c, "doc_id", "text", maxHam = 3)
      val ta = c.select(col("doc_id").as("a_id"), col("text").as("ta"))
      val tb = c.select(col("doc_id").as("b_id"), col("text").as("tb"))
      pairs.join(ta, "a_id").join(tb, "b_id")
        .filter(col("ta") === col("tb"))
        .select(col("a_id"), col("b_id"))
    },

    // duplicate clusters: connected components over the Jaccard pair
    // graph; DuckDB's recursive CTE computes the same min-reachable-id
    // closure, so the distributed label propagation is exactly oracled.
    // incremental exact dedup, the daily-batch shape: the injected
    // copies (doc_id ≥ 100000) arrive as the "new batch" against the
    // base slice's fingerprint index — exact +100000 copies are
    // eliminated by the anti join without reading corpus text, the
    // +200000 tail variants survive as genuinely novel
    q("q_dedup_incremental", "dedup",
      s"""WITH $clustersCorpusSql,
          seen AS (SELECT DISTINCT md5(text) AS fp FROM corpus
                   WHERE doc_id < 100000),
          batch AS (SELECT doc_id, md5(text) AS fp FROM corpus
                    WHERE doc_id >= 100000),
          firsts AS (SELECT fp, min(doc_id) AS keep_id
                     FROM batch GROUP BY fp)
          SELECT keep_id AS doc_id, fp AS text_md5
          FROM firsts WHERE fp NOT IN (SELECT fp FROM seen)""") {
      (spark, dir) =>
      val c = clustersCorpus(spark, dir)
      val seen = Dedup.exact(c.filter(col("doc_id") < 100000),
        col("doc_id"), col("text")).select("text_md5")
      Dedup.incrementalExact(c.filter(col("doc_id") >= 100000),
        seen, "doc_id", "text")
    },

    // incremental NEAR-dup, the daily-batch ingest shape for near
    // duplicates: batch bands probe the ingested band-bucket index
    // (batch-only shuffle), candidates verify at exact shingle-set
    // Jaccard, text fetched for candidate ids only. At the default
    // minJaccard = 1.0 the operator is EXACTLY oracle-able (equal
    // shingle sets ⟺ Jaccard 1.0, and equal sets always collide in
    // every band — recall 1 by construction, false positives removed
    // by the verify): survivors are the batch docs with no
    // shingle-set-identical partner among ingested docs or earlier
    // batch docs. The +100000 exact copies die against the index; the
    // +200000 tail variants survive (Jaccard < 1) — the near-dup
    // threshold path below 1.0 is spec-pinned instead.
    q("q_dedup_incremental_near", "dedup", incrementalNearSql) {
      (spark, dir) =>
      val c = clustersCorpus(spark, dir)
      val seen = c.filter(col("doc_id") < 100000)
      val seenBands = Dedup.lshBands(
        Dedup.minhashSignature(seen, "doc_id", "text", 3, 16), 16, 4)
      Dedup.incrementalNearDup(c.filter(col("doc_id") >= 100000),
        seenBands, seen, "doc_id", "text")
    },

    // substring/span-level dedup at w=8: the injected exact copies are
    // wall-to-wall duplicated windows (→ empty string), the tail
    // variants keep only their novel tail, and any naturally shared
    // ≥8-token span between unrelated docs is cut mid-document — the
    // case unit dedup (exact sentences) and containment (doc-level)
    // both miss. The oracle derives first occurrence via row_number
    // over the gram TEXT (the engine groups rolling-hash fingerprints
    // and wins by min(struct)) — independent formulations end to end.
    q("q_dedup_spans", "dedup", spanDedupSql) { (spark, dir) =>
      Dedup.spanDedup(clustersCorpus(spark, dir), "doc_id", "text", 8)
    },

    // asymmetric containment C(A,B) = |A∩B|/|A| ≥ 0.9, both directions
    // evaluated independently: the tail-extended +200000 variants
    // contain their originals at exactly 1.0 while the reverse
    // direction is m/(m+3) — above 0.9 only for long docs, so the
    // output exercises both the asymmetric catch and the cut
    q("q_dedup_containment", "dedup",
      s"""WITH $clustersCorpusSql,
          sh AS (
            SELECT doc_id,
              list_distinct([array_to_string(toks[i:i+2], ' ')
                for i in generate_series(1, greatest(len(toks)-2, 0))]) AS shl
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)),
          inv AS (SELECT doc_id, len(shl) AS n_sh, unnest(shl) AS s FROM sh),
          pairs AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   a.n_sh AS na, count(*) AS common
            FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id != b.doc_id
            GROUP BY a.doc_id, b.doc_id, a.n_sh)
          SELECT a_id, b_id, CAST(na AS BIGINT) AS na,
                 CAST(common AS BIGINT) AS common,
                 CAST(common AS DOUBLE) / na AS containment
          FROM pairs
          WHERE CAST(common AS DOUBLE) / na >= 0.9""") { (spark, dir) =>
      Dedup.containmentPairs(clustersCorpus(spark, dir),
        "doc_id", "text", 3, 0.9)
    },

    // The corpus is restricted to the duplicate-bearing doc_id%10∈{0,5}
    // slice: the Jaccard join itself is already benched by
    // q_dedup_ngram_jaccard — this query's marginal cost should be the
    // CC rounds, not a re-run of the shingle join (chain-topology
    // convergence is pinned separately by ConnectedComponentsSpec)
    q("q_dedup_clusters", "dedup",
      s"""WITH RECURSIVE $clustersCorpusSql,
          sh AS (
            SELECT doc_id,
              list_distinct([array_to_string(toks[i:i+2], ' ')
                for i in generate_series(1, greatest(len(toks)-2, 0))]) AS shl
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)),
          inv AS (SELECT doc_id, len(shl) AS n_sh, unnest(shl) AS s FROM sh),
          pairs AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
            HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*))
                   >= 0.8),
          edges AS (SELECT a_id AS a, b_id AS b FROM pairs
                    UNION SELECT b_id, a_id FROM pairs),
          reach(id, r) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b)
          SELECT id AS doc_id, min(r) AS component
          FROM reach GROUP BY id""") { (spark, dir) =>
      val pairs = Dedup.ngramJaccardPairs(clustersCorpus(spark, dir),
        "doc_id", "text", 3, 0.8)
      Dedup.connectedComponents(pairs, "a_id", "b_id")
        .select(col("id").as("doc_id"), col("comp").as("component"))
    },

    // duplicate-cluster SIZE histogram over the same verified pair
    // graph: per size, how many clusters and docs (plus the size-1
    // unclustered remainder) — the diagnostic separating "two huge
    // mirror clusters" from "many small pairs" at equal dup rate. The
    // injected fixture makes the shape known: %10==0 docs pair with
    // one exact copy, %10==5 with one tail near-copy → dominated by
    // size-2 clusters
    q("q_dedup_cluster_histogram", "dedup",
      s"""WITH RECURSIVE $clustersCorpusSql,
          sh AS (
            SELECT doc_id,
              list_distinct([array_to_string(toks[i:i+2], ' ')
                for i in generate_series(1, greatest(len(toks)-2, 0))]) AS shl
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)),
          inv AS (SELECT doc_id, len(shl) AS n_sh, unnest(shl) AS s FROM sh),
          pairs AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
            HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*))
                   >= 0.8),
          edges AS (SELECT a_id AS a, b_id AS b FROM pairs
                    UNION SELECT b_id, a_id FROM pairs),
          reach(id, r) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b),
          comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
          sizes AS (SELECT component, count(*) AS cluster_size
                    FROM comp GROUP BY component),
          multi AS (SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
                      CAST(count(*) AS BIGINT) AS n_clusters,
                      CAST(cluster_size * count(*) AS BIGINT) AS n_docs
                    FROM sizes GROUP BY cluster_size),
          tot AS (SELECT count(DISTINCT doc_id) AS n_total FROM corpus),
          cl AS (SELECT count(*) AS n_clustered FROM comp)
          SELECT * FROM multi
          UNION ALL
          SELECT CAST(1 AS BIGINT),
                 CAST(n_total - n_clustered AS BIGINT),
                 CAST(n_total - n_clustered AS BIGINT)
          FROM tot CROSS JOIN cl WHERE n_total > n_clustered""") {
      (spark, dir) =>
      val c = clustersCorpus(spark, dir)
      val pairs = Dedup.ngramJaccardPairs(c, "doc_id", "text", 3, 0.8)
      Dedup.clusterSizeHistogram(c, "doc_id", pairs)
    },

    // quality-priority keep rule: same clusters as q_dedup_clusters,
    // but the survivor is the LONGEST copy (octet_length, ties → min
    // id) instead of the min id. On this fixture the rule is visibly
    // different from representatives(): the +200000 near-copies carry
    // 17 extra bytes (' graft tail token'), so THEY win their cluster
    // and the shorter originals are dropped, while exact-copy clusters
    // (+100000, equal lengths) still resolve to the min id by the tie.
    q("q_dedup_keep_best", "dedup",
      s"""WITH RECURSIVE $clustersCorpusSql,
          sh AS (
            SELECT doc_id,
              list_distinct([array_to_string(toks[i:i+2], ' ')
                for i in generate_series(1, greatest(len(toks)-2, 0))]) AS shl
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)),
          inv AS (SELECT doc_id, len(shl) AS n_sh, unnest(shl) AS s FROM sh),
          pairs AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
            HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*))
                   >= 0.8),
          edges AS (SELECT a_id AS a, b_id AS b FROM pairs
                    UNION SELECT b_id, a_id FROM pairs),
          reach(id, r) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b),
          comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
          keep AS (SELECT component, id AS keeper FROM (
                     SELECT comp.id, comp.component, row_number() OVER (
                       PARTITION BY component
                       ORDER BY strlen(c.text) DESC, comp.id) AS rn
                     FROM comp JOIN corpus c ON c.doc_id = comp.id) t
                   WHERE rn = 1),
          losers AS (SELECT comp.id FROM comp JOIN keep USING (component)
                     WHERE comp.id <> keep.keeper)
          SELECT doc_id FROM corpus
          WHERE doc_id NOT IN (SELECT id FROM losers)""") { (spark, dir) =>
      val c = clustersCorpus(spark, dir)
      val pairs = Dedup.ngramJaccardPairs(c, "doc_id", "text", 3, 0.8)
      Dedup.representativesBy(c, pairs, "doc_id", octet_length(col("text")))
        .select("doc_id")
    })
}
