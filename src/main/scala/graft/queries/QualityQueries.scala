package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Quality

/** Quality-filter queries (Gopher document rules, C4 line rules,
  * corpus-global boilerplate stripping) over a deterministic MULTILINE
  * fixture derived from the documents table.
  *
  * The raw corpus is single-line word salad, so — the `q_text_pii`
  * discipline — each query synthesizes line structure identically on
  * both sides from (doc_id, text) alone: words are grouped into
  * 8-word lines, and line i of doc d is decorated by m = d + i as
  *   m % 7 == 0 → '- ' bullet prefix,
  *   m % 5 == 0 → '...' ellipsis suffix,
  *   else m % 3 != 0 → '.' terminal period.
  * Everything is integer-derived, so the Spark fixture and the DuckDB
  * oracle cannot drift; the engine operators under test
  * ([[graft.ops.Quality]]) see an honest newline-delimited document.
  */
object QualityQueries extends QueryGroup {

  private val W = 8 // words per synthesized line

  /** Spark side of the line synthesis. */
  private[queries] def synthMl(docId: Column, text: Column): Column = {
    val ws = split(text, " ")
    val nLines = floor((size(ws) + lit(W - 1)) / lit(W)).cast("int")
    val linesC = transform(sequence(lit(0), nLines - lit(1)), i => {
      val m = docId + i
      val base = array_join(slice(ws, i * lit(W) + lit(1), lit(W)), " ")
      val pre = when(m % 7 === 0, lit("- ")).otherwise(lit(""))
      val suf = when(m % 5 === 0, lit("..."))
        .when(m % 3 =!= 0, lit(".")).otherwise(lit(""))
      concat(pre, base, suf)
    })
    array_join(linesC, "\n")
  }

  /** DuckDB side of the line synthesis; `ws` must be in scope as the
    * space-split word list and `doc_id` as the id. */
  private[queries] val synthSql: String =
    s"""array_to_string(
       |  [CASE WHEN (doc_id + i) % 7 = 0 THEN '- ' ELSE '' END ||
       |   array_to_string(ws[(i*$W+1):(i*$W+$W)], ' ') ||
       |   CASE WHEN (doc_id + i) % 5 = 0 THEN '...'
       |        WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END
       |   for i in generate_series(0, (len(ws) + ${W - 1}) // $W - 1)],
       |  chr(10))""".stripMargin

  private val mlCte: String =
    s"""ml AS (
       |  SELECT doc_id, source, $synthSql AS mtext
       |  FROM (SELECT doc_id, source, string_split(text, ' ') AS ws
       |        FROM documents
       |        WHERE text IS NOT NULL AND length(text) > 0))""".stripMargin

  private def mlFrame(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.df(spark, dir, "documents")
    docs.filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), col("source"),
        synthMl(col("doc_id"), col("text")).as("mtext"))
  }

  // fixture word counts at the verify SF span ~9..60, so 40 splits the
  // population; the corpus vocabulary holds only 'the' from Gopher's
  // stop list, so the distinct-stopword gate is exercised at 1
  private[queries] val GopherMinWords = 40
  private[queries] val GopherStopHits = 1

  /** Repetition fixture: undecorated 8-word lines where line 0 is
    * REPEATED at every position i>0 with (doc_id + i) % 4 == 0 — so
    * duplicate-line mass varies per doc and the rules have real work. */
  private def synthRep(docId: Column, text: Column): Column = {
    val ws = split(text, " ")
    val nLines = floor((size(ws) + lit(W - 1)) / lit(W)).cast("int")
    val line0 = array_join(slice(ws, 1, W), " ")
    val linesC = transform(sequence(lit(0), nLines - lit(1)), i =>
      when((docId + i) % 4 === 0 && i > 0, line0)
        .otherwise(
          array_join(slice(ws, i * lit(W) + lit(1), lit(W)), " ")))
    array_join(linesC, "\n")
  }

  private val synthRepSql: String =
    s"""array_to_string(
       |  [CASE WHEN (doc_id + i) % 4 = 0 AND i > 0
       |        THEN array_to_string(ws[1:$W], ' ')
       |        ELSE array_to_string(ws[(i*$W+1):(i*$W+$W)], ' ') END
       |   for i in generate_series(0, (len(ws) + ${W - 1}) // $W - 1)],
       |  chr(10))""".stripMargin

  /** Gopher features + keep as CTEs over `ml` — shared by the gopher
    * query and the funnel so the rule spelling cannot drift. */
  private[queries] val gopherCtes: String = {
    val stops = Quality.GopherStops.map(w => s"'$w'").mkString(", ")
    s"""gfeats AS (
          SELECT doc_id, mtext,
            list_filter(string_split_regex(mtext, '[ \n]+'),
              w -> length(w) > 0) AS wsm,
            string_split(mtext, chr(10)) AS lsm
          FROM ml),
        gf2 AS (
          SELECT doc_id,
            CAST(len(wsm) AS BIGINT) AS n_words_g,
            CAST(len(lsm) AS BIGINT) AS n_lines_g,
            CAST(list_sum(list_transform(wsm, w -> length(w)))
              AS DOUBLE) / len(wsm) AS mean_word_len,
            CAST(len(regexp_extract_all(mtext, '#|\\.\\.\\.|…'))
              AS DOUBLE) / len(wsm) AS symbol_ratio,
            CAST(len(list_filter(lsm,
              l -> l LIKE '- %' OR l LIKE '* %')) AS DOUBLE) / len(lsm)
              AS bullet_ratio,
            CAST(len(list_filter(lsm, l -> l LIKE '%...')) AS DOUBLE)
              / len(lsm) AS ellipsis_ratio,
            CAST(len(list_filter(wsm,
              w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE) / len(wsm)
              AS alpha_ratio,
            CAST(len(list_distinct(list_filter(wsm,
              w -> w IN ($stops)))) AS BIGINT) AS n_stop_distinct
          FROM gfeats),
        gkeep AS (
          SELECT *,
            (n_words_g BETWEEN $GopherMinWords AND 100000) AND
            (mean_word_len BETWEEN 3.0 AND 10.0) AND
            symbol_ratio <= 0.1 AND bullet_ratio <= 0.9 AND
            ellipsis_ratio <= 0.3 AND alpha_ratio >= 0.8 AND
            n_stop_distinct >= $GopherStopHits AS keep
          FROM gf2)"""
  }

  /** C4 kept-lines CTE over `ml` — shared with the funnel. */
  private val c4Ctes: String =
    s"""cfeats AS (
          SELECT doc_id, lsm,
            list_filter(lsm, l ->
              (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?' OR l LIKE '%"')
              AND NOT l LIKE '%...'
              AND len(string_split(l, ' ')) >= 5) AS kept
          FROM (SELECT doc_id, string_split(mtext, chr(10)) AS lsm
                FROM ml))"""

  def queries: Seq[Q] = Seq(

    q("q_quality_gopher", "quality",
      s"""WITH $mlCte, $gopherCtes
          SELECT * FROM gkeep""") { (spark, dir) =>
      Quality.gopherRules(mlFrame(spark, dir), "doc_id", "mtext",
        minWords = GopherMinWords, minStopHits = GopherStopHits)
    },

    q("q_quality_c4", "quality",
      s"""WITH $mlCte, $c4Ctes
          SELECT doc_id,
            CAST(len(lsm) AS BIGINT) AS n_lines_c4,
            CAST(len(kept) AS BIGINT) AS n_lines_kept,
            coalesce(array_to_string(kept, chr(10)), '') AS text_c4,
            len(kept) >= 3 AS keep
          FROM cfeats""") { (spark, dir) =>
      Quality.c4LineFilter(mlFrame(spark, dir), "doc_id", "mtext")
        .select(col("doc_id"), col("n_lines_c4"), col("n_lines_kept"),
          col("text_c4"), col("keep"))
    },

    // the per-source survival funnel: how many docs each source loses
    // to each filter family — the report a curation run reads before
    // committing thresholds. One map-only pass per filter + one
    // source-keyed agg; at corpus scale this is scan-speed
    q("q_quality_funnel", "quality",
      s"""WITH $mlCte, $gopherCtes, $c4Ctes
          SELECT m.source,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(CASE WHEN g.keep THEN 1 ELSE 0 END) AS BIGINT)
              AS n_gopher,
            CAST(sum(CASE WHEN len(c.kept) >= 3 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_c4,
            CAST(sum(CASE WHEN g.keep AND len(c.kept) >= 3
              THEN 1 ELSE 0 END) AS BIGINT) AS n_both
          FROM ml m
          JOIN gkeep g USING (doc_id)
          JOIN cfeats c ON m.doc_id = c.doc_id
          GROUP BY m.source""") { (spark, dir) =>
      val ml = mlFrame(spark, dir)
      val g = Quality.gopherRules(ml, "doc_id", "mtext",
          minWords = GopherMinWords, minStopHits = GopherStopHits)
        .select(col("doc_id"), col("keep").as("gk"))
      val c = Quality.c4LineFilter(ml, "doc_id", "mtext")
        .select(col("doc_id"), col("keep").as("ck"))
      ml.select("doc_id", "source")
        .join(g, Seq("doc_id")).join(c, Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("gk"), 1L).otherwise(0L)).as("n_gopher"),
          sum(when(col("ck"), 1L).otherwise(0L)).as("n_c4"),
          sum(when(col("gk") && col("ck"), 1L).otherwise(0L)).as("n_both"))
    },

    // Gopher's within-doc repetition rules over the repeat-injected
    // fixture: duplicate = identical line occurring EARLIER (first
    // occurrence never charged), spelled list_position(ls, ls[i]) < i
    // on both engines
    q("q_quality_repetition", "quality",
      s"""WITH mlr AS (
            SELECT doc_id, $synthRepSql AS mtext
            FROM (SELECT doc_id, string_split(text, ' ') AS ws
                  FROM documents
                  WHERE text IS NOT NULL AND length(text) > 0)),
          f AS (SELECT doc_id, mtext,
                  string_split(mtext, chr(10)) AS lsm FROM mlr),
          f2 AS (
            SELECT doc_id,
              CAST(len(lsm) AS BIGINT) AS n_lines_r,
              1.0 - CAST(len(list_distinct(lsm)) AS DOUBLE) / len(lsm)
                AS dup_line_frac,
              CASE WHEN (length(mtext) - (len(lsm) - 1)) <= 0 THEN 0.0
                   ELSE CAST(coalesce(list_sum(list_transform(
                          list_filter(range(1, len(lsm) + 1),
                            i -> list_position(lsm, lsm[i]) < i),
                          i -> length(lsm[i]))), 0) AS DOUBLE)
                        / (length(mtext) - (len(lsm) - 1)) END
                AS dup_line_char_frac
            FROM f)
          SELECT *,
            dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20 AS keep
          FROM f2""") { (spark, dir) =>
      val docs = Tables.df(spark, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) > 0)
      Quality.repetitionRules(
        docs.select(col("doc_id"),
          synthRep(col("doc_id"), col("text")).as("mtext")),
        "doc_id", "mtext")
    },

    // blocklist gate (C4 bad-words shape; neutral fixture words stand
    // in for the public list). Exact-token: 'spark' flags, 'sparkly'
    // would not
    q("q_wordlist_flag", "quality", {
      val bl = Seq("spark", "vector").map(w => s"'$w'").mkString(", ")
      s"""SELECT doc_id,
            len(list_filter(string_split_regex(mtext, '[ \n]+'),
              w -> w IN ($bl))) > 0 AS flagged,
            NOT (len(list_filter(string_split_regex(mtext, '[ \n]+'),
              w -> w IN ($bl))) > 0) AS keep
          FROM (SELECT doc_id, $synthSql AS mtext
                FROM (SELECT doc_id, string_split(text, ' ') AS ws
                      FROM documents
                      WHERE text IS NOT NULL AND length(text) > 0))"""
    }) { (spark, dir) =>
      val ml = mlFrame(spark, dir)
      Quality.wordlistFlag(ml, "doc_id", "mtext",
        Seq("spark", "vector"))
    },

    // per-doc curation AUDIT — the provenance row data governance
    // wants: WHY did each document survive or not. One row per doc
    // with each gate's verdict (quality gates over the ml fixture,
    // decontamination over the raw text vs the %7 eval slice) and the
    // composite selection. Every flag reuses the spelling its
    // standalone query verifies
    q("q_curation_audit", "quality",
      s"""WITH $mlCte, $gopherCtes, $c4Ctes,
          g4 AS (
            SELECT doc_id, unnest([array_to_string(toks[i:i+3], ' ')
              for i in generate_series(1, greatest(len(toks)-3, 0))]) AS g
            FROM (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents)),
          ev AS (SELECT DISTINCT g FROM g4 WHERE doc_id % 7 = 0),
          hit AS (SELECT DISTINCT doc_id FROM g4
                  WHERE doc_id % 7 != 0 AND g IN (SELECT g FROM ev))
          SELECT m.doc_id,
            m.doc_id % 7 = 0 AS is_eval,
            gk.keep AS q_gopher,
            len(c.kept) >= 3 AS q_c4,
            CASE WHEN m.doc_id % 7 = 0 THEN NULL
                 ELSE m.doc_id IN (SELECT doc_id FROM hit) END
              AS contaminated,
            m.doc_id % 7 != 0 AND gk.keep AND len(c.kept) >= 3
              AND NOT coalesce(m.doc_id IN (SELECT doc_id FROM hit),
                    false) AS selected
          FROM ml m
          JOIN gkeep gk USING (doc_id)
          JOIN cfeats c ON m.doc_id = c.doc_id""") { (spark, dir) =>
      val ml = mlFrame(spark, dir)
      val g = Quality.gopherRules(ml, "doc_id", "mtext",
          minWords = GopherMinWords, minStopHits = GopherStopHits)
        .select(col("doc_id"), col("keep").as("q_gopher"))
      val c = Quality.c4LineFilter(ml, "doc_id", "mtext")
        .select(col("doc_id"), col("keep").as("q_c4"))
      val docs = Tables.df(spark, dir, "documents")
      val cont = graft.ops.Decontaminate.flag(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0),
          "doc_id", "text", n = 4)
        .select(col("doc_id"), col("contaminated"))
      ml.select("doc_id")
        .join(g, Seq("doc_id")).join(c, Seq("doc_id"))
        .withColumn("is_eval", col("doc_id") % 7 === 0)
        .join(cont, Seq("doc_id"), "left")
        .select(col("doc_id"), col("is_eval"), col("q_gopher"),
          col("q_c4"), col("contaminated"),
          (!col("is_eval") && col("q_gopher") && col("q_c4") &&
            !coalesce(col("contaminated"), lit(false))).as("selected"))
    },

    // corpus-global strip: a per-source nav header (25 docs/source at
    // the verify SF) and an every-other-doc footer are boilerplate by
    // the >10-docs rule; the synthesized content lines are effectively
    // unique and survive
    q("q_strip_boilerplate", "quality",
      s"""WITH $chromeCte, $stripCtes
          SELECT s.doc_id,
            CAST(len(string_split(s.mtext, chr(10))) AS BIGINT)
              AS n_lines_orig,
            CAST(coalesce(a.n_lines_kept, 0) AS BIGINT) AS n_lines_kept,
            coalesce(a.text_clean, '') AS text_clean
          FROM src s LEFT JOIN agg a USING (doc_id)""") { (spark, dir) =>
      Quality.stripBoilerplate(chromeFrame(spark, dir), "doc_id", "mtext",
        maxDocFreq = 10L)
    },

    // the quality-family capstone: strip chrome → Gopher gate → C4
    // line filter → sequence-pack the survivors' cleaned text. Every
    // stage reuses the CTE spelling its standalone query verifies, so
    // the composition cannot drift from the parts; the Spark side runs
    // the production shapes (broadcast anti-join strip, map-only
    // gates, sharded prefix-sum pack) while the oracle is the
    // single-window replay
    q("q_curate_corpus_v5", "quality",
      s"""WITH $chromeCte, $stripCtes,
          ml AS (SELECT doc_id, text_clean AS mtext FROM agg),
          $gopherCtes, $c4Ctes,
          surv AS (
            SELECT g.doc_id,
              coalesce(array_to_string(c.kept, chr(10)), '') AS text_c4
            FROM gkeep g JOIN cfeats c USING (doc_id)
            WHERE g.keep AND len(c.kept) >= 3),
          toks AS (
            SELECT doc_id,
              CAST(len(list_filter(string_split_regex(text_c4,
                '[ \n]+'), w -> length(w) > 0)) AS BIGINT)
                AS t
            FROM surv)
          SELECT doc_id, t AS tokens,
            CAST(COALESCE(SUM(t) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) // 256 AS BIGINT) AS pack_id
          FROM toks""") { (spark, dir) =>
      // checkpoint between stages (the curateV3/V4 discipline): the
      // stripped frame feeds BOTH gates — un-materialized, the whole
      // strip pipeline (line agg + anti join + reassembly) executes
      // twice, and the doubled string churn turned the 64× ramp cell
      // superlinear (measured: 29.8 s → 6.7 s with the checkpoint)
      val stripped = Quality.stripBoilerplate(chromeFrame(spark, dir),
          "doc_id", "mtext", maxDocFreq = 10L)
        .filter(col("n_lines_kept") > 0)
        .select(col("doc_id"), col("text_clean").as("mtext"))
        .localCheckpoint()
      val g = Quality.gopherRules(stripped, "doc_id", "mtext",
          minWords = GopherMinWords, minStopHits = GopherStopHits)
        .filter(col("keep")).select("doc_id")
      val c = Quality.c4LineFilter(stripped, "doc_id", "mtext")
        .filter(col("keep")).select(col("doc_id"), col("text_c4"))
      val toks = g.join(c, Seq("doc_id"))
        .select(col("doc_id"),
          size(Quality.words(col("text_c4"))).cast("long").as("n_toks"))
      graft.ops.Pack.sequencePack(toks, "doc_id", "n_toks", 256L)
    })

  /** Chrome-injected multiline corpus (nav header per source, footer on
    * even ids) — the strip fixture, shared by q_strip_boilerplate and
    * the v5 composition. */
  private val chromeCte: String =
    s"""src AS (
          SELECT doc_id,
            'NAV ' || source || ' HOME' || chr(10) || $synthSql ||
            CASE WHEN doc_id % 2 = 0
                 THEN chr(10) || 'COPYRIGHT FOOTER 2024' ELSE '' END
              AS mtext
          FROM (SELECT doc_id, source, string_split(text, ' ') AS ws
                FROM documents
                WHERE text IS NOT NULL AND length(text) > 0))"""

  /** The strip pipeline over `src` (ends in `agg`: docs with ≥1 kept
    * line, reassembled). */
  private val stripCtes: String =
    """ln AS (
          SELECT doc_id, u.pos AS pos, u.line AS line FROM (
            SELECT doc_id,
              unnest([{'pos': i - 1, 'line': lsm[i]}
                for i in generate_series(1, len(lsm))]) AS u
            FROM (SELECT doc_id, string_split(mtext, chr(10)) AS lsm
                  FROM src))),
        freq AS (
          SELECT line
          FROM (SELECT line, count(DISTINCT doc_id) AS nd
                FROM ln GROUP BY line)
          WHERE nd > 10),
        kept AS (
          SELECT * FROM ln
          WHERE line NOT IN (SELECT line FROM freq)),
        agg AS (
          SELECT doc_id, count(*) AS n_lines_kept,
            string_agg(line, chr(10) ORDER BY pos) AS text_clean
          FROM kept GROUP BY doc_id)"""

  private def chromeFrame(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.df(spark, dir, "documents")
      .filter(col("text").isNotNull && length(col("text")) > 0)
    docs.select(col("doc_id"),
      concat(
        lit("NAV "), col("source"), lit(" HOME\n"),
        synthMl(col("doc_id"), col("text")),
        when(col("doc_id") % 2 === 0, lit("\nCOPYRIGHT FOOTER 2024"))
          .otherwise(lit(""))).as("mtext"))
  }
}
