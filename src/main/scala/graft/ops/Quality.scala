package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-quality filters for training-data curation — the public
  * heuristic families every large text pipeline runs before dedup:
  * Gopher's document-level rules (Rae et al. 2021, "Scaling Language
  * Models", table A1) and C4's line-level rules (Raffel et al. 2020,
  * §2.2). Both operate on newline-delimited document text.
  *
  * Everything is composed from codegen'd built-ins (split / lambda
  * filters / regexp counts) — one map-only pass per document, no
  * shuffle, no UDF: at 100 TB these filters run at scan speed and
  * their selectivity is exactly what the scan's downstream stages
  * (dedup, pack) want applied as early as possible. The line-frequency
  * boilerplate strip ([[stripBoilerplate]]) is the one corpus-global
  * member of the family; its aggregation is partial-agg'd and its
  * removal join broadcasts only the (tiny by construction) frequent
  * set, so the corpus itself is shuffled exactly once — to reassemble.
  *
  * Reference scope: the reference pipeline (datawaves ETL) carries no
  * text-quality stage — these extend the engine toward the LLM-corpus
  * workload the builder prompt names as first-class.
  */
object Quality {

  /** Words = tokens split on RUNS of separators (spaces and
    * newlines), with empty tokens dropped. Real-world text carries
    * paragraph breaks ('\n\n'), consecutive spaces, and leading or
    * trailing separators; splitting on single characters would emit
    * empty-string "words" that inflate word counts and deflate every
    * per-word ratio downstream (the round-12 advisor's finding).
    * The filter also covers the leading-empty Java `split` keeps when
    * the text starts with a separator. */
  def words(text: Column): Column =
    filter(split(text, "[ \n]+"), w => length(w) > lit(0))

  def lines(text: Column): Column = split(text, "\n")

  /** Gopher's ≥2-distinct-stopwords rule list (Rae et al. 2021 A1). */
  val GopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Document-level Gopher quality rules. Emits one row per input row:
    * the raw features (integer counts and IEEE-double ratios — exact
    * cross-engine) plus the composite `keep`. Thresholds are the
    * published defaults unless the caller overrides; `minStopHits`
    * defaults to the paper's 2 distinct stopwords.
    *
    * Rules (doc kept iff ALL hold):
    *  - word count in [minWords, maxWords]
    *  - mean word length in [3, 10] characters
    *  - symbol-to-word ratio ('#', '...' or the one-char '…') ≤ 0.1
    *  - ≤ 90% of lines start with a bullet ('- ' or '* ')
    *  - ≤ 30% of lines end with an ellipsis
    *  - ≥ 80% of words contain at least one alphabetic character
    *  - ≥ minStopHits distinct words from [[GopherStops]]
    */
  /** The Gopher feature sub-expressions over one text column — the
    * single spelling [[gopherRules]] (reporting) and [[gopherKeep]]
    * (inline gate, streaming-safe) both build from. */
  private final case class GopherFeats(nWordsG: Column, nLinesG: Column,
      meanWordLen: Column, symbolRatio: Column, bulletRatio: Column,
      ellipsisRatio: Column, alphaRatio: Column, nStopDistinct: Column)

  private def gopherFeats(t: Column): GopherFeats = {
    val ws = words(t)
    val ls = lines(t)
    val nWords = size(ws)
    val nLines = size(ls)
    GopherFeats(
      nWordsG = nWords,
      nLinesG = nLines,
      // character mass of the words themselves — summed per word, so
      // separator runs contribute nothing (length(t) − (n−1) would
      // over-count under '\n\n' or double spaces)
      meanWordLen = aggregate(ws, lit(0L),
        (acc, w) => acc + length(w).cast("long")).cast("double") /
        nWords.cast("double"),
      // '#', the three-dot ellipsis spelling, AND the single Unicode
      // ellipsis U+2026 — real web text uses '…' and the Gopher rule
      // intends to count it
      symbolRatio =
        size(regexp_extract_all(t, lit("#|\\.\\.\\.|…"), lit(0)))
          .cast("double") / nWords.cast("double"),
      bulletRatio = size(filter(ls, l =>
        l.startsWith("- ") || l.startsWith("* "))).cast("double") /
        nLines.cast("double"),
      ellipsisRatio = size(filter(ls, l => l.endsWith("...")))
        .cast("double") / nLines.cast("double"),
      alphaRatio = size(filter(ws, w => w.rlike("[A-Za-z]")))
        .cast("double") / nWords.cast("double"),
      nStopDistinct = size(array_distinct(
        filter(ws, w => w.isInCollection(GopherStops)))))
  }

  private def gopherKeepOf(f: GopherFeats, minWords: Int, maxWords: Int,
      minStopHits: Int): Column =
    f.nWordsG.between(minWords, maxWords) &&
    f.meanWordLen.between(3.0, 10.0) &&
    f.symbolRatio <= 0.1 &&
    f.bulletRatio <= 0.9 &&
    f.ellipsisRatio <= 0.3 &&
    f.alphaRatio >= 0.8 &&
    f.nStopDistinct >= minStopHits

  /** The composite rule as ONE boolean expression — usable as an
    * inline filter in a streaming pipeline (map-only, no aggregation,
    * so it composes into any micro-batch plan). */
  def gopherKeep(text: Column, minWords: Int = 50,
      maxWords: Int = 100000, minStopHits: Int = 2): Column =
    gopherKeepOf(gopherFeats(text), minWords, maxWords, minStopHits)

  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minStopHits: Int = 2): DataFrame = {
    val f = gopherFeats(col(textCol))
    df.select(col(idCol),
      f.nWordsG.cast("long").as("n_words_g"),
      f.nLinesG.cast("long").as("n_lines_g"),
      f.meanWordLen.as("mean_word_len"),
      f.symbolRatio.as("symbol_ratio"),
      f.bulletRatio.as("bullet_ratio"),
      f.ellipsisRatio.as("ellipsis_ratio"),
      f.alphaRatio.as("alpha_ratio"),
      f.nStopDistinct.cast("long").as("n_stop_distinct"),
      gopherKeepOf(f, minWords, maxWords, minStopHits).as("keep"))
  }

  /** C4 line-level filter (Raffel et al. 2020 §2.2): a line survives
    * iff it ends in terminal punctuation ('.', '!', '?', '"') that is
    * not an ellipsis AND has at least `minLineWords` words; the doc
    * survives iff at least `minKeptLines` lines survive. Emits the
    * cleaned text (kept lines re-joined) so the pass composes directly
    * into a curation chain. Map-only — no shuffle. */
  def c4LineFilter(df: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 5, minKeptLines: Int = 3): DataFrame = {
    val ls = lines(col(textCol))
    val keptLine = (l: Column) =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\"")) &&
      !l.endsWith("...") &&
      size(split(l, " ")) >= minLineWords
    val kept = filter(ls, keptLine)
    df.select(col(idCol),
        size(ls).cast("long").as("n_lines_c4"),
        size(kept).cast("long").as("n_lines_kept"),
        array_join(kept, "\n").as("text_c4"))
      .withColumn("keep", col("n_lines_kept") >= minKeptLines)
  }

  /** Blocklist gate — the C4 "bad words" filter (Raffel et al. 2020
    * §2.2 drops any page containing a word from a public blocklist).
    * The list rides as a literal set inside a codegen'd `exists`
    * lambda — map-only, scan-speed, no broadcast variable or join.
    * Callers supply their own list; matching is exact-token (the C4
    * behavior), so a blocklist word inside another word does NOT
    * flag. */
  def wordlistFlag(df: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "blocklist must be non-empty")
    df.select(col(idCol),
        exists(words(col(textCol)), w => w.isInCollection(blocklist))
          .as("flagged"))
      .withColumn("keep", !col("flagged"))
  }

  /** Gopher's within-document REPETITION rules (Rae et al. 2021 A1,
    * line family): fraction of duplicate lines ≤ 0.30 and fraction of
    * CHARACTERS inside duplicate lines ≤ 0.20 — the filter that kills
    * templated/boilerplate-stuffed pages whose line set is small but
    * whose text is long. A line is a duplicate iff an identical line
    * occurs EARLIER in the document (first occurrence is never
    * charged), spelled as `array_position(lines, line_i) < i` on both
    * engines. All higher-order functions, map-only, codegen'd — one
    * pass per document at scan speed. */
  def repetitionRules(df: DataFrame, idCol: String, textCol: String,
      maxDupLineFrac: Double = 0.30,
      maxDupLineCharFrac: Double = 0.20): DataFrame = {
    val ls = lines(col(textCol))
    val n = size(ls)
    val nDistinct = size(array_distinct(ls))
    // 1-based positions of duplicate (non-first-occurrence) lines
    val dupIdx = filter(sequence(lit(1), n),
      i => array_position(ls, element_at(ls, i)) < i)
    val dupChars = aggregate(
      transform(dupIdx, i => length(element_at(ls, i)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    // character mass of the lines themselves (separators are single
    // newlines: length − (n_lines − 1))
    val totChars = (length(col(textCol)) - (n - lit(1))).cast("long")
    df.select(col(idCol),
        n.cast("long").as("n_lines_r"),
        (lit(1.0) - nDistinct.cast("double") / n.cast("double"))
          .as("dup_line_frac"),
        when(totChars <= 0, lit(0.0))
          .otherwise(dupChars.cast("double") / totChars.cast("double"))
          .as("dup_line_char_frac"))
      .withColumn("keep",
        col("dup_line_frac") <= maxDupLineFrac &&
        col("dup_line_char_frac") <= maxDupLineCharFrac)
  }

  /** Corpus-global boilerplate strip (the CCNet / RefinedWeb move):
    * any LINE appearing in more than `maxDocFreq` distinct documents
    * is chrome (headers, license banners, nav text) and is removed
    * from every document; survivors are reassembled in original line
    * order. Documents whose every line was boilerplate survive with
    * empty `text_clean` — the caller decides whether to drop them.
    *
    * Scale shape: the line-frequency aggregate is preceded by a
    * per-doc distinct (one shuffle row per distinct line per doc, so a
    * doc repeating its own header 1000× counts once) and partial-agg
    * combines on the line key; the frequent set is bounded by
    * |corpus| / maxDocFreq lines and in practice tiny, so the removal
    * is a BROADCAST anti-join — the corpus is never shuffled to probe
    * it. The only corpus-sized shuffle is the doc-keyed reassembly,
    * whose per-group state is one document's lines. */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
      maxDocFreq: Long): DataFrame = {
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    val id = col(idCol)
    val exploded = df
      .select(id, posexplode(lines(col(textCol))).as(Seq("pos", "line")))
    val frequent = exploded.select(id, col("line")).distinct()
      .groupBy("line").agg(count(lit(1)).as("line_docs"))
      .filter(col("line_docs") > maxDocFreq)
      .select("line")
    val keptLines = exploded.join(broadcast(frequent), Seq("line"), "left_anti")
    val reassembled = keptLines.groupBy(id)
      .agg(count(lit(1)).as("n_lines_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")),
          "\n").as("text_clean"))
    df.select(id, size(lines(col(textCol))).cast("long").as("n_lines_orig"))
      .join(reassembled, Seq(idCol), "left")
      .select(id, col("n_lines_orig"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** k-anonymous aggregate release (the public Sweeney 2002 model,
    * applied at the release gate): published group counts whose
    * quasi-identifier combination matches fewer than `k` underlying
    * rows re-identify individuals by intersection — so groups below
    * the threshold are SUPPRESSED into one residual row whose quasi
    * columns read `*`, keeping the released table's total row count
    * exact while no published combination isolates < k people.
    *
    * Scale shape: one partial-agg'd groupBy over the quasi columns
    * (corpus-sized shuffle of distinct combinations), then a
    * map-side mask + a second groupBy over the ≤ |groups| rows to
    * fold all suppressed combinations together. Quasi columns are
    * cast to string (the `*` mask needs one type; NULL masks to `*`
    * via the cast-and-coalesce, so a NULL quasi value can't leak as
    * its own publishable group). A literal `"*"` VALUE in a quasi
    * column is rejected with a runtime error (map-side guard, free
    * when absent) — silently merging a real value with the mask
    * sentinel would fold distinct groups into the residual.
    *
    * The residual row itself may aggregate fewer than `k` records
    * (e.g. one suppressed group of k−1 publishes `n_rows = k−1`).
    * That is INTENDED: the fully-masked class carries zero
    * quasi-identifier information, so its count cannot intersect
    * anything — while dropping it would make the released total lie.
    *
    * @return one row per surviving combination + at most one
    * residual: (quasiCols…, n_rows) */
  /** NULL → `*` mask with the literal-`*` collision guard (map-side
    * raise_error, free when absent) — shared by the release gates. */
  private def quasiMasked(c: String): Column = {
    val s = col(c).cast("string")
    coalesce(
      when(s === "*", raise_error(lit(
        s"release gate: literal '*' value in quasi column " +
          s"'$c' collides with the suppression sentinel")))
        .otherwise(s),
      lit("*")).as(c)
  }

  def kAnonymousRelease(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 2, s"k must be >= 2 for suppression to mean anything: $k")
    val grouped = df
      .select(quasiCols.map(quasiMasked): _*)
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
    val masked = grouped.select(
      quasiCols.map(c =>
        when(col("n_rows") >= k, col(c)).otherwise(lit("*")).as(c)) :+
        col("n_rows"): _*)
    masked.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"))
  }

  /** l-diverse aggregate release — k-anonymity's stronger sibling (the
    * public Machanavajjhala et al. 2007 model): a group whose k+ rows
    * all share ONE sensitive value still discloses that value to
    * anyone who can place a person in the group (the homogeneity
    * attack k-anonymity misses). A combination publishes only when it
    * covers ≥ `k` rows AND ≥ `l` DISTINCT sensitive values; everything
    * else folds into the `*` residual, whose `n_sensitive` is the
    * distinct-sensitive count across all suppressed rows.
    *
    * Scale shape: a (quasi…, sensitive) partial-agg'd groupBy (the
    * only corpus-sized shuffle), a groups-sized verdict aggregate, and
    * a groups-sized re-aggregate for the fold — nothing corpus-
    * quadratic. Sensitive values are never published, only counted;
    * a NULL sensitive value counts as one distinct value. Quasi
    * columns share [[kAnonymousRelease]]'s NULL-mask + literal-`*`
    * guard.
    *
    * @return one row per surviving combination + at most one residual:
    *         (quasiCols…, n_rows, n_sensitive) */
  def lDiverseRelease(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column '$sensitiveCol' cannot also be a quasi column")
    require(k >= 2, s"k must be >= 2: $k")
    require(l >= 1, s"l must be >= 1: $l")
    val g1 = df
      .select(quasiCols.map(quasiMasked) :+
        coalesce(col(sensitiveCol).cast("string"), lit("\u0000"))
          .as("_sens"): _*)
      .groupBy((quasiCols :+ "_sens").map(col): _*)
      .agg(count(lit(1)).as("_c"))
    // one row per (quasi, sensitive): rows per quasi = sum, distinct
    // sensitive per quasi = row count
    val verdict = g1.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("_c")).as("_n"), count(lit(1)).as("_l"))
      .select(quasiCols.map(c => col(c).as(s"_v_$c")) :+
        (col("_n") >= k && col("_l") >= l).as("_pub"): _*)
    val joined = g1.join(verdict,
      quasiCols.map(c => col(c) <=> col(s"_v_$c")).reduce(_ && _))
    joined
      .select(quasiCols.map(c =>
        when(col("_pub"), col(c)).otherwise(lit("*")).as(c)) :+
        col("_sens") :+ col("_c"): _*)
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(col("_c")).as("n_rows"),
        count_distinct(col("_sens")).as("n_sensitive"))
  }

  /** t-close aggregate release — the third rung of the public release-
    * gate ladder (Li, Li, Venkatasubramanian 2007, ICDE): l-diversity
    * counts distinct sensitive values but ignores their PROPORTIONS,
    * so a group that is 98% one diagnosis still discloses it
    * (skewness attack). A combination publishes only when it covers
    * ≥ `k` rows AND its sensitive-value distribution sits within
    * total-variation distance `tPermille`/1000 of the corpus-global
    * distribution (TVD = the categorical earth-mover's distance under
    * the unit ground metric, the paper's equal-distance case);
    * everything else folds into the `*` residual.
    *
    * The check is INTEGER-EXACT — no floating-point densities: for
    * group g of n rows in a corpus of N rows, with value counts c_v
    * (group) and C_v (global),
    *   TVD(g) <= t/1000  <=>  1000 * Σ_v |c_v·N − C_v·n| <= 2·t·n·N
    * with the Σ over the FULL value domain: values absent from the
    * group contribute C_v·n, folded in as (N − Σ_{v∈g} C_v)·n without
    * ever materializing the absent (group, value) pairs. Cross
    * products are computed in DECIMAL(38,0) — c_v·N reaches N², past
    * Long at ~3·10⁹ corpus rows — and the oracle replays the same
    * algebra in HUGEINT.
    *
    * Scale shape: the (quasi…, sensitive) partial-agg'd groupBy is
    * the only corpus-sized shuffle (shared with [[lDiverseRelease]]);
    * the global distribution is a values-sized broadcast, the
    * corpus total a 1-row broadcast, and the per-group window +
    * verdict + residual fold all run on the groups×values frame under
    * ONE hash partitioning (window and groupBy share the quasi keys).
    *
    * @return one row per surviving combination + at most one residual:
    *         (quasiCols…, n_rows) */
  def tCloseRelease(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Long, tPermille: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column '$sensitiveCol' cannot also be a quasi column")
    require(k >= 2, s"k must be >= 2: $k")
    require(tPermille >= 0 && tPermille <= 1000,
      s"tPermille must be in [0, 1000]: $tPermille")
    val g1 = df
      .select(quasiCols.map(quasiMasked) :+
        coalesce(col(sensitiveCol).cast("string"), lit("\u0000"))
          .as("_sens"): _*)
      .groupBy((quasiCols :+ "_sens").map(col): _*)
      .agg(count(lit(1)).as("_c"))
    val glob = g1.groupBy(col("_sens")).agg(sum(col("_c")).as("_cv"))
    val total = glob.agg(sum(col("_cv")).as("_nn"))
    val dec = (c: Column) => c.cast("decimal(19,0)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*)
    val per = g1
      .join(broadcast(glob), "_sens")
      .crossJoin(broadcast(total))
      // _ng, not _n: a lateral alias equal to the child's window
      // column name makes later agg references ambiguous under LCA
      .withColumn("_n", sum(col("_c")).over(w))
      .groupBy(quasiCols.map(col): _*)
      .agg(max(col("_n")).as("_ng"), max(col("_nn")).as("_N"),
        sum(abs(dec(col("_c")) * dec(col("_nn")) -
          dec(col("_cv")) * dec(col("_n")))).as("_s1"),
        sum(col("_cv")).as("_cov"))
    val s = col("_s1") +
      (dec(col("_N")) - dec(col("_cov"))) * dec(col("_ng"))
    val pub = col("_ng") >= k &&
      s * lit(1000) <=
        dec(lit(2 * tPermille)) * dec(col("_ng")) * dec(col("_N"))
    per
      .select(quasiCols.map(c =>
        when(pub, col(c)).otherwise(lit("*")).as(c)) :+ col("_ng"): _*)
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(col("_ng")).as("n_rows"))
  }
}
