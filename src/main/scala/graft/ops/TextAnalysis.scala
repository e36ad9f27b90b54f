package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{GraftColumnBridge => CB}

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting.
  * Everything except the fingerprint is composed from codegen'd
  * built-ins (split/regexp/filter lambdas) so it rides whole-stage
  * codegen; the fingerprint is a custom unary Expression WITH doGenCode
  * (hot-path friendly: one pass over the string, no regex).
  */
object TextAnalysis {

  /** Whitespace tokens under the corpus' SINGLE-SPACE convention —
    * an explicit precondition, not an assumption: the driver's
    * documents table is single-space-delimited by construction, and
    * every oracle replays `string_split(text, ' ')` byte-for-byte.
    * Text with separator RUNS (paragraph breaks, double spaces —
    * e.g. the synthesized multiline fixtures) must go through
    * [[graft.ops.Quality.words]], which splits on runs and drops
    * empty tokens; feeding it here would inflate token counts. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: letter runs, single digits, single
    * punctuation — a cheap proxy for byte-pair tokenizers. */
  val BpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /** REAL deterministic BPE subword tokens (greedy rank-merge encode
    * against an ordered merges table — [[graft.functions.BpeEncode]]
    * for the algorithm and oracle contract). Unlike [[bpeishTokenCount]]
    * this is an actual trained-vocabulary tokenizer: budgets computed
    * from it are in model tokens, not whitespace or regex proxies. */
  def bpeTokens(text: Column,
      merges: Seq[String] = graft.functions.BpeFixture.Merges): Column =
    CB.column(graft.functions.BpeEncode(CB.expression(text), merges))

  /** Per-doc BPE token count + the reassembled subword text (tokens
    * never contain spaces — words were space-split — so the space
    * join is unambiguous and oracle-comparable). */
  def bpeTokenize(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[String] = graft.functions.BpeFixture.Merges): DataFrame = {
    val toks = bpeTokens(col(textCol), merges)
    df.filter(col(textCol).isNotNull)
      .withColumn("__bpe", toks)
      .select(col(idCol),
        size(col("__bpe")).cast("long").as("n_tokens_bpe"),
        array_join(col("__bpe"), " ").as("bpe_text"))
  }

  /** Tokenizer FERTILITY report: mean BPE tokens per whitespace word,
    * grouped (typically by language) — the standard multilingual-
    * tokenizer health metric (a vocabulary that fragments one
    * language 3× more than another silently triples its training
    * cost per word). Integer sums (exact, order-free) with one final
    * double division, so the report differentials bit-exactly against
    * the recursive-CTE BPE replay. Scale shape: the encode is the
    * map-only [[bpeTokens]] pass; the report is one partial-agg'd
    * group-keyed aggregate over per-doc counts — no corpus shuffle
    * beyond the #groups-sized one. */
  def bpeFertility(df: DataFrame, idCol: String, textCol: String,
      grpCol: String,
      merges: Seq[String] = graft.functions.BpeFixture.Merges): DataFrame = {
    val enc = bpeTokenize(df, idCol, textCol, merges)
      .select(col(idCol), col("n_tokens_bpe"))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), col(grpCol),
        tokenCount(col(textCol)).cast("long").as("n_words_f"))
      .join(enc, Seq(idCol))
      .groupBy(grpCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words_f")).as("n_words"),
        sum(col("n_tokens_bpe")).as("n_tokens"),
        (sum(col("n_tokens_bpe")).cast("double") /
          sum(col("n_words_f")).cast("double")).as("fertility"))
  }

  val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), w => w.isInCollection(Stopwords)))

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0)))

  /** Quality features + a composite score (all integer-derived, ratios
    * as IEEE-double division — deterministic cross-engine). */
  def qualityFeatures(df: DataFrame, text: Column): DataFrame =
    df.withColumn("n_chars_m", length(text))
      .withColumn("n_words", tokenCount(text))
      .withColumn("n_bpeish", bpeishTokenCount(text))
      .withColumn("n_punct", punctCount(text))
      .withColumn("n_stop", stopwordCount(text))
      .withColumn("stop_ratio",
        col("n_stop").cast("double") / col("n_words").cast("double"))
      .withColumn("mean_word_len",
        col("n_chars_m").cast("double") / col("n_words").cast("double"))

  /** Stopword-profile language ID. Deterministic tie-break order:
    * highest hits wins, earlier profile wins ties. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "et", "de", "est"),
    "de" -> Seq("der", "die", "und", "ist", "das"))

  def langHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), w => w.isInCollection(words)))

  def langId(df: DataFrame, text: Column): DataFrame = {
    val withHits = LangProfiles.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"hits_$lang", langHits(text, words))
    }
    val best = LangProfiles.foldRight(lit("und"): Column) {
      case ((lang, _), rest) =>
        when(col(s"hits_$lang") > 0 &&
          LangProfiles.filter(_._1 != lang).map(p => col(s"hits_$lang") >=
            col(s"hits_${p._1}")).reduce(_ && _), lit(lang))
          .otherwise(rest)
    }
    withHits.withColumn("lang_pred", best)
  }

  def fingerprint(text: Column): Column = CB.column(RollingHash64(CB.expression(text)))

  /** Unicode NFC normalization ([[graft.functions.NfcNormalize]]) —
    * run it before any hash-keyed dedup on multilingual text. */
  def nfc(text: Column): Column =
    CB.column(graft.functions.NfcNormalize(CB.expression(text)))

  /** PII redaction — the standard scrub pass before a corpus ships to
    * training. Conservative patterns chosen to behave identically in
    * Java regex (this engine) and RE2 (DuckDB oracle): emails,
    * bounds-checked IPv4 addresses (each octet 0–255, so a lookalike
    * such as 999.999.999.999 is NOT an address and survives — oracled
    * negative case in `q_text_pii`), and NNN-NNN-NNNN phone shapes
    * with an optional international +C/+CC prefix, replaced with typed
    * placeholder tags. Order matters (emails first: an address can
    * contain digit runs a later pattern might bite). Pure per-row
    * regexp_replace chain — codegen'd, no shuffle, linear per row.
    *
    * CONTRACT: these are deliberately conservative, latin-script /
    * US-shaped defaults — a floor, not a PII inventory (no IPv6, no
    * national phone formats beyond the +CC prefix, no street
    * addresses, no ID numbers). A production corpus brings its own
    * pattern set; the operator shape (ordered regexp_replace chain,
    * cross-engine-safe pattern subset: char classes, bounded
    * quantifiers, \b, no backrefs/lookaround) is the reusable part. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // octet = 0-255, PLUS the leading-zero spellings logs actually
  // contain (001, 042): dropping those when bounds-checking would
  // ship real addresses to training (round-10 review catch)
  private val Octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|0[0-9][0-9]?|[1-9]?[0-9])"
  val Ipv4Pattern = s"\\b($Octet\\.){3}$Octet\\b"
  val PhonePattern = "(\\+[0-9]{1,2}[- ])?\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** Shared spreading policy ([[Spread]]), unkeyed — the tokenize/
    * explode work is pure per-row. */
  private def spread(df: DataFrame): DataFrame = Spread(df)

  /** Token bigrams "w_i w_{i+1}" in ONE zip_with pass. The obvious
    * `transform(sequence(1, n−1), i => concat_ws(" ", slice(toks, i,
    * 2)))` re-slices the token array per element — measured 6× slower
    * exploding sf0.1's bigrams (2.4 s vs 0.4 s) and the dominant cost
    * of the whole LM pipeline. Byte-identical strings (concat(a,' ',b)
    * ≡ concat_ws(' ', slice)): the cross-engine oracles are
    * unaffected. Yields n−1 entries for n ≥ 2 (the trailing zip pair
    * pads null and is filtered out); callers guard n < 2 themselves. */
  private def bigramArray(toks: Column, nTok: Column): Column =
    filter(zip_with(toks, slice(toks, lit(2), greatest(nTok - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b)), x => x.isNotNull)

  /** Bigrams paired with their FIRST token, same one-pass zip: the LM
    * pipeline needs both xxhash64(bg) and xxhash64(w1) per exploded
    * row, and re-splitting the just-concatenated bigram would pay a
    * regex split + 2-element array allocation per bigram on the
    * hottest exploded path (the same re-copy class as the slice-based
    * shingle this file replaced). Tokens contain no spaces (split on
    * " "), so w1 ≡ element_at(split(bg, " "), 1) byte-for-byte —
    * hashes and every downstream oracle unchanged. */
  private def bigramPairs(toks: Column, nTok: Column): Column =
    filter(zip_with(toks, slice(toks, lit(2), greatest(nTok - 1, lit(0))),
      (a, b) => struct(concat(a, lit(" "), b).as("bg"), a.as("w1"))),
      x => x.getField("bg").isNotNull)

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Repetition features (Gopher-style quality signals): the fraction
    * of duplicate tokens and duplicate token-bigrams in a document.
    * High values flag boilerplate/spam for the quality filter. Integer
    * counts with one IEEE double division — deterministic
    * cross-engine; degenerate docs (< 1 token / < 2 tokens) score 0
    * by definition rather than dividing by zero. Linear per row. */
  def repetitionFeatures(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(text)
    val nTok = size(toks)
    val bigrams = bigramArray(toks, nTok)
    df.withColumn("n_tokens_r", nTok)
      .withColumn("dup_token_frac",
        when(nTok < 1, lit(0.0)).otherwise(
          lit(1.0) - size(array_distinct(toks)).cast("double") /
            nTok.cast("double")))
      .withColumn("dup_bigram_frac",
        when(nTok < 2, lit(0.0)).otherwise(
          lit(1.0) - size(array_distinct(bigrams)).cast("double") /
            (nTok - 1).cast("double")))
  }

  /** Corpus-trained bigram-LM quality score (the CCNet-style "how
    * typical of the corpus is this document" signal, exact-arithmetic
    * variant): per document, the mean smoothed conditional probability
    * of its token bigrams under the corpus' own bigram counts,
    *   score = avg_i  c(w_i, w_{i+1}) / (c(w_i) + V)
    * with V = vocabulary size as the add-V smoothing mass. Boilerplate
    * and templated text (bigrams the corpus repeats constantly) score
    * HIGH; gibberish and out-of-distribution text score LOW — the
    * complement of [[repetitionFeatures]], which only sees repetition
    * WITHIN a document.
    *
    * Engine-exactness is designed in, not hoped for: a true log-prob
    * perplexity would sum doubles whose libm `log` may differ in the
    * last ulp across engines, so each term is instead the FIXED-POINT
    * integer `(c(bg)·10⁶) div (c(w1) + V)` — integer floor division,
    * bit-identical everywhere — and the per-doc aggregation is an
    * integer SUM (order-free). The only double is one final division
    * of two exact longs. Scale shape: two wordcount aggregations
    * (partial-agg'd), two hash joins, one per-doc sum — all
    * shuffle-bounded, no driver state; the vocabulary scalar rides a
    * broadcast single-row cross join.
    *
    * Counts and joins ride xxhash64 FINGERPRINTS of the bigram /
    * unigram text, not the strings (the unitDedup / Jaccard-postings
    * pattern): counts keyed on 64-bit hashes are w.h.p. identical to
    * counts keyed on text (collisions ~n²/2⁶⁵), the agg hash tables
    * and both count-join shuffles carry 8-byte longs instead of
    * ~20-40-byte UTF8 strings, and the strings themselves never leave
    * their scan partition. */
  def bigramLmScore(df0: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val df = spread(df0)
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    // guard docs shorter than 2 tokens: no bigram evidence
    val bgs = when(nTok < 2,
        array().cast("array<struct<bg:string,w1:string>>"))
      .otherwise(bigramPairs(toks, nTok))
    // plain explode, not posexplode: position is never consumed, and a
    // dead int would ride every bigram row through both count joins
    // and the per-doc aggregation shuffle
    val docBg = df.select(col(idCol).as("__id"), explode(bgs).as("p"))
      .select(col("__id"), xxhash64(col("p.bg")).as("bgh"),
        xxhash64(col("p.w1")).as("w1h"))
    val bCounts = docBg.groupBy("bgh").agg(count(lit(1)).as("c_bg"))
    val uni = df.select(explode(tokens(col(textCol))).as("w1"))
      .select(xxhash64(col("w1")).as("w1h"))
    val uCounts = uni.groupBy("w1h").agg(count(lit(1)).as("c_w1"))
    val vocab = uCounts.agg(count(lit(1)).as("v"))
    val terms = docBg
      .join(bCounts, "bgh").join(uCounts, "w1h")
      .crossJoin(broadcast(vocab))
      .withColumn("fp",
        expr("(c_bg * 1000000L) div (c_w1 + v)"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("fp")).as("lm_fp_sum"))
    df.select(col(idCol)).distinct()
      .join(terms, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_fp_sum"), lit(0L)).as("lm_fp_sum"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("lm_fp_sum").cast("double") /
            (col("n_bigrams") * 1000000L).cast("double")).as("lm_score"))
  }

  /** Bigram-LM count tables for a corpus, fingerprint-keyed (the
    * [[bigramLmScore]] representation): (bigram counts keyed on
    * xxhash64(bg), unigram counts keyed on xxhash64(w1), 1-row vocab
    * size). Shared by [[dsirResample]]'s two LMs. */
  private def lmCountTables(df: DataFrame, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val bgs = when(nTok < 2,
        array().cast("array<struct<bg:string,w1:string>>"))
      .otherwise(bigramPairs(toks, nTok))
    val bCounts = df.select(explode(bgs).as("p"))
      .select(xxhash64(col("p.bg")).as("bgh"))
      .groupBy("bgh").agg(count(lit(1)).as("c_bg"))
    val uCounts = df.select(explode(tokens(col(textCol))).as("w1"))
      .select(xxhash64(col("w1")).as("w1h"))
      .groupBy("w1h").agg(count(lit(1)).as("c_w1"))
    val vocab = uCounts.agg(count(lit(1)).as("v"))
    (bCounts, uCounts, vocab)
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" — the public reference;
    * arXiv:2302.03169): score every train doc by the bigram-LM
    * log-likelihood-ratio surrogate between a TARGET corpus (the
    * distribution you want more of) and the train corpus itself, then
    * keep docs with probability increasing in that score, randomized by
    * a deterministic per-doc hash. Two engine-exact substitutions,
    * both monotone in the quantity they replace (the [[tfidfKeywords]]
    * fixed-point-IDF discipline): the per-bigram importance term is the
    * fixed-point PROBABILITY ratio difference `fp_target − fp_corpus`
    * (each `(c_bg·10⁶) div (c_w1 + V)`, [[bigramLmScore]]'s exact
    * integer term) rather than a libm log-ratio, and the acceptance
    * curve is a LINEAR RAMP `clamp(d − θ, 0, P)/P` over the mean term
    * difference d rather than exp-normalized weights. The sampler is
    * Gumbel-free: u = pmod(murmur3(id), 10⁶) plays the uniform draw,
    * and the keep test `u·P·n < clamp(Σdiff − θ·n, 0, P·n)·10⁶`
    * cross-multiplies so NO integer division of a possibly-negative
    * sum ever happens (Spark `div` truncates toward zero; DuckDB `//`
    * floors — avoiding the op entirely is what keeps the oracle
    * exact).
    *
    * Scale shape: the target LM's count tables are benchmark-sized —
    * broadcast — so the corpus pays exactly [[bigramLmScore]]'s
    * passes (bigram explode + two count joins, all fingerprint-keyed)
    * plus map-side integer arithmetic; the sampler adds no shuffle.
    * Overflow bound: u·P·n < 2⁶³ ⇒ P·n < 9.2·10¹² — holds for any
    * plausible ramp width (P ≤ 10⁸) and doc length (n ≤ 10⁴).
    * Docs with no bigram evidence (n < 2 tokens) score 0 and are
    * never kept (no evidence ≠ on-target; the conservative default
    * for a SELECTOR — the opposite of decontamination's NULL
    * contract, where no evidence means "cannot be contaminated").
    * Ids must be non-negative (the oracle replays the id hash through
    * its unsigned 32-bit words). */
  def dsirResample(train: DataFrame, target: DataFrame, idCol: String,
      textCol: String, thetaFp: Long, rampFp: Long): DataFrame = {
    require(rampFp > 0 && rampFp <= 100000000L,
      s"rampFp must be in (0, 1e8] (the documented overflow bound " +
        s"u*rampFp*n < 2^63), got $rampFp")
    require(math.abs(thetaFp) <= 1000000000000L,
      s"|thetaFp| must be <= 1e12 (overflow bound), got $thetaFp")
    val df = spread(train)
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val bgs = when(nTok < 2,
        array().cast("array<struct<bg:string,w1:string>>"))
      .otherwise(bigramPairs(toks, nTok))
    val docBg = df.select(col(idCol).as("__id"), explode(bgs).as("p"))
      .select(col("__id"), xxhash64(col("p.bg")).as("bgh"),
        xxhash64(col("p.w1")).as("w1h"))
    // corpus LM from train itself (every train bigram exists: inner
    // joins); target LM left-joined with absent-count 0 (add-V
    // smoothing keeps the term defined)
    val (bC, uC, vC) = lmCountTables(df, textCol)
    val tgt = spread(target)
    val (bT, uT, vT) = lmCountTables(tgt, textCol)
    val terms = docBg
      .join(bC, "bgh").join(uC, "w1h").crossJoin(broadcast(vC))
      .join(broadcast(bT.withColumnRenamed("c_bg", "c_bg_t")),
        Seq("bgh"), "left")
      .join(broadcast(uT.withColumnRenamed("c_w1", "c_w1_t")),
        Seq("w1h"), "left")
      .crossJoin(broadcast(vT.withColumnRenamed("v", "v_t")))
      .withColumn("fp_c", expr("(c_bg * 1000000L) div (c_w1 + v)"))
      .withColumn("fp_t", expr(
        "(coalesce(c_bg_t, 0L) * 1000000L) div (coalesce(c_w1_t, 0L) + v_t)"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("fp_t") - col("fp_c")).as("diff_fp_sum"))
    // the overflow contract CHECKED, not just documented: the param
    // requires above bound rampFp and thetaFp, but a single
    // pathological doc can still push n_bigrams past the point where
    // u·rampFp·n (left side) or (|θ|+10⁶)·n (accept's diff bound)
    // wraps 2⁶³ and silently flips the kept bit — fail the job loudly
    // instead. At the default-ish rampFp=10⁴ the bound is ~9.2e8
    // bigrams per doc; no real document approaches it.
    val maxN = math.min(
      Long.MaxValue / (1000000L * rampFp),
      Long.MaxValue / (math.max(math.abs(thetaFp), 1L) + 1000000L))
    df.select(col(idCol)).distinct()
      .join(terms, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("diff_fp_sum"), lit(0L)).as("diff_fp_sum"))
      .withColumn("n_bigrams",
        when(col("n_bigrams") > maxN, raise_error(concat(
            lit(s"dsirResample: doc "), col(idCol).cast("string"),
            lit(s" exceeds $maxN bigrams — the 64-bit keep-test bound" +
              s" for rampFp=$rampFp, thetaFp=$thetaFp"))).cast("long"))
          .otherwise(col("n_bigrams")))
      .withColumn("dsir_score",
        when(col("n_bigrams") === 0, lit(0.0))
          .otherwise(col("diff_fp_sum").cast("double") /
            (col("n_bigrams") * 1000000L).cast("double")))
      .withColumn("__accept",
        greatest(lit(0L), least(
          col("diff_fp_sum") - lit(thetaFp) * col("n_bigrams"),
          lit(rampFp) * col("n_bigrams"))))
      .withColumn("kept",
        col("n_bigrams") > 0 &&
          pmod(hash(col(idCol)), lit(1000000)).cast("long") *
            lit(rampFp) * col("n_bigrams") <
            col("__accept") * lit(1000000L))
      .drop("__accept")
  }

  /** Top-k TF-IDF keywords per document — the standard corpus keyword
    * extractor, in the same engine-exact fixed-point discipline as
    * [[bigramLmScore]]: a true IDF takes `log(N/df)`, whose libm last
    * ulp may diverge cross-engine, so the IDF term is instead the
    * FIXED-POINT integer `(N·10⁶) div df` (monotone in N/df — ranking
    * by it agrees with ranking by the log for any fixed N) and the
    * score is the exact long `tf · idf_fp`. Ties broken by term text,
    * so top-k membership is total-ordered and the WHOLE operator
    * differentials against DuckDB.
    *
    * Scale shape: one partial-agg'd (doc, term) count — the corpus
    * pass — then a vocabulary-sized doc-frequency aggregate, a join
    * keyed on the term, and a per-doc top-k window. Two bounded
    * shuffles over distinct (doc, term) pairs; the doc-count scalar
    * rides a broadcast single-row cross join. Overflow bound:
    * N·10⁶·tf must stay under 2⁶³ — holds through ~10⁹ docs at
    * tf ≤ 10³ (past that, drop the fixed-point scale to 10³).
    * Docs with no tokens have no keywords and no output rows. */
  def tfidfKeywords(df0: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val df = spread(df0)
    val tok = df.select(col(idCol).as("did"),
        explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    val tf = tok.groupBy("did", "w").agg(count(lit(1)).as("tf"))
    // tf is already distinct per (doc, term): counting its rows per
    // term IS the document frequency — no second distinct pass
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("dfr"))
    // countDistinct skips NULL ids, matching SQL COUNT(DISTINCT …) —
    // a distinct().count() would count a null-id group the oracle
    // doesn't, silently shifting every idf_fp
    val nd = df.agg(countDistinct(col(idCol)).as("n"))
    val win = Window.partitionBy(col("did"))
      .orderBy(col("score_fp").desc, col("w"))
    tf.join(dfreq, "w")
      .crossJoin(broadcast(nd))
      .withColumn("idf_fp", expr("(n * 1000000) div dfr"))
      .withColumn("score_fp", col("tf") * col("idf_fp"))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("did").as(idCol), col("w").as("term"), col("tf"),
        col("score_fp"), col("rank").cast("long").as("rank"))
  }

  /** Per-source corpus quality report — the dashboard aggregate every
    * curation run publishes: document/char/token volume and the
    * duplicate-token mass per source. Engine-exact by the repo's
    * reporting discipline: every aggregation is an INTEGER sum of
    * per-row integer counts (order-free), and the two ratio columns
    * are single IEEE divisions of exact longs — no double
    * accumulation whose fp order could diverge cross-engine.
    * One partial-agg'd groupBy on the source; the per-row token work
    * never leaves its scan partition. */
  def sourceReport(df0: DataFrame, srcCol: String,
      textCol: String): DataFrame = {
    val df = spread(df0)
    val toks = tokens(col(textCol))
    val perDoc = df.select(col(srcCol).as("source"),
      length(col(textCol)).cast("long").as("chars"),
      size(toks).cast("long").as("n_tok"),
      size(array_distinct(toks)).cast("long").as("n_dis"))
    perDoc.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("chars")).as("total_chars"),
        sum(col("n_tok")).as("total_tokens"),
        sum(col("n_tok") - col("n_dis")).as("dup_tokens"))
      .withColumn("dup_token_frac",
        col("dup_tokens").cast("double") /
          col("total_tokens").cast("double"))
      .withColumn("mean_chars",
        col("total_chars").cast("double") / col("n_docs").cast("double"))
  }

  /** Corpus vocabulary: the k most frequent whitespace tokens with
    * counts, ties broken lexicographically — tokenizer/vocab-building
    * over the whole corpus. The classic giant-shuffle wordcount, kept
    * scale-sane by Spark's partial aggregation: the explode never
    * leaves its input partition un-combined (HashAggregate partial →
    * exchange on the word → final), so the shuffle carries one row per
    * (partition, word), not one per token occurrence. The final top-k
    * is a TakeOrdered on the (already tiny) distinct-word table, not a
    * global sort of the corpus. */
  def vocabulary(df: DataFrame, text: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.select(explode(tokens(text)).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(k)
  }

  /** Vocabulary DRIFT report between two corpora — the distribution
    * monitor that pairs with [[graft.ops.Dedup.corpusDiff]]: where
    * the diff says WHICH docs changed, this says how the LANGUAGE
    * changed (a crawl source pivoting topics, a filter suddenly
    * eating one register, a contamination burst). Per-word token
    * frequencies in exact fixed point (occurrences·10⁶ div corpus
    * tokens — the [[tfidfKeywords]] discipline: no float sums, no
    * libm), absolute drift = |fp_a − fp_b|, top-k by (drift DESC,
    * word) — a total order, so the cut is deterministic and the whole
    * report differentials.
    *
    * Scale shape: two word-count aggregates (partial-agg'd, word-
    * keyed shuffles), one scalar total per side (broadcast), one
    * word-keyed full-outer join of the two count tables (vocabulary-
    * sized, not corpus-sized), and a global top-k that plans as
    * TakeOrderedAndProject ([[boilerplateGrams]]' shape — no full
    * vocabulary sort). A word absent from one side counts 0 there —
    * appearing/disappearing vocabulary is exactly what the report
    * exists to surface. */
  def vocabDrift(a: DataFrame, b: DataFrame, text: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    def counts(df: DataFrame) =
      df.select(explode(tokens(text)).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("n"))
    val ca = counts(a)
    val cb = counts(b)
    val ta = ca.agg(sum(col("n")).as("tot_a"))
    val tb = cb.agg(sum(col("n")).as("tot_b"))
    ca.withColumnRenamed("n", "n_a")
      .join(cb.withColumnRenamed("n", "n_b"), Seq("word"), "full_outer")
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .select(col("word"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        expr("(coalesce(n_a, 0L) * 1000000L) div tot_a").as("fp_a"),
        expr("(coalesce(n_b, 0L) * 1000000L) div tot_b").as("fp_b"))
      .withColumn("drift_fp", abs(col("fp_a") - col("fp_b")))
      .orderBy(col("drift_fp").desc, col("word"))
      .limit(k)
  }

  /** Corpus BOILERPLATE gram report: the k word n-grams appearing in
    * the most DOCUMENTS (distinct per doc — [[graft.ops.Dedup
    * .shingles]] dedups within a doc, so the count is true document
    * frequency, immune to one doc repeating its own header 1000×).
    * The survey that tells a curation pipeline WHAT its span-dedup /
    * filter passes are about to remove — navigation chrome, license
    * headers, templated footers — before it removes them.
    *
    * Scale shape: explode → partial-aggregated count (gram-keyed
    * shuffle of 8-byte-ish strings), then a GLOBAL top-k that plans
    * as TakeOrderedAndProject (ExplainSpec-pinned) — each map
    * partition keeps its own k rows, the driver merges #partitions·k,
    * so no full sort of the distinct-gram table ever happens.
    * Deterministic: lexicographic tie-break on the gram. */
  def boilerplateGrams(df: DataFrame, text: Column, n: Int,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.select(explode(graft.ops.Dedup.shingles(text, n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("gram"))
      .limit(k)
  }
}

/** 64-bit polynomial rolling fingerprint: h = h*31 + byte (wrapping).
  * Codegen'd — one pass, no allocation; the hot-path-friendly shape for
  * a 100 TB fingerprint pass. */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  protected override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.RollingHash64.hashUtf8($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}

object RollingHash64 {
  /** called from generated code */
  def hashUtf8(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    h
  }
}
