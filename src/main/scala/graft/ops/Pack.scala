package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly: documents are laid out
  * in a global deterministic order and cut into fixed token-budget
  * packs — `pack_id = (exclusive running token total) div budget`, the
  * shard-then-split shape used to feed tokenized corpora into
  * fixed-length training windows.
  *
  * The semantics look sequential (a global running sum), and the naive
  * Spark spelling — `Window.orderBy(id)` with no partition key — drags
  * the whole corpus through ONE task. This implementation is the
  * distributed prefix sum instead:
  *
  *   1. shard boundaries from id quantiles, baked into the plan as
  *      LITERALS — shard is a pure function of id, so every recompute
  *      sees identical shards (no reliance on physical partition ids,
  *      which can resample under retry);
  *   2. partition-local exclusive cumsum, window PARTITIONED by shard —
  *      parallel, no global collapse;
  *   3. per-shard totals (one tiny row per shard) → exclusive shard
  *      offsets, broadcast back as a literal map.
  *
  * Driver traffic is O(#shards) longs, not O(n). Shards are contiguous
  * id ranges, so `offset(shard) + local exclusive cumsum` equals the
  * global exclusive cumsum however approximate the quantile boundaries
  * are — boundary quality only affects balance, never the result.
  */
object Pack {

  /** @param idCol    unique numeric document id (the pack order)
    * @param tokensCol per-doc token count (null → 0)
    * @param budget   tokens per pack (> 0)
    * @param shards   target shard count; defaults to session parallelism
    * @return (idCol, tokens, pack_id) — pack_id is 0-based, monotone in
    *         id order */
  def sequencePack(docs: DataFrame, idCol: String, tokensCol: String,
      budget: Long, shards: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val n = if (shards > 0) shards
      else docs.sparkSession.sparkContext.defaultParallelism
    // materialize once: the quantile probe, the shard-totals collect and
    // the final cumsum would otherwise each re-evaluate the ENTIRE
    // upstream plan (3× a curation chain in q_curate_corpus), and a
    // non-deterministic input would desync the broadcast offsets from
    // the final pass. localCheckpoint blocks are context-cleaned once
    // the result goes unreachable (same pattern as Dedup.jaccardPairs).
    val base = docs.select(col(idCol),
      coalesce(col(tokensCol).cast("long"), lit(0L)).as("tokens"))
      .localCheckpoint()
    // literal range boundaries: shard = #(bounds strictly below id)
    val probs = (1 until n).map(_.toDouble / n).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double] // single shard
      else base.select(col(idCol).cast("double").as("q"))
        .stat.approxQuantile("q", probs, 0.001).distinct
    val shard = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(idCol).cast("double") > lit(b), 1).otherwise(0)
    }
    val sharded = base.withColumn("shard", shard)
    val totals = sharded.groupBy("shard").agg(sum("tokens").as("total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] = totals
      .scanLeft(0 -> 0L) { case ((_, acc), (s, t)) => s -> (acc + t) }
      .init.zip(totals)
      .map { case ((_, before), (s, _)) => s -> before }.toMap
    val local = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    sharded
      .withColumn("cum_excl",
        coalesce(sum("tokens").over(local), lit(0L)) +
          coalesce(element_at(typedLit(offsets), col("shard")), lit(0L)))
      .select(col(idCol), col("tokens"),
        expr(s"cum_excl div $budget").as("pack_id"))
  }

  /** Token-budget corpus selection: spend a global token budget on the
    * highest-scoring documents — rank the corpus by (score desc, id),
    * keep the maximal prefix whose token sum fits the budget. The
    * "choose the best B tokens" step between quality scoring and
    * packing in a curation pipeline.
    *
    * Same distributed prefix-sum discipline as [[sequencePack]], with
    * the shard key lifted from id to the SCORE (quantile boundaries on
    * score, shard 0 = highest): score-contiguous shards + shard-local
    * exclusive cumsum + broadcast O(#shards) offsets reproduce the
    * global running total with no global window and no single-reducer
    * sort. Equal scores share a shard, so shard contiguity in the
    * (score desc, id) total order is exact regardless of boundary
    * quality — boundaries only affect balance (an all-equal-score
    * corpus degrades to one shard, the documented worst case, same as
    * [[sequencePack]] under a constant id).
    *
    * Selection is by INCLUSIVE prefix sum ≤ budget: a doc whose tokens
    * alone exceed the budget is never kept, and the kept set is exactly
    * the longest affordable prefix — no partial docs. Docs with a null
    * score carry no ranking evidence and are excluded up front (the
    * [[graft.ops.TextAnalysis.dsirResample]] no-evidence contract, not
    * silently ranked last — cross-engine null-ordering divergence is
    * the other reason). Null tokens count 0 (selectable, free). */
  def selectUnderBudget(docs: DataFrame, idCol: String, tokensCol: String,
      scoreCol: String, budget: Long, shards: Int = 0): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val n = if (shards > 0) shards
      else docs.sparkSession.sparkContext.defaultParallelism
    // materialize once: quantile probe + totals collect + final pass
    // would each re-run the upstream plan otherwise (and a non-
    // deterministic score would desync offsets from the final pass);
    // the returned frame derives from this checkpoint, so release is
    // by context-clean when unreachable (the sequencePack pattern)
    val base = docs.select(col(idCol),
        coalesce(col(tokensCol).cast("long"), lit(0L)).as("tokens"),
        col(scoreCol).cast("double").as("score"))
      .filter(col("score").isNotNull)
      .localCheckpoint()
    val probs = (1 until n).map(_.toDouble / n).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else base.stat.approxQuantile("score", probs, 0.001).distinct
    // shard = #(bounds strictly above score): shard 0 holds the top
    // scores, ids ascend as scores descend — offsets accumulate in
    // exactly the selection order
    val shard = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("score") < lit(b), 1).otherwise(0)
    }
    val sharded = base.withColumn("shard", shard)
    val totals = sharded.groupBy("shard").agg(sum("tokens").as("total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] = totals
      .scanLeft(0 -> 0L) { case ((_, acc), (s, t)) => s -> (acc + t) }
      .init.zip(totals)
      .map { case ((_, before), (s, _)) => s -> before }.toMap
    val local = Window.partitionBy("shard")
      .orderBy(col("score").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    sharded
      .withColumn("cum_tokens",
        coalesce(sum("tokens").over(local), lit(0L)) +
          coalesce(element_at(typedLit(offsets), col("shard")), lit(0L)) +
          col("tokens"))
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col("tokens"), col("score"), col("cum_tokens"))
  }

  /** Per-source variant: each source spends its own budget — windows
    * partition by source, so every source ranks in parallel and no
    * global structure exists at all. The per-source running total is
    * exact (ROWS frame over the unique (score desc, id) order). */
  def selectUnderBudgetBySource(docs: DataFrame, idCol: String,
      tokensCol: String, scoreCol: String, srcCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val w = Window.partitionBy(col(srcCol))
      .orderBy(col("score").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), col(srcCol),
        coalesce(col(tokensCol).cast("long"), lit(0L)).as("tokens"),
        col(scoreCol).cast("double").as("score"))
      .filter(col("score").isNotNull)
      .withColumn("cum_tokens", sum("tokens").over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Reference spelling — the single-task global window. Only for
    * oracle twins at test scale; never point it at a corpus. */
  def sequencePackGlobal(docs: DataFrame, idCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    val w = Window.orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), coalesce(col(tokensCol).cast("long"), lit(0L))
        .as("tokens"))
      .withColumn("cum_excl", coalesce(sum("tokens").over(w), lit(0L)))
      .select(col(idCol), col("tokens"),
        expr(s"cum_excl div $budget").as("pack_id"))
  }

  /** Tokens-per-pack audit: every pack's size stays within one max-doc
    * of the budget (except possibly the last). */
  def packSizes(packed: DataFrame): DataFrame =
    packed.groupBy("pack_id")
      .agg(count(lit(1)).as("docs"), sum("tokens").as("tokens"))

  /** Split each document into fixed-size character windows with overlap
    * — the long-document → context-window preprocessing step. Chunk i
    * covers characters [i·stride, i·stride + maxChars), stride =
    * maxChars − overlap; the last chunk may be short, and a doc never
    * yields a chunk that starts past its end. Pure per-row map
    * (sequence → substr → posexplode): no shuffle, no state, embarrass-
    * ingly parallel at any corpus size. Null/empty docs yield no chunks.
    *
    * Chunk count is exact integer arithmetic
    * (`(len − maxChars + stride − 1) div stride + 1`), so any engine
    * reproduces the identical chunking. */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
      maxChars: Int, overlap: Int = 0): DataFrame = {
    require(maxChars > 0, s"maxChars must be positive, got $maxChars")
    require(overlap >= 0 && overlap < maxChars,
      s"overlap must be in [0, maxChars), got $overlap")
    val stride = maxChars - overlap
    val len = length(col(textCol))
    // floor division via floor(double) — exact below 2^53, i.e. any
    // real document length; avoids splicing the column name into a SQL
    // string (which would break on names needing backticks)
    val nChunks = when(len.isNull || len === 0, lit(0L))
      .when(len <= maxChars, lit(1L))
      .otherwise(floor((len - maxChars + (stride - 1)).cast("double") /
        lit(stride.toDouble)).cast("long") + lit(1L))
    // sequence(0, -1) would count DOWN — empty docs need an empty array
    val idxs = when(nChunks === 0, array().cast("array<bigint>"))
      .otherwise(sequence(lit(0L), nChunks - 1))
    docs
      .select(col(idCol),
        posexplode(transform(idxs,
          i => col(textCol).substr(
            (i * stride + 1).cast("int"), lit(maxChars)))))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        col("col").as("chunk"))
  }
}

/** Deterministic training-mixture sampling: keep each document with a
  * per-source probability, decided by a pure-arithmetic hash of the id
  * (three Lehmer/MINSTD rounds: `x → x * 48271 % p`, p = 2^31-1, seeded
  * with `id % p`) — no RNG state, so the sample is reproducible across
  * runs, engines, and cluster layouts, and any slice of the corpus can
  * be resampled independently (the property that matters when 100 TB is
  * sampled shard by shard). Three rounds because one is not a hash for
  * dense ids (`id * 48271` is monotone and tiny for small ids); three
  * steps wrap the domain enough that consecutive ids land far apart.
  *
  * KNOW THE LIMIT: k Lehmer rounds COMPOSE to one multiply
  * (×48271ᵏ mod p) — the map stays affine, so outputs of consecutive
  * seeds differ by a constant mod p. That is perfectly fine here
  * (sampling/ordering needs only scalar equidistribution, which an
  * affine map of uniform seeds gives exactly) but it is NOT a vector
  * hash: using it to generate correlated families of values — e.g.
  * LSH hyperplane components — produces arithmetic-progression
  * "randomness" whose structure shows (measured in round 10: sawtooth
  * planes skewed buckets 7.5× and spilled a ramp cell past the disk).
  * For such uses interleave xor-shift steps between the multiplies —
  * see [[graft.ops.Similarity.planeComponent]].
  *
  * Cross-engine exact: integer arithmetic only, and each intermediate
  * product stays below 2^48 so it can never overflow a 64-bit long
  * (Spark 4 runs ANSI mode by default — a Knuth 2^32 multiplicative
  * hash WOULD overflow-throw on billion-scale ids).
  */
object Sampling {

  val Mod: Long = 2147483647L // 2^31 - 1 (prime)

  /** uniform in [1, 2^31-1) from an integer id — the identical SQL
    * spelling works in any engine:
    * `((((((id % (p-1) + 1) * 48271) % p) * 48271) % p) * 48271) % p`.
    * The seed is remapped into [1, p-1] (the MINSTD domain): 0 is the
    * generator's fixed point (0*48271 % p == 0), so an unmapped id ≡ 0
    * mod p would hash to 0 forever and be sampled with probability 1
    * under ANY positive weight. */
  def hashU31(id: Column): Column = {
    val step = (x: Column) => pmod(x * lit(48271L), lit(Mod))
    step(step(step(pmod(id.cast("long"), lit(Mod - 1)) + lit(1L))))
  }

  /** Temperature-flattened source mixing (the public XLM-R/mT5
    * multinomial recipe): resample so corpus shares follow
    * q_s ∝ (n_s/N)^α — α < 1 flattens the source distribution,
    * boosting low-resource sources relative to dominant ones.
    *
    * Cross-engine exactness drives two design choices:
    *  - α = 1/2^halvings, computed by REPEATED sqrt: IEEE-754 requires
    *    sqrt to be correctly rounded (pow is not), so both engines
    *    produce bit-identical weights. halvings 1..6 covers the
    *    practical α range [1/64, 1/2] (mT5 uses α≈0.3; 0.25 = 2
    *    halvings is the nearest exact rung).
    *  - no floating-point SUM anywhere: the usual Σw_s normalization
    *    cancels out of the acceptance rate, which only needs
    *    rate_s = w_s/n_s scaled by max_t(rate_t) — and max over
    *    doubles is order-free where a double sum is not.
    * Acceptance: keep doc iff hashU31(id) < floor(rate_s/max·(2³¹−1)).
    * The most-boosted (smallest) source keeps everything; downsampling
    * only — compose with [[epochRepeat]] when a source must repeat.
    * Scale: one partial-agg'd source count, a ~|sources|-row broadcast
    * threshold table, one map-side hash filter — no corpus shuffle. */
  def temperatureMixture(df: DataFrame, idCol: String, sourceCol: String,
      halvings: Int): DataFrame = {
    require(halvings >= 1 && halvings <= 6,
      s"halvings must be in [1, 6] (alpha = 1/2^h), got $halvings")
    // ONE corpus pass for the counts: the ~|sources|-row result is
    // checkpointed, so the four consumers below (tot, rates via mx and
    // thr) derive from it instead of re-scanning the corpus each
    val c = df.groupBy(col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("__ns"))
      .localCheckpoint()
    val tot = c.agg(sum(col("__ns")).as("__n")) // integer sum — exact
    val w = (0 until halvings).foldLeft(
      col("__ns").cast("double") / col("__n").cast("double"))((e, _) => sqrt(e))
    val rates = c.crossJoin(broadcast(tot))
      .withColumn("__rate", w / col("__ns").cast("double"))
    val mx = rates.agg(max(col("__rate")).as("__m"))
    // materialize the tiny threshold table eagerly, then release the
    // count checkpoint (containmentPairs' result-then-release
    // discipline — even a small block should not outlive its use)
    val thr = rates.crossJoin(broadcast(mx))
      .select(col("__src"),
        floor(col("__rate") / col("__m") * lit(2147483647.0))
          .cast("long").as("__thr"))
      .localCheckpoint()
    graft.core.Checkpoints.release(c)
    df.join(broadcast(thr), col(sourceCol) === col("__src"))
      .filter(hashU31(col(idCol)) < col("__thr"))
      .drop("__src", "__thr")
  }

  /** Deterministic train/val/test split labels: permille thresholds
    * over the 3-round Lehmer hash of the id — reproducible across
    * engines, runs and cluster sizes (no RNG, no `randomSplit`, whose
    * assignment depends on partitioning), and STABLE under corpus
    * growth: a doc's split never changes when other docs arrive — the
    * property eval hygiene needs (a doc must never migrate from val
    * into train between corpus snapshots, or the eval set leaks).
    * Map-only: one hash per row, no shuffle, no state. */
  def assignSplit(df: DataFrame, idCol: String, valPermille: Int,
      testPermille: Int): DataFrame = {
    require(valPermille >= 0 && testPermille >= 0 &&
      valPermille + testPermille <= 1000,
      s"val+test permilles must fit in [0, 1000]: $valPermille + $testPermille")
    val slot = pmod(hashU31(col(idCol)), lit(1000L))
    df.withColumn("split",
      when(slot < valPermille, lit("val"))
        .when(slot < valPermille + testPermille, lit("test"))
        .otherwise(lit("train")))
  }

  /** @param weights source value → keep probability in [0,1]; sources
    *                absent from the map are dropped */
  def weightedBySource(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w <= 1),
      "weights must be probabilities")
    // threshold per source, pre-scaled to the hash domain so the
    // comparison stays integral
    val thresholds = weights.map { case (s, w) =>
      s -> math.round(w * Mod.toDouble)
    }
    df.filter(hashU31(col(idCol)) <
      coalesce(element_at(typedLit(thresholds), col(sourceCol)), lit(0L)))
  }

  /** Exactly k documents per stratum, chosen by deterministic hash
    * order (the 3-round Lehmer hash is a bijection on [0, p) per round,
    * so the order is a fixed pseudorandom permutation — no RNG, no
    * ties below p). One shuffle: the window partitions by stratum, and
    * strata rank in parallel — nothing global. */
  def stratifiedK(df: DataFrame, idCol: String, groupCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol)
      .orderBy(hashU31(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Mixture weights above 1 mean EPOCHS: w = 2.5 emits every doc
    * twice plus a third copy for the hash-selected half — the standard
    * up-weighting of small high-quality sources in a training mixture,
    * done by deterministic repetition instead of RNG draws. Appends an
    * `epoch` column (0-based copy index); docs from sources absent in
    * the map (or with a weight rounding to zero copies) are dropped.
    * Pure per-row map: no shuffle at any corpus size. */
  def epochRepeat(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(_ >= 0), "weights must be >= 0")
    val whole = weights.map { case (s, w) =>
      s -> math.floor(w).toLong }
    val fracThresh = weights.map { case (s, w) =>
      s -> math.round((w - math.floor(w)) * Mod.toDouble) }
    val n = coalesce(element_at(typedLit(whole), col(sourceCol)), lit(0L)) +
      when(hashU31(col(idCol)) <
        coalesce(element_at(typedLit(fracThresh), col(sourceCol)), lit(0L)),
        lit(1L)).otherwise(lit(0L))
    // sequence(0, -1) would count DOWN — zero-copy docs need [] to drop
    val epochs = when(n <= 0, array().cast("array<bigint>"))
      .otherwise(sequence(lit(0L), n - 1))
    df.withColumn("epoch", explode(epochs))
  }

  /** Deterministic global TRAINING ORDER with no global sort: each doc
    * routes to `shard = hash % shards`, a shard-partitioned row_number
    * orders within the shard by the same hash (id tie-break, though
    * the 3-round hash is tie-free below 2³¹−1), and the global
    * position interleaves shards round-robin:
    * `global_pos = (rn − 1) · shards + shard`. Positions are unique,
    * and streaming them ascending visits shards round-robin in
    * per-shard hash order — the pseudorandom document order LM
    * training wants — while the only exchange is the hash partition
    * on `shard`. No stage ever sees a single global partition, which
    * is the scale failure of `orderBy(rand())`: one reducer sorting
    * the whole corpus (and rand() isn't reproducible across retries —
    * a recomputed task would deal a different order mid-job). Unequal
    * shard sizes leave gaps in the tail of the position space:
    * positions are ordinal, not contiguous. At corpus scale, write
    * partitioned by `shard` and the trainer gets file-level read
    * parallelism for free; re-keying an epoch is a different
    * `shards` count or a pre-hashed id offset, not a reshuffle of
    * 100 TB of text. */
  def trainingOrder(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__shard"))
      .orderBy(col("__h"), col(idCol))
    df.withColumn("__h", hashU31(col(idCol)))
      .withColumn("__shard", pmod(col("__h"), lit(shards.toLong)))
      .withColumn("global_pos",
        (row_number().over(w) - 1).cast("long") * shards + col("__shard"))
      .withColumn("shard", col("__shard").cast("int"))
      .drop("__h", "__shard")
  }

  /** Deterministic EXACT-k corpus sample: the k rows with the
    * smallest [[hashU31]] of their id (ties impossible below 2³¹−1,
    * id tie-break anyway) — the debug/eval sample you can re-draw
    * identically on any engine or any day, unlike `TABLESAMPLE` /
    * `rand()`. Plans as TakeOrderedAndProject: each map partition
    * keeps k rows, the driver merges #partitions·k — no global sort,
    * no single-reducer stage, which is what makes "give me 1000
    * random-looking docs" safe against a 100 TB table. */
  def sampleK(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.withColumn("__h", hashU31(col(idCol)))
      .orderBy(col("__h"), col(idCol))
      .limit(k)
      .drop("__h")
  }

  /** UniMax sampling (Chung et al. 2023, public: "UniMax: Fairer and
    * More Effective Language Sampling") — the budget allocator that
    * replaced temperature mixing for mT5-class corpora: given a total
    * doc budget and a per-source epoch CAP, walk sources smallest
    * first, granting each min(cap·n_s, fair share of the remaining
    * budget over the remaining sources). Small sources get their full
    * capped mass (never starved, never over-repeated); what they
    * leave unused flows to the larger sources — fairer than any
    * single temperature exponent, with repetition bounded by
    * construction.
    *
    * Deterministic end to end: ascending (count, source) walk with
    * floor division for the fair share, full epochs = alloc/n_s per
    * doc, and the alloc%n_s partial-epoch extras go to the docs with
    * the smallest (hashU31, id) — the [[sampleK]] draw — so the whole
    * allocation AND the materialized per-doc copy counts replay in
    * SQL (`q_sample_unimax`, the allocation walk as a recursive CTE).
    *
    * Scale shape: one partial-agg'd source count collected at
    * ~|sources| rows (bounded — the Pack shard-offset budget), the
    * allocation walk on the driver over that, a broadcast threshold
    * table, and ONE source-keyed exchange for the partial-epoch rank
    * (only the rank needs it; the full-epoch copies are decided
    * map-side from the broadcast row). Docs with zero copies are
    * dropped from the output.
    *
    * @return (idCol, sourceCol, n_copies ≥ 1) */
  def unimaxSample(df: DataFrame, idCol: String, sourceCol: String,
      budget: Long, maxEpochs: Int): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    // bounded collect: one row per source, ordered by the column's
    // NATIVE ordering so the walk matches the SQL replay for any
    // source type
    val counts = df.groupBy(col(sourceCol).cast("string").as("__src"))
      .agg(count(lit(1)).as("__n"))
      .orderBy(col("__n"), col("__src"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var remB = budget
    var remS = counts.length
    val thr = counts.map { case (s, n) =>
      val fair = remB / remS
      val a = math.min(maxEpochs.toLong * n, fair)
      remB -= a
      remS -= 1
      (s, a / n, a % n)
    }
    val thrDf = broadcast(thr.toSeq.toDF("__src", "__full", "__extra"))
    val w = Window.partitionBy(col("__src"))
      .orderBy(hashU31(col(idCol)), col(idCol))
    df.withColumn("__src", col(sourceCol).cast("string"))
      .join(thrDf, Seq("__src"))
      .withColumn("__rk", row_number().over(w))
      .withColumn("n_copies",
        col("__full") + when(col("__rk") <= col("__extra"), 1L)
          .otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col(idCol), col(sourceCol),
        col("n_copies").cast("long").as("n_copies"))
  }

  /** CURRICULUM ordering: documents stream tier-by-tier (equal-mass
    * score quantile tiers via [[graft.ops.Stats.quantileBuckets]] —
    * tier 1 = lowest scores first), pseudorandomly shuffled WITHIN
    * each tier by the [[trainingOrder]] shard/hash discipline. The
    * composition every curriculum-learning recipe needs (Bengio et
    * al. 2009): easy→hard macro order, decorrelated micro order.
    *
    * `curriculum_pos` is globally unique and tier-monotone: positions
    * of tier t all precede positions of tier t+1. Tier offsets come
    * from a BOUNDED #tiers-row collect (the Pack shard-offset
    * pattern) of per-tier max position + 1 — ordinal gaps from
    * unequal shards are preserved, not compacted, so the offset is a
    * pure broadcast-literal map and no global sort or corpus-wide
    * window ever runs. Scale shape: quantile tiers are two
    * partial-agg'd scans + a map-only probe; the within-tier shuffle
    * is one (tier, shard)-keyed exchange. */
  def curriculumOrder(df: DataFrame, idCol: String, score: Column,
      tiers: Int, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    import org.apache.spark.sql.expressions.Window
    val tiered = graft.ops.Stats.quantileBuckets(df, idCol, score,
        nBuckets = tiers)
      .select(col(idCol), col("bucket").as("tier"))
    val w = Window.partitionBy(col("tier"), col("__shard"))
      .orderBy(col("__h"), col(idCol))
    val tp = tiered.withColumn("__h", hashU31(col(idCol)))
      .withColumn("__shard", pmod(col("__h"), lit(shards.toLong)))
      .withColumn("tier_pos",
        (row_number().over(w) - 1).cast("long") * shards + col("__shard"))
    // bounded: one row per tier
    val sizes = tp.groupBy("tier").agg(max(col("tier_pos")).as("mx"))
      .orderBy("tier").collect()
    var acc = 0L
    val offsets = sizes.map { r =>
      val o = acc; acc += r.getAs[Long]("mx") + 1
      r.getAs[Long]("tier") -> o
    }.toMap
    val offExpr = offsets.foldLeft(lit(0L)) { case (e, (t, o)) =>
      when(col("tier") === t, lit(o)).otherwise(e)
    }
    tp.select(col(idCol), col("tier"),
      col("__shard").cast("int").as("shard"), col("tier_pos"),
      (offExpr + col("tier_pos")).as("curriculum_pos"))
  }
}
