package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed order statistics for bounded-cardinality numeric
  * columns (lengths, token counts, quantized scores) — the corpus
  * profile every curation run reports (p50/p90/p99 document length),
  * computed EXACTLY and cross-engine-reproducibly. `approx_percentile`
  * exists, but its sketch is engine-specific — useless under a
  * differential oracle and needlessly approximate when the value
  * domain is small.
  *
  * Scale shape: the only corpus-sized pass is a partial-agg'd groupBy
  * on the VALUE — the shuffle carries one row per distinct value per
  * map partition, not one per document. The cumulative window then
  * runs over the distinct-value table on a single partition BY DESIGN:
  * for length-like domains that table is thousands of rows at any
  * corpus size (its cardinality is bounded by the value domain, not
  * the corpus), so a global window there is a no-op at 100 TB while
  * the alternative two-level prefix-sum would add a stage for nothing.
  * The contract is therefore: the value column must be
  * bounded-cardinality (quantize continuous doubles first) — and
  * [[exactQuantiles]] enforces it at runtime via a `maxDistinct` guard
  * rather than trusting prose.
  *
  * Rank arithmetic is integer-exact end to end: permille p selects the
  * smallest v whose cumulative count reaches ceil(p·N/1000) =
  * (p·N + 999) div 1000 — the type-1 (inverse-CDF) empirical quantile.
  * No doubles anywhere, so DuckDB reproduces every row bit-for-bit
  * (p·N + 999 stays in int64 for any corpus below ~9·10¹⁵ rows).
  */
object Stats {

  /** Per-permille exact quantiles of `value` over `df`:
    * (permille, v_at) with v_at = the type-1 empirical quantile.
    * Null values are excluded (no order position).
    *
    * The bounded-cardinality contract is ENFORCED, not prose: the
    * distinct-value count rides the same one-row total aggregate (no
    * extra pass) and the rank expression raises if it exceeds
    * `maxDistinct` — a misuse (pointing this at a raw continuous
    * double column) fails loudly instead of silently becoming a
    * one-reducer sort of the corpus. The guard lives INSIDE the rank
    * column so column pruning cannot optimize it away, and it fires
    * before the single-partition window's input is built (the rank
    * probe and the window feed the same join, but the ~|permilles|-row
    * rank side evaluates first on any plan — and even if reordered,
    * the job dies in the same stage the misuse would poison). */
  def exactQuantiles(df: DataFrame, value: Column,
      permilles: Seq[Int], maxDistinct: Long = 1000000L): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be within [1, 1000]: $permilles")
    require(maxDistinct > 0, s"maxDistinct must be positive: $maxDistinct")
    import df.sparkSession.implicits._
    val counts = df.select(value.cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("c"))
    val cum = counts.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = counts.agg(sum(col("c")).as("n"), count(lit(1)).as("ndv"))
    val ranks = permilles.distinct.toDF("p")
      .crossJoin(broadcast(tot))
      .withColumn("r",
        when(col("ndv") > maxDistinct, raise_error(format_string(
          "exactQuantiles: %s distinct values exceed the bounded-" +
            "cardinality contract (max %s) — quantize the value column " +
            "first", col("ndv"), lit(maxDistinct))).cast("long"))
        .otherwise(expr("(p * n + 999) div 1000")))
      .select(col("p"), col("r"))
    // v_at = min v with cum ≥ r: the rank probe is a ~|permilles|-row
    // broadcast against the distinct-value table — never corpus-sized
    cum.crossJoin(broadcast(ranks))
      .filter(col("cum") >= col("r"))
      .groupBy(col("p"))
      .agg(min(col("v")).as("v_at"))
      .select(col("p").cast("long").as("permille"), col("v_at"))
  }

  /** Quantiles for CONTINUOUS (unbounded-cardinality) columns — the
    * complement of [[exactQuantiles]]'s contract: instead of ASSUMING
    * a bounded value domain, MANUFACTURE one by binning the observed
    * value range into 2^bits equal-width bins, then run the same
    * integer rank machinery over the ≤2^bits-row bin table. Returns,
    * per permille, the bin BRACKET [q_lo, q_hi) containing the type-1
    * quantile — guaranteed error ≤ (max−min)/2^bits, fully
    * deterministic and cross-engine exact (floor over IEEE doubles
    * with a fixed operation order; no engine-specific sketch, unlike
    * `approx_percentile`).
    *
    * Scale shape: two corpus passes (a min/max/count aggregate and a
    * partial-agg'd bin groupBy whose shuffle carries ≤2^bits rows per
    * map partition), then a window over ≤2^bits rows — the bounded
    * cardinality exactQuantiles must assume is manufactured BY
    * CONSTRUCTION here, so no runtime guard is needed. Null and NaN
    * values are excluded (no order position). Degenerate range
    * (max == min) puts everything in bin 0 with a zero-width bracket. */
  def binnedQuantiles(df: DataFrame, value: Column, permilles: Seq[Int],
      bits: Int = 10): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be within [1, 1000]: $permilles")
    require(bits >= 1 && bits <= 20, s"bits must be in [1, 20], got $bits")
    val nb = 1L << bits
    import df.sparkSession.implicits._
    val v = df.select(value.cast("double").as("x"))
      .filter(col("x").isNotNull && !isnan(col("x")))
    val mm = v.agg(min(col("x")).as("mn"), max(col("x")).as("mx"),
      count(lit(1)).as("n"))
    // bin(x) = least(floor((x−mn)/(mx−mn)·2^bits), 2^bits−1); the max
    // value hits exactly 2^bits and clamps into the top bin. The
    // arithmetic order (subtract, divide, multiply, floor) is the
    // oracle's spelling verbatim — IEEE doubles make it bit-exact.
    val binned = v.crossJoin(broadcast(mm))
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col("x") - col("mn")) / (col("mx") - col("mn"))
              * lit(nb.toDouble)).cast("long"),
            lit(nb - 1))))
      .groupBy(col("bin")).agg(count(lit(1)).as("c"))
    val cum = binned.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ranks = permilles.distinct.toDF("p")
      .crossJoin(broadcast(mm))
      .withColumn("r", expr("(p * n + 999) div 1000"))
      .select(col("p"), col("r"), col("mn"), col("mx"))
    cum.crossJoin(broadcast(ranks))
      .filter(col("cum") >= col("r"))
      .groupBy(col("p"), col("mn"), col("mx"))
      .agg(min(col("bin")).as("bin"))
      .select(col("p").cast("long").as("permille"), col("bin"),
        (col("mn") + col("bin").cast("double") * (col("mx") - col("mn"))
          / lit(nb.toDouble)).as("q_lo"),
        (col("mn") + (col("bin") + lit(1L)).cast("double")
          * (col("mx") - col("mn")) / lit(nb.toDouble)).as("q_hi"))
  }

  /** Per-group binned quantiles — [[binnedQuantiles]] with an
    * independent bin RANGE per group (each group's min/max defines its
    * own 2^bits grid, so a group with a narrow value range gets the
    * full resolution instead of inheriting the global spread). Null
    * group keys are a real slice and keep their profile row
    * (null-safe joins, the [[exactQuantilesBy]] stance). Scale: every
    * stage is shuffle-bounded by groups (the min/max aggregate and the
    * (group, bin) counts both partial-aggregate map-side; the
    * cumulative window partitions per group over ≤2^bits rows). */
  def binnedQuantilesBy(df: DataFrame, grpCol: String, value: Column,
      permilles: Seq[Int], bits: Int = 10): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be within [1, 1000]: $permilles")
    require(bits >= 1 && bits <= 20, s"bits must be in [1, 20], got $bits")
    val nb = 1L << bits
    import df.sparkSession.implicits._
    val v = df.select(col(grpCol).as("g"), value.cast("double").as("x"))
      .filter(col("x").isNotNull && !isnan(col("x")))
    val mm = v.groupBy(col("g").as("mg"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"),
        count(lit(1)).as("n"))
    val binned = v.join(mm, col("g") <=> col("mg"))
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col("x") - col("mn")) / (col("mx") - col("mn"))
              * lit(nb.toDouble)).cast("long"),
            lit(nb - 1))))
      .groupBy(col("g"), col("bin")).agg(count(lit(1)).as("c"))
    val cum = binned.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(col("g")).orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ranks = mm.crossJoin(broadcast(permilles.distinct.toDF("p")))
      .withColumn("r", expr("(p * n + 999) div 1000"))
      .select(col("mg"), col("p"), col("r"), col("mn"), col("mx"))
    cum.join(ranks, col("g") <=> col("mg"))
      .filter(col("cum") >= col("r"))
      .groupBy(col("g"), col("p"), col("mn"), col("mx"))
      .agg(min(col("bin")).as("bin"))
      .select(col("g").as(grpCol), col("p").cast("long").as("permille"),
        col("bin"),
        (col("mn") + col("bin").cast("double") * (col("mx") - col("mn"))
          / lit(nb.toDouble)).as("q_lo"),
        (col("mn") + (col("bin") + lit(1L)).cast("double")
          * (col("mx") - col("mn")) / lit(nb.toDouble)).as("q_hi"))
  }

  /** PER-GROUP equal-mass quantile buckets — the CCNet move (Wenzek et
    * al. 2020, public): each language/source gets its own head/middle/
    * tail split of a quality score, so a low-resource language is
    * bucketed against ITS OWN distribution, not drowned by the
    * dominant one. [[quantileBuckets]]' binned machinery with
    * per-group grids ([[binnedQuantilesBy]]) and a group-keyed edges
    * JOIN instead of the driver collect — group count is unbounded at
    * corpus scale, so no per-group driver state exists anywhere.
    * Scale shape: the two binned passes partial-aggregate map-side
    * (shuffles bounded by #groups·2^bits), the edges table is
    * #groups·nBuckets rows, assignment is one group-keyed join + a
    * ≤nBuckets array probe per row. Null/NaN scores dropped; null
    * group keys keep their slice (null-safe joins throughout).
    * @return (grpCol, idCol, bin, bucket), bucket ∈ [1, nBuckets]. */
  def quantileBucketsBy(df: DataFrame, grpCol: String, idCol: String,
      score: Column, nBuckets: Int = 3, bits: Int = 10): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 1000,
      s"nBuckets must lie in [2, 1000], got $nBuckets")
    val nb = 1L << bits
    val permilles = (1 to nBuckets).map(_ * 1000 / nBuckets)
    val edges = binnedQuantilesBy(df, grpCol, score, permilles, bits)
      // bins are monotone in permille, so the sorted bin array IS the
      // permille-ordered edge list (duplicates preserved — the probe
      // counts edge ROWS, matching the global variant's semantics)
      .groupBy(col(grpCol).as("eg"))
      .agg(sort_array(collect_list(col("bin"))).as("ebins"))
    val v = df.select(col(grpCol).as("g"), col(idCol),
        score.cast("double").as("x"))
      .filter(col("x").isNotNull && !isnan(col("x")))
    val mm = v.groupBy(col("g").as("mg"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    v.join(mm, col("g") <=> col("mg"))
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col("x") - col("mn")) / (col("mx") - col("mn"))
              * lit(nb.toDouble)).cast("long"),
            lit(nb - 1))))
      .join(edges, col("g") <=> col("eg"))
      .withColumn("bucket",
        (size(filter(col("ebins"), e => e < col("bin"))) + 1).cast("long"))
      .select(col("g").as(grpCol), col(idCol), col("bin"), col("bucket"))
  }

  /** Quality-threshold sweep — the curation calibration table: bin a
    * quality score into 2^bits equal-width bins ([[binnedQuantiles]]'
    * floor arithmetic verbatim) and report, per non-empty bin, the
    * doc/token volume at that score level PLUS the cumulative volume
    * from the TOP (descending score): "if I keep everything scoring ≥
    * thr_lo, I keep cum_docs docs / cum_tokens tokens". One read of
    * the output picks the cutoff that fits a token budget — the
    * decision [[Pack.selectBudget]] then executes — instead of
    * re-running a filter-count per candidate threshold.
    *
    * Scale shape: one min/max pass + one (bin → count, token-sum)
    * aggregate, both partial-aggregated map-side with a ≤2^bits-row
    * shuffle; the descending cumulative window runs over the ≤2^bits
    * bin rows (bounded by construction, the [[binnedQuantiles]]
    * contract), never the corpus. Null/NaN scores and null token
    * counts are excluded — no order position, no budget weight.
    * @return (bin, thr_lo, n_docs, n_tokens, cum_docs, cum_tokens) */
  def thresholdSweep(df: DataFrame, score: Column, tokens: Column,
      bits: Int = 10): DataFrame = {
    require(bits >= 1 && bits <= 20, s"bits must be in [1, 20], got $bits")
    val nb = 1L << bits
    val binned = scoreBins(df, score, tokens, bits)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("n_tokens"),
        first(col("mn")).as("mn"), first(col("mx")).as("mx"))
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .select(col("bin"),
        (col("mn") + col("bin").cast("double") * (col("mx") - col("mn"))
          / lit(nb.toDouble)).as("thr_lo"),
        col("n_docs"), col("n_tokens"),
        sum(col("n_docs")).over(w).as("cum_docs"),
        sum(col("n_tokens")).over(w).as("cum_tokens"))
  }

  /** [[thresholdSweep]]'s per-row binning, exposed so compositions
    * that pick a cutoff FROM the sweep can re-bin rows with the
    * IDENTICAL arithmetic (re-spelling the floor formula at a call
    * site is how a grid desyncs from its own sweep — the curate-v3
    * lm_score lesson). Carries every input column plus (x, t, bin,
    * mn, mx); null/NaN scores and null token counts are dropped, as
    * in the sweep. */
  def scoreBins(df: DataFrame, score: Column, tokens: Column,
      bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 20, s"bits must be in [1, 20], got $bits")
    val nb = 1L << bits
    val v = df.withColumn("x", score.cast("double"))
      .withColumn("t", tokens.cast("long"))
      .filter(col("x").isNotNull && !isnan(col("x")) && col("t").isNotNull)
    val mm = v.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    v.crossJoin(broadcast(mm))
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col("x") - col("mn")) / (col("mx") - col("mn"))
              * lit(nb.toDouble)).cast("long"),
            lit(nb - 1))))
  }

  /** EQUAL-MASS bucket assignment by a continuous score — the
    * curriculum/stratification primitive: split the corpus into
    * nBuckets quantile buckets (deciles by LM typicality, repetition,
    * quality…) so downstream stages can order, mix, or sample by
    * difficulty tier. Built ON [[binnedQuantiles]]: the bucket edges
    * are the binned type-1 quantile BINS at permilles j·1000/nBuckets,
    * and each doc's bucket is the first edge at or above its own bin —
    * [[scoreBins]]' arithmetic, shared, so the grid cannot desync from
    * its own edges. Equal mass holds to bin granularity (ties inside
    * one 2^bits bin land in one bucket — the usual quantile-tie lump).
    *
    * Scale shape: the edge table is nBuckets rows — collected
    * driver-side BY DESIGN (the Pack shard-offset precedent: a
    * bounded, output-sized collect that turns assignment into a pure
    * broadcast-literal map) — so the corpus pays binnedQuantiles' two
    * partial-agg'd scans plus ONE map-only pass with a ≤1000-element
    * array probe per row; no join, no shuffle in assignment.
    * @return (idCol, bin, bucket) with bucket ∈ [1, nBuckets],
    * null/NaN scores dropped (no order position). */
  def quantileBuckets(df: DataFrame, idCol: String, score: Column,
      nBuckets: Int = 10, bits: Int = 10): DataFrame = {
    // bucket edges round to the nearest permille below (integer
    // division, the quantileBucketsBy spelling) — so ANY nBuckets in
    // [2, 1000] works, including the canonical CCNet head/middle/tail
    // tiers=3; non-divisors just get boundaries within 1‰ of ideal
    require(nBuckets >= 2 && nBuckets <= 1000,
      s"nBuckets must lie in [2, 1000], got $nBuckets")
    val permilles = (1 to nBuckets).map(_ * 1000 / nBuckets)
    val edges = binnedQuantiles(df, score, permilles, bits)
      .orderBy(col("permille"))
      .collect().map(_.getAs[Long]("bin"))
    val arr = array(edges.map(lit(_)): _*)
    scoreBins(df, score, lit(0L), bits)
      .withColumn("bucket",
        (size(filter(arr, e => e < col("bin"))) + 1).cast("long"))
      .select(col(idCol), col("bin"), col("bucket"))
  }

  /** MERGEABLE per-source corpus profile — the fourth member of the
    * incremental-maintenance family (exact dedup, near-dup, ANN
    * ingest, now corpus stats): every field is an algebraic aggregate
    * (count/sum/min/max) or a KMV distinct-content sketch (Bar-Yossef
    * et al. 2002, public: the k smallest distinct hash values of a
    * set; union's sketch = k smallest of the sketches' union), so a
    * 100 TB warehouse profiles each daily shard once and folds
    * profiles with [[mergeProfiles]] — no corpus rescan, ever. The
    * sketch is [[Sketch.KmvAggregator]] over the unsigned
    * Spark-Murmur3 of the text — the same hash chain the Bloom/CMS
    * oracles replay in DuckDB integer SQL, so the sketch itself is
    * fully value-oracle-able, and the integer-floor
    * [[Sketch.kmvEstimate]] reads a distinct-content count off it.
    * (A rank-window + md5 + double-estimator spelling preceded this
    * one; it shuffled the per-source DISTINCT fingerprints where the
    * aggregator shuffles ≤k-long synopses, and its double division
    * could not be value-oracled — superseded and deleted.)
    *
    * Scale shape: ONE partial-aggregated groupBy — the typed KMV
    * aggregate folds alongside the count/sum/min/max in the same
    * ObjectHashAggregate, so each MAP partition emits one stats row +
    * one ≤k-long buffer per source and the shuffle carries synopses,
    * never fingerprints (ExplainSpec pins partial_kmvaggregator below
    * the single exchange). Null text has no content hash (encoded as
    * the aggregator's −1 skip sentinel) and is excluded from the
    * sketch but counted in n_docs; null sources are a real slice and
    * keep their row. @return (srcCol, n_docs, n_tokens, min_tokens,
    * max_tokens, kmv: array<long> ascending, |kmv| ≤ k) */
  def sourceProfile(df: DataFrame, srcCol: String, textCol: String,
      tokens: Column, k: Int = 64): DataFrame = {
    require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")
    val agg = udaf(new KmvAggregator(k),
      org.apache.spark.sql.Encoders.scalaLong)
    df.select(col(srcCol).as("src"),
        when(col(textCol).isNull, lit(-1L))
          .otherwise(Sketch.unsignedHash(col(textCol))).as("h"),
        tokens.cast("long").as("t"))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("n_tokens"),
        min(col("t")).as("min_tokens"), max(col("t")).as("max_tokens"),
        agg(col("h")).as("kmv"))
      .withColumnRenamed("src", srcCol)
  }

  /** Fold per-shard [[sourceProfile]] rows into the profile of the
    * union — sums/mins/maxes re-aggregate, and the merged KMV sketch
    * is the k smallest DISTINCT values across the shards' sketches
    * (the KMV union rule, [[Sketch.KmvMergeAggregator]] — the same
    * merge the in-sketch partial aggregation already runs, so build
    * and fold cannot drift apart). Input is profile-sized, never
    * corpus-sized. Exactness contract (spec-pinned): merge(profile(A),
    * profile(B)) ≡ profile(A ∪ B) for disjoint shards, field for
    * field including the sketch. */
  def mergeProfiles(parts: DataFrame, srcCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")
    val m = udaf(new KmvMergeAggregator(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[Long]]())
    parts.groupBy(col(srcCol))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("min_tokens")).as("min_tokens"),
        max(col("max_tokens")).as("max_tokens"),
        m(col("kmv")).as("kmv"))
  }

  /** Key-SKEW diagnosis report: the k heaviest keys with row counts
    * and exact fixed-point corpus share (ppm) — what an operator reads
    * before choosing salting factors or AQE skew thresholds for a
    * 100 TB join. One partial-agg'd count keyed on the column, a
    * broadcast scalar total, and a global top-k that plans as
    * TakeOrderedAndProject (no full sort of the distinct-key table).
    * Deterministic: ties broken by key. */
  def skewReport(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val counts = df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val tot = counts.agg(sum(col("n_rows")).as("total"))
    counts.crossJoin(broadcast(tot))
      .select(col("key"), col("n_rows"),
        expr("(n_rows * 1000000L) div total").as("share_ppm"))
      .orderBy(col("n_rows").desc, col("key"))
      .limit(k)
  }

  /** Per-group exact quantiles — [[exactQuantiles]] partitioned by a
    * group column (the per-source / per-language length profile).
    * Identical rank arithmetic per group; the cumulative window runs
    * PARTITIONED (one partition per group's distinct values — no
    * global single-partition stage at all here), and the rank probe
    * is a groups×|permilles| frame joined back EQUI on the group, so
    * every stage is shuffle-bounded by distinct (group, value) pairs. */
  def exactQuantilesBy(df: DataFrame, grpCol: String, value: Column,
      permilles: Seq[Int]): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be within [1, 1000]: $permilles")
    import df.sparkSession.implicits._
    val counts = df.select(col(grpCol).as("g"), value.cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
    val cum = counts.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(col("g")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = counts.groupBy("g").agg(sum(col("c")).as("n"))
    val ranks = tot.crossJoin(broadcast(permilles.distinct.toDF("p")))
      .withColumn("r", expr("(p * n + 999) div 1000"))
      .select(col("g").as("rg"), col("p"), col("r"))
    // null-safe group match: a NULL group key (e.g. un-identified
    // language) is a real slice of the corpus and must get a profile
    // row — a plain equi-join would silently drop it while `tot`
    // still counted it
    cum.join(ranks, col("g") <=> col("rg"))
      .filter(col("cum") >= col("r"))
      .groupBy(col("g"), col("p"))
      .agg(min(col("v")).as("v_at"))
      .select(col("g").as(grpCol), col("p").cast("long").as("permille"),
        col("v_at"))
  }

  /** Robust outlier flagging by median absolute deviation — the
    * time-series QC gate a daily ingest needs ("which days' volumes
    * are anomalous"): mean/stddev z-scores are dragged by the very
    * outliers they hunt; the median/MAD pair has a 50% breakdown
    * point (the public Hampel identifier). Integer-exact end to end:
    * both medians come from [[exactQuantiles]]'s type-1 permille-500
    * rank (no interpolation, no doubles), and the flag compares
    * `|x − median| > nMads · MAD` in long arithmetic — so the oracle
    * replays it verbatim.
    *
    * Input contract: `df` is the already-aggregated SERIES (one row
    * per period/entity, value integral) — typically the output of a
    * corpus-sized groupBy, so this operator's own passes (two
    * quantile aggregates + one broadcast-joined projection) run over
    * series-sized data, never the corpus.
    *
    * @return one row per input row: (keyCol, x, med, mad, is_outlier) */
  def madOutliers(df: DataFrame, keyCol: String, value: Column,
      nMads: Int = 3): DataFrame = {
    require(nMads >= 1, s"nMads must be >= 1, got $nMads")
    val x = df.select(col(keyCol), value.cast("long").as("x"))
    val med = exactQuantiles(x, col("x"), Seq(500))
      .select(col("v_at").as("med"))
    val dev = x.crossJoin(broadcast(med))
      .withColumn("adev", abs(col("x") - col("med")))
    val mad = exactQuantiles(dev, col("adev"), Seq(500))
      .select(col("v_at").as("mad"))
    dev.crossJoin(broadcast(mad))
      .select(col(keyCol), col("x"), col("med"), col("mad"),
        (col("adev") > lit(nMads.toLong) * col("mad")).as("is_outlier"))
  }

  /** First-digit Benford QC (Newcomb 1881 / Benford 1938 — the
    * classic fabricated-number audit: organic multiplicative
    * quantities put ~30.1% of first significant digits at 1; uniform
    * or invented data does not): per group, the first-digit histogram
    * of the integer part of |value| and its total-variation distance
    * from the Benford distribution, flagged against `tPermille`.
    *
    * Engine-exact: the first digit is the first character of the
    * integer's decimal string — never log10, whose float rounding
    * flips at exact powers of ten — and the distance check is the
    * integer cross-product form `Σ_d |1000·c_d − b_d·n| ≤ 2·t·n`, with all
    * NINE digits present (absent digits contribute b_d·n through the
    * Benford-literal grid). Values with |value| < 1 carry no first
    * digit under this integer reading and are excluded, as are NULLs;
    * b_d = round(1000·log10(1+1/d)) = 301 176 125 97 79 67 58 51 46 —
    * an exact integer constant, not computed at runtime. Null group
    * keys are a real slice and survive (null-safe grid join).
    *
    * Scale shape: one corpus-sized (group, digit) partial agg; the
    * 9-row Benford literal broadcasts onto the groups frame and
    * everything downstream is groups-sized.
    *
    * @return (groupCols…, n_values, dev, benford_ok) where `dev` is
    *         Σ_d |1000·c_d − b_d·n| — TVD permille = dev/(2n) — and
    *         `benford_ok` ⇔ dev ≤ 2·tPermille·n */
  def benfordQc(df: DataFrame, groupCols: Seq[String], value: Column,
      tPermille: Long): DataFrame = {
    require(groupCols.nonEmpty, "benfordQc: groupCols must be non-empty")
    require(tPermille >= 0 && tPermille <= 1000,
      s"tPermille must be in [0, 1000]: $tPermille")
    val spark0 = df.sparkSession
    import spark0.implicits._
    val benford = Seq((1, 301L), (2, 176L), (3, 125L), (4, 97L),
      (5, 79L), (6, 67L), (7, 58L), (8, 51L), (9, 46L))
      .toDF("_digit", "_b")
    val counts = df
      .select(groupCols.map(col) :+
        floor(abs(value)).cast("long").as("_ip"): _*)
      .filter(col("_ip") >= 1)
      .withColumn("_digit",
        substring(col("_ip").cast("string"), 1, 1).cast("int"))
      .groupBy((groupCols :+ "_digit").map(col): _*)
      .agg(count(lit(1)).as("_c"))
      .localCheckpoint() // consumed by the groups frame AND the grid
    val groups = counts
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("_c")).as("n_values"))
    val cAliased = counts.select(
      groupCols.map(n => col(n).as(s"_g_$n")) :+
        col("_digit").as("_gd") :+ col("_c"): _*)
    groups.crossJoin(broadcast(benford))
      .join(cAliased,
        groupCols.map(n => col(n) <=> col(s"_g_$n"))
          .reduce(_ && _) && col("_digit") === col("_gd"), "left")
      .groupBy(groupCols.map(col): _*)
      .agg(min(col("n_values")).as("n_values"),
        sum(abs(coalesce(col("_c"), lit(0L)) * 1000L -
          col("_b") * col("n_values"))).as("dev"))
      .select(groupCols.map(col) ++ Seq(col("n_values"), col("dev"),
        (col("dev") <= lit(2L * tPermille) * col("n_values"))
          .as("benford_ok")): _*)
  }

  /** Quantile winsorization — clip a feature to its [lo, hi] permille
    * thresholds instead of dropping outlier rows (the standard
    * feature-cleaning transform when the row must survive but its
    * tail value would dominate a mean/σ or a model). Integer-exact:
    * thresholds come from [[exactQuantiles]]'s type-1 permille rank
    * (no interpolation), the clip is `least(greatest(x, lo), hi)` in
    * long arithmetic — the oracle replays it verbatim.
    *
    * Scale shape: one value-keyed partial-agg'd groupBy for the
    * thresholds (the exactQuantiles contract: bounded-cardinality
    * values), then a map-only clip pass with the two thresholds as
    * 1-row broadcasts. NULL values pass through un-clipped (no row is
    * dropped).
    *
    * @return one row per input row: (keyCol, x, x_wins) */
  def winsorize(df: DataFrame, keyCol: String, value: Column,
      loPermille: Int = 50, hiPermille: Int = 950): DataFrame = {
    require(loPermille >= 1 && hiPermille <= 1000 &&
      loPermille < hiPermille,
      s"need 1 <= lo < hi <= 1000: [$loPermille, $hiPermille]")
    val x = df.select(col(keyCol), value.cast("long").as("x"))
    val qs = exactQuantiles(x, col("x"),
      Seq(loPermille, hiPermille)).localCheckpoint() // consumed twice
    val lo = qs.filter(col("permille") === loPermille)
      .select(col("v_at").as("_lo"))
    val hi = qs.filter(col("permille") === hiPermille)
      .select(col("v_at").as("_hi"))
    // LEFT joins, not crossJoins: with an all-NULL (or empty-after-
    // filter) value column exactQuantiles returns NO rows, and a
    // cross join against an empty threshold frame would drop every
    // input row — breaking the "no row dropped" contract. A left join
    // keeps the rows with NULL thresholds, and the only rows that can
    // reach the clip arm with a NULL threshold are NULL-x rows, which
    // the explicit guard below passes through anyway.
    x.join(broadcast(lo), lit(true), "left")
      .join(broadcast(hi), lit(true), "left")
      .select(col(keyCol), col("x"),
        // explicit NULL guard: least/greatest SKIP null arguments (in
        // both engines), which would silently clip a NULL to the low
        // threshold instead of passing it through
        when(col("x").isNull, lit(null).cast("long"))
          .otherwise(least(greatest(col("x"), col("_lo")), col("_hi")))
          .as("x_wins"))
  }
}
