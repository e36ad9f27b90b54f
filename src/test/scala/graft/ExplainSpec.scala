package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.ops.Dedup
import graft.queries.DedupQueries

/** Physical-plan property assertions — the scale contract, enforced.
  * These guard the properties that matter at 100 TB but that no
  * row-level differential test can see: filter/column pushdown into the
  * parquet scan, broadcast choice for dimension joins, and operators
  * that claim to be map-only actually planning without an aggregate
  * exchange. A regression here passes every correctness gate and then
  * falls over on a real cluster.
  */
class ExplainSpec extends AnyFunSuite {
  import TestSession._

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter and projection reach the parquet scan") {
    val df = Tables.df(spark, sf, "lineitem")
      .filter(col("l_partkey") > 100)
      .select(col("l_partkey"), col("l_quantity"))
    val p = plan(df)
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThan(l_partkey,100)"),
      s"filter not pushed to scan:\n$p")
    // pruned read schema: the scan must not fetch the other 14 columns
    val readSchema = p.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_partkey") &&
      readSchema.contains("l_quantity") &&
      !readSchema.contains("l_comment"),
      s"column pruning failed: $readSchema")
  }

  test("dimension join broadcasts the small side") {
    val li = Tables.df(spark, sf, "lineitem")
    val part = Tables.df(spark, sf, "part")
    val joined = li.join(broadcast(part),
      li("l_partkey") === part("p_partkey"))
    assert(plan(joined).contains("BroadcastHashJoin"),
      "part-side broadcast not planned")
  }

  test("sourceProfile folds its KMV sketch MAP-SIDE in the single " +
      "stats aggregate: partial_kmvaggregator below one exchange") {
    // the profile's scale claim: the distinct-content sketch rides
    // the SAME partial-aggregated groupBy as the count/sum/min/max
    // fields, so each map partition emits one <=k-long buffer per
    // source and the shuffle carries synopses, never fingerprints —
    // the kmvSynopsis pin, now holding for the profile too (the
    // superseded rank-window spelling shuffled every distinct
    // fingerprint through a per-source window sort)
    val docs = Tables.df(spark, sf, "documents")
    val p = plan(graft.ops.Stats.sourceProfile(docs, "source", "text",
      size(split(col("text"), " ")), k = 8))
    val lines = p.linesIterator.toSeq
    val partial = lines.indexWhere(
      _.toLowerCase.contains("partial_kmvaggregator"))
    val exchange = lines.indexWhere(_.contains("Exchange"))
    assert(partial >= 0, s"no map-side partial KMV in:\n$p")
    // tree prints top-down: the partial must be BELOW (after) the
    // exchange line, i.e. evaluated before it
    assert(partial > exchange,
      s"partial sketch aggregate not below the shuffle:\n$p")
    assert(lines.count(_.contains("Exchange")) == 1,
      s"more than the one source-key shuffle:\n$p")
    assert(!p.contains("WindowGroupLimit") && !p.contains("Window"),
      s"superseded window spelling resurfaced:\n$p")
  }

  test("rank grid partial-aggregates its cells map-side below ONE " +
      "exchange carrying cells, never values") {
    // the 100 TB contract of the dyadic rank sketch: the 32x per-row
    // explode collapses to <= 16*depth*width cells INSIDE each map
    // partition (partial_count below the exchange), so the only
    // shuffle moves grid cells — the corpus's values never cross the
    // wire, unlike exactQuantiles' distinct-value table
    val ev = Tables.df(spark, sf, "events")
    val p = plan(graft.ops.Sketch.rankGrid(ev, unix_micros(col("ts")),
      graft.queries.RankSketchSql.Depth,
      graft.queries.RankSketchSql.Width))
    val lines = p.linesIterator.toVector
    val partial = lines.indexWhere(_.contains("partial_count"))
    val exchange = lines.indexWhere(_.contains("Exchange"))
    assert(partial >= 0, s"no map-side partial count in:\n$p")
    assert(partial > exchange,
      s"partial cell count not below the shuffle:\n$p")
    assert(lines.count(_.contains("Exchange")) == 1,
      s"grid build must shuffle exactly once (cells only):\n$p")
  }

  test("CMS table partial-aggregates map-side: the token explode " +
      "collapses to cells inside each partition before any shuffle") {
    // same 100 TB contract as the rank grid: the corpus's tokens must
    // never cross the wire raw — the first exchange can only carry
    // (token-count or cell) partial aggregates
    val docs = Tables.df(spark, sf, "documents")
    val p = plan(graft.ops.Sketch.cmsTable(docs, "text",
      graft.queries.CmsSql.Depth, graft.queries.CmsSql.Width))
    val lines = p.linesIterator.toVector
    val partial = lines.indexWhere(_.contains("partial_count"))
    val exchange = lines.lastIndexWhere(_.contains("Exchange"))
    assert(partial >= 0, s"no map-side partial count in:\n$p")
    assert(partial > exchange,
      s"no partial aggregate below the last shuffle:\n$p")
  }

  test("synopsis range filter pushes below the per-day grid build — " +
      "out-of-range days never explode, hash, or shuffle") {
    // the q_cms_range shape: build per-day cells, filter a date
    // range, merge. The range predicate is on a GROUPING column, so
    // Catalyst must push it through the aggregate to the scan side —
    // at 100 TB the pruned work is the corpus-sized explode+hash, and
    // with day-partitioned persisted cells it becomes partition
    // pruning for free.
    val ev = Tables.df(spark, sf, "events")
      .withColumn("_day", to_date(col("ts")))
    val perDay = graft.ops.Sketch.cmsTableBy(ev, "props", "_day",
      graft.queries.CmsSql.Depth, graft.queries.CmsSql.Width)
    val filtered = perDay.filter(
      col("_day") >= lit("2024-01-08").cast("date") &&
        col("_day") < lit("2024-01-22").cast("date"))
    val lines = plan(filtered).linesIterator.toVector
    val filt = lines.indexWhere(l => l.contains("Filter") &&
      l.contains("2024-01-08"))
    val exchange = lines.indexWhere(_.contains("Exchange"))
    assert(filt >= 0, "range filter not found in plan:\n" +
      lines.mkString("\n"))
    assert(exchange >= 0 && filt > exchange,
      "range filter did not push below the cell shuffle (plan lists " +
        "children below parents):\n" + lines.mkString("\n"))
  }

  test("grouped rank grid keeps the single partial-aggregated " +
      "exchange — the group key rides the cell key, no extra shuffle") {
    val ev = Tables.df(spark, sf, "events")
    val p = plan(graft.ops.Sketch.rankGridBy(ev, unix_micros(col("ts")),
      Seq("event_type"), graft.queries.RankSketchSql.Depth,
      graft.queries.RankSketchSql.Width))
    val lines = p.linesIterator.toVector
    val partial = lines.indexWhere(_.contains("partial_count"))
    val exchange = lines.indexWhere(_.contains("Exchange"))
    assert(partial >= 0 && partial > exchange,
      s"grouped grid's partial cell count not below the shuffle:\n$p")
    assert(lines.count(_.contains("Exchange")) == 1,
      s"grouped grid must shuffle exactly once (cells only):\n$p")
  }

  test("boilerplate gram top-k plans as TakeOrderedAndProject, not a " +
      "global sort") {
    // the global top-k must be the partial-per-partition merge, not an
    // all-distinct-grams sort — at corpus scale the distinct-gram
    // table is corpus-sized and a full sort of it is the difference
    // between a report and a job
    val docs = Tables.df(spark, sf, "documents")
    val p = plan(graft.ops.TextAnalysis.boilerplateGrams(
      docs, col("text"), 4, 20))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k not planned as TakeOrderedAndProject:\n$p")
    assert(!p.contains("GlobalLimit"), s"unexpected sort+limit plan:\n$p")
  }

  test("top-paths plans as TakeOrderedAndProject over the path " +
      "counts, with exactly the window and count exchanges") {
    // the path-count table is paths-sized (can be user-sized at long
    // pathLen), so the top-k must be the per-partition merge; total
    // shuffles = the user-keyed window + the path-count agg, nothing
    // else
    val ev = Tables.df(spark, sf, "events")
    val p = plan(graft.ops.Events.topPaths(ev, "user_id", "event_type",
      "ts", "event_id", pathLen = 3, k = 10))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k not planned as TakeOrderedAndProject:\n$p")
    assert(!p.contains("GlobalLimit"), s"unexpected sort+limit plan:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange")) <= 3,
      s"more exchanges than window + count (+AQE read):\n$p")
  }

  test("skew report top-k plans as TakeOrderedAndProject over the " +
      "distinct-key table") {
    // same scale argument as the gram survey: the distinct-key count
    // table can itself be huge (user ids), so the top-k must be the
    // per-partition merge, never a global sort
    val ev = Tables.df(spark, sf, "events")
    val p = plan(graft.ops.Stats.skewReport(ev, col("user_id"), 20))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k not planned as TakeOrderedAndProject:\n$p")
    assert(!p.contains("GlobalLimit"), s"unexpected sort+limit plan:\n$p")
  }

  test("minhash signature plans map-only (no aggregate, one exchange)") {
    val c = DedupQueries.corpus(spark, sf)
    val p = plan(Dedup.minhashSignature(c, "doc_id", "text", 3, 16))
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate") &&
      !p.contains("ObjectHashAggregate"),
      s"signature should be a pure map, found aggregate:\n$p")
    // at most the conditional spread() repartition — no shuffle
    // introduced by the signature computation itself
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"expected ≤1 exchange (spread), got $exchanges")
  }

  test("logs enrich broadcasts the blocks side") {
    val ev = Tables.df(spark, sf, "events")
    val p = plan(graft.enrich.Enrich.logs(
      graft.sources.EvmFixtures.logs(ev),
      graft.sources.EvmFixtures.blocksForLogs(ev)))
    assert(p.contains("BroadcastHashJoin"),
      s"blocks side of logs enrich should broadcast:\n$p")
  }

  test("abi decode survives enforced codegen and matches interpreted eval") {
    // Spark silently drops to interpreted eval when generated Java fails
    // to compile; CODEGEN_ONLY + fallback=false turn that into a hard
    // error, so this test proves AbiDecodeEvent/Call's doGenCode really
    // compiles — and that both paths agree row-for-row.
    def run(): Seq[String] =
      SparkEntry.queries("q_abi_decode_transfer")(spark, sf)
        .collect().map(_.toString).sorted.toSeq
    val conf = spark.conf
    val gen =
      try {
        conf.set("spark.sql.codegen.fallback", "false")
        conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
        run()
      } finally {
        conf.set("spark.sql.codegen.fallback", "true")
        conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    val interp =
      try {
        conf.set("spark.sql.codegen.wholeStage", "false")
        conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        run()
      } finally {
        conf.set("spark.sql.codegen.wholeStage", "true")
        conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    assert(gen.nonEmpty && gen == interp,
      s"codegen vs interpreted decode diverged (${gen.size}/${interp.size})")
  }

  test("brute-force cosine plans the native dot product + broadcast") {
    // (WholeStageCodegen markers only appear in AQE's post-execution
    // final plan; the pre-execution properties that matter are that the
    // small query side broadcasts and the per-pair similarity is the
    // codegen'd dot_product_fold, not an interpreted HOF chain)
    val emb = Tables.df(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val p = plan(
      graft.ops.Similarity.bruteForceTopK(emb, queries, 5))
    assert(p.contains("dot_product_fold"),
      s"native dot product missing from plan:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "query side should broadcast against the corpus")
    assert(!p.contains("aggregate(zip_with"),
      "HOF dot product leaked back into the plan")
  }

  test("LSH bucketing plans literal planes + codegen'd dot, not HOFs") {
    // hyperplane projections must be dot_product_fold against literal
    // plane arrays — the interpreted aggregate(zip_with(...)) per
    // (plane, row) fold is the pattern this replaced (r3 verdict)
    val emb = Tables.df(spark, sf, "embeddings")
    val p = plan(graft.ops.Similarity.lshNearDup(emb, 0.99))
    assert(p.contains("dot_product_fold"),
      s"native dot product missing from LSH plan:\n$p")
    assert(!p.contains("aggregate(zip_with"),
      "interpreted HOF plane projection leaked back into the LSH plan")
  }

  test("simhash + minhash signatures are codegen'd — no CodegenFallback") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import graft.ops.{MinHashArray, SimHash64}
    // the type-level contract: neither expression is a fallback anymore
    val probe = Literal.create(Seq("a", "b"),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))
    assert(!SimHash64(probe).isInstanceOf[CodegenFallback],
      "SimHash64 regressed to CodegenFallback")
    assert(!MinHashArray(probe, 16).isInstanceOf[CodegenFallback],
      "MinHashArray regressed to CodegenFallback")
    // the generated code actually calls the static helpers (a Janino
    // resolution failure would silently fall back to interpreted mode —
    // codegen.fallback=false turns that into a hard error instead)
    val docs = Tables.df(spark, sf, "documents").limit(100)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    // AQE wraps exchange-bearing plans in AdaptiveSparkPlanExec, whose
    // WSCG subtrees only exist after execution — inspect the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val sim = docs.select(Dedup.simhash(col("text")).as("sig"))
      val simCg = org.apache.spark.sql.execution.debug
        .codegenString(sim.queryExecution.executedPlan)
      assert(simCg.contains("SimHash64.compute"),
        s"generated code does not call SimHash64.compute:\n" +
          simCg.linesIterator.take(30).mkString("\n"))
      // the minhash PROJECT can never enter a WSCG subtree — its input
      // is the HOF shingle expression (transform/sequence), which is
      // CodegenFallback by Spark design — so assert at the expression
      // level: MinHashArray's own generated code is a direct static
      // call, not a references[i].eval() fallback round-trip
      val ctx = new org.apache.spark.sql.catalyst.expressions.codegen
        .CodegenContext
      val mhCode = MinHashArray(probe, 16).genCode(ctx).code.toString
      assert(mhCode.contains("MinHashArray.compute"),
        s"MinHashArray codegen is not a static call:\n$mhCode")
      assert(!mhCode.contains(".eval("),
        s"MinHashArray codegen routes through interpreted eval:\n$mhCode")
      val mh = Dedup.minhashSignature(docs, "doc_id", "text", n = 3, k = 16)
      // and the compiled path produces real values end-to-end
      val sigs = sim.collect().map(_.getLong(0))
      assert(sigs.length == 100 && sigs.distinct.length > 1)
      assert(mh.collect().forall(r =>
        r.isNullAt(1) || r.getSeq[Long](1).length == 16))
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("parse decode filter leads with the bucket prune (short-circuit)") {
    import graft.parse.{ContractCatalog, ParseRunner}
    import graft.queries.ParseQueries
    assume(new java.io.File(ParseQueries.CorpusDir).exists())
    val transfer = ParseRunner
      .tasks(ContractCatalog.fromDirectory(ParseQueries.CorpusDir))
      .find(_.tableName == "common.erc20_evt_Transfer").get
    // enriched logs carrying the writer's bucket column: the decode
    // filter must evaluate the cheap int bucket compare BEFORE the
    // topics string compare — codegen's And short-circuits left to
    // right, and on derived inputs the topics column can be an
    // expensive computed expression (the r9 parse-slice finding);
    // on a partitioned warehouse the leading conjunct is also the
    // one that folds against partition values
    def pad64(c: org.apache.spark.sql.Column) =
      concat(lit("0x"), lpad(lower(hex(c)), 64, "0"))
    // id-derived columns: an all-literal fixture constant-folds the
    // decode to null and the optimizer collapses the whole plan to an
    // empty LocalRelation before any filter exists to inspect
    val logs = spark.range(10).select(
      array(lit(transfer.event.get.topic0), pad64(col("id")),
        pad64(col("id"))).as("topics_arr"),
      unhex(lpad(hex(col("id")), 64, "0")).as("unhex_data"),
      concat(lit("0xa"), col("id").cast("string")).as("address"),
      concat(lit("0xt"), col("id").cast("string")).as("transaction_hash"),
      col("id").as("log_index"),
      col("id").as("block_number"),
      (col("id") % 10).cast("int").as("selector_hash"))
    // assert on the ANALYZED plan: it shows the conjunct order ParseJob
    // constructs (Catalyst preserves And order through pushdown — it
    // substitutes, it does not reorder), while the optimized plan of a
    // synthetic fixture can legitimately simplify the topics compare
    // away entirely (constant array extraction)
    val p = transfer.dataFrame(logs, logs.limit(0))
      .queryExecution.analyzed.toString
    val filterLine = p.linesIterator
      .find(l => l.contains("Filter") && l.contains("selector_hash"))
      .getOrElse("")
    assert(filterLine.nonEmpty, s"bucket prune conjunct missing:\n$p")
    val bucketPos = filterLine.indexOf("selector_hash")
    val topicsPos = filterLine.indexOf("topics_arr")
    assert(topicsPos >= 0, s"topics compare missing from:\n$filterLine")
    assert(bucketPos < topicsPos,
      s"bucket prune must lead the topics compare for short-circuit:\n" +
        filterLine)
  }

  test("decontamination probes a broadcast gram set — no corpus shuffle") {
    val docs = Tables.df(spark, sf, "documents")
    val p = plan(graft.ops.Decontaminate.flag(
      docs.filter(col("doc_id") % 7 =!= 0),
      docs.filter(col("doc_id") % 7 === 0),
      "doc_id", "text", n = 4))
    assert(p.contains("BroadcastHashJoin") &&
      p.contains("LeftSemi"),
      s"gram probe should be a broadcast semi join:\n$p")
    // the graded variant keeps the same shape: broadcast semi probe,
    // and no exchange of the full corpus text (the denominator is a
    // map-side size(shingles) — only hit grams aggregate)
    val ps = plan(graft.ops.Decontaminate.overlapScore(
      docs.filter(col("doc_id") % 7 =!= 0),
      docs.filter(col("doc_id") % 7 === 0),
      "doc_id", "text", n = 4))
    assert(ps.contains("BroadcastHashJoin") && ps.contains("LeftSemi"),
      s"overlap probe should be a broadcast semi join:\n$ps")
  }

  test("sequence pack plans shard-partitioned windows, never a global one") {
    val docs = Tables.df(spark, sf, "documents")
    val p = plan(
      graft.ops.Pack.sequencePack(docs, "doc_id", "n_chars", 2048L, 4))
    // the failure mode this operator exists to avoid: a Window with no
    // partition spec drags the whole corpus through one task
    val windows = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty, s"no window in pack plan:\n$p")
    windows.foreach { l =>
      assert(l.contains("shard"),
        s"global (unpartitioned) window in pack plan: $l")
    }
  }

  test("PQ encode broadcasts the codebook and folds dots in codegen") {
    val emb = Tables.df(spark, sf, "embeddings")
    val qs = emb.filter(col("vec_id") % 50 === 0)
    // release=false: the production path localCheckpoints the result
    // (plans as Scan ExistingRDD); the lazy twin exposes the real plan
    val p = plan(graft.ops.Similarity.pqTopK(emb, qs, 5, release = false))
    // the m*ksub-exploded encode pass is PQ's dominant cost at corpus
    // scale: its centroid side must broadcast (corpus never shuffles
    // for the join) and its distance score must be the codegen'd
    // dot_product_fold, not an interpreted lambda
    assert(p.contains("BroadcastHashJoin"),
      s"codebook join is not broadcast:\n$p")
    assert(p.contains("dot_product_fold"),
      s"encode distance lost the codegen'd dot product:\n$p")
    assert(p.contains("partial_min(struct(d2"),
      s"encode winner lost its map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"unexpected cartesian product (ADC scan should be a broadcast " +
        s"cross of the tiny LUT side only — BroadcastNestedLoopJoin):\n$p")
  }

  test("IVF×PQ prunes the ADC scan through an equi-join on the cell id") {
    val emb = Tables.df(spark, sf, "embeddings")
    val qs = emb.filter(col("vec_id") % 50 === 0)
    val p = plan(graft.ops.Similarity.ivfPqTopK(emb, qs, 5,
      release = false))
    // the composition point: pqTopK's broadcast-LUT × codes cross
    // product must be REPLACED by the probes ⋈ cells equi-join on
    // c_id — no cartesian/nested-loop may remain except the
    // broadcast-centroid assignment crosses
    assert(p.linesIterator.exists(l => l.contains("BroadcastHashJoin")
      && l.contains("c_id")),
      s"ADC scan is not pruned by an equi-join on the cell id:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"cartesian product leaked into IVF×PQ:\n$p")
    // cell assignment must partial-aggregate map-side (no per-vector
    // window sort of the |corpus|·#centroids intermediate)
    assert(p.contains("partial_min(struct(ns"),
      s"cell assignment lost its map-side combine:\n$p")
    assert(p.contains("dot_product_fold"),
      s"encode distance lost the codegen'd dot product:\n$p")
  }

  test("semDedup assigns cells with a map-side combine and joins pairs " +
      "on the cell id — no cartesian anywhere") {
    val emb = Tables.df(spark, sf, "embeddings")
    val p = plan(graft.ops.Similarity.semDedupPairs(
      emb, 0.95, 50, "vec_id", "embedding", checkpoint = false))
    // the |corpus|·#centroids assignment intermediate must collapse
    // through a partial min(struct(ns, c_id)) BEFORE its exchange —
    // losing the combine shuffles #centroids× more rows at 100 TB
    assert(p.contains("partial_min(struct(ns"),
      s"cell assignment lost its map-side combine:\n$p")
    // the pair stage must be an equi-join KEYED on the cell id (the
    // Σ|cell|² bound); a cartesian/nested-loop means the key
    // degenerated. At spec scale the cells side is broadcastable so
    // Spark may rightly pick BroadcastHashJoin — accept any hash-join
    // whose keys lead with c_id (at corpus scale AQE falls back to the
    // shuffled form of the SAME equi-join).
    assert(p.linesIterator.exists(l =>
      (l.contains("BroadcastHashJoin [c_id") ||
        l.contains("SortMergeJoin [c_id") ||
        l.contains("ShuffledHashJoin [c_id") ||
        l.contains("Exchange hashpartitioning(c_id"))),
      s"no cell-id-keyed equi-join for the pair stage:\n$p")
    // the only permitted non-equi joins are the broadcast-centroid
    // assignment crosses (BroadcastNestedLoopJoin vs the small
    // broadcast side — the ivfTopK stance); a CartesianProduct means
    // two large sides met without a key
    assert(!p.contains("CartesianProduct"),
      s"cartesian product leaked into semDedup:\n$p")
    assert(p.contains("dot_product_fold"),
      s"pair cosine lost the codegen'd dot product:\n$p")
  }

  test("semDedup hierarchical assignment: the corpus×centroids nested " +
      "loop is gone — only the ∜n super slice broadcasts, candidates " +
      "arrive through an s_id equi-join") {
    val emb = Tables.df(spark, sf, "embeddings")
    val p = plan(graft.ops.Similarity.semDedupPairs(
      emb, 0.95, 50, "vec_id", "embedding", checkpoint = false))
    // under #centroids ≈ √n the flat broadcast grows ~1 GB per
    // executor and the nested-loop compute term is n^1.5; the
    // hierarchical plan may nested-loop ONLY against the super slice
    // (stride 50·8 = 400) — every BroadcastNestedLoopJoin's broadcast
    // build subtree must carry the 400-stride filter, never the bare
    // 50-stride centroid slice (which may appear only as a STREAM
    // side of the routing cross). The lazy inspection tree replicates
    // the assignment DAG under the pair self-join, so we check every
    // replica structurally instead of counting occurrences.
    val crosses = bnljBroadcastSubtrees(p)
    assert(crosses.nonEmpty, s"no routing crosses found:\n$p")
    crosses.foreach { sub =>
      assert(sub.exists(_.contains(", 400)")),
        s"a nested-loop broadcast build is not the super slice:\n" +
          sub.mkString("\n") + s"\n\nfull plan:\n$p")
      assert(!sub.exists(l => l.contains(", 50)") && !l.contains(", 400)")),
        s"the √n centroid slice leaked into a nested-loop broadcast:\n" +
          sub.mkString("\n"))
    }
    // the candidate scan is KEYED on the routed super id — an
    // equi-join, so the √n centroid side stays partitioned instead of
    // broadcast (at spec scale Spark may rightly hash-broadcast it;
    // at corpus scale AQE shuffles the SAME equi-join)
    assert(p.linesIterator.exists(l =>
      l.contains("SortMergeJoin [s_id") ||
        l.contains("ShuffledHashJoin [s_id") ||
        l.contains("BroadcastHashJoin [s_id") ||
        l.contains("Exchange hashpartitioning(s_id")),
      s"no s_id-keyed equi-join for the candidate scan:\n$p")
    // both per-vector argmins (super routing, candidate scan) must
    // keep their map-side combine (struct fields render as
    // name-expr pairs: partial_min(struct(ns, ns#…, s_id, s_id#…)))
    assert(p.linesIterator.exists(l =>
      l.contains("partial_min(struct(ns") && l.contains("s_id, s_id")),
      s"the super-routing argmin lost its map-side combine:\n$p")
    assert(p.linesIterator.exists(l =>
      l.contains("partial_min(struct(ns") && l.contains("c_id, c_id")),
      s"the candidate-scan argmin lost its map-side combine:\n$p")
    // the flat formulation stays reachable for parity — and shows the
    // exact shape the hierarchy removes: its nested-loop broadcast IS
    // the 50-stride centroid slice (also proves the subtree parser
    // actually sees build-side filters)
    val pf = plan(graft.ops.Similarity.semDedupPairs(
      emb, 0.95, 50, "vec_id", "embedding", checkpoint = false,
      superFactor = 0))
    val flatCrosses = bnljBroadcastSubtrees(pf)
    assert(flatCrosses.nonEmpty &&
      flatCrosses.forall(_.exists(_.contains(", 50)"))),
      s"flat formulation lost its centroid-broadcast cross:\n$pf")
  }

  test("incremental dedup probes the stored bucketed index with NO " +
      "Exchange on the index side — the 100 TB ingest contract") {
    import graft.write.IndexStore
    val docs = Tables.df(spark, sf, "documents")
      .select("doc_id", "text").filter(col("text").isNotNull)
    val seen = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    IndexStore.writeFingerprints(
      seen.select(md5(col("text").cast("binary")).as("text_md5")),
      "graft_spec_fp_idx", 8)
    IndexStore.writeBands(
      Dedup.lshBands(Dedup.minhashSignature(seen, "doc_id", "text", 3, 16),
        16, 4),
      "graft_spec_band_idx", 8)
    // forbid broadcast so the spec pins the SHUFFLED join form — at
    // corpus scale the index side is never broadcastable, and the
    // whole point is that its bucketed layout replaces the shuffle
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // exact-dedup ingest: the anti join's index side must stream
      // from the bucketed scan with no intervening Exchange
      val pe = plan(Dedup.incrementalExact(batch,
        IndexStore.read(spark, "graft_spec_fp_idx"), "doc_id", "text"))
      assertBucketedProbe(pe, "fingerprint")
      // near-dup ingest: same property for the band-key probe join
      // (incrementalNearDup delegates its index join to exactly this
      // candidate stage)
      val pb = plan(Dedup.incrementalNearDupCandidates(batch,
        IndexStore.read(spark, "graft_spec_band_idx"), "doc_id", "text"))
      assertBucketedProbe(pb, "band")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS graft_spec_fp_idx")
      spark.sql("DROP TABLE IF EXISTS graft_spec_band_idx")
    }
  }

  test("quality filters are map-only: no Exchange anywhere in the plan") {
    // the whole point of running Gopher/C4 BEFORE dedup at 100 TB is
    // that they execute at scan speed; one accidental aggregate or
    // join in their plan silently turns the cheap gate into a shuffle
    import graft.ops.Quality
    val ml = Tables.df(spark, sf, "documents")
      .select(col("doc_id"), col("text").as("mtext"))
    Seq(
      "gopherRules" -> plan(Quality.gopherRules(ml, "doc_id", "mtext")),
      "c4LineFilter" -> plan(Quality.c4LineFilter(ml, "doc_id", "mtext")),
      "gopherKeep gate" ->
        plan(ml.filter(Quality.gopherKeep(col("mtext")))),
      "repetitionRules" ->
        plan(Quality.repetitionRules(ml, "doc_id", "mtext")),
      "wordlistFlag" ->
        plan(Quality.wordlistFlag(ml, "doc_id", "mtext", Seq("x")))
    ).foreach { case (what, p) =>
      assert(!p.contains("Exchange"), s"$what gained a shuffle:\n$p")
      // and inside whole-stage codegen (executedPlan marks codegen'd
      // nodes with the "*(id)" prefix), not interpreted eval
      assert(p.contains("*("), s"$what fell out of codegen:\n$p")
    }
  }

  test("k-center assignment is map-only: literal-folded centers, no " +
      "join, no corpus shuffle, inside codegen") {
    import graft.ops.Similarity
    val emb = Tables.df(spark, sf, "embeddings")
    val sel = Similarity.kCenterSelect(emb, 3)
    val p = plan(Similarity.kCenterAssign(emb, sel))
    assert(!p.contains("Exchange"),
      s"kCenterAssign gained a corpus shuffle:\n$p")
    assert(!p.contains("Join"), s"kCenterAssign gained a join:\n$p")
    assert(p.contains("*("), s"kCenterAssign fell out of codegen:\n$p")
  }

  test("co-located bucketed join: ZERO exchanges when both sides " +
      "share the bucket spec") {
    import graft.write.IndexStore
    val ev = Tables.df(spark, sf, "events")
      .select("event_id", "user_id", "value")
    val users = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_ev"))
    IndexStore.writeBucketed(ev.repartition(8, col("user_id")),
      "graft_spec_ev_b", 8, Seq("user_id"))
    IndexStore.writeBucketed(users.repartition(8, col("user_id")),
      "graft_spec_usr_b", 8, Seq("user_id"))
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = IndexStore.read(spark, "graft_spec_ev_b")
        .join(IndexStore.read(spark, "graft_spec_usr_b"), "user_id")
      val p = plan(j)
      assert(p.linesIterator.count(_.contains("Bucketed: true")) === 2,
        s"both scans must report their bucket layout:\n$p")
      assert(!p.contains("Exchange"),
        s"co-located bucketed join must be exchange-FREE on both " +
          s"sides:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS graft_spec_ev_b")
      spark.sql("DROP TABLE IF EXISTS graft_spec_usr_b")
    }
  }

  /** Assert the plan reads a bucketed index scan and that NO Exchange
    * sits on the ancestor path from that scan up to the join above it
    * — i.e. the on-disk bucket layout satisfied the join's
    * distribution requirement and only the batch side shuffles. */
  private def assertBucketedProbe(p: String, what: String): Unit = {
    val lines = p.linesIterator.toIndexedSeq
    def depth(l: String): Int =
      math.max(l.indexOf("+- "), l.indexOf(":- "))
    val scanIdx = lines.indexWhere(_.contains("Bucketed: true"))
    assert(scanIdx >= 0,
      s"$what index scan lost its bucketed layout (autoBucketedScan " +
        s"disabled, or the bucket spec never reached the catalog):\n$p")
    // walk the ancestor chain from the scan to the first join node
    var d = depth(lines(scanIdx))
    var i = scanIdx - 1
    var joinSeen = false
    while (i >= 0 && !joinSeen) {
      val di = depth(lines(i))
      if (di >= 0 && di < d) {
        val l = lines(i)
        if (l.contains("Join")) joinSeen = true
        else assert(!l.contains("Exchange"),
          s"Exchange on the $what-index side of the probe join — the " +
            s"bucket layout did not satisfy the join distribution:\n$p")
        d = di
      }
      i -= 1
    }
    assert(joinSeen, s"no join found above the $what index scan:\n$p")
  }

  /** For each BroadcastNestedLoopJoin in a `toString` physical plan,
    * the lines of its broadcast build's subtree (the BroadcastExchange
    * under the join, by tree-drawing indentation). */
  private def bnljBroadcastSubtrees(p: String): Seq[Seq[String]] = {
    val lines = p.linesIterator.toIndexedSeq
    def depth(l: String): Int =
      math.max(l.indexOf("+- "), l.indexOf(":- "))
    def subtree(start: Int): Seq[String] = {
      val d = depth(lines(start))
      val buf = scala.collection.mutable.Buffer(lines(start))
      var i = start + 1
      while (i < lines.length && depth(lines(i)) > d) {
        buf += lines(i); i += 1
      }
      buf.toSeq
    }
    for {
      (l, i) <- lines.zipWithIndex
      if l.contains("BroadcastNestedLoopJoin")
      sub = subtree(i)
      bx = sub.indexWhere(_.contains("BroadcastExchange"))
      if bx >= 0
    } yield subtree(i + bx)
  }

  test("temperatureMixture broadcasts the threshold table; every " +
      "exchange belongs to the tiny per-source side") {
    val docs = Tables.df(spark, sf, "documents")
    val p = plan(graft.ops.Sampling.temperatureMixture(
      docs, "doc_id", "source", 2))
    // the corpus keeps docs via a broadcast join against the
    // ~|sources|-row threshold table — map-only on the corpus side
    assert(p.contains("BroadcastHashJoin"),
      s"threshold table not broadcast:\n$p")
    // a broadcast join needs no probe-side exchange by construction;
    // the only way the corpus could shuffle here is a shuffled join
    // form (the threshold subtree's tiny count-agg exchanges remain,
    // keyed on the pre-alias source column)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus-side shuffled join leaked into temperatureMixture:\n$p")
  }

  test("unit dedup combines map-side and shuffles fingerprints, not text") {
    val docs = Tables.df(spark, sf, "documents")
    val p = plan(Dedup.unitDedup(docs, "doc_id", "text"))
    // winner selection must partial-aggregate BEFORE the unit-hash
    // exchange — without map-side combine the shuffle carries one row
    // per unit OCCURRENCE instead of one per distinct unit hash per
    // partition, a corpus-sized difference at 100 TB
    assert(p.contains("partial_min(okey"),
      s"winner agg lost its map-side combine:\n$p")
    // the winner shuffle is keyed on the xxhash64 fingerprint
    assert(p.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning(uh")),
      s"no fingerprint-keyed exchange in unitDedup plan:\n$p")
    // everything is an equi-join/agg — a nested-loop anywhere here
    // means the join keys degenerated
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join leaked into unitDedup plan:\n$p")
  }

  test("span dedup rolls hashes in codegen, combines map-side, equi-joins") {
    val docs = Tables.df(spark, sf, "documents")
    val sd = graft.ops.Dedup.spanDedup(docs, "doc_id", "text", 8)
    val p0 = plan(sd)
    // the fingerprint pass must be the O(n) rolling expression, not a
    // per-window re-hash of gram strings
    assert(p0.contains("rolling_window_hash"),
      s"span dedup lost the rolling-hash fingerprint pass:\n$p0")
    // winner selection must partial-aggregate BEFORE the gram shuffle
    // (the shuffle then carries one row per distinct gram per map
    // partition, not one per window)
    assert(p0.contains("partial_min(struct(did"),
      s"span winner lost its map-side combine:\n$p0")
    assert(!p0.contains("CartesianProduct") &&
      !p0.contains("BroadcastNestedLoopJoin"),
      s"non-equi join leaked into span dedup:\n$p0")
  }

  test("budget selection plans shard-partitioned windows (global) and " +
      "source-partitioned windows (per-source) — never unpartitioned") {
    val docs = Tables.df(spark, sf, "documents")
    val feats = graft.ops.TextAnalysis.qualityFeatures(docs, col("text"))
      .select(col("doc_id"), col("source"),
        col("n_words").cast("long").as("toks"), col("stop_ratio"))
    val pg = plan(graft.ops.Pack.selectUnderBudget(
      feats, "doc_id", "toks", "stop_ratio", 1300L, 4))
    val wg = pg.linesIterator.filter(_.contains("Window [")).toSeq
    assert(wg.nonEmpty, s"no window in budget plan:\n$pg")
    wg.foreach(l => assert(l.contains("shard"),
      s"global (unpartitioned) window in budget plan: $l"))
    val ps = plan(graft.ops.Pack.selectUnderBudgetBySource(
      feats, "doc_id", "toks", "stop_ratio", "source", 700L))
    val ws = ps.linesIterator.filter(_.contains("Window [")).toSeq
    assert(ws.nonEmpty && ws.forall(_.contains("source")),
      s"per-source window not partitioned by source:\n$ps")
  }

  test("DSIR broadcasts the target LM count tables; corpus counts " +
      "partial-aggregate") {
    val docs = Tables.df(spark, sf, "documents")
    val p = plan(graft.ops.TextAnalysis.dsirResample(
      docs.filter(col("doc_id") % 7 =!= 0),
      docs.filter(col("doc_id") % 7 === 0),
      "doc_id", "text", -10000L, 12000L))
    // target-side joins must be broadcast (benchmark-sized by
    // definition); the corpus-side count aggregates must partial
    assert(p.contains("BroadcastHashJoin"),
      s"no broadcast join in DSIR plan:\n$p")
    assert(p.contains("partial_count"),
      s"no partial-aggregated bigram count in DSIR plan:\n$p")
    // the sampler is a projection over the score frame — pmod(hash)
    // compiles into the final Project, not a separate stage. (The
    // plan's only SinglePartition exchanges are the two 1-row vocab
    // scalar aggregates — corpus-sized data never passes one.)
    assert(p.contains("pmod(hash(doc_id"),
      s"sampler not a projection in DSIR plan:\n$p")
  }

  test("ivfPq batch encode broadcasts both frozen quantizer frames") {
    val emb = Tables.df(spark, sf, "embeddings")
    val p = plan(graft.ops.Similarity.ivfPqEncodeBatch(
      emb.filter(col("vec_id") % 7 === 3),
      emb.filter(col("vec_id") % 7 =!= 3), release = false))
    val bcasts = p.linesIterator
      .count(l => l.contains("BroadcastNestedLoopJoin") ||
        l.contains("BroadcastHashJoin"))
    assert(bcasts >= 2,
      s"expected centroid + codebook broadcasts, got $bcasts:\n$p")
    assert(p.contains("partial_min") || p.contains("HashAggregate"),
      s"argmin not partial-aggregated:\n$p")
  }

  test("curation v3 materializes its composition boundaries") {
    // the v3 chain re-executes its upstream DAGs multiplicatively
    // without boundary materialization: lm is consumed twice (total
    // agg + per-doc join) and unitDedup consumes its input twice, so
    // the two-wordcount LM pipeline ran ~4-6x per invocation
    // (measured 8.4 s vs 2 s at sf0.1). The final plan can't show
    // this (pack localCheckpoints its input), so assert the stage
    // frames were checkpointed: each must plan as a materialized-RDD
    // scan, not its full lineage.
    val (lm, gated, _) = graft.queries.PackQueries.curateV3(spark, sf)
    assert(plan(lm).contains("Scan ExistingRDD"),
      s"lm stage lost its boundary checkpoint:\n${plan(lm)}")
    assert(plan(gated).contains("Scan ExistingRDD"),
      s"gated stage lost its boundary checkpoint:\n${plan(gated)}")
  }

  test("exact quantiles: corpus-sized pass is the value groupBy only") {
    val docs = Tables.df(spark, sf, "documents")
    val p = plan(graft.ops.Stats.exactQuantiles(docs,
      length(col("text")), Seq(500, 900)))
    // the corpus shuffle must be keyed on the VALUE with a map-side
    // partial count — one row per distinct value per partition
    assert(p.contains("partial_count"),
      s"value count lost its map-side combine:\n$p")
    // the rank probe must broadcast — a shuffle join against the
    // distinct-value table would key on nothing useful. The plan holds
    // TWO non-equi joins (the tot cross inside ranks, the outer
    // probe), so also forbid CartesianProduct outright: a regression
    // of EITHER to a non-broadcast join fails here even though the
    // other still prints BroadcastNestedLoopJoin
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"rank probe is not a broadcast cross join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"non-broadcast cartesian leaked into the quantile plan:\n$p")
  }

  private def joinCount(p: String): Int =
    "SortMergeJoin".r.findAllIn(p).size +
      "ShuffledHashJoin".r.findAllIn(p).size +
      "BroadcastHashJoin".r.findAllIn(p).size

  test("scd2Merge plans exactly ONE join (branch legs explode from " +
      "it, they don't re-plan it)") {
    import spark.implicits._
    // the naive spelling — three filtered projections of the joined
    // frame, unioned — planned the full-outer join (and the dim scan
    // under it) three times with zero exchange reuse; at warehouse
    // scale that triples the dominant cost
    val cur = Seq(("A", "s1", "2024-01-01",
        null.asInstanceOf[String], true))
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val upd = Seq(("A", "s2")).toDF("k", "attr")
    val p = plan(graft.ops.Scd.scd2Merge(cur, upd, "k", Seq("attr"),
      "2024-02-01"))
    assert(joinCount(p) == 1, s"expected exactly 1 join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), s"non-equi join leaked:\n$p")
  }

  test("pointInTime is one equi-join on the key — the interval " +
      "predicate rides along, it never becomes a range-join explosion") {
    import spark.implicits._
    val dim = Seq(("A", "v1", "2024-01-01",
        null.asInstanceOf[String], true))
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val facts = Seq((1L, "A", "2024-02-01")).toDF("fid", "ck", "d")
    val p = plan(graft.ops.Scd.pointInTime(facts, dim, "ck", "d", "k",
      Seq("attr")))
    assert(joinCount(p) == 1, s"expected exactly 1 equi join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"),
      s"interval predicate became a non-equi join:\n$p")
  }

  test("fuzzyJoin d=1 plans an equi join with NO Levenshtein — the " +
      "positional predicate is the whole verify") {
    val cust = Tables.df(spark, sf, "customer")
    val clean = cust.select(col("c_custkey").as("cid"),
      col("c_name").as("cn"))
    val dirty = cust.select((col("c_custkey") + 99L).as("did"),
      col("c_name").as("dn"))
    val p = plan(graft.ops.Linkage.fuzzyJoin(clean, dirty, "cid", "cn",
      "did", "dn", maxEdit = 1))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"),
      s"blocking degenerated to a non-equi join:\n$p")
    assert(!p.toLowerCase.contains("levenshtein"),
      s"d=1 path should verify positionally, not via the DP:\n$p")
  }
}

/** Plan pins for the round-14 analytics family: the scale claims each
  * operator's scaladoc makes, asserted against the physical plan. */
class AnalyticsExplainSpec extends AnyFunSuite {
  import TestSession._

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def ev = Tables.df(spark, sf, "events")

  test("kmvSynopsis partial-aggregates the bounded buffer MAP-SIDE: " +
      "partial_kmvaggregator sits below the single exchange") {
    val p = plan(graft.ops.Sketch.kmvSynopsis(ev, "user_id", 64,
      Seq("event_type")))
    val lines = p.linesIterator.toSeq
    val partial = lines.indexWhere(_.contains("partial_kmvaggregator"))
    val exchange = lines.indexWhere(_.contains("Exchange"))
    assert(partial >= 0, s"no map-side partial in:\n$p")
    // tree prints top-down: the partial must be BELOW (after) the
    // exchange line, i.e. evaluated before it
    assert(partial > exchange,
      s"partial aggregate not below the shuffle:\n$p")
    assert(lines.count(_.contains("Exchange")) == 1,
      s"more than the one group-key shuffle:\n$p")
  }

  test("transitionMatrix shuffles the corpus exactly once (on the " +
      "user key); every later exchange is matrix-sized") {
    val p = plan(graft.ops.Events.transitionMatrix(ev, "user_id",
      "event_type", "ts", "event_id"))
    val corpusShuffles = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(_u"))
    assert(corpusShuffles == 1,
      s"expected exactly one user-key shuffle:\n$p")
  }

  test("retentionMatrix prunes both scans to (ts, user_id) and " +
      "partial-aggregates the first-event min map-side") {
    val p = plan(graft.ops.Events.retentionMatrix(ev, "user_id", "ts"))
    val schemas = p.linesIterator
      .filter(_.contains("ReadSchema")).toSeq
    assert(schemas.nonEmpty && schemas.forall(s =>
      s.contains("ts:timestamp") && s.contains("user_id:bigint") &&
        !s.contains("props") && !s.contains("event_type")),
      s"scan not pruned to the two needed columns:\n$p")
    assert(p.contains("partial_min"),
      s"first-event agg not map-side combined:\n$p")
  }

  test("rollingActive: both dedups partial-aggregate map-side and the " +
      "offset fan-out is a constant-folded explode between them") {
    val p = plan(graft.ops.Events.rollingActive(ev, "user_id", "ts"))
    assert(p.contains("Generate explode"),
      s"offset fan-out missing:\n$p")
    val lines = p.linesIterator.toSeq
    // each Exchange must sit directly above a keys-only HashAggregate
    // (the map-side partial of the distinct) or a partial_count
    val exchanges = lines.zipWithIndex
      .filter(_._1.contains("Exchange")).map(_._2)
    assert(exchanges.size == 3, s"expected 3 exchanges:\n$p")
    exchanges.foreach { i =>
      val below = lines.drop(i + 1).take(2).mkString
      assert(below.contains("HashAggregate"),
        s"exchange at line $i not fed by a partial aggregate:\n$p")
    }
  }
}
