package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.ops.{Dedup, Similarity}
import graft.parse.{ContractCatalog, ParseRunner}

/** Measured scale-ramp harness behind `SCALE.md` (round-4 verdict #7 /
  * round-7 verdict #2): runs the dedup/ANN candidate generators on 4×,
  * 16× and 64× replicas of the `documents`/`embeddings` tables and fits
  * the wall-time growth exponent, turning the "bucketed, therefore
  * ~linear" plan-shape argument into an empirical number. The ramp
  * starts at 4× rather than 1× because at 1× the fixed per-job cost
  * (~1–2 s of scheduling/codegen on this box) swamps the operator and
  * the fitted exponent measures overhead, not scaling (SCALE.md).
  *
  * Replication is DISTINCT-corpus replication, not duplication: copy k
  * prefixes every token with `z{k}` (so every token n-gram shingle
  * differs across copies) and multiplies every embedding by a
  * copy-specific ±1 sign pattern — an orthogonal transform, so every
  * INTRA-copy cosine is preserved bit-structure-exactly while
  * cross-copy pairs decorrelate (a uniform additive shift instead
  * drives all of a copy's vectors toward the all-ones direction and
  * manufactures millions of fake near-dup pairs — measured, not
  * hypothesized). That keeps the true duplicate structure per unit of
  * corpus constant — exact duplication instead would grow every
  * duplicate cluster by the replication factor and the PAIR OUTPUT
  * quadratically, measuring the data change rather than the operator.
  *
  * Each replica is materialized to parquet and read back before the
  * clock starts, so input synthesis is not timed and scans see a
  * realistic multi-file layout. Usage:
  * `sbt "runMain graft.ScaleRamp"` with `SPARK_GRAFT_SF_DIR` (defaults
  * to sf0.1); prints the SCALE.md markdown rows on stdout.
  */
object ScaleRamp {

  private def timeIt(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = f
    ((System.nanoTime() - t0) / 1e9, n)
  }

  /** Least-squares slope of log(t) over log(k) — the growth exponent:
    * 1.0 = linear, 2.0 = quadratic. */
  private def exponent(points: Seq[(Int, Double)]): Double = {
    val xs = points.map(p => math.log(p._1.toDouble))
    val ys = points.map(p => math.log(p._2))
    val n = xs.size.toDouble
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val varx = xs.map(x => (x - mx) * (x - mx)).sum
    cov / varx
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
        .getOrElse(Runtime.getRuntime.availableProcessors()))
    val out = java.nio.file.Files.createTempDirectory("graft_scale").toString
    // replicas are multi-hundred-MB at 64x — reclaim them on exit
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.core.Fs.deleteRecursively(new java.io.File(out))))

    val docs0 = Tables.df(spark, sfDir, "documents").select("doc_id", "text")
    val emb0 = Tables.df(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")

    /** k distinct-corpus replicas, materialized once + read back. */
    val docCache = scala.collection.mutable.Map.empty[Int, DataFrame]
    def docsAt(k: Int): DataFrame = docCache.getOrElseUpdate(k, {
      val path = s"$out/docs_x$k"
      (0 until k).map { i =>
        docs0.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          (if (i == 0) col("text")
           // prefix EVERY token of copy i with z{i}: all shingles
           // (n-grams over tokens) become copy-local, so no cross-copy
           // near-dups exist and output volume scales with k
           else regexp_replace(col("text"), " ", s" z$i")).as("text"))
      }.reduce(_ unionAll _).write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    })
    val embCache = scala.collection.mutable.Map.empty[Int, DataFrame]
    def embAt(k: Int): DataFrame = embCache.getOrElseUpdate(k, {
      val path = s"$out/emb_x$k"
      (0 until k).map { i =>
        emb0.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          (if (i == 0) col("embedding")
           // copy-specific deterministic ±1 sign per component: an
           // orthogonal transform — intra-copy cosines unchanged,
           // cross-copy pairs decorrelated
           else transform(col("embedding"), (x, idx) =>
             x * (pmod(xxhash64(lit(i), idx), lit(2)) * 2 - 1)
               .cast("float"))).as("embedding"))
      }.reduce(_ unionAll _).write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    })

    // vocab-ramp fixture (round 19): corpus tokens CONSTANT, distinct
    // words ×~50k — every word suffixed with its doc's (doc_id mod
    // 50k) tag, so the word histogram grows while the corpus pass
    // does not. Materialized like the other replicas so the timed
    // cells only read parquet.
    val vocabCache = scala.collection.mutable.Map.empty[Int, DataFrame]
    def vocabDocsAt(k: Int): DataFrame = vocabCache.getOrElseUpdate(k, {
      val path = s"$out/vocab_x$k"
      docs0.withColumn("text",
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1x"), pmod(col("doc_id"), lit(50L * k)))))
        .write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    })

    // tail-vocab fixture (round 19): the PRODUCTION-TAIL shape the
    // incremental trainer face exists for — vocab grows ×k via junk
    // words from a DISJOINT alphabet (uppercase base-36, hash-mixed
    // digits so no junk pair accumulates count; the natural corpus is
    // lowercase), so the argmax stays in the natural corpus and the
    // AFFECTED set is bounded while the vocabulary ramps.
    val tailVocabCache = scala.collection.mutable.Map.empty[Int, DataFrame]
    def tailVocabDocsAt(k: Int): DataFrame =
      tailVocabCache.getOrElseUpdate(k, {
        val path = s"$out/tailvocab_x$k"
        val junk = spark.range(1550L * k).select(
          lpad(conv(pmod(col("id") * 2654435761L + 99991L,
              lit(2821109907456L)).cast("string"), 10, 36),
            8, "0").as("text"))
        docs0.select(col("text")).unionByName(junk)
          .write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      })

    // ---- event-stream ramp input (round 14): 8 events per doc with
    // user_id = doc_id % (500·k), so the USER population ramps with
    // the corpus while events-per-user stays constant at 80 — the
    // shape a growing product has. Types and µs-timestamps derive
    // from Knuth/prime mixes of (doc_id, i): deterministic, spread
    // over a 30-day window.
    val evCache = scala.collection.mutable.Map.empty[Int, DataFrame]
    def eventsAt(k: Int): DataFrame = evCache.getOrElseUpdate(k, {
      val path = s"$out/events_x$k"
      docsAt(k).select(col("doc_id"),
          explode(sequence(lit(0), lit(7))).as("i"))
        .select(
          pmod(col("doc_id"), lit(500L * k)).as("user_id"),
          element_at(
            array(lit("view"), lit("click"), lit("purchase"),
              lit("error"), lit("signup")),
            (pmod(col("doc_id") * 31 + col("i") * 7, lit(5)) + 1)
              .cast("int")).as("etype"),
          expr("""timestamp_micros((doc_id * 2654435761L + i * 7919L)
                    % 2592000000000L)""").as("ts"))
        .write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    })

    // ---- parse-stage ramp input (round-8 verdict #7): an enriched
    // chain-day of logs built from lineitem (the q_parse_corpus_slice
    // fixture shape, incl. the writer's bucket columns and a dt so the
    // partitioned-write path is exercised), replicated k× with shifted
    // block/tx ids so decode-matching volume scales with k. Width is
    // FIXED at 8 event elements (2 that decode rows, 6 that prune to
    // empty) — the ramp measures data growth through ParseRunner.run's
    // cache + FAIR-pool fan-out at constant task width.
    lazy val parseFixture: (Seq[graft.parse.ParseTask], Set[String]) = {
      val tasks = ParseRunner.tasks(
        ContractCatalog.fromDirectory(graft.queries.ParseQueries.CorpusDir))
      val transfer = tasks.find(
        _.tableName == "common.erc20_evt_Transfer").get
      val punk = tasks.find(
        _.tableName == "cryptopunks.CryptoPunksMarket_evt_PunkBought").get
      val others = tasks.filter(_.isEvent)
        .filterNot(t => t.tableName == transfer.tableName ||
          t.tableName == punk.tableName).take(6)
      val slice = Seq(transfer, punk) ++ others
      (slice, slice.map(_.tableName).toSet)
    }
    val logsCache = scala.collection.mutable.Map.empty[Int, DataFrame]
    def logsAt(k: Int): DataFrame = logsCache.getOrElseUpdate(k, {
      import graft.abi.Keccak256
      import graft.functions.hashBucket
      val (slice, _) = parseFixture
      val transferTopic = slice.head.event.get.topic0
      val punkTopic = slice(1).event.get.topic0
      val punksAddr = slice(1).contract.contractAddress.get.toLowerCase
      // the noise topic is a SYNTHETIC signature absent from the whole
      // contract corpus, so noise rows match no task and the fixture's
      // width characterization holds exactly: 2 tasks decode rows, 6
      // prune to empty. (An earlier revision used the real ERC-20
      // Approval signature here — but common.erc20_evt_Approval is one
      // of the 6 `others` tasks, so ~1/3 of the fixture decoded under a
      // third task, inflating decode volume ~1.5× vs the stated design;
      // round-9 ADVICE.)
      val noiseTopic = Keccak256.eventTopic("GraftRampNoise(uint256,uint256)")
      def pad64(c: org.apache.spark.sql.Column) =
        concat(lit("0x"), lpad(lower(hex(c)), 64, "0"))
      val path = s"$out/logs_x$k"
      val li = graft.sources.EvmFixtures.lineitemTx(
        Tables.df(spark, sfDir, "lineitem"))
        .filter(col("l_orderkey") % 4 === 0)
        .withColumn("m", col("l_linenumber") % 3)
      (0 until k).map { i =>
        li.select(
          when(col("m") === 0, array(lit(transferTopic),
              pad64(col("l_suppkey")), pad64(col("l_partkey") % 97)))
            .when(col("m") === 1, array(lit(punkTopic),
              pad64(col("l_orderkey") % 10000),
              pad64(col("l_suppkey")), pad64(col("l_partkey") % 97)))
            .otherwise(array(lit(noiseTopic),
              pad64(col("l_suppkey")), pad64(col("l_partkey") % 97)))
            .as("topics_arr"),
          unhex(lpad(hex(col("l_partkey")), 64, "0")).as("unhex_data"),
          when(col("m") === 1, lit(punksAddr))
            .otherwise(concat(lit("0xa"),
              (col("l_partkey") % 97).cast("string"))).as("address"),
          concat(lit(s"0xt$i"), col("l_orderkey").cast("string"), lit("_"),
            col("l_linenumber").cast("string")).as("transaction_hash"),
          col("l_linenumber").cast("long").as("log_index"),
          (col("l_orderkey") + lit(i.toLong * 10000000L)).as("block_number"),
          when(col("m") === 0, hashBucket(lit(transferTopic)))
            .when(col("m") === 1, hashBucket(lit(punkTopic)))
            .otherwise(hashBucket(lit(noiseTopic))).as("selector_hash"),
          when(col("m") === 1, hashBucket(lit(punksAddr)))
            .otherwise(hashBucket(concat(lit("0xa"),
              (col("l_partkey") % 97).cast("string")))).as("address_hash"),
          lit("2026-03-01").cast("date").as("dt"))
      }.reduce(_ unionAll _).write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    })

    // each op prepares its input OUTSIDE the timed window.
    // SPARK_GRAFT_RAMP_OPS (comma-separated row names) selects a
    // subset — a targeted capture of new rows without paying the full
    // ~20-minute suite; row semantics are unchanged (each cell is
    // independently prepared and probe-bracketed either way).
    val allOps: Seq[(String, Int => (Double, Long))] = Seq(
      "parse_runner_width8" -> { k =>
        val names = parseFixture._2
        // materialize the catalog OUTSIDE the clock (the harness
        // contract above): fromDirectory re-walks and re-parses all
        // corpus JSON per enumeration — a fixed ~10 ms driver cost
        // that belongs to preparation, not the measured data path
        val catalog = ContractCatalog.inMemory(
          ContractCatalog.fromDirectory(
            graft.queries.ParseQueries.CorpusDir).contractJsons)
        val logs = logsAt(k)
        val wh = s"$out/parse_wh" // per-task overwrite; reuse across runs
        timeIt {
          ParseRunner.run(spark, catalog,
            logs, logs.limit(0), wh, t => names(t.tableName))
            .map(_._2).sum
        }
      },
      "minhash_lsh_candidates" -> { k =>
        val d = docsAt(k)
        timeIt(Dedup.minhashCandidates(d, "doc_id", "text").count())
      },
      "ngram_jaccard_pairs" -> { k =>
        val d = docsAt(k)
        timeIt(Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.8).count())
      },
      "simhash_pairs" -> { k =>
        val d = docsAt(k)
        timeIt(Dedup.simhashPairs(d, "doc_id", "text").count())
      },
      "containment_pairs" -> { k =>
        // the newest shuffle-heavy dedup path (round 10): A-prefix ×
        // B-FULL candidate join — the containing side indexes all its
        // shingles, making this the heaviest-indexed shingle join. The
        // raw replicas carry no containment pairs, so inject a
        // tail-extended variant per doc_id%10==5 doc (the
        // clustersCorpus shape): contained-in-container rows then
        // scale with k, and the z{i} prefixes keep every containment
        // copy-local. +5e6 id offset stays inside the copy's 1e7 id
        // stripe — no cross-copy id collisions.
        val d = docsAt(k)
        val corp = d.unionAll(d.filter(col("doc_id") % 10 === 5)
          .select((col("doc_id") + 5000000L).as("doc_id"),
            concat(col("text"), lit(" graft tail token")).as("text")))
        timeIt(Dedup.containmentPairs(corp, "doc_id", "text", 3, 0.9)
          .count())
      },
      "unit_dedup" -> { k =>
        // the newest shuffle-heavy dedup path (round 9): per-sentence
        // explode multiplies rows ~30×, then one unit-hash shuffle, an
        // id join back and a reassembly agg. The z{i}-prefixed tokens
        // make every UNIT copy-local too (". " separators survive the
        // prefixing), so cross-copy first-occurrence collisions don't
        // exist and survivor volume scales with k.
        val d = docsAt(k)
        timeIt(Dedup.unitDedup(d, "doc_id", "text").count())
      },
      "span_dedup" -> { k =>
        // substring/span dedup (round 11): rolling w-gram fingerprints,
        // winner agg, window-cover removal, affected-only reassembly.
        // Inject one exact copy per doc_id%10==0 doc inside each copy
        // stripe (the clustersCorpus shape, +1e5 < the 1e7 stripe) so
        // duplicated-window volume scales with k while z{i} prefixes
        // keep every gram copy-local.
        val d = docsAt(k)
        val corp = d.unionAll(d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
        timeIt(Dedup.spanDedup(corp, "doc_id", "text", 8).count())
      },
      "bloom_decontaminate" -> { k =>
        // map-only corpus probe (round 11): the eval side is FIXED
        // (base docs' %7==0 slice — benchmarks don't grow with the
        // corpus) while the probed corpus ramps. scan→project shape:
        // expect ~linear wall time, no shuffle to go superlinear.
        val d = docsAt(k)
        val ev = docs0.filter(col("doc_id") % 7 === 0)
        timeIt(graft.ops.Decontaminate
          .bloomFlag(d, ev, "doc_id", "text", 4)
          .filter(col("contaminated")).count())
      },
      "dsir_resample" -> { k =>
        // two corpus LM passes + broadcast target LMs (round 11):
        // target FIXED (the base %7==0 slice), corpus ramps — the
        // selection shape at 100 TB. Expect the bigram-LM family's
        // ~linear profile.
        val d = docsAt(k)
        val tgt = docs0.filter(col("doc_id") % 7 === 0)
        timeIt(graft.ops.TextAnalysis
          .dsirResample(d, tgt, "doc_id", "text", -10000L, 12000L)
          .filter(col("kept")).count())
      },
      "select_budget" -> { k =>
        // score-sharded prefix-sum selection (round 11): budget scales
        // with k so the kept fraction stays constant — the ramp
        // measures the prefix-sum machinery, not a shrinking output.
        val d = docsAt(k)
        val feats = graft.ops.TextAnalysis
          .qualityFeatures(d, col("text"))
          .select(col("doc_id"), col("n_words").cast("long").as("toks"),
            col("stop_ratio"))
        timeIt(graft.ops.Pack.selectUnderBudget(
          feats, "doc_id", "toks", "stop_ratio", 130000L * k).count())
      },
      "ivfpq_encode_batch" -> { k =>
        // incremental ANN ingest (round 11): the BASE (and its frozen
        // quantizers) is FIXED while the ingested batch ramps — the
        // daily-append shape. Batch passes are map-shaped vs broadcast
        // quantizers: expect ~linear in batch size.
        val e = embAt(k)
        val base = emb0
        val r = timeIt(
          graft.ops.Similarity.ivfPqEncodeBatch(e, base).count())
        spark.catalog.clearCache()
        r
      },
      "curate_v3" -> { k =>
        // the full v3 composition (LM gate → unit dedup → pack), the
        // second most expensive catalog query at r10 and the shape
        // where boundary re-execution regressions hide (bitten rounds
        // 9 AND 10). Drives the production curateV3Frames on the
        // duplicate-injected replica corpus — same injection the
        // catalog corpus applies, per copy stripe.
        val d = docsAt(k)
        val corp = d.unionAll(d.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
          .unionAll(d.filter(col("doc_id") % 10 === 5)
            .select((col("doc_id") + 200000L).as("doc_id"),
              concat(col("text"), lit(" graft tail token")).as("text")))
        timeIt(graft.queries.PackQueries.curateV3Frames(corp)._3.count())
      },
      "binned_quantiles" -> { k =>
        // continuous-column quantiles (round 11): min/max pass + bin
        // counts (both partial-agg'd map-side) + a ≤2^bits-row window.
        // The bounded cardinality is manufactured by construction, so
        // the expected profile is the flat two-scan shape regardless
        // of the value domain's size.
        val d = docsAt(k)
        timeIt(graft.ops.Stats.binnedQuantiles(
          graft.ops.TextAnalysis.repetitionFeatures(d, col("text")),
          col("dup_token_frac"), Seq(100, 500, 900, 990)).count())
      },
      "source_profile_merge" -> { k =>
        // mergeable profiles (round 12; round 15 moved the sketch
        // into the stats aggregate), exercised through the merge
        // path: profile 4 disjoint shards, fold. Expected flat-to-
        // linear: ONE partial-agg'd groupBy per shard whose shuffle
        // carries a <=k-long KMV buffer + 4 scalars per (partition,
        // source) — plan-pinned map-side — and the merge itself is
        // profile-sized. 97 synthetic sources keep the group count
        // fixed while the corpus ramps — the serving shape (sources
        // don't multiply with corpus size).
        val d = docsAt(k).withColumn("source",
          pmod(col("doc_id"), lit(97)).cast("string"))
        val tok = size(split(col("text"), " "))
        timeIt {
          val shards = (0 until 4).map(i =>
            graft.ops.Stats.sourceProfile(
              d.filter(col("doc_id") % 4 === i), "source", "text", tok,
              k = 64))
          graft.ops.Stats.mergeProfiles(
            shards.reduce(_ unionByName _), "source", k = 64).count()
        }
      },
      "corpus_diff" -> { k =>
        // snapshot diff (round 12): both sides reduce to (id, md5)
        // map-side, one fingerprint-width full-outer join, output ∝
        // churn (which scales with k here: ~1/13 added, ~1/13
        // removed, ~1/5 changed per stripe). Expect ~linear: two
        // scans + one id-keyed shuffle of 16-byte fingerprints.
        val d = docsAt(k)
        val oldSnap = d.filter(col("doc_id") % 13 =!= 1)
        val newSnap = d.filter(col("doc_id") % 13 =!= 2)
          .select(col("doc_id"),
            when(col("doc_id") % 5 === 0,
              concat(col("text"), lit(" rev2")))
              .otherwise(col("text")).as("text"))
        timeIt(Dedup.corpusDiff(oldSnap, newSnap, "doc_id", "text")
          .count())
      },
      "curate_v4" -> { k =>
        // v4 composition (round 11): span dedup → Jaccard clusters
        // over the span-deduped text → keep-LONGEST resolution → pack,
        // on the duplicate-injected replica corpus (same injection as
        // curate_v3's row, so both span and jaccard stages carry
        // k-scaled duplicate work; z{i} prefixes keep all of it
        // copy-local). The boundary-discipline stress row for the new
        // composition — sd is consumed three times downstream.
        val d = docsAt(k)
        val corp = d.unionAll(d.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
          .unionAll(d.filter(col("doc_id") % 10 === 5)
            .select((col("doc_id") + 200000L).as("doc_id"),
              concat(col("text"), lit(" graft tail token")).as("text")))
        timeIt(graft.queries.PackQueries.curateV4Frames(corp)._2.count())
      },
      "connected_components" -> { k =>
        // isolate CC from candidate generation: the edge list is
        // materialized before the clock starts
        val pairs = Dedup.minhashCandidates(docsAt(k), "doc_id", "text")
          .localCheckpoint()
        pairs.count()
        timeIt(Dedup.connectedComponents(pairs, "a_id", "b_id").count())
      },
      "pq_topk_encode_adc" -> { k =>
        // the newest shuffle-heavy ANN path (round 10): corpus ramps,
        // query set FIXED at the base table's 1-in-50 slice (the
        // serving shape — queries don't grow with the index). Encode
        // is the m·ksub-exploded linear pass over the corpus, the ADC
        // scan is |Q|·|C| rows of 16-int codes, and the per-query
        // shortlist window sorts |C| rows per query — all linear in
        // corpus at fixed |Q| (the window adds its sort log factor).
        val e = embAt(k)
        val qs = emb0.filter(col("vec_id") % 50 === 0)
        val r = timeIt(Similarity.pqTopK(e, qs, 5).count())
        // pqTopK persists its normalized corpus internally (by design
        // — three consumers) and a ramp cell has no later consumer:
        // drop it OUTSIDE the timed window so cache occupancy can't
        // perturb the rows measured after this one (the capture-
        // isolation discipline this file documents)
        spark.catalog.clearCache()
        r
      },
      "ivfpq_topk_scaled_every" -> { k =>
        // the composed IVF×PQ index (round 11), operated per its scale
        // contract: #cells is a build-time budget, so centroidEvery
        // scales WITH the corpus (×k) to hold cells ~constant — cell
        // assignment (a |corpus|×#cells distance pass) stays linear,
        // as do encode and the ADC scan (a fixed nProbe/#cells
        // fraction of a linearly-growing corpus). Corpus ramps,
        // queries fixed (serving shape, as pq_topk_encode_adc).
        val e = embAt(k)
        val qs = emb0.filter(col("vec_id") % 50 === 0)
        val r = timeIt(
          Similarity.ivfPqTopK(e, qs, 5, centroidEvery = 50 * k).count())
        spark.catalog.clearCache()
        r
      },
      "ivfpq_topk_fixed_every" -> { k =>
        // control row, deliberately WRONG at scale (the lsh
        // fixed-planes sibling): centroidEvery frozen at 50 while the
        // corpus grows, so #cells ∝ corpus and the |corpus|×#cells
        // assignment pass is QUADRATIC — first measured round 11
        // (2.7 → 5.4 → 64 s, the superlinear term the scaled row
        // removes). The knob lesson, ANN edition.
        val e = embAt(k)
        val qs = emb0.filter(col("vec_id") % 50 === 0)
        val r = timeIt(Similarity.ivfPqTopK(e, qs, 5).count())
        spark.catalog.clearCache()
        r
      },
      "kmeans_fixed_budget" -> { k =>
        // spherical k-means (round 12), operated per the nlist
        // contract: centroid COUNT is a build-time budget, so
        // seedEvery scales with k to hold #centroids fixed (40) —
        // each of the 2 Lloyd rounds is then one linear broadcast
        // argmin + one #centroids·dim integer-sum shuffle. Expect
        // ~linear; a fixed seedEvery would be the ivfpq quadratic
        // control all over again (measured there, not repeated here).
        // Ids are REMAPPED DENSE outside the timed window: the
        // replica stripes' 10^7 offsets interact with the stride so a
        // raw seedEvery=50k yields 40/48/64 centroids across the ramp
        // — the first capture fitted 1.16 against n alone, yet was
        // exactly linear (0.99) against the true n·#centroids work;
        // dense ids make the budget knob hold so the table reads the
        // contract directly.
        val e = embAt(k)
        val dense = e.withColumn("vec_id",
            row_number().over(Window.orderBy(col("vec_id")))
              .cast("long") - 1)
          .localCheckpoint()
        dense.count()
        timeIt(Similarity.kmeansCentroids(dense, seedEvery = 50 * k,
          iters = 2).count())
      },
      "sem_dedup_sqrt_cells" -> { k =>
        // SemDeDup production row (round 12: HIERARCHICAL assignment).
        // centroidEvery scales with √k (#cells and cell size both √k,
        // the pair join balanced at its n^1.5 candidate volume) and
        // superFactor scales with ∜k per the knob contract (#supers ≈
        // ∜n), so assignment is n^1.25: vector routing n·#supers +
        // candidate scan n·centProbe·#cells/#supers — the flat-control
        // row below keeps the n^1.5 assignment for the step-exponent
        // comparison. Inject one identical copy per vec_id%10==0 row
        // inside each stripe (the q_semdedup shape) so semantic-dup
        // volume scales with k; the label-clustered embeddings make
        // cell occupancy SKEWED — the realistic shape, same as the
        // LSH rows.
        val e = embAt(k)
        val corpus = e.unionAll(e.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 100000L).as("vec_id"),
            col("embedding")))
        val every = 50 * math.sqrt(k.toDouble).round.toInt
        val sf4 = math.max(1,
          (8 * math.sqrt(math.sqrt(k.toDouble))).round.toInt)
        timeIt(Similarity.semDedup(corpus, 0.95, centroidEvery = every,
          superFactor = sf4).count())
      },
      "sem_dedup_flat_control" -> { k =>
        // control row: the round-11 FLAT assignment (superFactor=0) —
        // corpus × broadcast(centroids) at #cells ∝ √k, i.e. the
        // n^1.5 compute term and the √n-growth broadcast the
        // hierarchical row removes. Expect its 16×→64× step exponent
        // to sit visibly above the production row's.
        val e = embAt(k)
        val corpus = e.unionAll(e.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 100000L).as("vec_id"),
            col("embedding")))
        val every = 50 * math.sqrt(k.toDouble).round.toInt
        timeIt(Similarity.semDedup(corpus, 0.95, centroidEvery = every,
          superFactor = 0).count())
      },
      "strip_boilerplate" -> { k =>
        // corpus-global line-frequency strip (round 12): 8-word lines
        // + an injected common header/footer so the frequent set is
        // non-empty at every k. Expected ~linear: the (doc, line)
        // distinct and line-count agg are partial-agg'd one-pass
        // shuffles, the frequent set stays tiny (its SIZE is
        // k-invariant here — same chrome, more copies), so removal
        // stays a broadcast anti-join; reassembly is one doc-keyed
        // shuffle.
        val d = docsAt(k)
        val ml = d.select(col("doc_id"), concat(
          lit("NAV HOME\n"),
          array_join(transform(
            sequence(lit(0),
              floor((size(split(col("text"), " ")) + lit(7)) / lit(8))
                .cast("int") - lit(1)),
            i => array_join(
              slice(split(col("text"), " "), i * lit(8) + lit(1), lit(8)),
              " ")), "\n"),
          when(col("doc_id") % 2 === 0, lit("\nCOPYRIGHT FOOTER"))
            .otherwise(lit(""))).as("mltext"))
          .localCheckpoint()
        ml.count()
        timeIt(graft.ops.Quality.stripBoilerplate(
          ml, "doc_id", "mltext", maxDocFreq = 10L).count())
      },
      "hard_negatives_ivf" -> { k =>
        // label-filtered IVF top-k (round 12), operated per the
        // scaled-nlist contract (centroidEvery × k holds #cells
        // constant — the ivfpq_topk_scaled_every discipline). Labels
        // synthesized as vec_id % 10 (the base table's label shape).
        // Corpus ramps, queries fixed: serving shape.
        val e = embAt(k).withColumn("label",
          (col("vec_id") % 10).cast("int"))
        val qs = emb0.filter(col("vec_id") % 50 === 0)
          .withColumn("label", (col("vec_id") % 10).cast("int"))
        val r = timeIt(Similarity.hardNegativesIvf(
          e, qs, 5, centroidEvery = 50 * k).count())
        spark.catalog.clearCache()
        r
      },
      "curate_v5" -> { k =>
        // the quality-family composition (round 12): chrome strip →
        // Gopher gate → C4 filter → sharded pack. Lines carry the
        // QualityQueries decorations (bullet/ellipsis/period) so the
        // C4 terminal-punct rule has real survivors at every k.
        val d = docsAt(k)
        val ws = split(col("text"), " ")
        val nLines = floor((size(ws) + lit(7)) / lit(8)).cast("int")
        val decorated = transform(sequence(lit(0), nLines - lit(1)), i => {
          val m = col("doc_id") + i
          concat(
            when(m % 7 === 0, lit("- ")).otherwise(lit("")),
            array_join(slice(ws, i * lit(8) + lit(1), lit(8)), " "),
            when(m % 5 === 0, lit("..."))
              .when(m % 3 =!= 0, lit(".")).otherwise(lit("")))
        })
        val ml = d.select(col("doc_id"), concat(
            lit("NAV src"), (col("doc_id") % 20).cast("string"),
            lit(" HOME\n"),
            array_join(decorated, "\n"),
            when(col("doc_id") % 2 === 0, lit("\nCOPYRIGHT FOOTER"))
              .otherwise(lit(""))).as("mtext"))
          .localCheckpoint()
        ml.count()
        import graft.ops.Quality
        timeIt {
          // checkpoint between stages (the curateV3/V4 discipline; see
          // the q_curate_corpus_v5 comment): without it the strip
          // executes once per downstream gate and the 64× cell went
          // superlinear on string churn
          val stripped = Quality.stripBoilerplate(ml, "doc_id", "mtext",
              maxDocFreq = 10L)
            .filter(col("n_lines_kept") > 0)
            .select(col("doc_id"), col("text_clean").as("mtext"))
            .localCheckpoint()
          val g = Quality.gopherRules(stripped, "doc_id", "mtext",
              minWords = 40, minStopHits = 1)
            .filter(col("keep")).select("doc_id")
          val c = Quality.c4LineFilter(stripped, "doc_id", "mtext")
            .filter(col("keep")).select(col("doc_id"), col("text_c4"))
          val toks = g.join(c, Seq("doc_id"))
            .select(col("doc_id"),
              size(Quality.words(col("text_c4"))).cast("long").as("t"))
          graft.ops.Pack.sequencePack(toks, "doc_id", "t", 256L).count()
        }
      },
      "audio_dedup_clusters" -> { k =>
        // the round-13 per-frame band-delta audio signature end to
        // end: REAL WAV synth+decode (the honest dominant cost,
        // embarrassingly parallel over the id frame) → banded
        // fingerprint pair join at Hamming ≤ 3 → connected
        // components. Replica ids carry distinct waveform seeds, and
        // copies/edits are injected per the catalog recipe, so pair
        // volume — the only super-linear risk — scales linearly with
        // the corpus by construction. Expect ~linear, decode-bound.
        import spark.implicits._
        import graft.ops.Multimodal
        def pay(id: Long, extra: Int): Array[Byte] =
          Multimodal.wavPayload(8000 + (id % 4).toInt * 4000,
            1 + (id % 2).toInt, 300 + (id % 400).toInt + extra,
            id.toInt)
        val ids = docsAt(k).select(col("doc_id")).localCheckpoint()
        ids.count()
        timeIt {
          val fp = ids.as[Long].flatMap { id =>
            def f(extra: Int, mid: Long): (Long, Long, Long) = {
              val (hi, lo) =
                Multimodal.audioFingerprint(pay(id, extra)).get
              (mid, hi, lo)
            }
            // replica ids reach 6.4e8 at 64x, so the copy/edit id
            // offsets sit at 1e9/2e9 — disjoint by construction
            val base = Seq(f(0, id))
            val copies =
              if (id % 10 == 0) Seq(f(0, id + 1000000000L)) else Seq.empty
            val edits =
              if (id % 10 == 5) Seq(f(1, id + 2000000000L)) else Seq.empty
            base ++ copies ++ edits
          }.toDF("media_id", "afp_hi", "afp_lo")
          graft.ops.Dedup.connectedComponents(
            Multimodal.aHashNearDupPairs(fp, "media_id",
              "afp_hi", "afp_lo", maxHamming = 3),
            "a_id", "b_id").count()
        }
      },
      "kcenter_select_assign" -> { k =>
        // greedy k-center (k=8 rounds of map-only distance update +
        // TakeOrdered argmax) then the literal-folded assignment
        // pass. Expect ~linear: per-round work is one corpus map, the
        // round count is fixed, and nothing shuffles.
        val e = embAt(k)
        timeIt {
          val sel = Similarity.kCenterSelect(e, 8)
          Similarity.kCenterAssign(e, sel).count()
        }
      },
      "constraint_suite" -> { k =>
        // the Deequ-shaped declarative report: N constraints in ONE
        // partial-agg'd aggregate pass (a single row shuffled), then a
        // constant-size explode. Expect ~linear with heavy fixed-cost
        // amortization (sub-linear fitted exponent at these sizes).
        import graft.verify.Verifier._
        val d = docsAt(k).select(col("doc_id"),
            when(col("doc_id") % 97 === 0, lit(null))
              .otherwise(col("doc_id") % 1000).as("v"),
            length(col("text")).cast("double").as("len"),
            (col("doc_id") % 4).cast("string").as("src"))
          .localCheckpoint()
        d.count()
        timeIt(constraintReport(d, Seq(
          NotNull("v"), Unique(Seq("doc_id")),
          InRange("len", 0.0, 1e9),
          OneOf("src", Seq("0", "1", "2", "3")))).count())
      },
      "curation_audit" -> { k =>
        // the per-doc governance row (round 12): Gopher + C4 gates
        // over the decorated multiline fixture, 4-gram eval-overlap
        // decontamination over the raw text (replica tokens are
        // z{i}-prefixed, so cross-copy grams stay distinct and the
        // gram join scales linearly), three doc-keyed joins. Expect
        // ~linear: every stage is a partial-agg'd scan or an
        // equi-join on doc_id.
        import graft.ops.Quality
        val d = docsAt(k)
        val ws = split(col("text"), " ")
        val nLines = floor((size(ws) + lit(7)) / lit(8)).cast("int")
        val decorated = transform(sequence(lit(0), nLines - lit(1)), i => {
          val m = col("doc_id") + i
          concat(
            when(m % 7 === 0, lit("- ")).otherwise(lit("")),
            array_join(slice(ws, i * lit(8) + lit(1), lit(8)), " "),
            when(m % 5 === 0, lit("..."))
              .when(m % 3 =!= 0, lit(".")).otherwise(lit("")))
        })
        val ml = d.select(col("doc_id"),
            array_join(decorated, "\n").as("mtext"))
          .localCheckpoint()
        ml.count()
        timeIt {
          val g = Quality.gopherRules(ml, "doc_id", "mtext",
              minWords = 40, minStopHits = 1)
            .select(col("doc_id"), col("keep").as("q_gopher"))
          val c = Quality.c4LineFilter(ml, "doc_id", "mtext")
            .select(col("doc_id"), col("keep").as("q_c4"))
          val cont = graft.ops.Decontaminate.flag(
              d.filter(col("doc_id") % 7 =!= 0),
              d.filter(col("doc_id") % 7 === 0),
              "doc_id", "text", n = 4)
            .select(col("doc_id"), col("contaminated"))
          ml.select("doc_id")
            .join(g, Seq("doc_id")).join(c, Seq("doc_id"))
            .withColumn("is_eval", col("doc_id") % 7 === 0)
            .join(cont, Seq("doc_id"), "left")
            .select(col("doc_id"), col("is_eval"), col("q_gopher"),
              col("q_c4"), col("contaminated"),
              (!col("is_eval") && col("q_gopher") && col("q_c4") &&
                !coalesce(col("contaminated"), lit(false)))
                .as("selected"))
            .count()
        }
      },
      "curriculum_order" -> { k =>
        // tiers via binned quantiles (two partial-agg'd scans + a
        // map-only probe) + one (tier, shard)-keyed window; the tier
        // offsets are a #tiers-row collect. Expect ~linear.
        val d = docsAt(k).select(col("doc_id"),
          length(col("text")).cast("double").as("s"))
          .localCheckpoint()
        d.count()
        timeIt(graft.ops.Sampling.curriculumOrder(
          d, "doc_id", col("s"), tiers = 4, shards = 8).count())
      },
      "mean_pool_fp" -> { k =>
        // chunk→doc pooling: posexplode (64 rows per vector) into one
        // (group, dim)-keyed partial-agg'd aggregate — scan-shaped,
        // expect ~linear
        val e = embAt(k)
        // replica offsets are multiples of 5, so div-5 groups stay
        // 5-chunk-sized at every k — the designed chunk→doc shape
        timeIt(graft.ops.Similarity.meanPoolFp(
          e, expr("vec_id div 5"), "embedding").count())
      },
      "linkage_fuzzy" -> { k =>
        // FastSS fuzzy join (round 14): clean vs dirtied entity names
        // on the ADVERSARIAL shared-prefix shape (every name starts
        // "Customer#") that degenerated the earlier segment blocking.
        // Both sides ramp with the corpus; deletion-variant keys are
        // near-full strings, so candidate volume tracks the true
        // near-neighbor multiplicity of dense digit tails (~constant
        // per row) — expect ~linear.
        val ids = docsAt(k).select(col("doc_id"))
        val clean = ids.select(col("doc_id").as("clean_id"),
          format_string("Customer#%09d", col("doc_id")).as("name"))
        val dirty = ids.select((col("doc_id") + 100000000L).as("dirty_id"),
          when(col("doc_id") % 3 === 0,
            concat(substring(format_string("Customer#%09d", col("doc_id")),
                1, 12), lit("X"),
              substring(format_string("Customer#%09d", col("doc_id")),
                14, 10)))
          .when(col("doc_id") % 3 === 1,
            concat(substring(format_string("Customer#%09d", col("doc_id")),
                1, 12),
              substring(format_string("Customer#%09d", col("doc_id")),
                14, 10)))
          .otherwise(format_string("Customer#%09d", col("doc_id")))
            .as("name"))
        timeIt(graft.ops.Linkage.fuzzyJoin(clean, dirty, "clean_id",
          "name", "dirty_id", "name", maxEdit = 1).count())
      },
      "entity_resolution" -> { k =>
        // the full ER composition (round 14): fuzzy self-match at d=1
        // over checksummed names → connected components → canonical +
        // sizes. Pairs grow ~linearly; CC round count grows with the
        // log of the longest dirty-bridge chain, each round a fixed
        // set of label-table joins — expect mildly super-linear wall
        // only if chains deepen with density.
        val ids = docsAt(k).select(col("doc_id"))
        val nm = expr(
          """concat('Customer#', lpad(CAST(doc_id AS STRING), 9, '0'),
               char(65 + CAST(doc_id % 11 AS INT)))""")
        val base = ids.select(col("doc_id").as("k0"), nm.as("nm"),
          (lit(10) + col("doc_id") % 8).as("p"))
        val clean = base.select(col("k0").as("id"), col("nm").as("name"))
        val dirty = base.select((col("k0") + 100000000L).as("id"),
          expr("""CASE CAST(k0 % 3 AS INT)
                    WHEN 0 THEN concat(substring(nm, 1, CAST(p - 1 AS INT)),
                      char((ascii(substring(nm, CAST(p AS INT), 1))
                            - 48 + 1) % 10 + 48),
                      substring(nm, CAST(p + 1 AS INT), 100))
                    WHEN 1 THEN concat(substring(nm, 1, CAST(p - 1 AS INT)),
                      substring(nm, CAST(p + 1 AS INT), 100))
                    ELSE nm END""").as("name"))
        val corpus = clean.unionByName(dirty)
        timeIt {
          val pairs = graft.ops.Linkage.fuzzyJoin(corpus,
              corpus.withColumnRenamed("id", "rid"),
              "id", "name", "rid", "name", maxEdit = 1)
            .filter(col("id") < col("rid"))
          val labels = graft.ops.Dedup.connectedComponents(
            pairs, "id", "rid")
          corpus.join(labels.withColumnRenamed("id", "lid"),
              col("id") === col("lid"), "left")
            .select(col("id"),
              coalesce(col("comp"), col("id")).as("entity_id"))
            .count()
        }
      },
      "scd2_merge" -> { k =>
        // SCD2 dimension merge (round 14): the DIMENSION ramps with k
        // while the daily update batch stays FIXED at base size — the
        // production shape (a day's changes ≪ the dim). One full-outer
        // join of the open slice with the small batch (AQE broadcast)
        // plus history pass-through: expect ~linear in the dim scan.
        val dim = docsAt(k).select(col("doc_id").as("k"),
          (col("doc_id") % 97).cast("string").as("attr"),
          lit("2024-01-01").as("valid_from"),
          lit(null.asInstanceOf[String]).as("valid_to"),
          lit(true).as("is_current"))
        val batch = docsAt(1).select(col("doc_id").as("k"),
          (col("doc_id") % 89).cast("string").as("attr"))
        timeIt(graft.ops.Scd.scd2Merge(dim, batch, "k", Seq("attr"),
          "2024-02-01").count())
      },
      "pagerank_8iter" -> { k =>
        // fixed-point PageRank (round 14): |V| and |E| (3 out-edges
        // per node) ramp together, iteration count FIXED at 8. Each
        // round is one equi-join + partial agg + outer join, rotating
        // checkpoints — expect ~linear in |E|.
        val nodes = docsAt(k).select(col("doc_id"))
        val n = nodes.count()
        val e1 = nodes.select(col("doc_id").as("src"),
          (((col("doc_id") % 2147483646L) + 1) * 48271L % 2147483647L)
            .as("u1"))
        val edges = e1.select(col("src"), (col("u1") % n).as("dst"))
          .unionByName(e1.select(col("src"),
            (col("u1") * 48271L % 2147483647L % n).as("dst")))
          .unionByName(e1.select(col("src"),
            (col("u1") * 48271L % 2147483647L * 48271L % 2147483647L % n)
              .as("dst")))
          .filter(col("src") =!= col("dst")).distinct()
        timeIt(graft.ops.Graph.pageRank(edges, "src", "dst",
          iterations = 8, nodesOpt = Some(nodes), nNodesOpt = Some(n))
          .count())
      },
      "cms_heavy_hitters" -> { k =>
        // count-min sketch (round 14): corpus ramps, grid FIXED at
        // 4x1024 (the whole point — the summary does not grow). The
        // z{i} token prefixes make the vocabulary grow ~linearly with
        // k, so this measures tokenize + vocab-sized shuffle +
        // broadcast grid probe — expect ~linear.
        val d = docsAt(k)
        timeIt(graft.ops.Sketch.cmsHeavyHitters(d, "text", depth = 4,
          width = 1024, k = 20).count())
      },
      "hits_8iter" -> { k =>
        // HITS (round 14): same |V|/|E| ramp as pagerank_8iter,
        // iteration count FIXED at 8. Each round is two edge⋈state
        // joins + two partial aggs + two 1-row normalizer broadcasts,
        // rotating checkpoints — expect ~linear in |E|, ~2× the
        // pagerank constant.
        val nodes = docsAt(k).select(col("doc_id"))
        val n = nodes.count()
        val e1 = nodes.select(col("doc_id").as("src"),
          (((col("doc_id") % 2147483646L) + 1) * 48271L % 2147483647L)
            .as("u1"))
        val edges = e1.select(col("src"), (col("u1") % n).as("dst"))
          .unionByName(e1.select(col("src"),
            (col("u1") * 48271L % 2147483647L % n).as("dst")))
          .unionByName(e1.select(col("src"),
            (col("u1") * 48271L % 2147483647L * 48271L % 2147483647L % n)
              .as("dst")))
          .filter(col("src") =!= col("dst")).distinct()
        timeIt(graft.ops.Graph.hits(edges, "src", "dst",
          iterations = 8, nodesOpt = Some(nodes), nNodesOpt = Some(n))
          .count())
      },
      "triangles" -> { k =>
        // degree-ordered triangle counting (round 14): |V|/|E| ramp
        // with ~3 out-edges per node. Wedge volume is bounded by
        // Σ outdeg⁺² with outdeg⁺ ≤ O(√m) — at this density the graph
        // is sparse and near-regular, so expect ~linear.
        val nodes = docsAt(k).select(col("doc_id"))
        val n = nodes.count()
        val e1 = nodes.select(col("doc_id").as("src"),
          (((col("doc_id") % 2147483646L) + 1) * 48271L % 2147483647L)
            .as("u1"))
        val edges = e1.select(col("src"), (col("u1") % n).as("dst"))
          .unionByName(e1.select(col("src"),
            (col("u1") * 48271L % 2147483647L % n).as("dst")))
          .unionByName(e1.select(col("src"),
            (col("u1") * 48271L % 2147483647L * 48271L % 2147483647L % n)
              .as("dst")))
          .filter(col("src") =!= col("dst")).distinct()
        timeIt(graft.ops.Graph.triangleCounts(edges, "src", "dst")
          .count())
      },
      "kcore_peel" -> { k =>
        // k-core peeling (round 14): the q_kcore core-periphery shape
        // with the hub set pinned at the first 500/250 ids. On the
        // replicated ramp corpus the hub-hub subgraph stays ~4-regular
        // whatever n (only hub SOURCES aim at hubs), so the 4-core
        // peels TO EMPTY at every ramp scale — which is the MAXIMAL
        // work case: every node passes through the peel, round count
        // is the full peeling depth. Per round linear in |E|; the
        // fitted exponent measures exactly that worst case.
        val docs = docsAt(k).select(col("doc_id"))
        val n = docs.count()
        val e1 = docs.select(col("doc_id").as("src"),
          (((col("doc_id") % 2147483646L) + 1) * 48271L % 2147483647L)
            .as("u1"))
        val e3 = e1.select(col("src"), col("u1"),
          (col("u1") * 48271L % 2147483647L).as("u2"),
          (col("u1") * 48271L % 2147483647L * 48271L % 2147483647L)
            .as("u3"))
        val edges = e3.select(col("src"), (col("u1") % n).as("dst"))
          .unionByName(e3.select(col("src"),
            (col("u2") % 500L).as("dst")))
          .unionByName(e3.select(col("src"),
            (col("u3") % 250L).as("dst")))
          .filter(col("src") =!= col("dst")).distinct()
        timeIt(graft.ops.Graph.kCore(edges, "src", "dst", k = 4)
          .count())
      },
      "rolling_active_7d" -> { k =>
        // rolling distinct actives (round 14): (day,user) distinct +
        // bounded x7 fan-out + re-dedup — expect ~linear.
        timeIt(graft.ops.Events.rollingActive(eventsAt(k),
          "user_id", "ts", windowDays = 7).count())
      },
      "funnel_3step" -> { k =>
        // ordered-step funnel (round 14): events and users ramp
        // together at constant events-per-user; 3 type-filtered
        // scans + 3 user-keyed shuffles, user-sized frames between —
        // expect ~linear in the event count.
        val ev = eventsAt(k)
        timeIt {
          graft.ops.Events.funnel(ev, "user_id", "etype", "ts",
            Seq("view", "click", "purchase"),
            horizonSeconds = Some(604800L)).count()
        }
      },
      "retention_weekly" -> { k =>
        // cohort retention (round 14): one user agg + co-partitioned
        // join + map-side-combining distinct — expect ~linear.
        timeIt(graft.ops.Events.retentionMatrix(eventsAt(k),
          "user_id", "ts").count())
      },
      "linear_attribution" -> { k =>
        // multi-touch attribution (round 14): conversions × in-window
        // touches per user. Events-per-user is constant (80 over 30
        // days), so per-conversion in-window touch count — and pair
        // volume per conversion — is constant too: expect ~linear.
        val ev = eventsAt(k).withColumn("eid",
          xxhash64(col("user_id"), col("ts"), col("etype")))
        timeIt(graft.ops.Events.linearAttribution(ev,
          "eid", "user_id", "etype", "ts", "purchase",
          Seq("view", "click"), windowSeconds = 86400L).count())
      },
      "kmv_synopsis" -> { k =>
        // KMV sketch (round 14): distinct users ramp with k, synopsis
        // FIXED at 64 longs per group (the point of the sketch) — the
        // shuffle carries one <=64-long array per (partition, group).
        // Expect ~linear in the event scan.
        timeIt(graft.ops.Sketch.kmvSynopsis(eventsAt(k), "user_id",
          k = 64, groupCols = Seq("etype")).count())
      },
      "rank_quantiles" -> { k =>
        // dyadic rank sketch (round 15): the value domain (µs
        // timestamps over 30 days) AND the event count ramp, grid
        // FIXED at 16 levels x 2 x 8192 — one explode(32x)+partial-agg
        // corpus pass into a bounded cell shuffle, then a driver-side
        // 256-step walk per permille over the collected grid. Expect
        // ~linear in the event scan; the walk is O(1) in k.
        val ev = eventsAt(k)
        timeIt {
          val grid = graft.ops.Sketch.rankGrid(ev, unix_micros(col("ts")),
            graft.queries.RankSketchSql.Depth,
            graft.queries.RankSketchSql.Width)
          graft.ops.Sketch.rankQuantiles(grid,
            graft.queries.RankSketchSql.Permilles,
            graft.queries.RankSketchSql.Depth,
            graft.queries.RankSketchSql.Width).count()
        }
      },
      "rank_quantiles_join" -> { k =>
        // the UNBOUNDED-group-domain walk (round 17): per-user grids —
        // the user population ramps 500·k with the corpus, exactly the
        // domain class the collected walk's maxGroups guard rejects —
        // and the fused 8-round join walk (2 dyadic levels per round).
        // The grid build is the ~linear corpus term; the walk adds 8
        // bounded-fan joins whose frames are walkers-sized (users ×
        // permilles) against per-level grid slices. Expect ~linear,
        // round floors fixed.
        val ev = eventsAt(k)
        timeIt {
          val grid = graft.ops.Sketch.rankGridBy(ev,
            unix_micros(col("ts")), Seq("user_id"),
            graft.queries.RankSketchSql.Depth,
            graft.queries.RankSketchSql.Width)
          graft.ops.Sketch.rankQuantilesByJoin(grid, Seq("user_id"),
            graft.queries.RankSketchSql.Permilles,
            graft.queries.RankSketchSql.Depth,
            graft.queries.RankSketchSql.Width).count()
        }
      },
      "rank_range_read" -> { k =>
        // the synopsis-warehouse READ path (round 17): per-day cells
        // build OUTSIDE the clock (the build is the known ~linear
        // corpus pass — the rank_quantiles row's term); timed = filter
        // 14 of the 30 day slices, merge cell-wise, walk. Cells are
        // days×grid-sized whatever the corpus — expect exponent ~0
        // (the read never touches corpus bytes).
        val ev = eventsAt(k).withColumn("_day", to_date(col("ts")))
        val byDay = graft.ops.Sketch.rankGridBy(ev,
          unix_micros(col("ts")), Seq("_day"),
          graft.queries.RankSketchSql.Depth,
          graft.queries.RankSketchSql.Width).localCheckpoint()
        val res = timeIt {
          val merged = graft.ops.Sketch.mergeRankGrids(
            byDay.filter(col("_day") >= lit("1970-01-09").cast("date")
                && col("_day") < lit("1970-01-23").cast("date"))
              .select(col("level"), col("r"), col("bucket"), col("c")))
          graft.ops.Sketch.rankQuantiles(merged,
            graft.queries.RankSketchSql.Permilles,
            graft.queries.RankSketchSql.Depth,
            graft.queries.RankSketchSql.Width).count()
        }
        graft.core.Checkpoints.release(byDay)
        res
      },
      "rank_rolling_read" -> { k =>
        // rolling 7-day quantiles off the same day cells (round 17):
        // the guarded bounded collect + primitive-array window merges
        // + per-window walks, all days×grid-sized — expect exponent
        // ~0 like the range read.
        val ev = eventsAt(k).withColumn("_day", to_date(col("ts")))
        val byDay = graft.ops.Sketch.rankGridBy(ev,
          unix_micros(col("ts")), Seq("_day"),
          graft.queries.RankSketchSql.Depth,
          graft.queries.RankSketchSql.Width).localCheckpoint()
        val res = timeIt {
          graft.ops.Sketch.rankRollingQuantiles(byDay, "_day",
            windowDays = 7, graft.queries.RankSketchSql.Permilles,
            graft.queries.RankSketchSql.Depth,
            graft.queries.RankSketchSql.Width).count()
        }
        graft.core.Checkpoints.release(byDay)
        res
      },
      "kmv_range_read" -> { k =>
        // the KMV face of the cell read (round 17): day synopses build
        // outside the clock (≤64 longs per day), timed = filter the
        // 14-day slice, bottom-k merge, estimate — synopses-sized
        // work, expect exponent ~0.
        val ev = eventsAt(k).withColumn("_day", to_date(col("ts")))
        val perDay = graft.ops.Sketch.kmvSynopsis(ev, "user_id", 64,
          Seq("_day")).localCheckpoint()
        val res = timeIt {
          graft.ops.Sketch.mergeKmvSynopses(64, Seq.empty,
            perDay.filter(col("_day") >= lit("1970-01-09").cast("date")
                && col("_day") < lit("1970-01-23").cast("date"))
              .select(col("kmv")))
            .select(graft.ops.Sketch.kmvEstimate(col("kmv"), 64)
              .as("est"))
            .count()
        }
        graft.core.Checkpoints.release(perDay)
        res
      },
      "top_paths" -> { k =>
        // top-k entry paths (round 15): ONE user-keyed sort window
        // over the event scan; users ramp with k at constant
        // events/user (8), so per-user sort work is constant and the
        // path-count agg is paths-sized — expect ~linear.
        val ev = eventsAt(k).withColumn("eid",
          xxhash64(col("user_id"), col("ts"), col("etype")))
        timeIt(graft.ops.Events.topPaths(ev, "user_id", "etype", "ts",
          "eid", pathLen = 3, k = 10).count())
      },
      "kmv_overlap" -> { k =>
        // KMV cross-corpus overlap (round 15): two bounded synopses +
        // their merge (all three fixed at 64 longs) plus the
        // report-only exact-distinct join; both halves are corpus-scan
        // bound at fixed state — expect ~linear.
        val ev = eventsAt(k)
        timeIt(graft.ops.Sketch.kmvOverlap(
          ev.filter(col("etype") === "view"),
          ev.filter(col("etype") === "purchase"),
          "user_id", k = 64).count())
      },
      "session_quantiles" -> { k =>
        // sessionize → rank-grid composition (round 15): one
        // user-keyed sort window builds sessions, the fixed-size grid
        // sketches their near-continuous durations (the
        // bounded-cardinality casualty exactQuantiles cannot take) —
        // expect ~linear in the event scan.
        val ev = eventsAt(k).select(col("user_id"),
          unix_millis(col("ts")).as("ts_ms"),
          col("etype").as("event_type"))
        timeIt {
          import spark.implicits._
          val sess = graft.streaming.Sessionize.sessionizeBatch(spark,
            ev.as[graft.streaming.Sessionize.Event],
            graft.queries.SessionSql.GapMs).toDF()
          val grid = graft.ops.Sketch.rankGrid(sess,
            col("end_ms") - col("start_ms"),
            graft.queries.RankSketchSql.Depth,
            graft.queries.RankSketchSql.Width)
          graft.ops.Sketch.rankQuantiles(grid,
            graft.queries.RankSketchSql.Permilles,
            graft.queries.RankSketchSql.Depth,
            graft.queries.RankSketchSql.Width).count()
        }
      },
      "cms_heavy_hitters_by" -> { k =>
        // per-group CMS heavy hitters (round 15): 97 synthetic
        // sources, grids FIXED at 4x1024 cells per group, per-group
        // top-k via WindowGroupLimit. Corpus term is the tokenize +
        // grouped partial agg — expect ~linear, group count constant.
        val d = docsAt(k).withColumn("source",
          pmod(col("doc_id"), lit(97)).cast("string"))
        timeIt(graft.ops.Sketch.cmsHeavyHittersBy(d, "text", "source",
          depth = 4, width = 1024, k = 10).count())
      },
      "bpe_learn" -> { k =>
        // distributed BPE vocabulary training (round 18): ONE
        // corpus-sized pass (word histogram), then 16 sequential
        // vocab-table rounds (pair position count + 1-row argmax +
        // fused merge applies). The z{i} copy prefixes multiply the
        // distinct-word vocabulary by ~k, so both the corpus pass AND
        // the per-round vocab passes ramp — expect ~linear with a
        // rounds×job-floor constant term.
        timeIt(graft.ops.Bpe.learnMerges(docsAt(k), "text",
          maxMerges = 16).size.toLong)
      },
      "bpe_learn_vocab_recount" -> { k =>
        // the VOCAB ramp (round 19, fixed corpus): every word gets a
        // per-doc suffix (doc_id mod 50k), so distinct words multiply
        // ~50k-fold while corpus tokens stay constant — isolating the
        // per-round vocab-table term the two trainer faces differ on.
        // The recount face explodes EVERY pair position of EVERY word
        // each round: expect the 12 rounds to grow ~linearly in k.
        timeIt(graft.ops.Bpe.learnMerges(vocabDocsAt(k), "text",
          maxMerges = 12).size.toLong)
      },
      "bpe_learn_vocab_incremental" -> { k =>
        // same fixture, incremental face: per round only the affected
        // words fold/explode; what still scales with vocab is a
        // columnar array_contains scan (no recompute) plus the
        // pair-count merge (live pairs stay few-k here — char pairs).
        // Expect a visibly flatter exponent than the recount row; the
        // seed corpus pass is the shared constant term.
        timeIt(graft.ops.Bpe.learnMergesIncremental(vocabDocsAt(k),
          "text", maxMerges = 12).size.toLong)
      },
      "bpe_learn_tailvocab_recount" -> { k =>
        // production-tail shape: vocab ramps via disjoint-alphabet
        // junk, the 12 merges and their AFFECTED words stay inside
        // the fixed natural corpus. The recount face still explodes
        // every pair position of every word (junk included) each
        // round — expect growth with k.
        timeIt {
          val ms = graft.ops.Bpe.learnMerges(tailVocabDocsAt(k),
            "text", maxMerges = 12)
          // the fixture's bounded-affected-set premise, asserted
          // rather than assumed (r19 advice): junk pair counts are
          // only statistically small (~8k avg over a 36² uppercase
          // alphabet), so if one ever overtakes the natural corpus in
          // the argmax the cell must fail loudly, not silently
          // measure an unbounded affected set
          require(ms.forall(m => !m.pair.exists(_.isUpper)),
            s"tail-vocab fixture leaked a junk merge at x$k: " +
              ms.filter(_.pair.exists(_.isUpper)).map(_.pair))
          ms.size.toLong
        }
      },
      "bpe_learn_tailvocab_incremental" -> { k =>
        // same fixture, incremental face: per round the junk rows are
        // touched only by the columnar array_contains scan and the
        // state rotation — fold/explode work is bounded by the fixed
        // affected set. Expect a visibly flatter exponent than the
        // recount row; this is the regime the second loop state buys.
        timeIt {
          val ms = graft.ops.Bpe.learnMergesIncremental(
            tailVocabDocsAt(k), "text", maxMerges = 12)
          require(ms.forall(m => !m.pair.exists(_.isUpper)),
            s"tail-vocab fixture leaked a junk merge at x$k: " +
              ms.filter(_.pair.exists(_.isUpper)).map(_.pair))
          ms.size.toLong
        }
      },
      "bpe_learn_vocab_auto" -> { k =>
        // the CHOOSER on the suffix fixture (round 20): the probe
        // must measure a high affected fraction (0.27 at k=4) and
        // commit to the recount face — the measured winner of this
        // regime (r19 ramp: recount 0.14 vs incremental 0.76). Cost =
        // the winner's cell + a 3-round incremental probe.
        timeIt {
          val r = graft.ops.Bpe.learnMergesAuto(vocabDocsAt(k),
            "text", maxMerges = 12)
          require(r.face == "recount", s"auto picked ${r.face} at " +
            s"measured frac ${r.affectedFrac} on the suffix fixture")
          r.merges.size.toLong
        }
      },
      "bpe_learn_tailvocab_auto" -> { k =>
        // the chooser on the production-tail fixture: the probe must
        // measure a tiny affected fraction (6e-4 at k=4) and CONTINUE
        // on the incremental face — its design regime.
        timeIt {
          val r = graft.ops.Bpe.learnMergesAuto(tailVocabDocsAt(k),
            "text", maxMerges = 12)
          require(r.face == "incremental", s"auto picked ${r.face} " +
            s"at measured frac ${r.affectedFrac} on the tail fixture")
          require(r.merges.forall(m => !m.pair.exists(_.isUpper)),
            s"tail-vocab fixture leaked a junk merge at x$k")
          r.merges.size.toLong
        }
      },
      "classifier_train" -> { k =>
        // distributed quality-classifier training (round 19): one
        // corpus pass builds the hashed count features, then 4
        // epochs, each ONE exchange-free pass over the doc-
        // partitioned feature table plus a model-sized (4097-row)
        // gradient collect. Feats rows ramp ~linearly with k (the
        // z{i} prefixes keep grams copy-local); the model never
        // grows — expect ~linear with an epochs×job-floor term.
        val labeled = graft.ops.Classifier.realVsShuffled(
          docsAt(k), "doc_id", "text")
        timeIt(graft.ops.Classifier.train(labeled, "doc_id", "text",
            "y", graft.ops.Classifier.Config(epochs = 4))
          .count(_._2 != 0L).toLong)
      },
      "classifier_retrain" -> { k =>
        // INCREMENTAL retrain (round 20): the stored model — trained
        // OUTSIDE the timed window on the k-ramped base corpus — is
        // warm-start refreshed on a FIXED-size delta (the un-ramped
        // documents table). The base corpus is never re-touched, so
        // the timed cost is delta-shaped: expect a ~flat exponent in
        // k — the daily-gate-refresh claim, measured.
        val wBase = graft.ops.Classifier.train(
          graft.ops.Classifier.realVsShuffled(docsAt(k), "doc_id",
            "text"), "doc_id", "text", "y",
          graft.ops.Classifier.Config(epochs = 2))
        val delta = graft.ops.Classifier.realVsShuffled(docs0,
          "doc_id", "text")
        // one UNTIMED settle run: the k-ramped base training just
        // released k-sized checkpoint blocks (async unpersist) — its
        // GC aftermath must not land inside the fixed-size timed
        // window (first measurement read exponent 0.62 from exactly
        // that; the settled cell reads the design's flat shape)
        graft.ops.Classifier.retrain(delta, "doc_id", "text", "y",
          wBase, graft.ops.Classifier.Config(epochs = 2)): Unit
        System.gc()
        timeIt(graft.ops.Classifier.retrain(delta, "doc_id", "text",
            "y", wBase, graft.ops.Classifier.Config(epochs = 2))
          .count(_._2 != 0L).toLong)
      },
      "lsh_embed_neardup_scaled_planes" -> { k =>
        // the documented operating mode: planes grow with log2(corpus)
        // so expected bucket occupancy is constant — the knob a real
        // 100 TB run must turn. Runs BEFORE the control row so the
        // production measurement never executes in the control's
        // GC/spill aftermath (or not at all, if the control dies).
        val e = embAt(k)
        val planes = 8 + (math.log(k.toDouble) / math.log(2.0)).round.toInt
        timeIt(Similarity.lshNearDup(e, 0.99, nPlanes = planes).count())
      },
      "lsh_embed_neardup_fixed_planes" -> { k =>
        // deliberately WRONG at scale: bucket count frozen at the
        // default 2^8 while the corpus grows, so per-bucket occupancy
        // — and candidate volume — grows quadratically. Kept as the
        // control row (LAST, see above): the superlinear exponent —
        // or an outright abort once Σ|bucket|² spill exceeds the disk
        // — is the failure mode the scaled-planes row exists to avoid.
        val e = embAt(k)
        timeIt(Similarity.lshNearDup(e, 0.99).count())
      })

    val ops: Seq[(String, Int => (Double, Long))] =
      sys.env.get("SPARK_GRAFT_RAMP_OPS")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .fold(allOps)(sel => allOps.filter(p => sel(p._1)))

    // JIT/codegen warmup outside every timed window. Each distinct
    // pipeline shape gets a small-input run: a first-ever execution
    // JIT-compiles its generated classes inside the timed cell
    // otherwise (measured round 11: curate_v3's un-warmed 4× cell read
    // 18.7 s vs 7.3 s at 16× — the 4× cell was mostly JIT, inverting
    // the ramp).
    Dedup.minhashCandidates(docs0.limit(500), "doc_id", "text").count()
    Similarity.lshNearDup(emb0.limit(500), 0.99).count()
    Dedup.spanDedup(docs0.limit(200), "doc_id", "text", 8).count()
    graft.queries.PackQueries.curateV3Frames(docs0.limit(200))._3.count()
    graft.queries.PackQueries.curateV4Frames(docs0.limit(200))._2.count()
    graft.ops.Stats.binnedQuantiles(
      graft.ops.TextAnalysis.repetitionFeatures(docs0.limit(200),
        col("text")), col("dup_token_frac"), Seq(500)).count()
    graft.ops.Stats.mergeProfiles(
      graft.ops.Stats.sourceProfile(
        docs0.limit(200).withColumn("source",
          pmod(col("doc_id"), lit(97)).cast("string")),
        "source", "text", size(split(col("text"), " ")), k = 64),
      "source", k = 64).count()
    Dedup.corpusDiff(docs0.limit(200), docs0.limit(100),
      "doc_id", "text").count()
    graft.ops.Bpe.learnMerges(docs0.limit(200), "text", maxMerges = 2)
    graft.ops.Bpe.learnMergesIncremental(docs0.limit(200), "text",
      maxMerges = 2)
    graft.ops.Classifier.train(
      graft.ops.Classifier.realVsShuffled(docs0.limit(200), "doc_id",
        "text"), "doc_id", "text", "y",
      graft.ops.Classifier.Config(epochs = 1))
    Similarity.ivfPqTopK(emb0.limit(500), emb0.limit(20), 5).count()
    graft.ops.Decontaminate.bloomFlag(docs0.limit(200),
      docs0.limit(50), "doc_id", "text", 4).count()
    graft.ops.TextAnalysis.dsirResample(docs0.limit(200),
      docs0.limit(50), "doc_id", "text", -10000L, 12000L).count()
    graft.ops.Pack.selectUnderBudget(
      graft.ops.TextAnalysis.qualityFeatures(docs0.limit(200), col("text"))
        .select(col("doc_id"), col("n_words").cast("long").as("toks"),
          col("stop_ratio")),
      "doc_id", "toks", "stop_ratio", 10000L).count()
    Similarity.ivfPqEncodeBatch(emb0.limit(200), emb0.limit(500)).count()
    Similarity.semDedup(emb0.limit(500), 0.95).count()
    Similarity.semDedup(emb0.limit(500), 0.95, superFactor = 0).count()
    Similarity.kmeansCentroids(emb0.limit(500), 50, iters = 1).count()
    graft.ops.Quality.stripBoilerplate(
      docs0.limit(200).withColumnRenamed("text", "mltext"),
      "doc_id", "mltext", maxDocFreq = 10L).count()
    Similarity.hardNegativesIvf(
      emb0.limit(500).withColumn("label", (col("vec_id") % 10).cast("int")),
      emb0.limit(20).withColumn("label", (col("vec_id") % 10).cast("int")),
      5).count()
    graft.ops.Sampling.curriculumOrder(
      docs0.limit(200).select(col("doc_id"),
        length(col("text")).cast("double").as("s")),
      "doc_id", col("s"), tiers = 4, shards = 8).count()
    Similarity.meanPoolFp(emb0.limit(500), expr("vec_id div 5"),
      "embedding").count()
    // round-13 shapes: audio decode+fp+CC, constraint report, audit
    locally {
      import spark.implicits._
      import graft.ops.Multimodal
      val warmFp = docs0.limit(100).select(col("doc_id")).as[Long]
        .map { id =>
          val (hi, lo) = Multimodal.audioFingerprint(
            Multimodal.wavPayload(8000, 1 + (id % 2).toInt,
              300 + (id % 400).toInt, id.toInt)).get
          (id, hi, lo)
        }.toDF("media_id", "afp_hi", "afp_lo")
      graft.ops.Dedup.connectedComponents(
        Multimodal.aHashNearDupPairs(warmFp, "media_id",
          "afp_hi", "afp_lo", maxHamming = 3),
        "a_id", "b_id").count()
    }
    locally {
      val warmSel = Similarity.kCenterSelect(emb0.limit(300), 3)
      Similarity.kCenterAssign(emb0.limit(300), warmSel).count()
    }
    graft.verify.Verifier.constraintReport(
      docs0.limit(200).select(col("doc_id"),
        length(col("text")).cast("double").as("len")),
      Seq(graft.verify.Verifier.NotNull("len"),
        graft.verify.Verifier.Unique(Seq("doc_id")))).count()
    graft.ops.Decontaminate.flag(docs0.limit(200), docs0.limit(50),
      "doc_id", "text", n = 4).count()
    graft.ops.Quality.gopherRules(docs0.limit(100), "doc_id", "text")
      .count()
    graft.ops.Quality.c4LineFilter(docs0.limit(100), "doc_id", "text")
      .count()
    // round-14 shapes: FastSS linkage, SCD2 merge, PageRank, CMS
    locally {
      val ids = docs0.limit(300).select(col("doc_id"))
      val nm = ids.select(col("doc_id").as("id"),
        format_string("Customer#%09d", col("doc_id")).as("name"))
      graft.ops.Linkage.fuzzyJoin(nm,
        nm.withColumnRenamed("id", "rid"), "id", "name", "rid", "name",
        maxEdit = 1).count()
      val dim = ids.select(col("doc_id").as("k"),
        (col("doc_id") % 7).cast("string").as("attr"),
        lit("2024-01-01").as("valid_from"),
        lit(null.asInstanceOf[String]).as("valid_to"),
        lit(true).as("is_current"))
      graft.ops.Scd.scd2Merge(dim,
        ids.select(col("doc_id").as("k"),
          (col("doc_id") % 5).cast("string").as("attr")),
        "k", Seq("attr"), "2024-02-01").count()
      val e = ids.select(col("doc_id").as("src"),
        ((col("doc_id") * 48271L) % 300L).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      graft.ops.Graph.pageRank(e, "src", "dst", iterations = 2).count()
      graft.ops.Sketch.cmsHeavyHitters(docs0.limit(200), "text").count()
      // round-14 shapes: HITS, triangles, funnel, retention, KMV
      graft.ops.Graph.hits(e, "src", "dst", iterations = 2).count()
      graft.ops.Graph.triangleCounts(e, "src", "dst").count()
      graft.ops.Graph.kCore(e, "src", "dst", k = 2).count()
      val evw = eventsAt(1).limit(3000)
      graft.ops.Events.funnel(evw, "user_id", "etype", "ts",
        Seq("view", "click"), horizonSeconds = Some(604800L)).count()
      graft.ops.Events.retentionMatrix(evw, "user_id", "ts").count()
      graft.ops.Events.rollingActive(evw, "user_id", "ts").count()
      graft.ops.Sketch.kmvSynopsis(evw, "user_id", 64,
        Seq("etype")).count()
      // round-15 shapes: paths, overlap, session→rank composition,
      // grouped CMS
      graft.ops.Sketch.cmsHeavyHittersBy(
        docs0.limit(200).withColumn("source",
          pmod(col("doc_id"), lit(97)).cast("string")),
        "text", "source", depth = 4, width = 1024, k = 10).count()
      graft.ops.Events.topPaths(evw.withColumn("eid",
        xxhash64(col("user_id"), col("ts"), col("etype"))),
        "user_id", "etype", "ts", "eid").count()
      graft.ops.Sketch.kmvOverlap(evw.filter(col("etype") === "view"),
        evw.filter(col("etype") === "purchase"), "user_id", 64).count()
      locally {
        import spark.implicits._
        val sw = graft.streaming.Sessionize.sessionizeBatch(spark,
          evw.select(col("user_id"),
            unix_millis(col("ts")).as("ts_ms"),
            col("etype").as("event_type"))
            .as[graft.streaming.Sessionize.Event],
          graft.queries.SessionSql.GapMs).toDF()
        graft.ops.Sketch.rankQuantiles(
          graft.ops.Sketch.rankGrid(sw,
            col("end_ms") - col("start_ms")),
          Seq(500)).count(): Unit
      }
    }
    spark.catalog.clearCache()
    ParseRunner.run(spark,
      ContractCatalog.fromDirectory(graft.queries.ParseQueries.CorpusDir),
      logsAt(1).limit(2000), logsAt(1).limit(0),
      s"$out/parse_warm_wh", t => parseFixture._2(t.tableName)): Unit

    // fixed calibration probe (same design as Bench), printed at start
    // and AFTER EVERY OPERATOR: a contended capture shows probe drift
    // around the contention window, while the known self-induced tail
    // drift (the JVM is measurably slower after the deliberately-
    // thrashing fixed-planes control row — reproducible on an idle box
    // across captures) localizes to exactly that row. Read the series,
    // not one start/end ratio: a row is trustworthy when its bracketing
    // probes are both near the baseline. 3 back-to-back iterations per
    // probe: the AQE minPartitionSize fix (r9) halved the
    // single-iteration baseline to ~0.13 s, too light to read.
    def calibrate(): Double =
      timeIt {
        (1 to 3).foreach { _ =>
          docs0.select(xxhash64(col("text")).as("h")).agg(sum("h"))
            .count(): Unit
        }
        0L
      }._1
    val calStart = calibrate()

    // base tables are small (sf0.1: 5k docs / 2k vectors), so the ramp
    // starts at 4x — at 1x the fixed per-job cost (~1-2 s on this box)
    // swamps the operator and the fitted exponent measures scheduler
    // overhead, not scaling (observed: negative exponents)
    val scales = Seq(4, 16, 64)
    println("| operator | " +
      scales.map(k => s"t(${k}x) s | rows(${k}x) |").mkString(" ") +
      " exponent |")
    println("|---|" + scales.map(_ => "---|---|").mkString + "---|")
    val probes = scala.collection.mutable.ArrayBuffer(
      "start" -> calStart)
    ops.foreach { case (name, run) =>
      // a cell may die outright (the fixed-planes control's 64× spill
      // can exceed the box's disk — observed, and itself the lesson
      // that row exists to teach); the harness must survive it, report
      // the crash, and keep measuring the remaining rows
      val rows = scales.map { k =>
        scala.util.Try {
          val (t1, n) = run(k)
          // min-of-2 for cheap cells: a single GC pause is a 3x swing
          // on a seconds-scale sample; long cells amortize it. The
          // re-run gets its own Try: a transient failure there must
          // not discard the valid first sample we already hold.
          val t = if (t1 < 10.0)
            math.min(t1, scala.util.Try(run(k)._1).getOrElse(t1))
          else t1
          (k, t, n)
        }.toEither.left.map { ex =>
          System.err.println(s"[ramp] $name x$k crashed: " +
            s"${ex.getClass.getSimpleName}: ${String.valueOf(ex.getMessage).take(120)}")
          (k, ex.getClass.getSimpleName)
        }
      }
      val good = rows.collect { case Right(r) => r }
      val e = if (good.size >= 2) f"${exponent(good.map(r => (r._1, r._2)))}%.2f"
              else "n/a"
      println(f"| $name | " + rows.map {
        case Right((_, t, n)) => f"$t%.2f | $n%d |"
        case Left((_, why)) => s"CRASH($why) | — |"
      }.mkString(" ") + s" $e |")
      probes += (s"after $name" -> calibrate())
    }
    println("calibration probes (3-iteration, fixed plan): " +
      probes.map { case (tag, t) => f"$tag $t%.2f s" }.mkString(" | "))
    val calEnd = probes.last._2
    println(f"calibration start $calStart%.2f s / end $calEnd%.2f s " +
      f"(spread ${math.max(calStart, calEnd) / math.min(calStart, calEnd)}%.2f)")
    spark.stop()
  }
}
