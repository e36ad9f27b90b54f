package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.ops.{Pack, Sampling, TextAnalysis}

class PackSpec extends AnyFunSuite {
  import TestSession._

  private def packsEqual(shards: Int): Unit = {
    val docs = Tables.df(spark, sf, "documents")
    val dist = Pack.sequencePack(docs, "doc_id", "n_chars", 2048L, shards)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val glob = Pack.sequencePackGlobal(docs, "doc_id", "n_chars", 2048L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(dist.sameElements(glob))
  }

  test("distributed prefix-sum pack == single-window reference (4 shards)") {
    packsEqual(4)
  }

  test("shard count never changes the packing (1 vs 16 shards)") {
    packsEqual(1)
    packsEqual(16)
  }

  test("pack sizes respect the budget (within one max-doc overshoot)") {
    val docs = Tables.df(spark, sf, "documents")
    val budget = 2048L
    val packed = Pack.sequencePack(docs, "doc_id", "n_chars", budget)
    val maxDoc = docs.agg(max(coalesce(col("n_chars"), lit(0L))))
      .head().getLong(0)
    val sizes = Pack.packSizes(packed).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sizes.nonEmpty)
    // with every doc smaller than the budget, pack ids are contiguous
    assert(maxDoc < budget)
    assert(sizes.keySet == (0L until sizes.size).toSet)
    // a pack spans cum totals [k*b, (k+1)*b) with docs ≤ maxDoc, so its
    // size is within one max-doc of the budget on both sides
    sizes.foreach { case (_, t) => assert(t < budget + maxDoc) }
    val last = sizes.keys.max
    sizes.filter(_._1 != last).foreach { case (_, t) =>
      assert(t > budget - maxDoc)
    }
  }

  test("budget selection keeps the maximal affordable score-ranked " +
      "prefix; shard count never changes it") {
    import spark.implicits._
    // hand case: rank by (score desc, id) → ids 5,1,4,2,3; cum 10,30,
    // 60,100,150 under budget 99 keeps {5,1,4} — doc 2 (cum 100)
    // busts the budget, and PREFIX semantics also excludes doc 3 even
    // though its 50 would fit in the leftover 39: selection is an
    // order-prefix, not a knapsack fill
    val docs = Seq(
      (1L, 20L, 0.9), (2L, 40L, 0.5), (3L, 50L, 0.4),
      (4L, 30L, 0.7), (5L, 10L, 0.95)
    ).toDF("id", "toks", "score")
    val kept = Pack.selectUnderBudget(docs, "id", "toks", "score", 99L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(kept == Map(5L -> 10L, 1L -> 30L, 4L -> 60L))
    // null score rows are excluded (no ranking evidence), null tokens
    // count 0 (free)
    val edge = Seq(
      (1L, Some(20L), Some(0.9)), (2L, None, Some(0.8)),
      (3L, Some(5L), None)
    ).toDF("id", "toks", "score")
    val keptE = Pack.selectUnderBudget(edge, "id", "toks", "score", 20L)
      .collect().map(_.getLong(0)).toSet
    assert(keptE == Set(1L, 2L))
    // sharded ≡ the semantics at any shard count, on the real corpus
    val feats = TextAnalysis.qualityFeatures(
        Tables.df(spark, sf, "documents"),
        org.apache.spark.sql.functions.col("text"))
      .select(col("doc_id"), col("n_words").cast("long").as("toks"),
        col("stop_ratio"))
    def sel(shards: Int) =
      Pack.selectUnderBudget(feats, "doc_id", "toks", "stop_ratio",
          1300L, shards)
        .collect().map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    val one = sel(1)
    assert(one.nonEmpty && sel(4) == one && sel(16) == one)
  }

  test("per-source budget selection spends each source's budget " +
      "independently") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", 30L, 0.9), (2L, "a", 30L, 0.8), (3L, "a", 30L, 0.7),
      (4L, "b", 50L, 0.1), (5L, "b", 20L, 0.2)
    ).toDF("id", "src", "toks", "score")
    val kept = Pack.selectUnderBudgetBySource(
        docs, "id", "toks", "score", "src", 60L)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    // source a: 1 (30), 2 (60), 3 busts; source b: 5 first by score
    // (20), then 4 busts (70) — a's spending never affects b's
    assert(kept == Map(1L -> 30L, 2L -> 60L, 5L -> 20L))
  }

  test("null token counts pack as zero; empty input packs to empty") {
    import spark.implicits._
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(5L)))
      .toDF("id", "tk")
    val got = Pack.sequencePack(df, "id", "tk", 8L, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // cum_excl: 0, 10, 10 → packs 0, 1, 1
    assert(got.toSeq == Seq((1L, 10L, 0L), (2L, 0L, 1L), (3L, 5L, 1L)))

    val empty = Pack.sequencePack(df.filter(lit(false)), "id", "tk", 8L)
    assert(empty.count() == 0)
  }

  test("mixture sampling is deterministic and weight-monotone") {
    val docs = Tables.df(spark, sf, "documents")
    val n = docs.count()
    def kept(w: Map[String, Double]): Set[Long] =
      Sampling.weightedBySource(docs, "doc_id", "source", w)
        .select("doc_id").collect().map(_.getLong(0)).toSet

    val all = (0 until 20).map(i => s"src$i" -> 1.0).toMap
    val none = (0 until 20).map(i => s"src$i" -> 0.0).toMap
    val half = (0 until 20).map(i => s"src$i" -> 0.5).toMap
    assert(kept(all).size == n)
    assert(kept(none).isEmpty)
    val h = kept(half)
    // same run twice → identical sample; subset of the full corpus
    assert(h == kept(half))
    assert(h.subsetOf(kept(all)))
    // roughly half kept (hash is uniform; 500 docs → loose bound)
    assert(h.size > n * 0.35 && h.size < n * 0.65)
    // sources absent from the map are dropped entirely
    val only0 = Map("src0" -> 1.0)
    val k0 = Sampling.weightedBySource(docs, "doc_id", "source", only0)
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(k0 == Set("src0"))
  }

  test("stratified sampling returns exactly k per stratum, deterministically") {
    val docs = Tables.df(spark, sf, "documents")
    val got = Sampling.stratifiedK(docs, "doc_id", "source", 3)
    val counts = got.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 3L))
    // deterministic: same ids both runs
    val ids1 = got.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratifiedK(docs, "doc_id", "source", 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // k larger than the stratum returns the whole stratum
    val all = Sampling.stratifiedK(docs, "doc_id", "source", 100000)
    assert(all.count() == docs.count())
  }

  test("epoch repetition emits floor(w) copies plus a hash-gated extra") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, "s")).toDF("id", "src")
    def epochs(w: Double): Map[Long, Long] =
      Sampling.epochRepeat(df, "id", "src", Map("s" -> w))
        .groupBy("id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val e2 = epochs(2.0)
    assert(e2.size == 100 && e2.values.forall(_ == 2L))
    val e25 = epochs(2.5)
    assert(e25.values.forall(n => n == 2L || n == 3L))
    val extra = e25.values.count(_ == 3L)
    assert(extra > 25 && extra < 75) // ≈ half, hash-selected
    // w < 1 degenerates to weightedBySource membership
    val e05 = epochs(0.5)
    val kept = Sampling.weightedBySource(df, "id", "src", Map("s" -> 0.5))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(e05.keySet == kept && e05.values.forall(_ == 1L))
    // unknown source → dropped entirely
    assert(Sampling.epochRepeat(df, "id", "src", Map("other" -> 2.0))
      .count() == 0)
  }

  test("training order: unique interleaved positions, no global sort") {
    val docs = Tables.df(spark, sf, "documents")
    val n = docs.count()
    val got = Sampling.trainingOrder(docs, "doc_id", shards = 8)
    val rows = got.select("doc_id", "shard", "global_pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every doc appears once, every position is unique
    assert(rows.length == n && rows.map(_._1).distinct.length == n)
    assert(rows.map(_._3).distinct.length == n)
    // position encodes its shard (round-robin interleave)
    assert(rows.forall { case (_, s, p) => p % 8 == s })
    // within a shard, ascending position follows ascending hash —
    // i.e. the per-shard order IS the pseudorandom hash order
    rows.groupBy(_._2).values.foreach { sh =>
      val byPos = sh.sortBy(_._3).map(_._1)
      val byHash = sh.sortBy { case (id, _, _) =>
        val p = 2147483647L
        (((((id % (p - 1) + 1) * 48271) % p) * 48271 % p) * 48271 % p, id)
      }.map(_._1)
      assert(byPos.toSeq == byHash.toSeq)
    }
    // deterministic across runs
    val again = Sampling.trainingOrder(docs, "doc_id", shards = 8)
      .select("doc_id", "global_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(t => t._1 -> t._3).toMap == again)
    // scale contract: the window partitions by shard — the physical
    // plan must NOT collapse to a single global partition
    val phys = got.queryExecution.executedPlan.toString
    assert(!phys.contains("SinglePartition"),
      s"training order must never hit a single-partition exchange:\n$phys")
  }

  test("training order survives the shard-partitioned write→read trip") {
    // the trainer-side contract (not just the in-memory frame): write
    // partitioned by `shard` — the layout the docstring prescribes at
    // corpus scale — read it back cold, stream ascending global_pos,
    // and the document sequence must be the documented round-robin
    // shard interleave, identical to the in-memory order
    val docs = Tables.df(spark, sf, "documents")
    val ordered = Sampling.trainingOrder(docs, "doc_id", shards = 8)
      .select("doc_id", "shard", "global_pos")
    val expect = ordered.collect()
      .map(r => (r.getLong(2), r.getLong(0))).sortBy(_._1).map(_._2)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_train_order").toString
    ordered.write.mode("overwrite").partitionBy("shard").parquet(dir)
    val back = spark.read.parquet(dir)
      .orderBy("global_pos")
      .collect().map(r => (r.getAs[Long]("global_pos"),
        r.getAs[Long]("doc_id"), r.getAs[Int]("shard")))
    // same documents in the same global order after the round trip
    assert(back.map(_._2).toSeq == expect.toSeq)
    // the partition column survives as the position's residue — a
    // trainer reading one shard directory gets exactly the positions
    // ≡ shard (mod 8), so per-shard files stream disjoint slices of
    // the global order
    assert(back.forall { case (p, _, s) => p % 8 == s })
  }

  test("sampling hash never overflows ANSI long; id 0 is no fixed point") {
    import spark.implicits._
    val big = Seq(Long.MaxValue, 4200000001L, 0L, 1L).toDF("id")
    val got = big.select(Sampling.hashU31(col("id")).as("u"))
      .collect().map(_.getLong(0))
    // range [1, p): the seed is remapped into the MINSTD domain, so no
    // id (notably 0, the raw generator's fixed point) hashes to 0 and
    // gets sampled with probability 1
    assert(got.forall(u => u >= 1 && u < Sampling.Mod))
    assert(got.distinct.length == got.length)
  }

  test("unimaxSample: caps bind for small sources, fair shares split " +
      "the rest, leftovers stay unspent when every source caps out") {
    import spark.implicits._
    // A: 1 doc, B: 2 docs, C: 5 docs
    val d = (Seq((0L, "A")) ++ (1L to 2L).map((_, "B")) ++
      (10L to 14L).map((_, "C"))).toDF("doc_id", "src")
    def run(budget: Long, cap: Int): Map[String, (Long, Long)] =
      Sampling.unimaxSample(d, "doc_id", "src", budget, cap)
        .groupBy("src")
        .agg(sum("n_copies").as("copies"), count(lit(1)).as("docs"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
    // budget 6, cap 2: walk A(fair 2, capped 2) → B(fair 2) →
    // C(fair 2): A's doc repeats twice, B's docs once each, C draws
    // 2 of 5 docs
    assert(run(6, 2) === Map(
      "A" -> ((2L, 1L)), "B" -> ((2L, 2L)), "C" -> ((2L, 2L))))
    // budget 20, cap 2: every source caps out (2+4+10=16 < 20) — the
    // leftover stays UNSPENT, never over-repeats a source
    assert(run(20, 2) === Map(
      "A" -> ((2L, 1L)), "B" -> ((4L, 2L)), "C" -> ((10L, 5L))))
    // budget below the smallest fair share still floors cleanly
    val tiny = Sampling.unimaxSample(d, "doc_id", "src", 2, 2)
      .agg(sum("n_copies")).collect()(0).getLong(0)
    assert(tiny <= 2)
  }
}
