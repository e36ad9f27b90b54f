package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.ops.{Pack, Sampling}

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

  test("sampling hash never overflows ANSI long on billion-scale ids") {
    import spark.implicits._
    val big = Seq(Long.MaxValue, 4200000001L, 0L, 1L).toDF("id")
    val got = big.select(Sampling.hashU31(col("id")).as("u"))
      .collect().map(_.getLong(0))
    assert(got.forall(u => u >= 0 && u < Sampling.Mod))
  }
}
