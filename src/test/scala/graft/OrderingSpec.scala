package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.ops.{Sampling, Similarity, Stats}

/** Curriculum ordering, skew report, and fixed-point pooling —
  * structural properties beyond the catalog oracles. */
class OrderingSpec extends AnyFunSuite {
  import TestSession._

  test("curriculumOrder: tier-monotone, globally unique positions, " +
      "within-tier order == trainingOrder's") {
    val docs = Tables.df(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"))
    val out = Sampling.curriculumOrder(docs, "doc_id",
      col("n_chars").cast("double"), tiers = 4, shards = 8).collect()
    assert(out.length === docs.count())
    val pos = out.map(_.getAs[Long]("curriculum_pos"))
    assert(pos.distinct.length === pos.length, "positions must be unique")
    // tier-monotone: every tier-t position precedes every tier-(t+1)
    val byTier = out.groupBy(_.getAs[Long]("tier"))
    val tiersSorted = byTier.keys.toSeq.sorted
    tiersSorted.sliding(2).foreach {
      case Seq(a, b) =>
        val maxA = byTier(a).map(_.getAs[Long]("curriculum_pos")).max
        val minB = byTier(b).map(_.getAs[Long]("curriculum_pos")).min
        assert(maxA < minB, s"tier $a overlaps tier $b")
      case _ =>
    }
    // scores are tiered ascending: mean score grows with tier
    val scoreById = docs.collect()
      .map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
    val meansByTier = tiersSorted.map { t =>
      val s = byTier(t).map(r => scoreById(r.getAs[Long]("doc_id")))
      s.sum / s.length
    }
    assert(meansByTier.sliding(2).forall {
      case Seq(a, b) => a <= b
      case _ => true
    }, s"tier means not ascending: $meansByTier")
  }

  test("curriculumOrder runs at tiers=3 (the canonical CCNet " +
      "head/middle/tail split — a non-divisor of 1000)") {
    val docs = Tables.df(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"))
    val out = Sampling.curriculumOrder(docs, "doc_id",
      col("n_chars").cast("double"), tiers = 3, shards = 4).collect()
    assert(out.length === docs.count())
    assert(out.map(_.getAs[Long]("tier")).toSet === Set(1L, 2L, 3L))
    val pos = out.map(_.getAs[Long]("curriculum_pos"))
    assert(pos.distinct.length === pos.length)
  }

  test("skewReport: counts, exact ppm shares, deterministic top-k") {
    import spark.implicits._
    val df = (Seq.fill(6)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L))
      .toDF("k")
    val got = Stats.skewReport(df, col("k"), 2).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq((1L, 6L, 600000L), (2L, 3L, 300000L)))
  }

  test("meanPoolFp: floor-quantized sums and floored mean, exact") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(1.5f, -0.25f)),
      (1L, Seq(0.5f, 0.75f))).toDF("vec_id", "embedding")
    val got = Similarity.meanPoolFp(df, lit(0L), "embedding", bits = 2)
      .orderBy("dim").collect()
    // scale 4: dim0 floor(6.0)+floor(2.0)=8 -> mean 4;
    // dim1 floor(-1.0)+floor(3.0)=2 -> mean 1
    assert(got.map(r => (r.getAs[Long]("dim"), r.getAs[Long]("n_chunks"),
      r.getAs[Long]("sum_fp"), r.getAs[Long]("pool_fp"))).toSeq ===
      Seq((0L, 2L, 8L, 4L), (1L, 2L, 2L, 1L)))
    // negative mean floors toward -inf on both engines: sum -3 / 2 -> -2
    val neg = Seq((0L, Seq(-0.25f)), (1L, Seq(-0.5f)))
      .toDF("vec_id", "embedding")
    val g2 = Similarity.meanPoolFp(neg, lit(0L), "embedding", bits = 2)
      .collect().head
    assert(g2.getAs[Long]("sum_fp") === -3L)
    assert(g2.getAs[Long]("pool_fp") === -2L)
  }
}
