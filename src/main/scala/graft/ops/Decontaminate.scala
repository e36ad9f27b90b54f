package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.sql.{GraftColumnBridge => CB}

/** Eval-set decontamination: flag (or drop) training documents that
  * share any word n-gram with an evaluation corpus — the standard
  * leakage guard before a training run (the GPT-3/PaLM-style 8-13-gram
  * overlap rule, re-expressed as a Spark semi join).
  *
  * Scale shape: the eval side collapses to a DISTINCT n-gram-hash set —
  * eval benchmarks are tiny next to a 100 TB corpus, so that set is
  * broadcast and the train side is a single map-side semi join probe;
  * no shuffle of the corpus at all. Grams travel as xxhash64 longs, not
  * strings (8 bytes vs ~50; a 64-bit collision falsely flags one doc —
  * harmless for a filter whose job is over-approximate safety).
  */
object Decontaminate {

  private def grams(textCol: String, n: Int) =
    explode(Dedup.shingles(col(textCol), n)).as("g")

  /** @return train with a `contaminated` boolean appended */
  def flag(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int, broadcastEval: Boolean = true): DataFrame = {
    val evalGrams = {
      val g = evalSet.select(grams(textCol, n))
        .select(xxhash64(col("g")).as("gh")).distinct()
      if (broadcastEval) broadcast(g) else g
    }
    val hit = train
      .select(col(idCol), grams(textCol, n))
      .select(col(idCol), xxhash64(col("g")).as("gh"))
      .join(evalGrams, Seq("gh"), "left_semi")
      .select(col(idCol).as("__hit_id")).distinct()
    train.join(hit, col(idCol) === col("__hit_id"), "left")
      .withColumn("contaminated", col("__hit_id").isNotNull)
      .drop("__hit_id")
  }

  /** The kept corpus: train minus every doc sharing an n-gram with the
    * eval set. */
  def clean(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    flag(train, evalSet, idCol, textCol, n)
      .filter(!col("contaminated")).drop("contaminated")

  /** GRADED contamination: per-doc overlap fraction
    * |distinct grams ∩ eval| / |distinct grams| — the thresholdable
    * signal (drop above x%, down-weight above y%) where the any-hit
    * flag is too blunt (one stock phrase shared with a benchmark
    * should not nuke a 10-page document).
    *
    * Same scale shape as [[flag]]: the denominator is map-side
    * `size(shingles)` (no explode, no shuffle), and only HIT grams —
    * a tiny fraction of the corpus — survive the broadcast semi probe
    * into the per-doc count aggregate. Shingles are distinct per doc
    * on both sides of the oracle, so n_hit counts distinct
    * overlapping grams. Docs shorter than n have no gram evidence:
    * n_grams = 0, overlap = NULL (not 0 — "no evidence" and "clean"
    * must stay distinguishable downstream). The single long/long
    * division is IEEE-identical cross-engine. */
  def overlapScore(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int, broadcastEval: Boolean = true): DataFrame = {
    val evalGrams = {
      val g = evalSet.select(grams(textCol, n))
        .select(xxhash64(col("g")).as("gh")).distinct()
      if (broadcastEval) broadcast(g) else g
    }
    val totals = train.select(col(idCol),
      size(Dedup.shingles(col(textCol), n)).cast("long").as("n_grams"))
    val hits = train
      .select(col(idCol), grams(textCol, n))
      .select(col(idCol), xxhash64(col("g")).as("gh"))
      .join(evalGrams, Seq("gh"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hit"))
    totals.join(hits, Seq(idCol), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("overlap", when(col("n_grams") > 0,
        col("n_hit").cast("double") / col("n_grams").cast("double")))
  }

  /** The Bloom bitset over the eval set's n-gram hashes: `mBits` bits
    * (power of two), `k` probe positions per gram via Kirsch–
    * Mitzenmacher double hashing over Spark's Murmur3 `hash()` of the
    * gram string (the arithmetic lives in [[BloomProbe.positions]] —
    * ONE implementation point shared by this build, the probe codegen,
    * and — because every step is plain 32-bit integer math — the
    * DuckDB oracle replay).
    *
    * The collect here is bounded by |distinct eval grams| (one Int
    * each): eval benchmarks are small BY DEFINITION — that asymmetry is
    * the whole reason decontamination broadcasts. At mBits = 2²⁰ the
    * bitset is 128 KB; a 100 TB corpus probes it map-side with zero
    * corpus shuffle AND zero per-executor hash-set memory (the win
    * over [[flag]]'s broadcast gram-set join: a 10 M-gram eval suite
    * is ~80 MB as a broadcast long set but still 128 KB as a Bloom —
    * at the price of a quantified false-positive rate, acceptable for
    * an over-approximate safety filter). */
  def bloomBits(evalSet: DataFrame, textCol: String, n: Int,
      mBits: Int, k: Int): Array[Long] = {
    val hs = evalSet
      .select(explode(Dedup.shingles(col(textCol), n)).as("g"))
      .select(hash(col("g")).as("h")).distinct()
      .collect().map(_.getInt(0))
    val bits = new Array[Long](mBits >>> 6)
    hs.foreach { h =>
      BloomProbe.positions(h, mBits, k)
        .foreach(p => bits((p >>> 6).toInt) |= (1L << p))
    }
    bits
  }

  /** [[flag]]'s scale successor: `contaminated` computed by probing a
    * Bloom bitset of the eval grams inside a single `exists` over the
    * doc's shingle array — no explode, no join, no shuffle; the corpus
    * plan is scan → project. Over-approximate by construction (every
    * truly-contaminated doc is flagged; a false-positive gram can flag
    * a clean one — rate ≈ occupancy^k, sized by mBits). Docs shorter
    * than n tokens have no gram evidence and are never flagged, same
    * as [[flag]]; null text likewise flags false, not NULL — the
    * coalesce below, because `exists` over the null shingle array
    * yields NULL while the oracle's IN-subquery spelling yields
    * false, and a safety FILTER's consumers branch on the flag (a
    * NULL would silently drop the doc from both the contaminated and
    * the clean side of a split). */
  def bloomFlag(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int, mBits: Int = 1 << 20,
      k: Int = 3): DataFrame = {
    val bits = bloomBits(evalSet, textCol, n, mBits, k)
    train.withColumn("contaminated",
      coalesce(exists(Dedup.shingles(col(textCol), n),
        g => CB.column(BloomProbe(CB.expression(hash(g)), bits, mBits, k))),
        lit(false)))
  }
}

/** Membership probe against a fixed Bloom bitset. Codegen'd via the
  * static-helper pattern ([[SimHash64]] et al.); the bitset rides the
  * generated class as a reference object — one `long[]` per plan, not
  * per row. All arithmetic is 32-bit-range integer math chosen to
  * replay exactly in DuckDB BIGINT SQL (no 64-bit wrap-around): see
  * `q_bloom_decontaminate`'s oracle. */
case class BloomProbe(child: Expression, bits: Array[Long], mBits: Int,
    k: Int) extends UnaryExpression {
  require(Integer.bitCount(mBits) == 1 && mBits >= 64,
    s"mBits must be a power of two >= 64, got $mBits")
  require(k >= 1, s"k must be >= 1, got $k")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  protected override def nullSafeEval(v: Any): Any =
    BloomProbe.contains(bits, mBits, k, v.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.ops.BloomProbe.contains($ref, $mBits, $k, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BloomProbe {
  /** Kirsch–Mitzenmacher double hashing from one 32-bit base hash:
    * u = h as unsigned; h2 = ((u ^ (u >>> 16)) · 1103515245) mod 2³²,
    * forced odd; position i = (u + i·h2) mod mBits. The multiplier is
    * < 2³¹ so every product fits a signed 64-bit integer — the whole
    * chain replays in DuckDB BIGINT with `xor`, `//` and `%` (the
    * mixer prevents the i·h2 strides of co-low-bit hashes from
    * marching in lockstep; forcing h2 odd keeps the stride a unit mod
    * the power-of-two mBits so the k positions are distinct). */
  def positions(h: Int, mBits: Int, k: Int): Array[Long] = {
    val u = h.toLong & 0xFFFFFFFFL
    val h2 = (((u ^ (u >>> 16)) * 1103515245L) & 0xFFFFFFFFL) | 1L
    Array.tabulate(k)(i => (u + i.toLong * h2) & (mBits - 1).toLong)
  }

  /** True iff all k positions for h are set — shared verbatim by the
    * interpreted eval and the generated code. */
  def contains(bits: Array[Long], mBits: Int, k: Int, h: Int): Boolean = {
    val u = h.toLong & 0xFFFFFFFFL
    val h2 = (((u ^ (u >>> 16)) * 1103515245L) & 0xFFFFFFFFL) | 1L
    var i = 0
    while (i < k) {
      val pos = (u + i.toLong * h2) & (mBits - 1).toLong
      if ((bits((pos >>> 6).toInt) & (1L << pos)) == 0L) return false
      i += 1
    }
    true
  }
}
