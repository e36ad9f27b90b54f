package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.{GraftColumnBridge => CB}

/** Document-deduplication operators (exact, MinHash+LSH, SimHash,
  * n-gram Jaccard) — the candidate-generation patterns a 100 TB
  * training-data pipeline needs. Everything is shuffle-bounded:
  * shingle-explode → hash-partitioned joins, no driver-side state.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep min id. One shuffle on the
    * (high-cardinality, uniform) md5 key — the canonical first pass at
    * any scale. */
  def exact(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(md5(text.cast("binary")).as("text_md5"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"),
        max(id).as("max_id"))

  /** Word n-gram shingles (distinct). Guarded for docs shorter than n. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    // sequence(1, 0) would count DOWN — guard short docs explicitly
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** All-pairs n-gram Jaccard ≥ minSim via shingle-inverted-index join.
    * Standard candidate generation: explode distinct shingles, self-join
    * on shingle (skew-safe: shingle keys are near-unique text), count
    * common, compute J = common / (|A| + |B| - common).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, minSim: Double): DataFrame = {
    val sh = df.select(col(idCol).as("doc"),
        shingles(col(textCol), n).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val inv = sh.select(col("doc"), col("n_sh"), explode(col("sh")).as("s"))
    val a = inv.select(col("doc").as("a_id"), col("n_sh").as("na"), col("s"))
    val b = inv.select(col("doc").as("b_id"), col("n_sh").as("nb"), col("s"))
    a.join(b, Seq("s")).filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("na"), col("nb"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard", col("common").cast("double") /
        (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= minSim)
  }

  /** k MinHash signatures over n-gram shingles: min over the shingle set
    * of xxhash64(seed_i, shingle). Map-side agg keeps the shuffle at
    * |docs| × k, independent of shingle counts. */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    val exploded = df.select(col(idCol).as("doc"),
      explode(shingles(col(textCol), n)).as("s"))
    val mins = (0 until k).map(i =>
      min(xxhash64(lit(i), col("s"))).as(s"mh_$i"))
    exploded.groupBy(col("doc")).agg(mins.head, mins.tail: _*)
  }

  /** LSH banding: k minhashes → bands of r; docs sharing any band bucket
    * are candidates. Returns (band_id, band_key, doc). */
  def lshBands(sig: DataFrame, k: Int, r: Int): DataFrame = {
    val bands = (0 until k / r).map { b =>
      val cols = (b * r until (b + 1) * r).map(i => col(s"mh_$i"))
      struct(lit(b).as("band_id"),
        xxhash64(cols: _*).as("band_key"))
    }
    sig.select(col("doc"), explode(array(bands: _*)).as("bk"))
      .select(col("doc"), col("bk.band_id"), col("bk.band_key"))
  }

  /** Candidate pairs from LSH buckets (deduped across bands). */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 16, r: Int = 4): DataFrame = {
    val bands = lshBands(minhashSignature(df, idCol, textCol, n, k), k, r)
    val a = bands.select(col("band_id"), col("band_key"), col("doc").as("a_id"))
    val b = bands.select(col("band_id"), col("band_key"), col("doc").as("b_id"))
    a.join(b, Seq("band_id", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  def simhash(text: Column): Column =
    CB.column(SimHash64(CB.expression(split(text, " "))))

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidate pairs: block on rotations of the
    * signature's 4 16-bit chunks (docs within hamming ≤ 3 share at least
    * one identical chunk by pigeonhole), verify hamming ≤ maxHam.
    * Blocking keeps the join linear in corpus size. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHam: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("doc"),
      simhash(col(textCol)).as("sig"))
    val chunks = (0 until 4).map(i => struct(lit(i).as("chunk_id"),
      shiftright(col("sig"), i * 16).bitwiseAND(lit(0xffffL)).as("chunk")))
    val blocked = sigs.select(col("doc"), col("sig"),
        explode(array(chunks: _*)).as("c"))
      .select(col("doc"), col("sig"), col("c.chunk_id"), col("c.chunk"))
    val a = blocked.select(col("chunk_id"), col("chunk"),
      col("doc").as("a_id"), col("sig").as("sig_a"))
    val b = blocked.select(col("chunk_id"), col("chunk"),
      col("doc").as("b_id"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk_id", "chunk"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        hamming(col("sig_a"), col("sig_b")).as("ham"))
      .filter(col("ham") <= maxHam)
      .distinct()
  }
}

/** 64-bit SimHash over a token array: per token a 64-bit hash votes ±1
  * on each bit; the signature is the sign vector. CodegenFallback is
  * fine here — cost is dominated by the per-token hashing loop either
  * way. */
case class SimHash64(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = SimHash64.tokenHash(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}

object SimHash64 {
  /** FNV-1a 64 over the token bytes — cheap, stable, public. */
  def tokenHash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}
