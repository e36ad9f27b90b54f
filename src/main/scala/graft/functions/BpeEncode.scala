package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic byte-pair-encoding tokenizer (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" —
  * public; the greedy rank-merge ENCODE is the GPT-2 style applied at
  * character level). Whitespace-split words each start as a
  * code-point sequence; the encode loop repeatedly merges the
  * LEFTMOST occurrence of the lowest-rank adjacent pair found in the
  * merges table until no pair applies; the document's token list is
  * the word token lists concatenated in order.
  *
  * "Leftmost occurrence of the best-rank pair, one merge per step" is
  * the operator's DEFINED rule (simultaneous-all-occurrences is the
  * other common convention): it makes every step a pure function of
  * the current token list, which is exactly what a SQL recursive CTE
  * can replay — the whole tokenizer differentials against DuckDB with
  * the merges list as a literal array and `list_position` as the rank
  * lookup (q_tokenize_bpe).
  *
  * The merges table is a FIXED, ordered vocabulary artifact (rank =
  * position), trained offline — like any production tokenizer, the
  * same merges file is shipped to every job, so the expression takes
  * it as a constructor constant and the rank map rides codegen as a
  * referenced object: the merge loop is one static call per row
  * inside WholeStageCodegen, no per-row parsing of the table.
  *
  * Null text → null. Scale shape: pure per-row map, no shuffle; cost
  * is O(word_len²) per word worst-case (each step rescans the pairs
  * of a strictly-shrinking list), with word_len bounded by the
  * longest whitespace-free run in the corpus. */
case class BpeEncode(child: Expression, merges: Seq[String])
    extends UnaryExpression {
  require(merges.nonEmpty, "BpeEncode needs a non-empty merges table")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs a string input, got ${other.catalogString}")
    }

  /** rank lookup: "left right" → 1-based rank (the oracle's
    * list_position), built once per expression instance */
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case (p, i) =>
      // first (lowest) rank wins on duplicate table entries
      if (!m.containsKey(p)) m.put(p, Integer.valueOf(i + 1))
    }
    m
  }

  protected override def nullSafeEval(v: Any): Any =
    BpeEncode.encode(v.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      classOf[java.util.HashMap[String, Integer]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeEncode.encode($c, $ranksRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeEncode {

  /** Shared verbatim by interpreted eval and generated code. */
  def encode(text: UTF8String,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    for (word <- text.toString.split(" ") if word.nonEmpty) {
      // seed: one token per code point (the oracle's
      // regexp_extract_all(word, '[\s\S]') — every code point,
      // control separators included, matching this loop exactly)
      var toks = {
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < word.length) {
          val cp = word.codePointAt(i)
          b += new String(Character.toChars(cp))
          i += Character.charCount(cp)
        }
        b
      }
      var done = toks.size < 2
      while (!done) {
        // leftmost occurrence of the lowest-rank adjacent pair
        var bestRank = Int.MaxValue
        var bestIdx = -1
        var i = 0
        while (i < toks.size - 1) {
          val r = ranks.get(toks(i) + " " + toks(i + 1))
          if (r != null && r.intValue() < bestRank) {
            bestRank = r.intValue(); bestIdx = i
          }
          i += 1
        }
        if (bestIdx < 0) done = true
        else {
          toks(bestIdx) = toks(bestIdx) + toks(bestIdx + 1)
          toks.remove(bestIdx + 1)
          if (toks.size < 2) done = true
        }
      }
      toks.foreach(t => out += UTF8String.fromString(t))
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** The repo's fixture merges table — a fixed vocabulary artifact
  * (rank = position), BPE-trained offline on the synthetic documents
  * corpus with the standard rule (most frequent adjacent pair, ties →
  * lexicographically smallest, all occurrences merged per round, stop
  * below count 2), then TRUNCATED at 40 merges: full training on the
  * tiny synthetic vocabulary converges to whole words (encode ≡
  * whitespace counting — measured 27 165 tokens = 27 165 words),
  * while the 40-merge prefix keeps genuine subword structure (69 935
  * tokens, 2.57×/word, word lengths 1–5 tokens). Training data
  * regenerating per round is fine: the merges are a frozen artifact
  * like any shipped tokenizer vocab, and encode + oracle replay the
  * SAME table whatever the text says. */
object BpeFixture {
  val Merges: IndexedSeq[String] = IndexedSeq(
    "e r", "i n", "o w", "o r", "s t", "m er", "a t", "l u", "a r",
    "p ar", "j o", "jo in", "a s", "as h", "h ash", "r ow", "at c",
    "atc h", "b atch", "a n", "c an", "s can", "c o", "c u", "co lu",
    "colu m", "colum n", "cu st", "cust o", "custo mer", "f i", "fi l",
    "fil t", "filt er", "a l", "al l", "m all", "s mall", "g e",
    "l ow")

  /** The merges as a DuckDB literal list — the oracle's rank table. */
  def sqlLiteral: String =
    Merges.map(m => s"'$m'").mkString("[", ", ", "]")
}
