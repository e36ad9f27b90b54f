package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Quality

/** Hand-verified cases for the quality filters ([[graft.ops.Quality]]);
  * the corpus-scale differential lives in QualityQueries' oracles. */
class QualitySpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("gopherRules computes the documented features on a hand doc") {
    // 2 lines, 6 words; '-' bullet word + ellipsis line
    val doc = "- the cat sat...\nab cd."
    val out = Quality.gopherRules(
      Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text",
      minWords = 1, minStopHits = 1).collect().head
    assert(out.getAs[Long]("n_words_g") === 6L)
    assert(out.getAs[Long]("n_lines_g") === 2L)
    // chars: len(doc)=23, separators 5 -> 18/6 = 3.0
    assert(out.getAs[Double]("mean_word_len") === 3.0)
    assert(out.getAs[Double]("bullet_ratio") === 0.5)
    assert(out.getAs[Double]("ellipsis_ratio") === 0.5)
    // '-' has no letter: 5/6 alpha
    assert(math.abs(out.getAs[Double]("alpha_ratio") - 5.0 / 6) < 1e-12)
    assert(out.getAs[Long]("n_stop_distinct") === 1L) // 'the'
    // ellipsis_ratio 0.5 > 0.3 -> fails the composite
    assert(!out.getAs[Boolean]("keep"))
  }

  test("words/gopherRules robust to separator RUNS: blank lines, " +
      "double spaces, leading/trailing whitespace add no empty words") {
    // 7 real words behind a leading space, a paragraph break, double
    // spaces, and a trailing newline — the round-12 advisor's case
    val doc = " the cat  sat\n\nand the  dog ran\n"
    val out = Quality.gopherRules(
      Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text",
      minWords = 1, minStopHits = 1).collect().head
    assert(out.getAs[Long]("n_words_g") === 7L)
    // mean word length from the words' own char mass, not
    // length-minus-separators: 7 three-char words
    assert(out.getAs[Double]("mean_word_len") === 3.0)
    assert(out.getAs[Double]("alpha_ratio") === 1.0)
    assert(out.getAs[Long]("n_stop_distinct") === 2L) // 'the', 'and'
    assert(out.getAs[Boolean]("keep"))
  }

  test("symbolRatio counts the one-char Unicode ellipsis U+2026") {
    val doc = "one two three… four # five"
    val out = Quality.gopherRules(
      Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text",
      minWords = 1, minStopHits = 0).collect().head
    assert(out.getAs[Long]("n_words_g") === 6L)
    // '…' and '#' both count: 2 symbols / 6 words
    assert(math.abs(out.getAs[Double]("symbol_ratio") - 2.0 / 6) < 1e-12)
  }

  test("c4LineFilter keeps terminal-punct >=minWords lines, in order") {
    val doc = Seq(
      "one two three four five.",  // kept
      "short.",                    // < 5 words
      "no terminal punct here",    // no punct
      "a b c d e f...",            // ellipsis excluded
      "alpha beta gamma delta eps!" // kept
    ).mkString("\n")
    val out = Quality.c4LineFilter(
      Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text",
      minLineWords = 5, minKeptLines = 2).collect().head
    assert(out.getAs[Long]("n_lines_c4") === 5L)
    assert(out.getAs[Long]("n_lines_kept") === 2L)
    assert(out.getAs[String]("text_c4") ===
      "one two three four five.\nalpha beta gamma delta eps!")
    assert(out.getAs[Boolean]("keep"))
  }

  test("repetitionRules charges duplicates to later occurrences only") {
    // lines: A(3ch), B(1ch), A, A, C(2ch) -> 2 dup lines of 3 chars
    // each; dup_line_frac = 1 - 3/5; dup chars = 6 of 12
    val doc = "aaa\nb\naaa\naaa\ncc"
    val out = Quality.repetitionRules(
      Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(out.getAs[Long]("n_lines_r") === 5L)
    assert(math.abs(out.getAs[Double]("dup_line_frac") - 0.4) < 1e-12)
    assert(math.abs(out.getAs[Double]("dup_line_char_frac") - 0.5) < 1e-12)
    assert(!out.getAs[Boolean]("keep"))
    // all-distinct doc keeps
    val clean = Quality.repetitionRules(
      Seq((2L, "one\ntwo\nthree")).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    assert(clean.getAs[Double]("dup_line_frac") === 0.0)
    assert(clean.getAs[Boolean]("keep"))
  }

  test("stripBoilerplate removes frequent lines, keeps order, empties " +
      "fully-boilerplate docs") {
    val docs = Seq(
      (1L, "HDR\nu1 a\nu1 b"),
      (2L, "HDR\nu2 a"),
      (3L, "HDR\nu3 a\nHDR"), // repeats its own header: counted once
      (4L, "HDR")             // nothing but boilerplate
    ).toDF("doc_id", "text")
    val out = Quality.stripBoilerplate(docs, "doc_id", "text",
      maxDocFreq = 3L)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("text_clean")).toSeq ===
      Seq("u1 a\nu1 b", "u2 a", "u3 a", ""))
    assert(out.map(_.getAs[Long]("n_lines_kept")).toSeq ===
      Seq(2L, 1L, 1L, 0L))
    assert(out.map(_.getAs[Long]("n_lines_orig")).toSeq ===
      Seq(3L, 2L, 3L, 1L))
    // below the threshold nothing is frequent: identity
    val loose = Quality.stripBoilerplate(docs, "doc_id", "text",
      maxDocFreq = 4L).orderBy("doc_id").collect()
    assert(loose.map(_.getAs[Long]("n_lines_kept")).toSeq ===
      Seq(3L, 2L, 3L, 1L))
  }
}
