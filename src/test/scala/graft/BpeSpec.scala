package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.functions.BpeFixture
import graft.ops.Bpe

/** BPE vocabulary LEARNING (graft.ops.Bpe): the distributed trainer's
  * total order, merge semantics, stop rule, and its round-trip into
  * the encode expression. The corpus-level differential (counts
  * included, 40 rounds vs an unrolled recursive-CTE replay) is
  * q_bpe_learn / q_bpe_learn_fertility in the driver's oracle gate;
  * these specs pin the semantics on corpora small enough to verify by
  * hand, plus the fixture-reproduction identity that ties the shipped
  * tokenizer vocabulary to the trainer. */
class BpeSpec extends AnyFunSuite {
  import TestSession._

  private def corpus(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  // the corpus BpeFixture.Merges was trained on (the sf0.001 slice is
  // a different document sample and trains a different vocabulary)
  private val fixtureSf = "/root/testdata/sf0.01"

  test("learnMerges reproduces the shipped fixture vocabulary at 40 merges") {
    // BpeFixture.Merges was trained with the documented rule on the
    // synthetic documents corpus; the engine's trainer must land on
    // the identical 40-merge prefix — pair AND order
    val docs = Tables.df(spark, fixtureSf, "documents")
    val learned = Bpe.learnMerges(docs, "text", maxMerges = 40)
    assert(learned.map(_.pair) == BpeFixture.Merges)
    // counts are positive and non-increasing (each new pair's count is
    // bounded by the merge that created its token; old pairs only lose)
    assert(learned.forall(_.cnt >= 2L))
    assert(learned.map(_.cnt).sliding(2).forall {
      case Seq(a, b) => a >= b
      case _         => true
    })
  }

  test("incremental update projection folds the merge ONCE per row " +
      "(CollapseProject must not re-inline the fold)") {
    // the O(affected) contract's plan shape (r19 advice): the two
    // stacked projections keep exactly ONE applyMerge fold in the
    // optimized plan — the pairs rebuild consumes the materialized
    // merged array. CollapseProject re-inlining `toks` would surface
    // as a second aggregate(...) fold here; correctness would hold,
    // the per-affected-row cost would double.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // columns derive from range's id so neither the hit probe nor
    // the fold is constant-foldable (a literal fixture optimizes to
    // a LocalRelation and the plan under test vanishes)
    val df = spark.range(2).select(
      col("id").cast("string").as("word"),
      array(when(col("id") === 0, "a").otherwise("x"), lit("b"))
        .as("toks"),
      (col("id") + 1).as("freq"),
      array(concat(when(col("id") === 0, "a").otherwise("x"),
        lit(" b"))).as("pairs"))
    val proj = Bpe.updateProjection(df, "a b", "a", "b")
    val plan = proj.queryExecution.optimizedPlan.toString
    // exactly ONE fold: a second would mean CollapseProject
    // re-inlined it into the pairs rebuild, or a size filter was
    // pushed below the rewrite with the fold substituted into it
    val folds = "aggregate\\(".r.findAllIn(plan).size
    assert(folds == 1,
      s"expected exactly 1 merge fold in the optimized plan, got " +
        s"$folds:\n$plan")
    // and the rewrite itself is correct on the tiny fixture: row 0
    // ("a b") merges to one token and drops out; row 1 ("x b") is
    // unaffected and passes its stored columns through
    val out = proj.as[(String, Seq[String], Long, Seq[String])]
      .collect().toSeq
    assert(out == Seq(("1", Seq("x", "b"), 2L, Seq("x b"))))
  }

  test("ties break to the lexicographically smallest pair") {
    // "ab" and "cd" both appear exactly 3 times; 'a b' < 'c d'
    val docs = corpus("ab cd", "ab cd", "ab cd")
    val learned = Bpe.learnMerges(docs, "text", maxMerges = 1)
    assert(learned.map(_.pair) == Seq("a b"))
    assert(learned.head.cnt == 3L)
  }

  test("merge applies to all non-overlapping occurrences, left to right") {
    // counting is per adjacent POSITION ('aaaa' holds 3 (a,a)
    // positions, x 3 docs = 9) while the merge itself is
    // non-overlapping left-to-right ('aaaa' -> [aa, aa], so round 2
    // sees pair (aa,aa) once per word)
    val docs = corpus("aaaa", "aaaa", "aaaa")
    val learned = Bpe.learnMerges(docs, "text", maxMerges = 2)
    assert(learned == Seq(Bpe.Merge("a a", 9L), Bpe.Merge("aa aa", 3L)))
  }

  test("odd runs keep the orphan: aaa -> [aa, a]") {
    // left-to-right non-overlap on 'aaa' merges once per word (count
    // 2x2=4), leaving 'aa a' as the only round-2 candidate (count 2)
    val docs = corpus("aaa", "aaa")
    val learned = Bpe.learnMerges(docs, "text", maxMerges = 2)
    assert(learned == Seq(Bpe.Merge("a a", 4L), Bpe.Merge("aa a", 2L)))
  }

  test("stops below minCount and at pair exhaustion") {
    // every pair is unique -> best count 1 < 2: no merge at all
    assert(Bpe.learnMerges(corpus("abc", "def"), "text", 10).isEmpty)
    // 'ab' twice trains exactly one merge, then the merged words drop
    // to single tokens and the vocabulary runs dry before maxMerges
    val learned = Bpe.learnMerges(corpus("ab ab"), "text", 10)
    assert(learned == Seq(Bpe.Merge("a b", 2L)))
    // empty / all-null corpora learn nothing
    import spark.implicits._
    val nulls = Seq((1L, null: String)).toDF("doc_id", "text")
    assert(Bpe.learnMerges(nulls, "text", 10).isEmpty)
  }

  test("checkpoint cadence does not change the result") {
    val docs = Tables.df(spark, fixtureSf, "documents")
    val everyRound =
      Bpe.learnMerges(docs, "text", maxMerges = 12, checkpointEvery = 1)
    val fused =
      Bpe.learnMerges(docs, "text", maxMerges = 12, checkpointEvery = 8)
    assert(everyRound == fused)
  }

  test("incremental face equals the recount face, merge for merge") {
    // the delta-maintained pair counts must reproduce the recount
    // loop's exact trajectory — counts included, since the argmax
    // total order keys on them — on the real corpus and on the
    // overlap/tie shapes that stress the delta arithmetic
    val docs = Tables.df(spark, fixtureSf, "documents")
    assert(Bpe.learnMergesIncremental(docs, "text", maxMerges = 40) ==
      Bpe.learnMerges(docs, "text", maxMerges = 40))
    for (c <- Seq(corpus("aaaa", "aaaa", "aaaa"), corpus("aaa", "aaa"),
        corpus("ab cd", "ab cd", "ab cd"), corpus("ab ab"),
        corpus("abc", "def"))) {
      assert(Bpe.learnMergesIncremental(c, "text", 10) ==
        Bpe.learnMerges(c, "text", 10))
    }
  }

  test("learnMergesAuto equals both fixed faces and picks the " +
      "measured winner per regime") {
    // SUFFIX-shaped fixture: both words share the c^8 core, so every
    // merge of its (c,c)-chain affects the WHOLE vocabulary — the
    // probe measures affected/vocab = 1 and the run must finish on
    // the recount face (the chain stays >= minCount through all three
    // probe rounds: counts 14, 6, 2)
    val hot = corpus("acccccccc bcccccccc")
    val autoHot = Bpe.learnMergesAuto(hot, "text", maxMerges = 6)
    assert(autoHot.face == "recount",
      s"measured frac ${autoHot.affectedFrac}")
    assert(autoHot.affectedFrac >= 0.9)
    assert(autoHot.merges ==
      Bpe.learnMerges(hot, "text", maxMerges = 6))
    assert(autoHot.merges ==
      Bpe.learnMergesIncremental(hot, "text", maxMerges = 6))
    // TAIL-shaped fixture: each dominant pair lives in ONE word of a
    // 64-word vocabulary; the 60 junk words carry globally UNIQUE
    // pairs (2-char words over an 8x8 disjoint alphabet grid, count 1
    // each — never merged, never affected) — affected/vocab ~= 1/64
    // per probed round < 0.05, so the run must CONTINUE on the
    // incremental face past the probe (rounds 4+ merge q r)
    val junk = (0 until 60)
      .map(i => "" + ('A' + i / 8).toChar + ('I' + i % 8).toChar)
      .mkString(" ")
    val tail = corpus((("xy " * 50) + ("uv " * 40) + ("st " * 30) +
      ("qr " * 20)).trim, junk)
    val autoTail = Bpe.learnMergesAuto(tail, "text", maxMerges = 6)
    assert(autoTail.face == "incremental",
      s"measured frac ${autoTail.affectedFrac}")
    assert(autoTail.affectedFrac < 0.05)
    assert(autoTail.merges ==
      Bpe.learnMerges(tail, "text", maxMerges = 6))
    assert(autoTail.merges ==
      Bpe.learnMergesIncremental(tail, "text", maxMerges = 6))
    // and on the fixture corpus the auto face reproduces the shipped
    // vocabulary whatever it picks (bit-identity is face-independent)
    val docs = Tables.df(spark, fixtureSf, "documents")
    assert(Bpe.learnMergesAuto(docs, "text", maxMerges = 12).merges ==
      Bpe.learnMerges(docs, "text", maxMerges = 12))
  }

  test("learned table feeds the encode expression (artifact round-trip)") {
    // train on a corpus whose vocabulary we can encode by hand, then
    // tokenize THROUGH the learned table: 'st' merges first (count 4),
    // then 'o p' (2). 'stop' -> [st, op]? No: after 's t', pair 'st o'
    // (2) ties against 'o p' (2) and 'st o' > 'o p' -> 'o p' wins
    // rank 3 ... keep it simple and assert against BpeEncode itself
    val docs = corpus("stop stun", "stop stun")
    val learned = Bpe.learnMerges(docs, "text", maxMerges = 3).map(_.pair)
    assert(learned.head == "s t")
    val toked = graft.ops.TextAnalysis
      .bpeTokenize(docs, "doc_id", "text", learned)
      .orderBy("doc_id").collect()
    // whatever the learned table, encode must reassemble the words
    toked.foreach { r =>
      assert(r.getString(2).replace(" ", "") == "stopstun")
    }
    // and the learned merges must actually compress: fewer tokens
    // than characters
    assert(toked.forall(_.getLong(1) < "stopstun".length))
  }
}
