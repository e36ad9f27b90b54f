package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Linkage

/** Pins [[Linkage.fuzzyJoin]]'s exactness (≡ the all-pairs Levenshtein
  * scan) and — the round-13 lesson — its behavior on the adversarial
  * corpus shape that broke the earlier PassJoin segment blocking:
  * every name sharing one long constant prefix. With positional
  * segment keys that corpus collapses onto a single hash key (one
  * reducer, O(n²) candidates); deletion-neighborhood keys stay
  * near-unique because a key is the near-full string.
  */
class LinkageSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  /** Brute-force oracle: all pairs, exact levenshtein filter. */
  private def brute(l: DataFrame, r: DataFrame, d: Int): Set[(Long, Long, Long)] =
    l.toDF("lid", "lname").crossJoin(r.toDF("rid", "rname"))
      .withColumn("dist", levenshtein(col("lname"), col("rname")))
      .filter(col("dist") <= d)
      .select(col("lid"), col("rid"), col("dist").cast("long"))
      .as[(Long, Long, Long)].collect().toSet

  private def fuzzy(l: DataFrame, r: DataFrame, d: Int): Set[(Long, Long, Long)] =
    Linkage.fuzzyJoin(l.toDF("lid", "lname"), r.toDF("rid", "rname"),
        "lid", "lname", "rid", "rname", maxEdit = d)
      .as[(Long, Long, Long)].collect().toSet

  /** The exact corpus shape that degenerated PassJoin: a 9-char
    * constant prefix and digits-only tails (1 distinct prefix across
    * the whole corpus). */
  private def prefixCorpus(n: Int): DataFrame =
    spark.range(n).select(col("id"),
      format_string("Customer#%09d", col("id")).as("name"))

  test("d=1 equals the all-pairs oracle on the shared-prefix corpus " +
      "(substituted / deleted / inserted / untouched / unrelated)") {
    val clean = prefixCorpus(120)
    // one digit substituted (%4==0), one deleted (%4==1), one inserted
    // (%4==2), untouched (%4==3) — all four single-edit kinds
    val dirty = clean.select((col("id") + 1000L).as("id"),
      when(col("id") % 4 === 0,
        concat(substring(col("name"), 1, 12), lit("X"),
          substring(col("name"), 14, 10)))
      .when(col("id") % 4 === 1,
        concat(substring(col("name"), 1, 12),
          substring(col("name"), 14, 10)))
      .when(col("id") % 4 === 2,
        concat(substring(col("name"), 1, 12), lit("ZZ"),
          substring(col("name"), 14, 10)))  // insert via replace-1-with-2
      .otherwise(col("name")).as("name"))
    // %4==2 is substitute-then-insert = distance 2: excluded at d=1,
    // so the oracle equivalence exercises both keep and drop branches
    val expected = brute(clean, dirty, 1)
    assert(fuzzy(clean, dirty, 1) === expected)
    assert(expected.nonEmpty)
    assert(expected.exists(_._3 == 0L) && expected.exists(_._3 == 1L))
  }

  test("shared-prefix corpus produces no hot block: max key " +
      "multiplicity stays O(true near-dup count), not O(n)") {
    val n = 400
    val corpus = prefixCorpus(n)
    // replicate the blocking key derivation: count the largest block a
    // single join key receives from one side. Under segment blocking
    // this read n (every row in one block); deletion variants of
    // distinct digit tails are near-unique.
    val blocks = corpus
      .select(explode(expr(
        """array_distinct(array_union(array(name),
             transform(sequence(1, length(name)),
               i -> concat(substring(name, 1, i - 1),
                           substring(name, i + 1, length(name))))))"""))
        .as("k"))
      .groupBy("k").agg(count(lit(1)).as("c"))
    val maxBlock = blocks.agg(max(col("c"))).as[Long].head()
    // digit tails 0..399: deleting a digit collides only between
    // genuinely near tails (the all-zeros key collects ~2·digits
    // members — O(log n)), never a corpus fraction. Segment blocking
    // read exactly n here.
    assert(maxBlock <= 30, s"hot block of size $maxBlock on $n rows")
    assert(maxBlock < n / 10,
      s"block size $maxBlock is a corpus fraction of $n")
  }

  test("d=2 equals the all-pairs oracle (two-edit pairs captured, " +
      "three-edit pairs rejected)") {
    val clean = prefixCorpus(60)
    val dirty = clean.select((col("id") + 500L).as("id"),
      when(col("id") % 3 === 0, // two substitutions -> dist 2
        concat(substring(col("name"), 1, 10), lit("XY"),
          substring(col("name"), 13, 10)))
      .when(col("id") % 3 === 1, // three substitutions -> dist 3, dropped
        concat(substring(col("name"), 1, 10), lit("XYZ"),
          substring(col("name"), 14, 10)))
      .otherwise(col("name")).as("name"))
    val expected = brute(clean, dirty, 2)
    assert(fuzzy(clean, dirty, 2) === expected)
    assert(expected.exists(_._3 == 2L))
  }

  test("edge shapes: empty and single-char strings, null names, " +
      "cross-length matches") {
    val l = Seq((1L, ""), (2L, "a"), (3L, "ab"), (4L, null: String))
      .toDF("lid", "lname")
    val r = Seq((10L, ""), (11L, "b"), (12L, "ba"), (13L, null: String))
      .toDF("rid", "rname")
    val got = Linkage.fuzzyJoin(l, r, "lid", "lname", "rid", "rname", 1)
      .as[(Long, Long, Long)].collect().toSet
    val want = brute(l.filter(col("lname").isNotNull),
      r.filter(col("rname").isNotNull), 1)
    assert(got === want)
    // "" matches "" (0) and "b" (1); "a" matches "" and "b" (1); no
    // null row ever appears
    assert(got.contains((1L, 10L, 0L)) && got.contains((2L, 11L, 1L)))
    assert(!got.exists(t => t._1 == 4L || t._2 == 13L))
  }

  test("assignToEntities: best match wins by (dist, entity) total " +
      "order; unmatched rows open new entities with NULL dist") {
    val ents = Seq((10L, "alpha"), (20L, "alphx"), (30L, "alphy"))
      .toDF("eid", "ename")
    val batch = Seq(
      (100L, "alpha"),   // exact: dist 0 -> entity 10
      (101L, "alphz"),   // dist 1 to ALL of 10/20/30 -> min entity 10
      (102L, "zzzzz"))   // no match -> new entity under own id
      .toDF("id", "name")
    val got = graft.ops.Linkage.assignToEntities(batch, ents,
        "id", "name", "eid", "ename", maxEdit = 1)
      .as[(Long, Long, Option[Long], Boolean)].collect().toSet
    assert(got === Set(
      (100L, 10L, Some(0L), false),
      (101L, 10L, Some(1L), false),
      (102L, 102L, None, true)))
  }

  test("assignToEntities: exactly one output row per batch row even " +
      "with many candidate entities") {
    val ents = (0 until 20).map(i => (i.toLong, s"name$i"))
      .toDF("eid", "ename")
    // every batch name is dist<=1 to several entities (name0..name9
    // mutual dist 1 via last char)
    val batch = (0 until 30).map(i => (100L + i, s"name${i % 10}"))
      .toDF("id", "name")
    val out = graft.ops.Linkage.assignToEntities(batch, ents,
      "id", "name", "eid", "ename", maxEdit = 1)
    assert(out.count() == 30)
    assert(out.groupBy("id").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 1).count() == 0)
    // exact self-match beats the dist-1 crowd
    assert(out.filter(col("id") === 100L).select("entity_id")
      .as[Long].head() == 0L)
  }

  test("randomized exactness: fuzzyJoin == scala-side Levenshtein " +
      "brute force on dense tiny-alphabet corpora (d=1 and d=2)") {
    // raw ScalaCheck (scalatestplus bridge is not in the offline
    // cache). A 2-letter alphabet at lengths 0..6 makes the edit
    // space DENSE — repeated-char runs, empties and transposition
    // shapes (the positional verify's hard cases) occur constantly,
    // unlike realistic name corpora where they are rare.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val genCorpus = Gen.listOfN(24,
      Gen.chooseNum(0, 6).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString)))
    val prop = Prop.forAll(genCorpus, Gen.oneOf(1, 2)) { (ss, d) =>
      val l = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("lid", "lname")
      val r = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("rid", "rname")
      val got = graft.ops.Linkage.fuzzyJoin(l, r, "lid", "lname",
          "rid", "rname", d)
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (a, i) <- ss.zipWithIndex; (b, j) <- ss.zipWithIndex
        dist = lev(a, b) if dist <= d
      } yield (i.toLong, j.toLong, dist.toLong)).toSet
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("maxEdit outside {1,2} is rejected") {
    val d = Seq((1L, "x")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      Linkage.fuzzyJoin(d, d, "id", "name", "id", "name", 3)
    }
    intercept[IllegalArgumentException] {
      Linkage.fuzzyJoin(d, d, "id", "name", "id", "name", 0)
    }
  }
}
