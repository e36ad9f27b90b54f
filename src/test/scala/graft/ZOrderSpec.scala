package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.write.ZOrder

/** Morton-key hand values + the layout property the writer exists for:
  * per-file min/max ranges narrow on BOTH dimensions, where a linear
  * sort narrows only its leading one. */
class ZOrderSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  /** bit-at-a-time reference interleave (independent formulation) */
  private def mortonRef(a: Long, b: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
    }

  test("mortonKey interleaves bits (hand values)") {
    val rows = Seq(
      (0xFFFFL, 0L, 0x55555555L),      // a fills even positions
      (0L, 0xFFFFL, 0xAAAAAAAAL),      // b fills odd positions
      (3L, 1L, 7L),                    // 0b11 ⨯ 0b1 → 0b111
      (0L, 0L, 0L),
      (0x12345L, 0L,                   // only the low 16 bits survive
        mortonRef(0x2345L, 0L)))
    val got = rows.toDF("a", "b", "want")
      .select(ZOrder.mortonKey(col("a"), col("b")).as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("z-order layout narrows per-file ranges on BOTH dims; linear " +
      "sort only on its leading dim") {
    // 64×64 grid, 16 files → a Morton sort packs each file into
    // contiguous curve blocks spanning ~16 cells per dim
    val grid = spark.range(64 * 64).select(
      (col("id") % 64).as("u"), (col("id") / 64).cast("long").as("t"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder")
    val zPath = s"$dir/z"
    val linPath = s"$dir/lin"
    ZOrder.writeZOrdered(grid, col("u"), col("t"), 16, zPath)
    grid.repartitionByRange(16, col("t")).sortWithinPartitions("t")
      .write.mode("overwrite").parquet(linPath)

    def avgRanges(path: String): (Double, Double) = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      assert(files.length > 8, s"expected many files at $path")
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max("u") - min("u"), max("t") - min("t")).collect().head
        (r.getLong(0).toDouble, r.getLong(1).toDouble)
      }
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }
    val (zU, zT) = avgRanges(zPath)
    val (linU, linT) = avgRanges(linPath)
    // linear: perfect on t, useless on u (full 0..63 span per file)
    assert(linT < 8, s"linear sort should nail its own dim, got $linT")
    assert(linU > 60, s"linear sort leaves the other dim unclustered")
    // morton: BOTH dims well under half the full span
    assert(zU < 32, s"z-order u-span should be bounded, got $zU")
    assert(zT < 32, s"z-order t-span should be bounded, got $zT")
  }

  test("manifest file-skipping: a 2-D range over z-ordered data reads " +
      "a fraction of the files, exactly matching the full scan") {
    import graft.write.Manifest
    val grid = spark.range(64 * 64).select(
      (col("id") % 64).as("u"), (col("id") / 64).cast("long").as("t"))
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest")
    val zPath = s"$dir/z"
    ZOrder.writeZOrdered(grid, col("u"), col("t"), 16, zPath)
    Manifest.build(spark, zPath, Seq("u", "t"))
    val pred = col("u").between(8, 15) && col("t").between(8, 15)
    val (pruned, read, total) = Manifest.prunedRead(spark, zPath,
      Map("u" -> ((8L, 15L)), "t" -> ((8L, 15L))))
    assert(total === 16)
    assert(read < total / 2,
      s"z-order + manifest should skip most files, read $read/$total")
    // pruning is a superset selection: pruned+filter == full+filter
    val got = pruned.filter(pred).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = spark.read.parquet(zPath).filter(pred).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(want.size === 64) // 8x8 block
    // empty intersection prunes everything, returns an empty frame
    val (none, r0, _) = Manifest.prunedRead(spark, zPath,
      Map("u" -> ((1000L, 2000L))))
    assert(r0 === 0 && none.count() === 0)
  }

  test("prunedRead conservatively READS files whose indexed column is " +
      "all-NULL (NULL min/max stats never silently prune)") {
    import graft.write.Manifest
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_nullstats")
    val p = s"$dir/t"
    // file A: real stats in [0, 9]; file B: all-NULL indexed column
    Seq.tabulate(10)(i => (Option(i.toLong), s"a$i")).toDF("u", "s")
      .coalesce(1).write.parquet(p)
    Seq.tabulate(5)(i => (None: Option[Long], s"b$i")).toDF("u", "s")
      .coalesce(1).write.mode("append").parquet(p)
    Manifest.build(spark, p, Seq("u"))
    // range misses file A's [0,9] → A pruned; B (NULL stats) must
    // still be read so "u IS NULL OR …" row filters stay correct
    val (df, read, total) = Manifest.prunedRead(spark, p,
      Map("u" -> ((100L, 200L))))
    assert(total === 2 && read === 1)
    assert(df.filter(col("u").isNull).count() === 5L)
  }

  test("the SQL twin replays the Spark key bit-for-bit") {
    // differential inside one engine: evaluate the generated SQL text
    // with Spark's own SQL parser (operator syntax is shared) — the
    // DuckDB-side replay is q_zorder_keys' oracle
    val df = spark.range(1000).select(
      (col("id") * 37 % 65536).as("a"), (col("id") * 101 % 65536).as("b"))
    val sqlKey = ZOrder.mortonKeySql("a", "b")
    val n = df.select(
        ZOrder.mortonKey(col("a"), col("b")).as("k1"),
        expr(sqlKey).as("k2"))
      .filter(col("k1") =!= col("k2")).count()
    assert(n === 0L)
  }
}
