package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.ops.Dedup
import graft.queries.DedupQueries

/** Ad-hoc stage profiler for the jaccard pipeline (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // NOTE: the staged replica below mirrors the operator's SHAPE but
    // not its persist()s — each stage lazily recomputes everything
    // upstream, so stage times are cumulative, not additive. "full
    // pipeline" is the real (persisted, hashed-shingle) operator.
    val c = DedupQueries.corpus(spark, dir)
    time("corpus count")(c.count())
    if (args.headOption.contains("minhash")) {
      val sig = Dedup.minhashSignature(c, "doc_id", "text", 3, 16)
      time("minhash signatures")(sig.count())
      val bands = Dedup.lshBands(sig, 16, 4)
      time("lsh bands")(bands.count())
      val cands = Dedup.minhashCandidates(c, "doc_id", "text")
      time("candidates")(println("cand=" + cands.count()))
      val ta = c.select(col("doc_id").as("a_id"), col("text").as("ta"))
      val tb = c.select(col("doc_id").as("b_id"), col("text").as("tb"))
      time("full query")(
        cands.join(ta, "a_id").join(tb, "b_id")
          .filter(col("ta") === col("tb"))
          .select(col("a_id"), col("b_id")).count())
      spark.stop()
      return
    }
    val sh = c.select(col("doc_id").as("doc"),
      Dedup.shingles(col("text"), 3).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    time("shingle count")(sh.count())
    val freq = sh.select(explode(col("sh")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
    time("freq")(freq.count())
    val sorted = sh.select(col("doc"), col("n_sh"),
        explode(col("sh")).as("s"))
      .join(freq, "s")
      .groupBy(col("doc"), col("n_sh"))
      .agg(array_sort(collect_list(struct(col("df"), col("s"))))
        .as("ordered"))
      .select(col("doc"), col("n_sh"),
        transform(col("ordered"), x => x.getField("s")).as("sh"),
        (col("n_sh") - ceil(col("n_sh") * 0.8) + 1).cast("int").as("plen"))
    time("sorted")(sorted.count())
    val prefixes = sorted.select(col("doc"), col("n_sh"), col("sh"),
      explode(slice(col("sh"), lit(1), col("plen"))).as("s"))
    time("prefixes")(prefixes.count())
    val a = prefixes.select(col("s"), col("doc").as("a_id"),
      col("n_sh").as("na"), col("sh").as("sha"))
    val b = prefixes.select(col("s"), col("doc").as("b_id"),
      col("n_sh").as("nb"), col("sh").as("shb"))
    val cand = a.join(b, Seq("s")).filter(col("a_id") < col("b_id"))
      .filter(col("nb") >= ceil(col("na") * 0.8) &&
        col("na") >= ceil(col("nb") * 0.8))
    time("candidates")(println("cand=" + cand.count()))
    val deduped = cand.select("a_id", "b_id", "na", "nb", "sha", "shb")
      .dropDuplicates("a_id", "b_id")
    time("deduped")(println("dedup=" + deduped.count()))
    val out = time("full pipeline") {
      Dedup.ngramJaccardPairs(c, "doc_id", "text", 3, 0.8).count()
    }
    println("pairs=" + out)
    spark.stop()
  }
}
