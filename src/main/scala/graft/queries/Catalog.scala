package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark DataFrame pipeline plus an
  * equivalent DuckDB SQL oracle over the same parquet tables. As of
  * round 10 EVERY catalog query carries a full oracle — even
  * Spark-Murmur3 hash buckets (replayed in DuckDB integer SQL) and the
  * approximate ANN family (deterministic codebooks/planes + total-order
  * tie-breaks) — so `oracle` is structurally still an Option only to
  * keep the driver contract stable; no registration omits it.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    section: String)

trait QueryGroup {
  def queries: Seq[Q]

  protected def q(name: String, section: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle.trim), section)

  /** Temp warehouse dir, reclaimed at JVM exit (the returned frames
    * read it lazily, so it can't be deleted any earlier). */
  protected def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.core.Fs.deleteRecursively(d)))
    d.toString
  }
}

object Catalog {
  def groups: Seq[QueryGroup] = Seq(
    CoreQueries,
    EnrichQueries,
    VerifyQueries,
    SourceQueries,
    AbiQueries,
    ParseQueries,
    DedupQueries,
    TextQueries,
    SimilarityQueries,
    MultimodalQueries,
    PackQueries,
    QualityQueries,
    ClassifierQueries,
    WarehouseQueries)

  lazy val all: Seq[Q] = {
    val qs = groups.flatMap(_.queries)
    val dup = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }

  lazy val byName: Map[String, Q] = all.map(x => x.name -> x).toMap
}
