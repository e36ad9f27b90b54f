package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.GraftSession
import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.Catalog (one group per SURVEY §2
  * section); this object is the stable façade the driver calls.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the J6 3-way enrich (blocks ⋈ transactions ⋈ receipts). */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    Catalog.byName("q_enrich_transactions").fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map { qq =>
      qq.name -> { (spark: SparkSession, dir: String) =>
        GraftSession.tune(spark)
        qq.fn(spark, dir)
      }
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Catalog.all.flatMap(qq => qq.oracle.map(qq.name -> _)).toMap
}
