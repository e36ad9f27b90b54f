package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated TPC-H-ish testdata
  * (`/root/testdata/sf*`, see /root/repo/TESTDATA.md). One parquet file
  * per table; schemas are fixed by the generator (seed 42).
  *
  * At 100 TB these would be multi-file partitioned datasets; nothing here
  * assumes single-file inputs — `spark.read.parquet(dir)` works on
  * directories too.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def df(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 only reads as
    // long (spark.sql.legacy.parquet.nanosAsLong, set in GraftSession);
    // normalize to TimestampType (µs) here so operators see a timestamp.
    if (name == "events" &&
        raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  /** Register every table as a temp view so operators can mix the
    * DataFrame API with `spark.sql`. Cheap (lazy plans, no scan). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => df(spark, sfDir, n).createOrReplaceTempView(n))
}

/** Central SparkSession factory: one place for the scale-minded defaults
  * (AQE on, shuffle partitions sized to the machine, UTC).
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // FAIR so concurrent job submitters (ParseRunner's bounded pool)
      // share executors instead of head-of-line blocking behind one job
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Idempotent session tuning for sessions we did not build (driver-made
    * sessions in Verify/Bench): set the semantics-critical confs only. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spark
  }
}
