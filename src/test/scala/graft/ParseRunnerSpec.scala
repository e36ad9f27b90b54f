package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.parse.{ContractCatalog, ParseRunner}
import graft.queries.{ParseQueries, SeaportRoundtrip}

class ParseRunnerSpec extends AnyFunSuite {
  import TestSession._

  private lazy val catalog =
    ContractCatalog.fromDirectory(ParseQueries.CorpusDir)

  private def b64(v: Long) = f"0x$v%064x"
  private def addr(v: Long) = f"0x$v%040x"

  /** minimal enriched-logs shape for plan building */
  private def logsFixture = spark.range(1).select(
    array(lit("0x0")).as("topics_arr"),
    lit(Array.emptyByteArray).as("unhex_data"),
    lit("0xa0").as("address"),
    lit("0xt0").as("transaction_hash"),
    lit(0L).as("log_index"),
    lit(0L).as("block_number"))

  /** minimal enriched-traces shape for plan building */
  private def tracesFixture = spark.range(1).select(
    lit("0x00000000").as("selector"),
    lit(Array.emptyByteArray).as("unhex_input"),
    lit(Array.emptyByteArray).as("unhex_output"),
    lit("0xa0").as("to_address"),
    lit("0xt0").as("transaction_hash"))

  test("every corpus element becomes a buildable decode job") {
    assume(new java.io.File(ParseQueries.CorpusDir).exists())
    val tasks = ParseRunner.tasks(catalog)
    val (events, calls) = tasks.partition(_.isEvent)
    // parser.py enumerates 146 events + 490 functions over 30 contracts
    assert(events.size == 146, s"expected 146 event jobs, got ${events.size}")
    assert(calls.size == 490, s"expected 490 call jobs, got ${calls.size}")
    val logs = logsFixture
    val traces = tracesFixture
    tasks.foreach { t =>
      assert(t.tableName.contains(if (t.isEvent) "_evt_" else "_call_"))
      // select() forces analysis: schema derivation + filter resolution
      val df = t.dataFrame(logs, traces)
      assert(df.columns.contains("transaction_hash"), t.tableName)
    }
  }

  test("erc20+cryptopunks+seaport slice runs end-to-end into a warehouse") {
    assume(new java.io.File(ParseQueries.CorpusDir).exists())
    val tasks = ParseRunner.tasks(catalog)
    val transferTopic = tasks
      .find(_.tableName == "common.erc20_evt_Transfer").get.event.get.topic0
    val punk = tasks
      .find(_.tableName == "cryptopunks.CryptoPunksMarket_evt_PunkBought").get
    val seaport = tasks
      .find(_.tableName == "seaport.Seaport_evt_OrderFulfilled").get
    assert(seaport.event.get.topic0 == SeaportRoundtrip.event.topic0,
      "real Seaport OrderFulfilled shape must match the roundtrip fixture")

    def data32(v: Long) = {
      val b = new Array[Byte](32)
      b(31) = v.toByte
      b
    }
    def logRow(topics: Seq[String], data: Array[Byte], address: String,
        tx: String) = spark.range(1).select(
      array(topics.map(lit): _*).as("topics_arr"),
      lit(data).as("unhex_data"),
      lit(address).as("address"),
      lit(tx).as("transaction_hash"),
      lit(0L).as("log_index"),
      lit(0L).as("block_number"))

    val logs =
      logRow(Seq(transferTopic, b64(7), b64(9)), data32(42), "0xa1", "0xt1")
        .unionByName(logRow(Seq(transferTopic, b64(8), b64(9)), data32(43),
          "0xa2", "0xt2"))
        .unionByName(logRow(
          Seq(punk.event.get.topic0, b64(123), b64(7), b64(9)), data32(44),
          punk.contract.contractAddress.get.toLowerCase, "0xt3"))
        .unionByName(logRow(
          Seq(seaport.event.get.topic0, b64(3), b64(4)),
          SeaportRoundtrip.encode(1, 2, 3, 4),
          seaport.contract.contractAddress.get.toLowerCase, "0xt4"))

    val wanted = Set("common.erc20_evt_Transfer",
      "cryptopunks.CryptoPunksMarket_evt_PunkBought",
      "seaport.Seaport_evt_OrderFulfilled")
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val counts = ParseRunner.run(spark, catalog, logs, tracesFixture, wh,
      t => wanted.contains(t.tableName)).toMap
    assert(counts == Map(
      "common.erc20_evt_Transfer" -> 2L,
      "cryptopunks.CryptoPunksMarket_evt_PunkBought" -> 1L,
      "seaport.Seaport_evt_OrderFulfilled" -> 1L))

    // decoded values land typed in the warehouse table
    val punks = spark.read
      .parquet(s"$wh/cryptopunks/cryptopunks_CryptoPunksMarket_evt_PunkBought")
    val row = punks.select(col("punkIndex").cast("long"),
      col("fromAddress"), col("value").cast("long")).collect().head
    assert(row.getLong(0) == 123L)
    assert(row.getString(1) == addr(7))
    assert(row.getLong(2) == 44L)

    // a contract with NO matching events that day, on dt-carrying
    // inputs, must report 0 rows — not crash on schema inference over
    // a part-file-less partitioned write (the common corpus-wide case)
    val dtLogs = logs.withColumn("dt", lit("2024-01-01"))
    val counts0 = ParseRunner.run(spark, catalog, dtLogs, tracesFixture,
      java.nio.file.Files.createTempDirectory("graft_wh0").toString,
      t => t.tableName == "common.erc20_evt_Approval").toMap
    assert(counts0.values.toSeq == Seq(0L))
  }

  test("parallel submission matches the sequential path, in catalog order") {
    assume(new java.io.File(ParseQueries.CorpusDir).exists())
    val names = ParseRunner.tasks(catalog).filter(_.isEvent)
      .take(8).map(_.tableName).toSet
    def wh() = java.nio.file.Files.createTempDirectory("graft_whp").toString
    val seqR = ParseRunner.run(spark, catalog, logsFixture, tracesFixture,
      wh(), t => names(t.tableName), parallelism = 1)
    val parR = ParseRunner.run(spark, catalog, logsFixture, tracesFixture,
      wh(), t => names(t.tableName), parallelism = 4)
    assert(parR == seqR)
    // results come back in catalog order regardless of completion order
    assert(parR.map(_._1) == ParseRunner.tasks(catalog)
      .filter(t => names(t.tableName)).map(_.tableName))
  }
}
