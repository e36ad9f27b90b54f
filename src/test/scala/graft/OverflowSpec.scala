package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Enrich-path uint256 overflow contract (round-7 verdict #4).
  *
  * The reference's warehouse schema declares transaction `value` as
  * DECIMAL(38,0) (`/root/reference/dags/templates/evm_load_template.py`
  * transactions block), which cannot hold a full uint256 (max is 78
  * digits) — the reference silently accepts that truncation risk at
  * load time (Hive-mode cast → NULL). This engine's documented parity
  * mode is FAIL-FAST: values stay full-precision strings through the
  * enrich path (projection/join only, no narrowing), and any
  * reference-shape DECIMAL(38,0) load cast runs under Spark 4 ANSI
  * semantics, which raise on overflow instead of nulling.
  * (AbiSpec covers the decode-path twin: decoded uint256 lands as a
  * 78-digit decimal STRING, never a narrowed numeric.)
  */
class OverflowSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  // 2^256 - 1: 78 decimal digits, 40 digits past DECIMAL(38,0)'s range
  private val uintMax =
    "115792089237316195423570985008687907853269984665640564039457584" +
      "007913129639935"

  private def rawTx = Seq(
    ("0xt1", 1L, 0L, "0xa", "0xb", uintMax, 21000L, 1L, "0x", 7L,
      0L, 0L, 2L)
  ).toDF("hash", "nonce", "transaction_index", "from_address", "to_address",
    "value", "gas", "gas_price", "input", "block_number",
    "max_fee_per_gas", "max_priority_fee_per_gas", "transaction_type")

  test("uint256-max value survives Enrich.transactions at full precision") {
    val blocks = Seq((7L, "0xb7", 1700000000L))
      .toDF("number", "hash", "timestamp")
    val receipts = Seq(("0xt1", 21000L, 21000L, "", "", 1L, 1L))
      .toDF("transaction_hash", "cumulative_gas_used", "gas_used",
        "contract_address", "root", "status", "effective_gas_price")
    val out = graft.enrich.Enrich.transactions(rawTx, blocks, receipts)
    // the enrich path is projection + join — it must never narrow the
    // value column, so all 78 digits come through bit-exact
    assert(out.select(col("value")).as[String].head() == uintMax)
  }

  test("permissive load mode nulls overflow, reference-parity (r8 #3)") {
    import graft.schema.{LoadCast, RawSchemas}
    // the reference's Hive-mode DECIMAL(38,0) load silently nulls an
    // over-range uint256; LoadCast(permissive = true) reproduces that
    // bit-for-bit, while in-range columns land at their declared types
    val out = LoadCast.toReferenceShape(
      rawTx, RawSchemas.transactions, permissive = true)
    val row = out.select(col("value"), col("nonce"), col("gas")).head()
    assert(row.isNullAt(0), "uint256-max must load as NULL in permissive")
    assert(out.schema("value").dataType == DecimalType(38, 0))
    assert(row.getLong(1) == 1L && row.getLong(2) == 21000L)
    // strict mode (the engine default) raises on the same frame
    val e = intercept[Exception] {
      LoadCast.toReferenceShape(rawTx, RawSchemas.transactions).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).mkString
    assert(msg.contains("NUMERIC_OUT_OF_SUPPORTED_RANGE") ||
      msg.contains("NUMERIC_VALUE_OUT_OF_RANGE") ||
      msg.contains("CAST_OVERFLOW"),
      s"expected an ANSI overflow error, got: $msg")
    // and an in-range frame is bit-identical across the two modes
    val small = rawTx.withColumn("value", lit("42"))
    val strictRows = LoadCast.toReferenceShape(
      small, RawSchemas.transactions).collect().toSeq
    val permissiveRows = LoadCast.toReferenceShape(
      small, RawSchemas.transactions, permissive = true).collect().toSeq
    assert(strictRows == permissiveRows)
    // column-name match is case-insensitive like Spark's resolution: a
    // raw export carrying 'Value' must still be cast (a case-sensitive
    // miss would silently skip both the cast and strict mode's raise)
    val cased = rawTx.withColumnRenamed("value", "Value")
    val casedOut = LoadCast.toReferenceShape(
      cased, RawSchemas.transactions, permissive = true)
    assert(casedOut.schema("Value").dataType == DecimalType(38, 0))
    assert(casedOut.select(col("Value")).head().isNullAt(0))
  }

  test("reference-shape DECIMAL(38,0) load cast raises under ANSI") {
    assert(spark.conf.get("spark.sql.ansi.enabled", "true") != "false",
      "this engine's parity mode is ANSI-on (the Spark 4 default)")
    val e = intercept[Exception] {
      rawTx.select(col("value").cast(DecimalType(38, 0))).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).mkString
    assert(msg.contains("NUMERIC_OUT_OF_SUPPORTED_RANGE") ||
      msg.contains("NUMERIC_VALUE_OUT_OF_RANGE") ||
      msg.contains("CAST_OVERFLOW"),
      s"expected an ANSI overflow error, got: $msg")
  }
}
