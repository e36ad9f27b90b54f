package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{GraftExtensions, Tables}

/** The SQL surface: every custom expression must be reachable from
  * `spark.sql` (SparkSessionExtensions on fresh sessions, live-registry
  * injection on driver-made ones) and agree exactly with the Column API
  * — one Expression, two spellings. */
class ExtensionsSpec extends AnyFunSuite {
  import TestSession._

  GraftExtensions.registerInto(spark)
  Tables.df(spark, sf, "documents").createOrReplaceTempView("ext_docs")

  private def sqlEqualsColumn(sqlExpr: String,
      colExpr: org.apache.spark.sql.Column): Unit = {
    val viaSql = spark.sql(
        s"SELECT doc_id, $sqlExpr AS v FROM ext_docs ORDER BY doc_id")
      .collect().map(r => (r.get(0), r.get(1))).toSeq
    val viaCol = Tables.df(spark, sf, "documents")
      .select(col("doc_id"), colExpr.as("v")).orderBy("doc_id")
      .collect().map(r => (r.get(0), r.get(1))).toSeq
    assert(viaSql == viaCol, s"SQL '$sqlExpr' diverged from Column API")
  }

  test("simhash64 / rolling_hash64 / minhash_array / rolling_window_hash" +
      " / dot_product_fold resolve in SQL and match the Column API") {
    import org.apache.spark.sql.{GraftColumnBridge => CB}
    sqlEqualsColumn("simhash64(split(text, ' '))",
      CB.column(graft.ops.SimHash64(CB.expression(split(col("text"), " ")))))
    sqlEqualsColumn("rolling_hash64(text)",
      graft.ops.TextAnalysis.fingerprint(col("text")))
    sqlEqualsColumn("minhash_array(split(text, ' '), 16)",
      CB.column(graft.ops.MinHashArray(
        CB.expression(split(col("text"), " ")), 16)))
    sqlEqualsColumn(
      "rolling_window_hash(transform(split(text, ' '), t -> xxhash64(t)), 8)",
      CB.column(graft.ops.RollingWindowHash(
        CB.expression(transform(split(col("text"), " "),
          t => xxhash64(t))), 8)))
    sqlEqualsColumn(
      "dot_product_fold(array(1.0D, 2.0D), array(3.0D, CAST(doc_id AS DOUBLE)))",
      CB.column(graft.functions.DotProductFold(
        CB.expression(array(lit(1.0), lit(2.0))),
        CB.expression(array(lit(3.0), col("doc_id").cast("double"))))))
    // decomposed e+U+0301 composes; the pure-ASCII corpus text passes
    // through the isNormalized fast path unchanged
    sqlEqualsColumn("nfc_normalize(text || ' café')",
      graft.ops.TextAnalysis.nfc(concat(col("text"), lit(" café"))))
  }

  test("nfc_normalize composes decomposed sequences and is idempotent") {
    val decomposed = "cafe\u0301" // e + combining acute
    val precomposed = "caf\u00e9" // precomposed e-acute
    val r = spark.sql(
      s"SELECT nfc_normalize('$decomposed') AS a, " +
        s"nfc_normalize(nfc_normalize('$decomposed')) AS b").collect().head
    assert(r.getString(0) === precomposed)
    assert(r.getString(1) === precomposed)
  }

  test("abi_decode_event in SQL equals the Column API on valid and " +
      "garbage rows") {
    val transferAbi =
      """{"name":"Transfer","type":"event","anonymous":false,"inputs":[
        {"indexed":true,"name":"from","type":"address"},
        {"indexed":true,"name":"to","type":"address"},
        {"indexed":false,"name":"value","type":"uint256"}]}"""
    val topic0 = graft.abi.Keccak256
      .eventTopic("Transfer(address,address,uint256)")
    val pad = (h: String) => "0x" + "0" * 24 + h * 20
    import spark.implicits._
    val rows = Seq(
      (1L, Seq(topic0, pad("aa"), pad("bb")), 42L),  // valid transfer
      (2L, Seq("0xzznothex", "0x1"), 7L)             // garbage → null
    ).toDF("id", "topics_arr", "v")
      .withColumn("unhex_data", expr("unhex(lpad(hex(v), 64, '0'))"))
    rows.createOrReplaceTempView("ext_logs")
    val viaSql = spark.sql(
        s"""SELECT id, abi_decode_event(topics_arr, unhex_data,
              '${transferAbi.replace("\n", " ")}') AS d
            FROM ext_logs ORDER BY id""")
      .selectExpr("id", "d.from", "d.to", "d.value").collect().toSeq
    val viaCol = rows.select(col("id"),
        graft.abi.AbiDecode.event(transferAbi, col("topics_arr"),
          col("unhex_data")).as("d"))
      .selectExpr("id", "d.from", "d.to", "d.value").orderBy("id")
      .collect().toSeq
    assert(viaSql == viaCol)
    assert(viaSql.head.get(1) != null, "valid transfer must decode")
    assert(viaSql(1).get(1) == null, "garbage must decode to null")
  }

  test("arity and literal-arg misuse fail at analysis, not at runtime") {
    val e1 = intercept[Exception](spark.sql(
      "SELECT simhash64(split(text, ' '), 2) FROM ext_docs").collect())
    assert(e1.getMessage.contains("expects 1 arguments"))
    val e2 = intercept[Exception](spark.sql(
      "SELECT minhash_array(split(text, ' '), doc_id) FROM ext_docs")
      .collect())
    assert(e2.getMessage.contains("literal integer"))
  }

  test("minhash_array composes inside a pure-SQL signature pipeline") {
    // smoke for the intended SQL usage shape: shingle in SQL, sign with
    // the registered expression, aggregate downstream — no Column API
    val sqlSigs = spark.sql(
      """SELECT doc_id, minhash_array(g, 16) AS mh FROM (
           SELECT doc_id, CASE WHEN size(split(text, ' ')) < 2
                   THEN array(text)
                   ELSE array_distinct(filter(
                     zip_with(split(text, ' '),
                       slice(split(text, ' '), 2,
                         greatest(size(split(text, ' ')) - 1, 0)),
                       (a, b) -> concat(a, ' ', b)),
                     x -> x IS NOT NULL)) END AS g
           FROM ext_docs)""")
    assert(sqlSigs.filter(col("mh").isNotNull).count() ===
      Tables.df(spark, sf, "documents").count())
    assert(sqlSigs.select(explode(col("mh"))).distinct().count() > 16)
  }
}
