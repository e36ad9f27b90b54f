package graft.abi

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import java.math.BigInteger
import AbiType._

class KeccakSpec extends AnyFunSuite {
  // public test vectors (Keccak-256, original padding)
  test("empty string") {
    assert(Keccak256.hashHex("") ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
  }
  test("abc") {
    assert(Keccak256.hashHex("abc") ==
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
  }
  test("erc20 Transfer topic") {
    assert(Keccak256.eventTopic("Transfer(address,address,uint256)") ==
      "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
  }
  test("transfer(address,uint256) selector") {
    assert(Keccak256.selector("transfer(address,uint256)") == "0xa9059cbb")
  }
  test("long input (multi-block absorb)") {
    val s = "a" * 300
    // keccak of 300*'a' — verified stable across runs; asserts padding at
    // block boundaries doesn't corrupt state
    assert(Keccak256.hashHex(s).length == 64)
    assert(Keccak256.hashHex(s) == Keccak256.hashHex(s))
    assert(Keccak256.hashHex(s) != Keccak256.hashHex("a" * 299))
  }
}

class AbiTypeSpec extends AnyFunSuite {
  test("parse + canonical") {
    assert(AbiType.parse("uint256", Nil).canonical == "uint256")
    assert(AbiType.parse("uint", Nil).canonical == "uint256")
    assert(AbiType.parse("address[]", Nil).canonical == "address[]")
    assert(AbiType.parse("uint8[3][]", Nil) ==
      TArray(TArray(TUint(8), Some(3)), None))
    val tup = AbiType.parse("tuple[]",
      List(AbiParam("a", "uint256", indexed = false, Nil),
        AbiParam("b", "string", indexed = false, Nil)))
    assert(tup.canonical == "(uint256,string)[]")
    assert(tup.isDynamic)
  }
  test("seaport signature matches known topic0") {
    val e = SeaportEventFixture.event
    assert(e.signature ==
      "OrderFulfilled(bytes32,address,address,address,(uint8,address,uint256,uint256)[],(uint8,address,uint256,uint256,address)[])")
    // well-known Seaport 1.1 OrderFulfilled topic0
    assert(e.topic0 ==
      "0x9d9af8e38d66c62e2c12f0225249fd9d721c54b83f48d9352c97c6cacdcb6f31")
  }
  test("static vs dynamic head sizes") {
    val stTup = TTuple(List("a" -> TUint(256), "b" -> TAddress))
    assert(!stTup.isDynamic && stTup.headSize == 64)
    assert(TArray(TUint(8), Some(4)).headSize == 128)
    assert(TBytes.headSize == 32)
  }
}

object SeaportEventFixture {
  val event: AbiEvent =
    AbiJson.parseEvent(graft.queries.SeaportRoundtrip.abiJson)
}

class AbiCodecRoundtripSpec extends AnyFunSuite {
  // raw ScalaCheck (scalatestplus bridge is not in the offline cache)
  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  private val genAddr: Gen[String] =
    Gen.listOfN(40, Gen.hexChar).map(cs => "0x" + cs.mkString.toLowerCase)
  private val genB32: Gen[String] =
    Gen.listOfN(64, Gen.hexChar).map(cs => "0x" + cs.mkString.toLowerCase)
  private val genUint: Gen[BigInteger] =
    Gen.chooseNum(0L, Long.MaxValue).map(BigInteger.valueOf)
  private val genBigUint: Gen[BigInteger] =
    Gen.listOfN(31, Gen.chooseNum(0, 255))
      .map(bs => new BigInteger(1, bs.map(_.toByte).toArray))
  private val genStr: Gen[String] = Gen.alphaNumStr.map(_.take(100))
  private val genBytes: Gen[String] =
    Gen.listOf(Gen.hexChar).map(cs =>
      "0x" + cs.take(200).mkString.toLowerCase match {
        case s if s.length % 2 == 0 => s
        case s => s + "0"
      })

  private def roundtrip(types: Seq[AbiType], values: Seq[Any]): Seq[Any] =
    AbiCodec.decodeSeq(AbiCodec.encodeSeq(types, values), types, 0)

  test("static types roundtrip") {
    check(Prop.forAll(genUint, genAddr, Gen.oneOf(true, false)) {
      (u: BigInteger, a: String, b: Boolean) =>
        val types = Seq(TUint(256), TAddress, TBool, TInt(64))
        val vals = Seq(u, a, b, BigInteger.valueOf(-42L))
        roundtrip(types, vals) == vals
    })
  }

  test("negative ints roundtrip (two's complement)") {
    check(Prop.forAll(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)) {
      (v: Long) =>
        roundtrip(Seq(TInt(256)), Seq(BigInteger.valueOf(v))) ==
          Seq(BigInteger.valueOf(v))
    })
  }

  test("dynamic types roundtrip") {
    check(Prop.forAll(genStr, genBytes, Gen.listOf(genUint)) {
      (s: String, b: String, us: List[BigInteger]) =>
        val types = Seq(TString, TBytes, TArray(TUint(256), None))
        roundtrip(types, Seq(s, b, us)) == Seq(s, b, us)
    })
  }

  test("uint256 full range roundtrips") {
    check(Prop.forAll(genBigUint) { (u: BigInteger) =>
      roundtrip(Seq(TUint(256)), Seq(u)) == Seq(u)
    })
  }

  test("nested tuple[] (seaport shape) roundtrips") {
    val item = TTuple(List("itemType" -> TUint(8), "token" -> TAddress,
      "identifier" -> TUint(256), "amount" -> TUint(256)))
    val types = Seq(TBytesFixed(32), TAddress, TArray(item, None))
    check(Prop.forAll(genB32, genAddr, Gen.listOf(Gen.zip(
      Gen.chooseNum(0, 3), genAddr, genUint, genUint))) {
      (h: String, a: String,
       items: List[(Int, String, BigInteger, BigInteger)]) =>
        val offer = items.map { case (t, tok, id, am) =>
          Seq(BigInteger.valueOf(t.toLong), tok, id, am) }
        roundtrip(types, Seq(h, a, offer)) == Seq(h, a, offer)
    })
  }

  test("fixed array of dynamic elems roundtrips") {
    val types = Seq(TArray(TString, Some(3)))
    check(Prop.forAll(Gen.listOfN(3, genStr)) { (ss: List[String]) =>
      roundtrip(types, Seq(ss)) == Seq(ss)
    })
  }

  test("mixed static-tuple-in-dynamic roundtrips") {
    val inner = TTuple(List("x" -> TUint(32), "y" -> TBool))
    val types = Seq(TArray(inner, None), TString)
    check(Prop.forAll(Gen.listOf(Gen.zip(Gen.chooseNum(0L, 1000000L),
      Gen.oneOf(true, false))), genStr) {
      (xs: List[(Long, Boolean)], s: String) =>
        val arr = xs.map { case (x, b) => Seq(BigInteger.valueOf(x), b) }
        roundtrip(types, Seq(arr, s)) == Seq(arr, s)
    })
  }
}

/** Robustness: malformed on-chain bytes must decode to null, never
  * throw (a poisoned row must not kill a 100 TB batch); and the
  * uint-as-string mode must round-trip full-range uint256 exactly. */
class AbiRobustnessSpec extends AnyFunSuite {
  import graft.TestSession._
  import org.apache.spark.sql.functions._

  private val transferAbi =
    """{"name":"Transfer","type":"event","anonymous":false,"inputs":[
      {"indexed":true,"name":"from","type":"address"},
      {"indexed":true,"name":"to","type":"address"},
      {"indexed":false,"name":"value","type":"uint256"}]}"""

  test("random garbage bytes decode to null, never throw") {
    import spark.implicits._
    // deterministic pseudo-garbage: truncated words, wrong topic
    // arities, empty data, non-hex topics
    val rows = spark.range(500).select(
      array(lit("0xzznothex"), lit("0x1")).as("topics_arr"),
      expr("unhex(lpad(hex(id), cast(2 + id % 63 AS int), '0'))")
        .as("unhex_data"))
    val decoded = rows.select(
      AbiDecode.event(transferAbi, col("topics_arr"), col("unhex_data"))
        .as("d"))
    // must complete without exception; short/invalid rows → null
    val n = decoded.count()
    assert(n == 500)
    assert(decoded.filter(col("d").isNotNull).count() == 0)
  }

  test("garbage dynamic lengths and topic shortfalls null out, no OOM") {
    import spark.implicits._
    // found by the full-width corpus run (r8): a shape-mismatched
    // payload yields a garbage dynamic length (here ~2^31), and the
    // decoder must reject it BEFORE copyOfRange/Seq.fill try to
    // allocate it — OutOfMemoryError is not an Exception, so the
    // decode-to-null guard alone cannot save the executor
    val strAbi =
      """{"name":"E","type":"event","anonymous":false,"inputs":[
        {"indexed":false,"name":"s","type":"string"}]}"""
    val arrAbi =
      """{"name":"E","type":"event","anonymous":false,"inputs":[
        {"indexed":false,"name":"a","type":"uint256[]"}]}"""
    val data = ("0" * 62 + "20") + ("0" * 56 + "7ffffffe")
    val df = Seq(1).toDF("x").select(
      array(lit("0x00")).as("topics_arr"),
      unhex(lit(data)).as("unhex_data"))
    for (abi <- Seq(strAbi, arrAbi)) {
      val d = df.select(
        AbiDecode.event(abi, col("topics_arr"), col("unhex_data")).as("d"))
      assert(d.filter(col("d").isNotNull).count() == 0, abi)
    }
    // an event declaring more indexed params than the log has topics
    // (erc721-style Transfer over an erc20-shaped log) must null out,
    // not read past the array end — UnsafeArrayData returns a garbage
    // offset/length word there, which is another unbounded allocation
    val short = df.select(
      AbiDecode.event(transferAbi, col("topics_arr"), col("unhex_data"))
        .as("d"))
    assert(short.filter(col("d").isNotNull).count() == 0)
    // a dynamic OFFSET near 2^31 makes `pos + 32` wrap negative in Int
    // arithmetic and slip past an Int-typed bounds check — the long-
    // arithmetic readUint guard must null it instead
    val wrapData = "0" * 56 + "7fffffe0" // head word: offset 2147483616
    val wrap = Seq(1).toDF("x").select(
      array(lit("0x00")).as("topics_arr"),
      unhex(lit(wrapData)).as("unhex_data"))
    val w = wrap.select(
      AbiDecode.event(strAbi, col("topics_arr"), col("unhex_data")).as("d"))
    assert(w.filter(col("d").isNotNull).count() == 0)
  }

  test("truncated static reads throw, never zero-pad (r8 advice)") {
    // Arrays.copyOfRange zero-pads past data.length, so before the
    // decodeStaticAt bounds guard a truncated payload decoded TInt /
    // TAddress / TBytesFixed to a plausible-but-WRONG value instead of
    // erroring (→ null upstream). readUint was already guarded; the
    // other static reads must behave identically.
    val data = new Array[Byte](40) // second word truncated at 8 bytes
    for (t <- Seq(TInt(256), TAddress, TBytesFixed(32), TUint(256), TBool))
      intercept[IllegalArgumentException](
        AbiCodec.decodeStaticAt(data, t, 32))
    intercept[IllegalArgumentException](
      AbiCodec.decodeStaticAt(data, TInt(256), -4))
    // in-bounds word still decodes
    assert(AbiCodec.decodeStaticAt(data, TUint(256), 0) ==
      BigInteger.ZERO)
    // zero-width statics (ABI-legal degenerates) read nothing: at the
    // exact payload end they decode empty rather than demanding a word
    // that isn't there
    assert(AbiCodec.decodeStaticAt(data, TArray(TUint(256), Some(0)),
      data.length) == Seq())
    assert(AbiCodec.decodeStaticAt(data, TTuple(Nil), data.length) ==
      Seq())
  }

  test("short indexed topic nulls the row, never a zero-padded address") {
    import spark.implicits._
    // 'from' topic is 10 bytes: previously zero-padded by copyOfRange
    // into address 0x000...aaaa..., now a bounds failure → null row
    val df = Seq(1).toDF("x").select(
      array(lit("0x00"),
        lit("0x" + "aa" * 10), // 10-byte topic, needs 32
        lit("0x" + "0" * 24 + "bb" * 20)).as("topics_arr"),
      unhex(lit("0" * 63 + "1")).as("unhex_data"))
    val d = df.select(
      AbiDecode.event(transferAbi, col("topics_arr"), col("unhex_data"))
        .as("d"))
    assert(d.filter(col("d").isNotNull).count() == 0)
  }

  test("indexed dynamic params decode as their topic hash") {
    import spark.implicits._
    // the contract-ABI spec puts only keccak(value) on-chain for an
    // indexed dynamic param — the decoder must surface that hash
    // verbatim (AbiDecodeExpressions' hash-passthrough branch), while
    // the non-indexed data region still decodes by value
    val abi =
      """{"name":"E","type":"event","anonymous":false,"inputs":[
        {"indexed":true,"name":"s","type":"string"},
        {"indexed":false,"name":"v","type":"uint256"}]}"""
    val topicHash = "0x" + "ab" * 32
    val df = Seq(1).toDF("x").select(
      array(lit("0x00"), lit(topicHash)).as("topics_arr"),
      unhex(lit("0" * 63 + "7")).as("unhex_data"))
    val d = df.select(
      AbiDecode.event(abi, col("topics_arr"), col("unhex_data")).as("d"))
      .select(col("d.s"), col("d.v")).head()
    assert(d.getString(0) == topicHash)
    assert(d.getDecimal(1).toBigInteger.intValueExact() == 7)
  }

  test("uint-as-string mode round-trips full-range uint256") {
    val abiStr = transferAbi.replace("{\"name\"",
      "{\"" + AbiJson.UintAsStringKey + "\":true,\"name\"")
    val big = BigInt(2).pow(255) + BigInt(12345)
    val hexVal = big.toString(16)
    import spark.implicits._
    val df = Seq(1).toDF("x").select(
      array(lit("0x00"),
        lit("0x" + "0" * 24 + "aa" * 20),
        lit("0x" + "0" * 24 + "bb" * 20)).as("topics_arr"),
      unhex(lit(("0" * (64 - hexVal.length)) + hexVal)).as("unhex_data"))
    val d = df.select(
      AbiDecode.event(abiStr, col("topics_arr"), col("unhex_data"))
        .as("d")).select(col("d.value")).first()
    assert(d.getString(0) == big.toString) // exact, no overflow-null
    // and without the flag the same value overflows DECIMAL(38,0) → null
    val d2 = df.select(
      AbiDecode.event(transferAbi, col("topics_arr"), col("unhex_data"))
        .as("d")).select(col("d.value")).first()
    assert(d2.isNullAt(0))
  }
}
