package graft.abi

import java.math.BigInteger
import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer
import AbiType._

/** Contract-ABI head/tail binary codec (Ethereum contract ABI spec,
  * public). Decode returns plain JVM values (BigInteger / Boolean /
  * String / Seq); the Catalyst conversion lives in AbiDecodeExpressions.
  * The encoder exists for tests and fixture construction (ScalaCheck
  * round-trips gate the decoder, SURVEY §5).
  */
object AbiCodec {

  // ---------------------------------------------------------------- decode

  def readUint(data: Array[Byte], pos: Int): BigInteger = {
    // pos >= 0 guards the base+offset Int-overflow case (a corrupt
    // dynamic offset near 2^31 wraps negative), and the upper check
    // runs in LONG arithmetic — `pos + 32` itself wraps for pos near
    // Int.MaxValue and would satisfy an Int comparison. Reject both
    // here with a decode-to-null-able exception instead of relying on
    // copyOfRange to throw downstream.
    require(pos >= 0 && pos.toLong + 32L <= data.length.toLong,
      s"offset $pos past end ${data.length}")
    new BigInteger(1, java.util.Arrays.copyOfRange(data, pos, pos + 32))
  }

  /** Decode a head/tail sequence whose heads start at `base`. */
  def decodeSeq(data: Array[Byte], types: Seq[AbiType], base: Int): Seq[Any] = {
    var pos = base
    types.map { t =>
      val v =
        if (t.isDynamic) {
          val off = readUint(data, pos).intValueExact()
          decodeDynamicAt(data, t, base + off)
        } else decodeStaticAt(data, t, pos)
      pos += t.headSize
      v
    }
  }

  /** Decode one 32-byte-word static value (also used for indexed topics).
    * Bounds-guarded like [[readUint]]: every static value occupies at
    * least one full word at `pos`, and `Arrays.copyOfRange` silently
    * ZERO-PADS past `data.length` — a truncated payload or short indexed
    * topic would otherwise decode to a plausible-but-wrong value instead
    * of throwing (→ decode-to-null upstream). Long arithmetic so a pos
    * near Int.MaxValue cannot wrap the comparison. Composite statics
    * (fixed arrays / tuples) re-check per element on recursion.
    */
  def decodeStaticAt(data: Array[Byte], t: AbiType, pos: Int): Any = {
    // zero-width statics (uint256[0], components-less tuple) read
    // nothing — headSize 0 must not demand a word that isn't there
    // when positioned at the payload end; composite statics re-check
    // per element on recursion
    val need = math.min(32, t.headSize).toLong
    require(pos >= 0 && pos.toLong + need <= data.length.toLong,
      s"static read at $pos past end ${data.length}")
    decodeStaticUnchecked(data, t, pos)
  }

  private def decodeStaticUnchecked(data: Array[Byte], t: AbiType, pos: Int): Any = t match {
    case TUint(_) => readUint(data, pos)
    case TInt(_) =>
      new BigInteger(java.util.Arrays.copyOfRange(data, pos, pos + 32))
    case TAddress =>
      "0x" + Keccak256.hex(
        java.util.Arrays.copyOfRange(data, pos + 12, pos + 32))
    case TBool => data(pos + 31) != 0
    case TBytesFixed(n) =>
      "0x" + Keccak256.hex(java.util.Arrays.copyOfRange(data, pos, pos + n))
    case TArray(e, Some(n)) =>
      (0 until n).map(i => decodeStaticAt(data, e, pos + i * e.headSize))
    case TTuple(fields) =>
      var p = pos
      fields.map { case (_, ft) =>
        val v = decodeStaticAt(data, ft, p); p += ft.headSize; v
      }
    case other => throw new IllegalArgumentException(s"not static: $other")
  }

  /** Dynamic-region length, validated BEFORE anything allocates. A
    * shape-mismatched or corrupt payload (the corpus-wide decode case:
    * most of a day's logs do NOT match a given ABI element) yields a
    * garbage length here — up to 2³¹ — and `copyOfRange`/`Seq.fill`
    * would try to ALLOCATE it: an executor-killing OutOfMemoryError
    * that the decode-to-null Exception guard upstream cannot catch
    * (Error ≠ Exception). `perElem` is the minimum payload bytes each
    * claimed element must occupy (1 for raw bytes, 32 for array heads),
    * so the check is simply "the tail physically fits in the data". */
  private def boundedLen(data: Array[Byte], pos: Int, perElem: Int): Int = {
    val len = readUint(data, pos).intValueExact()
    require(len >= 0 &&
      pos.toLong + 32L + len.toLong * perElem <= data.length.toLong,
      s"dynamic length $len at $pos exceeds payload ${data.length}")
    len
  }

  private def decodeDynamicAt(data: Array[Byte], t: AbiType, pos: Int): Any =
    t match {
      case TBytes =>
        val len = boundedLen(data, pos, 1)
        "0x" + Keccak256.hex(
          java.util.Arrays.copyOfRange(data, pos + 32, pos + 32 + len))
      case TString =>
        val len = boundedLen(data, pos, 1)
        new String(
          java.util.Arrays.copyOfRange(data, pos + 32, pos + 32 + len),
          StandardCharsets.UTF_8)
      case TArray(e, None) =>
        // every claimed element occupies ≥32 head bytes
        val len = boundedLen(data, pos, 32)
        decodeSeq(data, Seq.fill(len)(e), pos + 32)
      case TArray(e, Some(n)) => // fixed array of dynamic elems
        decodeSeq(data, Seq.fill(n)(e), pos)
      case TTuple(fields) =>
        decodeSeq(data, fields.map(_._2), pos)
      case other => throw new IllegalArgumentException(s"not dynamic: $other")
    }

  // ---------------------------------------------------------------- encode

  private def word(v: BigInteger): Array[Byte] = {
    val out = new Array[Byte](32)
    val raw = v.toByteArray // two's complement, minimal
    if (v.signum() < 0) java.util.Arrays.fill(out, 0xff.toByte)
    val src = if (raw.length > 32) raw.drop(raw.length - 32) else raw
    System.arraycopy(src, 0, out, 32 - src.length, src.length)
    out
  }

  private def unhex(s: String): Array[Byte] = {
    val h = if (s.startsWith("0x")) s.substring(2) else s
    val out = new Array[Byte](h.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(h.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  private def padRight(b: Array[Byte]): Array[Byte] = {
    val n = ((b.length + 31) / 32) * 32
    java.util.Arrays.copyOf(b, n)
  }

  def encodeStatic(t: AbiType, v: Any): Array[Byte] = t match {
    case TUint(_) | TInt(_) => word(toBigInt(v))
    case TAddress =>
      val a = unhex(v.asInstanceOf[String])
      val out = new Array[Byte](32)
      System.arraycopy(a, 0, out, 32 - a.length, a.length)
      out
    case TBool =>
      word(if (v.asInstanceOf[Boolean]) BigInteger.ONE else BigInteger.ZERO)
    case TBytesFixed(_) => padRight(unhex(v.asInstanceOf[String]))
    case TArray(e, Some(_)) =>
      seqOf(v).flatMap(x => encodeStatic(e, x)).toArray
    case TTuple(fields) =>
      fields.zip(seqOf(v)).flatMap { case ((_, ft), x) =>
        encodeStatic(ft, x)
      }.toArray
    case other => throw new IllegalArgumentException(s"not static: $other")
  }

  private def toBigInt(v: Any): BigInteger = v match {
    case b: BigInteger => b
    case b: BigInt => b.bigInteger
    case l: Long => BigInteger.valueOf(l)
    case i: Int => BigInteger.valueOf(i.toLong)
    case s: String => new BigInteger(s)
    case other => throw new IllegalArgumentException(s"not integral: $other")
  }

  private def seqOf(v: Any): Seq[Any] = v match {
    case s: Seq[_] => s
    case a: Array[_] => a.toSeq
    case p: Product => p.productIterator.toSeq
    case other => throw new IllegalArgumentException(s"not a sequence: $other")
  }

  private def encodeDynamic(t: AbiType, v: Any): Array[Byte] = t match {
    case TBytes =>
      val b = unhex(v.asInstanceOf[String])
      word(BigInteger.valueOf(b.length.toLong)) ++ padRight(b)
    case TString =>
      val b = v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
      word(BigInteger.valueOf(b.length.toLong)) ++ padRight(b)
    case TArray(e, None) =>
      val xs = seqOf(v)
      word(BigInteger.valueOf(xs.length.toLong)) ++
        encodeSeq(Seq.fill(xs.length)(e), xs)
    case TArray(e, Some(n)) => encodeSeq(Seq.fill(n)(e), seqOf(v))
    case TTuple(fields) => encodeSeq(fields.map(_._2), seqOf(v))
    case other => throw new IllegalArgumentException(s"not dynamic: $other")
  }

  /** Encode a head/tail sequence (the layout of both call data and the
    * non-indexed event data region). */
  def encodeSeq(types: Seq[AbiType], values: Seq[Any]): Array[Byte] = {
    require(types.length == values.length, "arity mismatch")
    val headTotal = types.map(_.headSize).sum
    val heads = new ArrayBuffer[Array[Byte]]
    val tails = new ArrayBuffer[Array[Byte]]
    var tailLen = 0
    types.zip(values).foreach { case (t, v) =>
      if (t.isDynamic) {
        val tail = encodeDynamic(t, v)
        heads += word(BigInteger.valueOf((headTotal + tailLen).toLong))
        tails += tail
        tailLen += tail.length
      } else heads += encodeStatic(t, v)
    }
    (heads ++ tails).flatten.toArray
  }
}
