package graft.abi

import java.math.BigInteger
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import AbiType._

/** Raw ABI values → Catalyst values. `uintAsString` emits >64-bit ints
  * as exact decimal strings instead of DECIMAL(38,0)-or-null. */
private[abi] object AbiCatalyst {
  def convert(t: AbiType, v: Any, uintAsString: Boolean = false): Any =
    t match {
    case TUint(bits) =>
      val bi = v.asInstanceOf[BigInteger]
      if (bits < 64) bi.longValue()
      else if (uintAsString) UTF8String.fromString(bi.toString)
      else decimalOrNull(bi)
    case TInt(bits) =>
      val bi = v.asInstanceOf[BigInteger]
      if (bits <= 64) bi.longValue()
      else if (uintAsString) UTF8String.fromString(bi.toString)
      else decimalOrNull(bi)
    case TAddress | TBytes | _: TBytesFixed | TString =>
      UTF8String.fromString(v.asInstanceOf[String])
    case TBool => v.asInstanceOf[Boolean]
    case TArray(e, _) =>
      new GenericArrayData(
        v.asInstanceOf[Seq[Any]].map(convert(e, _, uintAsString)).toArray)
    case TTuple(fields) =>
      val vs = v.asInstanceOf[Seq[Any]]
      new GenericInternalRow(fields.zip(vs).map {
        case ((_, ft), fv) => convert(ft, fv, uintAsString) }.toArray)
  }

  /** uint256 can exceed DECIMAL(38,0) (2^256 ≈ 1.16e77): the reference
    * accepts this truncation risk (SURVEY §7.3); we decode to null on
    * overflow rather than corrupt. */
  def decimalOrNull(bi: BigInteger): Any = {
    val d = Decimal(new java.math.BigDecimal(bi))
    if (d.changePrecision(38, 0)) d else null
  }
}

/** All runtime state + logic for one event decode, behind a single
  * `decode` entry point so both `eval` and generated code share one
  * virtual call. Serializable with only the ABI JSON as payload — the
  * parsed event re-materializes lazily on each executor. */
final class AbiEventDecoder(abiJson: String) extends Serializable {
  @transient lazy val event: AbiEvent = AbiJson.parseEvent(abiJson)
  @transient lazy val uintAsString: Boolean = AbiJson.uintAsString(abiJson)
  @transient lazy val schema: StructType =
    AbiSchema.eventSchema(event, uintAsString)

  /** Decode failure → null (malformed on-chain data must not kill a
    * 100 TB batch). `data` may be null (no data region). */
  def decode(topics: ArrayData, data: Array[Byte]): InternalRow = {
    if (topics == null) return null
    try decodeUnsafe(topics, if (data == null) Array.emptyByteArray else data)
    catch { case _: Exception => null }
  }

  private def hexToBytes(s: String): Array[Byte] = {
    val h = if (s.startsWith("0x")) s.substring(2) else s
    val out = new Array[Byte](h.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(h.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  private def decodeUnsafe(topics: ArrayData, data: Array[Byte]): InternalRow = {
    var topicIdx = if (event.anonymous) 0 else 1
    // shape guard BEFORE any topic read: an event variant declaring
    // more indexed params than the log carries topics (erc721-style
    // Transfer decoding an erc20-shaped log — the corpus-wide case)
    // would index past the array end, and UnsafeArrayData reads a
    // garbage offset/length word there → an unbounded String
    // allocation the Exception guard can't catch. Too few topics is a
    // shape mismatch → null row.
    if (topics.numElements() < topicIdx + event.inputs.count(_.indexed))
      throw new IllegalArgumentException(
        s"event needs ${topicIdx + event.inputs.count(_.indexed)} topics, " +
          s"log has ${topics.numElements()}")
    val nonIndexed = event.inputs.filterNot(_.indexed)
    val dataTypes = nonIndexed.map(_.abiType)
    val dataValues = AbiCodec.decodeSeq(data, dataTypes, 0)
    val dataIter = nonIndexed.zip(dataValues).iterator.map {
      case (p, v) => AbiCatalyst.convert(p.abiType, v, uintAsString)
    }
    val out = event.inputs.map { p =>
      if (p.indexed) {
        val topic = topics.getUTF8String(topicIdx).toString
        topicIdx += 1
        p.abiType match {
          case t @ (TAddress | TBool | _: TUint | _: TInt | _: TBytesFixed) =>
            AbiCatalyst.convert(t,
              AbiCodec.decodeStaticAt(hexToBytes(topic), t, 0),
              uintAsString)
          case _ => UTF8String.fromString(topic) // hash of dynamic value
        }
      } else dataIter.next()
    }
    new GenericInternalRow(out.toArray)
  }
}

/** Runtime state + logic for one call decode (see AbiEventDecoder). */
final class AbiCallDecoder(abiJson: String) extends Serializable {
  @transient lazy val fn: AbiFunction = AbiJson.parseFunction(abiJson)
  @transient lazy val uintAsString: Boolean = AbiJson.uintAsString(abiJson)
  @transient lazy val schema: StructType = AbiSchema.callSchema(fn, uintAsString)

  /** `input` null → null row; `output` null/empty → null output fields. */
  def decode(input: Array[Byte], output: Array[Byte]): InternalRow = {
    if (input == null) return null
    try {
      val inTypes = fn.inputs.map(_.abiType)
      val inVals = AbiCodec
        .decodeSeq(java.util.Arrays.copyOfRange(input, 4, input.length),
          inTypes, 0)
        .zip(inTypes).map { case (v, t) =>
          AbiCatalyst.convert(t, v, uintAsString) }
      val outTypes = fn.outputs.map(_.abiType)
      val outVals =
        if (output == null || output.isEmpty) fn.outputs.map(_ => null)
        else AbiCodec.decodeSeq(output, outTypes, 0)
          .zip(outTypes).map { case (v, t) =>
            AbiCatalyst.convert(t, v, uintAsString) }
      new GenericInternalRow((inVals ++ outVals).toArray)
    } catch { case _: Exception => null }
  }
}

/** `abi_decode_event(topics_arr, unhex_data, '<event abi json>')` →
  * struct with one field per ABI input. Indexed inputs come from
  * topics[1..] (topics[0..] for anonymous events); non-indexed inputs are
  * head/tail-decoded from the data region. Dynamic indexed params surface
  * as their keccak topic hash (spec: only the hash is on-chain).
  *
  * The ABI JSON must be a foldable literal — the result schema is a
  * function of it (resolved at analysis time). Decode failure → null row.
  * Codegen'd: the generated code is one call into the decoder reference,
  * so the whole-stage span stays fused around the decode.
  */
case class AbiDecodeEvent(first: Expression, second: Expression,
    third: Expression)
  extends TernaryExpression {

  @transient private lazy val decoder =
    new AbiEventDecoder(third.eval(null).toString)

  override def dataType: DataType = decoder.schema
  override def nullable: Boolean = true
  override def prettyName: String = "abi_decode_event"
  // Functionally deterministic, but declared otherwise as an optimizer
  // barrier: CollapseProject/PushDownPredicates would otherwise inline
  // the decode into every GetStructField reference (star expansion) and
  // the null filter → O(fields) decodes per row instead of one.
  override lazy val deterministic: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!third.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("abi json must be a literal")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val topicsRaw = first.eval(input)
    if (topicsRaw == null) return null
    decoder.decode(topicsRaw.asInstanceOf[ArrayData],
      second.eval(input).asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("abiEventDecoder", decoder,
      classOf[AbiEventDecoder].getName)
    val topicsGen = first.genCode(ctx)
    val dataGen = second.genCode(ctx)
    ev.copy(code = code"""
      ${topicsGen.code}
      boolean ${ev.isNull} = true;
      InternalRow ${ev.value} = null;
      if (!${topicsGen.isNull}) {
        ${dataGen.code}
        ${ev.value} = $ref.decode(${topicsGen.value},
          ${dataGen.isNull} ? null : ${dataGen.value});
        ${ev.isNull} = (${ev.value} == null);
      }""")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** `abi_decode_call(unhex_input, unhex_output, '<function abi json>')` →
  * struct of decoded inputs (after the 4-byte selector) + outputs
  * (fields `output_*`). Output side may be absent (null/empty) → null
  * output fields. Codegen'd like AbiDecodeEvent. */
case class AbiDecodeCall(first: Expression, second: Expression,
    third: Expression)
  extends TernaryExpression {

  @transient private lazy val decoder =
    new AbiCallDecoder(third.eval(null).toString)

  override def dataType: DataType = decoder.schema
  override def nullable: Boolean = true
  override def prettyName: String = "abi_decode_call"
  // single-evaluation barrier — see AbiDecodeEvent.deterministic
  override lazy val deterministic: Boolean = false

  override def eval(input: InternalRow): Any = {
    val inRaw = first.eval(input)
    if (inRaw == null) return null
    decoder.decode(inRaw.asInstanceOf[Array[Byte]],
      second.eval(input).asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("abiCallDecoder", decoder,
      classOf[AbiCallDecoder].getName)
    val inGen = first.genCode(ctx)
    val outGen = second.genCode(ctx)
    ev.copy(code = code"""
      ${inGen.code}
      boolean ${ev.isNull} = true;
      InternalRow ${ev.value} = null;
      if (!${inGen.isNull}) {
        ${outGen.code}
        ${ev.value} = $ref.decode(${inGen.value},
          ${outGen.isNull} ? null : ${outGen.value});
        ${ev.isNull} = (${ev.value} == null);
      }""")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** Column-level API + SQL registration. */
object AbiDecode {
  def event(abiJson: String, topics: Column, data: Column): Column =
    ExpressionUtils.column(AbiDecodeEvent(
      ExpressionUtils.expression(topics),
      ExpressionUtils.expression(data),
      Literal(abiJson)))

  def call(abiJson: String, input: Column, output: Column): Column =
    ExpressionUtils.column(AbiDecodeCall(
      ExpressionUtils.expression(input),
      ExpressionUtils.expression(output),
      Literal(abiJson)))

  /** Expose both decoders to `spark.sql`:
    * `abi_decode_event(topics_arr, unhex_data, '<abi json literal>')`,
    * `abi_decode_call(unhex_input, unhex_output, '<abi json literal>')`.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("abi_decode_event",
      exprs => AbiDecodeEvent(exprs(0), exprs(1), exprs(2)), "scala_udf")
    reg.createOrReplaceTempFunction("abi_decode_call",
      exprs => AbiDecodeCall(exprs(0), exprs(1), exprs(2)), "scala_udf")
  }
}
