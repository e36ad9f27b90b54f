package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  FloatType, IntegerType}

/** Sequential-fold dot product of two numeric arrays in DOUBLE:
  * `(((0.0 + a0*b0) + a1*b1) + …)` — the exact IEEE-754 evaluation order
  * of the declarative `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, +)`
  * formulation (and of DuckDB's `list_sum(list_transform(list_zip(..)))`),
  * so swapping this in changes NOTHING about results, only cost.
  *
  * Why it exists: the higher-order-function version interprets two
  * lambdas per element and allocates an intermediate array per PAIR —
  * ruinous inside an O(n²) similarity join where the dot product is the
  * entire inner loop. This is a codegen'd flat loop over the two
  * ArrayData buffers: no allocation, no virtual calls, stays inside
  * WholeStageCodegen.
  *
  * Null semantics mirror the HOF version: null array → null; any null
  * element → null; length mismatch (zip_with pads with null) → null.
  *
  * Integer arrays are accepted too (the int8-quantized ANN search
  * path): products and partial sums of int8 components are exact in
  * double (|x·y| ≤ 127² and dims ≪ 2⁴⁰), so the fold is bit-exact
  * against any integer-arithmetic oracle. MAGNITUDE PRECONDITION for
  * exactness on GENERAL int inputs: the accumulator is a double, so
  * exactness holds only while every partial sum stays below 2⁵³ —
  * i.e. max|aᵢ·bᵢ|·dims < 2⁵³. Full-range int32 products (up to
  * ~4.6·10¹⁸) exceed that and round like any double arithmetic; the
  * int8 path this exists for sits ~10 orders of magnitude below the
  * edge. Callers quantizing wider than ~int16 should rescale first.
  */
case class DotProductFold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product_fold"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType | IntegerType, _),
            ArrayType(FloatType | DoubleType | IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs two array<float|double|int> inputs, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
  }

  @inline private def get(arr: ArrayData, i: Int, t: DataType): Double =
    t match {
      case FloatType => arr.getFloat(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case _ => arr.getDouble(i)
    }

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) return null
    val ta = elemType(left)
    val tb = elemType(right)
    var acc = 0.0
    var i = 0
    val n = aa.numElements()
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      acc += get(aa, i, ta) * get(bb, i, tb)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"((double) $arr.getFloat($i))"
      case IntegerType => s"((double) $arr.getInt($i))"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += ${getter(elemType(left), a, i)} *
         |      ${getter(elemType(right), b, i)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}
