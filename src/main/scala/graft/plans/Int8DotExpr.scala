package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native fixed-dimension INTEGER dot product over two `array<int|bigint>`
  * columns — the quantized-scan twin of [[DotExpr]], for the int8
  * scalar-quantized ANN path (`Similarity.int8TopK`).
  *
  * Why a separate expression: the quantized candidate scan evaluates
  * O(n²) dot products whose operands are small integers. Accumulating in
  * `long` keeps every intermediate EXACT (dim ≤ 2^38 before overflow at
  * int8 magnitudes, i.e. never), so the result is the same integer on
  * every engine and every evaluation order — there is no float-ordering
  * hazard to pin, which is precisely what makes the quantized scan
  * oracle-checkable end to end (q112's DuckDB twin reproduces the same
  * integers from the same quantized lists).
  *
  * Same contract as [[DotExpr]]: inputs shorter than `dim` raise; null
  * vector → null; a null ELEMENT within the first `dim` slots → null
  * (never a fabricated 0 contribution). Codegen'd (`doGenCode`) because
  * it sits inside whole-stage-codegen'd join stages on the n² hot path;
  * the interpreted `nullSafeEval` fallback accumulates identically.
  */
final case class Int8DotExpr(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression {

  require(dim >= 1, s"dim must be positive: $dim")

  override def dataType: DataType = LongType
  // null ELEMENTS also null the result, independent of column nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType | LongType, _),
            ArrayType(IntegerType | LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_dot_i8 expects two array<int|bigint>, got ${l.sql}, ${r.sql}")
    }
  }

  @transient private lazy val leftInt: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == IntegerType
  @transient private lazy val rightInt: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() < dim || b.numElements() < dim) {
      throw new IllegalArgumentException(
        s"graft_dot_i8: vector shorter than dim=$dim " +
          s"(${a.numElements()}, ${b.numElements()})")
    }
    var acc = 0L
    var j = 0
    while (j < dim) {
      if (a.isNullAt(j) || b.isNullAt(j)) return null // null-propagate
      val x = if (leftInt) a.getInt(j).toLong else a.getLong(j)
      val y = if (rightInt) b.getInt(j).toLong else b.getLong(j)
      acc += x * y
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val aGet = if (leftInt) "getInt" else "getLong"
    val bGet = if (rightInt) "getInt" else "getLong"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      // same shape as nullSafeEval: bounds error, per-element null
      // propagation, exact long accumulation
      s"""
         |if ($a.numElements() < $dim || $b.numElements() < $dim) {
         |  throw new IllegalArgumentException(
         |    "graft_dot_i8: vector shorter than dim=$dim (" +
         |    $a.numElements() + ", " + $b.numElements() + ")");
         |}
         |long $acc = 0L;
         |for (int $j = 0; $j < $dim; $j++) {
         |  if ($a.isNullAt($j) || $b.isNullAt($j)) {
         |    ${ev.isNull} = true;
         |    break;
         |  }
         |  $acc += ((long) $a.$aGet($j)) * ((long) $b.$bGet($j));
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8DotExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot_i8"
}
