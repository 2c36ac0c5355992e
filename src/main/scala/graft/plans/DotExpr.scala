package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native fixed-dimension dot product over two `array<float|double>`
  * columns — the JVM-loop equivalent of `Similarity.dotUnrolled`
  * (bit-identical: left-associated accumulation in element order, every
  * product in double).
  *
  * Why: the unrolled `element_at` chain is 2×dim expression nodes per
  * pair; in the all-pairs hot path (n² evaluations after a nested-loop
  * join) it measured ~7.5 µs per 64-dim dot at sf0.1 — q37 spent 18 s of
  * its 42 s there. One tight double[] loop per pair is ~100× cheaper.
  *
  * Unlike the signature expressions (per-row cost dominated by hashing,
  * CodegenFallback is fine there), this one evaluates O(n²) times inside
  * whole-stage-codegen'd join stages — so it implements `doGenCode`: the
  * loop inlines into the generated stage and the per-pair
  * InternalRow-eval dispatch disappears. The interpreted `nullSafeEval`
  * stays as the non-codegen fallback; both paths accumulate
  * left-associated in element order, so they are bit-identical
  * (spec-pinned, and the q37 oracle hash gates it end to end).
  *
  * Inputs shorter than `dim` raise an error, matching the unrolled
  * formulation's ANSI `element_at` out-of-bounds behavior (an error, not
  * a silent truncation). Null vector → null (standard binary-null
  * semantics) and a null ELEMENT within the first `dim` slots also → null
  * — exactly the unrolled chain's null propagation (a null product nulls
  * the whole sum), never a fabricated 0.0 contribution.
  */
final case class DotExpr(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression {

  require(dim >= 1, s"dim must be positive: $dim")

  override def dataType: DataType = DoubleType
  // null ELEMENTS also null the result, independent of column nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_dot expects two array<float|double>, got ${l.sql}, ${r.sql}")
    }
  }

  @transient private lazy val leftFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() < dim || b.numElements() < dim) {
      throw new IllegalArgumentException(
        s"graft_dot: vector shorter than dim=$dim " +
          s"(${a.numElements()}, ${b.numElements()})")
    }
    var acc = 0.0
    var j = 0
    while (j < dim) {
      if (a.isNullAt(j) || b.isNullAt(j)) return null // null-propagate
      val x = if (leftFloat) a.getFloat(j).toDouble else a.getDouble(j)
      val y = if (rightFloat) b.getFloat(j).toDouble else b.getDouble(j)
      acc += x * y
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val aGet = if (leftFloat) "getFloat" else "getDouble"
    val bGet = if (rightFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      // same shape as nullSafeEval: bounds error, per-element null
      // propagation, left-associated double accumulation
      s"""
         |if ($a.numElements() < $dim || $b.numElements() < $dim) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: vector shorter than dim=$dim (" +
         |    $a.numElements() + ", " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $j = 0; $j < $dim; $j++) {
         |  if ($a.isNullAt($j) || $b.isNullAt($j)) {
         |    ${ev.isNull} = true;
         |    break;
         |  }
         |  $acc += ((double) $a.$aGet($j)) * ((double) $b.$bGet($j));
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}
