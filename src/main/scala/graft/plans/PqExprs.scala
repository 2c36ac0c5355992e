package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization ENCODE: L2-normalize the vector, split it into
  * `m` contiguous subspaces of `dsub` dims, and per subspace emit the
  * index of the L2-nearest codebook centroid — the `m`-code compressed
  * representation of the vector (`m` small ints instead of `m·dsub`
  * floats). On normalized vectors squared-L2 is 2 − 2·cosine, so
  * PQ distance ordering tracks the cosine ordering the rest of the ANN
  * family ranks by.
  *
  * The codebook matrix (flat row-major `[sub][centroid][dim]`,
  * m·ksub·dsub doubles) rides in the expression OBJECT, not the plan
  * tree — same analysis-size rationale as [[IvfAssignExpr]].
  *
  * Degenerate inputs (null vector, wrong length, null/NaN element,
  * zero norm) encode as all-zero codes — the deterministic degenerate
  * bucket, mirroring [[IvfAssignExpr]]'s convention.
  */
final case class PqEncodeExpr(child: Expression, codebooks: Array[Double],
                              m: Int, dsub: Int, ksub: Int)
    extends UnaryExpression with CodegenFallback {

  require(m >= 1 && dsub >= 1 && ksub >= 1, s"bad PQ shape m=$m dsub=$dsub ksub=$ksub")
  require(codebooks.length == m * ksub * dsub,
    s"codebook matrix ${codebooks.length} != m*ksub*dsub ${m * ksub * dsub}")

  private def dim: Int = m * dsub

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects array<float|double>, got ${other.sql}")
  }

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def degenerate: GenericArrayData =
    new GenericArrayData(new Array[Int](m))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return degenerate
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return degenerate
    val vec = new Array[Double](dim)
    var j = 0
    var norm2 = 0.0
    while (j < dim) {
      if (arr.isNullAt(j)) return degenerate
      val x = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      if (java.lang.Double.isNaN(x)) return degenerate
      vec(j) = x
      norm2 += x * x
      j += 1
    }
    if (norm2 == 0.0) return degenerate
    val inv = 1.0 / math.sqrt(norm2)
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val vOff = s * dsub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        val cbOff = (s * ksub + c) * dsub
        var d = 0.0
        j = 0
        while (j < dsub) {
          val diff = vec(vOff + j) * inv - codebooks(cbOff + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { best = c; bestD = d } // strict < => tie to lower id
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_encode"
}

/** Asymmetric-distance computation (ADC): given a row's PQ codes and a
  * query's lookup table (`lut[sub*ksub + c]` = squared L2 between the
  * query's subvector and codebook centroid `c` of subspace `sub`),
  * return the approximate squared distance Σ_sub lut[sub·ksub +
  * codes[sub]] — the per-candidate hot path of IVF-PQ search, one
  * gather+add per subspace, never touching raw vectors.
  *
  * Null codes / LUT, or an out-of-range code (possible only if codes
  * were produced by a codebook of different shape) → null, surfacing
  * the misuse instead of fabricating a distance.
  */
final case class PqAdcExpr(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression with CodegenFallback {

  require(ksub >= 1, s"ksub must be positive: $ksub")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType | FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc expects (array<int>, array<double>), got (${l.sql}, ${r.sql})")
  }

  @transient private lazy val lutIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val c = left.eval(input)
    val l = right.eval(input)
    if (c == null || l == null) return null
    val codes = c.asInstanceOf[ArrayData]
    val lut = l.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (lut.numElements() != m * ksub) return null
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val code = codes.getInt(s)
      if (code < 0 || code >= ksub) return null
      val idx = s * ksub + code
      acc += (if (lutIsFloat) lut.getFloat(idx).toDouble else lut.getDouble(idx))
      s += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_pq_adc"
}
