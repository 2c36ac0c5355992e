package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization ENCODE with residuals — the IVF-PQ layout:
  * L2-normalize the vector, subtract its coarse-list centroid (the
  * `right` child is the row's IVF list id), split the RESIDUAL into
  * `m` contiguous subspaces of `dsub` dims, and per subspace emit the
  * index of the L2-nearest codebook centroid. Residual encoding is what
  * makes PQ resolve within-cluster differences: the cluster mean —
  * common to every candidate a probe sees — is removed before
  * quantization, so the codebooks spend their bits on what
  * distinguishes neighbors (FAISS IndexIVFPQ architecture; public
  * knowledge).
  *
  * The codebook matrix (flat `[sub][centroid][dim]`, m·ksub·dsub) and
  * the coarse-centroid matrix (flat `[list][dim]`) ride in the
  * expression OBJECT, not the plan tree — same analysis-size rationale
  * as [[IvfAssignExpr]]. A zero-length coarse matrix means "no
  * residual" (plain PQ on the normalized vector).
  *
  * Degenerate inputs (null vector/list, wrong length, null/NaN
  * element, zero norm, list id outside the coarse matrix) encode as
  * all-zero codes — the deterministic degenerate bucket.
  */
final case class PqEncodeExpr(left: Expression, right: Expression,
                              codebooks: Array[Double],
                              coarse: Array[Double],
                              m: Int, dsub: Int, ksub: Int)
    extends BinaryExpression with CodegenFallback {

  require(m >= 1 && dsub >= 1 && ksub >= 1,
    s"bad PQ shape m=$m dsub=$dsub ksub=$ksub")
  require(codebooks.length == m * ksub * dsub,
    s"codebook matrix ${codebooks.length} != m*ksub*dsub ${m * ksub * dsub}")
  require(coarse.isEmpty || coarse.length % (m * dsub) == 0,
    s"coarse matrix ${coarse.length} not a multiple of dim ${m * dsub}")

  private def dim: Int = m * dsub
  private def nLists: Int = coarse.length / dim

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode expects (array<float|double>, int), got (${l.sql}, ${r.sql})")
    }

  @transient private lazy val isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def degenerate: GenericArrayData =
    new GenericArrayData(new Array[Int](m))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = left.eval(input)
    val listV = right.eval(input)
    if (v == null || listV == null) return degenerate
    val list = listV.asInstanceOf[Int]
    if (coarse.nonEmpty && (list < 0 || list >= nLists)) return degenerate
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
    val cOff = list * dim
    j = 0
    while (j < dim) {
      vec(j) = vec(j) * inv - (if (coarse.isEmpty) 0.0 else coarse(cOff + j))
      j += 1
    }
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
          val diff = vec(vOff + j) - codebooks(cbOff + j)
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

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeExpr =
    copy(left = newLeft, right = newRight)

  // Array fields get reference equality from the synthesized case-class
  // equals, so two semantically identical expressions would never compare
  // equal — defeating common-subexpression elimination, plan-cache reuse,
  // and ReuseExchange. Compare matrix CONTENTS instead (hash cached: the
  // matrices are immutable-by-contract literals).
  override def equals(o: Any): Boolean = o match {
    case that: PqEncodeExpr =>
      m == that.m && dsub == that.dsub && ksub == that.ksub &&
        left == that.left && right == that.right &&
        java.util.Arrays.equals(codebooks, that.codebooks) &&
        java.util.Arrays.equals(coarse, that.coarse)
    case _ => false
  }
  @transient override lazy val hashCode: Int =
    java.util.Objects.hash(left, right,
      Int.box(java.util.Arrays.hashCode(codebooks)),
      Int.box(java.util.Arrays.hashCode(coarse)),
      Int.box(m), Int.box(dsub), Int.box(ksub))

  override def prettyName: String = "graft_pq_encode"
}

/** Asymmetric-distance computation (ADC): given a row's PQ codes and a
  * query's lookup table (`lut[sub*ksub + c]` = squared L2 between the
  * query's residual subvector and codebook centroid `c` of subspace
  * `sub`), return the approximate squared distance Σ_sub lut[sub·ksub +
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
