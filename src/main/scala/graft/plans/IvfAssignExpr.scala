package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression assigning an embedding to its `nProbe`
  * nearest IVF centroids (by inner product — centroids are L2-normalized
  * at training, so argmax dot == argmax cosine; the query vector's own
  * norm is constant across centroids and cancels). Returns the centroid
  * ids ordered nearest-first, ties broken by lower id.
  *
  * The centroid matrix rides in the expression object (one flat row-major
  * array), NOT as an expression tree — same plan-size rationale as
  * [[RhpSigExpr]]: k×dim literal doubles per call site would blow up
  * analysis. CodegenFallback: the eval loop IS the fast path.
  *
  * Null/degenerate parity with the HOF conventions used across graft:
  * null vector, length ≠ dim, or null element → centroid 0 alone (the
  * deterministic degenerate bucket).
  */
final case class IvfAssignExpr(child: Expression, centroids: Array[Double],
                               k: Int, dim: Int, nProbe: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && nProbe >= 1 && nProbe <= k,
    s"need 1 <= nProbe ($nProbe) <= k ($k)")
  require(centroids.length == k * dim,
    s"centroid matrix ${centroids.length} != k*dim ${k * dim}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_ivf_assign expects array<float|double>, got ${other.sql}")
    }
  }

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def degenerate: GenericArrayData = new GenericArrayData(Array(0))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return degenerate
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != dim) return degenerate
    val vec = new Array[Double](dim)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return degenerate
      vec(j) = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    // dots against every centroid, then select top-nProbe (k is small —
    // a partial selection beats sorting)
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      val off = c * dim
      var acc = 0.0
      j = 0
      while (j < dim) { acc += vec(j) * centroids(off + j); j += 1 }
      // NaN dots (NaN element in the vector) sink to -inf: NaN compares
      // false under `>` so an all-NaN row would otherwise select nothing
      dots(c) = if (java.lang.Double.isNaN(acc)) Double.NegativeInfinity
                else acc
      c += 1
    }
    val picked = new Array[Int](nProbe)
    val used = new Array[Boolean](k)
    var p = 0
    while (p < nProbe) {
      var best = -1
      var bestDot = Double.NegativeInfinity
      c = 0
      while (c < k) {
        // `best < 0` guard: when every remaining dot is -inf, fall back to
        // the lowest unused centroid id (deterministic, never crashes)
        if (!used(c) && (best < 0 || dots(c) > bestDot)) {
          best = c; bestDot = dots(c)
        }
        c += 1
      }
      used(best) = true
      picked(p) = best
      p += 1
    }
    new GenericArrayData(picked)
  }

  override protected def withNewChildInternal(newChild: Expression): IvfAssignExpr =
    copy(child = newChild)

  // Content-based equality: the synthesized case-class equals compares the
  // centroid matrix by REFERENCE, so two assignments against the same
  // trained centroids would never compare equal — defeating CSE and
  // ReuseExchange. Hash is cached — the matrix is an immutable literal.
  override def equals(o: Any): Boolean = o match {
    case that: IvfAssignExpr =>
      k == that.k && dim == that.dim && nProbe == that.nProbe &&
        child == that.child &&
        java.util.Arrays.equals(centroids, that.centroids)
    case _ => false
  }
  @transient override lazy val hashCode: Int =
    java.util.Objects.hash(child, Int.box(java.util.Arrays.hashCode(centroids)),
      Int.box(k), Int.box(dim), Int.box(nProbe))

  override def prettyName: String = "graft_ivf_assign"
}
