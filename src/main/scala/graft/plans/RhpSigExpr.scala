package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression computing a random-hyperplane LSH signature
  * over an `array<float|double>` embedding — the JVM-loop equivalent of
  * `graft.ext.Similarity.rhpSignature` (same seeded Gaussian planes, same
  * left-associated dot-product order, bit-identical output; the spec
  * asserts equality).
  *
  * Why an expression instead of the HOF fold: the HOF formulation embeds
  * every plane as a dim-length literal array in the plan — nPlanes×dim
  * doubles per call site, ×tables ×probes at the LSH call sites. Beyond the
  * interpreted per-element lambda frames at eval time, the literal blow-up
  * makes the *plan itself* quadratic-ish to analyze/optimize (round-1 bench:
  * q31 at 317 s on 2 000 vectors, with Spark warning the plan string was too
  * large to print). Here the plane matrix lives in the expression OBJECT —
  * the plan carries only (nPlanes, dim, seed) — and eval is one tight
  * double[] loop per row. CodegenFallback is deliberate: the eval loop IS
  * the fast path (same rationale as [[MinHashSigExpr]]).
  *
  * Bit-equality contract with `Similarity.rhpSignature` (spec-pinned by
  * RhpExprSpec, including the edges):
  *  - planes from `new Random(seed)`, `nextGaussian` in row-major order
  *    (exactly `Similarity.hyperplanes`);
  *  - dot accumulates left-to-right in element order (matches the HOF
  *    `aggregate` fold);
  *  - bit i = (dot >= 0), folded MSB-first as `acc*2 + bit`;
  *  - null vector → 0L (the HOF's per-bit `when/otherwise` sends a null
  *    dot to bit 0 for every plane);
  *  - vector length ≠ dim, or any null element → 0L (`zip_with` pads the
  *    shorter side with null, nulling every dot);
  *  - NaN dot → bit 1 (Spark SQL comparison semantics order NaN above
  *    every double, so `dot >= 0` holds).
  */
final case class RhpSigExpr(child: Expression, nPlanes: Int, dim: Int,
                            seed: Long)
    extends UnaryExpression with CodegenFallback {

  require(nPlanes >= 1 && nPlanes <= 63, s"nPlanes must be in [1,63]: $nPlanes")

  override def dataType: DataType = LongType
  // never null: a null input vector degenerates to signature 0L, exactly
  // like the HOF formulation (see bit-equality contract above)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_rhp_sig expects array<float|double>, got ${other.sql}")
    }
  }

  // one flat row-major matrix per expression instance; regenerated on each
  // executor after serialization (lazy + derived from the tiny seed triple)
  @transient private lazy val planes: Array[Double] =
    RhpSigExpr.planeMatrix(nPlanes, dim, seed)

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L // HOF parity: null vector → all bits 0
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // HOF parity: zip_with pads the shorter side with null, so ANY length
    // mismatch (or null element) nulls every dot → every bit 0
    if (n != dim) return 0L
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return 0L
      j += 1
    }
    val m = planes
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      val off = p * dim
      var acc = 0.0
      j = 0
      if (isFloat) {
        while (j < n) { acc += arr.getFloat(j).toDouble * m(off + j); j += 1 }
      } else {
        while (j < n) { acc += arr.getDouble(j) * m(off + j); j += 1 }
      }
      // SQL `>=` orders NaN above every double → NaN dot sets the bit
      val bit = if (acc >= 0 || java.lang.Double.isNaN(acc)) 1L else 0L
      sig = sig * 2 + bit
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): RhpSigExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_rhp_sig"
}

object RhpSigExpr {
  /** Row-major plane matrix — MUST stay in lockstep with
    * `Similarity.hyperplanes` (the spec pins signature equality).
    */
  def planeMatrix(nPlanes: Int, dim: Int, seed: Long): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes * dim)(rnd.nextGaussian())
  }
}
