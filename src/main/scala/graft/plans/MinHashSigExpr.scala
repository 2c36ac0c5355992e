package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression computing a k-permutation MinHash signature
  * over an `array<string>` of shingles — the JVM-loop equivalent of
  * `graft.ext.Dedup.minhashSignature` (same xxhash64 seed, same affine
  * permutation constants mod 2^31−1, bit-identical output; the spec
  * asserts equality).
  *
  * Why an expression instead of built-ins: the HOF formulation evaluates
  * k×|shingles| interpreted lambda frames per row. This tier-(b) custom
  * scalar expression (SURVEY.md §7.3) does one tight loop per row —
  * shingle bytes hashed once, k affine updates in a local long[] — with
  * zero per-element expression dispatch. CodegenFallback is deliberate:
  * the eval loop IS the fast path; generated code would add nothing.
  */
final case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string>, got ${other.sql}")
    }
  }

  // identical constants to Dedup.minhashSignature: p = 2^31-1, coeffs from
  // Random(0x5eed), xxhash64 seed 42 (Spark's default for the xxhash64 fn)
  private val P = MinHashSigExpr.P
  private lazy val (as, bs) = MinHashSigExpr.coefficients(k)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(P)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h0 = XxHash64Function.hash(s, StringType, 42L)
      val h = ((h0 % P) + P) % P // pmod
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

object MinHashSigExpr {
  val P: Long = 2147483647L // 2^31 - 1 (Mersenne prime)

  /** Affine permutation constants — MUST stay in lockstep with
    * `Dedup.minhashSignature` (the spec pins equality).
    */
  def coefficients(k: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(0x5eed)
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var i = 0
    while (i < k) {
      as(i) = 1 + rnd.nextLong(P - 1)
      bs(i) = rnd.nextLong(P)
      i += 1
    }
    (as, bs)
  }
}
