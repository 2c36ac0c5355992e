package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Cross-engine-PORTABLE k-permutation MinHash signature: the
  * [[MinHashSigExpr]] recipe with both engine-specific ingredients
  * replaced by md5-derived values any engine can reproduce —
  *
  *   - shingle base hash: big-endian value of md5 hex digits 1-8
  *     (32 bits), reduced mod p = 2^31−1, instead of xxhash64;
  *   - affine coefficients: `a_i = 1 + md5_32("graft:mh:a:" + i) mod
  *     (p−1)`, `b_i = md5_32("graft:mh:b:" + i) mod p`, instead of a JVM
  *     `Random` stream (whose algorithm no other engine implements).
  *
  * Every operand stays below 2^31, so `a·h + b` peaks under 2^62 — safe
  * signed-64 arithmetic on every engine (no unsigned/overflow semantics
  * in play). Bit-identical to `Dedup.minhashSignaturePortable`'s HOF
  * fold (spec-pinned) and to the q26 DuckDB oracle's SQL formulation.
  */
final case class MinHashMd5SigExpr(child: Expression, k: Int)
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
          s"graft_minhash_md5(shingles) expects array<string>, got ${other.sql}")
    }
  }

  private val P = MinHashMd5SigExpr.P
  @transient private lazy val (as, bs) = MinHashMd5SigExpr.coefficients(k)

  override def nullSafeEval(input: Any): Any = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(P)
    var i = 0
    while (i < n) {
      // null shingle: no-op, matching the HOF fold where least(m, null)
      // keeps m (shingle arrays from wordShingles never carry nulls)
      if (!arr.isNullAt(i)) {
        val h = MinHashMd5SigExpr.md5Head32(md,
          arr.getUTF8String(i).getBytes) % P
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashMd5SigExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_md5"
}

object MinHashMd5SigExpr {
  val P: Long = 2147483647L // 2^31 - 1 (Mersenne prime)

  /** Big-endian value of an md5 digest's first 4 bytes (= hex digits
    * 1-8) — the `('0x' || substr(md5(x), 1, 8))::BIGINT` every SQL
    * engine can compute.
    */
  private[plans] def md5Head32(md: java.security.MessageDigest,
                               bytes: Array[Byte]): Long = {
    val d = md.digest(bytes)
    md.reset()
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  /** The portable affine constants — a closed md5 formula instead of a
    * PRNG stream, so any engine derives the identical coefficients.
    * MUST stay in lockstep with `Dedup.minhashSignaturePortable` and
    * the q26 oracle SQL.
    */
  def coefficients(k: Int): (Array[Long], Array[Long]) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var i = 0
    while (i < k) {
      as(i) = 1 + md5Head32(md, s"graft:mh:a:$i".getBytes("UTF-8")) % (P - 1)
      bs(i) = md5Head32(md, s"graft:mh:b:$i".getBytes("UTF-8")) % P
      i += 1
    }
    (as, bs)
  }
}
