package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a pre-built Bloom filter — the filter
  * side of the distributed "broadcast the sketch" semi-join used for
  * benchmark decontamination at scale (`graft.ext.Dedup
  * .contaminationHitsBloom`).
  *
  * The serialized filter travels inside the expression OBJECT (same
  * pattern as [[IvfAssignExpr]]'s centroid matrix): it is deserialized
  * ONCE per task when the lazy `bf` first evaluates, never per row, and
  * the resolved plan tree carries no multi-megabyte binary literal. This
  * mirrors what Spark's own runtime bloom filters do (aggregate the
  * sketch distributed, ship only the final bitset to the probe side) —
  * but as a user-level operator: Spark's `BloomFilterMightContain`
  * rejects anything that is not a literal or scalar subquery, which makes
  * it unusable against a sketch built through the public
  * `DataFrameStatFunctions.bloomFilter` API.
  *
  * Accepts `string` (hashes UTF-8 bytes — matches `BloomFilter.put` on
  * strings) or `long` input. Implements `doGenCode` (probe-method call
  * through a reference to this expression object): the probe runs once
  * per corpus SHINGLE in the scan pipeline — a fallback here would split
  * the scan's whole-stage-codegen exactly where row volume peaks.
  */
final case class BloomContainsExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case StringType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bloom_contains expects string or bigint, got ${other.sql}")
    }
  }

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Probe entry points for generated code: the filter deserializes once
    * per executor (lazy, off the bytes this expression object carries)
    * regardless of how many generated stages call in.
    */
  def probeString(s: UTF8String): Boolean = bf.mightContainBinary(s.getBytes)
  def probeLong(l: Long): Boolean = bf.mightContainLong(l)

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => probeString(s)
    case l: Long => probeLong(l)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // reference THIS expression (a serializable case class), not the
    // deserialized filter: executors get the bytes and build the filter
    // lazily exactly as the interpreted path does
    val ref = ctx.addReferenceObj("graftBloomExpr", this,
      classOf[BloomContainsExpr].getName)
    val probe = child.dataType match {
      case StringType => "probeString"
      case LongType => "probeLong"
    }
    defineCodeGen(ctx, ev, c => s"$ref.$probe($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomContainsExpr = copy(child = newChild)

  // Content-based equality: the synthesized case-class equals compares the
  // byte array by REFERENCE, so two probes against the same serialized
  // filter would never be recognized as the same expression (no CSE, no
  // plan-cache hit). Hash is cached — the bytes are an immutable literal.
  override def equals(o: Any): Boolean = o match {
    case that: BloomContainsExpr =>
      child == that.child &&
        java.util.Arrays.equals(bloomBytes, that.bloomBytes)
    case _ => false
  }
  @transient override lazy val hashCode: Int =
    java.util.Objects.hash(child, Int.box(java.util.Arrays.hashCode(bloomBytes)))

  override def prettyName: String = "graft_bloom_contains"
}
