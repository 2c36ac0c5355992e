package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Native frequency probe against a pre-built count-min sketch — the
  * lookup side Spark doesn't ship: `count_min_sketch(...)` aggregates a
  * corpus into a KB-sized binary, but no built-in function can ASK that
  * binary anything (`CountMinSketchAgg` has no estimate counterpart), so
  * the sketch is write-only from SQL. This expression closes the loop
  * (`graft.ext.Sketches.cmsEstimate`).
  *
  * Same carrier pattern as [[BloomContainsExpr]]: the serialized sketch
  * travels inside the expression OBJECT, deserialized once per task when
  * the lazy `cms` first evaluates — the resolved plan never holds the
  * binary as a literal, and generated code calls back through a
  * reference to this object (`doGenCode`), keeping the probe inside
  * whole-stage codegen.
  *
  * Input `string` probes hash UTF-8 bytes, matching how
  * `CountMinSketchAgg` adds string values (`UTF8String.getBytes`);
  * `long` probes match its long path — so estimates are the aggregate's
  * own counts, not a reimplementation's.
  */
final case class CmsEstimateExpr(child: Expression, cmsBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case StringType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_cms_estimate expects string or bigint, got ${other.sql}")
    }
  }

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(cmsBytes))

  /** Probe entry points for generated code: the sketch deserializes once
    * per executor regardless of how many generated stages call in.
    */
  def probeString(s: UTF8String): Long = cms.estimateCount(s.getBytes)
  def probeLong(l: Long): Long = cms.estimateCount(l)

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => probeString(s)
    case l: Long => probeLong(l)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCmsExpr", this,
      classOf[CmsEstimateExpr].getName)
    val probe = child.dataType match {
      case StringType => "probeString"
      case LongType => "probeLong"
    }
    defineCodeGen(ctx, ev, c => s"$ref.$probe($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CmsEstimateExpr = copy(child = newChild)

  // Content-based equality (the synthesized equals compares the byte
  // array by reference — see BloomContainsExpr for the CSE rationale)
  override def equals(o: Any): Boolean = o match {
    case that: CmsEstimateExpr =>
      child == that.child && java.util.Arrays.equals(cmsBytes, that.cmsBytes)
    case _ => false
  }
  @transient override lazy val hashCode: Int =
    java.util.Objects.hash(child, Int.box(java.util.Arrays.hashCode(cmsBytes)))

  override def prettyName: String = "graft_cms_estimate"
}
