package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode normalization (UAX #15) for text pipelines: NFC/NFD/
  * NFKC/NFKD via the JDK's `java.text.Normalizer`. Spark ships no
  * normalization builtin, yet corpus hygiene starts here — the same
  * visible text can arrive composed (U+00E9) or decomposed
  * (U+0065 U+0301) and every byte-keyed operator downstream (exact
  * dedup's md5 keys, line dedup, decontamination shingles, fingerprints)
  * would treat the two as distinct documents. Normal-form-first is the
  * public-pipeline convention (e.g. CCNet, Wenzek et al. 2020, fixes a
  * normal form before any hashing).
  *
  * Implements `doGenCode` (method call through a reference to this
  * expression object, the [[BloomContainsExpr]] pattern): normalization
  * runs once per document inside the scan's whole-stage-codegen — a
  * fallback would split the stage exactly where row volume peaks. The
  * hot path is the `Normalizer.isNormalized` guard: real-world text is
  * overwhelmingly already NFC, and the guard skips the rebuild + UTF-8
  * re-encode entirely, returning the input buffer untouched.
  *
  * The DuckDB oracle twin is `nfc_normalize` (NFC only — the oracle
  * checks the NFC path; the other forms are spec-pinned against JDK
  * ground truth).
  */
final case class UnicodeNormExpr(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!UnicodeNormExpr.forms.contains(form))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_unicode_norm: unknown form '$form' " +
          s"(expected one of ${UnicodeNormExpr.forms.keys.toSeq.sorted.mkString(", ")})")
    else child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_unicode_norm expects string, got ${other.sql}")
    }
  }

  @transient private lazy val javaForm: Normalizer.Form =
    UnicodeNormExpr.forms(form)

  /** Normalization entry point for generated code; resolves the form once
    * per expression object, not per row.
    */
  def norm(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, javaForm)) s
    else UTF8String.fromString(Normalizer.normalize(str, javaForm))
  }

  override def nullSafeEval(input: Any): Any =
    norm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftUnicodeNorm", this,
      classOf[UnicodeNormExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.norm($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormExpr = copy(child = newChild)

  override def prettyName: String = "graft_unicode_norm"
}

object UnicodeNormExpr {
  val forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC,
    "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC,
    "NFKD" -> Normalizer.Form.NFKD)
}
