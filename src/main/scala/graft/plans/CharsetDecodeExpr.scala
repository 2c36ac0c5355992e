package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Decode a BYTE-VIEW string per a declared HTTP charset — the
  * missing decode step between the WARC gzip seam and the text tier.
  *
  * Input contract: `str` is a byte-view — each char is one payload
  * byte, the representation `WarcIngest.parseWarcRecordsGz(byteView =
  * true)` produces by decoding archives as ISO-8859-1 (a 1:1
  * byte→char map). `charset` is the HTTP-declared name
  * (`http_charset` from `WarcIngest.withHttpResponse`), matched
  * case-insensitively after trimming:
  *
  *   - `utf-8`/`utf8` and EMPTY (undeclared — the web's default
  *     assumption, and what the text tier has always done): UTF-8
  *     decode; malformed sequences become U+FFFD (the JDK String
  *     constructor's standard REPLACE action — damage surfaces as the
  *     replacement char, never as an exception);
  *   - `iso-8859-1`/`latin-1`/`latin1`: identity on the byte view
  *     (that IS the Latin-1 decode);
  *   - `windows-1252`/`cp1252`: the JDK windows-1252 decode — the
  *     0x80–0x9F window maps per the cp1252 table (€ from 0x80, ’
  *     from 0x92, …), everything else as Latin-1;
  *   - anything else: UTF-8 (the documented fallback — an exotic
  *     declaration degrades to today's behavior, it never crashes).
  *
  * Byte-view chars above U+00FF are out of contract; they re-encode
  * through the JDK ISO-8859-1 encoder (unmappable → `?`), surfacing
  * the misuse instead of throwing. One zero-shuffle projection;
  * `doGenCode` is a reference-object method call (the
  * [[UnicodeNormExpr]] pattern) so the decode stays inside
  * whole-stage codegen.
  */
final case class CharsetDecodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_charset_decode expects (string, string), got " +
          s"(${l.sql}, ${r.sql})")
    }

  /** Decode entry point for generated code. */
  def decode(s: UTF8String, cs: UTF8String): UTF8String =
    CharsetDecodeExpr.decode(s, cs)

  override def nullSafeEval(s: Any, cs: Any): Any =
    CharsetDecodeExpr.decode(s.asInstanceOf[UTF8String],
      cs.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCharsetDecode", this,
      classOf[CharsetDecodeExpr].getName)
    defineCodeGen(ctx, ev, (s, c) => s"$ref.decode($s, $c)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharsetDecodeExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_charset_decode"
}

object CharsetDecodeExpr {
  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")

  def decode(s: UTF8String, cs: UTF8String): UTF8String = {
    val name = cs.toString.trim.toLowerCase(java.util.Locale.ROOT)
    val view = s.toString
    name match {
      case "iso-8859-1" | "latin-1" | "latin1" => s
      case "windows-1252" | "cp1252" =>
        UTF8String.fromString(new String(view.getBytes(Latin1), Cp1252))
      case _ => // "", "utf-8", "utf8", and the documented fallback
        UTF8String.fromString(new String(view.getBytes(Latin1), Utf8))
    }
  }
}
