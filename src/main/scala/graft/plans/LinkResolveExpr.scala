package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass outlink classification + RFC 3986 resolution +
  * canonicalization — the hot-path twin of
  * `UrlOps.extractOutlinks`'s column chain.
  *
  * The chain runs ~8 regex executions per harvested href to classify
  * it (fragment / non-http scheme / dot-segment / protocol-relative /
  * root-relative / path-relative), 3 more to derive the RFC 3986
  * §5.2.3 merge directory from the as-fetched base, and then the
  * ~12-regex canonicalization chain on the resolved link — and
  * Catalyst's project collapse inlines the `link_kind` whens into the
  * `link_url` whens, re-paying the classification regexes (the q153
  * round-12 regression: the §5.2.3 merge fix re-introduced per-link
  * regex work the `UrlCanonExpr` swap had eliminated). This
  * expression walks the href once with index arithmetic, resolves it
  * against the base pieces, and hands the resolved string to the SAME
  * [[UrlCanonExpr.canonRow]] walk — one call yields
  * `struct<kind, url, canon, host>`. At 10¹¹ crawl links the resolve
  * leg is the tier BASELINE.md prices in hundreds of CPU-hours.
  *
  * Semantics are BIT-IDENTICAL to the column chain by construction —
  * each rule transcribed and property-pinned in `UrlOpsSpec` over
  * generated (href, base) combinations plus every planted shape:
  *
  *   - kind classification in the chain's exact `when` order: empty
  *     or `#...` → `dropped_fragment`; a `scheme:` href (ASCII
  *     letter + `[A-Za-z0-9+.-]*` + `:`) → `absolute` when
  *     `https?://` (case-insensitive) and its PATH (authority and
  *     query excluded) carries no dot segment, `dropped_dotseg` when
  *     it does, `dropped_scheme` otherwise; a relative href with a
  *     dot segment ANYWHERE (the chain tests the whole href —
  *     transcribed, not "improved") → `dropped_dotseg`; then
  *     `protocol_relative` (`//...`), `root_relative` (`/...`),
  *     `path_relative` (the rest);
  *   - the dot-segment scan reproduces `(^|/)\.\.?(/|$)` exactly: a
  *     `.` or `..` run bounded by start-or-slash and slash-or-end;
  *   - scheme/authority come from the CANONICAL base (lowercase ASCII
  *     scheme class, authority to the first `/` or `?` — the chain's
  *     `[^/?]*`), the §5.2.3 merge directory from the AS-FETCHED base
  *     (mixed-case scheme class, authority to the first `/?#`, path
  *     to the first `?#`, cut after the last `/`, empty → `/`);
  *   - the resolved link canonicalizes through
  *     [[UrlCanonExpr.canonRow]] — the property-pinned walk the
  *     catalog already trusts.
  *
  * Inputs follow `extractOutlinks`' contract: non-null, single-line
  * strings (hrefs come from `regexp_extract_all`, bases from
  * `withCanonicalUrl`). Implements `doGenCode` (reference-object
  * method call, the [[UnicodeNormExpr]] pattern) so the whole
  * harvest→resolve→canonicalize pipeline stays inside the scan's
  * whole-stage codegen.
  */
final case class LinkResolveExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = LinkResolveExpr.schema
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_link_resolve expects (string, string, string), got " +
          s"(${a.sql}, ${b.sql}, ${c.sql})")
    }

  /** Resolution entry point for generated code. */
  def resolve(href: UTF8String, baseCanon: UTF8String,
      baseRaw: UTF8String): InternalRow =
    LinkResolveExpr.resolveRow(href, baseCanon, baseRaw)

  override def nullSafeEval(h: Any, bc: Any, br: Any): Any =
    LinkResolveExpr.resolveRow(h.asInstanceOf[UTF8String],
      bc.asInstanceOf[UTF8String], br.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftLinkResolve", this,
      classOf[LinkResolveExpr].getName)
    defineCodeGen(ctx, ev, (h, bc, br) => s"$ref.resolve($h, $bc, $br)")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): LinkResolveExpr =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_link_resolve"
}

object LinkResolveExpr {
  val schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("url", StringType, nullable = true),
    StructField("canon", StringType, nullable = true),
    StructField("host", StringType, nullable = true)))

  private val Kinds = Array("dropped_fragment", "dropped_scheme",
    "dropped_dotseg", "absolute", "protocol_relative", "root_relative",
    "path_relative").map(UTF8String.fromString)
  private val KFragment = 0; private val KScheme = 1; private val KDotSeg = 2
  private val KAbsolute = 3; private val KProtoRel = 4; private val KRootRel = 5
  private val KPathRel = 6

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  private def isSchemeChar(c: Char): Boolean =
    isAsciiLetter(c) || (c >= '0' && c <= '9') ||
      c == '+' || c == '.' || c == '-'

  /** End index of a `scheme:` prefix (the `:` position), or −1.
    * Equivalent to `^[A-Za-z][A-Za-z0-9+.-]*:` — `:` is outside the
    * class, so maximal munch IS the regex match. */
  private def schemeColon(s: String): Int = {
    if (s.isEmpty || !isAsciiLetter(s.charAt(0))) return -1
    var i = 1
    while (i < s.length && isSchemeChar(s.charAt(i))) i += 1
    if (i < s.length && s.charAt(i) == ':') i else -1
  }

  /** `(^|/)\.\.?(/|$)` transcribed: a 1–2 dot run bounded by
    * start-or-slash and slash-or-end. */
  private def hasDotSeg(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '.' && (i == 0 || s.charAt(i - 1) == '/')) {
        var j = i + 1
        if (j < s.length && s.charAt(j) == '.') j += 1
        if (j == s.length || s.charAt(j) == '/') return true
      }
      i += 1
    }
    false
  }

  /** The PATH of an absolute `https?://` href: skip `scheme://` and
    * the authority (to the first `/?#`), take to the first `?#` —
    * the chain's regexp_replace + regexp_extract pair. `colon` is the
    * scheme's `:` index (the `//` after it is caller-checked). */
  private def absPath(h: String, colon: Int): String = {
    var a = colon + 3
    while (a < h.length && h.charAt(a) != '/' && h.charAt(a) != '?' &&
      h.charAt(a) != '#') a += 1
    var p = a
    while (p < h.length && h.charAt(p) != '?' && h.charAt(p) != '#') p += 1
    h.substring(a, p)
  }

  /** The §5.2.3 merge directory of the AS-FETCHED base: strip a
    * mixed-case `scheme://authority` prefix when present (authority
    * to the first `/?#`), take the path to the first `?#`, cut after
    * the last `/`; empty → `/`. */
  private def mergeDir(raw: String): String = {
    val colon = schemeColon(raw)
    var start = 0
    if (colon >= 0 && raw.regionMatches(colon, "://", 0, 3)) {
      start = colon + 3
      while (start < raw.length && raw.charAt(start) != '/' &&
        raw.charAt(start) != '?' && raw.charAt(start) != '#') start += 1
    }
    var end = start
    while (end < raw.length && raw.charAt(end) != '?' &&
      raw.charAt(end) != '#') end += 1
    var lastSlash = -1
    var i = start
    while (i < end) { if (raw.charAt(i) == '/') lastSlash = i; i += 1 }
    if (lastSlash < 0) "/" else raw.substring(start, lastSlash + 1)
  }

  /** scheme and authority of the CANONICAL base — lowercase scheme
    * class, authority to the first `/` or `?` (the chain's `[^/?]*`);
    * ("", "") when the base carries no `scheme://`. */
  private def basePieces(base: String): (String, String) = {
    if (base.isEmpty) return ("", "")
    val c0 = base.charAt(0)
    if (!(c0 >= 'a' && c0 <= 'z')) return ("", "")
    var i = 1
    while (i < base.length && {
      val c = base.charAt(i)
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
        c == '+' || c == '.' || c == '-'
    }) i += 1
    if (!base.regionMatches(i, "://", 0, 3)) return ("", "")
    var a = i + 3
    while (a < base.length && base.charAt(a) != '/' &&
      base.charAt(a) != '?') a += 1
    (base.substring(0, i), base.substring(i + 3, a))
  }

  /** Entry point shared by eval and generated code. */
  def resolveRow(href: UTF8String, baseCanon: UTF8String,
      baseRaw: UTF8String): InternalRow = {
    val h = href.toString
    var kind = KPathRel
    var colon = -1
    if (h.isEmpty || h.charAt(0) == '#') kind = KFragment
    else {
      colon = schemeColon(h)
      if (colon >= 0) {
        val isHttp = (colon == 4 &&
          h.regionMatches(true, 0, "http", 0, 4) &&
          h.regionMatches(4, "://", 0, 3)) ||
          (colon == 5 && h.regionMatches(true, 0, "https", 0, 5) &&
            h.regionMatches(5, "://", 0, 3))
        kind =
          if (!isHttp) KScheme
          else if (hasDotSeg(absPath(h, colon))) KDotSeg
          else KAbsolute
      } else if (hasDotSeg(h)) kind = KDotSeg
      else if (h.startsWith("//")) kind = KProtoRel
      else if (h.charAt(0) == '/') kind = KRootRel
    }
    val resolved: String = kind match {
      case KAbsolute => h
      case KProtoRel | KRootRel | KPathRel =>
        val (scheme, auth) = basePieces(baseCanon.toString)
        if (kind == KProtoRel) scheme + ":" + h
        else if (kind == KRootRel) scheme + "://" + auth + h
        else scheme + "://" + auth + mergeDir(baseRaw.toString) + h
      case _ => null
    }
    if (resolved == null)
      new GenericInternalRow(Array[Any](Kinds(kind), null, null, null))
    else {
      val c = UrlCanonExpr.canonRow(UTF8String.fromString(resolved))
      new GenericInternalRow(Array[Any](Kinds(kind),
        UTF8String.fromString(resolved), c.getUTF8String(0),
        c.getUTF8String(1)))
    }
  }
}
