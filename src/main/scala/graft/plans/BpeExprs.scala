package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding segmentation core (Sennrich et al. 2016 — public
  * paper; no code consulted). A word becomes its Unicode code points
  * plus a terminal `</w>` marker; the merge table is applied by
  * repeatedly fusing the LOWEST-RANK adjacent pair present (all its
  * occurrences, left to right) until no listed pair remains — the
  * standard greedy BPE apply, deterministic for a fixed table.
  *
  * Merge entries are `"left right"` strings (symbols never contain a
  * space: words arrive whitespace-tokenized, and fused symbols are
  * concatenations of non-space symbols).
  */
object BpeCore {

  def parseMerges(merges: Array[String]): Map[(String, String), Int] =
    merges.iterator.zipWithIndex.map { case (s, i) =>
      val sp = s.indexOf(' ')
      require(sp > 0 && sp < s.length - 1, s"malformed merge entry '$s'")
      ((s.substring(0, sp), s.substring(sp + 1)), i)
    }.toMap

  def baseSymbols(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length + 1)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out += "</w>"
    out.toArray
  }

  def segment(word: String, rank: Map[(String, String), Int]): Array[String] = {
    var syms = baseSymbols(word)
    var continue = rank.nonEmpty
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        // fuse every occurrence of the winning pair, left to right
        val (l, r) = rank.collectFirst {
          case (p, rk) if rk == bestRank => p }.get
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            out += l + r; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
      }
    }
    syms
  }

  /** Adjacent symbol pairs of the segmented word, as `"l r"` strings —
    * the unit the trainer counts (weighted by word frequency).
    */
  def pairs(word: String, rank: Map[(String, String), Int]): Array[String] = {
    val syms = segment(word, rank)
    if (syms.length < 2) Array.empty
    else Array.tabulate(syms.length - 1)(i => syms(i) + " " + syms(i + 1))
  }
}

/** `graft_bpe_segment(word, merges)` — BPE-segment one word into its
  * subword symbols under a literal merge table. The table is absorbed
  * into the expression OBJECT (IvfAssignExpr pattern): the resolved plan
  * carries no per-row array literal, and the rank map builds once per
  * task. CodegenFallback: per-row cost is the merge loop itself, not
  * eval dispatch (the signature-expression rationale).
  */
final case class BpeSegmentExpr(child: Expression, merges: Array[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bpe_segment expects string, got ${other.sql}")
    }

  @transient private lazy val rank = BpeCore.parseMerges(merges)

  override def nullSafeEval(input: Any): Any = {
    val syms = BpeCore.segment(input.asInstanceOf[UTF8String].toString, rank)
    new GenericArrayData(syms.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeSegmentExpr = copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case that: BpeSegmentExpr =>
      child == that.child &&
        java.util.Arrays.equals(merges.asInstanceOf[Array[AnyRef]],
          that.merges.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  @transient override lazy val hashCode: Int =
    java.util.Objects.hash(child,
      Int.box(java.util.Arrays.hashCode(merges.asInstanceOf[Array[AnyRef]])))

  override def prettyName: String = "graft_bpe_segment"
}

/** `graft_bpe_pairs(word, merges)` — the trainer's counting unit:
  * adjacent symbol pairs (`"l r"`) of the word under the current merge
  * table. Same carrier/equality contract as [[BpeSegmentExpr]].
  */
final case class BpePairsExpr(child: Expression, merges: Array[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bpe_pairs expects string, got ${other.sql}")
    }

  @transient private lazy val rank = BpeCore.parseMerges(merges)

  override def nullSafeEval(input: Any): Any = {
    val ps = BpeCore.pairs(input.asInstanceOf[UTF8String].toString, rank)
    new GenericArrayData(ps.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpePairsExpr = copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case that: BpePairsExpr =>
      child == that.child &&
        java.util.Arrays.equals(merges.asInstanceOf[Array[AnyRef]],
          that.merges.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  @transient override lazy val hashCode: Int =
    java.util.Objects.hash(child,
      Int.box(java.util.Arrays.hashCode(merges.asInstanceOf[Array[AnyRef]])))

  override def prettyName: String = "graft_bpe_pairs"
}
