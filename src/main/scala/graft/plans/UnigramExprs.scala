package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) Viterbi segmentation — the subword
  * tokenizer family's second member next to BPE (Kudo 2018, public
  * algorithm; original implementation here). A word segments into the
  * vocabulary pieces minimizing total integer micro-nat cost; ties
  * break to the SMALLEST start position at every backtrack step
  * (equivalently: the longest final piece), a total order both the
  * trainer's hard-EM counts and the q147/q148 DuckDB oracles replay
  * exactly — every comparison is on exact longs, so the chosen
  * segmentation is cross-engine-stable by construction.
  */
object UnigramCore {

  private val Big = Long.MaxValue / 4

  /** entries are "cost<space>piece" (cost first — pieces are
    * whitespace-free by construction, but a prefix split is immune
    * either way). */
  def parseEntries(entries: Array[String]): Map[String, Long] =
    entries.iterator.map { s =>
      val sp = s.indexOf(' ')
      require(sp > 0 && sp < s.length - 1, s"malformed vocab entry '$s'")
      (s.substring(sp + 1), s.substring(0, sp).toLong)
    }.toMap

  /** Viterbi: best[i] = min over piece lengths L (1..maxLen, piece in
    * vocab) of best[i-L] + cost(piece); argmin ties keep the smallest
    * start j. Requires every character of `word` to be a single-char
    * vocab member (the trainer guarantees a closed alphabet).
    */
  def segment(word: String, cost: Map[String, Long],
              maxLen: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = Array.fill(n + 1)(Big)
    val bp = new Array[Int](n + 1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var bestT = Big
      var bestJ = -1
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (best(j) < Big) {
          cost.get(word.substring(j, i)) match {
            case Some(c) =>
              val t = best(j) + c
              if (t < bestT) { bestT = t; bestJ = j } // first j wins ties
            case None =>
          }
        }
        j += 1
      }
      best(i) = bestT
      bp(i) = bestJ
      i += 1
    }
    require(best(n) < Big,
      s"word '$word' not segmentable under the vocabulary " +
        "(missing single-char coverage)")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) {
      val j = bp(p)
      out += word.substring(j, p)
      p = j
    }
    out.reverse.toArray
  }
}

/** `graft_unigram_segment(word, vocab, maxLen)` — vocab is an
  * array<string> LITERAL of "cost piece" entries, absorbed into the
  * expression object at analysis (the BpeSegmentExpr carrier pattern:
  * no per-row literal tree in the resolved plan, the cost map builds
  * once per task). CodegenFallback: per-row cost is the Viterbi loop
  * itself, not eval dispatch.
  */
final case class UnigramSegmentExpr(child: Expression,
                                    entries: Array[String], maxLen: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_unigram_segment expects string, got ${other.sql}")
    }

  @transient private lazy val cost = UnigramCore.parseEntries(entries)

  override def nullSafeEval(input: Any): Any = {
    val pieces = UnigramCore.segment(
      input.asInstanceOf[UTF8String].toString, cost, maxLen)
    new GenericArrayData(
      pieces.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramSegmentExpr = copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case that: UnigramSegmentExpr =>
      child == that.child && maxLen == that.maxLen &&
        java.util.Arrays.equals(entries.asInstanceOf[Array[AnyRef]],
          that.entries.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  @transient override lazy val hashCode: Int =
    java.util.Objects.hash(child, Int.box(maxLen),
      Int.box(java.util.Arrays.hashCode(entries.asInstanceOf[Array[AnyRef]])))

  override def prettyName: String = "graft_unigram_segment"
}
