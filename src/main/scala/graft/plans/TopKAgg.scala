package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k-per-group as a native partial-combinable aggregate:
  * `graft_top_k(ord, payload, k)` → `array<struct<ord: double, payload>>`
  * of the `k` largest `ord` values per group, sorted `ord` DESC with
  * ascending-`payload` tie-break (deterministic output — ties cannot
  * reorder between runs or engines).
  *
  * Why this beats the window formulation at 100 TB: `row_number() OVER
  * (PARTITION BY g ORDER BY ord DESC) <= k` must SHUFFLE AND SORT every
  * input row — the full per-group data crosses the wire so one task can
  * rank it. This aggregate keeps O(k) state per group, combines map-side
  * partials (each partition contributes at most k candidates per group),
  * and never sorts anything larger than its 2k-element buffer. The
  * shuffle carries ≤ k rows per (partition, group) instead of all of
  * them — the same partial-combine argument as [[MisraGriesAgg]], for
  * rankings instead of frequencies.
  *
  * `payload` may be bigint, int, double, or string (the id/label being
  * ranked), or a STRUCT of those — `struct(id, name, region)` rides the
  * ranking whole, so no join-back is needed to recover the winning rows'
  * columns. Struct tie-breaks are field-wise lexicographic (null field
  * first), matching a multi-column `ORDER BY` over the same fields. Null
  * `ord` or null `payload` rows are skipped, matching the `QUALIFY
  * row_number()` formulation where NULL ordering keys sort last and
  * never make a top-k that real values fill.
  */
case class TopKAgg(
    ord: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(ord, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("payload", payload.dataType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_top_k"


  override def checkInputDataTypes(): TypeCheckResult = {
    if (ord.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_top_k ord must be double, got ${ord.dataType.sql}")
    else payload.dataType match {
      case dt if TopKOrder.atomicOk(dt) => TypeCheckResult.TypeCheckSuccess
      case st: StructType if st.fields.nonEmpty &&
          st.fields.forall(f => TopKOrder.atomicOk(f.dataType)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "graft_top_k payload must be bigint/int/double/string or a struct " +
          s"of those, got ${other.sql}")
    }
  }

  // the shared total order ([[TopKOrder]]): ord DESC, then payload ASC —
  // one definition for this aggregate and the TopKStream streaming twin
  @transient private lazy val payloadCompare: (Any, Any) => Int =
    TopKOrder.catalystCompare(payload.dataType)
  private def lessThan(a: (Double, Any), b: (Double, Any)): Boolean =
    TopKOrder.lessThan(payloadCompare)(a, b)

  /** Prune to k and remember the kth-best ord: once a group has k
    * entries, any row with ord STRICTLY below the kth can never enter
    * (ties can — the payload tie-break might prefer them), so the per-row
    * hot path becomes one comparison for the overwhelming majority of
    * rows in large groups.
    */
  private def prune(buf: TopKAgg.Buf): TopKAgg.Buf = {
    if (buf.rows.length > k) {
      val kept = buf.rows.sortWith(lessThan).take(k)
      buf.rows.clear()
      buf.rows ++= kept
    }
    if (buf.rows.length == k) {
      buf.threshold = buf.rows.map(_._1).min
      buf.hasThreshold = true
    }
    buf
  }

  override def createAggregationBuffer(): TopKAgg.Buf = new TopKAgg.Buf

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val o = ord.eval(input)
    if (o != null) {
      val ordV = o.asInstanceOf[Double]
      // threshold fast path BEFORE evaluating the payload. Compared with
      // Double.compare, not `>=`: the kth-best can legitimately be NaN
      // (Double.compare sorts NaN above every value, same as the window's
      // descending order), and `NaN >= NaN` would skip tied rows whose
      // payload tie-break should have let them in.
      if (!buf.hasThreshold ||
          java.lang.Double.compare(ordV, buf.threshold) >= 0) {
        val p = payload.eval(input)
        if (p != null) {
          // DEFENSIVE COPY: a UTF8String (or struct row) from eval can be
          // a view over the input row's reused buffer — storing the view
          // across rows would silently corrupt kept payloads
          val safe: Any = p match {
            case u: UTF8String => u.clone()
            case r: InternalRow => r.copy()
            case other => other
          }
          buf.rows += ((ordV, safe))
          // amortized pruning: sort only when the buffer doubles past k
          if (buf.rows.length >= 2 * k) prune(buf)
        }
      }
    }
    buf
  }

  override def merge(buf: TopKAgg.Buf, other: TopKAgg.Buf): TopKAgg.Buf = {
    buf.rows ++= other.rows
    prune(buf)
  }

  override def eval(buf: TopKAgg.Buf): Any = {
    val sorted = buf.rows.sortWith(lessThan).take(k)
    new GenericArrayData(sorted.map { case (o, p) =>
      new GenericInternalRow(Array[Any](o, p))
    }.toArray[Any])
  }

  override def serialize(buf: TopKAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    // serialize only the pruned top-k: partials never ship more than k
    val kept = buf.rows.sortWith(lessThan).take(k)
    out.writeInt(kept.length)
    kept.foreach { case (o, p) =>
      out.writeDouble(o)
      writePayload(out, p)
    }
    out.flush()
    bos.toByteArray
  }

  private def writeAtomic(out: DataOutputStream, dt: DataType, v: Any): Unit =
    dt match {
      case LongType => out.writeLong(v.asInstanceOf[Long])
      case IntegerType => out.writeInt(v.asInstanceOf[Int])
      case DoubleType => out.writeDouble(v.asInstanceOf[Double])
      case StringType =>
        val b = v.asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length)
        out.write(b)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

  private def readAtomic(in: DataInputStream, dt: DataType): Any = dt match {
    case LongType => in.readLong()
    case IntegerType => in.readInt()
    case DoubleType => in.readDouble()
    case StringType =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      UTF8String.fromBytes(b)
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  private def writePayload(out: DataOutputStream, p: Any): Unit =
    payload.dataType match {
      case st: StructType =>
        val r = p.asInstanceOf[InternalRow]
        var i = 0
        while (i < st.fields.length) {
          val isNull = r.isNullAt(i)
          out.writeBoolean(isNull)
          if (!isNull)
            writeAtomic(out, st.fields(i).dataType,
              r.get(i, st.fields(i).dataType))
          i += 1
        }
      case dt => writeAtomic(out, dt, p)
    }

  private def readPayload(in: DataInputStream): Any = payload.dataType match {
    case st: StructType =>
      val vals = new Array[Any](st.fields.length)
      var i = 0
      while (i < st.fields.length) {
        vals(i) =
          if (in.readBoolean()) null
          else readAtomic(in, st.fields(i).dataType)
        i += 1
      }
      new GenericInternalRow(vals)
    case dt => readAtomic(in, dt)
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKAgg.Buf
    var i = 0
    while (i < n) {
      val o = in.readDouble()
      buf.rows += ((o, readPayload(in)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(ord = newChildren(0), payload = newChildren(1))
}

object TopKAgg {
  /** Aggregation buffer: kept rows + the kth-best ord once known, which
    * gates the per-row append (the fast path for large groups).
    */
  final class Buf {
    val rows: mutable.ArrayBuffer[(Double, Any)] = mutable.ArrayBuffer.empty
    var threshold: Double = Double.NegativeInfinity
    var hasThreshold: Boolean = false
  }
}
