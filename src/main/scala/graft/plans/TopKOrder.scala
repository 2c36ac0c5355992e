package graft.plans

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType,
  LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** THE top-k total order — `ord` DESC (`Double.compare`: NaN above +Inf,
  * `-0.0` below `0.0`, exactly the window sort's descending order), then
  * payload ASC — defined ONCE and shared by [[TopKAgg]] (over Catalyst
  * internal values) and [[graft.streaming.TopKStream]] (over JVM values),
  * so the batch aggregate and its streaming twin cannot drift. The two
  * payload comparators are intentionally parallel: atomic natural order,
  * strings in binary (UTF-8 byte) collation, structs/Products field-wise
  * lexicographic with null fields first.
  */
object TopKOrder {

  /** `a` strictly before `b` under ord DESC, payload ASC. A
    * negate-and-sort formulation would flip the `-0.0`/`0.0` tie order —
    * this is the only definition either engine half may use.
    */
  def lessThan[P](payloadCompare: (P, P) => Int)
                 (a: (Double, P), b: (Double, P)): Boolean = {
    val c = java.lang.Double.compare(b._1, a._1)
    if (c != 0) c < 0 else payloadCompare(a._2, b._2) < 0
  }

  /** Payload types `graft_top_k` accepts, atomically or as struct fields. */
  def atomicOk(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | StringType => true
    case _ => false
  }

  private def atomicCompare(dt: DataType): (Any, Any) => Int = dt match {
    case LongType => (a, b) =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case IntegerType => (a, b) =>
      java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case DoubleType => (a, b) =>
      java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case StringType => (a, b) =>
      a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  /** Payload ASC over Catalyst internal values of `dt`: atomic natural
    * order (bytes for strings — the binary collation Spark sorts and
    * DuckDB compares with), or field-wise lexicographic for structs with
    * null-first per field.
    */
  def catalystCompare(dt: DataType): (Any, Any) => Int = dt match {
    case st: StructType =>
      val fields = st.fields
      val cmps = fields.map(f => atomicCompare(f.dataType))
      (a, b) => {
        val ra = a.asInstanceOf[InternalRow]
        val rb = b.asInstanceOf[InternalRow]
        var i = 0
        var c = 0
        while (i < cmps.length && c == 0) {
          val na = ra.isNullAt(i)
          val nb = rb.isNullAt(i)
          c =
            if (na && nb) 0
            else if (na) -1
            else if (nb) 1
            else cmps(i)(ra.get(i, fields(i).dataType),
              rb.get(i, fields(i).dataType))
          i += 1
        }
        c
      }
    case dt => atomicCompare(dt)
  }

  /** UTF-8 byte (= code point) order — `UTF8String.compareTo` parity.
    * NOT `String.compareTo`, which compares UTF-16 code units and orders
    * U+E000..U+FFFF ABOVE supplementary characters (whose surrogates sit
    * at 0xD800..0xDFFF).
    */
  private def compareStringBinary(a: String, b: String): Int = {
    val xa = a.getBytes(StandardCharsets.UTF_8)
    val xb = b.getBytes(StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(xa.length, xb.length)
    while (i < n) {
      val c = java.lang.Integer.compare(xa(i) & 0xff, xb(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(xa.length, xb.length)
  }

  /** Payload ASC over external JVM values, matching [[catalystCompare]]
    * exactly: numbers by value, strings by UTF-8 byte order, Products
    * (tuples / case classes) field-wise with null fields first. Used by
    * the streaming twin, whose state lives in Dataset encoders rather
    * than internal rows.
    */
  val jvmCompare: (Any, Any) => Int = (a, b) => (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: String, y: String) => compareStringBinary(x, y)
    case (x: Product, y: Product) =>
      require(x.productArity == y.productArity,
        s"payload arity mismatch: ${x.productArity} vs ${y.productArity}")
      var i = 0
      var c = 0
      while (i < x.productArity && c == 0) {
        val fa = x.productElement(i)
        val fb = y.productElement(i)
        c =
          if (fa == null && fb == null) 0
          else if (fa == null) -1
          else if (fb == null) 1
          else jvmCompare(fa, fb)
        i += 1
      }
      c
    case (x, y) => throw new IllegalArgumentException(
      s"unsupported payload comparison: ${x.getClass} vs ${y.getClass}")
  }
}
