package graft

import org.apache.spark.sql.functions._

/** Driver-contract invariants over the whole query catalog. */
class EntryContractSpec extends SparkSpec {

  test("every oracle refers to a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("query names are unique and well-formed") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size == names.size)
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")))
  }

  test("entry (flagship query) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx_count_distinct within declared rsd of exact") {
    val rows = SparkEntry.queries("q40_approx_distinct")(
        spark, "/root/testdata/sf0.001")
      .select("approx_orders", "exact_orders")
      .collect()
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx $approx vs exact $exact")
    }
  }
}
