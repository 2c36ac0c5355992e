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
    // q40 exposes the bound as a column (oracle-checkable); assert it
    // holds on every group and that the exact side is a real count
    val rows = SparkEntry.queries("q40_approx_distinct")(
        spark, "/root/testdata/sf0.001")
      .select("exact_orders", "approx_within_5pct")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) > 0)
      assert(r.getBoolean(1), s"approx error bound violated: $r")
    }
  }
}
