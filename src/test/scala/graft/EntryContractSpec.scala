package graft

import org.apache.spark.sql.functions._

/** Driver-contract invariants over the whole query catalog. */
class EntryContractSpec extends SparkSpec {

  test("every oracle refers to a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("every query is oracle-checked or on the declared rows-only list") {
    // the rows-only set is a deliberate, enumerated exception (training/
    // RNG-dependent ANN and cluster operators, each recall- or
    // parity-bounded by spec) — a NEW query landing here unnoticed would
    // silently skip the correctness gate
    // EMPTY since round 10: every catalog query is oracle-checked.
    // q119's BPE trainer joined in round 9 (materialized argmax CTEs);
    // round 10 retired the final six — q75/q43/q56 via
    // md5-derandomized k-means++ seeding, q31/q38 via the derandomized
    // multi-table ±1-plane OR-construction, and q79 via md5-Forgy +
    // relational L2-Lloyd subspace codebooks over the same seeded
    // coarse quantizer. A query landing here means its oracle is
    // missing — add one or consciously extend this set.
    val declaredRowsOnly = Set.empty[String]
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked == declaredRowsOnly,
      s"rows-only drift: unexpected=${unchecked -- declaredRowsOnly} " +
        s"newly-oracled=${declaredRowsOnly -- unchecked}")
  }

  test("query names are unique and well-formed") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size == names.size)
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")))
  }

  test("entry (flagship query) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle orders its result deterministically") {
    // the gate sorts rows before hashing, but ORDER BY keeps the dumped
    // parquet reproducible and review-friendly; a missing one is almost
    // always an authoring mistake
    val unordered = SparkEntry.oracleSql.collect {
      case (name, sql) if !sql.toUpperCase.contains("ORDER BY") => name
    }
    assert(unordered.isEmpty, s"oracles without ORDER BY: $unordered")
  }

  test("every oracle mentions only tables the test data provides") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings",
      // DuckDB table functions legitimately appear in FROM position
      "range", "generate_series", "unnest")
    // `(?<!DISTINCT )` keeps `x IS DISTINCT FROM y` from reading as a scan
    val tableRef = "(?i)\\b(?:(?<!DISTINCT )FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // CTE names shadow base tables; collect them first
      // a CTE may declare a column list: `walk (id, label) AS (`
      val ctes = ("(?i)(?:WITH(?:\\s+RECURSIVE)?|,)\\s*([a-z_][a-z0-9_]*)" +
        "\\s*(?:\\([^)]*\\))?\\s+AS\\s*(?:MATERIALIZED\\s+)?\\(").r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val refs = tableRef.findAllMatchIn(sql).map(_.group(1).toLowerCase)
        .filterNot(ctes).toSet
      val unknown = refs -- tables
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
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
