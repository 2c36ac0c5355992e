package graft

import graft.io.JdbcUpsert
import graft.model.{ColumnSpec, FkRef, TableConfig}
import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def writeOlistDir(): String = {
    val dir = Files.createTempDirectory("graft_pipe").toFile
    Files.writeString(new java.io.File(dir, "olist_customers_dataset.csv").toPath,
      """customer_id,customer_city,customer_state
        |c1,sao paulo,SP
        |c2,rio,RJ
        |c2,rio,RJ
        |""".stripMargin) // duplicate PK row
    Files.writeString(new java.io.File(dir, "olist_orders_dataset.csv").toPath,
      """order_id,customer_id,order_purchase_timestamp
        |o1,c1,2020-01-01 10:00:00
        |o2,c9,2020-01-02 11:00:00
        |o3,,2020-01-03 12:00:00
        |""".stripMargin) // c9 dangling FK; null FK kept
    Files.writeString(new java.io.File(dir, "olist_geolocation_dataset.csv").toPath,
      """geolocation_zip_code_prefix,geolocation_lat,geolocation_lng,geolocation_city,geolocation_state
        |1001,-23.5,-46.6,sao paulo,SP
        |2002,-22.9,-43.2,rio,RJ
        |""".stripMargin)
    dir.getAbsolutePath
  }

  private val configs = Seq(
    TableConfig("customers", Seq(
      ColumnSpec("customer_id", StringType, primaryKey = true),
      ColumnSpec("customer_city", StringType),
      ColumnSpec("customer_state", StringType))),
    TableConfig("orders", Seq(
      ColumnSpec("order_id", StringType, primaryKey = true),
      ColumnSpec("customer_id", StringType),
      ColumnSpec("order_purchase_timestamp", TimestampType)),
      Seq(FkRef("customer_id", "customers", "customer_id"))))

  test("full pipeline: ingest, geo split, rules, FK-ordered initial merge") {
    val res = Pipeline.run(spark, writeOlistDir(), configs,
      now = lit("2021-01-01 00:00:00").cast("timestamp"))

    // geolocation replaced by 3NF tables
    assert(res.cleaned.keySet ==
      Set("customers", "orders", "geo_city_state", "geo_zip", "geo_coordinates"))
    // dup customer dropped
    assert(res.cleaned("customers").count() == 2)
    // dangling-FK order dropped, null-FK order kept
    assert(res.cleaned("orders").select("order_id").as[String].collect().sorted
      .toSeq == Seq("o1", "o3"))
    // violations: 1 dup PK + 1 dangling FK + 1 null FK + null census rows
    val byRule = res.violations.groupBy("rule").count()
      .as[(String, Long)].collect().toMap
    assert(byRule("primary_key") == 1)
    assert(byRule("foreign_key") == 2)
    // initial merge stamps bookkeeping
    val st = res.postStates("orders")
    assert(st.columns.contains("is_deleted") && st.columns.contains("updated_at"))
    assert(st.filter(col("is_deleted")).count() == 0)
  }

  test("incremental run: merge against previous post-state is idempotent") {
    val dir = writeOlistDir()
    val now1 = lit("2021-01-01 00:00:00").cast("timestamp")
    val r1 = Pipeline.run(spark, dir, configs, now = now1)
    val state1 = r1.postStates.map { case (k, v) => k -> v.cache() }
    val r2 = Pipeline.run(spark, dir, configs, existing = state1,
      now = lit("2021-02-01 00:00:00").cast("timestamp"))
    // same input re-applied: no row changes, no history
    assert(rowsOf(r2.postStates("customers").orderBy("customer_id")) ==
      rowsOf(state1("customers").orderBy("customer_id")))
    assert(r2.history.get("customers").forall(_.count() == 0))
  }

  test("jdbc SQL generation: update, tombstone, merge") {
    assert(JdbcUpsert.updateSql("t", Seq("a", "b"), Seq("id")) ==
      "UPDATE t SET a = ?, b = ? WHERE id = ?")
    assert(JdbcUpsert.tombstoneSql("t", Seq("id1", "id2")) ==
      "UPDATE t SET is_deleted = ?, updated_at = ? WHERE id1 = ? AND id2 = ?")
    val m = JdbcUpsert.mergeSql("t", "stg", Seq("id", "a"), Seq("id"))
    assert(m.contains("MERGE INTO t t USING stg s ON t.id = s.id"))
    assert(m.contains("UPDATE SET t.a = s.a"))
    assert(m.contains("INSERT (id, a) VALUES (s.id, s.a)"))
  }
}
