package graft

import graft.model.{ColumnSpec, FkRef, OlistSchema, TableConfig}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TableConfigSpec extends AnyFunSuite {

  test("primaryKey / schema / ddl derive from column specs") {
    val cfg = TableConfig("t", Seq(
      ColumnSpec("a", LongType, primaryKey = true),
      ColumnSpec("b", StringType)))
    assert(cfg.primaryKey == Seq("a"))
    assert(cfg.schema == StructType(Seq(StructField("a", LongType),
      StructField("b", StringType))))
    assert(cfg.ddl.contains("CREATE TABLE IF NOT EXISTS t"))
    assert(cfg.ddl.contains("PRIMARY KEY (a)"))
  }

  test("fkOrdered loads parents before children") {
    val order = TableConfig.fkOrdered(OlistSchema.all).map(_.name)
    def before(a: String, b: String) =
      assert(order.indexOf(a) < order.indexOf(b), s"$a !< $b in $order")
    before("customers", "orders")
    before("orders", "order_items")
    before("products", "order_items")
    before("product_category_name_translation", "products")
    before("orders", "order_reviews")
    assert(order.toSet == OlistSchema.all.map(_.name).toSet)
  }

  test("fkOrdered tolerates cycles and unknown parents") {
    val a = TableConfig("a", Seq(ColumnSpec("x", LongType)),
      Seq(FkRef("x", "b", "y")))
    val b = TableConfig("b", Seq(ColumnSpec("y", LongType)),
      Seq(FkRef("y", "a", "x"), FkRef("y", "zz", "q")))
    val order = TableConfig.fkOrdered(Seq(a, b)).map(_.name)
    assert(order.toSet == Set("a", "b"))
  }

  test("payloadColumns excludes merge bookkeeping") {
    assert(OlistSchema.products.payloadColumns.toSet
      .intersect(Set("updated_at", "is_deleted")).isEmpty)
  }
}
