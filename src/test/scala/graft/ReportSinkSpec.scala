package graft

import graft.io.ReportSink
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ReportSinkSpec extends SparkSpec {
  import spark.implicits._

  test("violations write partitioned by (table, rule) and read back whole") {
    val dir = Files.createTempDirectory("graft_report").toString + "/errors"
    val v = Seq(
      ("orders", "primary_key", "order_id", "o1", "duplicate primary key"),
      ("orders", "foreign_key", "customer_id", "o2", "dangling foreign key"),
      ("products", "primary_key", "product_id", "p1", "null primary key component")
    ).toDF("table", "rule", "column", "record_key", "detail")

    ReportSink.writeViolations(v, dir)

    // reference-style browsable layout: one directory per (table, rule)
    val sub = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(sub.contains("table_name=orders") && sub.contains("table_name=products"))

    val back = ReportSink.readViolations(spark, dir)
    assert(back.count() == 3)
    assert(back.filter(col("table_name") === "orders").count() == 2)
    // appending accumulates, header handled per file by the csv source
    ReportSink.writeViolations(v.limit(1), dir)
    assert(ReportSink.readViolations(spark, dir).count() == 4)
  }
}
