package graft

import graft.io.CsvIngest
import java.nio.file.Files

class CsvIngestSpec extends SparkSpec {

  test("tableNameFromFile strips olist_/_dataset decorations") {
    assert(CsvIngest.tableNameFromFile("olist_customers_dataset.csv") == "customers")
    assert(CsvIngest.tableNameFromFile("payments.csv") == "payments")
  }

  test("looksLikeTimestamp matches the reference's name heuristic") {
    assert(CsvIngest.looksLikeTimestamp("order_purchase_timestamp"))
    assert(CsvIngest.looksLikeTimestamp("order_approved_at"))
    assert(CsvIngest.looksLikeTimestamp("shipping_limit_date"))
    assert(!CsvIngest.looksLikeTimestamp("customer_city"))
  }

  test("readCsv: nulls ('nan','?'), timestamp heuristic, single scan") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "olist_orders_dataset.csv")
    Files.writeString(f.toPath,
      """order_id,status,order_approved_at,amount
        |o1,ok,2020-01-01 10:00:00,5
        |o2,nan,2020-02-02 11:30:00,6
        |o3,?,bogus,7
        |""".stripMargin)
    val df = CsvIngest.readCsv(spark, f.getAbsolutePath)
    assert(df.schema("order_approved_at").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val rows = df.orderBy("order_id").collect()
    assert(rows(1).isNullAt(1)) // 'nan' swept
    assert(rows(2).isNullAt(1)) // '?' swept
    assert(rows(2).isNullAt(2)) // unparseable ts -> null
    assert(rows(0).getTimestamp(2).toString.startsWith("2020-01-01 10:00"))
  }

  test("readCsvDirectory builds a name-keyed registry") {
    val dir = Files.createTempDirectory("graft_csvdir").toFile
    Files.writeString(new java.io.File(dir, "olist_a_dataset.csv").toPath, "x\n1\n")
    Files.writeString(new java.io.File(dir, "b.csv").toPath, "y\n2\n")
    Files.writeString(new java.io.File(dir, "notes.txt").toPath, "ignored")
    val reg = CsvIngest.readCsvDirectory(spark, dir.getAbsolutePath)
    assert(reg.keySet == Set("a", "b"))
    assert(reg("a").count() == 1)
  }
}
