package graft

import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

/** The engine's SQL front door: every capability reachable through the
  * DataFrame API must also resolve through `spark.sql` over registered
  * views — including the native graft_* functions injected by
  * GraftExtensions/GraftFunctions. A reference user who writes SQL, not
  * Scala, gets the same engine.
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  test("spark.sql over a view equals the DataFrame formulation") {
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "a b c"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("sql_docs")
    val viaSql = spark.sql(
      """SELECT sha2(text, 256) AS h, min(doc_id) AS keep, count(*) AS n
        |FROM sql_docs GROUP BY sha2(text, 256) ORDER BY keep""".stripMargin)
      .collect().map(_.toSeq)
    val viaDf = docs.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("keep"), count(lit(1)).as("n"))
      .orderBy("keep")
      .collect().map(_.toSeq)
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("native graft_* functions resolve in SQL text") {
    val one = spark.sql(
      "SELECT graft_simhash64(array('a','b','c')) AS h").head().getLong(0)
    val viaFn = Seq("x").toDF("t")
      .select(call_function("graft_simhash64",
        typedLit(Seq("a", "b", "c"))).as("h")).head().getLong(0)
    assert(one == viaFn)

    val sig = spark.sql(
      "SELECT graft_minhash_sig(array('a b c','b c d'), 16) AS s")
      .head().getSeq[Long](0)
    assert(sig.length == 16)

    val mg = spark.sql(
      """SELECT graft_misra_gries(t, 2) AS m
        |FROM (SELECT explode(array('a','a','a','b','c')) AS t)"""
        .stripMargin).head().getMap[String, Long](0)
    assert(mg.contains("a"))
  }

  test("a catalog query text runs under spark.sql against temp views") {
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .createOrReplaceTempView("lineitem")
    val out = spark.sql(
      """SELECT l_returnflag, CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |  AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin)
    assert(out.count() == 3)
    assert(out.columns.toSeq == Seq("l_returnflag", "sum_qty"))
  }
}
