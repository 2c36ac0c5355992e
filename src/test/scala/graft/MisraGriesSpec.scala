package graft

import graft.ext.TextOps
import graft.plans.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  /** 10_000 rows: 50% of mass on 5 hot tokens, the rest a 5_000-token
    * unique tail — vocabulary far above any k under test, so the sketch
    * MUST decrement/trim to stay bounded.
    */
  private def skewedTokens: DataFrame =
    spark.range(10000).select(
      when(col("id") % 2 === 0, concat(lit("hot"), col("id") % 5))
        .otherwise(concat(lit("cold"), col("id"))).as("token"))

  private def exactCounts: Map[String, Long] =
    skewedTokens.groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("sketch keeps every above-threshold item within the error bound") {
    val k = 20
    val n = 10000L
    val sketch = skewedTokens
      .agg(call_function("graft_misra_gries", col("token"), lit(k)))
      .head().getMap[String, Long](0)
    assert(sketch.size <= k)
    val bound = n / (k + 1)
    val exact = exactCounts
    exact.foreach { case (tok, c) =>
      if (c > bound) {
        assert(sketch.contains(tok), s"heavy item $tok missing")
        val est = sketch(tok)
        assert(est <= c && c - est <= bound,
          s"$tok: est=$est exact=$c bound=$bound")
      }
    }
  }

  test("sketch guarantee holds under any partitioning layout") {
    // partial sketches are lossy, so the exact map may differ by layout —
    // but the heavy-item guarantee and the size bound must hold for all
    val k = 10
    val bound = 10000L / (k + 1)
    val heavy = exactCounts.filter(_._2 > bound).keySet
    for (parts <- Seq(1, 7, 64)) {
      val m = skewedTokens.repartition(parts, col("token"))
        .agg(call_function("graft_misra_gries", col("token"), lit(k)))
        .head().getMap[String, Long](0).toMap
      assert(m.size <= k, s"parts=$parts")
      assert(heavy.subsetOf(m.keySet), s"parts=$parts missing ${heavy -- m.keySet}")
    }
  }

  test("nulls are skipped, empty input yields an empty map") {
    import spark.implicits._
    val withNulls = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("token")
    val m = withNulls
      .agg(call_function("graft_misra_gries", col("token"), lit(4)))
      .head().getMap[String, Long](0).toMap
    assert(m == Map("a" -> 2L, "b" -> 1L))
    val empty = withNulls.filter(col("token").isNull)
      .agg(call_function("graft_misra_gries", col("token"), lit(4)))
      .head().getMap[String, Long](0)
    assert(empty.isEmpty)
  }

  test("heavyHitters equals the full GROUP BY ... HAVING formulation") {
    val docs = spark.range(10000).select(col("id"),
        when(col("id") % 2 === 0, concat(lit("hot"), col("id") % 5))
          .otherwise(concat(lit("cold"), col("id"))).as("token"))
      .groupBy((col("id") % 97).as("g"))
      .agg(concat_ws(" ", collect_list(col("token"))).as("text"))
    val k = 20
    val fast = TextOps.heavyHitters(docs, "text", k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val toks = docs.select(explode(split(trim(lower(col("text"))), "\\s+"))
      .as("token")).filter(col("token") =!= "")
    val total = toks.count()
    val naive = toks.groupBy("token").agg(count(lit(1)).as("n"))
      .filter(col("n") * (k + 1) > lit(total))
      .withColumn("share_ppm", expr(s"n * 1000000L div ${total}L"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    assert(fast == naive)
    assert(fast.nonEmpty) // the 5 hot tokens must surface
    assert(fast.map(_._1) == Set("hot0", "hot1", "hot2", "hot3", "hot4"))
  }

  test("heavyHitters on uniform data returns nothing above threshold") {
    import spark.implicits._
    val docs = (0 until 100).map(i => s"u$i").grouped(10)
      .map(_.mkString(" ")).toSeq.toDF("text")
    assert(TextOps.heavyHitters(docs, "text", 5).count() == 0)
  }
}
