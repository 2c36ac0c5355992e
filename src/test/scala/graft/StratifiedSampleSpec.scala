package graft

import graft.ext.TextOps
import org.apache.spark.sql.functions._

class StratifiedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def pop = spark.range(1000).select(
    (col("id") % 7).cast("string").as("stratum"), col("id"))

  test("exactly perStratum rows per stratum, rank contiguous from 1") {
    val out = TextOps.stratifiedSample(pop, "stratum", "id", 10)
    val counts = out.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.toSet == Set(10L) && counts.size == 7)
    val ranks = out.filter(col("stratum") === "0")
      .select("rank").collect().map(_.getLong(0)).sorted.toSeq
    assert(ranks == (1L to 10L))
  }

  test("strata smaller than perStratum are kept whole") {
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("stratum", "id")
    assert(TextOps.stratifiedSample(tiny, "stratum", "id", 5).count() == 3)
  }

  test("sample is a pure function of (salt, id): layout-independent") {
    val a = TextOps.stratifiedSample(pop.repartition(17), "stratum", "id", 10)
      .select("stratum", "id", "rank")
      .collect().map(_.toSeq).toSet
    val b = TextOps.stratifiedSample(pop.coalesce(1), "stratum", "id", 10)
      .select("stratum", "id", "rank")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    val c = TextOps.stratifiedSample(pop, "stratum", "id", 10, salt = "other")
      .select("stratum", "id", "rank")
      .collect().map(_.toSeq).toSet
    assert(c != a) // a different salt draws a different sample
  }
}
