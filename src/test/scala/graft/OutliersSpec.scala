package graft

import graft.ext.Outliers

/** Per-group z-score outliers: exact stats, group gating, and the
  * rounded-z threshold contract.
  */
class OutliersSpec extends SparkSpec {
  import spark.implicits._

  // values 0,0,0,0,10: mean 2, sample variance (100 - 100/5)/4 = 20,
  // so the 10 sits at z = 8/sqrt(20) ≈ 1.7889 and the 0s at ≈ -0.4472
  private def fixture = Seq(("g", 0.0), ("g", 0.0), ("g", 0.0), ("g", 0.0),
      ("g", 10.0))
    .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
    .toDF("id", "grp", "v")

  test("flags exactly the far-from-mean rows with the right z-score") {
    val out = Outliers.zscoreOutliers(fixture, "grp", "v", threshold = 1.5)
      .select("id", "z").as[(Long, Double)].collect().toSeq
    val expectedZ = BigDecimal(8.0 / math.sqrt(20.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq((4L, expectedZ)))
  }

  test("groups below 2 rows or with zero variance yield no outliers") {
    val df = Seq(
      (1L, "single", 100.0),                         // n = 1
      (2L, "flat", 5.0), (3L, "flat", 5.0), (4L, "flat", 5.0) // variance 0
    ).toDF("id", "grp", "v")
    assert(Outliers.zscoreOutliers(df, "grp", "v", 0.1).count() == 0L)
  }

  test("prequentialOutliers equals the streaming AnomalyDetect fold") {
    import graft.streaming.{AnomalyDetect, MetricEvent}
    val base = 1700000000000000L
    val rnd = new scala.util.Random(11)
    // 60 tame observations with two injected spikes after the cold start
    val vals = (0 until 60).map { i =>
      if (i == 40) 500.0 else if (i == 55) -400.0 else 10.0 + rnd.nextDouble()
    }
    val evs = vals.zipWithIndex.map { case (v, i) =>
      MetricEvent("k", base + i * 1000000L, v) }
    val expected = AnomalyDetect.anomaliesBatch(evs, threshold = 3.0,
      minPrior = 30).map(a => (a.ts_micros, a.n_prior)).toSet
    assert(expected.map(_._2) == Set(40L, 55L), s"fixture sanity: $expected")

    val df = evs.map(e => (e.key, e.ts_micros, e.value))
      .toDF("key", "ts_micros", "v")
    val got = Outliers.prequentialOutliers(df, "key", Seq("ts_micros"), "v",
        threshold = 3.0, minPrior = 30)
      .select("ts_micros", "n_prior").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("threshold applies to the ROUNDED z, per the oracle contract") {
    // rounded z of the outlier is exactly 1.7889: a threshold equal to it
    // drops the row (strict >), one ulp-of-rounding below keeps it
    assert(Outliers.zscoreOutliers(fixture, "grp", "v", 1.7889).count() == 0L)
    assert(Outliers.zscoreOutliers(fixture, "grp", "v", 1.7888).count() == 1L)
  }
}
