package graft

import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

/** The levenshtein auto-band optimizer rule: rewrite fires, semantics
  * (including nulls and the < form) are preserved, and the rewrite is
  * visible in the optimized plan exactly once.
  */
class LevenshteinBandRuleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("kitten", "sitting"),                    // dist 3
    ("abc", "abcd"),                          // dist 1
    ("short", "a much longer string indeed"), // band-prunable
    (null.asInstanceOf[String], "x")          // null input
  ).toDF("a", "b")

  /** Literal frames get folded away by ConvertToLocalRelation before the
    * plan can be inspected — exclude it while asserting plan shape.
    */
  private def withVisiblePlans[A](body: => A): A = {
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("<= k predicate is rewritten to band + thresholded levenshtein") {
    GraftFunctions.register(spark)
    withVisiblePlans {
      val q = df.filter(expr("levenshtein(a, b) <= 3"))
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("levenshtein("), opt)
      assert(opt.contains("Some(3)"), s"threshold variant missing:\n$opt")
      assert(opt.contains("abs((length("), s"length band missing:\n$opt")
      assert(q.select("a").as[String].collect().toSet == Set("kitten", "abc"))
    }
  }

  test("< k form and null inputs behave exactly like the original") {
    GraftFunctions.register(spark)
    val strict = df.filter(expr("levenshtein(a, b) < 3"))
    assert(strict.select("a").as[String].collect().toSet == Set("abc"))
    // null row is dropped by the rewritten predicate too (null, not true)
    assert(df.filter(expr("levenshtein(a, b) <= 100")).count() == 3)
  }

  test("property: rewritten predicate equals the original on generated text") {
    GraftFunctions.register(spark)
    // adversarial corpus: shared prefixes, length spreads, unicode,
    // empties — pairs straddle the band and threshold boundaries
    val gen = org.scalacheck.Gen.listOfN(8, org.scalacheck.Gen.oneOf(
      org.scalacheck.Gen.alphaNumStr.map(_.take(6)),
      org.scalacheck.Gen.oneOf("ab", "abc", "abcd", "naïve", "", "日本")))
      .map(_.mkString)
    val params = org.scalacheck.Gen.Parameters.default
    val strings = (0 until 40).flatMap(i =>
      gen(params, org.scalacheck.rng.Seed(77L + i)))
    val pairs = for (a <- strings; b <- strings.take(10)) yield (a, b)
    // ground truth independent of Spark: classic DP on the driver
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = pairs.count { case (a, b) => lev(a, b) <= 4 }.toLong
    val got = pairs.toDF("a", "b")
      .filter(expr("levenshtein(a, b) <= 4")).count()
    assert(got == want, "band+threshold rewrite changed the predicate")
  }

  test("rewrite applies exactly once (idempotent under fixpoint)") {
    GraftFunctions.register(spark)
    withVisiblePlans {
      val opt = df.filter(expr("levenshtein(a, b) <= 2"))
        .queryExecution.optimizedPlan.toString
      assert("abs\\(".r.findAllIn(opt).size == 1, opt)
    }
  }
}
