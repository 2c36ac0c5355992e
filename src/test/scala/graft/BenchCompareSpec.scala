package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate's pure logic: thresholds, clean-host
  * gating, and both bench-artifact shapes. */
class BenchCompareSpec extends AnyFunSuite {

  test("findRegressions needs BOTH >2x and >0.5s — noise on trivial " +
    "queries never flags") {
    val prior = Map("a" -> 1.0, "b" -> 0.05, "c" -> 2.0, "d" -> 1.0)
    val cur = Map("a" -> 2.6, "b" -> 0.2, "c" -> 3.5, "d" -> 1.4,
      "new_query" -> 9.9)
    val regs = BenchCompare.findRegressions(prior, cur)
    // a: 2.6x and +1.6s -> flagged; b: 4x but +0.15s -> no;
    // c: +1.5s but 1.75x -> no; d: neither; new_query: no prior -> no
    assert(regs.map(_.query) == Seq("a"))
    assert(regs.head.ratio == 2.6)
  }

  test("failed (negative) priors and currents never participate") {
    assert(BenchCompare.findRegressions(
      Map("a" -> -1.0), Map("a" -> 5.0)).isEmpty)
    assert(BenchCompare.findRegressions(
      Map("a" -> 1.0), Map("a" -> -5.0)).isEmpty)
  }

  test("cleanHost: under half the CPU budget, unknown load is clean") {
    assert(BenchCompare.cleanHost(2.3, 32))
    assert(!BenchCompare.cleanHost(17.0, 32))
    assert(BenchCompare.cleanHost(Double.NaN, 32))
  }

  test("parseBench reads Bench output and the driver's BENCH_r{N} wrapper") {
    val own = """{"metric":"total","load_before":[2.31,2.4,2.5],
      |"queries":{"q01":1.5,"q02":0.3}}""".stripMargin
    val (q1, l1) = BenchCompare.parseBench(own)
    assert(q1 == Map("q01" -> 1.5, "q02" -> 0.3) && l1 == 2.31)
    val wrapper = s"""{"n":8,"rc":0,"parsed":$own}"""
    val (q2, l2) = BenchCompare.parseBench(wrapper)
    assert(q2 == q1 && l2 == 2.31)
    // truncated tail -> no queries, caller degrades to no_prior
    val (q3, _) = BenchCompare.parseBench("""{"n":8,"tail":"q66_pivo"}""")
    assert(q3.isEmpty)
  }

  test("regressionsField degrades loudly: missing prior -> no_prior") {
    val f = BenchCompare.regressionsField("/nonexistent/bench.json",
      Map("a" -> 1.0), 2.0, 32)
    assert(f.contains("\"regression_gate\":\"no_prior\""))
    // the class split reports even without a prior
    assert(f.contains("\"untrained_sum_sec\":1.0"))
  }

  test("trained class: sums split by the declared prefixes, untrained " +
    "shared-set drift reported next to the per-query gate") {
    val cur = Map(
      "q43_topk_ivf" -> 4.0,     // trained (deliberate in-query training)
      "q79_topk_ivfpq" -> 6.0,   // trained
      "q01_pricing_summary" -> 1.1,
      "q02_filter_project" -> 2.2,
      "q99_failed" -> -1.0)      // failed -> excluded from both sums
    val (t, u) = BenchCompare.classSums(cur)
    assert(t == 10.0 && u == 3.3)
    // a +10% drift spread across the untrained set is invisible to the
    // 2x-per-query gate but must show in untrained_shared_ratio
    val dir = java.nio.file.Files.createTempDirectory("graft_bc")
    val prior = """{"queries":{"q43_topk_ivf":4.0,"q79_topk_ivfpq":6.0,""" +
      """"q01_pricing_summary":1.0,"q02_filter_project":2.0},""" +
      """"load_before":[1.0,1.0,1.0]}"""
    val p = dir.resolve("bench.json")
    java.nio.file.Files.write(p, prior.getBytes("UTF-8"))
    val f = BenchCompare.regressionsField(p.toString, cur, 2.0, 32)
    assert(f.contains("\"regression_gate\":\"clean\""))
    assert(f.contains("\"regressions\":[]"), f) // no single query trips 2x
    assert(f.contains("\"trained_sum_sec\":10.0"))
    assert(f.contains("\"untrained_shared_prior_sec\":3.0"))
    assert(f.contains("\"untrained_shared_current_sec\":3.3"))
    assert(f.contains("\"untrained_shared_ratio\":1.1"), f)
  }
}
