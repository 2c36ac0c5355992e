package graft

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Paths}

/** Round-over-round bench regression gate. Until now comparing
  * `bench.json` against the prior round's was the judge's manual work;
  * this makes the comparison part of the artifact itself: [[Bench]]
  * embeds a `regressions` field computed here, and the standalone main
  * compares any two bench.json files on demand.
  *
  * A query regresses when its median is BOTH >2× the prior AND >0.5 s
  * slower in absolute terms (the 2× gate alone would flag 0.05 s →
  * 0.12 s scheduler noise on trivial queries). The comparison only
  * applies on a clean-host pair: if either run recorded a 1-minute
  * load average above half its CPU budget, the gate reports
  * `contended` instead of flagging anything — a loaded neighbor is not
  * a regression.
  */
object BenchCompare {

  private val mapper = new ObjectMapper()

  /** (queries, load_before_1m or NaN) parsed from a bench.json line.
    * Accepts both Bench's own output and the driver's BENCH_r{N}.json
    * wrapper (whose `parsed` field holds the same record — possibly
    * without per-query detail when the stdout tail was truncated).
    */
  def parseBench(json: String): (Map[String, Double], Double) = {
    val top = mapper.readTree(json)
    val root = Option(top.get("parsed")).filter(_.isObject).getOrElse(top)
    val qs = Option(root.get("queries")).map { q =>
      val it = q.fields()
      val b = Map.newBuilder[String, Double]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble }
      b.result()
    }.getOrElse(Map.empty)
    val load = Option(root.get("load_before"))
      .filter(_.isArray).filter(_.size > 0)
      .map(_.get(0).asDouble).getOrElse(Double.NaN)
    (qs, load)
  }

  /** Queries whose measured time is DOMINATED by deliberate in-query
    * model training (md5-derandomized k-means++/codebooks, the
    * quality-model gradient loop, BPE) — the re-record protocol's
    * declared class, ~16 s of the suite by design. Tagged so the gate
    * can report the untrained-set sum separately: one noisy trained
    * query otherwise masks a 10% drift across the ~139 untrained ones.
    * Matched by catalog prefix (map keys are full `qNN_name` strings).
    */
  val TrainedQueryPrefixes: Set[String] =
    Set("q31_", "q38_", "q43_", "q56_", "q75_", "q79_",
      "q139_", "q140_", "q142_", "q144_", "q147_")

  def isTrained(query: String): Boolean =
    TrainedQueryPrefixes.exists(query.startsWith)

  /** (trained sum, untrained sum) over positive medians, 1 ms rounded. */
  def classSums(qs: Map[String, Double]): (Double, Double) = {
    val (t, u) = qs.filter(_._2 > 0).partition { case (k, _) => isTrained(k) }
    def r(x: Double) = math.rint(x * 1000) / 1000
    (r(t.values.sum), r(u.values.sum))
  }

  /** One regression row. Ratio is current/prior. */
  final case class Regression(query: String, prior: Double,
                              current: Double, ratio: Double)

  def findRegressions(prior: Map[String, Double],
                      current: Map[String, Double],
                      minRatio: Double = 2.0,
                      minDeltaSec: Double = 0.5): Seq[Regression] =
    current.toSeq.sorted.flatMap { case (q, cur) =>
      prior.get(q) match {
        case Some(p) if p > 0 && cur > 0 && cur / p > minRatio &&
          cur - p > minDeltaSec =>
          Some(Regression(q, p, cur, math.rint(cur / p * 100) / 100))
        case _ => None
      }
    }

  /** A host is "clean" when its pre-run 1-minute load average was under
    * half the CPU budget (unknown telemetry counts as clean — old
    * bench.json vintages predate the load fields). */
  def cleanHost(load1m: Double, cpus: Int): Boolean =
    load1m.isNaN || load1m < cpus / 2.0

  /** The JSON fragment [[Bench]] splices into its output line:
    * `"prior_bench":…,"regression_gate":…,"regressions":[…]`.
    * Gate values: `clean` (comparison ran), `contended` (either side's
    * host was loaded — nothing flagged), `no_prior` (first run on this
    * machine / missing file).
    */
  def regressionsField(priorPath: String, current: Map[String, Double],
                       currentLoad1m: Double, cpus: Int): String = {
    // the trained/untrained split always reports: the deliberate
    // training cost is a declared class, and drift across the many
    // untrained queries must stay visible next to it
    val (tSum, uSum) = classSums(current)
    val classFrag =
      s""""trained_sum_sec":$tSum,"untrained_sum_sec":$uSum"""
    val prior =
      try {
        val p = Paths.get(priorPath)
        if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8"))
        else None
      } catch { case _: Exception => None }
    prior match {
      case None =>
        s""""prior_bench":null,"regression_gate":"no_prior","regressions":[],$classFrag"""
      case Some(js) =>
        val (pq, pload) = try parseBench(js) catch {
          case _: Exception => (Map.empty[String, Double], Double.NaN)
        }
        if (pq.isEmpty)
          s""""prior_bench":null,"regression_gate":"no_prior","regressions":[],$classFrag"""
        else if (!cleanHost(pload, cpus) || !cleanHost(currentLoad1m, cpus))
          s""""prior_bench":"$priorPath","regression_gate":"contended","regressions":[],$classFrag"""
        else {
          val regs = findRegressions(pq, current).map { r =>
            s"""{"query":"${r.query}","prior":${r.prior},"current":${r.current},"ratio":${r.ratio}}"""
          }.mkString("[", ",", "]")
          // untrained drift over the SHARED set: a sum ratio the 2×
          // per-query gate cannot see (e.g. +10% across 139 queries)
          val sharedU = current.keySet.intersect(pq.keySet)
            .filterNot(isTrained)
            .filter(k => current(k) > 0 && pq(k) > 0)
          val cs = sharedU.toSeq.map(current).sum
          val ps = sharedU.toSeq.map(pq).sum
          def r3(x: Double) = math.rint(x * 1000) / 1000
          val ratioFrag =
            if (ps > 0)
              s""","untrained_shared_prior_sec":${r3(ps)},"untrained_shared_current_sec":${r3(cs)},"untrained_shared_ratio":${r3(cs / ps)}"""
            else ""
          s""""prior_bench":"$priorPath","regression_gate":"clean","regressions":$regs,$classFrag$ratioFrag"""
        }
    }
  }

  /** Manual drive: `runMain graft.BenchCompare prior.json current.json
    * [cpus]` prints the regression report for any two bench artifacts.
    */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchCompare <prior.json> <current.json> [cpus]")
    val cpus = args.lift(2).map(_.toInt).getOrElse(32)
    val (pq, pl) = parseBench(new String(
      Files.readAllBytes(Paths.get(args(0))), "UTF-8"))
    val (cq, cl) = parseBench(new String(
      Files.readAllBytes(Paths.get(args(1))), "UTF-8"))
    println(s"prior: ${pq.size} queries (load1m=$pl)  " +
      s"current: ${cq.size} queries (load1m=$cl)")
    if (!cleanHost(pl, cpus) || !cleanHost(cl, cpus))
      println("gate: CONTENDED — host load too high for a fair comparison")
    else {
      val regs = findRegressions(pq, cq)
      if (regs.isEmpty) println("gate: clean — no regressions (>2x and >0.5s)")
      else regs.foreach { r =>
        println(f"REGRESSION ${r.query}%-32s ${r.prior}%.2fs -> ${r.current}%.2fs (${r.ratio}%.2fx)")
      }
      val (pt, pu) = classSums(pq)
      val (ct, cu) = classSums(cq)
      println(f"trained class:   $pt%.1fs -> $ct%.1fs   " +
        f"untrained class: $pu%.1fs -> $cu%.1fs")
      val sharedU = cq.keySet.intersect(pq.keySet).filterNot(isTrained)
        .filter(k => cq(k) > 0 && pq(k) > 0)
      val (cs, ps) = (sharedU.toSeq.map(cq).sum, sharedU.toSeq.map(pq).sum)
      if (ps > 0)
        println(f"untrained shared-set sum: $ps%.1fs -> $cs%.1fs " +
          f"(${cs / ps}%.3fx over ${sharedU.size} queries)")
    }
  }
}
