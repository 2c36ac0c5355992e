package graft

import java.security.MessageDigest

/** Hard pass/fail gate for q75_kmeans, the trained-model output that the
  * DuckDB oracle cannot express (no_oracle in the driver gate). The query
  * is bit-deterministic by construction — hash-ordered init sample
  * (`Ivf.trainCentroids`), DECIMAL centroid sums (`trainCentroidsLloyd`),
  * DECIMAL per-cluster mean — so its sf0.01 output is pinned to a
  * recorded md5. Any nondeterminism (a double sum sneaking in, an
  * order-dependent init) or semantic drift breaks this hash.
  *
  * The canonical form fixes row order (already ORDER BY cluster_id),
  * column order, and float formatting (%.4f under Locale.ROOT — the query
  * rounds mean_cos to 4 decimals, so the formatting is exact).
  *
  * Re-recording this hash follows the protocol in
  * [[RowsOnlyPinSpec]]'s scaladoc (and README "Recorded-hash pins"):
  * only for a deliberate semantic change, with the why, the old/new
  * (md5, rows), the still-green companion invariants, and two
  * identical back-to-back runs recorded in the commit message.
  */
class KmeansPinSpec extends SparkSpec {

  test("q75_kmeans sf0.01 output matches the recorded hash") {
    val rows = SparkEntry.queries("q75_kmeans")(spark, "/root/testdata/sf0.01")
      .collect()
    val canonical = rows.map { r =>
      val mean = String.format(java.util.Locale.ROOT, "%.4f",
        Double.box(r.getDouble(2)))
      s"${r.getLong(0)}|${r.getLong(1)}|$mean"
    }.mkString("\n")
    val md5 = MessageDigest.getInstance("MD5").digest(canonical.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rows.length == 8, s"expected 8 clusters, got ${rows.length}")
    assert(md5 == "d5f4aebe6fb41c82223eae92c1957c11",
      s"q75 drifted from its recorded output.\nmd5=$md5\nrows:\n$canonical")
  }
}
