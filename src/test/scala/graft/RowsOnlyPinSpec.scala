package graft

import java.security.MessageDigest

/** Recorded-hash DEFENSE-IN-DEPTH pins. Since round 10 the rows-only
  * set is EMPTY — every catalog query is oracle-checked (q43/q56/q75
  * left via md5-derandomized k-means++ seeding, q31/q38 via the
  * derandomized multi-table OR-construction, q79 via md5-Forgy +
  * L2-Lloyd subspace codebooks) — but q119 keeps its pin on top of
  * its oracle (the BPE training loop unrolled as argmax-and-fuse
  * CTEs) as a second, independent gate on the trainer. The pinned
  * query is bit-deterministic at a fixed input (exact-long counts,
  * lexicographic ties, a total trailing ORDER BY), so its sf0.01
  * output pins to a recorded md5.
  *
  * Canonical form: row order as emitted (each query's trailing ORDER BY
  * is total), columns in schema order, and every value rendered
  * type-stably — floating-point via raw IEEE-754 bits (no decimal
  * formatting ambiguity), null as `∅`, arrays element-wise. Silent
  * drift (an order-dependent sum sneaking in, a seed change, a plan
  * rewrite that alters tie-breaks) fails loudly.
  *
  * == Re-record protocol (READ BEFORE CHANGING A HASH) ==
  *
  * A recorded hash is a statement that the CURRENT output is correct;
  * replacing it asserts the NEW output is. Re-recording is allowed
  * ONLY when the query's semantics were changed on purpose — a
  * deliberate algorithm change (new hyperplane count, different k, a
  * redefined tie-break), a hyperparameter retune, or a testdata
  * regeneration. It is NOT allowed to silence a red pin whose cause
  * you cannot explain: an unexplained hash change under unchanged
  * semantics IS the bug this spec exists to catch (nondeterminism,
  * overflow, an engine-upgrade behavior shift).
  *
  * Evidence that must accompany a re-record (in the commit message of
  * the commit that changes the hash):
  *  1. WHY the output legitimately changed (the semantic change,
  *     file:line);
  *  2. the old and new (md5, row count) pairs;
  *  3. a statement that the companion invariant checks still hold —
  *     the recall/containment specs for the ANN queries
  *     (`SimilaritySpec`/`IvfSpec`/`PqSpec`), the merge-consistency
  *     check for q119 (`BpeSpec`), cluster-count/mean bounds for q75;
  *  4. two identical back-to-back runs of the new hash (determinism
  *     re-established, not assumed).
  * The README's "Recorded-hash pins" section states the same protocol
  * for readers outside this file.
  */
class RowsOnlyPinSpec extends SparkSpec {

  private def canon(v: Any): String = v match {
    case null                => "∅"
    case d: java.lang.Double => java.lang.Long.toHexString(java.lang.Double.doubleToRawLongBits(d))
    case f: java.lang.Float  => java.lang.Integer.toHexString(java.lang.Float.floatToRawIntBits(f))
    case s: scala.collection.Seq[_] => s.map(canon).mkString("[", ",", "]")
    case other               => other.toString
  }

  private def md5Of(name: String): (String, Int, String) = {
    val rows = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01").collect()
    val canonical = rows.map(_.toSeq.map(canon).mkString("|")).mkString("\n")
    val md5 = MessageDigest.getInstance("MD5").digest(canonical.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (md5, rows.length, canonical)
  }

  private def pin(name: String, expectedMd5: String, expectedRows: Int): Unit =
    test(s"$name sf0.01 output matches the recorded hash") {
      val (md5, n, canonical) = md5Of(name)
      assert(n == expectedRows, s"$name: expected $expectedRows rows, got $n")
      assert(md5 == expectedMd5,
        s"$name drifted from its recorded output.\nmd5=$md5 rows=$n\nfirst lines:\n" +
          canonical.linesIterator.take(10).mkString("\n"))
    }

  // Round-10 retirements, each superseded by a DuckDB oracle under
  // the deliberate-semantic-change protocol (old pins, for the
  // record): q43 a465e1d78d27cc29fbc3a9624519737d/25,
  // q56 f885d8ce276a7969d1165fc3111f74d8/480,
  // q31 b7aa123c78a891b2f354188462e8d69a/25,
  // q38 8ba6677469f22d5c4c17e4f37e5ed453/15,
  // q79 2e3d3b8f1ae8c3c100253b9a75ca7a7b/25.
  pin("q119_bpe_merges",         "ba803983320184d58297e3bd13b856d3", 16)
}
