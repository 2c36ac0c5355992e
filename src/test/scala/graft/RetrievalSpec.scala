package graft

import graft.ext.Retrieval
import org.apache.spark.sql.functions._

/** BM25 + RRF semantics against hand-computed values, the null/absence
  * edge cases RRF defines away, and the integer-micro determinism
  * contract (score is a long; no float enters the ranking).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "cat dog cat"),       // dl=3, tf(cat)=2
    (1L, "cat fish"),          // dl=2, tf(cat)=1
    (2L, "dog dog dog dog"),   // dl=4, no cat
    (3L, "bird")               // dl=1
  ).toDF("doc_id", "text")

  /** Reference BM25 mirroring the operator's exact integer pipeline. */
  private def bm25MicroRef(tf: Long, dl: Long, df: Long, n: Long,
                           t: Long): Long = {
    val idfMicro = Math.round(
      math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1000000L)
    val dlnorm = (1000000L * dl * n) / t
    val denom = 1000000L * tf + 300000L + (9L * dlnorm) / 10L
    val tfnorm = (1000000L * (2200000L * tf)) / denom
    (idfMicro * tfnorm) / 1000000L
  }

  test("bm25Score matches the hand-computed micro pipeline") {
    val out = Retrieval.bm25Score(docs, "doc_id", "text", Seq("cat"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // corpus: n=4 docs, t=10 tokens; df(cat)=2
    assert(out == Map(
      0L -> bm25MicroRef(tf = 2, dl = 3, df = 2, n = 4, t = 10),
      1L -> bm25MicroRef(tf = 1, dl = 2, df = 2, n = 4, t = 10)))
  }

  test("docs with no query term are absent, not zero-scored") {
    val out = Retrieval.bm25Score(docs, "doc_id", "text", Seq("cat"))
    assert(out.filter(col("doc_id").isin(2L, 3L)).count() == 0)
  }

  test("query terms absent from the corpus contribute nothing") {
    val base = Retrieval.bm25Score(docs, "doc_id", "text", Seq("cat"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val withGhost = Retrieval
      .bm25Score(docs, "doc_id", "text", Seq("cat", "zebra"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base == withGhost)
  }

  test("rarer terms out-weigh common ones at equal tf (IDF ordering)") {
    // fish: df=1 (rare), dog: df=2 — same tf=1, same doc-length docs
    val d = Seq((0L, "fish x"), (1L, "dog x"), (2L, "dog y"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25Score(d, "doc_id", "text", Seq("fish", "dog"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) > out(1L),
      s"rare-term doc should outscore common-term doc: $out")
  }

  test("bm25FieldedScore with an EMPTY anchor field ≡ bm25Score — the " +
    "degenerate-field property") {
    val noAnchors = Seq.empty[(Long, String, Long)]
      .toDF("doc_id", "anchor_norm", "n_anchors")
    val plain = Retrieval.bm25Score(docs, "doc_id", "text", Seq("cat"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fielded = Retrieval.bm25FieldedScore(docs, "doc_id", "text",
        noAnchors, "anchor_norm", "n_anchors", Seq("cat"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fielded == plain)
  }

  test("bm25FieldedScore: anchor evidence scores a doc whose BODY " +
    "lacks the term, mention counts weight tf, anchor length feeds " +
    "the normalization, weights fold exactly") {
    // doc 3 ('bird') has NO 'cat' in body but 2 mentions of a
    // 'cat'-bearing anchor; doc 1 gains anchor length only.
    val anchors = Seq(
      (3L, "best cat pictures", 2L),
      (1L, "misc link", 1L)
    ).toDF("doc_id", "anchor_norm", "n_anchors")
    val out = Retrieval.bm25FieldedScore(docs, "doc_id", "text",
        anchors, "anchor_norm", "n_anchors", Seq("cat"),
        wBody = 1L, wAnchor = 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // dl': doc0=3, doc1=2+2·2=6, doc2=4, doc3=1+2·(2·3)=13 → t=26, n=4
    // tf': doc0=2, doc1=1, doc3=2·(2·1)=4; df(cat)=3
    assert(out == Map(
      0L -> bm25MicroRef(tf = 2, dl = 3, df = 3, n = 4, t = 26),
      1L -> bm25MicroRef(tf = 1, dl = 6, df = 3, n = 4, t = 26),
      3L -> bm25MicroRef(tf = 4, dl = 13, df = 3, n = 4, t = 26)))
  }

  test("bm25TopK ranks by (micro desc, id asc) and truncates to k") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("cat"), k = 1)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 0L && out.head.getInt(1) == 1)
  }

  test("bm25ScorePerQuery equals bm25Score run per term set") {
    val qt = Seq((100L, "cat"), (100L, "dog"), (200L, "fish"))
      .toDF("query_id", "term")
    val perQuery = Retrieval
      .bm25ScorePerQuery(docs, "doc_id", "text", qt, "query_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val q100 = Retrieval.bm25Score(docs, "doc_id", "text", Seq("cat", "dog"))
      .collect().map(r => (100L, r.getLong(0)) -> r.getLong(1)).toMap
    val q200 = Retrieval.bm25Score(docs, "doc_id", "text", Seq("fish"))
      .collect().map(r => (200L, r.getLong(0)) -> r.getLong(1)).toMap
    assert(perQuery == q100 ++ q200)
  }

  test("rrfFuse: both-leg docs sum contributions; single-leg docs keep " +
    "the other leg at zero; flags record membership") {
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q", "id", "rank")
    val dense = Seq((1L, 10L, 1), (1L, 12L, 2)).toDF("q", "id", "rank")
    val out = Retrieval.rrfFuse(lex, dense, "q", "id", k = 10)
      .collect()
      .map(r => r.getLong(2) ->
        ((r.getLong(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    val c1 = 1000000L / 61  // rank 1
    val c2 = 1000000L / 62  // rank 2
    assert(out(10L) == ((c1 + c1, true, true)))
    assert(out(11L) == ((c2, true, false)))
    assert(out(12L) == ((c2, false, true)))
  }

  test("rrfFuse rank is per-query with id tie-break") {
    // two queries; q2's doc 5 and doc 7 tie exactly (same single-leg rank)
    val lex = Seq((1L, 10L, 1), (2L, 5L, 1)).toDF("q", "id", "rank")
    val dense = Seq((2L, 7L, 1)).toDF("q", "id", "rank")
    val out = Retrieval.rrfFuse(lex, dense, "q", "id", k = 10)
      .orderBy("q", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1, 10L), (2L, 1, 5L), (2L, 2, 7L)))
  }

  test("hardNegatives keeps lexical hits absent from the dense leg, " +
    "with lexical ranks intact, per query") {
    val lex = Seq((1L, 10L, 1, 500L), (1L, 11L, 2, 400L),
        (2L, 10L, 1, 300L))
      .toDF("q", "id", "rank", "bm25_micro")
    // doc 10 is dense-retrieved for query 1 only — it must survive for
    // query 2 (the anti-join is per (query, doc), not per doc)
    val dense = Seq((1L, 10L)).toDF("q", "id")
    val out = Retrieval.hardNegatives(lex, dense, "q", "id")
      .orderBy("q", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 11L, 2, 400L), (2L, 10L, 1, 300L)))
  }

  test("prfExpansionTerms ranks R's terms by tf_R·idf, excluding the " +
    "original query") {
    // query "cat": R = {0, 1} (only docs with cat, nDocs=2). R's terms
    // minus the query: dog(tf_R=1), fish(tf_R=1), mouse(tf_R=2).
    // mouse appears ONLY in R (df=2 of 5) and twice → top expansion.
    val d = Seq(
      (0L, "cat mouse mouse dog"), (1L, "cat fish"),
      (2L, "dog dog"), (3L, "bird"), (4L, "bird fish")
    ).toDF("doc_id", "text")
    val out = Retrieval.prfExpansionTerms(d, "doc_id", "text",
        Seq("cat"), nDocs = 2, nTerms = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.length == 3)
    assert(out.head._2 == "mouse", s"expected mouse first: ${out.toSeq}")
    assert(!out.exists(_._2 == "cat"), "query term leaked into expansion")
    // exact weight of mouse: tf_R=2, df=1, n=5 →
    // idf = ln((5-1+0.5)/(1+0.5)+1) = ln(4)
    val idfMouse = Math.round(math.log(4.0) * 1000000L)
    assert(out.head._3 == 2 * idfMouse, s"mouse weight: ${out.head._3}")
  }

  test("rankEvalMetrics: rr from the truth top-1's system rank, " +
    "recall from overlap, zero rows for missed queries") {
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1))
      .toDF("q", "id", "rank")
    val system = Seq((1L, 11L, 1), (1L, 10L, 2), (1L, 12L, 3))
      .toDF("q", "id", "rank")
    val out = Retrieval.rankEvalMetrics(system, truth, "q", "id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // q1: truth top-1 is doc 10 at system rank 2 → 1e6 div 2;
    //     overlap {10, 11} of 2 truths → recall 1.0
    assert(out(1L) == ((500000L, 2L, 1000000L)))
    // q2: system never ranked anything → all zeros, but the row exists
    assert(out(2L) == ((0L, 0L, 0L)))
  }

  test("bestPassageWindow: densest window wins, ties go earliest, " +
    "snippet slices the real tokens, zero-hit docs are absent") {
    val d = Seq(
      // hits at 1,2,6: window [1,3] holds 2 hits; [6,8] holds 1 →
      // best_start 1, n_hits 2 (earliest already densest)
      (0L, "cat cat x y z cat q r"),
      // hits at 2 and 5; window=3 → two 1-hit windows tie... no:
      // start 2 covers [2,4] hit 2; start 5 covers [5,7] hit 5 —
      // equal density, tie goes to the EARLIER start 2
      (1L, "x cat y z cat w"),
      (2L, "no hits here at all")
    ).toDF("doc_id", "text")
    val out = Retrieval.bestPassageWindow(d, "doc_id", "text",
        Seq("cat"), windowTokens = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (0L, 1, 2L, "cat cat x"),
      (1L, 2, 1L, "cat y z")))
  }

  test("bestPassagePerQuery: same doc yields different windows under " +
    "different queries; unretrieved pairs never extract") {
    val d = Seq((0L, "cat x x x dog dog")).toDF("doc_id", "text")
    val qt = Seq((1L, "cat"), (2L, "dog"), (3L, "cat"))
      .toDF("query_id", "term")
    // queries 1 and 2 retrieved doc 0; query 3 did NOT
    val pairs = Seq((1L, 0L), (2L, 0L)).toDF("query_id", "doc_id")
    val out = Retrieval.bestPassagePerQuery(d, "doc_id", "text", pairs,
        qt, "query_id", windowTokens = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(2), r.getLong(3), r.getString(4)))).toMap
    assert(out == Map(
      1L -> ((1, 1L, "cat x")),   // query 1: cat window at the front
      2L -> ((5, 2L, "dog dog"))  // query 2: both dogs in one window
    ), s"got $out")
  }

  test("mmrRerank: redundancy is punished (the near-duplicate of the " +
    "top pick drops below a diverse candidate); λ=1 is pure relevance") {
    // candidates: 10 (rel .90), 11 (rel .89, ~identical to 10),
    // 12 (rel .50, orthogonal to both)
    val cands = Seq((1L, 10L, 900000L), (1L, 11L, 890000L),
      (1L, 12L, 500000L)).toDF("q", "id", "rel_micro")
    val pairs = Seq(
      (1L, 10L, 11L, 990000L), (1L, 11L, 10L, 990000L),
      (1L, 10L, 12L, 0L), (1L, 12L, 10L, 0L),
      (1L, 11L, 12L, 0L), (1L, 12L, 11L, 0L)
    ).toDF("q", "id_a", "id_b", "sim_micro")
    val mmr = Retrieval.mmrRerank(cands, pairs, "q", "id", k = 3)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    // greedy: 10 first (max rel); then 11 pays 0.3·~0.99 ≈ .297 penalty
    // → 0.7·.89−.297 ≈ .326 vs 12's 0.7·.50 = .35 → 12 wins rank 2
    assert(mmr.toSeq == Seq((1, 10L), (2, 12L), (3, 11L)), mmr.toSeq)
    val pure = Retrieval.mmrRerank(cands, pairs, "q", "id", k = 3,
        lambdaMicro = 1000000L)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(pure.toSeq == Seq(10L, 11L, 12L), "λ=1 must be relevance order")
  }

  test("rrfFuse truncates to k per query") {
    val lex = (1 to 9).map(i => (1L, i.toLong, i)).toDF("q", "id", "rank")
    val dense = spark.emptyDataset[(Long, Long, Int)]
      .toDF("q", "id", "rank")
    val out = Retrieval.rrfFuse(lex, dense, "q", "id", k = 3)
    assert(out.count() == 3)
  }
}
