package graft

import graft.ext.TextOps
import org.apache.spark.sql.functions._

/** BPE training/segmentation pinned against an INDEPENDENT plain-Scala
  * reference (no shared code with `plans.BpeCore` — the Lloyd-step /
  * portable-planes non-circularity discipline) plus hand-derived cases
  * on the Sennrich et al. example corpus shape.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- reference implementation: dictionary BPE, lowest-rank-pair
  // apply, lexicographic tie-break on "l r" — written from the paper's
  // description, independently of BpeCore
  private def refSegment(word: String,
                         merges: Seq[(String, String)]): Vector[String] = {
    val rank = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    var syms = word.toVector.map(_.toString) :+ "</w>"
    var go = true
    while (go) {
      val present = syms.zip(syms.drop(1)).flatMap(p => rank.get(p).map(p -> _))
      if (present.isEmpty) go = false
      else {
        val (l, r) = present.minBy(_._2)._1
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += l + r; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  private def refTrain(wordFreq: Map[String, Long],
                       nMerges: Int): Seq[(String, String, Long)] = {
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var go = true
    while (merges.size < nMerges && go) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      wordFreq.foreach { case (w, f) =>
        val syms = refSegment(w, merges.map(m => (m._1, m._2)).toSeq)
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f }
      }
      if (counts.isEmpty) go = false
      else {
        val best = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l + " " + r) }
        if (best._2 < 2) go = false
        else merges += ((best._1._1, best._1._2, best._2))
      }
    }
    merges.toSeq
  }

  test("trainBpeMerges equals the reference on a mixed corpus") {
    val texts = Seq(
      "low low low low low", "lower lower widest widest widest",
      "newest newest newest newest newest newest",
      "the cat sat on the mat", "the bat and the cat")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextOps.trainBpeMerges(df, "text", nMerges = 12)
    val wordFreq = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val want = refTrain(wordFreq, 12)
    assert(got == want, s"\ngot  $got\nwant $want")
    // the trained table segments like the reference, word by word
    val merges = got.map(m => (m._1, m._2))
    val segs = TextOps.withBpeTokens(
        wordFreq.keys.toSeq.sorted.toDF("text"), "text", merges)
      .select("text", "bpe_tokens").as[(String, Seq[String])]
      .collect().toMap
    wordFreq.keys.foreach { w =>
      assert(segs(w) == refSegment(w, merges), s"word '$w'")
    }
  }

  test("hand case: 'aaab' x2 merges (a,a) first, then fuses greedily") {
    val df = Seq((1L, "aaab aaab")).toDF("doc_id", "text")
    val got = TextOps.trainBpeMerges(df, "text", nMerges = 2)
    // symbols per word: a a a b </w>; pair (a,a) occurs twice per word
    // (overlapping adjacency), freq 2 words -> count 4
    assert(got.head == (("a", "a", 4L)))
    // after fusing: aa a b </w> -> next best pair count is 2; ties break
    // lexicographically: "a b" < "aa a" < "b </w>"
    assert(got(1) == (("a", "b", 2L)))
  }

  test("withBpeTokens: flattened subwords, real token count, determinism") {
    val merges = Seq(("t", "h"), ("th", "e"), ("the", "</w>"))
    val df = Seq((1L, "The theory"), (2L, "the the the")).toDF("doc_id", "text")
    val out = TextOps.withBpeTokens(df, "text", merges)
      .select("doc_id", "bpe_tokens", "n_bpe_tokens")
      .as[(Long, Seq[String], Long)].collect()
      .map { case (k, v, n) => k -> ((v, n)) }.toMap
    // "the" -> [the</w>]; "theory" -> [the, o, r, y, </w>] (the</w> needs
    // the terminal marker adjacent, which 'theory' lacks)
    assert(out(1L) == ((Seq("the</w>", "the", "o", "r", "y", "</w>"), 6L)))
    assert(out(2L) == ((Seq("the</w>", "the</w>", "the</w>"), 3L)))
    // training is deterministic run to run
    val d2 = Seq((1L, "abab abab cdcd")).toDF("doc_id", "text")
    assert(TextOps.trainBpeMerges(d2, "text", 5) ==
      TextOps.trainBpeMerges(d2, "text", 5))
  }

  test("persisted BPE model: train → write → load round-trips rank " +
    "order, and indexed tokenization equals the in-memory table") {
    val corpus = Seq((1L, "the theory then"), (2L, "the thesis"),
      (3L, "other ethos the")).toDF("doc_id", "text")
    val trained = TextOps.trainBpeMerges(corpus, "text", nMerges = 6)
    assert(trained.nonEmpty)
    val loc = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bpedb LOCATION '$loc'")
    TextOps.writeBpeModel(spark, "graft_bpedb.model", trained)
    val loaded = TextOps.loadBpeModel(spark, "graft_bpedb.model")
    // replay ORDER is the model — the round-trip must preserve it
    assert(loaded == trained.map(m => (m._1, m._2)))
    val direct = TextOps.withBpeTokens(corpus, "text",
        trained.map(m => (m._1, m._2)))
      .select("doc_id", "bpe_tokens").collect().map(_.toSeq)
    val indexed = TextOps.withBpeTokensIndexed(spark, "graft_bpedb.model",
        corpus, "text")
      .select("doc_id", "bpe_tokens").collect().map(_.toSeq)
    assert(indexed.toSeq == direct.toSeq)
  }
}
