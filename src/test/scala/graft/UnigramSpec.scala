package graft

import graft.ext.{IndexAudit, TextOps}
import graft.plans.UnigramCore
import org.apache.spark.sql.functions._

/** Gates for the unigram-LM tokenizer family (q147/q148):
  * [[graft.plans.UnigramCore.segment]] pinned against an INDEPENDENT
  * brute-force reference (enumerate every segmentation, pick the
  * cheapest under the same smallest-start tie order — non-circular),
  * trainer determinism and invariants, the persisted-model round trip,
  * and the model audit's planted-corruption trips.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  /** Exhaustive reference: all segmentations of `word` into vocab
    * pieces of length ≤ maxLen, cheapest total first; ties prefer the
    * segmentation whose pieces, compared by start positions from the
    * END of the word backwards, start earlier — exactly the greedy
    * smallest-start backtrack order.
    */
  private def bruteForce(word: String, cost: Map[String, Long],
                         maxLen: Int): Seq[String] = {
    def all(from: Int): Seq[List[String]] =
      if (from == word.length) Seq(Nil)
      else (1 to math.min(maxLen, word.length - from)).flatMap { l =>
        val p = word.substring(from, from + l)
        if (cost.contains(p)) all(from + l).map(p :: _) else Nil
      }
    def starts(seg: List[String]): List[Int] =
      seg.scanLeft(0)(_ + _.length).dropRight(1)
    val segs = all(0)
    assert(segs.nonEmpty, s"'$word' unsegmentable in the reference")
    // min total; tie → lexicographically smallest REVERSED start list
    // (the backtrack fixes the LAST piece first, preferring the
    // smallest start for it, then recurses leftwards)
    import scala.math.Ordering.Implicits._
    segs.minBy(s => (s.map(cost).sum, starts(s).reverse)).toSeq
  }

  private val vocab: Map[String, Long] =
    graft.entry.TextQueries.UnigramFixedVocab.toMap

  test("Viterbi segmentation == exhaustive reference on every corpus " +
    "word and the engineered tie") {
    val words = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct().as[String].collect().toSeq :+ "abba" :+ "windoworder"
    words.foreach { w =>
      val got = UnigramCore.segment(w, vocab, 4).toSeq
      val want = bruteForce(w, vocab, 4)
      assert(got == want, s"'$w': viterbi=$got reference=$want")
    }
  }

  test("the engineered tie resolves to the smallest start (piece 'ab')") {
    assert(UnigramCore.segment("abba", vocab, 4).toSeq ==
      Seq("ab", "b", "a"))
  }

  test("unsegmentable input fails loudly, empty input is empty") {
    assertThrows[IllegalArgumentException] {
      UnigramCore.segment("naïve", Map("n" -> 1L), 4)
    }
    assert(UnigramCore.segment("", vocab, 4).isEmpty)
  }

  test("trainer is deterministic and keeps the single-char floor") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val a = TextOps.trainUnigramLm(docs, "text").collect().map(_.toSeq)
    val b = TextOps.trainUnigramLm(docs, "text").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq && a.nonEmpty)
    val pieces = a.map(_.head.asInstanceOf[String])
    val chars = pieces.flatMap(_.toSeq).map(_.toString).distinct
    assert(chars.forall(pieces.contains), "alphabet char missing from vocab")
    a.foreach { r =>
      assert(r(1).asInstanceOf[Long] >= 1L)
      assert(r(2).asInstanceOf[Long] > 0L)
    }
  }

  test("persisted model round-trips and indexed tokenization is " +
    "bit-identical to in-memory") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val trained = TextOps.trainUnigramLm(docs, "text")
    val loc = java.nio.file.Files.createTempDirectory("graft_uni").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_unidb LOCATION '$loc'")
    TextOps.writeUnigramModel(spark, "graft_unidb.um", trained,
      maxPieceLen = 4)
    val (loaded, maxLen) = TextOps.loadUnigramModel(spark, "graft_unidb.um")
    assert(maxLen == 4)
    assert(loaded.toMap == trained.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap)
    val mem = TextOps.withUnigramTokens(docs, "text", loaded, 4)
      .select("doc_id", "unigram_tokens").collect().map(_.toSeq)
    val idx = TextOps.withUnigramTokensIndexed(spark, "graft_unidb.um",
        docs, "text")
      .select("doc_id", "unigram_tokens").collect().map(_.toSeq)
    assert(mem.toSeq == idx.toSeq)
    // audit: clean on the fresh model
    assert(IndexAudit.auditUnigramModel(spark, "graft_unidb.um")
      .filter(!col("ok")).count() == 0)
  }

  test("tokenize stream over the persisted model: union of micro-batches " +
    "== one batch pass") {
    val loc = java.nio.file.Files.createTempDirectory("graft_uni3").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_unidb3 LOCATION '$loc'")
    import spark.implicits._
    TextOps.writeUnigramModel(spark, "graft_unidb3.um",
      Seq(("a", 9L, 100L), ("b", 8L, 110L), ("c", 7L, 120L),
        ("d", 6L, 130L), ("ab", 5L, 150L), ("abcd", 4L, 160L))
        .toDF("piece", "cnt", "cost_micro"),
      maxPieceLen = 4)
    val docs = Seq((0L, "abcd ab"), (1L, "dcba"), (2L, "ab ab abcd"))
      .toDF("doc_id", "text").localCheckpoint()

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Long]
    val acc = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val query = graft.streaming.EventStreams.tokenizeStream(
        in.toDF().toDF("doc_id").join(docs, "doc_id"),
        "graft_unidb3.um", "text") { (batch, _) =>
      acc.synchronized {
        acc ++= batch.select("doc_id", "unigram_tokens")
          .collect().map(_.toSeq)
      }
    }
    in.addData(0L, 2L)
    query.processAllAvailable()
    in.addData(1L)
    query.processAllAvailable()
    query.stop()
    val oneShot = TextOps.withUnigramTokensIndexed(spark, "graft_unidb3.um",
        docs, "text")
      .select("doc_id", "unigram_tokens").collect().map(_.toSeq)
    assert(acc.toSet == oneShot.toSet && acc.size == 3)
  }

  test("model audit trips on a gapped alphabet and an oversized piece") {
    val loc = java.nio.file.Files.createTempDirectory("graft_uni2").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_unidb2 LOCATION '$loc'")
    Seq(("a", 5L, 100L), ("ab", 3L, 200L), ("abcde", 2L, 300L))
      .toDF("piece", "cnt", "cost_micro")
      .write.format("parquet").mode("overwrite")
      .saveAsTable("graft_unidb2.bad")
    Seq(4).toDF("max_piece_len")
      .write.format("parquet").mode("overwrite")
      .saveAsTable("graft_unidb2.bad_meta")
    val bad = IndexAudit.auditUnigramModel(spark, "graft_unidb2.bad")
      .filter(!col("ok")).collect().map(_.getString(0)).toSet
    assert(bad.contains("closed_alphabet"), bad)   // 'b'..'e' unsingled
    assert(bad.contains("pieces_within_window"), bad) // len 5 > 4
  }
}
