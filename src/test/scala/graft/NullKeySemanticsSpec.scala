package graft

import graft.ext.{Dedup, Multimodal}
import org.apache.spark.sql.functions._

/** Pins the null-input behavior of every window→aggregate+semi-join
  * rewrite (the degenerate-bucket/block caps, the dup-span decision,
  * the keep-first picks). An equi-semi-join is null-rejecting where
  * `Window.partitionBy` grouped null keys together, so the contract at
  * each site is made explicit here:
  *
  *  - pair generators (MinHash/prefix-block/edit-distance/image bands):
  *    a null-keyed row can never PAIR under either formulation — the
  *    candidate self-join is itself a null-rejecting equi-join — so the
  *    observable output is identical; pinned as "null text/bands docs
  *    are absent from pair outputs, no exception".
  *  - dedupExact / line-level keep-first: null texts hash to a null
  *    content key, which SQL GROUP BY treats as one group — null-text
  *    docs dedup AGAINST EACH OTHER (smallest id survives), because the
  *    survivor comes back via a semi-join on the non-null ID key, not
  *    the content key.
  *  - duplicatedSpanStats: a null text yields no windows (explode of an
  *    empty start sequence) but the doc stays in the per-document
  *    output with zero duplication and null token count.
  */
class NullKeySemanticsSpec extends SparkSpec {
  import spark.implicits._

  private val withNulls = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, null.asInstanceOf[String]),
    (4L, null.asInstanceOf[String]),
    (5L, "completely different content about spark engines and scale")
  ).toDF("doc_id", "text")

  test("dedupExact: null texts form one content group, smallest id wins") {
    val kept = Dedup.dedupExact(withNulls, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 5L))
  }

  test("minhashNearDupPairs: null texts shingle as empty text and pair " +
      "with each other (consistent with dedupExact's null grouping)") {
    // tokens(null) concat_ws-falls-back to the [""] shingle set, so two
    // null-text docs carry identical signatures — they pair exactly like
    // two empty documents; the band keys are never null
    val pairs = Dedup.minhashNearDupPairs(withNulls, "doc_id", "text",
        minJaccard = 0.0, shingleN = 2, k = 16, bands = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("prefixBlockedNearDupPairs: null-text docs never pair (cap on)") {
    val pairs = Dedup.prefixBlockedNearDupPairs(withNulls, "doc_id", "text",
        prefixLen = 8, shingleN = 2, minJaccard = 0.0, maxBlockSize = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("editDistanceNearDupPairs: null-text docs never pair (cap on)") {
    val pairs = Dedup.editDistanceNearDupPairs(withNulls, "doc_id", "text",
        prefixLen = 8, maxDist = 5, maxBlockSize = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("duplicatedSpanStats: null-text doc present with zero duplication") {
    val rows = Dedup.duplicatedSpanStats(withNulls, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(rows.length == 5)
    val nullDoc = rows(2)
    assert(nullDoc.getLong(0) == 3L)
    assert(nullDoc.isNullAt(1)) // n_tokens: split(null) has no length
    assert(nullDoc.getLong(2) == 0L && nullDoc.getLong(3) == 0L)
    // docs 1 and 2 are exact dups — all their spans are duplicated
    assert(rows(0).getLong(2) > 0L && rows(1).getLong(2) > 0L)
  }

  test("imageNearDupPairs: null-bands rows never pair, no exception") {
    val banded = Seq(
      (1L, Some(Seq(1L, 2L, 3L, 4L))),
      (2L, Some(Seq(1L, 2L, 3L, 4L))),
      (3L, None: Option[Seq[Long]])
    ).toDF("media_id", "bands")
    val pairs = Multimodal.imageNearDupPairs(banded, "media_id",
        maxHamming = 3, maxBucketSize = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("dedupLines: null-text docs keep their output row with 0 lines") {
    val out = Dedup.dedupLines(withNulls, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 5)
    assert(out(2).getLong(0) == 3L && out(2).getLong(1) == 0L)
  }
}
