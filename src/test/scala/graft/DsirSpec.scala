package graft

import graft.ext.TextOps
import org.apache.spark.sql.functions._

/** DSIR importance weighting: exact agreement with an independent
  * plain-Scala reference of the hash→census→lattice→dot-product
  * pipeline, plus the selection-direction and empty-doc contracts.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 16

  /** Plain-Scala mirror of the operator's numerics. */
  private def refLogw(rawDocs: Seq[(Long, String)],
                      targetDocs: Seq[(Long, String)]): Map[Long, Long] = {
    def toks(s: String): Seq[String] =
      s.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    def bucket(tok: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"f:graft:$tok".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(h, 16) % B
    }
    val ct = targetDocs.flatMap(d => toks(d._2)).map(bucket)
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val cr = rawDocs.flatMap(d => toks(d._2)).map(bucket)
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val (tt, tr) = (ct.values.sum, cr.values.sum)
    val lattice = (ct.keySet ++ cr.keySet).map { b =>
      b -> Math.round((math.log((ct.getOrElse(b, 0L) + 1.0) / (tt + B)) -
        math.log((cr.getOrElse(b, 0L) + 1.0) / (tr + B))) * 1000000L)
    }.toMap
    rawDocs.map { case (id, text) =>
      id -> toks(text).map(t => lattice(bucket(t))).sum
    }.toMap
  }

  private val target = Seq((100L, "alpha beta alpha"), (101L, "beta gamma"))
  private val raw = Seq(
    (0L, "alpha beta gamma"),   // target-like
    (1L, "delta epsilon zeta"), // off-target
    (2L, "alpha alpha alpha"),
    (3L, "   "))                // whitespace-only

  test("matches the plain-Scala reference exactly (micro-nat longs)") {
    val out = TextOps.dsirLogWeights(raw.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"), "doc_id", "text", nBuckets = B)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ref = refLogw(raw, target)
    // whitespace-only doc: vacuous sum = 0 on both sides
    assert(out == ref && out(3L) == 0L, s"out=$out ref=$ref")
  }

  test("target-like docs out-weigh off-target docs") {
    val out = TextOps.dsirLogWeights(raw.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"), "doc_id", "text", nBuckets = B)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(0L) > out(1L),
      s"doc of target tokens must out-weigh unseen-token doc: $out")
  }

  test("logw surfaces micro/1e6 and n_tokens counts the raw split") {
    val out = TextOps.dsirLogWeights(raw.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"), "doc_id", "text", nBuckets = B)
      .filter(col("doc_id") === 0L).collect().head
    assert(out.getLong(1) == 3L)
    assert(out.getDouble(3) == out.getLong(2) / 1e6)
  }

  test("persisted lattice: self-score parity, and novel buckets score " +
    "with the training-time smoothing, not zero") {
    val loc = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_dsirdb LOCATION '$loc'")
    val rawDf = raw.toDF("doc_id", "text")
    val targetDf = target.toDF("doc_id", "text")
    TextOps.writeDsirLattice(rawDf, targetDf, "doc_id", "text",
      "graft_dsirdb.lat", nBuckets = B)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // scoring the training raw corpus against the persisted lattice is
    // bit-identical to the one-shot trainer-scorer
    assert(canon(TextOps.scoreAgainstDsirLattice(spark, "graft_dsirdb.lat",
        rawDf, "doc_id", "text"))
      == canon(TextOps.dsirLogWeights(rawDf, targetDf, "doc_id", "text",
        nBuckets = B)))
    // a batch whose token hashes into a bucket unseen in training gets
    // the smoothed zero-count ratio ln((tr+B)/(tt+B)) per token — find
    // a token whose bucket is outside the trained lattice
    val trained = spark.table("graft_dsirdb.lat")
      .collect().map(_.getLong(0)).toSet
    def bucket(tok: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"f:graft:$tok".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(h, 16) % B
    }
    val novelTok = (0 until 1000).map("novel" + _)
      .find(t => !trained.contains(bucket(t)))
      .getOrElse(fail(s"all $B buckets trained — enlarge B in this test"))
    val meta = spark.table("graft_dsirdb.lat_meta").collect().head
    val got = TextOps.scoreAgainstDsirLattice(spark, "graft_dsirdb.lat",
        Seq((50L, s"$novelTok $novelTok")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().head
    assert(got.getLong(2) == 2 * meta.getLong(2),
      s"novel-bucket doc scored ${got.getLong(2)}, " +
        s"expected 2 x unseen ratio ${meta.getLong(2)}")
  }

  test("every raw doc survives — scoring never drops rows") {
    val out = TextOps.dsirLogWeights(raw.toDF("doc_id", "text"),
      target.toDF("doc_id", "text"), "doc_id", "text", nBuckets = B)
    assert(out.count() == raw.size)
  }

  test("dsirSelectBudget: target-like docs fill the budget first, the " +
    "running sum never exceeds it, greedy order is (logw desc, id)") {
    val rawG = Seq(
      (0L, "alpha beta gamma", "web"),   // target-like
      (1L, "delta epsilon zeta", "web"), // off-target
      (2L, "alpha alpha beta", "web"),   // target-like
      (3L, "eta theta iota kappa", "web"),
      (10L, "alpha beta", "books"),
      (11L, "delta zeta epsilon delta", "books"))
      .toDF("doc_id", "text", "source")
    val sel = TextOps.dsirSelectBudget(rawG,
        target.toDF("doc_id", "text"), "doc_id", "text", "source",
        budgetTokens = 6L, nBuckets = B)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(sel.forall(_._5 <= 6L), s"budget exceeded: ${sel.toSeq}")
    // web budget of 6 tokens fits exactly the two target-like docs
    // (3 + 3); the off-target ones must not appear
    val web = sel.filter(_._1 == "web").map(_._2).toSet
    assert(web == Set(0L, 2L), s"web selection: ${sel.toSeq}")
    // per-group cum is the running n_tokens sum in (logw desc, id) order
    sel.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._5)
      assert(ordered.map(_._3).scanLeft(0L)(_ + _).tail.toSeq
        == ordered.map(_._5).toSeq)
      assert(ordered.map(r => (-r._4, r._2)).toSeq
        == ordered.map(r => (-r._4, r._2)).sorted.toSeq,
        s"not in (logw desc, id) order: ${ordered.toSeq}")
    }
  }
}
