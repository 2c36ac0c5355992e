package graft

import graft.ext.{QualityModel, TextOps}
import org.apache.spark.sql.functions._

/** In-engine quality-classifier training: bit-level agreement with an
  * independent plain-Scala replay of the gradient loop, real learning
  * on a planted separable corpus (teacher labels from the EXISTING
  * md5-weight scorer), and the train → serve round-trip through
  * `qualityClassifierScoreWith`.
  */
class QualityTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala replay of trainQualityClassifier: same tokenization,
    * same md5 feature hash, same balanced hard-sigmoid gradient with
    * truncating division everywhere (Scala `/` ≡ Spark `div` ≡ DuckDB
    * integer `//` — all toward zero).
    */
  private def refTrain(docs: Seq[(Long, String, Boolean)], nBuckets: Int,
                       steps: Int, lrPpm: Long,
                       init: Option[Seq[Long]] = None): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(tok: String): Int = {
      val hex = md.digest(s"f:graft:$tok".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % nBuckets).toInt
    }
    val feats = docs.map { case (_, text, label) =>
      val toks = text.trim.toLowerCase.split("\\s+", -1).toSeq
      (label, toks.groupBy(bucket).map { case (b, g) => b -> g.size.toLong })
    }
    val nPos = feats.count(_._1)
    val nNeg = feats.size - nPos
    val nDocs = feats.size.toLong
    val cwPos = 1000L * nDocs / (2L * nPos)
    val cwNeg = 1000L * nDocs / (2L * nNeg)
    val w = init.map(_.toArray).getOrElse(new Array[Long](nBuckets))
    for (k <- 1 to steps) {
      val g = new Array[Long](nBuckets)
      feats.foreach { case (label, x) =>
        val z = x.map { case (b, c) => w(b) * c }.sum
        val p = math.max(0L, math.min(1000000L, 500000L + z / 4))
        val err = ((if (label) 1000000L else 0L) - p) *
          (if (label) cwPos else cwNeg)
        x.foreach { case (b, c) => g(b) += err * c }
      }
      val lrK = lrPpm / k
      for (b <- 0 until nBuckets)
        w(b) += lrK * g(b) / (1000000000L * nDocs)
    }
    w
  }

  private val seed: Seq[(Long, String, Boolean)] = Seq(
    (0L, "alpha beta gamma delta alpha", true),
    (1L, "beta gamma epsilon zeta", true),
    (2L, "noise junk spam junk spam", false),
    (3L, "alpha delta eta theta beta", true),
    (4L, "spam noise clutter spam", false),
    (5L, "gamma eta iota kappa", true),
    (6L, "junk clutter noise junk noise", false),
    (7L, "delta kappa lambda mu alpha", true),
    (8L, "", true),
    (9L, "spam junk clutter noise spam junk", false))

  test("trainQualityClassifier equals the plain-Scala replay " +
    "bit-for-bit (incl. an empty document)") {
    val df = seed.toDF("doc_id", "text", "label")
    val got = QualityModel.trainQualityClassifier(df, "doc_id", "text", "label",
      nBuckets = 32, steps = 3, lrPpm = 400000L)
    val want = refTrain(seed, nBuckets = 32, steps = 3, lrPpm = 400000L)
    assert(got.toSeq == want.toSeq)
    assert(got.exists(_ != 0L), "training moved no weight at all")
  }

  test("training requires both classes (single-class seed fails loudly)") {
    val df = seed.filter(_._3).toDF("doc_id", "text", "label")
    val ex = intercept[IllegalArgumentException] {
      QualityModel.trainQualityClassifier(df, "doc_id", "text", "label",
        nBuckets = 32, steps = 1)
    }
    assert(ex.getMessage.contains("both classes"))
  }

  test("persisted model round-trip: write → load → serve is " +
    "bit-identical to scoring with the in-memory lattice, batch and " +
    "stream") {
    val df = seed.toDF("doc_id", "text", "label")
    val w = QualityModel.trainQualityClassifier(df, "doc_id", "text", "label",
      nBuckets = 32, steps = 3, lrPpm = 400000L)
    val loc = java.nio.file.Files.createTempDirectory("graft_qm").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_qmdb LOCATION '$loc'")
    QualityModel.writeQualityModel(spark, "graft_qmdb.model", w.toSeq)
    val (w2, salt2) = QualityModel.loadQualityModel(spark, "graft_qmdb.model")
    assert(w2.toSeq == w.toSeq && salt2 == "graft")
    val direct = QualityModel.qualityClassifierScoreWith(df, "text", w.toSeq)
      .collect().map(_.toSeq)
    val served = QualityModel.qualityClassifierScoreIndexed(spark,
      "graft_qmdb.model", df, "text").collect().map(_.toSeq)
    assert(served.toSeq == direct.toSeq)
    // streaming serve: union of 2 micro-batches ≡ one scoring pass
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val query = graft.streaming.EventStreams.qualityScoreStream(
        in.toDF().toDF("doc_id", "text"), "graft_qmdb.model", "text") {
      (batch, _) => acc.synchronized { acc ++= batch.collect().map(_.toSeq) }
    }
    in.addData((0L, "alpha beta gamma"), (1L, "spam junk"))
    query.processAllAvailable()
    in.addData((2L, "noise clutter delta"))
    query.processAllAvailable()
    query.stop()
    val oneShot = QualityModel.qualityClassifierScoreIndexed(spark,
        "graft_qmdb.model",
        Seq((0L, "alpha beta gamma"), (1L, "spam junk"),
          (2L, "noise clutter delta")).toDF("doc_id", "text"), "text")
      .collect().map(_.toSeq)
    assert(acc.toSet == oneShot.toSet && acc.size == 3)
  }

  test("warm-start training continues from the given lattice and " +
    "equals the replay; streamed model refreshes equal sequential " +
    "batch refreshes") {
    val df = seed.toDF("doc_id", "text", "label")
    val w1 = QualityModel.trainQualityClassifier(df, "doc_id", "text", "label",
      nBuckets = 32, steps = 2, lrPpm = 400000L)
    val warm = QualityModel.trainQualityClassifier(df, "doc_id", "text", "label",
      nBuckets = 32, steps = 2, lrPpm = 400000L, init = Some(w1.toSeq))
    assert(warm.toSeq ==
      refTrain(seed, 32, 2, 400000L, Some(w1.toSeq)).toSeq)
    assert(warm.toSeq != w1.toSeq, "warm start moved nothing")

    // two persisted copies of the same starting model: one refreshed by
    // a STREAM of two labeled batches, one by the same refreshes in
    // batch — final lattices must agree exactly
    val loc = java.nio.file.Files.createTempDirectory("graft_qr").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_qrdb LOCATION '$loc'")
    QualityModel.writeQualityModel(spark, "graft_qrdb.stream", w1.toSeq)
    QualityModel.writeQualityModel(spark, "graft_qrdb.batch", w1.toSeq)
    val b1 = Seq((20L, "alpha beta fresh", true),
      (21L, "junk clutter fresh", false))
    val b2 = Seq((22L, "gamma delta update", true),
      (23L, "spam noise update", false),
      (24L, "beta kappa", true))
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Boolean)]
    val query = graft.streaming.EventStreams.qualityModelRefreshStream(
        in.toDF().toDF("doc_id", "text", "label"), "graft_qrdb.stream",
        "doc_id", "text", "label") { (_, _) => () }
    in.addData(b1: _*)
    query.processAllAvailable()
    in.addData(b2: _*)
    query.processAllAvailable()
    query.stop()
    QualityModel.refreshQualityModel(spark, "graft_qrdb.batch",
      b1.toDF("doc_id", "text", "label"), "doc_id", "text", "label")
    QualityModel.refreshQualityModel(spark, "graft_qrdb.batch",
      b2.toDF("doc_id", "text", "label"), "doc_id", "text", "label")
    val (ws, _) = QualityModel.loadQualityModel(spark, "graft_qrdb.stream")
    val (wb, _) = QualityModel.loadQualityModel(spark, "graft_qrdb.batch")
    assert(ws.toSeq == wb.toSeq)
    assert(ws.toSeq != w1.toSeq, "refreshes moved nothing")
  }

  test("property: trainer equals the plain-Scala replay on random " +
    "corpora (random vocab draws, random labels, both classes)") {
    val rnd = new scala.util.Random(20260814L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "spam",
      "junk", "noise", "x1", "y2", "z3")
    for (trial <- 1 to 5) {
      val docs = (0 until 12).map { i =>
        val n = 1 + rnd.nextInt(9)
        val text = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        // alternate labels so both classes always exist
        (i.toLong, text, i % 2 == 0 || rnd.nextBoolean())
      }
      val lr = 100000L + rnd.nextInt(400000)
      val steps = 1 + rnd.nextInt(4)
      val nb = Seq(8, 16, 64)(rnd.nextInt(3))
      val got = QualityModel.trainQualityClassifier(docs.toDF("doc_id", "text",
        "label"), "doc_id", "text", "label", nb, steps, lr)
      val want = refTrain(docs, nb, steps, lr)
      assert(got.toSeq == want.toSeq,
        s"trial $trial diverged (nb=$nb steps=$steps lr=$lr)")
    }
  }

  test("on the planted separable corpus (teacher = the existing " +
    "md5-weight scorer) training beats the majority class and the " +
    "trained lattice serves through qualityClassifierScoreWith") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val teacher = QualityModel.qualityClassifierScore(docs, "text")
      .select(col("doc_id"), col("text"), col("kept").as("label"))
    val w = QualityModel.trainQualityClassifier(teacher, "doc_id", "text",
      "label")
    val scored = QualityModel.qualityClassifierScoreWith(teacher, "text", w.toSeq)
      .select(col("doc_id"), col("label"), col("kept"), col("logit_micro"))
      .collect()
    val n = scored.length
    val majority = math.max(scored.count(_.getBoolean(1)),
      n - scored.count(_.getBoolean(1)))
    val correct = scored.count(r => r.getBoolean(1) == r.getBoolean(2))
    assert(correct > majority,
      s"trained accuracy $correct/$n does not beat majority $majority")
    // the serve path's decision is exactly sign(logit): the trained
    // lattice plugs into the stock inference operator unchanged
    scored.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(3) >= 0L), r.toString)
    }
  }
}
