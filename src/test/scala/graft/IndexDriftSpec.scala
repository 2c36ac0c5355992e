package graft

import graft.ext.{IndexAudit, Ivf, Pq}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Drift detection for the persisted ANN indexes — the measured
  * trigger for "the quantizer retrains on its own cadence": appends
  * assign under the FROZEN model, so a corpus whose distribution moved
  * away from the trained centroids must surface as per-list mean-fit
  * decay against the at-build `<table>_health` reference, while
  * in-distribution appends must NOT trip it (the signal is drift, not
  * growth). Also pins the drift/corruption separation: a drifted index
  * still passes the consistency fsck, because its appends honestly
  * used the stored model.
  */
class IndexDriftSpec extends SparkSpec {
  import spark.implicits._

  private def failures(df: DataFrame): Map[String, Long] =
    df.filter(!col("ok")).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap

  private def mkdb(name: String): Unit = {
    val loc = java.nio.file.Files.createTempDirectory(s"graft_$name").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $name LOCATION '$loc'")
  }

  // same-distribution rows carry ids >= base but the SAME cluster
  // structure (CrossoverBench centers repeat every numClusters ids);
  // shifted rows come from a different seed = different centers
  private def sameDist(n: Int, base: Long) =
    CrossoverBench.syntheticEmbeddings(spark, n, 64, seed = 7L)
      .select((col("vec_id") + base).as("vec_id"), col("embedding"))
  private def shifted(n: Int, base: Long) =
    CrossoverBench.syntheticEmbeddings(spark, n, 64, seed = 991L)
      .select((col("vec_id") + base).as("vec_id"), col("embedding"))

  test("IVF drift: clean at build and after in-distribution appends; " +
    "out-of-distribution appends trip it while the consistency fsck " +
    "stays green; rebuild clears it") {
    graft.plans.GraftFunctions.register(spark)
    mkdb("graft_driftdb1")
    val emb = CrossoverBench.syntheticEmbeddings(spark, 2000, 64, seed = 7L)
    val cents = Ivf.trainCentroids(emb, "embedding", nList = 8, dim = 64,
      sampleSize = 1000, iters = 3)
    Ivf.writeIndex(emb, "vec_id", "embedding", cents, dim = 64,
      "graft_driftdb1.ivf", nBuckets = 2)
    assert(failures(IndexAudit.driftIvf(spark, "graft_driftdb1.ivf",
      "vec_id", "embedding")).isEmpty, "fresh index must not drift")

    Ivf.appendToIndex(sameDist(400, 10000L), "vec_id", "embedding",
      "graft_driftdb1.ivf")
    assert(failures(IndexAudit.driftIvf(spark, "graft_driftdb1.ivf",
      "vec_id", "embedding")).isEmpty,
      "in-distribution appends must not trip drift")

    Ivf.appendToIndex(shifted(2000, 20000L), "vec_id", "embedding",
      "graft_driftdb1.ivf")
    val bad = failures(IndexAudit.driftIvf(spark, "graft_driftdb1.ivf",
      "vec_id", "embedding"))
    assert(bad.contains("lists_within_drift_tolerance"), bad)
    // drift is a QUALITY signal, not corruption: consistency stays green
    assert(failures(IndexAudit.auditIvf(spark, "graft_driftdb1.ivf",
      "vec_id", "embedding")).isEmpty,
      "a drifted index must still pass the consistency fsck")

    // the remedy is the documented cadence: one-call retrain + rewrite
    Ivf.rebuildIndex(spark, "graft_driftdb1.ivf", "vec_id", "embedding",
      sampleSize = 1000, iters = 3)
    assert(failures(IndexAudit.driftIvf(spark, "graft_driftdb1.ivf",
      "vec_id", "embedding")).isEmpty, "rebuild must clear drift")
    assert(failures(IndexAudit.auditIvf(spark, "graft_driftdb1.ivf",
      "vec_id", "embedding")).isEmpty, "rebuilt index must fsck clean")
  }

  test("monitored ingest stream: per-batch append + drift report — " +
    "in-distribution batch clean, shifted batch tripped, appends ≡ batch") {
    graft.plans.GraftFunctions.register(spark)
    mkdb("graft_driftdb3")
    val emb = CrossoverBench.syntheticEmbeddings(spark, 2000, 64, seed = 7L)
    val cents = Ivf.trainCentroids(emb, "embedding", nList = 8, dim = 64,
      sampleSize = 1000, iters = 3)
    Ivf.writeIndex(emb, "vec_id", "embedding", cents, dim = 64,
      "graft_driftdb3.ivf", nBuckets = 2)
    val okBatch = sameDist(300, 10000L).localCheckpoint()
    val badBatch = shifted(2000, 20000L).localCheckpoint()
    val byKey = (okBatch.withColumn("__b", lit(0))
      union badBatch.withColumn("__b", lit(1))).localCheckpoint()

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Int]
    val reports = scala.collection.mutable.Map.empty[Long, Map[String, Long]]
    var nextId = 0L
    val query = graft.streaming.EventStreams.indexIngestStream(
        in.toDF().toDF("__b").join(byKey, "__b")
          .select(col("vec_id"), col("embedding")),
        "graft_driftdb3.ivf", "vec_id", "embedding") { (report, _) =>
      reports.synchronized {
        reports(nextId) = failures(report); nextId += 1
      }
    }
    in.addData(0)
    query.processAllAvailable()
    in.addData(1)
    query.processAllAvailable()
    query.stop()
    assert(reports(0L).isEmpty,
      s"in-distribution micro-batch must not trip drift: ${reports(0L)}")
    assert(reports(1L).contains("lists_within_drift_tolerance"),
      s"shifted micro-batch must trip drift: ${reports(1L)}")
    // streamed ingest is the batch append verbatim: every id landed once
    // (refresh first: the appends ran in foreachBatch's cloned session,
    // so this session's file listing is stale)
    spark.catalog.refreshTable("graft_driftdb3.ivf")
    val n = spark.table("graft_driftdb3.ivf").count()
    assert(n == 2000 + 300 + 2000, s"expected 4300 rows, got $n")
    // and the appended rows carry model-consistent assignments
    assert(failures(IndexAudit.auditIvf(spark, "graft_driftdb3.ivf",
      "vec_id", "embedding")).isEmpty)
  }

  test("IVF-PQ drift: the coarse-fit signal covers the pair — shifted " +
    "appends trip it, rebuild clears it") {
    graft.plans.GraftFunctions.register(spark)
    mkdb("graft_driftdb2")
    val emb = CrossoverBench.syntheticEmbeddings(spark, 2000, 64, seed = 7L)
    val coarse = Ivf.trainCentroids(emb, "embedding", nList = 4, dim = 64,
      sampleSize = 1000, iters = 2)
    val cb = Pq.trainCodebooks(emb, "embedding", coarse, m = 8, ksub = 16,
      dim = 64, sampleSize = 500, iters = 2)
    Pq.writeIndex(emb, "vec_id", "embedding", coarse, cb, m = 8, dsub = 8,
      ksub = 16, table = "graft_driftdb2.pq", nBuckets = 2)
    assert(failures(IndexAudit.driftPq(spark, "graft_driftdb2.pq",
      "vec_id", "embedding")).isEmpty)

    Pq.appendToIndex(shifted(2000, 20000L), "vec_id", "embedding",
      "graft_driftdb2.pq")
    assert(failures(IndexAudit.driftPq(spark, "graft_driftdb2.pq",
      "vec_id", "embedding")).contains("lists_within_drift_tolerance"))

    Pq.rebuildIndex(spark, "graft_driftdb2.pq", "vec_id", "embedding",
      sampleSize = 1000, iters = 2)
    assert(failures(IndexAudit.driftPq(spark, "graft_driftdb2.pq",
      "vec_id", "embedding")).isEmpty)
    assert(failures(IndexAudit.auditPq(spark, "graft_driftdb2.pq",
      "vec_id", "embedding")).isEmpty, "rebuilt index must fsck clean")
  }
}
