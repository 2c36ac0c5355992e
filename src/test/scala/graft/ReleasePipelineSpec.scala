package graft

import graft.streaming.ReleasePipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The curation release run INCREMENTALLY, the way the reference's
  * scheduled loop runs its ETL (etl2.py:462-467): documents arrive in two
  * separate micro-batches through a real file-source streaming query, the
  * per-document stages (contamination gate → PII redaction) run per
  * batch, and the corpus-global release (mixing → shards) runs over the
  * accumulated store. The pin: the released shards are BIT-IDENTICAL to
  * the one-shot batch plan over the union — q96 itself — so incremental
  * operation changes operational shape, never results.
  */
class ReleasePipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** q96's document fixture: benchmark = every 31st doc, the rest
    * augmented with PII on every 13th doc.
    */
  private def fixture: (DataFrame, DataFrame) = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bench = docs.filter(col("doc_id") % 31 === 0)
    val aug = docs.filter(col("doc_id") % 31 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 13 === 0,
          concat(col("text"), lit(" contact: user13@example.com" +
            " via https://ex.example/path from 10.0.0.1")))
          .otherwise(col("text")))
    (bench, aug)
  }

  test("two micro-batches release the same shards as one batch over the union") {
    graft.plans.GraftFunctions.register(spark)
    val (bench, aug) = fixture

    val tmp = java.nio.file.Files.createTempDirectory("release").toString
    val srcDir = s"$tmp/src"
    val curatedDir = s"$tmp/curated"
    val ckptDir = s"$tmp/ckpt"
    new java.io.File(srcDir).mkdirs()

    // seed the source with the FIRST half so the stream has a schema to
    // infer nothing from — ReleasePipeline.start reads it from a sample
    val half1 = aug.filter(col("doc_id") % 2 === 0)
    val half2 = aug.filter(col("doc_id") % 2 =!= 0)
    half1.coalesce(1).write.mode("append").parquet(srcDir)

    val q = ReleasePipeline.start(spark, srcDir,
      schemaSource = s"$sfDir/documents.parquet", bench,
      idCol = "doc_id", textCol = "text",
      curatedDir = curatedDir, checkpointDir = ckptDir,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    val batches = try {
      q.processAllAvailable()
      // second arrival AFTER the first is fully processed → a genuinely
      // separate micro-batch, not one batch that saw both files
      half2.coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      q.recentProgress.count(_.numInputRows > 0)
    } finally q.stop()
    assert(batches >= 2, s"expected two non-empty micro-batches, saw $batches")

    // corpus-global release over the accumulated curated store
    val incremental = ReleasePipeline.release(
        spark.read.parquet(curatedDir), "doc_id", "lang",
        budget = 300L, nShards = 4)
      .collect().map(_.toSeq)

    // the one-shot batch plan over the same corpus: q96 verbatim
    val oneShot = SparkEntry.queries("q96_release_e2e")(spark, sfDir)
      .collect().map(_.toSeq)

    assert(incremental.nonEmpty)
    assert(incremental.toSeq == oneShot.toSeq,
      s"incremental=${incremental.size} rows, one-shot=${oneShot.size} rows")
  }

  test("curate per-batch unions to curate over the union (per-row purity)") {
    // the property the loop's correctness rests on, pinned directly:
    // contamination verdict + redaction are per-document functions of
    // (doc, static bench), so batch boundaries cannot change them
    graft.plans.GraftFunctions.register(spark)
    val (bench, aug) = fixture
    val half1 = aug.filter(col("doc_id") % 2 === 0)
    val half2 = aug.filter(col("doc_id") % 2 =!= 0)
    def canon(df: DataFrame): Seq[Seq[Any]] =
      df.select(col("doc_id"), col("text_redacted"))
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    val perBatch = canon(ReleasePipeline.curate(half1, "doc_id", "text", bench)
      .unionByName(ReleasePipeline.curate(half2, "doc_id", "text", bench)))
    val union = canon(ReleasePipeline.curate(aug, "doc_id", "text", bench))
    assert(perBatch == union)
  }
}
