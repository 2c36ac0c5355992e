package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.QualityModel

/** Dev probe for the q139 trainer's time budget: teacher scoring,
  * feature build + cache, per-step gradient jobs — timed separately so
  * a bench regression can be attributed to the right stage (the
  * catalog query deliberately measures them fused).
  */
object Q139Probe {
  private def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[q139-probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val steps = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm FS / file listing
    val teacher = time("teacher score + materialize") {
      val t = QualityModel.qualityClassifierScore(docs, "text",
          nBuckets = 1024)
        .select(col("doc_id"), col("text"), col("kept").as("label"))
        .localCheckpoint()
      t.count(); t
    }
    time("teacher re-score (warm, no checkpoint)") {
      QualityModel.qualityClassifierScore(docs, "text", nBuckets = 1024)
        .agg(sum(col("logit_milli"))).head
    }
    time("trivial md5 projection baseline") {
      docs.select(conv(substring(md5(col("text")), 1, 8), 16, 10)
        .cast("long").as("h"))
        .agg(sum(col("h"))).head
    }
    time("explode-tokens baseline") {
      docs.select(explode(split(trim(lower(col("text"))), "\\s+"))
        .as("t")).groupBy(col("t")).count().agg(sum("count")).head
    }
    val toksP = explode(split(trim(lower(col("text"))), "\\s+")).as("__tok")
    val bP = conv(substring(md5(concat(lit("f:graft:"), col("__tok"))), 1, 8), 16, 10).cast("long") % 1024
    val st1 = teacher.select(col("doc_id"), col("label"), toksP)
      .select(col("doc_id"), col("label"), bP.as("b"))
    time("feats stage1: explode+bucket count") { st1.agg(count(lit(1))).head }
    val st2 = st1.groupBy(col("doc_id"), col("label"), col("b"))
      .agg(count(lit(1)).as("x"))
    time("feats stage2: +groupBy(id,label,b)") { st2.agg(count(lit(1))).head }
    val st3 = st2.groupBy(col("doc_id"), col("label"))
      .agg(collect_list(struct(col("b"), col("x"))).as("f"))
    time("feats stage3: +collect_list") { st3.agg(count(lit(1))).head }
    time("feats stage3 again (warm)") { st3.agg(count(lit(1))).head }
    time("feats exact: stage3 + cache + census + unpersist") {
      val f = st3.cache()
      val cls = f.groupBy(col("label")).agg(count(lit(1)).as("n")).collect()
      f.unpersist()
      cls.length
    }
    time("feats exact again") {
      val f = st3.cache()
      val cls = f.groupBy(col("label")).agg(count(lit(1)).as("n")).collect()
      f.unpersist()
      cls.length
    }
    for (s <- Seq(1, steps, steps, steps)) {
      time(s"train steps=$s") {
        QualityModel.trainQualityClassifier(teacher, "doc_id", "text",
          "label", nBuckets = 1024, steps = s)
      }
    }
    spark.stop()
  }
}
