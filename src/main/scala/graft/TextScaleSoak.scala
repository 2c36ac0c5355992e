package graft

import graft.ext.{Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the round-7 text operators: runs duplicated-span
  * coverage (q100 shape), corpus-trained bigram LM scoring (q103
  * shape), and the hashed-linear quality classifier (q99 shape) on
  * ~10⁶ synthetic documents — 200× the sf0.1 corpus — recording wall
  * time and output sanity. The corpus plants known cross-doc repeats so
  * the span operator does real work (every 5th doc clones a window from
  * its neighbor), and draws tokens from a 50k-word vocabulary so the
  * bigram model relation reaches realistic width instead of collapsing
  * to a toy lattice. Results go to BASELINE.md ("Round-7 text-operator
  * soak").
  *
  * Usage: `sbt 'runMain graft.TextScaleSoak [n]'` (default 1000000).
  */
object TextScaleSoak {

  def soakDocs(spark: SparkSession, n: Long, seed: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, 32).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val rnd = new scala.util.Random(seed ^ id)
        val len = 40 + rnd.nextInt(80)
        val base = Array.fill(len)("w" + rnd.nextInt(50000))
        // every 5th doc carries an exact 6-token window cloned from the
        // previous doc's deterministic stream → guaranteed cross-doc span
        if (id % 5 == 0 && id > 0) {
          val prev = new scala.util.Random(seed ^ (id - 1))
          val plen = 40 + prev.nextInt(80)
          val ptoks = Array.fill(plen)("w" + prev.nextInt(50000))
          System.arraycopy(ptoks, 0, base, 0, 6)
        }
        (id, base.mkString(" "))
      }
    }.toDF("doc_id", "text")
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = soakDocs(spark, n, seed = 7L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = docs.count() // materialize outside any timing window

    val (spanStats, tSpan) = time {
      Dedup.duplicatedSpanStats(docs, "doc_id", "text", n = 6)
        .agg(count(when(col("n_dup_windows") > 0, 1)).as("docs_with_dups"),
          sum(col("dup_cov_tokens")).as("covered"))
        .head()
    }
    val (lmStats, tLm) = time {
      TextOps.bigramLmScore(docs, "doc_id", "text")
        .agg(count(lit(1)).as("rows"),
          avg(col("mean_prob")).as("avg_prob")).head()
    }
    val (qcStats, tQc) = time {
      TextOps.qualityClassifierScore(docs, "text")
        .agg(count(lit(1)).as("rows"),
          count(when(col("kept"), 1)).as("kept")).head()
    }

    // sanity: planted repeats found; every doc scored; classifier split
    assert(spanStats.getLong(0) >= total / 5 - 1,
      s"span soak found ${spanStats.getLong(0)} dup docs, planted ~${total / 5}")
    assert(lmStats.getLong(0) == total && qcStats.getLong(0) == total)

    println(
      s"""{"n":$total,"span_sec":${math.rint(tSpan * 10) / 10},"docs_with_dups":${spanStats.getLong(0)},"lm_sec":${math.rint(tLm * 10) / 10},"avg_prob":${math.rint(lmStats.getDouble(1) * 1e6) / 1e6},"qc_sec":${math.rint(tQc * 10) / 10},"qc_kept":${qcStats.getLong(1)}}""")
    spark.stop()
  }
}
