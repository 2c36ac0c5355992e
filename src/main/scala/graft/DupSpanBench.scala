package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the duplicated-span dup-decision formulations against each
  * other on the real documents corpus: the shipped keyed-window form
  * (`min(doc) != max(doc)` over the window key — ONE corpus explode, one
  * key exchange) vs the aggregate + semi-join-back form it replaced (a
  * count-distinct per key PLUS a second explode feeding the join probe).
  * Both produce the identical duplicated-start relation (asserted every
  * run); the difference is plan shape. Results recorded in BASELINE.md.
  *
  * Usage: `sbt 'runMain graft.DupSpanBench [sfDir]'` (default sf0.1).
  */
object DupSpanBench {

  import BenchUtil.time

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = 3
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // the SHIPPED extraction + dup decision, by reference — the bench
    // measures the operator's actual code, not a copy that can drift
    def windows: DataFrame =
      graft.ext.Dedup.spanWindows(docs, "doc_id", "text", n)
    def windowForm: DataFrame =
      graft.ext.Dedup.duplicatedStarts(windows, "doc_id")

    // replaced: count-distinct aggregate + semi-join back (second explode)
    def joinForm: DataFrame = {
      val dupKeys = windows.groupBy(col("__k"))
        .agg(countDistinct(col("doc_id")).as("__nd"))
        .filter(col("__nd") > 1).select(col("__k"))
      windows.join(dupKeys, Seq("__k"), "left_semi")
    }

    def run(df: => DataFrame): Double = {
      val times = (1 to 3).map { _ =>
        System.gc()
        time(df.write.format("noop").mode("overwrite").save())._2
      }.sorted
      times(1) // median
    }

    // identical result relation (cheap count + anti-join emptiness probe)
    val w = windowForm.select("doc_id", "__i")
    val j = joinForm.select("doc_id", "__i")
    assert(w.count() == j.count() &&
      w.except(j).isEmpty && j.except(w).isEmpty,
      "formulations disagree")

    val tw = run(windowForm)
    val tj = run(joinForm)
    println(f"""{"sf":"$sfDir","window_sec":$tw%.3f,"agg_join_sec":$tj%.3f,"speedup":${tj / tw}%.2f}""")
    spark.stop()
  }
}
