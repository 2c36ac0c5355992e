package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape audit over the query catalog: prints Exchange / parquet-scan
  * / WholeStageCodegen counts per query (the three numbers the 100 TB lens
  * cares about first), plus the full formatted plan when a single query is
  * named. Dev tooling, not part of the shipped library surface.
  *
  * Usage: runMain graft.PlanAudit [sfDir] [q85,q86,...]
  * With one query selected, dumps `explain("formatted")` too.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.lift(1).map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) =>
        names.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val executed = df.queryExecution.executedPlan
        val plan = executed.toString
        val nEx = "Exchange".r.findAllIn(plan).length
        val nScan = "Scan parquet".r.findAllIn(plan).length
        val nWsc = "WholeStageCodegen".r.findAllIn(plan).length
        // a Window with no PARTITION BY serializes the whole relation
        // through one task — the first thing to flag at the 100 TB lens
        val tree = executed match {
          case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => a.initialPlan
          case p => p
        }
        val globalWin = tree.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
        }.size
        val flag = if (globalWin > 0) s"  GLOBAL-WINDOW=$globalWin" else ""
        println(f"$name%-32s exchanges=$nEx%-3d scans=$nScan%-3d codegen=$nWsc%d$flag")
        if (selected.size == 1) df.explain("formatted")
      } catch { case e: Throwable =>
        println(s"$name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
