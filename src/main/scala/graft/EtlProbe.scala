package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object EtlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Unit): Unit = {
      for (r <- 0 until 2) {
        val t0 = System.nanoTime(); f
        println(f"$tag run$r: ${(System.nanoTime()-t0)/1e9}%.3f s")
      }
    }
    spark.range(0, 1000000, 1, 8).selectExpr("sum(id)").collect()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    time("scan noop        ") { li.write.format("noop").mode("overwrite").save() }
    time("scan count       ") { li.selectExpr("count(1)").collect() }
    time("groupBy sum dbl  ") { li.groupBy("l_returnflag","l_linestatus").agg(sum("l_quantity")).write.format("noop").mode("overwrite").save() }
    time("groupBy sum dec  ") { li.groupBy("l_returnflag","l_linestatus").agg(sum(col("l_quantity").cast("decimal(30,12)"))).write.format("noop").mode("overwrite").save() }
    time("q01 full         ") { SparkEntry.queries("q01_pricing_summary")(spark.newSession(), sfDir).write.format("noop").mode("overwrite").save() }
    time("q03 full         ") { SparkEntry.queries("q03_join_revenue_nation")(spark.newSession(), sfDir).write.format("noop").mode("overwrite").save() }
    time("q06 full         ") { SparkEntry.queries("q06_fk_violations")(spark.newSession(), sfDir).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
