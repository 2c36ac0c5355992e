package graft

import graft.ops.Normalize

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val geo = Seq(
    (1001, -46.6, -23.5, "sao paulo", "SP"),
    (1001, -46.7, -23.6, "sao paulo", "SP"),
    (2002, -43.2, -22.9, "rio de janeiro", "RJ"),
    (3003, -47.9, -15.8, "brasilia", "DF")
  ).toDF("geolocation_zip_code_prefix", "geolocation_lng", "geolocation_lat",
    "geolocation_city", "geolocation_state")

  test("dimensionWithSurrogate assigns dense 1-based ids in declared order") {
    val dim = Normalize.dimensionWithSurrogate(
      geo.withColumnRenamed("geolocation_city", "city")
        .withColumnRenamed("geolocation_state", "state"),
      Seq("city", "state"), "city_id")
    val rows = dim.collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((1, "brasilia"), (2, "rio de janeiro"), (3, "sao paulo")))
  }

  test("scalable two-phase surrogate equals the window version exactly") {
    // 500 distinct keys across many input partitions — big enough that the
    // range repartition actually spreads rows over multiple partitions
    val many = (1 to 500)
      .map(i => (f"city_$i%03d", if (i % 2 == 0) "AA" else "BB"))
      .toDF("city", "state").repartition(16)
    val windowed = Normalize.dimensionWithSurrogate(
        many, Seq("city", "state"), "id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    val scalable = Normalize.dimensionWithSurrogateScalable(
        many, Seq("city", "state"), "id", partitions = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(scalable == windowed)
    // and the ids really are dense 1..n
    assert(scalable.map(_._1) == (1 to 500).toSet)
    // no single-partition funnel: the per-partition window keys on __pid
    val plan = Normalize.dimensionWithSurrogateScalable(
      many, Seq("city", "state"), "id", partitions = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"scalable variant still funnels through one partition:\n$plan")
  }

  test("scalable surrogate materializes its partitioning once (no re-sampled range exchange)") {
    // RangePartitioner's sampling seed is derived from the RDD id, so a
    // plan that re-executes the range exchange per action could assign
    // different __pids in the counts job vs the id job → stale offsets.
    // The fix pins the partitioned frame with an eager localCheckpoint:
    // the returned plan must read the materialized RDD, not re-shuffle.
    val many = (1 to 2000)
      .map(i => (f"city_$i%04d", if (i % 3 == 0) "AA" else "BB"))
      .toDF("city", "state").repartition(16)
    val dim = Normalize.dimensionWithSurrogateScalable(
      many, Seq("city", "state"), "id", partitions = 8)
    val plan = dim.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      s"id-assignment job re-executes the range exchange (re-samples bounds):\n$plan")
    // repeated actions on the same frame must agree bit-for-bit
    val first = dim.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    val second = dim.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    assert(first == second)
    assert(first.map(_._1) == (1 to 2000))
  }

  test("splitGeolocation yields 3NF tables with consistent keys") {
    val (cityState, zip, coords) = Normalize.splitGeolocation(geo)
    assert(cityState.columns.toSeq == Seq("city_id", "city", "state"))
    assert(cityState.count() == 3)
    val zipRows = zip.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val cityOf = cityState.collect()
      .map(r => r.getString(1) -> r.getInt(0)).toMap
    assert(zipRows(1001) == cityOf("sao paulo"))
    assert(zipRows(2002) == cityOf("rio de janeiro"))
    // coords keep every distinct (zip, lon, lat)
    assert(coords.count() == 4)
    assert(coords.columns.toSeq == Seq("zip_code", "longitude", "latitude"))
  }
}
