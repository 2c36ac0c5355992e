package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** graft_top_k: the bounded partial-combinable top-k-per-group aggregate.
  * Pins (a) exact equality with the window formulation it replaces,
  * (b) deterministic tie-breaks, (c) null skipping, (d) the partial-merge
  * path across many input partitions, and (e) the plan property that
  * justifies it — no Window operator, object-hash aggregation instead.
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  graft.plans.GraftFunctions.register(spark)

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(call_function("graft_top_k", col("v"), col("id"), lit(k)).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("s.payload").as("id"), col("s.ord").as("v"))

  private def windowed(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("g", "rank", "id", "v")
  }

  test("equals the window formulation on many-partition random data") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 5000L).map(i =>
      (s"g${i % 7}", i, rnd.nextInt(1000).toDouble))
    val df = rows.toDF("g", "id", "v").repartition(16)
    val got = topk(df, 5).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = windowed(df, 5).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == want)
    assert(got.size == 35) // 7 groups x 5
  }

  test("ties break ascending on payload — deterministic across runs") {
    // every row has the same score: top-3 must be the 3 smallest ids
    val df = (1L to 100L).map(i => ("g", i, 1.0)).toDF("g", "id", "v")
      .repartition(8)
    val got = topk(df, 3).select("id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("null ord or payload rows are skipped, not ranked") {
    val df = Seq(
      ("g", Some(1L), Some(5.0)), ("g", Some(2L), None),
      ("g", None, Some(9.0)), ("g", Some(3L), Some(4.0))
    ).toDF("g", "id", "v")
    val got = topk(df, 5).select("id").as[Long].collect().toSeq
    assert(got == Seq(1L, 3L))
  }

  test("groups smaller than k return all their rows, still ordered") {
    val df = Seq(("a", 1L, 2.0), ("a", 2L, 7.0), ("b", 3L, 1.0))
      .toDF("g", "id", "v")
    val got = topk(df, 10).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    assert(got == Seq(("a", 1, 2L), ("a", 2, 1L), ("b", 1, 3L)))
  }

  test("string payloads rank with binary collation tie-breaks") {
    val df = Seq(("g", "b", 1.0), ("g", "a", 1.0), ("g", "c", 2.0))
      .toDF("g", "id", "v")
    val got = df.groupBy("g")
      .agg(call_function("graft_top_k", col("v"), col("id"), lit(2)).as("top"))
      .select(explode(col("top.payload")).as("id")).as[String].collect().toSeq
    assert(got == Seq("c", "a"))
  }

  test("NaN scores rank first (window semantics) and tie-break by payload") {
    // descending double order places NaN above every value in both the
    // window sort and Double.compare; with k=2 and three NaN rows, the
    // payload tie-break must pick the two smallest ids even when the
    // NaN threshold is already set (the regression the Double.compare
    // threshold gate fixed)
    // 6 rows in one partition with k=2: the buffer prunes at 4, so at
    // least two rows arrive AFTER the NaN threshold is in place,
    // whatever order the repartition delivers them in
    val df = Seq(
      ("g", 7L, Double.NaN), ("g", 3L, Double.NaN), ("g", 5L, Double.NaN),
      ("g", 9L, Double.NaN), ("g", 11L, Double.NaN), ("g", 1L, 99.0)
    ).toDF("g", "id", "v").repartition(1)
    val got = topk(df, 2).select("id").as[Long].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy(col("v").desc, col("id").asc)
    val want = df.withColumn("r", row_number().over(w)).filter(col("r") <= 2)
      .orderBy("r").select("id").as[Long].collect().toSeq
    assert(got == want)
    assert(got == Seq(3L, 5L))
  }

  test("struct payloads rank whole rows — no join-back to recover columns") {
    val rnd = new scala.util.Random(21)
    val df = (1L to 2000L).map { i =>
      (s"g${i % 4}", i, s"name_$i", rnd.nextInt(50).toDouble)
    }.toDF("g", "id", "name", "v").repartition(12)
    val got = df.groupBy("g")
      .agg(call_function("graft_top_k",
        col("v"), struct(col("id"), col("name")), lit(3)).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("s.payload.id").as("id"), col("s.payload.name").as("name"),
        col("s.ord").as("v"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
      .toSet
    // reference: window ordered by (v DESC, id ASC, name ASC) — the
    // struct's field-wise lexicographic tie-break over (id, name)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy(col("v").desc, col("id").asc, col("name").asc)
    val want = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("g", "rank", "id", "name", "v").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
      .toSet
    assert(got == want)
    assert(got.size == 12)
  }

  test("struct payload null fields sort first in the tie-break") {
    val df = Seq(
      ("g", Some(5L), "b", 1.0),
      ("g", None, "a", 1.0), // null id: wins the tie under null-first
      ("g", Some(2L), "c", 1.0)
    ).toDF("g", "id", "name", "v")
    val got = df.groupBy("g")
      .agg(call_function("graft_top_k",
        col("v"), struct(col("id"), col("name")), lit(2)).as("top"))
      .select(explode(col("top.payload.name")).as("name"))
      .as[String].collect().toSeq
    assert(got == Seq("a", "c"))
  }

  test("streaming top-k snapshots converge to the batch aggregate") {
    import graft.streaming.{ScoredEvent, TopKSnapshot, TopKStream}
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val all = (1L to 2000L).map(i =>
      ScoredEvent(s"k${i % 5}", rnd.nextInt(10000).toDouble, i))
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[ScoredEvent]
    val q = TopKStream.topk(in.toDS(), k = 4)
      .writeStream.format("memory").queryName("topk_snap")
      .outputMode("update").start()
    try {
      all.grouped(700).foreach { b =>
        in.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      }
      val snaps = spark.table("topk_snap").as[TopKSnapshot].collect()
      // the latest leaderboard per key = its max-n_seen snapshot
      val latest = snaps.groupBy(_.key).map { case (key, rows) =>
        val maxSeen = rows.map(_.n_seen).max
        key -> rows.filter(_.n_seen == maxSeen).sortBy(_.rank)
          .map(s => (s.rank, s.ord, s.payload)).toSeq
      }
      // batch reference: graft_top_k over everything ever streamed
      val ref = topk(
          all.map(e => (e.key, e.payload, e.ord)).toDF("g", "id", "v"), 4)
        .collect()
        .map(r => (r.getString(0), (r.getInt(1), r.getDouble(3), r.getLong(2))))
        .groupBy(_._1).map { case (key, rows) =>
          key -> rows.map(_._2).sortBy(_._1).toSeq
        }
      assert(latest == ref)
      assert(latest.size == 5)
    } finally q.stop()
  }

  test("streaming struct-payload top-k converges to graft_top_k over struct(id, label)") {
    import graft.streaming.{ScoredRecord, TopKRecordSnapshot, TopKStream}
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(13)
    // coarse scores force payload tie-breaks through the struct order
    val all = (1L to 1500L).map(i =>
      ScoredRecord(s"k${i % 4}", rnd.nextInt(40).toDouble, i, s"name_$i"))
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[ScoredRecord]
    val q = TopKStream.topkRecords(in.toDS(), k = 3)
      .writeStream.format("memory").queryName("topk_rec_snap")
      .outputMode("update").start()
    try {
      all.grouped(400).foreach { b =>
        in.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      }
      val snaps = spark.table("topk_rec_snap").as[TopKRecordSnapshot].collect()
      val latest = snaps.groupBy(_.key).map { case (key, rows) =>
        val maxSeen = rows.map(_.n_seen).max
        key -> rows.filter(_.n_seen == maxSeen).sortBy(_.rank)
          .map(s => (s.rank, s.ord, s.id, s.label)).toSeq
      }
      // batch reference: the aggregate with the same struct payload
      val ref = all.map(e => (e.key, e.id, e.label, e.ord))
        .toDF("g", "id", "name", "v")
        .groupBy("g")
        .agg(call_function("graft_top_k",
          col("v"), struct(col("id"), col("name")), lit(3)).as("top"))
        .select(col("g"), posexplode(col("top")).as(Seq("pos", "s")))
        .select(col("g"), (col("pos") + 1).as("rank"), col("s.ord"),
          col("s.payload.id"), col("s.payload.name"))
        .collect()
        .map(r => (r.getString(0),
          (r.getInt(1), r.getDouble(2), r.getLong(3), r.getString(4))))
        .groupBy(_._1).map { case (key, rows) =>
          key -> rows.map(_._2).sortBy(_._1).toSeq
        }
      assert(latest == ref)
      assert(latest.size == 4)
    } finally q.stop()
  }

  test("shared order: JVM string comparison matches UTF8String binary order") {
    import graft.plans.TopKOrder
    import org.apache.spark.unsafe.types.UTF8String
    // U+FFFF vs U+1F600: UTF-16 code-unit order (String.compareTo) says
    // "￿" > "😀" because surrogates sit at 0xD800..0xDFFF; binary
    // UTF-8 (= code point) order — what UTF8String sorts with — says the
    // opposite. The JVM comparator must agree with the aggregate's.
    val cases = Seq(("￿", "😀"), ("a", "b"), ("b", "a"),
      ("abc", "ab"), ("", "a"), ("é", "z"), ("same", "same"))
    cases.foreach { case (x, y) =>
      val jvm = TopKOrder.jvmCompare(x, y)
      val cat = UTF8String.fromString(x).compareTo(UTF8String.fromString(y))
      assert(math.signum(jvm) == math.signum(cat),
        s"order mismatch on ($x, $y): jvm=$jvm catalyst=$cat")
    }
    assert(TopKOrder.jvmCompare("￿", "😀") < 0)
    assert("￿".compareTo("😀") > 0) // the trap being avoided
    // Product payloads: field-wise with null-first, same as the struct rule
    assert(TopKOrder.jvmCompare((1L, "a"), (1L, "b")) < 0)
    assert(TopKOrder.jvmCompare((2L, "a"), (1L, "z")) > 0)
    assert(TopKOrder.jvmCompare((1L, null), (1L, "a")) < 0)
  }

  test("plan has NO window operator: object-hash aggregate with partial combine") {
    val df = (1L to 1000L).map(i => (s"g${i % 3}", i, i.toDouble))
      .toDF("g", "id", "v").repartition(4)
    val plan = topk(df, 5).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window sort crept back in:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"expected object-hash aggregation:\n$plan")
    // partial + final pair => map-side combine before the exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
  }
}
