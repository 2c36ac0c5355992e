package graft

import graft.ext.Sketches
import org.apache.spark.sql.functions._

/** The shard-sketch distinct index: accuracy, merge-losslessness,
  * persistence, and incremental composition. These four properties are
  * what make the index trustworthy at 100 TB — any subset of shards can
  * be answered from KB-sized sketches with a known error bound, and
  * ingest batches compose without re-scanning history.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, shards: Int, dupEvery: Int = 10) =
    spark.range(n).select(
      (col("id") % shards).cast("string").as("shard"),
      // every dupEvery-th key repeats its predecessor → exact distinct
      // is knowable: n - n/dupEvery
      md5(concat(lit("k"), (col("id") - when(col("id") % dupEvery === 0, 1)
        .otherwise(0)).cast("string"))).as("key"))

  test("per-shard and union estimates within 5% of exact") {
    val df = corpus(100000, 8).cache()
    val sk = Sketches.distinctSketches(df, "key", "shard").cache()
    val perShard = Sketches.estimatePerShard(sk)
      .select("shard", "est_distinct").as[(String, Long)].collect().toMap
    val exactPerShard = df.groupBy("shard")
      .agg(countDistinct("key").as("d")).as[(String, Long)].collect().toMap
    exactPerShard.foreach { case (s, exact) =>
      val est = perShard(s)
      assert(math.abs(est - exact).toDouble / exact <= 0.05,
        s"shard $s: est $est vs exact $exact")
    }
    val union = Sketches.estimateUnion(sk)
      .select("est_distinct").as[Long].head()
    val exact = df.select(countDistinct("key")).as[Long].head()
    assert(math.abs(union - exact).toDouble / exact <= 0.05,
      s"union est $union vs exact $exact")
  }

  test("union of shard sketches is lossless: equals a one-shot global sketch") {
    val df = corpus(50000, 16).cache()
    val viaShards = Sketches.estimateUnion(
        Sketches.distinctSketches(df, "key", "shard"))
      .select("est_distinct").as[Long].head()
    val oneShot = df.agg(
        hll_sketch_estimate(hll_sketch_agg(col("key"), lit(Sketches.DefaultLgK)))
          .as("est"))
      .as[Long].head()
    assert(viaShards == oneShot,
      s"sharded union $viaShards != one-shot $oneShot")
  }

  test("persisted index round-trips and answers without the corpus") {
    val df = corpus(20000, 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch_").toString
    Sketches.writeDistinctSketches(df, "key", "shard", dir)
    val back = Sketches.readSketches(spark, dir)
    val live = Sketches.estimatePerShard(
        Sketches.distinctSketches(df, "key", "shard"))
      .select("shard", "est_distinct").as[(String, Long)].collect().toSet
    val persisted = Sketches.estimatePerShard(back)
      .select("shard", "est_distinct").as[(String, Long)].collect().toSet
    assert(persisted == live)
    // n_rows rides along so the index also answers totals
    assert(back.agg(sum("n_rows")).as[Long].head() == 20000L)
  }

  test("append-accumulated index answers identically to a one-shot index") {
    val full = corpus(30000, 5).cache()
    val dir = java.nio.file.Files.createTempDirectory("graft_sk_app_").toString
    // three ingest batches append rows to the same index path
    Seq(0, 1, 2).foreach { b =>
      Sketches.appendDistinctSketches(
        full.filter(abs(xxhash64(col("key"))) % 3 === b), "key", "shard", dir)
    }
    val accumulated = Sketches.estimatePerShard(
        Sketches.readSketches(spark, dir))
      .select("shard", "n_rows", "est_distinct")
      .as[(String, Long, Long)].collect().toSet
    val oneShot = Sketches.estimatePerShard(
        Sketches.distinctSketches(full, "key", "shard"))
      .select("shard", "n_rows", "est_distinct")
      .as[(String, Long, Long)].collect().toSet
    assert(accumulated == oneShot)
  }

  test("streaming sketch maintenance: streamed index ≡ one-shot sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val dir = java.nio.file.Files.createTempDirectory("graft_sk_str_").toString
    val q = graft.streaming.EventStreams.distinctSketchStream(
      in.toDF().toDF("shard", "key"), "key", "shard", dir)
    try {
      in.addData((0 until 4000).map(i => (s"s${i % 3}", s"k${i % 1500}")): _*)
      q.processAllAvailable()
      in.addData((0 until 4000).map(i => (s"s${i % 3}", s"k${i % 2500}")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = Sketches.estimateUnion(Sketches.readSketches(spark, dir))
      .select("est_distinct", "n_rows").as[(Long, Long)].head()
    val all = (0 until 4000).map(i => (s"s${i % 3}", s"k${i % 1500}")) ++
      (0 until 4000).map(i => (s"s${i % 3}", s"k${i % 2500}"))
    val oneShot = Sketches.estimateUnion(
        Sketches.distinctSketches(all.toDF("shard", "key"), "key", "shard"))
      .select("est_distinct", "n_rows").as[(Long, Long)].head()
    assert(streamed == oneShot, s"streamed $streamed != one-shot $oneShot")
    assert(streamed._2 == 8000L)
  }

  test("streaming cms maintenance: streamed merged probe ≡ one-shot, bit-exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    graft.plans.GraftFunctions.register(spark)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val dir = java.nio.file.Files.createTempDirectory("graft_cms_str_").toString
    val q = graft.streaming.EventStreams.cmsSketchStream(
      in.toDF().toDF("shard", "key"), "key", "shard", dir)
    try {
      in.addData((0 until 3000).map(i => (s"s${i % 2}", (i % 70).toLong)): _*)
      q.processAllAvailable()
      in.addData((0 until 3000).map(i => (s"s${i % 2}", (i % 110).toLong)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.ext.Sketches.cmsCollectMerged(
      graft.ext.Sketches.readSketches(spark, dir))
    val all = (0 until 3000).map(i => (s"s${i % 2}", (i % 70).toLong)) ++
      (0 until 3000).map(i => (s"s${i % 2}", (i % 110).toLong))
    val oneShot = graft.ext.Sketches.cmsCollectMerged(
      graft.ext.Sketches.cmsSketches(all.toDF("shard", "key"), "key", "shard"))
    // counter addition: the merged binaries are identical, not merely
    // estimate-equal
    assert(java.util.Arrays.equals(streamed, oneShot))
    // and the probe gives exact counts at this cardinality
    val est = spark.range(70).select(col("id").as("key"))
      .select(col("key"),
        graft.ext.Sketches.cmsEstimate(col("key"), streamed).as("est"))
      .as[(Long, Long)].collect().toMap
    val exact = all.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    (0L until 70L).foreach { k =>
      assert(est(k) >= exact(k), s"key $k underestimated") }
  }

  test("overlapEstimate: inclusion-exclusion within 5% of the union size") {
    // A = keys 0..59999, B = keys 40000..99999 → overlap 20000, union 100000
    val a = spark.range(60000).select(lit("s").as("shard"),
      md5(col("id").cast("string")).as("key"))
    val b = spark.range(40000, 100000).select(lit("s").as("shard"),
      md5(col("id").cast("string")).as("key"))
    val est = Sketches.overlapEstimate(
        Sketches.distinctSketches(a, "key", "shard"),
        Sketches.distinctSketches(b, "key", "shard"))
      .select("est_overlap").as[Long].head()
    // error scales with |A∪B| (100k): ±5% of the union is the honest bound
    assert(math.abs(est - 20000L) <= 5000L, s"overlap est $est vs 20000")
    // disjoint corpora: estimate clamps at 0, never negative
    val c = spark.range(1000).select(lit("s").as("shard"),
      md5(concat(lit("x"), col("id").cast("string"))).as("key"))
    val d = spark.range(1000).select(lit("s").as("shard"),
      md5(concat(lit("y"), col("id").cast("string"))).as("key"))
    val dis = Sketches.overlapEstimate(
        Sketches.distinctSketches(c, "key", "shard"),
        Sketches.distinctSketches(d, "key", "shard"))
      .select("est_overlap").as[Long].head()
    assert(dis >= 0L && dis <= 100L, s"disjoint overlap est $dis")
  }

  test("cms: one-sided error within eps*N, and shard merge is exact") {
    graft.plans.GraftFunctions.register(spark)
    // skewed keys: key = isqrt(id) → key k appears ~2k+1 times
    val df = spark.range(100000).select(
      (col("id") % 8).cast("string").as("shard"),
      floor(sqrt(col("id"))).cast("long").as("key")).cache()
    val eps = 0.001
    val shards = graft.ext.Sketches.cmsSketches(df, "key", "shard", eps = eps)
      .cache()
    val merged = graft.ext.Sketches.cmsCollectMerged(shards)
    val oneShot = graft.ext.Sketches.cmsCollectMerged(
      graft.ext.Sketches.cmsSketches(
        df.withColumn("shard", lit("all")), "key", "shard", eps = eps))
    val exact = df.groupBy("key").agg(count(lit(1)).as("exact"))
    val probed = exact.select(col("key"), col("exact"),
        graft.ext.Sketches.cmsEstimate(col("key"), merged).as("est"),
        graft.ext.Sketches.cmsEstimate(col("key"), oneShot).as("est_one"))
      .as[(Long, Long, Long, Long)].collect()
    val bound = math.ceil(eps * 100000).toLong
    probed.foreach { case (k, ex, est, estOne) =>
      assert(est >= ex, s"key $k: CMS underestimated ($est < $ex)")
      assert(est <= ex + bound, s"key $k: overshoot $est vs $ex (+$bound)")
      // counter addition: merged-shard estimates ≡ one-shot estimates
      assert(est == estOne, s"key $k: merged $est != one-shot $estOne")
    }
  }

  test("cms persisted index round-trips and probes without the corpus") {
    graft.plans.GraftFunctions.register(spark)
    val df = spark.range(5000).select(
      (col("id") % 4).cast("string").as("shard"),
      (col("id") % 100).as("key"))
    val dir = java.nio.file.Files.createTempDirectory("graft_cms_").toString
    graft.ext.Sketches.writeCmsSketches(df, "key", "shard", dir)
    val merged = graft.ext.Sketches.cmsCollectMerged(
      graft.ext.Sketches.readSketches(spark, dir))
    // every key appears exactly 50 times; CMS never underestimates and
    // at this tiny cardinality should be exact
    val probes = spark.range(100).select(col("id").as("key"))
      .select(col("key"), graft.ext.Sketches.cmsEstimate(col("key"), merged)
        .as("est"))
      .as[(Long, Long)].collect()
    probes.foreach { case (k, est) => assert(est == 50L, s"key $k: $est") }
  }

  test("incremental ingest composes: batch sketches union to the full estimate") {
    val full = corpus(60000, 6).cache()
    val b1 = full.filter(xxhash64(col("key")) % 2 === 0)
    val b2 = full.filter(xxhash64(col("key")) % 2 =!= 0)
    val sk1 = Sketches.distinctSketches(b1, "key", "shard")
    val sk2 = Sketches.distinctSketches(b2, "key", "shard")
    val merged = Sketches.estimateUnion(sk1.unionByName(sk2))
      .select("est_distinct").as[Long].head()
    val oneShot = Sketches.estimateUnion(
        Sketches.distinctSketches(full, "key", "shard"))
      .select("est_distinct").as[Long].head()
    assert(merged == oneShot,
      s"incremental $merged != one-shot $oneShot")
  }
}
