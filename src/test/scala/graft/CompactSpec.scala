package graft

import java.nio.file.Files

import graft.io.Compact
import org.apache.spark.sql.functions._

class CompactSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def partFiles(path: String): Seq[java.io.File] =
    new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
      .toSeq

  test("fileCountFor rounds up and never returns zero") {
    assert(Compact.fileCountFor(0L, 100L) == 1)
    assert(Compact.fileCountFor(1L, 100L) == 1)
    assert(Compact.fileCountFor(100L, 100L) == 1)
    assert(Compact.fileCountFor(101L, 100L) == 2)
    assert(Compact.fileCountFor(1000L, 100L) == 10)
    intercept[IllegalArgumentException](Compact.fileCountFor(10L, 0L))
  }

  test("compaction preserves content and produces the planned file count") {
    val df = spark.range(0, 10000).select(
      col("id"), (col("id") % 97).as("k"),
      concat(lit("row-"), col("id")).as("payload"))
    val out = tmp("graft_compact")
    val n = Compact.compactToSize(df, Seq("id"), out,
      targetFileBytes = 64L << 10, encodedRatio = 1.0)
    assert(n > 1, "fixture must be large enough to split")
    assert(partFiles(out).size == n)
    val back = spark.read.parquet(out)
    assert(back.count() == 10000L)
    assert(back.agg(sum("id")).as[Long].head() ==
      df.agg(sum("id")).as[Long].head())
  }

  test("range layout gives files disjoint sort-key ranges (data skipping)") {
    val df = spark.range(0, 20000).select(col("id"),
      concat(lit("v"), col("id")).as("v"))
    val out = tmp("graft_skip")
    val n = Compact.compactToSize(df, Seq("id"), out,
      targetFileBytes = 64L << 10, encodedRatio = 1.0)
    assert(n >= 3)
    val ranges = partFiles(out).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("id"), max("id")).as[(Long, Long)].head()
      r
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"overlapping file ranges: $ranges")
      case _ =>
    }
  }

  test("compactDir sizes from real on-disk bytes; big target → one file") {
    val src = tmp("graft_many")
    // simulate a small-files mess: 16 files for a tiny dataset
    spark.range(0, 1000).repartition(16).write.mode("overwrite").parquet(src)
    assert(partFiles(src).size == 16)
    val out = tmp("graft_compacted")
    val n = Compact.compactDir(spark, src, Seq("id"), out,
      targetFileBytes = 1L << 30)
    assert(n == 1)
    assert(partFiles(out).size == 1)
    assert(spark.read.parquet(out).count() == 1000L)
  }

  test("orc format round-trips through the same writer") {
    val df = spark.range(0, 500).select(col("id"),
      (col("id") * 2).as("dbl"))
    val out = tmp("graft_orc")
    Compact.compactToSize(df, Seq("id"), out, targetFileBytes = 1L << 30,
      format = "orc")
    val back = spark.read.orc(out)
    assert(back.count() == 500L)
    assert(back.agg(sum("dbl")).as[Long].head() == 499L * 500L)
    assert(partFiles(out).forall(_.getName.contains("orc")) ||
      partFiles(out).nonEmpty)
  }

  test("empty sortCols is rejected") {
    intercept[IllegalArgumentException] {
      Compact.compactToSize(spark.range(1).toDF(), Seq.empty, tmp("x"))
    }
  }

  test("shuffle-shard export: one dir per shard, rows run-ordered in-file") {
    // the export composition SURVEY promises for shuffleShards: shard-key
    // repartition + (shard, pos) in-partition sort + partitionBy writes
    // each shard as its own directory whose files carry the training order
    // physically — FileFormatWriter must not re-sort (the child ordering
    // already subsumes the partition-column prefix)
    val docs = spark.range(0, 2000).toDF("doc_id")
    val sharded = graft.ext.TextOps.shuffleShards(docs, "doc_id", nShards = 4)
    val out = tmp("shard_export")
    sharded.repartition(col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(out)
    val shardDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.map(_.getName).toSet ==
      (0 until 4).map(i => s"shard=$i").toSet)
    val expected = sharded.select("shard", "pos", "doc_id")
      .as[(Int, Long, Long)].collect()
      .groupBy(_._1).map { case (s, rows) =>
        s -> rows.sortBy(_._2).map(_._3).toSeq }
    shardDirs.foreach { dir =>
      val shard = dir.getName.stripPrefix("shard=").toInt
      // every file individually must be pos-ascending (physical run order)
      val inFileOrders = partFiles(dir.getPath).map { f =>
        spark.read.parquet(f.getPath).select("pos", "doc_id")
          .as[(Long, Long)].collect().toSeq
      }
      inFileOrders.foreach { rows =>
        assert(rows.map(_._1) == rows.map(_._1).sorted,
          s"file in shard $shard not pos-ordered")
      }
      // and together the files hold exactly the shard's rows in order
      val all = inFileOrders.flatten.sortBy(_._1).map(_._2)
      assert(all == expected(shard), s"shard $shard content mismatch")
    }
  }
}
