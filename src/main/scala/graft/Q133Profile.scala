package graft

import graft.ext.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Disposable stage profiler for q133 (round-11 directive #4). */
object Q133Profile {
  import BenchUtil.time
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
    for (_ <- 1 to 3) {
      val (media, tEnc) = time {
        Multimodal.syntheticRealGifNearDups(docs, "doc_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          .count()
        Multimodal.syntheticRealGifNearDups(docs, "doc_id")
      }
      val m = Multimodal.syntheticRealGifNearDups(docs, "doc_id")
      val (framed, tDec) = time {
        Multimodal.withFrameDHashBands(m, "payload").localCheckpoint()
      }
      val (n, tPairs) = time {
        Multimodal.videoNearDupPairs(framed, "doc_id", "frame_idx",
          maxHamming = 10).count()
      }
      println(f"[q133] encode+count: $tEnc%.2f s  decode+band+ckpt: " +
        f"$tDec%.2f s  pairs: $tPairs%.2f s  ($n pairs)")
    }
    spark.stop()
  }
}
