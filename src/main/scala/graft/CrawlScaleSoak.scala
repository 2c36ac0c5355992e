package graft

import graft.ext.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the round-10 crawl-stage operators: HTML
  * main-content extraction (q145 shape), mojibake repair (q146 shape),
  * and the unigram-LM tokenizer — training (q147) plus apply (q148) —
  * on ~10⁶ synthetic documents, 200× the sf0.1 corpus. Each document
  * wraps in the full planted page (chrome + junk blocks) and half
  * carry double-encoding damage, so every operator does real per-row
  * work; the trainer runs its complete seed + 2-EM-step loop on the
  * collapsed word relation. Wall times and output sanity go to
  * BASELINE.md ("Round-10 crawl-stage soak").
  *
  * Usage: `sbt 'runMain graft.CrawlScaleSoak [n]'` (default 1000000).
  */
object CrawlScaleSoak {

  import BenchUtil.time

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    require(n > 0, s"doc count must be positive: $n")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-crawl-soak")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = TextScaleSoak.soakDocs(spark, n, seed = 42L,
        parallelism = cpus.toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[soak] corpus: ${docs.count()} docs")

    // --- q145 shape: full planted page around every document --------
    val damaged = graft.entry.TextQueries.MojibakeDamaged
    val paged = docs.withColumn("html", concat(
      lit(graft.entry.TextQueries.HtmlPre), col("text"),
      lit(graft.entry.TextQueries.HtmlLinks),
      when(col("doc_id") % 2 === 0, lit(" " + damaged)).otherwise(lit("")),
      lit(graft.entry.TextQueries.HtmlTail)))
    val (ex, tEx) = time {
      TextOps.extractMainContent(paged, "html")
        .agg(sum(col("blocks_kept")), sum(length(col("text_main"))))
        .collect()(0)
    }
    println(f"[soak] html extract: $tEx%.1f s, " +
      s"kept_blocks=${ex.getLong(0)} main_chars=${ex.getLong(1)}")

    // --- q146 shape: mojibake repair over half-damaged corpus -------
    val moji = docs.withColumn("text", concat(col("text"), lit(" "),
      when(col("doc_id") % 2 === 0, lit(damaged))
        .otherwise(lit(graft.entry.TextQueries.MojibakeClean))))
    val (mj, tMj) = time {
      moji.transform(TextOps.repairMojibake(_, "text"))
        .agg(sum(col("chars_collapsed")),
          count(when(col("mojibake_changed"), 1)))
        .collect()(0)
    }
    println(f"[soak] mojibake repair: $tMj%.1f s, " +
      s"chars_collapsed=${mj.getLong(0)} changed=${mj.getLong(1)}")
    require(mj.getLong(1) == (n + 1) / 2,
      s"exactly the damaged half must change: ${mj.getLong(1)}")

    // --- q147/q148 shape: unigram train + tokenize -------------------
    val (vocab, tTrain) = time {
      val v = TextOps.trainUnigramLm(docs, "text", maxPieceLen = 4,
        seedMinCount = 1000L, pruneMinCount = 1000L, steps = 2)
      (v.count(), v.collect().map(r => (r.getString(0), r.getLong(2))).toSeq)
    }
    println(f"[soak] unigram train: $tTrain%.1f s, vocab=${vocab._1}")
    val (tok, tTok) = time {
      TextOps.withUnigramTokens(docs, "text", vocab._2, maxPieceLen = 4)
        .agg(sum(col("n_unigram_tokens"))).collect()(0).getLong(0)
    }
    println(f"[soak] unigram tokenize: $tTok%.1f s, tokens=$tok")
    require(tok > n, "tokenization must emit at least one piece per doc")
    spark.stop()
  }
}
