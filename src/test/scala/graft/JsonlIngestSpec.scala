package graft

import graft.io.JsonlIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

class JsonlIngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("malformed lines quarantine with raw line preserved; clean rows parse") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    Files.write(Paths.get(s"$dir/part0.jsonl"),
      ("""{"doc_id": 1, "text": "alpha"}""" + "\n" +
        """{"doc_id": 2 "text": "missing comma"}""" + "\n" +
        """{"doc_id": 3, "text": "gamma"}""" + "\n" +
        "not json at all\n").getBytes(StandardCharsets.UTF_8))
    val (clean, bad) = JsonlIngest.readJsonlSplit(spark, dir, Some(schema))
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    assert(!clean.columns.contains(JsonlIngest.CorruptCol))
    val raw = bad.as[String].collect()
    assert(raw.length == 2)
    assert(raw.exists(_.contains("missing comma")))
    assert(raw.contains("not json at all"))
  }

  test("roundtrip with split-partitioned layout") {
    val dir = Files.createTempDirectory("graft_jsonl_rt").toString
    val docs = graft.ext.TextOps.stableSplit(
      (1L to 50L).map(i => (i, s"document number $i")).toDF("doc_id", "text"),
      "doc_id")
    JsonlIngest.writeJsonl(docs, s"$dir/out", partitionBy = Seq("split"))
    val back = JsonlIngest.readJsonl(spark, s"$dir/out")
    assert(back.count() == 50)
    // partition pruning works on the split column
    assert(back.filter(col("split") === "train").count() ==
      docs.filter(col("split") === "train").count())
    // per-doc payloads survive the roundtrip
    val t = back.filter(col("doc_id") === 7L).select("text").as[String].head()
    assert(t == "document number 7")
  }

  test("schema-free read infers and still quarantines") {
    val dir = Files.createTempDirectory("graft_jsonl_inf").toString
    Files.write(Paths.get(s"$dir/p.jsonl"),
      ("""{"a": 1}""" + "\n" + "garbage\n").getBytes(StandardCharsets.UTF_8))
    val (clean, bad) = JsonlIngest.readJsonlSplit(spark, dir)
    assert(clean.count() == 1 && bad.count() == 1)
  }
}
