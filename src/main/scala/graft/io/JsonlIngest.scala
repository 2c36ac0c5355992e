package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (newline-delimited JSON) ingest/egress — the interchange format
  * large-scale text pipelines actually exchange (one document object per
  * line, append-friendly, splittable when uncompressed or zstd-framed).
  * Complements the reference's CSV ingest (S1) on the training-data side.
  *
  * Read contract: a malformed line NEVER kills a 100 TB ingest; it lands
  * in a quarantine relation with the raw line preserved for reprocessing,
  * mirroring the quality-rule philosophy (report + drop, don't crash).
  *
  * Implementation note: Spark refuses to answer queries that project only
  * the internal corrupt-record column of a raw JSON scan, and the
  * documented workaround (cache the parsed frame) is not acceptable at
  * ingest scale. [[readJsonlSplit]] therefore does ONE text scan and
  * splits with `from_json`: clean rows expand the parsed struct, bad rows
  * keep the raw line — no cache, no second parse of clean data.
  */
object JsonlIngest {

  val CorruptCol = "_corrupt_record"

  /** Plain read (clean rows only, corrupt lines dropped). Use
    * [[readJsonlSplit]] when the quarantine matters. Schema supplied =
    * single pass; inferred = an extra pass (exploration only).
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: Option[StructType] = None): DataFrame = {
    val base = spark.read.option("mode", "PERMISSIVE")
    schema.fold(base)(base.schema).json(path)
  }

  /** One text scan split into (clean, quarantine). `schema` absent →
    * inferred from the data first (extra pass, exploration only). A line
    * that is the JSON literal `null` is indistinguishable from a parse
    * failure and quarantines — acceptable for document corpora where
    * every line is an object.
    */
  def readJsonlSplit(spark: SparkSession, path: String,
                     schema: Option[StructType] = None)
      : (DataFrame, DataFrame) = {
    val dataSchema = StructType(
      schema.getOrElse(spark.read.json(path).schema)
        .filterNot(_.name == CorruptCol))
    // the corrupt-record column must live INSIDE the from_json schema:
    // PERMISSIVE returns an all-null struct (not a null struct) for a
    // malformed line, so the marker field is the only reliable signal.
    // Type mismatches null the field but not the marker — those stay
    // clean, matching the CSV ingester's coercion philosophy.
    val parseSchema = dataSchema.add(CorruptCol, StringType)
    val marker = col(s"__parsed.$CorruptCol")
    val parsed = spark.read.text(path)
      .withColumn("__parsed",
        from_json(col("value"), parseSchema,
          Map("columnNameOfCorruptRecord" -> CorruptCol)))
    val clean = parsed.filter(marker.isNull)
      .select(dataSchema.fieldNames.toSeq
        .map(f => col(s"__parsed.$f").as(f)): _*)
    val bad = parsed.filter(marker.isNotNull)
      .select(col("value").as("raw_line"))
    (clean, bad)
  }

  /** Write JSONL, optionally partitioned (e.g. by the q49 split column —
    * the standard layout for handing a corpus to a trainer) and
    * compressed (gzip/zstd/none).
    */
  def writeJsonl(df: DataFrame, path: String,
                 partitionBy: Seq[String] = Nil,
                 compression: String = "none"): Unit = {
    val w = df.write.mode("overwrite").option("compression", compression)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .json(path)
  }
}
