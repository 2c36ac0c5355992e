package graft

import graft.ext.{Dedup, Multimodal, Retrieval, Similarity, TextOps}
import graft.model.{ColumnSpec, FkRef, TableConfig}
import graft.ops.{Merge, Normalize, TemporalJoin}
import graft.rules.Rules
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract: one `queries` entry per implemented operator
  * (SURVEY.md §2 inventory + the LLM-pipeline extensions), each paired —
  * where SQL-expressible — with DuckDB oracle SQL over the same tables.
  *
  * Cross-engine determinism conventions (SURVEY.md §7.4):
  *  - money/quantity sums go through DECIMAL (exact, order-independent),
  *    then surface as DOUBLE so both engines emit identical values;
  *  - similarity scores are rounded to 6 decimals before ranking or
  *    thresholding, so last-ulp float noise cannot flip results;
  *  - every result is deterministically ordered and ties are broken by id.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** q120's fixed BPE merge table — CONSISTENT (every operand is a base
    * character or an earlier merge's output), which is the condition
    * under which replay-in-rank-order equals the lowest-rank-present
    * loop the native expression runs, and what the oracle's nested
    * replace() chain implements.
    */
  private[graft] val Q120Merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "the" -> "</w>", "e" -> "r", "e" -> "</w>",
    "a" -> "n", "an" -> "d", "and" -> "</w>")

  /** The q120 oracle, generated from [[Q120Merges]] so table and SQL
    * cannot drift: each word becomes a chr(1)-framed symbol string
    * (one code point per symbol plus the `</w>` marker), each merge in
    * rank order is ONE global `replace` of `␁l␁r␁` with `␁lr␁` —
    * left-to-right non-overlapping, exactly the fusion order the native
    * expression uses — and the doc's subword sequence is the flattened
    * filtered split.
    */
  private def q120OracleSql: String = {
    val s0 = "regexp_replace(tok, '(.)', chr(1) || '\\1', 'g') || " +
      "chr(1) || '</w>' || chr(1)"
    val chain = Q120Merges.foldLeft(s0) { case (acc, (l, r)) =>
      s"replace($acc, chr(1) || '$l' || chr(1) || '$r' || chr(1), " +
        s"chr(1) || '$l$r' || chr(1))"
    }
    s"""WITH seg AS (
       |  SELECT doc_id,
       |    flatten(list_transform(
       |      string_split_regex(trim(lower(text)), '\\s+'),
       |      tok -> list_filter(string_split($chain, chr(1)),
       |                         x -> x <> ''))) AS flat
       |  FROM documents)
       |SELECT doc_id, CAST(len(flat) AS BIGINT) AS n_bpe_tokens,
       |  md5(array_to_string(flat, chr(1))) AS tokens_md5
       |FROM seg ORDER BY doc_id""".stripMargin
  }

  /** Schema-adaptive events reader: some testdata vintages write `ts` as
    * TIMESTAMP(NANOS) parquet — which Spark's vectorized reader only accepts
    * as a long (`nanosAsLong`) — while newer vintages write plain
    * timestamp[us]. Branch on the file schema so either vintage surfaces the
    * same `ts: timestamp` column. The nanos branch converts with integer
    * division (a double division would lose precision at 1e18 magnitudes);
    * DuckDB truncates ns→µs the same way, keeping the oracle comparable.
    * This is the ONLY nanos-handling site in the repo — specs and Bench go
    * through it rather than re-deriving the conversion.
    */
  private[graft] def events(s: SparkSession, dir: String): DataFrame = {
    val nanosOnDisk = eventsTsIsNanos(s, dir)
    // The legacy conf is flipped ONLY for the nanos vintage — and must
    // then stay set through execution (the vectorized reader re-reads it
    // at scan time). Modern vintages leave session config untouched: a
    // reader that mutates session state unconditionally is the class of
    // spooky action the round-6 incident came from.
    if (nanosOnDisk) s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, dir, "events")
    df.schema("ts").dataType match {
      case LongType if nanosOnDisk =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // plain timestamp[us] parquet surfaces as NTZ; cast to TimestampType
        // (identity on the stored micros ONLY under a UTC session timezone —
        // any other zone would silently shift every event, so fail fast
        // like the unhandled-vintage branch does)
        val tz = s.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.ts arrives as TIMESTAMP_NTZ; the TimestampType cast is " +
            s"micros-preserving only under spark.sql.session.timeZone=UTC " +
            s"(session has '$tz')")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other =>
        // fail FAST with the column named — a silent passthrough would
        // defer this to ten unrelated-looking downstream query errors
        // (the round-6 failure mode this reader exists to prevent).
        // A plain INT64 ts (no timestamp annotation) lands here too,
        // instead of being silently div-1000'd as if it were nanos.
        throw new IllegalArgumentException(
          s"events.ts: unhandled on-disk type $other — teach " +
            "SparkEntry.events() this vintage")
    }
  }

  /** True iff the on-disk `events.ts` column is parquet TIMESTAMP(NANOS),
    * decided from the parquet FOOTER of one data file rather than by
    * attempting a Spark read — Spark only accepts the nanos vintage with
    * the session-wide `nanosAsLong` conf set, and `events()` must not
    * flip that conf for vintages that don't need it.
    */
  private def eventsTsIsNanos(s: SparkSession, dir: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val root = new Path(s"$dir/events.parquet")
    val conf = s.sessionState.newHadoopConf()
    val fs = root.getFileSystem(conf)
    // testdata ships a single file; Spark-written tables are directories
    val file =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).map(_.getPath)
          .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
          .sortBy(_.getName).headOption
          .getOrElse(throw new IllegalArgumentException(
            s"no parquet data files under $root"))
      else root
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      val schema = reader.getFileMetaData.getSchema
      schema.containsField("ts") &&
        (schema.getType(schema.getFieldIndex("ts"))
          .getLogicalTypeAnnotation match {
          case ts: org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            ts.getUnit == org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.NANOS
          case _ => false
        })
    } finally reader.close()
  }

  private val dec2 = DecimalType(18, 2)
  private val dec4 = DecimalType(18, 4)
  private def money(c: Column): Column = sum(c.cast(dec2)).cast("double")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_join_revenue_nation")(spark, "/root/testdata/sf0.001")

  // ================================================================ queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- aggregation (SURVEY §2.4) -------------------------------------
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          money(col("l_quantity")).as("sum_qty"),
          money(col("l_extendedprice")).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(dec4)).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- projection / filter / cast (SURVEY §2.2) ----------------------
    "q02_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") > 0.05 && col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty_int"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(dec4).cast("double").as("disc_price"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- multi-way join + broadcast dims (SURVEY §2.3 J5) --------------
    "q03_join_revenue_nation" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(dec4)).cast("double").as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy("r_name", "n_name")
    }),

    // ---- left-anti join: new/missing-key detection (J1/J6) -------------
    "q04_orders_no_lineitem" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      o.join(li.select(col("l_orderkey").as("o_orderkey")), Seq("o_orderkey"),
          "left_anti")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // ---- left-semi join: existence (J2) ---------------------------------
    "q05_semi_join_bigqty" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      o.join(li.select(col("l_orderkey").as("o_orderkey")), Seq("o_orderkey"),
          "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // ---- FK referential-integrity rule (J3, §2.11) ----------------------
    "q06_fk_violations" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val smallParts = t(s, dir, "part").filter(col("p_size") < 48)
      val cfg = TableConfig("lineitem",
        Seq(ColumnSpec("l_orderkey", LongType, primaryKey = true),
          ColumnSpec("l_linenumber", IntegerType, primaryKey = true),
          ColumnSpec("l_partkey", LongType)),
        Seq(FkRef("l_partkey", "part", "p_partkey")))
      Rules.ForeignKeyRule(li, cfg, Map("part" -> smallParts))
        .violations
        .orderBy("record_key")
    }),

    // ---- duplicate-key detection (A2) -----------------------------------
    "q07_dup_keys" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("dup_count"))
        .filter(col("dup_count") > 1)
        .orderBy("l_orderkey")
    }),

    // ---- deterministic dedup: keep-first-by-order (A4) -------------------
    "q08_dedup_keep_first" -> ((s, dir) => {
      // (l_orderkey, l_linenumber) is not unique in this data — the full
      // tie-break (linenumber, partkey, suppkey) pins "first" deterministically
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_orderkey")
    }),

    // ---- distinct dimension + surrogate key (A5/W1, etl2.py:204-211) ----
    "q09_dim_surrogate" -> ((s, dir) => {
      Normalize.dimensionWithSurrogate(t(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"), "dim_id")
        .orderBy("dim_id")
    }),

    // ---- window analytics: row_number + lag (§2.5) -----------------------
    "q10_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"))
        .orderBy("o_custkey", "rn")
    }),

    // ---- changed-row detection, null-safe (J4, etl2.py:270-296) ---------
    "q11_changed_rows" -> ((s, dir) => {
      val (existing, incoming) = mergeSnapshots(t(s, dir, "orders"))
      Merge.classify(incoming, existing, Seq("o_orderkey"))
        .updates
        .orderBy("o_orderkey")
    }),

    // ---- full merge post-state: insert/update/tombstone (T2-T4) ---------
    "q12_merge_post_state" -> ((s, dir) => {
      val (existing0, incoming) = mergeSnapshots(t(s, dir, "orders"))
      val existing = existing0
        .withColumn("updated_at", lit("2020-01-01 00:00:00").cast("timestamp"))
        .withColumn("is_deleted", col("o_orderkey") % 11 === 0)
      Merge.postState(incoming, existing, Seq("o_orderkey"),
          now = lit("2021-01-01 00:00:00").cast("timestamp"))
        .orderBy("o_orderkey")
    }),

    // ---- SCD2 history rows for the same merge (T3/T4) --------------------
    "q13_scd2_history" -> ((s, dir) => {
      val (existing0, incoming) = mergeSnapshots(t(s, dir, "orders"))
      val existing = existing0
        .withColumn("updated_at", lit("2020-01-01 00:00:00").cast("timestamp"))
        .withColumn("is_deleted", col("o_orderkey") % 11 === 0)
      Merge.scd2History(incoming, existing, Seq("o_orderkey"),
          now = lit("2021-01-01 00:00:00").cast("timestamp"))
        .orderBy("o_orderkey")
    }),

    // ---- null census in one pass (A1) ------------------------------------
    "q14_null_census" -> ((s, dir) => {
      val withNulls = t(s, dir, "orders")
        .withColumn("o_orderpriority",
          when(col("o_orderpriority") === "1-URGENT", lit(null))
            .otherwise(col("o_orderpriority")))
        .withColumn("o_totalprice",
          when(col("o_totalprice") > 300000, lit(null))
            .otherwise(col("o_totalprice")))
      Rules.nullCensus(withNulls)
    }),

    // ---- pairwise timestamp-order business rule (F3, §2.11) -------------
    "q15_ship_before_order" -> ((s, dir) => {
      val joined = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      Rules.timestampOrderViolations(joined, "o_orderdate", "l_shipdate")
        .select("o_orderkey", "l_linenumber", "o_orderdate", "l_shipdate")
        .orderBy("o_orderkey", "l_linenumber")
    }),

    // ---- negative-value rule (F5, §2.11) ---------------------------------
    "q16_negative_balance" -> ((s, dir) => {
      Rules.NegativeValuesRule(t(s, dir, "customer"), "customer",
          pk = Seq("c_custkey"))
        .violations
        .withColumn("record_key", col("record_key").cast("long"))
        .orderBy("column", "record_key")
    }),

    // ---- emoji / unicode-block scan (F2, §2.11) --------------------------
    "q17_emoji_scan" -> ((s, dir) => {
      val cfg = TableConfig("documents",
        Seq(ColumnSpec("doc_id", LongType, primaryKey = true),
          ColumnSpec("text", StringType), ColumnSpec("lang", StringType),
          ColumnSpec("source", StringType), ColumnSpec("n_chars", LongType)))
      Rules.EmojiRule(t(s, dir, "documents"), cfg, Map.empty)
        .violations
        .orderBy("column", "record_key")
    }),

    // ---- lifecycle chronology rule (F4, §2.11) ---------------------------
    "q18_chronology" -> ((s, dir) => {
      val k = col("o_orderkey")
      val base = t(s, dir, "orders").select(k, col("o_orderdate"))
        .withColumn("purchase", col("o_orderdate"))
        .withColumn("approved",
          when(k % 5 === 0, lit(null).cast("timestamp"))
            .otherwise(col("o_orderdate") +
              make_dt_interval(days = (k % 7 - 3).cast("int"))))
        .withColumn("carrier",
          when(k % 3 === 0, lit(null).cast("timestamp"))
            .otherwise(col("o_orderdate") + make_dt_interval(days = lit(2))))
        .withColumn("delivered",
          col("o_orderdate") + make_dt_interval(days = (k % 11 - 2).cast("int")))
      Rules.chronologyIssues(base,
          Seq("purchase", "approved", "carrier", "delivered"))
        .select(k, array_join(col("issues"), "; ").as("issues_str"))
        .filter(col("issues_str") =!= "")
        .orderBy("o_orderkey")
    }),

    // ---- required-dimension completeness (§2.11 product dims) ------------
    "q19_missing_required" -> ((s, dir) => {
      val withGaps = t(s, dir, "customer")
        .withColumn("c_mktsegment",
          when(col("c_custkey") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("c_mktsegment")))
        .withColumn("c_nationkey",
          when(col("c_custkey") % 11 === 0, lit(null).cast("long"))
            .otherwise(col("c_nationkey")))
      Rules.missingRequired(withGaps, Seq("c_mktsegment", "c_nationkey"))
        .select("c_custkey", "c_mktsegment", "c_nationkey")
        .orderBy("c_custkey")
    }),

    // ==== LLM-pipeline extensions =========================================

    // ---- text statistics ---------------------------------------------------
    "q20_text_stats" -> ((s, dir) => {
      TextOps.withStats(t(s, dir, "documents"), "text")
        .select("doc_id", "n_chars_computed", "n_tokens", "n_distinct_tokens",
          "type_token_ratio", "avg_token_len")
        .orderBy("doc_id")
    }),

    // ---- stopword-ratio scoring (language-evidence primitive) -------------
    "q21_stopword_ratio" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.stopwordRatio(col("text"), TextOps.Stopwords("en"))
            .as("en_stopword_ratio"))
        .orderBy("doc_id")
    }),

    // ---- heuristic language ID (argmax over evidence; rows-only check) ----
    "q22_language_id" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang").as("labeled_lang"),
          TextOps.languageId(col("text")).as("predicted_lang"))
        .orderBy("doc_id")
    }),

    // ---- composite quality score ------------------------------------------
    "q23_quality_score" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),

    // ---- exact dedup by content hash ----------------------------------------
    "q24_exact_dedup" -> ((s, dir) => {
      Dedup.exactDuplicateGroups(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ---- near-dup pairs: prefix-blocked n-gram Jaccard (oracle-checked;
    // native shingling — identical output, spec-pinned) ----------------------
    "q25_near_dup_jaccard" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      Dedup.prefixBlockedNearDupPairs(t(s, dir, "documents"), "doc_id", "text",
          prefixLen = 32, shingleN = 3, minJaccard = 0.5,
          maxBlockSize = 1000, useNative = true)
        .orderBy("id_a", "id_b")
    }),

    // ---- near-dup pairs: MinHash + LSH (oracle-checked): the PORTABLE
    // variant — md5-based shingle hash + md5-derived affine coefficients
    // (native MinHashMd5SigExpr, bit-identical to the HOF fold and the
    // DuckDB formulation), value-string band keys. The xxhash64 pipeline
    // stays spec-tested as the fastest in-Spark path.
    "q26_minhash_near_dup" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      Dedup.minhashNearDupPairs(t(s, dir, "documents"), "doc_id", "text",
          minJaccard = 0.5, shingleN = 3, k = 64, bands = 16,
          useNative = true, portable = true)
        .orderBy("id_a", "id_b")
    }),

    // ---- SimHash fingerprints (oracle-checked): the PORTABLE md5-based
    // variant (native SimHashMd5Expr, bit-identical to the HOF fold and
    // to the DuckDB bit-op formulation), emitted as hi/lo 32-bit halves.
    // The faster xxhash64 simhash64 stays spec-pinned (DedupSpec).
    "q27_simhash" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      t(s, dir, "documents")
        .select(col("doc_id"),
          Dedup.simhash64Portable(col("text"), useNative = true).as("s"))
        .select(col("doc_id"), col("s.simhash_hi").as("simhash_hi"),
          col("s.simhash_lo").as("simhash_lo"))
        .orderBy("doc_id")
    }),

    // ---- document fingerprint (oracle-checked): the portable md5-based
    // 60-bit variant, hash-verified against DuckDB computing the same
    // pipeline; the faster in-Spark xxhash64 variant is spec-pinned to
    // the same collision contract (TextOpsSpec).
    "q28_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.fingerprintPortable(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    }),

    // ---- BPE-ish token estimate (oracle-checked regex counting) ------------
    "q29_token_estimate" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.tokenEstimate(col("text")).cast("long").as("n_tokens_est"))
        .orderBy("doc_id")
    }),

    // ---- brute-force cosine top-k (exact ANN baseline; native DotExpr,
    // bit-identical to the unrolled chain — spec-pinned) ----------------------
    "q30_topk_cosine" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5,
          dim = Some(64), useNative = true)
        .orderBy("query_id", "rank")
    }),

    // ---- LSH-bucketed approximate top-k (rows-only; recall spec-tested).
    // Native RhpSigExpr signatures (bit-identical to the HOF, spec-pinned).
    "q31_topk_lsh" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 5,
          nPlanes = 10, useNative = true)
        .orderBy("query_id", "rank")
    }),

    // ---- IVF (k-means coarse-quantizer) approximate top-k (rows-only;
    // recall spec-tested). The second ANN index family next to RHP-LSH:
    // driver-trained centroids on a bounded sample, native assignment
    // expression, ids-only list join, exact rerank of candidates.
    "q43_topk_ivf" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      graft.ext.Ivf.ivfTopK(emb, queries, "vec_id", "embedding", k = 5,
          nList = 32, nProbe = 8)
        .orderBy("query_id", "rank")
    }),

    // ---- IVF, oracle-checked member (hash-checked): exemplar centroids
    // (nList lowest-id vectors, Forgy init without Lloyd) make the whole
    // assign-probe-rerank shape plain relational algebra, so the IVF
    // candidate-generation + exact-rerank pipeline itself is verified
    // cross-engine; q43 keeps the trained-quantizer variant (rows-only,
    // recall-bounded)
    "q85_topk_ivf_exemplar" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      graft.ext.Ivf.ivfTopKExemplar(emb, queries, "vec_id", "embedding",
          k = 5, nList = 8, nProbe = 2)
        .orderBy("query_id", "rank")
    }),

    // ---- IVF × int8 three-tier funnel, exemplar member (oracle-checked):
    // bucket (probed lists) → quantized prune (int8 dot, candK) → exact
    // rerank — the standard web-scale retrieval stack shape, verified
    // cross-engine end to end (composes q85's candidates with q112's scan).
    "q121_topk_ivf_int8" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      graft.ext.Ivf.ivfInt8TopKExemplar(emb, queries, "vec_id", "embedding",
          k = 5, nList = 8, nProbe = 2, dim = 64, candK = 20)
        .orderBy("query_id", "rank")
    }),

    // ---- late-interaction MaxSim retrieval (oracle-checked): documents
    // as bags of 8 token vectors (doc = vec_id div 8), score =
    // Σ_q-token max_d-token cos — integer micro-units BEFORE max/sum so
    // the aggregates are exact in any partial-agg order. This is the
    // exact quadratic baseline; maxSimTopKPooled is the serving funnel
    // (spec-pinned equal under an everything-shortlist).
    "q122_maxsim_topk" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val toks = t(s, dir, "embeddings")
        .withColumn("doc", expr("vec_id div 8"))
      val queries = toks.filter(col("doc") % 10 === 0)
      graft.ext.MultiVector.maxSimTopK(toks, queries, "doc", "vec_id",
          "embedding", k = 5, dim = 64, useNative = true)
        .orderBy("query_doc", "rank")
    }),

    // ---- BM25 lexical retrieval (oracle-checked): Okapi BM25 with the
    // Lucene non-negative IDF, k1=1.2 / b=0.75 as exact integer scaling
    // constants — every per-term contribution is a micro-unit long
    // (floor division ≡ DuckDB //), so the per-doc sum is exact in any
    // partial-agg order; the ONE ln per query term is rounded to micro
    // on the |q|-row IDF relation before it meets the corpus. Only
    // query-term token instances reach the tf shuffle.
    "q123_bm25_topk" -> ((s, dir) => {
      Retrieval.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
          Seq("table", "window", "hash", "stream"), k = 10)
        .orderBy("rank")
    }),

    // ---- hybrid dense+lexical retrieval, RRF-fused (oracle-checked):
    // the standard two-leg serving stack — a BM25 "more-like-this" leg
    // (query doc's distinct tokens as the term set) and a brute cosine
    // leg over the aligned embedding (vec_id ≡ doc_id, the catalog's
    // doc↔vector premise), each truncated to top-20, fused by
    // reciprocal-rank 1e6 div (60+rank) in exact longs. Both legs'
    // ranks are themselves cross-engine-stable (integer BM25 micro;
    // q30's rounded cosine), so the fusion is hash-checkable end to end.
    "q124_hybrid_rrf" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val qterms = docs.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("query_id"),
          explode(array_distinct(TextOps.tokens(lower(col("text")))))
            .as("term"))
      val lex = Retrieval.rankTopK(
          Retrieval.bm25ScorePerQuery(docs, "doc_id", "text", qterms,
              "query_id")
            .filter(col("query_id") =!= col("doc_id")),
          "query_id", "doc_id", "bm25_micro", k = 20)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val dense = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
          k = 20, dim = Some(64), useNative = true)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank"))
      Retrieval.rrfFuse(lex, dense, "query_id", "doc_id", k = 5)
        .orderBy("query_id", "rank")
    }),

    // ---- hard-negative mining (oracle-checked): q124's two legs,
    // anti-joined — lexical top-20 hits the dense leg does NOT retrieve,
    // the DPR/ANCE negatives recipe. Survivors keep their lexical rank;
    // the anti-join runs on the tiny pre-truncated (queries × 20)
    // lattice (broadcast at any corpus scale).
    "q126_hard_negatives" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val qterms = docs.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("query_id"),
          explode(array_distinct(TextOps.tokens(lower(col("text")))))
            .as("term"))
      val lex = Retrieval.rankTopK(
          Retrieval.bm25ScorePerQuery(docs, "doc_id", "text", qterms,
              "query_id")
            .filter(col("query_id") =!= col("doc_id")),
          "query_id", "doc_id", "bm25_micro", k = 20)
        .select(col("query_id"), col("doc_id"), col("rank"),
          col("bm25_micro"))
      val dense = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
          k = 20, dim = Some(64), useNative = true)
        .select(col("query_id"), col("neighbor_id").as("doc_id"))
      Retrieval.hardNegatives(lex, dense, "query_id", "doc_id")
        .orderBy("query_id", "rank")
    }),

    // ---- PRF query expansion (oracle-checked): RM3-lite — q123's
    // top-10 as the pseudo-relevant set R, R's terms ranked by exact
    // integer tf_R · idf_micro (corpus IDF, q123's micro constant),
    // original terms excluded. Everything after the first round runs on
    // R-bounded relations; corpus df is computed only for R's vocab.
    "q127_prf_expansion" -> ((s, dir) => {
      Retrieval.prfExpansionTerms(t(s, dir, "documents"), "doc_id",
          "text", Seq("table", "window", "hash", "stream"),
          nDocs = 10, nTerms = 5)
        .orderBy("rank")
    }),

    // ---- retrieval eval metrics (oracle-checked): the lexical leg
    // scored against the dense leg as truth — recall@20 and reciprocal
    // rank per query in exact micro-integers, the eval harness shape
    // (swap in human qrels for the truth relation in production).
    "q128_retrieval_metrics" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val qterms = docs.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("query_id"),
          explode(array_distinct(TextOps.tokens(lower(col("text")))))
            .as("term"))
      val lex = Retrieval.rankTopK(
          Retrieval.bm25ScorePerQuery(docs, "doc_id", "text", qterms,
              "query_id")
            .filter(col("query_id") =!= col("doc_id")),
          "query_id", "doc_id", "bm25_micro", k = 20)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val dense = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
          k = 20, dim = Some(64), useNative = true)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank"))
      // the metric joins read each tiny leg 2-3 times — materialize
      // once (queries × 20 rows) instead of recomputing the scorers
      Retrieval.rankEvalMetrics(lex.localCheckpoint(),
          dense.localCheckpoint(), "query_id", "doc_id")
        .orderBy("query_id")
    }),

    // ---- best-passage extraction (oracle-checked): per doc, the
    // 8-token window with the most query-term hits plus its text — the
    // RAG serving step after retrieval. Candidates reduce to hit
    // positions (a maximal window can start at a hit), so the band
    // self-join runs on the query-term sliver only; ties break to the
    // earliest window, a total order.
    "q129_best_passage" -> ((s, dir) => {
      Retrieval.bestPassageWindow(t(s, dir, "documents"), "doc_id",
          "text", Seq("table", "window", "hash", "stream"),
          windowTokens = 8)
        .orderBy("doc_id")
    }),

    // ---- end-to-end RAG serving (oracle-checked): q124's fused top-5
    // handed to per-query passage extraction — the full retrieval →
    // fusion → snippet path one plan. Dense-only hits with no lexical
    // overlap have no rankable window and drop at the passage join
    // (documented operator contract); ranks keep their fused values.
    "q130_rag_serving" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val qterms = docs.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("query_id"),
          explode(array_distinct(TextOps.tokens(lower(col("text")))))
            .as("term"))
      val lex = Retrieval.rankTopK(
          Retrieval.bm25ScorePerQuery(docs, "doc_id", "text", qterms,
              "query_id")
            .filter(col("query_id") =!= col("doc_id")),
          "query_id", "doc_id", "bm25_micro", k = 20)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val dense = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
          k = 20, dim = Some(64), useNative = true)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank"))
      // the fused top-5 feeds BOTH the passage extractor and the final
      // join — localCheckpoint materializes the (queries × 5)-row
      // relation once so the retrieval legs don't recompute per use
      // (151 → ~60 exchanges, measured via PlanAudit)
      val fused = Retrieval.rrfFuse(lex, dense, "query_id", "doc_id",
        k = 5).localCheckpoint()
      val passages = Retrieval.bestPassagePerQuery(docs, "doc_id",
        "text", fused, qterms, "query_id", windowTokens = 8)
      fused.join(passages, Seq("query_id", "doc_id"))
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("rrf_micro"), col("best_start"), col("n_hits"),
          col("snippet"))
        .orderBy("query_id", "rank")
    }),

    // ---- perceptual image near-dup (oracle-checked, REAL decode):
    // dHash over real ImageIO pixels in the canonical 9×8 geometry,
    // stored as 4×16-bit bands; band equality generates candidates
    // (hamming-LSH), exact hamming verifies. Near-dups are planted
    // arithmetically ((8k, 8k+1) share a seed, one pixel bumped), so
    // the oracle predicts every hash and verdict without a codec.
    "q131_image_near_dup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val media = Multimodal.syntheticRealPngNearDups(docs, "doc_id")
      // the pair join reads the banded relation three times (explode +
      // both verify sides) — checkpoint the (id, 4-long) rows once so
      // the encode+decode seam doesn't run per consumer
      val banded = Multimodal.withImageDHashBands(media, "payload")
        .localCheckpoint()
      Multimodal.imageNearDupPairs(banded, "doc_id", maxHamming = 10)
        .orderBy("id_a", "id_b")
    }),

    // ---- perceptual audio near-dup (oracle-checked, REAL decode):
    // q131's band machinery over a waveform dHash — 65 block means of
    // the real decoded PCM (floor division, exact), adjacent-block
    // comparison bits in 4×16-bit bands; the near-dup pipeline
    // (band-equality candidates → capped buckets → exact hamming) is
    // SHARED with the image path, modality-agnostic over (id, bands).
    "q132_audio_near_dup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val media = Multimodal.syntheticRealWavNearDups(docs, "doc_id")
      val banded = Multimodal.withAudioDHashBands(media, "payload")
        .localCheckpoint() // q131's rationale: decode once, not 3×
      Multimodal.imageNearDupPairs(banded, "doc_id", maxHamming = 10)
        .orderBy("id_a", "id_b")
    }),

    // ---- perceptual video near-dup (oracle-checked, REAL decode):
    // frame-sampled clip dedup — per-frame dHash over real decoded GIF
    // frames (lossless identity-gray palette), frame-level band
    // candidates, exact per-frame-pair hamming, clip-level roll-up
    // (best frame pair + match count). Planted (8k, 8k+1) clips share
    // every frame except a one-sample bump in frame 0.
    "q133_video_near_dup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val media = Multimodal.syntheticRealGifNearDups(docs, "doc_id")
      val framed = Multimodal.withFrameDHashBands(media, "payload")
        .localCheckpoint() // q131's rationale: decode once, not 3×
      Multimodal.videoNearDupPairs(framed, "doc_id", "frame_idx",
          maxHamming = 10)
        .orderBy("id_a", "id_b")
    }),

    // ---- PageRank link-graph quality (oracle-checked): 10 power
    // iterations in exact integer micro-units over a deterministic
    // synthetic link graph (3 affine out-links per doc, dedup'd, no
    // self-loops) — the URL-centrality signal crawl curation ranks by.
    // The bounded driver count() fixes N for the micro constants.
    "q134_pagerank" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
          explode(array(
            (col("doc_id") * 7 + 1) % n,
            (col("doc_id") * 11 + 2) % n,
            (col("doc_id") * 13 + 3) % n)).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      graft.ext.Graph.pageRankMicro(docs, edges, "doc_id", "src", "dst",
          nNodes = n, iters = 10)
        .orderBy("doc_id")
    }),

    // ---- filtered vector search (oracle-checked): top-k cosine among
    // vectors whose aligned document passes a metadata predicate
    // (lang = 'en') — the PRE-FILTER strategy: restrict the corpus
    // before scoring, so recall is exact by construction (post-filtering
    // an ANN shortlist can starve below k; with an index, pre-filtering
    // composes as a semi-join on the candidate lists). The predicate
    // join is broadcast-sized metadata, never vectors.
    "q135_filtered_ann" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val meta = t(s, dir, "documents")
        .select(col("doc_id").as("vec_id"), col("lang"))
      val corpus = emb.join(meta, Seq("vec_id"))
        .filter(col("lang") === "en").drop("lang")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding",
          k = 5, dim = Some(64), useNative = true)
        .orderBy("query_id", "rank")
    }),

    // ---- filtered ANN over a shared index (oracle-checked): q85's
    // exemplar IVF with the q135 predicate applied as a candidate
    // semi-join before the exact rerank — one index, many predicates;
    // a probed list short on allowed members returns < k by design
    // (the documented trade vs q135's exact pre-filter).
    "q136_filtered_ivf" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val allowed = t(s, dir, "documents")
        .filter(col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      val queries = emb.filter(col("vec_id") % 100 === 0)
      graft.ext.Ivf.ivfFilteredTopKExemplar(emb, queries, "vec_id",
          "embedding", allowed, k = 5, nList = 8, nProbe = 2)
        .orderBy("query_id", "rank")
    }),

    // ---- filtered-ANN recall report (oracle-checked): q136's indexed
    // funnel scored against q135's exact pre-filter as truth via the
    // rank-eval harness — the recall regression gate a serving stack
    // runs when it swaps an exact scan for an index. Exact micro-integer
    // metrics; a starved query shows up as depressed recall, not a
    // silent absence.
    "q137_filtered_recall" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val allowed = t(s, dir, "documents")
        .filter(col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      val queries = emb.filter(col("vec_id") % 100 === 0)
      val truth = Similarity.bruteForceTopK(
          emb.join(allowed, Seq("vec_id")), queries, "vec_id",
          "embedding", k = 5, dim = Some(64), useNative = true)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .localCheckpoint()
      val system = graft.ext.Ivf.ivfFilteredTopKExemplar(emb, queries,
          "vec_id", "embedding", allowed, k = 5, nList = 8, nProbe = 2)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .localCheckpoint()
      Retrieval.rankEvalMetrics(system, truth, "query_id", "neighbor_id")
        .orderBy("query_id")
    }),

    // ---- MMR diversified re-ranking (oracle-checked): greedy
    // λ·relevance − (1−λ)·max-sim-to-selected over the dense top-10
    // shortlist, k=5, λ=0.7 — exact-integer with the +1e6 shift so
    // every division is nonnegative (floor ≡ truncate), ties to the
    // lowest id; the greedy trace is reproducible enough to unroll as
    // five oracle selection stages.
    "q138_mmr_rerank" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      val cands = Similarity.bruteForceTopK(emb, queries, "vec_id",
          "embedding", k = 10, dim = Some(64), useNative = true)
        .select(col("query_id"), col("neighbor_id"),
          round(col("sim") * 1000000).cast("long").as("rel_micro"))
        .localCheckpoint()
      val vn = Similarity.withVecNorm(emb, "vec_id", "embedding")
      val pairs = cands.select(col("query_id"), col("neighbor_id")
          .as("id_a"))
        .join(cands.select(col("query_id"), col("neighbor_id")
          .as("id_b")), Seq("query_id"))
        .filter(col("id_a") =!= col("id_b"))
        .join(vn.select(col("vec_id").as("id_a"), col("v").as("va"),
          col("nrm").as("na")), Seq("id_a"))
        .join(vn.select(col("vec_id").as("id_b"), col("v").as("vb"),
          col("nrm").as("nb")), Seq("id_b"))
        .select(col("query_id"), col("id_a"), col("id_b"),
          round(Similarity.dotFast(col("va"), col("vb"), 64,
            useNative = true) / (col("na") * col("nb")) * 1000000)
            .cast("long").as("sim_micro"))
        .localCheckpoint()
      Retrieval.mmrRerank(cands, pairs, "query_id", "neighbor_id", k = 5)
        .orderBy("query_id", "rank")
    }),

    // ---- DSIR importance weights (oracle-checked): target = the 'en'
    // slice, raw = everything; hashed-bucket distributions (portable
    // 32-bit md5 prefixes), add-one smoothing, and per-bucket log-ratios
    // rounded to micro-nats on the ≤256-row lattice BEFORE scoring, so
    // each doc's log-weight is an exact long dot product of its bucket
    // counts with the lattice — deterministic in any agg order.
    "q125_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextOps.dsirLogWeights(docs, docs.filter(col("lang") === "en"),
          "doc_id", "text", nBuckets = 256)
        .orderBy("doc_id")
    }),

    // ---- LSH, oracle-checked member (hash-checked): md5-derived ±1
    // hyperplanes (portable across engines), single-table exact-signature
    // buckets, exact rerank — the bucket-then-rerank pipeline verified
    // cross-engine; q31 keeps the multi-table Gaussian family (rows-only,
    // recall-bounded)
    "q86_topk_lsh_portable" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      graft.ext.Similarity.lshTopKPortable(emb, queries, "vec_id",
          "embedding", k = 5, nPlanes = 4)
        .orderBy("query_id", "rank")
    }),

    // ---- per-source frequency cap (oracle-checked): the corpus-
    // balancing stage of web-scale curation — keep the k best docs per
    // source, ranked by graft_top_k (O(k) state per key, map-side
    // combine; the relation is never window-sorted)
    "q90_source_cap" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      graft.ext.TextOps.capPerKey(
          t(s, dir, "documents")
            .withColumn("len", col("n_chars").cast("double")),
          "source", "len", "doc_id", k = 10)
        .orderBy("source", "rank")
    }),

    // ---- LSH near-dup, oracle-checked member (hash-checked): portable
    // ±1 planes, single-table buckets, exact cosine verify of
    // bucket-mate pairs; q38 keeps the multi-table Gaussian family
    "q88_near_dup_lsh_portable" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      Dedup.cosineNearDupPairsLshPortable(t(s, dir, "embeddings"),
          "vec_id", "embedding", minCosine = 0.4, nPlanes = 4)
        .orderBy("id_a", "id_b")
    }),

    // ---- PQ ADC, oracle-checked member (hash-checked): exemplar
    // codebooks (sub-vectors of the ksub lowest-id unit vectors), argmin
    // encode, ADC shortlist, exact rerank — the product-quantization
    // encode/ADC pipeline verified cross-engine; q79 keeps the trained
    // IVF-PQ with residual encoding (rows-only, recall-bounded)
    "q89_pq_adc_exemplar" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      graft.ext.Pq.pqAdcTopKExemplar(emb, queries, "vec_id", "embedding",
          k = 5, m = 8, ksub = 16)
        .orderBy("query_id", "rank")
    }),

    // ---- k-means, oracle-checked member (hash-checked): ONE spherical-
    // Lloyd refinement step from exemplar seeds — the training step
    // itself (unit-normalize → argmax-assign → DECIMAL per-dimension
    // mean → renormalize) verified cross-engine; q75 keeps the trained
    // multi-iteration model (rows-only, centroid-matrix pinned by spec)
    "q87_lloyd_step_exemplar" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      graft.ext.Ivf.lloydStepExemplar(t(s, dir, "embeddings"), "vec_id",
          "embedding", nList = 8)
        .orderBy("list", "pos")
    }),

    // ---- k-means CONVERGENT training, oracle-checked (hash-checked):
    // two Lloyd steps from exemplar seeds as a relational fixpoint —
    // centroids stay a relation between steps (never collected), every
    // intermediate bit-stable cross-engine (DECIMAL means, IEEE
    // division/sqrt, sequential dots); the oracle unrolls both steps
    "q91_lloyd_iterate_exemplar" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      graft.ext.Ivf.lloydIterateExemplar(t(s, dir, "embeddings"), "vec_id",
          "embedding", nList = 8, iters = 2)
        .orderBy("list", "pos")
    }),

    // ---- temperature-scaled source mixing (oracle-checked): α=0.5
    // sampling over the skewed language mix — per-language keep rates
    // ∝ n^α/n, DECIMAL-exact Σn^α, deterministic md5 uniforms; the
    // documents themselves never shuffle (counts aggregate + broadcast
    // rates + pure-projection keep decision)
    "q92_temperature_mix" -> ((s, dir) => {
      TextOps.temperatureMixSample(t(s, dir, "documents"), "doc_id",
          "lang", budget = 400L, alpha = 0.5)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    }),

    // ---- PII redaction (oracle-checked): the transform counterpart of
    // q45's census — email → url → ipv4 placeholder rewrite, one
    // codegen'd regex chain, shuffle-free; result pinned cross-engine
    // by md5 of the redacted text
    "q93_pii_redact" -> ((s, dir) => {
      val aug = t(s, dir, "documents")
        .withColumn("text",
          when(col("doc_id") % 13 === 0,
            concat(col("text"), lit(" contact: user13@example.com" +
              " via https://ex.example/path from 10.0.0.1")))
            .otherwise(col("text")))
      TextOps.redactPii(aug, "text")
        .select(col("doc_id"), md5(col("text_redacted")).as("redacted_md5"),
          length(col("text_redacted")).cast("long").as("len_redacted"))
        .orderBy("doc_id")
    }),

    // ---- contamination fraction + drop verdict (oracle-checked): the
    // policy layer over q46 — per-doc distinct-8-gram count, overlap
    // count vs the held-out corpus, integer-exact ≥10% drop decision;
    // zero-hit docs stay in the relation via the left join
    "q94_contamination_report" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      Dedup.contaminationReport(
          docs.filter(col("doc_id") % 31 =!= 0), "doc_id", "text",
          bench = docs.filter(col("doc_id") % 31 === 0),
          shingleN = 8, dropPct = 10, useNative = true)
        .orderBy("doc_id")
    }),

    // ---- deterministic shuffle-shard layout (oracle-checked): training-
    // order randomization — md5-prefix shard assignment + full-md5
    // within-shard order; one shuffle on the shard key, no global sort
    "q95_shuffle_shards" -> ((s, dir) => {
      TextOps.shuffleShards(t(s, dir, "documents"), "doc_id", nShards = 8)
        .select("shard", "pos", "doc_id")
        .orderBy("shard", "pos")
    }),

    // ---- corpus RELEASE pipeline end-to-end (oracle-checked): ONE lazy
    // plan composing the four new release-prep operators — implant PII
    // (observability aug) → contamination-fraction gate (drop ≥10%
    // benchmark overlap) → PII redaction → temperature-scaled mixing →
    // deterministic shuffle-shard layout. The integration query for the
    // release family, like q63 is for curation and q42 for the ETL.
    "q96_release_e2e" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 31 === 0)
      val aug = docs.filter(col("doc_id") % 31 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 13 === 0,
            concat(col("text"), lit(" contact: user13@example.com" +
              " via https://ex.example/path from 10.0.0.1")))
            .otherwise(col("text")))
      // batch and streaming share these stages VERBATIM: the same
      // curate/release pair runs incrementally in
      // streaming.ReleasePipeline's micro-batch loop, and
      // ReleasePipelineSpec pins two-micro-batches ≡ this one-batch plan
      val curated = graft.streaming.ReleasePipeline.curate(
        aug, "doc_id", "text", bench, shingleN = 8, dropPct = 10,
        useNative = true)
      graft.streaming.ReleasePipeline.release(curated, "doc_id", "lang",
        budget = 300L, nShards = 4)
    }),

    // ---- intra-document repeated-line strip (oracle-checked): the
    // WITHIN-document counterpart of q50's corpus-wide line dedup — keep
    // only the first occurrence of each line inside its own document.
    // Pure array-HOF projection, zero shuffle. Lines are derived by
    // breaking the text every 5 words; the word-soup corpus then repeats
    // lines within a document for real.
    "q97_line_strip" -> ((s, dir) => {
      val lined = t(s, dir, "documents")
        .withColumn("text",
          regexp_replace(col("text"), "((?:\\S+ ){4}\\S+) ", "$1\n"))
      TextOps.stripRepeatedLines(lined, "text")
        .select(col("doc_id"), col("lines_total"), col("lines_kept"),
          md5(col("text_unique")).as("unique_md5"))
        .orderBy("doc_id")
    }),

    // ---- C4-style line cleaning (oracle-checked): terminal-punctuation
    // + min-words + blocklist line filters (Raffel et al. 2020 §2.2,
    // public heuristics). Crafted lines appended per document exercise
    // every rule: one kept sentence, a blocklisted one, a too-short one,
    // an unpunctuated one, and (for doc_id % 4 == 0) a second keeper.
    "q98_line_clean" -> ((s, dir) => {
      val aug = t(s, dir, "documents")
        .withColumn("text", concat(
          col("text"),
          lit("\nDocument "), col("doc_id").cast("string"),
          lit(" retains this properly punctuated sentence."),
          lit("\nPlease enable javascript to continue."),
          lit("\nToo short."),
          lit("\nthis line has words but no terminal punctuation"),
          when(col("doc_id") % 4 === 0,
            lit("\nAn extra valid closing line appears here!"))
            .otherwise(lit(""))))
      TextOps.cleanLines(aug, "text", minWords = 3)
        .select(col("doc_id"), col("lines_total"), col("lines_kept"),
          col("text_clean"))
        .orderBy("doc_id")
    }),

    // ---- model-based quality filter (oracle-checked): fastText-style
    // hashed-linear classifier inference as a zero-shuffle projection —
    // md5-derived integer milli-weights make the logit exact in any
    // engine; the keep decision thresholds the truncated mean weight.
    "q99_quality_classifier" -> ((s, dir) => {
      TextOps.qualityClassifierScore(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("n_tokens"), col("logit_milli"),
          col("quality_logit"), col("kept"))
        .orderBy("doc_id")
    }),

    // ---- cross-document duplicated spans (oracle-checked): Lee et al.
    // 2021's exact-substring dedup signal — per-doc count of token
    // windows whose exact text recurs in another document, plus merged
    // coverage. The shuffles carry (md5(window), doc, start) only.
    "q100_dup_spans" -> ((s, dir) => {
      Dedup.duplicatedSpanStats(t(s, dir, "documents"), "doc_id", "text",
          n = 3)
        .orderBy("doc_id")
    }),

    // ---- curation funnel report (oracle-checked): the per-stage
    // retention table a production curation pipeline monitors — quality
    // filter → exact dedup (keep-first) → benchmark decontamination,
    // each stage's in/out counts from ONE pass over per-doc flags.
    // Every 17th doc is implanted as an exact duplicate so the dedup
    // stage is exercised for real. Flags join on doc_id; the final
    // funnel is a 1-row aggregate unpivoted with stack().
    "q101_curation_funnel" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      val withDups = docs.withColumn("text",
        when(col("doc_id") % 17 === 0,
          lit("duplicate stanza alpha shared across documents"))
          .otherwise(col("text")))
      val bench = withDups.filter(col("doc_id") % 31 === 0)
      val corpus = withDups.filter(col("doc_id") % 31 =!= 0)
      val qf = TextOps.qualityClassifierScore(corpus, "text")
        .select(col("doc_id"), col("kept").as("q_ok"))
      val df = corpus.withColumn("__w",
          min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
        .select(col("doc_id"), (col("doc_id") === col("__w")).as("d_ok"))
      val cf = Dedup.contaminationReport(corpus, "doc_id", "text", bench,
          shingleN = 8, dropPct = 10, useNative = true)
        .select(col("doc_id"), (!col("dropped")).as("c_ok"))
      qf.join(df, "doc_id").join(cf, "doc_id")
        .agg(
          count(lit(1)).as("n_total"),
          count(when(col("q_ok"), 1)).as("n_q"),
          count(when(col("q_ok") && col("d_ok"), 1)).as("n_qd"),
          count(when(col("q_ok") && col("d_ok") && col("c_ok"), 1))
            .as("n_qdc"))
        .select(expr(
          """stack(3,
            |  '1_quality',       n_total, n_q,
            |  '2_exact_dedup',   n_q,     n_qd,
            |  '3_decontaminate', n_qd,    n_qdc) AS (stage, n_in, n_out)"""
            .stripMargin))
        .withColumn("retention",
          floor(col("n_out") / (col("n_in") * lit(1.0)) * 1e6) / 1e6)
        .orderBy("stage")
    }),

    // ---- corpus-trained bigram LM scoring (oracle-checked): the
    // KenLM-perplexity-filter analog with exact integer-micro numerics —
    // the trained model is the bigram-count RELATION, inference is one
    // token-keyed shuffle + a per-doc aggregate, zero driver state.
    "q103_bigram_lm_score" -> ((s, dir) => {
      TextOps.bigramLmScore(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ---- corpus drift report (oracle-checked): crawl-over-crawl
    // distribution monitoring — per-source token-count histograms of two
    // snapshots (B = A with every 7th doc grown by 60 tokens), compared
    // as exact integer micro-share L1 shifts, no ln()-based PSI hazard.
    "q104_drift_report" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val withTok = (d: DataFrame) => d.select(col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      val snapA = withTok(docs)
      val snapB = withTok(docs.withColumn("text",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" x" * 60))).otherwise(col("text"))))
      TextOps.histogramDrift(snapA, snapB, "source", "n_tok",
          binWidth = 50L, nBins = 6)
        .orderBy("source", "bin")
    }),

    // ---- event-time tumbling window aggregation -----------------------------
    "q32_hourly_events" -> ((s, dir) => {
      events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total_value"))
        .orderBy("hour", "event_type")
    }),

    // ---- gap-based sessionization (window + cumulative sum) -----------------
    "q33_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gapMin = 30
      val newSession = when(
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser))
          > gapMin * 60 * 1000000L, 1).otherwise(0)
      events(s, dir)
        .withColumn("session_id",
          sum(newSession).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
        .orderBy("user_id", "session_id")
    }),

    // ---- semi-structured JSON extraction -------------------------------------
    "q34_json_extract" -> ((s, dir) => {
      events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // ---- sliding event-time windows (1h window / 15m slide) ------------------
    "q41_sliding_window" -> ((s, dir) => {
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double")
            .as("total_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy("window_start", "event_type")
    }),

    // ---- multimodal: binary payloads, metadata + format sniffing ------------
    "q35_media_meta" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(t(s, dir, "documents"),
        "doc_id", "text")
      Multimodal.withMediaMeta(media, "payload")
        .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
          col("format"))
        .orderBy("doc_id")
    }),

    // ---- multimodal: batched decode + feature extraction (oracle-checked:
    // the stub digest input is hex(payload), so the full feature vector —
    // dims, channels, luma, resize box — reproduces as sha256(hex(..))
    // arithmetic in DuckDB) ---------------------------------------------------
    "q36_image_features" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(t(s, dir, "documents"),
          "doc_id", "text")
        .select("doc_id", "payload")
      val feats = Multimodal.extractImageFeatures(media, "payload")
      Multimodal.resizePlan(feats, "width", "height", maxW = 256, maxH = 256)
        .select("doc_id", "width", "height", "channels", "mean_luma",
          "resized_width", "resized_height")
        .orderBy("doc_id")
    }),

    // ---- multimodal: REAL ImageIO decode (oracle-checked by round-trip
    // prediction): Spark encodes deterministic PNGs (affine-mod-256
    // pixels), decodes them back through the JDK's javax.imageio, and
    // reports header-parsed dims (IHDR words, pure codegen — no decode)
    // next to decoded dims and the exact-integer-sum mean luma. PNG is
    // lossless, so DuckDB predicts every value arithmetically from
    // doc_id without touching a codec — hash parity proves real pixels
    // were decoded, not stubbed.
    "q106_image_features_imageio" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
        .filter(col("doc_id") % 4 === 0)
      val media = Multimodal.syntheticRealPng(docs, "doc_id")
        .withColumn("header_width", Multimodal.pngHeaderWidth(col("payload")))
        .withColumn("header_height", Multimodal.pngHeaderHeight(col("payload")))
      Multimodal.extractImageFeaturesReal(media, "payload")
        .select(col("doc_id"), col("header_width"), col("header_height"),
          col("width"), col("height"), col("channels"), col("mean_luma"))
        .orderBy("doc_id")
    }),

    // ---- multimodal: REAL JDK audio decode (oracle-checked by round-trip
    // prediction, the audio twin of q106): Spark assembles deterministic
    // 16-bit PCM WAVs, decodes them back through javax.sound.sampled,
    // and reports the header-parsed sample rate (pure codegen) next to
    // decoded format, sample count, duration, and exact-integer mean
    // amplitude. PCM is lossless → DuckDB predicts every value from
    // doc_id without touching an audio library.
    "q107_audio_features_wav" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
        .filter(col("doc_id") % 4 === 1)
      val media = Multimodal.syntheticRealWav(docs, "doc_id")
        .withColumn("header_sample_rate",
          Multimodal.wavHeaderSampleRate(col("payload")))
      Multimodal.extractAudioFeatures(media, "payload",
          Multimodal.decodeAudioOrStub)
        .withColumn("duration_ms", call_function("div",
          col("n_samples") * lit(1000L), col("sample_rate").cast("long")))
        .select(col("doc_id"), col("header_sample_rate"), col("sample_rate"),
          col("channels"), col("n_samples"), col("duration_ms"),
          col("mean_abs"))
        .orderBy("doc_id")
    }),

    // ---- multimodal: REAL multi-frame decode (oracle-checked by
    // round-trip prediction — the video-shaped member of the q106/q107
    // family): Spark writes deterministic animated GIFs over an identity
    // grayscale palette (lossless regardless of writer palette order),
    // decodes every stored frame back through the JDK GIF reader, and
    // emits one row per frame. DuckDB predicts each frame's dims and
    // exact mean luma arithmetically from doc_id.
    "q108_video_frames_gif" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
        .filter(col("doc_id") % 4 === 2)
      val media = Multimodal.syntheticRealGif(docs, "doc_id")
      Multimodal.extractFrameFeatures(media, "payload")
        .select(col("doc_id"), col("frame_idx"), col("width"),
          col("height"), col("mean_luma"))
        .orderBy("doc_id", "frame_idx")
    }),

    // ---- unicode NFC normalization (oracle-checked): the normal-form-
    // first hygiene pass every byte-keyed operator depends on. Each
    // document gains a DECOMPOSED suffix (combining acute/ring/diaeresis
    // as separate codepoints) so the native graft_unicode_norm expression
    // does real composition work on every row; DuckDB's nfc_normalize is
    // the independent UAX #15 implementation the md5s must agree with.
    "q109_nfc_normalize" -> ((s, dir) => {
      val aug = t(s, dir, "documents")
        .withColumn("text", concat(col("text"),
          lit("\nCafe\u0301 A\u030A nai\u0308ve nr "),
          col("doc_id").cast("string")))
      TextOps.withNormalizedText(aug, "text", "NFC")
        .select(col("doc_id"),
          length(col("text")).cast("long").as("len_raw"),
          length(col("text_norm")).cast("long").as("len_nfc"),
          col("norm_changed"),
          md5(col("text_norm")).as("nfc_md5"))
        .orderBy("doc_id")
    }),

    // ---- CCNet-style normalized-key dedup (oracle-checked): paragraph
    // dedup under the aggressive public normalization (Wenzek et al.
    // 2020 — lowercase, de-accent, digits→0, punctuation→space). Three
    // surface-distinct suffix variants (decomposed uppercase, composed
    // lowercase, bare ASCII — different digits and punctuation) are
    // planted per doc_id%3 and MUST collapse to one key, so the
    // canonical-pick exercises real cross-variant collisions; the
    // shuffle carries only (key_md5, doc_id), never documents.
    "q110_ccnet_dedup" -> ((s, dir) => {
      val aug = t(s, dir, "documents")
        .withColumn("text", concat(col("text"), lit("\n"),
          when(col("doc_id") % 3 === 0,
            lit("Re\u0301sume\u0301 CAFE\u0301 42!"))
          .when(col("doc_id") % 3 === 1,
            lit("r\u00E9sum\u00E9 caf\u00E9 13?"))
          .otherwise(lit("resume cafe 00"))))
      val keyed = TextOps.withCcnetKey(aug, "text")
      val w = Window.partitionBy("key_md5").orderBy("doc_id")
      keyed
        .select(col("doc_id"), col("key_md5"),
          (row_number().over(w) === 1).as("is_canonical"))
        .orderBy("doc_id")
    }),

    // ---- control-char / zero-width cleanup (oracle-checked): the
    // encoding-damage census — C0 controls, DEL, zero-width set, U+FFFD
    // replacement scars — planted per doc (one extra ZWSP on even ids so
    // the removed-count varies) and stripped by one codegen'd regex
    // projection in both engines.
    "q111_control_clean" -> ((s, dir) => {
      val aug = t(s, dir, "documents")
        .withColumn("text", concat(col("text"), lit("\n"),
          lit("\u0007ok\u000Bzero\u200Bwidth\uFEFF end\u007F\uFFFD"),
          when(col("doc_id") % 2 === 0, lit("\u200B")).otherwise(lit(""))))
      TextOps.cleanControlChars(aug, "text")
        .select(col("doc_id"), col("n_ctl_removed"),
          length(col("text_clean")).cast("long").as("len_clean"),
          md5(col("text_clean")).as("clean_md5"))
        .orderBy("doc_id")
    }),

    // ---- int8 scalar-quantized top-k (oracle-checked): the 4×-memory ANN
    // scan — per-vector symmetric quantization, exact-long candidate dot
    // (native Int8DotExpr, bit-identical to the HOF fold), float rerank of
    // the candK shortlist only. No trained state and no float-ordering
    // hazard in the scan, so the whole pipeline hash-checks cross-engine
    // (unlike LSH/IVF, which need exemplar twins).
    "q112_topk_int8" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      Similarity.int8TopK(emb, queries, "vec_id", "embedding", k = 5,
          dim = 64, candK = 20, useNative = true)
        .orderBy("query_id", "rank")
    }),

    // ---- Matryoshka truncated-dim top-k (oracle-checked): prefix-16
    // cosine scan (4× less vector IO), full-64 exact rerank — like q112
    // deterministic end to end, so it hash-checks without an exemplar twin.
    "q115_topk_matryoshka" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      Similarity.truncatedTopK(emb, queries, "vec_id", "embedding", k = 5,
          dim = 64, prefixDim = 16, candK = 20, useNative = true)
        .orderBy("query_id", "rank")
    }),

    // ---- embedding-cosine near-dup: exact all-pairs (oracle-checked;
    // native DotExpr per pair — bit-identical, spec-pinned) -------------------
    "q37_cosine_near_dup" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      Dedup.cosineNearDupPairsExact(t(s, dir, "embeddings"),
          "vec_id", "embedding", minCosine = 0.4, useNative = true)
        .orderBy("id_a", "id_b")
    }),

    // ---- embedding-cosine near-dup: LSH-blocked (rows-only; spec-tested).
    // Native RhpSigExpr signatures (bit-identical to the HOF, spec-pinned).
    "q38_cosine_near_dup_lsh" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      Dedup.cosineNearDupPairsLsh(t(s, dir, "embeddings"),
          "vec_id", "embedding", minCosine = 0.4, nPlanes = 6, nTables = 8,
          useNative = true)
        .orderBy("id_a", "id_b")
    }),

    // ---- BPE merge-table training (rows-only + RowsOnlyPinSpec hash
    // gate — the iterative trainer is not expressible in one SQL
    // statement): Sennrich-style dictionary BPE, ONE corpus collapse to
    // (word, freq) then one aggregation per merge step; exact-long
    // counts + lexicographic ties make the table bit-deterministic.
    // BpeSpec pins the trainer against an independent plain-Scala
    // reference (the Lloyd-step non-circularity discipline).
    "q119_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      val merges = TextOps.trainBpeMerges(t(s, dir, "documents"), "text",
        nMerges = 16)
      merges.zipWithIndex
        .map { case ((l, r, c), i) => ((i + 1).toLong, l, r, c) }
        .toDF("rank", "left", "right", "cnt").orderBy("rank")
    }),

    // ---- BPE tokenization under a FIXED merge table (oracle-checked —
    // unlike q119's trainer, the APPLY side is one SQL statement: BPE
    // replay-in-rank-order over a delimiter-framed symbol string is a
    // chain of plain replace() calls, which the oracle builds literally;
    // the native BpeSegmentExpr must reproduce it hash-exact). Table is
    // consistent (each operand is a base char or an earlier merge's
    // output), where replay-in-order ≡ the lowest-rank-present loop.
    "q120_bpe_tokenize" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      TextOps.withBpeTokens(t(s, dir, "documents"), "text", Q120Merges)
        .select(col("doc_id"), col("n_bpe_tokens"),
          md5(concat_ws("", col("bpe_tokens"))).as("tokens_md5"))
        .orderBy("doc_id")
    }),

    // ---- vocabulary coverage report (oracle-checked): top-V corpus
    // tokens with cumulative ppm share — tokenizer-training precursor.
    // Top-V selection via the graft_top_k aggregate (O(V) state, no
    // global window over the distinct-token relation); the oracle uses
    // the window formulation, same contract as q48/q83/q90.
    "q118_vocab_coverage" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      TextOps.vocabularyCoverage(t(s, dir, "documents"), "text", topV = 100)
        .orderBy("rank")
    }),

    // ---- Gopher quality-rule bundle (oracle-checked): the seven
    // document filters of Rae et al. 2021, each decided in exact integer
    // arithmetic (cross-multiplied thresholds — no float in any
    // decision). Structure is planted per doc-id class (bullet lines /
    // ellipsis endings / symbol runs) so every rule fires both ways.
    "q114_gopher_rules" -> ((s, dir) => {
      val aug = t(s, dir, "documents")
        .withColumn("text",
          when(col("doc_id") % 7 === 0,
            concat(col("text"),
              lit("\n- bullet one\n- bullet two\n* bullet three")))
          .when(col("doc_id") % 7 === 1,
            concat(col("text"), lit("\nto be continued...\nand then…")))
          .when(col("doc_id") % 7 === 2,
            concat(col("text"), lit(" ## ### #### ##")))
          .otherwise(col("text")))
      TextOps.gopherRules(aug, "text")
        .select(col("doc_id"), col("n_words"), col("pass_word_count"),
          col("pass_mean_word_len"), col("pass_symbol_ratio"),
          col("pass_bullet"), col("pass_ellipsis"), col("pass_alpha"),
          col("pass_stopwords"), col("gopher_pass"))
        .orderBy("doc_id")
    }),

    // ---- cross-corpus overlap census from sketches (oracle-checked via
    // the q40 pattern): |A∩B| by inclusion-exclusion over HLL unions —
    // the decontamination census answered from two KB-sized indexes with
    // no join and no corpus re-scan. Overlap is planted (corpus B
    // re-includes sources 0-4) so the estimate has something to find;
    // the flag bounds it by 5% of the exact union.
    "q117_corpus_overlap" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("key", md5(col("text")))
      val srcNum = regexp_extract(col("source"), "\\d+", 0).cast("int")
      val aDocs = docs.filter(srcNum < 10)
      val bDocs = docs.filter(srcNum >= 10)
        .unionByName(docs.filter(srcNum < 5))
      val est = graft.ext.Sketches.overlapEstimate(
        graft.ext.Sketches.distinctSketches(aDocs, "key", "source"),
        graft.ext.Sketches.distinctSketches(bDocs, "key", "source"))
      val exactA = aDocs.agg(countDistinct(col("key")).as("exact_a"))
      val exactB = bDocs.agg(countDistinct(col("key")).as("exact_b"))
      val exactO = aDocs.select("key").distinct()
        .join(bDocs.select("key").distinct(), "key")
        .agg(count(lit(1)).as("exact_overlap"))
      exactA.crossJoin(exactB).crossJoin(exactO).crossJoin(est)
        .select(col("exact_a"), col("exact_b"), col("exact_overlap"),
          (abs(col("est_overlap") - col("exact_overlap")) <=
            ceil((col("exact_a") + col("exact_b") - col("exact_overlap")) *
              lit(0.05)).cast("long")).as("overlap_ok"))
    }),

    // ---- count-min frequency index (oracle-checked via the q40 tolerance
    // pattern): per-shard CMS sketches built by Spark's native aggregate,
    // merged driver-side (counter addition — EXACTLY the one-shot sketch,
    // SketchesSpec), probed by the native graft_cms_estimate projection.
    // The oracle predicts the exact counts and the one-sided error flag
    // (est in [exact, exact + ceil(eps·N)]), which CMS guarantees at
    // confidence 0.999 and which is deterministic at fixed seed/data.
    "q116_heavy_keys_cms" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val li = t(s, dir, "lineitem")
      val merged = graft.ext.Sketches.cmsCollectMerged(
        graft.ext.Sketches.cmsSketches(li, "l_partkey", "l_returnflag"))
      val totals = li.agg(count(lit(1)).as("n_total"))
      val cnt = li.groupBy("l_partkey").agg(count(lit(1)).as("exact_cnt"))
      // global window on the AGGREGATED per-key relation (tiny), not rows
      val w = Window.orderBy(col("exact_cnt").desc, col("l_partkey"))
      val est = graft.ext.Sketches.cmsEstimate(col("l_partkey"), merged)
      cnt.withColumn("rn", row_number().over(w)).filter(col("rn") <= 20)
        .drop("rn").crossJoin(totals)
        .select(col("l_partkey"), col("exact_cnt"),
          (est >= col("exact_cnt") &&
            est <= col("exact_cnt") +
              ceil(col("n_total") * lit(0.001)).cast("long")).as("est_ok"))
        .orderBy("l_partkey")
    }),

    // ---- persisted-shape shard distinct sketches (oracle-checked via the
    // q40 tolerance pattern): one DataSketches-HLL sketch per source shard
    // (the KB-sized persistable index — ext.Sketches), per-shard
    // estimates as pure projections, plus a "__all__" row whose estimate
    // comes from MERGING the shard sketches (hll_union_agg), never from
    // re-scanning keys — the mergeability that makes the index compose
    // across ingest batches at 100 TB (union ≡ one-shot, SketchesSpec).
    "q113_shard_distinct_sketch" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("key", md5(col("text")))
      val sk = graft.ext.Sketches.distinctSketches(docs, "key", "source")
      val exactShard = docs.groupBy(col("source"))
        .agg(countDistinct(col("key")).as("exact_distinct"))
      val shardRows = graft.ext.Sketches.estimatePerShard(sk)
        .join(exactShard, col("shard") === col("source"))
        .select(col("source"), col("exact_distinct"),
          (abs(col("est_distinct") - col("exact_distinct")) <=
            col("exact_distinct") * 0.05).as("est_within_5pct"))
      val totalRow = graft.ext.Sketches.estimateUnion(sk)
        .crossJoin(docs.agg(countDistinct(col("key")).as("exact_distinct")))
        .select(lit("__all__").as("source"), col("exact_distinct"),
          (abs(col("est_distinct") - col("exact_distinct")) <=
            col("exact_distinct") * 0.05).as("est_within_5pct"))
      shardRows.unionByName(totalRow).orderBy("source")
    }),

    // ---- sketch aggregation: HLL approx-distinct (oracle-checked) ----------
    // approx and exact are SEPARATE aggregations joined on the group key:
    // a distinct aggregate alongside approx_count_distinct in one groupBy
    // forces an Expand whose first-stage aggregate keys on
    // (group, distinct-key) — every distinct key then carries its own
    // rsd=0.01 HLL++ sketch (~12 KB) in aggregation state. Measured at
    // sf0.1: 331 568 such groups → multi-GB agg state, sort-based
    // fallback, 490+ s. Split, the HLL sees |groups| buffers (3 here) and
    // the exact side is the standard two-level distinct rewrite. The
    // output exposes the exact count plus an error-bound flag (|approx −
    // exact| / exact ≤ 5% at rsd = 1%), which the DuckDB oracle can
    // predict exactly — making the sketch query hash-checkable.
    "q40_approx_distinct" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val approx = li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("exact_orders"))
      approx.join(exact, "l_returnflag")
        .select(col("l_returnflag"), col("exact_orders"),
          (abs(col("approx_orders") - col("exact_orders")) <=
            col("exact_orders") * 0.05).as("approx_within_5pct"))
        .orderBy("l_returnflag")
    }),

    // ---- deterministic train/val/test split (oracle-checked): assignment
    // is a pure function of (salt, id) — stable under corpus growth
    "q49_stable_split" -> ((s, dir) => {
      TextOps.stableSplit(t(s, dir, "documents"), "doc_id")
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"))
        .orderBy("split")
    }),

    // ---- TF-IDF top terms per document (oracle-checked): corpus-level
    // statistics — the df/idf side aggregates over the whole corpus while
    // staying one lazy plan (broadcast 1-row N, term-keyed shuffles)
    "q48_tfidf_topk" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      TextOps.tfidfTopTerms(t(s, dir, "documents"), "doc_id", "text", k = 5,
          useNative = true) // graft_top_k ranking — no window sort of the
        .orderBy("doc_id", "rank") // scored term relation (≡, spec-pinned)
    }),

    // ---- repetition quality signals (oracle-checked): top-token share +
    // duplicate-bigram fraction, the Gopher-style repetition filters.
    // Native shingling (bit-identical, spec-pinned) — the HOF bigram path
    // was the catalog's slowest remaining constant (4.8 s at sf0.1).
    "q47_repetition" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      TextOps.repetitionStats(t(s, dir, "documents"), "doc_id", "text",
          useNative = true)
        .orderBy("doc_id")
    }),

    // ---- corpus-wide line-level dedup (oracle-checked): the C4/
    // MassiveText hygiene pass — keep the globally FIRST occurrence of
    // every distinct line, reassemble documents from survivors. The
    // 3-line corpus is synthesized deterministically (full text + 50-char
    // prefix + a constant boilerplate line) so all three dedup regimes
    // occur: mostly-unique lines, heavily-shared prefixes, one
    // corpus-wide boilerplate line.
    "q50_line_dedup" -> ((s, dir) => {
      val multi = t(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n", col("text"), substring(col("text"), 1, 50),
          lit("graft boilerplate line")).as("text"))
      Dedup.dedupLines(multi, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ---- column profiler (oracle-checked): per-column census — counts,
    // null presence, distinct cardinality, min/max, exact median. The
    // data-quality profiling pass run before schema contracts are
    // declared. Exact `percentile` buffers each group's values (fine per
    // profiled column); q54 is the sketch-based scale path.
    "q51_column_profile" -> ((s, dir) => {
      val stacked = t(s, dir, "lineitem")
        .select(expr(
          """stack(3,
            |  'l_discount', l_discount,
            |  'l_extendedprice', l_extendedprice,
            |  'l_quantity', l_quantity) AS (col_name, value)""".stripMargin))
      // distinct count SPLIT from the other aggregates (q40's lesson):
      // together, the distinct rewrite's Expand doubles the rows feeding
      // the percentile's per-group value buffers
      val basic = stacked.groupBy("col_name")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("value")).as("n_present"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          round(expr("percentile(value, 0.5)"), 6).as("p50"))
      val distinct = stacked.groupBy("col_name")
        .agg(countDistinct(col("value")).as("n_distinct"))
      basic.join(distinct, "col_name")
        .select(col("col_name"), col("n_rows"), col("n_present"),
          col("n_distinct"), col("min_value"), col("max_value"), col("p50"))
        .orderBy("col_name")
    }),

    // ---- training-mixture report (oracle-checked): per-(source, lang)
    // document/token counts and each cell's share of the corpus token
    // budget — the table every data-mixing decision reads. One
    // partial-combinable aggregation; the share is a window over the
    // (tiny) aggregated result, never over raw rows.
    "q52_corpus_mixture" -> ((s, dir) => {
      // the global window rides the AGGREGATED relation (≤ |sources|×
      // |langs| rows — a mixture report is small-cardinality by
      // definition), not the corpus, so its single-partition exchange is
      // bounded at any data scale; PlanAudit's GLOBAL-WINDOW flag on this
      // query is expected and documented. The alternative (scalar total
      // cross-joined back) would recompute the aggregation subtree and
      // scan the corpus twice — strictly worse at 100 TB.
      t(s, dir, "documents")
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TextOps.tokens(col("text")))).as("n_tokens"))
        .withColumn("token_share",
          round(col("n_tokens") / sum(col("n_tokens")).over(Window.partitionBy()),
            6))
        .orderBy("source", "lang")
    }),

    // ---- duplicate-cluster resolution (oracle-checked): connected
    // components over the q25 near-dup edge set — pairs say A~B and B~C,
    // but the drop decision needs the {A,B,C} cluster. Iterative min-label
    // propagation (checkpointed rounds, converges in diameter rounds);
    // the DuckDB oracle walks the same graph with a recursive CTE.
    "q53_dup_clusters" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      val edges = Dedup.prefixBlockedNearDupPairs(docs, "doc_id", "text",
        prefixLen = 32, shingleN = 3, minJaccard = 0.5,
        maxBlockSize = 1000, useNative = true)
      graft.ext.Graph.connectedComponents(docs, "doc_id", edges, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("component").as("cluster_id"))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy("cluster_id")))
        .orderBy("doc_id")
    }),

    // ---- quantile sketch (oracle-checked): approx_percentile — bounded
    // state per group regardless of group size, the 100 TB answer to
    // q51's exact percentile. Output exposes the exact median (oracle-
    // checkable) plus an in-band flag pinning the sketch between the
    // exact 40th and 60th percentiles — at accuracy 10000 the rank error
    // is ~n/10000, orders of magnitude inside that band.
    "q54_quantile_sketch" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          // ONE percentile call for all three exact quantiles = one
          // value buffer per group, not three copies of it
          expr("percentile(l_extendedprice, array(0.4D, 0.5D, 0.6D))")
            .as("__p"),
          expr("approx_percentile(l_extendedprice, 0.5D, 10000)").as("__approx"))
        .select(col("l_returnflag"),
          round(element_at(col("__p"), 2), 6).as("p50_exact"),
          (col("__approx") >= element_at(col("__p"), 1) &&
            col("__approx") <= element_at(col("__p"), 3)).as("approx_in_band"))
        .orderBy("l_returnflag")
    }),

    // ---- token-budget mixture sampling (oracle-checked): downsample
    // each (source, lang) cell to a 120-token budget, consuming docs in
    // deterministic hash order — the reproducible mixture-construction
    // step between the q52 report and training
    "q57_budget_sample" -> ((s, dir) => {
      TextOps.sampleToTokenBudget(t(s, dir, "documents"), "doc_id", "text",
          groupCols = Seq("source", "lang"), budgetTokens = 120L)
        .select("doc_id", "source", "lang", "n_tokens", "cum_tokens")
        .orderBy("doc_id")
    }),

    // ---- sequence-packing layout (oracle-checked): per-source GPT-style
    // packing of the token stream into 512-token training sequences —
    // each doc mapped to the sequence span it lands in, deterministic
    // hash order, boundaries crossed mid-document as real packing does
    "q58_sequence_pack" -> ((s, dir) => {
      TextOps.packSequences(t(s, dir, "documents"), "doc_id", "text",
          groupCols = Seq("source"), windowTokens = 512)
        .select("doc_id", "source", "n_tokens", "start_tok",
          "seq_first", "seq_last")
        .orderBy("doc_id")
    }),

    // ---- as-of join (oracle-checked): each event picks its user's most
    // recent order at-or-before the event time; ties on o_orderdate break
    // to max o_orderkey. Union + running window = ONE key shuffle — never
    // the quadratic pair join the naive inequality formulation plans.
    "q59_asof_join" -> ((s, dir) => {
      val e = events(s, dir).select("event_id", "user_id", "ts")
      val o = t(s, dir, "orders")
      TemporalJoin.asofJoin(e, o, "user_id", "o_custkey", "ts", "o_orderdate",
          rightCols = Seq("o_orderkey", "o_totalprice"),
          tieBreak = "o_orderkey")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("o_orderkey").as("last_orderkey"),
          col("o_totalprice").as("last_price"))
        .orderBy("event_id")
    }),

    // ---- set operations (oracle-checked): INTERSECT / EXCEPT both ways
    // between two id sets, tagged and reassembled — each set op is one
    // distinct-aggregate shuffle, no joins hand-rolled.
    "q67_set_ops" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val a = docs.filter(col("lang") === "en").select("doc_id")
      val b = docs.filter(col("n_chars") > 300).select("doc_id")
      a.intersect(b).withColumn("op", lit("both"))
        .unionByName(a.except(b).withColumn("op", lit("en_only")))
        .unionByName(b.except(a).withColumn("op", lit("long_only")))
        .orderBy("op", "doc_id")
    }),

    // ---- ranking-window battery (oracle-checked): the full analytic-
    // function surface over one per-key sorted window — rank, dense_rank,
    // ntile, percent_rank, cume_dist, lead-with-default, first/nth value.
    // One shuffle + one sort serves all eight functions.
    "q64_window_battery" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"),
        lead(col("o_orderkey"), 1, -1L).over(w).as("next_key"),
        first(col("o_orderkey")).over(w).as("first_key"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
        .orderBy("o_custkey", "rnk")
    }),

    // ---- ROLLUP with grouping indicators (oracle-checked): subtotal
    // lattice in ONE aggregation pass (Catalyst expands grouping sets
    // map-side; partials combine per set) instead of N unioned scans.
    "q65_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          money(col("l_quantity")).as("sum_qty"),
          grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"), col("g_flag"), col("g_status"))
        .orderBy("rf", "ls")
    }),

    // ---- explicit GROUPING SETS (oracle-checked): completes the lattice
    // trio (rollup q65, cube q68) with an arbitrary set list over the
    // region⊃nation dimension star — (region, nation), (region), ().
    // One Expand + one shuffle like rollup; dims broadcast onto orders.
    "q102_grouping_sets" -> ((s, dir) => {
      val j = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
      j.groupingSets(
          Seq(Seq(col("r_name"), col("n_name")), Seq(col("r_name")), Seq()),
          col("r_name"), col("n_name"))
        .agg(money(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"),
          grouping(col("r_name")).cast("long").as("g_region"),
          grouping(col("n_name")).cast("long").as("g_nation"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("revenue"), col("n_orders"), col("g_region"), col("g_nation"))
        .orderBy("region", "nation")
    }),

    // ---- unpivot / melt (oracle-checked): the inverse of q66 —
    // wide per-status counts back to (priority, status, n) long form via
    // the native Dataset.unpivot (an Expand projection, zero shuffle on
    // top of the aggregate that built the wide frame).
    "q105_unpivot" -> ((s, dir) => {
      val wide = t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
      wide.unpivot(Array(col("o_orderpriority")),
          Array(col("O"), col("F"), col("P")), "status", "n_orders")
        .withColumn("n_orders", coalesce(col("n_orders"), lit(0L)))
        .orderBy("o_orderpriority", "status")
    }),

    // ---- pivot / crosstab (oracle-checked): order counts + DECIMAL-exact
    // revenue per (priority x status) — pivot is a single groupBy whose
    // output width is the pivoted domain, still one shuffle.
    "q66_pivot" -> ((s, dir) => {
      val p = t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)).as("n"), money(col("o_totalprice")).as("price"))
      p.select(col("o_orderpriority"),
          coalesce(col("O_n"), lit(0L)).as("n_o"),
          coalesce(col("F_n"), lit(0L)).as("n_f"),
          coalesce(col("P_n"), lit(0L)).as("n_p"),
          col("O_price").as("price_o"),
          col("F_price").as("price_f"),
          col("P_price").as("price_p"))
        .orderBy("o_orderpriority")
    }),

    // ---- CUBE lattice (oracle-checked): all four grouping sets in one
    // pass — completes the grouping family next to q65's ROLLUP; partial
    // aggregation keeps the lattice at one shuffle.
    "q68_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          money(col("l_quantity")).as("sum_qty"),
          grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"), col("g_flag"), col("g_status"))
        .orderBy("rf", "ls", "g_flag", "g_status")
    }),

    // ---- RAG chunking (oracle-checked): overlapping 64-token windows
    // every 48 tokens — narrow transform, no shuffle; the oracle walks
    // the same start sequence with range() + list slicing.
    "q69_chunk_overlap" -> ((s, dir) => {
      TextOps.chunkTokens(t(s, dir, "documents"), "doc_id", "text",
          window = 64, stride = 48)
        .orderBy("doc_id", "chunk_idx")
    }),

    // ---- edit-distance near-dup pairs (oracle-checked): prefix-blocked
    // + length-band-prefiltered thresholded Levenshtein — the character-
    // level dedup family next to Jaccard/MinHash/SimHash.
    "q70_edit_distance" -> ((s, dir) => {
      Dedup.editDistanceNearDupPairs(t(s, dir, "documents"), "doc_id",
          "text", prefixLen = 32, maxDist = 40)
        .orderBy("id_a", "id_b")
    }),

    // ---- canonical-document selection (oracle-checked): near-dup
    // clusters (q53's components) resolved to their highest-quality
    // member — the keep-best curation policy, composed from three
    // operators (blocked near-dup pairs → connected components →
    // windowed argmax pick).
    "q71_canonical_doc" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      val edges = Dedup.prefixBlockedNearDupPairs(docs, "doc_id", "text",
        prefixLen = 32, shingleN = 3, minJaccard = 0.5,
        maxBlockSize = 1000, useNative = true)
      val scored = docs.withColumn("quality",
        TextOps.qualityScore(col("text")))
      Dedup.canonicalDocs(scored, "doc_id", "quality", edges, "id_a", "id_b")
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          col("is_canonical"), col("canonical_id"), col("quality"))
        .orderBy("doc_id")
    }),

    // ---- character-entropy quality signal (oracle-checked): bucketed
    // Shannon entropy as ONE codegen'd projection — no per-character
    // explode, no shuffle, fixed fold order for engine parity.
    "q72_char_entropy" -> ((s, dir) => {
      TextOps.withCharEntropy(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("entropy"))
        .orderBy("doc_id")
    }),

    // ---- per-group z-score outliers (oracle-checked): DECIMAL-exact
    // Σx/Σx² per group, stats broadcast back, codegen'd z filter — the
    // generalized numeric data-quality rule (SURVEY §2 F5's fixed `< 0`
    // predicate, upgraded to distribution-aware).
    "q73_zscore_outliers" -> ((s, dir) => {
      graft.ext.Outliers.zscoreOutliers(events(s, dir), "event_type",
          "value", threshold = 3.0)
        .select("event_id", "event_type", "value", "z")
        .orderBy("event_id")
    }),

    // ---- six-table star join, TPC-H Q5 shape (oracle-checked): selective
    // region + date filters, co-nation customer/supplier constraint,
    // broadcast dims — the relational depth probe for join planning.
    "q74_regional_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(dec4)).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(desc("revenue"), col("n_name"))
    }),

    // ---- distributed spherical k-means (rows-only; Lloyd over the FULL
    // corpus, not a driver sample — per-(list,dim) DECIMAL sums make the
    // model bit-deterministic; IvfSpec pins determinism + cluster
    // quality). Output: per-cluster size and mean cosine to centroid.
    "q75_kmeans" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val dim = 64
      val centroids = graft.ext.Ivf.trainCentroidsLloyd(
        emb, "embedding", nList = 8, dim = dim, iters = 2)
      val cents: Seq[Seq[Double]] =
        centroids.grouped(dim).map(_.toSeq).toSeq
      val vd = transform(col("embedding"), x => x.cast("double"))
      val nrm = sqrt(aggregate(vd, lit(0.0d), (acc, x) => acc + x * x))
      val list = element_at(
        graft.ext.Ivf.assignLists(col("embedding"), centroids, dim, 1), 1)
      val cvec = element_at(typedlit(cents), list + 1)
      val cos = aggregate(zip_with(vd, cvec, (a, b) => a * b),
        lit(0.0d), (acc, x) => acc + x) / when(nrm > 0.0, nrm).otherwise(1.0)
      emb.select(list.cast("long").as("cluster_id"), cos.as("__cos"))
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n"),
          (sum(col("__cos").cast(DecimalType(30, 12))).cast("double") /
            count(lit(1))).as("mean_cos"))
        .select(col("cluster_id"), col("n"), round(col("mean_cos"), 4).as("mean_cos"))
        .orderBy("cluster_id")
    }),

    // ---- correlated-aggregate filter, TPC-H Q17 shape (oracle-checked):
    // rows below 20% of their PART's average quantity. Spark-first
    // decorrelation: the per-part average is an explicit aggregate
    // joined back — the exact plan a correlated scalar subquery
    // decorrelates to, with the DECIMAL-exact average both engines
    // reproduce bit-for-bit.
    "q76_small_order_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val partAvg = li.groupBy("l_partkey")
        .agg((sum(col("l_quantity").cast(dec2)).cast("double") /
          count(lit(1))).as("avg_qty"))
      li.join(partAvg, "l_partkey")
        .filter(col("l_quantity") < col("avg_qty") * 0.2)
        .groupBy("l_returnflag")
        .agg(money(col("l_extendedprice")).as("total_price"),
          count(lit(1)).as("n_small"))
        .orderBy("l_returnflag")
    }),

    // ---- prequential anomaly scan (oracle-checked): the BATCH form of
    // streaming/AnomalyDetect — each event z-scored against the running
    // moments of all PRIOR events of its type via an unbounded-preceding
    // window frame. Running sums go through DECIMAL so the fold is
    // order-independent inside each engine's frame implementation
    // (DuckDB's segment-tree combine vs Spark's incremental fold would
    // otherwise diverge in the last ulp).
    "q77_prequential_anomaly" -> ((s, dir) => {
      graft.ext.Outliers.prequentialOutliers(events(s, dir), "event_type",
          Seq("ts", "event_id"), "value", threshold = 3.0, minPrior = 30)
        .select("event_id", "event_type", "value", "n_prior", "z")
        .orderBy("event_id")
    }),

    // ---- k-step funnel conversion (oracle-checked): first-touch,
    // strictly-ordered view → click → purchase over the event log; one
    // tiny (user, t_step) relation per step, never a row-to-row
    // self-join.
    "q80_funnel" -> ((s, dir) => {
      graft.ext.Funnel.conversion(events(s, dir), "user_id", "event_type",
          "ts", Seq("view", "click", "purchase"))
        .orderBy("step")
    }),

    // ---- time-series gap fill (oracle-checked): hourly grid per
    // event_type, forward-filled by one union + one window pass — the
    // as-of lookup without a per-grid-point probe join.
    "q82_gap_fill" -> ((s, dir) => {
      graft.ext.TimeSeries.forwardFillGrid(events(s, dir), "event_type",
          "ts", "value", "event_id", step = "1 hour")
        .orderBy("event_type", "grid_ts")
    }),

    // ---- retention cohorts (oracle-checked): users bucketed by
    // first-seen day × activity-day offset — the companion analytics
    // staple to q80's funnel; two aggregations and one join, all keyed.
    "q81_retention" -> ((s, dir) => {
      val ev = events(s, dir)
      val firstSeen = ev.groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("cohort_day"))
      ev.select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .join(firstSeen, "user_id")
        .withColumn("day_offset",
          datediff(col("day"), col("cohort_day")).cast("long"))
        .groupBy("cohort_day", "day_offset")
        .agg(countDistinct("user_id").as("n_active"))
        // dates surface as ISO strings: pandas reads a parquet DATE and a
        // DuckDB DATE into different dtypes, so the gate would miscompare
        .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          col("day_offset"), col("n_active"))
        .orderBy("cohort_day", "day_offset")
    }),

    // ---- IVF-PQ ANN (rows-only; recall + parity spec-pinned): the
    // storage-changing index family — corpus vectors compressed to m=8
    // codes, candidates scored by native ADC table gathers without ever
    // touching raw vectors, exact cosine rerank of the shortlist only.
    "q79_topk_ivfpq" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      graft.ext.Pq.ivfPqTopK(emb, queries, "vec_id", "embedding", k = 5,
          nList = 32, nProbe = 8, m = 8, ksub = 64, dim = 64,
          sampleSize = 4000, iters = 8)
        .orderBy("query_id", "rank")
    }),

    // ---- deterministic weighted sample (oracle-checked): Efraimidis-
    // Spirakis priorities from (salt, id)-derived uniforms — sampling
    // ∝ n_chars per language, reproducible across engines and runs.
    "q78_weighted_sample" -> ((s, dir) => {
      TextOps.weightedSample(t(s, dir, "documents"), "doc_id", "n_chars",
          Seq("lang"), k = 25)
        .select("lang", "doc_id", "n_chars", "sample_rank")
        .orderBy("lang", "sample_rank")
    }),

    // ---- deterministic stratified sample (oracle-checked): 20 docs per
    // language, ranked by md5(salt:id) — reproducible, engine-independent,
    // one shuffle on the stratum key
    "q62_stratified_sample" -> ((s, dir) => {
      TextOps.stratifiedSample(t(s, dir, "documents"), "lang", "doc_id",
          perStratum = 20)
        .select("lang", "doc_id", "rank")
        .orderBy("lang", "rank")
    }),

    // ---- LLM curation pipeline end-to-end (oracle-checked): ONE lazy
    // plan composing the whole pretraining-data flow — language filter →
    // quality gate (token count + integer-exact stopword threshold) →
    // exact dedup keep-first → 8-gram benchmark decontamination →
    // deterministic split → per-split census. The integration query for
    // the ext/ operator family, like q42 is for the reference's ETL.
    "q63_curation_e2e" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 31 === 0)
      val cleaned = docs
        .filter(col("doc_id") % 31 =!= 0 && col("lang") === "en")
        .withColumn("n_toks", TextOps.tokenCount(col("text")))
        .filter(col("n_toks").between(20, 2000))
        .withColumn("n_stop",
          TextOps.stopwordCount(col("text"), TextOps.Stopwords("en")))
        .filter(col("n_stop") * 25 > col("n_toks")) // ratio > 0.04, int-exact
      val contaminated = Dedup.contaminationHits(cleaned, "doc_id", "text",
          bench, shingleN = 8, useNative = true).select("doc_id")
      val kept = cleaned.withColumn("h", sha2(col("text"), 256))
        .groupBy("h")
        .agg(min(col("doc_id")).as("doc_id"), min(col("n_toks")).as("n_toks"))
        .join(contaminated, Seq("doc_id"), "left_anti")
      TextOps.stableSplit(kept, "doc_id")
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("sum_tokens"),
          min(col("doc_id")).as("min_id"))
        .orderBy("split")
    }),

    // ---- exact heavy hitters in bounded memory (oracle-checked): native
    // Misra-Gries candidate sketch (O(k) state per partial buffer — never
    // a full-vocabulary shuffle) + exact recount of the ≤k candidates.
    // Result is identical to GROUP BY token HAVING n > total/(k+1).
    "q61_heavy_hitters" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      TextOps.heavyHitters(t(s, dir, "documents"), "text", k = 50)
        .orderBy(desc("n"), col("token"))
    }),

    // ---- point-in-range join (oracle-checked): orders matched to 60
    // overlapping 30-day promo periods generated from spark.range. Each
    // interval explodes to its covering 30-day buckets → plain equi-join
    // + refine, never a BroadcastNestedLoopJoin.
    "q60_range_join" -> ((s, dir) => {
      val day0 = lit(9131L) // epoch day of 1995-01-01
      val periods = s.range(60).select(col("id").as("period_id"),
        (day0 + col("id") * 14).as("lo"),
        (day0 + col("id") * 14 + 30).as("hi"))
      val pts = t(s, dir, "orders").withColumn("d",
        datediff(col("o_orderdate").cast("date"),
          to_date(lit("1970-01-01"))).cast("long"))
      TemporalJoin.rangeJoinByBucket(pts, "d", periods, "lo", "hi",
          bucketWidth = 30L)
        .groupBy("period_id")
        .agg(count(lit(1)).as("n_orders"),
          money(col("o_totalprice")).as("revenue"))
        .orderBy("period_id")
    }),

    // ---- semantic dedup, SemDeDup-style (rows-only; superset-of-exact
    // and parity bounds spec-tested): IVF-cluster the embedding space,
    // drop vectors with a lower-id cluster-mate at cosine >= 0.4 — the
    // all-pairs rule's cost collapses from O(n²) to Σ|cluster|².
    "q56_semantic_dedup" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      Dedup.semanticDedupKeptIds(t(s, dir, "embeddings"), "vec_id",
          "embedding", minCosine = 0.4, nList = 32)
        .orderBy("vec_id")
    }),

    // ---- SemDeDup, oracle-checked member (hash-checked): exemplar
    // centroids (k lowest-id vectors, Forgy init without Lloyd) make
    // every stage plain relational algebra, so the cluster-then-
    // dedup-within-cluster shape itself is verified cross-engine; q56
    // keeps the trained-quantizer variant (rows-only, parity-bounded)
    "q84_semantic_dedup_exemplar" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      Dedup.semanticDedupKeptIdsExemplar(t(s, dir, "embeddings"), "vec_id",
          "embedding", minCosine = 0.4, k = 8)
        .orderBy("vec_id")
    }),

    // ---- decontamination at scale (oracle-checked): same relation as
    // q46, but the corpus side passes a distributed-built Bloom filter of
    // the bench shingles BEFORE any shuffle — only true hits + ~1% false
    // positives reach the exact verify join. No false negatives, so the
    // result — and the oracle — are exactly q46's.
    "q55_contamination_bloom" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      Dedup.contaminationHitsBloom(
          docs.filter(col("doc_id") % 31 =!= 0), "doc_id", "text",
          bench = docs.filter(col("doc_id") % 31 === 0),
          shingleN = 8, expectedItems = 200000L, fpp = 0.01,
          useNative = true)
        .orderBy("doc_id")
    }),

    // ---- PII census (oracle-checked): engine-portable regex patterns,
    // synthetic injections so every counter exercises a non-zero path
    "q45_pii_scan" -> ((s, dir) => {
      val aug = t(s, dir, "documents")
        .withColumn("text",
          when(col("doc_id") % 13 === 0,
            concat(col("text"), lit(" contact: user13@example.com" +
              " via https://ex.example/path from 10.0.0.1")))
            .otherwise(col("text")))
      TextOps.withPiiCounts(aug, "text")
        .select(col("doc_id"), col("n_email").cast("long").as("n_email"),
          col("n_url").cast("long").as("n_url"),
          col("n_ipv4").cast("long").as("n_ipv4"), col("has_pii"))
        .orderBy("doc_id")
    }),

    // ---- benchmark decontamination (oracle-checked): docs sharing any
    // distinct 8-gram with the held-out corpus (doc_id % 31 = 0), with the
    // per-document overlap count. One shingle-key equi-join — shuffles
    // carry shingles, never documents.
    "q46_contamination" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      Dedup.contaminationHits(
          docs.filter(col("doc_id") % 31 =!= 0), "doc_id", "text",
          bench = docs.filter(col("doc_id") % 31 === 0),
          shingleN = 8, useNative = true)
        .orderBy("doc_id")
    }),

    // ---- skew-mitigated aggregation (oracle-checked): the salted two-stage
    // agg must equal the plain GROUP BY — l_returnflag has only 3 values,
    // exactly the hot-key shape where one reducer would take the whole
    // table; salting spreads each key over 16 partials first.
    "q44_salted_agg" -> ((s, dir) => {
      graft.ops.Skew.saltedAgg(t(s, dir, "lineitem"),
          keys = Seq("l_returnflag"), saltBuckets = 16,
          aggs = Map(
            "l_quantity" -> ((c: Column) => sum(c.cast(dec2)),
                             (c: Column) => sum(c)),
            "l_orderkey" -> ((c: Column) => count(c),
                             (c: Column) => sum(c))))
        .select(col("l_returnflag"),
          col("l_quantity").cast("double").as("sum_qty"),
          col("l_orderkey").cast("long").as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // ---- end-to-end pipeline composition (oracle-checked): quality rules
    // (PK + FK against a restricted parent) -> FK-ordered incremental merge,
    // in ONE lazy plan — the full §3.1 process() shape over real tables.
    // Customers pointing at filtered-out nations are FK-dropped by the rule
    // stage, so they land in the merge's delete class; changed acctbals
    // land in updates; keys absent from existing land in inserts.
    "q42_pipeline_e2e" -> ((s, dir) => {
      val nation = t(s, dir, "nation").filter(col("n_nationkey") < 20)
      val base = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      val incoming = base.withColumn("c_acctbal",
        when(col("c_custkey") % 7 === 0, col("c_acctbal") * 2.0)
          .otherwise(col("c_acctbal")))
      val existing = base.filter(col("c_custkey") % 3 =!= 0)
        .withColumn("updated_at", lit("2020-01-01 00:00:00").cast("timestamp"))
        .withColumn("is_deleted", col("c_custkey") % 11 === 0)
      val configs = Seq(
        TableConfig("nation",
          Seq(ColumnSpec("n_nationkey", LongType, primaryKey = true))),
        TableConfig("customer", Seq(
          ColumnSpec("c_custkey", LongType, primaryKey = true),
          ColumnSpec("c_nationkey", LongType),
          ColumnSpec("c_acctbal", DoubleType)),
          Seq(FkRef("c_nationkey", "nation", "n_nationkey"))))
      graft.pipeline.Pipeline.runOnRegistry(
          Map("nation" -> nation, "customer" -> incoming), configs,
          existing = Map("customer" -> existing),
          now = lit("2021-01-01 00:00:00").cast("timestamp"))
        .postStates("customer")
        .orderBy("c_custkey")
    }),

    // ---- multimodal: uniform frame-sampling plan -----------------------------
    "q39_frame_sample" -> ((s, dir) => {
      val videos = t(s, dir, "documents")
        .filter(col("doc_id") % 50 === 0)
        // duration divisible by the sample count => frame times exact in
        // both engines (no float-rounding divergence)
        .withColumn("duration_ms", col("n_chars") * 800)
      Multimodal.sampleFramePlan(videos, "duration_ms", n = 8)
        .select("doc_id", "duration_ms", "frame_idx", "frame_time_ms")
        .orderBy("doc_id", "frame_idx")
    }),

    // ---- top-k per group WITHOUT a window sort (oracle-checked): top-5
    // customers by order revenue per nation via the native graft_top_k
    // aggregate — O(k) state per group, map-side partial combine, the
    // shuffle carries ≤k candidates per (partition, group) instead of
    // every scored row. The window formulation this replaces must shuffle
    // AND sort the full relation; spec pins the plan to zero Window
    // operators (TopKAggSpec).
    "q83_topk_per_group" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val rev = t(s, dir, "orders")
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey", "c_custkey")
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("revenue"))
      rev.groupBy("c_nationkey")
        .agg(call_function("graft_top_k",
          col("revenue"), col("c_custkey"), lit(5)).as("top"))
        .select(col("c_nationkey"),
          posexplode(col("top")).as(Seq("pos", "s")))
        .select(col("c_nationkey"),
          (col("pos") + 1).cast("long").as("rank"),
          col("s.payload").as("c_custkey"), col("s.ord").as("revenue"))
        .orderBy("c_nationkey", "rank")
    })
  )

  /** Two deterministic snapshots of `orders` used by the merge queries:
    * existing = keys ∤3, incoming = keys ∤5 with ~1/7 of prices changed —
    * yielding non-trivial insert/update/delete/unchanged classes from
    * read-only test data.
    */
  private def mergeSnapshots(orders: DataFrame): (DataFrame, DataFrame) = {
    val base = orders.select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"))
    val existing = base.filter(col("o_orderkey") % 3 =!= 0)
    val incoming = base.filter(col("o_orderkey") % 5 =!= 0)
      // * 2.0 is exact in IEEE double — unlike round(x*1.1, 2), whose
      // half-way cases round differently across engines
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 2.0)
          .otherwise(col("o_totalprice")))
    (existing, incoming)
  }

  // ============================================================== oracles

  /** Shared CTE prefix for the merge-family oracles (must mirror
    * `mergeSnapshots` exactly).
    */
  private val mergeCtes: String =
    """WITH existing AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice,
      |         TIMESTAMP '2020-01-01 00:00:00' AS updated_at,
      |         (o_orderkey % 11 = 0) AS is_deleted
      |  FROM orders WHERE o_orderkey % 3 <> 0),
      |incoming AS (
      |  SELECT o_orderkey, o_orderstatus,
      |         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2.0
      |              ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 5 <> 0),
      |updated AS (
      |  SELECT i.o_orderkey, i.o_orderstatus, i.o_totalprice, e.is_deleted
      |  FROM incoming i JOIN existing e USING (o_orderkey)
      |  WHERE (i.o_orderstatus IS DISTINCT FROM e.o_orderstatus)
      |     OR (i.o_totalprice IS DISTINCT FROM e.o_totalprice)),
      |deleted AS (
      |  SELECT e.* FROM existing e
      |  WHERE NOT EXISTS (SELECT 1 FROM incoming i
      |                    WHERE i.o_orderkey = e.o_orderkey)
      |    AND NOT e.is_deleted)
      |""".stripMargin

  /** DuckDB SQL for q72, generated so it mirrors
    * [[TextOps.charEntropy]] bucket-for-bucket: same [a-z0-9 space]
    * alphabet, same `length − length(replace(…))` counts, same
    * "other" bucket, and — critically for float parity — the same
    * left-to-right fold order over the 38 entropy terms.
    */
  private lazy val entropyOracleSql: String = {
    val alphabet = (('a' to 'z') ++ ('0' to '9')).map(_.toString) :+ " "
    def cnt(ch: String) = s"(length(t) - length(replace(t, '$ch', '')))"
    val counts = alphabet.map(cnt)
    val other = s"(length(t) - (${counts.mkString(" + ")}))"
    def term(c: String) =
      s"(CASE WHEN $c > 0 THEN -($c::DOUBLE / length(t)) * ln($c::DOUBLE / length(t)) ELSE 0.0 END)"
    val sumTerms = (counts :+ other).map(term).mkString(" + ")
    s"""WITH lo AS (SELECT doc_id, lower(text) AS t FROM documents)
       |SELECT doc_id,
       |  CASE WHEN length(t) > 0 THEN round($sumTerms, 6) ELSE 0.0 END AS entropy
       |FROM lo ORDER BY doc_id""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS BIGINT) AS qty_int,
        |  CAST(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS disc_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount > 0.05 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_revenue_nation" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q04_orders_no_lineitem" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q05_semi_join_bigqty" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin,

    "q06_fk_violations" ->
      """SELECT 'lineitem' AS "table", 'foreign_key' AS rule, 'l_partkey' AS "column",
        |  concat_ws('|', l_orderkey, l_linenumber) AS record_key,
        |  'dangling foreign key value=' || CAST(l_partkey AS VARCHAR) AS detail
        |FROM lineitem
        |WHERE l_partkey IS NOT NULL AND NOT EXISTS (
        |  SELECT 1 FROM part p WHERE p.p_size < 48 AND p.p_partkey = lineitem.l_partkey)
        |ORDER BY record_key""".stripMargin,

    "q07_dup_keys" ->
      """SELECT l_orderkey, count(*) AS dup_count FROM lineitem
        |GROUP BY l_orderkey HAVING count(*) > 1 ORDER BY l_orderkey""".stripMargin,

    "q08_dedup_keep_first" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
        |QUALIFY row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) = 1
        |ORDER BY l_orderkey""".stripMargin,

    "q09_dim_surrogate" ->
      """SELECT row_number() OVER (ORDER BY c_nationkey, c_mktsegment) AS dim_id,
        |  c_nationkey, c_mktsegment
        |FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
        |ORDER BY dim_id""".stripMargin,

    "q10_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn, lag(o_totalprice, 1) OVER w AS prev_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,

    "q11_changed_rows" -> (mergeCtes +
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM updated
        |ORDER BY o_orderkey""".stripMargin),

    "q12_merge_post_state" -> (mergeCtes +
      """, merged AS (
        |  SELECT i.o_orderkey, i.o_orderstatus, i.o_totalprice,
        |         TIMESTAMP '2021-01-01 00:00:00' AS updated_at, false AS is_deleted
        |  FROM incoming i
        |  WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.o_orderkey = i.o_orderkey)
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |         TIMESTAMP '2021-01-01 00:00:00', is_deleted
        |  FROM updated
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |         TIMESTAMP '2021-01-01 00:00:00', true
        |  FROM deleted
        |  UNION ALL
        |  SELECT e.* FROM existing e
        |  WHERE NOT EXISTS (SELECT 1 FROM updated u WHERE u.o_orderkey = e.o_orderkey)
        |    AND NOT EXISTS (SELECT 1 FROM deleted d WHERE d.o_orderkey = e.o_orderkey))
        |SELECT * FROM merged ORDER BY o_orderkey""".stripMargin),

    "q13_scd2_history" -> (mergeCtes +
      """, hist AS (
        |  SELECT e.o_orderkey, e.o_orderstatus, e.o_totalprice, e.is_deleted,
        |         e.updated_at AS valid_from,
        |         TIMESTAMP '2021-01-01 00:00:00' AS valid_to
        |  FROM existing e JOIN updated u USING (o_orderkey)
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, true,
        |         updated_at, TIMESTAMP '2021-01-01 00:00:00'
        |  FROM deleted)
        |SELECT * FROM hist ORDER BY o_orderkey""".stripMargin),

    "q14_null_census" ->
      """SELECT count(*) - count(o_orderkey) AS o_orderkey,
        |  count(*) - count(o_custkey) AS o_custkey,
        |  count(*) - count(o_orderstatus) AS o_orderstatus,
        |  count(*) - count(CASE WHEN o_totalprice > 300000 THEN NULL ELSE o_totalprice END) AS o_totalprice,
        |  count(*) - count(o_orderdate) AS o_orderdate,
        |  count(*) - count(nullif(o_orderpriority, '1-URGENT')) AS o_orderpriority
        |FROM orders ORDER BY 1""".stripMargin,

    "q15_ship_before_order" ->
      """SELECT o_orderkey, l_linenumber, o_orderdate, l_shipdate
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate IS NOT NULL AND l_shipdate IS NOT NULL
        |  AND o_orderdate > l_shipdate
        |ORDER BY o_orderkey, l_linenumber""".stripMargin,

    "q16_negative_balance" ->
      """SELECT 'customer' AS "table", 'negative_values' AS rule, col AS "column",
        |  c_custkey AS record_key,
        |  'negative value=' || CAST(val AS VARCHAR) AS detail
        |FROM (
        |  SELECT 'c_custkey' AS col, c_custkey, CAST(c_custkey AS DOUBLE) AS val
        |  FROM customer WHERE c_custkey < 0
        |  UNION ALL
        |  SELECT 'c_nationkey', c_custkey, CAST(c_nationkey AS DOUBLE)
        |  FROM customer WHERE c_nationkey < 0
        |  UNION ALL
        |  SELECT 'c_acctbal', c_custkey, c_acctbal
        |  FROM customer WHERE c_acctbal < 0)
        |ORDER BY "column", record_key""".stripMargin,

    "q17_emoji_scan" ->
      """SELECT CAST(NULL AS VARCHAR) AS "table", CAST(NULL AS VARCHAR) AS rule,
        |  CAST(NULL AS VARCHAR) AS "column", CAST(NULL AS VARCHAR) AS record_key,
        |  CAST(NULL AS VARCHAR) AS detail
        |FROM documents
        |WHERE regexp_matches(text, '[\x{1F600}-\x{1F64F}\x{1F300}-\x{1F5FF}\x{1F680}-\x{1F6FF}\x{1F1E0}-\x{1F1FF}\x{2700}-\x{27BF}\x{24C2}-\x{1F251}]')
        |   OR regexp_matches(lang, '[\x{1F600}-\x{1F64F}]')
        |ORDER BY record_key""".stripMargin,

    "q18_chronology" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderdate AS purchase,
        |    CASE WHEN o_orderkey % 5 = 0 THEN NULL
        |         ELSE o_orderdate + (o_orderkey % 7 - 3) * INTERVAL 1 DAY END AS approved,
        |    CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |         ELSE o_orderdate + 2 * INTERVAL 1 DAY END AS carrier,
        |    o_orderdate + (o_orderkey % 11 - 2) * INTERVAL 1 DAY AS delivered
        |  FROM orders),
        |packed AS (
        |  SELECT o_orderkey, list_filter([
        |      struct_pack(name := 'purchase', ts := purchase),
        |      struct_pack(name := 'approved', ts := approved),
        |      struct_pack(name := 'carrier', ts := carrier),
        |      struct_pack(name := 'delivered', ts := delivered)
        |    ], e -> e.ts IS NOT NULL) AS p
        |  FROM base),
        |issues AS (
        |  SELECT o_orderkey, array_to_string(
        |    list_filter(
        |      list_transform(range(2, len(p) + 1),
        |        i -> CASE WHEN p[i].ts < p[i-1].ts
        |             THEN p[i].name || ' comes before ' || p[i-1].name END),
        |      x -> x IS NOT NULL), '; ') AS issues_str
        |  FROM packed WHERE len(p) >= 2)
        |SELECT o_orderkey, issues_str FROM issues
        |WHERE issues_str <> '' ORDER BY o_orderkey""".stripMargin,

    "q19_missing_required" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment,
        |  CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_nationkey END AS c_nationkey
        |FROM customer
        |WHERE c_custkey % 7 = 0 OR c_custkey % 11 = 0
        |ORDER BY c_custkey""".stripMargin,

    "q20_text_stats" ->
      """SELECT doc_id, length(text) AS n_chars_computed,
        |  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |  len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_distinct_tokens,
        |  round(len(list_distinct(string_split_regex(trim(text), '\s+')))::DOUBLE
        |    / len(string_split_regex(trim(text), '\s+')), 6) AS type_token_ratio,
        |  round((length(text) - (len(string_split_regex(trim(text), '\s+')) - 1))::DOUBLE
        |    / len(string_split_regex(trim(text), '\s+')), 6) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q21_stopword_ratio" ->
      """SELECT doc_id,
        |  round(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |        x -> x IN ('the','a','of','and','to','in','is','it','that','for')))::DOUBLE
        |    / greatest(len(string_split_regex(trim(lower(text)), '\s+')), 1), 6)
        |    AS en_stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Mirrors TextOps.languageId exactly: per-language stopword-token counts
    // (the regex-count formulation equals token∩words counting, as pinned by
    // q21), CJK evidence ×3, argmax with (score, lang) lexicographic
    // tie-break — list_max over structs is DuckDB's struct-ordering max,
    // identical to Spark's array_max over structs.
    "q22_language_id" ->
      """WITH tk AS (
        |  SELECT doc_id, lang AS labeled_lang, text,
        |    string_split_regex(trim(lower(text)), '\s+') AS toks
        |  FROM documents)
        |SELECT doc_id, labeled_lang,
        |  CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS predicted_lang
        |FROM (
        |  SELECT doc_id, labeled_lang,
        |    list_max([
        |      {'score': len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein','zu','mit','den','von'))), 'lang': 'de'},
        |      {'score': len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it','that','for'))), 'lang': 'en'},
        |      {'score': len(list_filter(toks, x -> x IN ('el','la','los','y','es','un','una','de','que','por'))), 'lang': 'es'},
        |      {'score': len(list_filter(toks, x -> x IN ('le','la','les','et','est','un','une','de','que','pour'))), 'lang': 'fr'},
        |      {'score': 3*length(regexp_replace(text, '[^\x{4E00}-\x{9FFF}]', '', 'g')), 'lang': 'zh'}
        |    ]) AS best
        |  FROM tk)
        |ORDER BY doc_id""".stripMargin,

    // Mirrors TextOps.qualityScore term by term (length band, capped lexical
    // diversity, punctuation penalty, stopword evidence with its inner
    // round-6, weights 0.4/0.3/0.2/0.1, outer round-6). Both engines fold
    // the weighted sum left-to-right over IEEE doubles.
    "q23_quality_score" ->
      """WITH tk AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS toks,
        |    string_split_regex(trim(lower(text)), '\s+') AS lotoks
        |  FROM documents)
        |SELECT doc_id,
        |  floor((
        |    (CASE WHEN length(text) BETWEEN 100 AND 10000 THEN 1.0
        |          WHEN length(text) BETWEEN 20 AND 99 THEN 0.5 ELSE 0.1 END) * 0.4
        |    + least(len(list_distinct(toks))::DOUBLE / greatest(len(toks), 1), 1.0) * 0.3
        |    + (1.0 - least(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))::DOUBLE
        |         / greatest(length(text), 1) * 5, 1.0)) * 0.2
        |    + least(round(len(list_filter(lotoks,
        |          x -> x IN ('the','a','of','and','to','in','is','it','that','for')))::DOUBLE
        |         / greatest(len(lotoks), 1), 6) * 5, 1.0) * 0.1
        |  ) * 1000000.0) / 1000000.0 AS quality
        |FROM tk ORDER BY doc_id""".stripMargin,

    "q24_exact_dedup" ->
      """SELECT sha256(text) AS content_hash, min(doc_id) AS doc_id,
        |  count(*) AS dup_count
        |FROM documents GROUP BY sha256(text) ORDER BY doc_id""".stripMargin,

    "q25_near_dup_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, substr(text, 1, 32) AS block,
        |    list_distinct(CASE WHEN len(toks) >= 3
        |      THEN list_transform(range(1, len(toks) - 1),
        |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |      ELSE [array_to_string(toks, ' ')] END) AS shingles
        |  FROM (SELECT doc_id, text,
        |        string_split_regex(trim(text), '\s+') AS toks FROM documents)
        |  QUALIFY count(*) OVER (PARTITION BY substr(text, 1, 32)) <= 1000)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(len(list_intersect(a.shingles, b.shingles))::DOUBLE /
        |    (len(a.shingles) + len(b.shingles)
        |     - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
        |FROM sh a JOIN sh b ON a.block = b.block AND a.doc_id < b.doc_id
        |WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE /
        |    (len(a.shingles) + len(b.shingles)
        |     - len(list_intersect(a.shingles, b.shingles))), 6) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // the portable minhash, value for value: md5-32 shingle hash mod p,
    // md5-derived affine coefficients (closed formula, same on the Spark
    // side), min per hash family, 16 bands of 4 banded by the VALUE
    // string, bucket-capped, exact-jaccard verified — identical pair set
    // by construction since signatures are bit-equal across engines
    "q26_minhash_near_dup" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(toks) >= 3
        |      THEN list_transform(range(1, len(toks) - 1),
        |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |      ELSE [array_to_string(toks, ' ')] END) AS shingles
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |        FROM documents)),
        |hs AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(s), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)),
        |coef AS (
        |  SELECT i,
        |    1 + ('0x' || substr(md5('graft:mh:a:' || i), 1, 8))::BIGINT % 2147483646 AS a,
        |    ('0x' || substr(md5('graft:mh:b:' || i), 1, 8))::BIGINT % 2147483647 AS b
        |  FROM (SELECT unnest(range(0, 64)) AS i)),
        |sig AS (
        |  SELECT doc_id, i, min((a * h + b) % 2147483647) AS sig
        |  FROM hs CROSS JOIN coef GROUP BY doc_id, i),
        |bandkey AS (
        |  SELECT doc_id, i // 4 AS band,
        |    string_agg(sig::VARCHAR, ',' ORDER BY i) AS bucket
        |  FROM sig GROUP BY doc_id, i // 4),
        |capped AS (
        |  SELECT doc_id, band, bucket FROM bandkey
        |  QUALIFY count(*) OVER (PARTITION BY band, bucket) <= 1000),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM capped a JOIN capped b ON a.band = b.band AND a.bucket = b.bucket
        |  WHERE a.doc_id < b.doc_id)
        |SELECT id_a, id_b,
        |  round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
        |    (len(sa.shingles) + len(sb.shingles)
        |      - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
        |FROM cand
        |JOIN sh sa ON sa.doc_id = cand.id_a
        |JOIN sh sb ON sb.doc_id = cand.id_b
        |WHERE round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
        |    (len(sa.shingles) + len(sb.shingles)
        |      - len(list_intersect(sa.shingles, sb.shingles))), 6) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // the portable simhash, bit for bit: per-token hash = md5 hex digits
    // 1-8 (hi) / 9-16 (lo), ±1 votes per bit over unnested tokens, strict
    // counter>0 sign rule, assembled per 32-bit half (no signed-64 shifts)
    "q27_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |hashed AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi,
        |    ('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo
        |  FROM toks),
        |votes AS (
        |  SELECT doc_id, b.b,
        |    sum(CASE WHEN b.b < 32 THEN (lo >> b.b) & 1
        |             ELSE (hi >> (b.b - 32)) & 1 END) AS ones,
        |    count(*) AS n
        |  FROM hashed, (SELECT unnest(range(0, 64)) AS b) b
        |  GROUP BY doc_id, b.b),
        |bits AS (
        |  SELECT doc_id, b,
        |    CASE WHEN 2 * ones > n THEN 1::BIGINT ELSE 0::BIGINT END AS bit
        |  FROM votes)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN b >= 32 THEN bit * (1::BIGINT << (b - 32))
        |      ELSE 0 END) AS BIGINT) AS simhash_hi,
        |  CAST(sum(CASE WHEN b < 32 THEN bit * (1::BIGINT << b)
        |      ELSE 0 END) AS BIGINT) AS simhash_lo
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // same md5-over-token-sequence pipeline as fingerprintPortable: 15 hex
    // digits = 60 bits, always in signed-BIGINT range on both engines
    "q28_fingerprint" ->
      """SELECT doc_id,
        |  ('0x' || substr(md5(array_to_string(
        |      string_split_regex(trim(text), '\s+'), ' ')), 1, 15))::BIGINT
        |    AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q29_token_estimate" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS n_tokens_est
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q30_topk_cosine" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
        |           FROM embeddings WHERE vec_id % 100 = 0),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    round(list_dot_product(q.qvec::DOUBLE[], e.embedding::DOUBLE[]) /
        |      (sqrt(list_dot_product(q.qvec::DOUBLE[], q.qvec::DOUBLE[])) *
        |       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6) AS sim
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS "rank",
        |  neighbor_id, sim
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5
        |ORDER BY query_id, "rank"""".stripMargin,

    "q32_hourly_events" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "q33_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q34_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
        |  CAST(max(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS max_k, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // sliding windows emulated relationally: each event belongs to exactly
    // 4 epoch-aligned 15-minute-stepped hour windows (same alignment Spark
    // uses for window())
    "q41_sliding_window" ->
      """SELECT TIMESTAMP '1970-01-01'
        |    + ((epoch_us(ts) // 900000000 - r.j) * 900) * INTERVAL 1 SECOND
        |    AS window_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events, range(4) r(j)
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    // payload = magic || utf8(text), magic by doc_id % 3 (mirrors
    // Multimodal.syntheticMedia); sniffing compares hex prefixes — same
    // longest-first cascade as Multimodal.sniffFormat.
    "q35_media_meta" ->
      """WITH media AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN '\x89\x50\x4E\x47'::BLOB || encode(text)
        |         WHEN doc_id % 3 = 1 THEN '\xFF\xD8\xFF'::BLOB || encode(text)
        |         ELSE encode(text) END AS payload
        |  FROM documents)
        |SELECT doc_id, octet_length(payload) AS n_bytes,
        |  CASE WHEN substr(hex(payload), 1, 8) = '89504E47' THEN 'png'
        |       WHEN substr(hex(payload), 1, 6) = 'FFD8FF' THEN 'jpeg'
        |       WHEN substr(hex(payload), 1, 8) = '52494646' THEN 'riff'
        |       WHEN substr(hex(payload), 1, 6) = '494433' THEN 'mp3'
        |       WHEN substr(hex(payload), 1, 8) = '4F676753' THEN 'ogg'
        |       WHEN substr(hex(payload), 1, 8) = '1A45DFA3' THEN 'mkv'
        |       ELSE 'unknown' END AS format
        |FROM media ORDER BY doc_id""".stripMargin,

    // the stub decode, digit for digit: u_i = byte i of
    // sha256(hex(payload)) (the stub digests the uppercase hex — hex() is
    // uppercase in both engines), then the same modular arithmetic and
    // thumbnail-fit resize. Pure IEEE ops, so doubles are bit-identical.
    "q36_image_features" ->
      """WITH media AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN '\x89\x50\x4E\x47'::BLOB || encode(text)
        |         WHEN doc_id % 3 = 1 THEN '\xFF\xD8\xFF'::BLOB || encode(text)
        |         ELSE encode(text) END AS payload
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, sha256(hex(payload)) AS d FROM media),
        |bytes AS (
        |  SELECT doc_id,
        |    ('0x' || substr(d, 1, 2))::BIGINT AS u0,
        |    ('0x' || substr(d, 3, 2))::BIGINT AS u1,
        |    ('0x' || substr(d, 5, 2))::BIGINT AS u2,
        |    ('0x' || substr(d, 7, 2))::BIGINT AS u3,
        |    ('0x' || substr(d, 9, 2))::BIGINT AS u4,
        |    ('0x' || substr(d, 11, 2))::BIGINT AS u5,
        |    ('0x' || substr(d, 13, 2))::BIGINT AS u6
        |  FROM u),
        |feat AS (
        |  SELECT doc_id,
        |    CAST(64 + ((u0 * 256 + u1) % 1857) AS INT) AS width,
        |    CAST(64 + ((u2 * 256 + u3) % 1017) AS INT) AS height,
        |    CAST(CASE WHEN u4 % 4 = 0 THEN 1 ELSE 3 END AS INT) AS channels,
        |    (u5 * 256 + u6) / 65535.0 AS mean_luma
        |  FROM bytes)
        |SELECT doc_id, width, height, channels, mean_luma,
        |  CAST(greatest(round(
        |    width * least(256.0 / width, 256.0 / height, 1.0)), 1) AS INT)
        |    AS resized_width,
        |  CAST(greatest(round(
        |    height * least(256.0 / width, 256.0 / height, 1.0)), 1) AS INT)
        |    AS resized_height
        |FROM feat ORDER BY doc_id""".stripMargin,

    // the real-decode round trip, predicted without a codec: pixel (x,y)
    // of doc_id's PNG is the affine-mod-256 triple the Spark side encoded,
    // PNG is lossless, and the decoder's luma is an exact integer sum —
    // so dims, header words, and mean luma are all plain arithmetic.
    "q106_image_features_imageio" ->
      """WITH ids AS (
        |  SELECT doc_id, 8 + doc_id % 5 AS w, 8 + doc_id % 3 AS h
        |  FROM documents WHERE doc_id % 4 = 0),
        |px AS (
        |  SELECT i.doc_id, i.w, i.h,
        |    299 * ((i.doc_id + 7 * gx.x + 13 * gy.y) % 256)
        |    + 587 * ((3 * i.doc_id + 5 * gx.x + 11 * gy.y) % 256)
        |    + 114 * ((7 * i.doc_id + 3 * gx.x + 17 * gy.y) % 256) AS luma_milli
        |  FROM ids i
        |  CROSS JOIN generate_series(0, 11) AS gx(x)
        |  CROSS JOIN generate_series(0, 9) AS gy(y)
        |  WHERE gx.x < i.w AND gy.y < i.h)
        |SELECT doc_id, w AS header_width, h AS header_height,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(3 AS INT) AS channels,
        |  SUM(luma_milli)::DOUBLE / (w * h * 255000)::DOUBLE AS mean_luma
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,

    // the audio round trip, predicted without a codec: sample i of
    // doc_id's WAV is floorMod(doc_id + 7919·i, 65536) − 32768, PCM is
    // lossless, and the decoder's mean amplitude is an exact integer
    // sum over |sample| — plain arithmetic end to end.
    "q107_audio_features_wav" ->
      """WITH ids AS (
        |  SELECT doc_id, 400 + (doc_id % 3) * 200 AS n
        |  FROM documents WHERE doc_id % 4 = 1),
        |s AS (
        |  SELECT i.doc_id, i.n,
        |    abs((i.doc_id + 7919 * gx.x) % 65536 - 32768) AS a
        |  FROM ids i
        |  CROSS JOIN generate_series(0, 799) AS gx(x)
        |  WHERE gx.x < i.n)
        |SELECT doc_id,
        |  CAST(8000 AS BIGINT) AS header_sample_rate,
        |  CAST(8000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS channels,
        |  n AS n_samples,
        |  (n * 1000) // 8000 AS duration_ms,
        |  SUM(a)::DOUBLE / (n * 32768)::DOUBLE AS mean_abs
        |FROM s GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,

    // frame f, pixel (x,y) of doc_id's GIF holds gray level
    // (doc_id + 7x + 13y + 31f) mod 256; grayscale luma is 1000·level
    // milli-units, so each frame's mean is exact integer arithmetic.
    "q108_video_frames_gif" ->
      """WITH ids AS (
        |  SELECT doc_id, 8 + doc_id % 5 AS w, 8 + doc_id % 3 AS h,
        |    2 + doc_id % 3 AS nf
        |  FROM documents WHERE doc_id % 4 = 2),
        |px AS (
        |  SELECT i.doc_id, i.w, i.h, gf.f,
        |    (i.doc_id + 7 * gx.x + 13 * gy.y + 31 * gf.f) % 256 AS v
        |  FROM ids i
        |  CROSS JOIN generate_series(0, 3) AS gf(f)
        |  CROSS JOIN generate_series(0, 11) AS gx(x)
        |  CROSS JOIN generate_series(0, 9) AS gy(y)
        |  WHERE gf.f < i.nf AND gx.x < i.w AND gy.y < i.h)
        |SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  (1000 * SUM(v))::DOUBLE / (w * h * 255000)::DOUBLE AS mean_luma
        |FROM px GROUP BY doc_id, f, w, h ORDER BY doc_id, frame_idx""".stripMargin,

    // chr() codepoints: 769=U+0301 combining acute, 778=U+030A combining
    // ring, 776=U+0308 combining diaeresis — the decomposed suffix the
    // Spark side plants; nfc_normalize is DuckDB's independent UAX #15
    "q109_nfc_normalize" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    text || chr(10) || 'Cafe' || chr(769) || ' A' || chr(778) ||
        |      ' nai' || chr(776) || 've nr ' || CAST(doc_id AS VARCHAR) AS text
        |  FROM documents),
        |n AS (SELECT doc_id, text, nfc_normalize(text) AS t2 FROM aug)
        |SELECT doc_id, CAST(length(text) AS BIGINT) AS len_raw,
        |  CAST(length(t2) AS BIGINT) AS len_nfc,
        |  text <> t2 AS norm_changed,
        |  md5(t2) AS nfc_md5
        |FROM n ORDER BY doc_id""".stripMargin,

    // strip_accents(lower(x)) is DuckDB's equivalent of graft's
    // lower→NFD→drop-combining-marks chain (verified char-for-char on the
    // planted set); the three regexes mirror TextOps.ccnetKey exactly —
    // whitespace classes written out because RE2's \s and Java's differ
    // on U+000B. chr(233)=é composed, chr(769)=combining acute.
    "q110_ccnet_dedup" ->
      """WITH aug AS (
        |  SELECT doc_id, text || chr(10) ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN 'Re' || chr(769) || 'sume' || chr(769) || ' CAFE' ||
        |              chr(769) || ' 42!'
        |         WHEN doc_id % 3 = 1
        |         THEN 'r' || chr(233) || 'sum' || chr(233) || ' caf' ||
        |              chr(233) || ' 13?'
        |         ELSE 'resume cafe 00' END AS text
        |  FROM documents),
        |k AS (SELECT doc_id,
        |  md5(trim(regexp_replace(
        |    regexp_replace(
        |      regexp_replace(strip_accents(lower(text)), '[0-9]', '0', 'g'),
        |      '[^a-z0-9 \t\n\r\f]', ' ', 'g'),
        |    '[ \t\n\r\f]+', ' ', 'g'))) AS key_md5
        |  FROM aug)
        |SELECT doc_id, key_md5,
        |  row_number() OVER (PARTITION BY key_md5 ORDER BY doc_id) = 1
        |    AS is_canonical
        |FROM k ORDER BY doc_id""".stripMargin,

    // chr() codepoints: 7=BEL, 11=VT, 8203=U+200B ZWSP, 65279=U+FEFF
    // BOM/ZWNBSP, 127=DEL, 65533=U+FFFD replacement char — the planted
    // encoding damage; the class mirrors TextOps.cleanControlChars
    "q111_control_clean" ->
      """WITH aug AS (
        |  SELECT doc_id, text || chr(10) || chr(7) || 'ok' || chr(11) ||
        |    'zero' || chr(8203) || 'width' || chr(65279) || ' end' ||
        |    chr(127) || chr(65533) ||
        |    CASE WHEN doc_id % 2 = 0 THEN chr(8203) ELSE '' END AS text
        |  FROM documents),
        |c AS (SELECT doc_id, text,
        |  regexp_replace(text,
        |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x{200B}\x{200C}\x{200D}\x{FEFF}\x{FFFD}]',
        |    '', 'g') AS t2
        |  FROM aug)
        |SELECT doc_id, CAST(length(text) - length(t2) AS BIGINT) AS n_ctl_removed,
        |  CAST(length(t2) AS BIGINT) AS len_clean, md5(t2) AS clean_md5
        |FROM c ORDER BY doc_id""".stripMargin,

    // int8 quantization in SQL: same expression SHAPES as the Spark side
    // (x * 127.0 / qmax left-associated; (qs/127)·(cs/127)·idot / (qn·cn))
    // so every IEEE-double intermediate is bit-identical; the candidate
    // dot itself is exact-integer, hazard-free by construction
    "q112_topk_int8" ->
      """WITH quant AS (
        |  SELECT vec_id,
        |    embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
        |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS qmax,
        |    CASE WHEN list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) = 0
        |      THEN list_transform(embedding::DOUBLE[], x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(embedding::DOUBLE[], x -> CAST(round(
        |        x * 127.0 / list_max(list_transform(embedding::DOUBLE[], y -> abs(y)))
        |      ) AS BIGINT)) END AS qvec
        |  FROM embeddings),
        |q AS (SELECT * FROM quant WHERE vec_id % 100 = 0),
        |cand AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round((q.qmax / 127.0) * (c.qmax / 127.0) *
        |      list_dot_product(q.qvec::DOUBLE[], c.qvec::DOUBLE[]) /
        |      (q.nrm * c.nrm), 6) AS approx_sim
        |  FROM quant c CROSS JOIN q WHERE c.vec_id <> q.vec_id),
        |shortlist AS (
        |  SELECT query_id, neighbor_id FROM cand
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY approx_sim DESC, neighbor_id) <= 20),
        |scored AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    round(list_dot_product(qe.v, ce.v) / (qe.nrm * ce.nrm), 6) AS sim
        |  FROM shortlist s
        |  JOIN quant qe ON qe.vec_id = s.query_id
        |  JOIN quant ce ON ce.vec_id = s.neighbor_id)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS "rank",
        |  neighbor_id, sim
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5
        |ORDER BY query_id, "rank"""".stripMargin,

    // prefix slice v[1:16] scores the scan; full vectors rerank — same
    // left-associated list_dot_product accumulation as the Spark side
    "q115_topk_matryoshka" ->
      """WITH base AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
        |    sqrt(list_dot_product(list_slice(embedding::DOUBLE[], 1, 16),
        |      list_slice(embedding::DOUBLE[], 1, 16))) AS pn
        |  FROM embeddings),
        |q AS (SELECT * FROM base WHERE vec_id % 100 = 0),
        |cand AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_dot_product(list_slice(q.v, 1, 16), list_slice(c.v, 1, 16))
        |      / (q.pn * c.pn), 6) AS approx_sim
        |  FROM base c CROSS JOIN q WHERE c.vec_id <> q.vec_id),
        |shortlist AS (
        |  SELECT query_id, neighbor_id FROM cand
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY approx_sim DESC, neighbor_id) <= 20),
        |scored AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    round(list_dot_product(qe.v, ce.v) / (qe.nrm * ce.nrm), 6) AS sim
        |  FROM shortlist s
        |  JOIN base qe ON qe.vec_id = s.query_id
        |  JOIN base ce ON ce.vec_id = s.neighbor_id)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS "rank",
        |  neighbor_id, sim
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5
        |ORDER BY query_id, "rank"""".stripMargin,

    "q37_cosine_near_dup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    "q84_semantic_dedup_exemplar" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cvec, nrm AS cnrm
        |      FROM e ORDER BY vec_id LIMIT 8),
        |assigned AS (
        |  SELECT e.vec_id, c.cid, e.v, e.nrm
        |  FROM e CROSS JOIN c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) = 1),
        |dropped AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM assigned a JOIN assigned b
        |    ON a.cid = b.cid AND a.vec_id < b.vec_id
        |  WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4)
        |SELECT vec_id FROM embeddings
        |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
        |ORDER BY vec_id""".stripMargin,

    "q85_topk_ivf_exemplar" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cvec, nrm AS cnrm
        |      FROM e ORDER BY vec_id LIMIT 8),
        |assigned AS (
        |  SELECT e.vec_id AS neighbor_id, c.cid AS list
        |  FROM e CROSS JOIN c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) = 1),
        |probes AS (
        |  SELECT e.vec_id AS query_id, c.cid AS list
        |  FROM e CROSS JOIN c
        |  WHERE e.vec_id % 100 = 0
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) <= 2),
        |scored AS (
        |  SELECT p.query_id, a.neighbor_id,
        |    round(list_dot_product(qe.v, ne.v) / (qe.nrm * ne.nrm), 6) AS sim
        |  FROM assigned a JOIN probes p USING (list)
        |  JOIN e qe ON qe.vec_id = p.query_id
        |  JOIN e ne ON ne.vec_id = a.neighbor_id
        |  WHERE a.neighbor_id <> p.query_id)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS "rank",
        |  neighbor_id, sim
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5
        |ORDER BY query_id, "rank"""".stripMargin,

    // integer micro-cosines before max/sum make every aggregate exact;
    // doc = vec_id // 8 mirrors the Spark div
    "q122_maxsim_topk" ->
      """WITH tok AS (
        |  SELECT vec_id // 8 AS doc, vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |q AS (SELECT * FROM tok WHERE doc % 10 = 0),
        |pair AS (
        |  SELECT q.doc AS query_doc, q.vec_id AS qtok, c.doc AS cand_doc,
        |    CAST(round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm)
        |      * 1000000) AS BIGINT) AS micro
        |  FROM tok c CROSS JOIN q WHERE c.doc <> q.doc),
        |mx AS (
        |  SELECT query_doc, cand_doc, qtok, max(micro) AS m
        |  FROM pair GROUP BY query_doc, cand_doc, qtok),
        |sc AS (
        |  SELECT query_doc, cand_doc, CAST(sum(m) AS BIGINT) AS maxsim_micro
        |  FROM mx GROUP BY query_doc, cand_doc)
        |SELECT query_doc,
        |  row_number() OVER (PARTITION BY query_doc
        |    ORDER BY maxsim_micro DESC, cand_doc) AS "rank",
        |  cand_doc, maxsim_micro
        |FROM sc
        |QUALIFY row_number() OVER (PARTITION BY query_doc
        |  ORDER BY maxsim_micro DESC, cand_doc) <= 5
        |ORDER BY query_doc, "rank"""".stripMargin,

    // BM25 in the same integer micro-units as the Spark side: `//` is
    // DuckDB's floor division ≡ Spark's `div` on these all-positive
    // operands; sums CAST to BIGINT (DuckDB sums BIGINT into HUGEINT)
    "q123_bm25_topk" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        |       FROM toks GROUP BY doc_id),
        |corpus AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |                  CAST(sum(dl) AS BIGINT) AS t FROM dl),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
        |  WHERE term IN ('table', 'window', 'hash', 'stream')
        |  GROUP BY doc_id, term),
        |idf AS (
        |  SELECT term,
        |    CAST(round(ln((c.n - CAST(count(DISTINCT doc_id) AS BIGINT) + 0.5)
        |        / (CAST(count(DISTINCT doc_id) AS BIGINT) + 0.5) + 1.0)
        |      * 1000000) AS BIGINT) AS idf_micro
        |  FROM tf CROSS JOIN corpus c GROUP BY term, c.n),
        |contrib AS (
        |  SELECT tf.doc_id,
        |    (idf.idf_micro * ((1000000 * (2200000 * tf.tf))
        |       // (1000000 * tf.tf + 300000
        |           + (9 * ((1000000 * dl.dl * c.n) // c.t)) // 10)))
        |      // 1000000 AS c_micro
        |  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id)
        |    CROSS JOIN corpus c),
        |scored AS (
        |  SELECT doc_id, CAST(sum(c_micro) AS BIGINT) AS bm25_micro
        |  FROM contrib GROUP BY doc_id)
        |SELECT doc_id,
        |  row_number() OVER (ORDER BY bm25_micro DESC, doc_id) AS "rank",
        |  bm25_micro, bm25_micro / 1000000.0 AS bm25
        |FROM scored
        |QUALIFY row_number() OVER (ORDER BY bm25_micro DESC, doc_id) <= 10
        |ORDER BY "rank"""".stripMargin,

    // q123's integer BM25 re-used per query (the query doc's distinct
    // tokens as the term set), q30's rounded-cosine dense leg, fused by
    // integer reciprocal-rank — the full-outer + coalesce IS the RRF
    // "missing leg contributes zero" rule
    "q124_hybrid_rrf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        |       FROM toks GROUP BY doc_id),
        |corpus AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |                  CAST(sum(dl) AS BIGINT) AS t FROM dl),
        |qt AS (SELECT DISTINCT doc_id AS query_id, term FROM toks
        |       WHERE doc_id % 100 = 0),
        |allt AS (SELECT DISTINCT term FROM qt),
        |tf AS (
        |  SELECT toks.doc_id, toks.term, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks JOIN allt USING (term)
        |  GROUP BY toks.doc_id, toks.term),
        |idf AS (
        |  SELECT term,
        |    CAST(round(ln((c.n - CAST(count(DISTINCT doc_id) AS BIGINT) + 0.5)
        |        / (CAST(count(DISTINCT doc_id) AS BIGINT) + 0.5) + 1.0)
        |      * 1000000) AS BIGINT) AS idf_micro
        |  FROM tf CROSS JOIN corpus c GROUP BY term, c.n),
        |lexscore AS (
        |  SELECT qt.query_id, tf.doc_id, CAST(sum(
        |    (idf.idf_micro * ((1000000 * (2200000 * tf.tf))
        |       // (1000000 * tf.tf + 300000
        |           + (9 * ((1000000 * dl.dl * c.n) // c.t)) // 10)))
        |    // 1000000) AS BIGINT) AS bm25_micro
        |  FROM tf JOIN qt USING (term) JOIN idf USING (term)
        |    JOIN dl ON tf.doc_id = dl.doc_id
        |    CROSS JOIN corpus c
        |  WHERE tf.doc_id <> qt.query_id
        |  GROUP BY qt.query_id, tf.doc_id),
        |lex AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY bm25_micro DESC, doc_id) AS r
        |  FROM lexscore
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY bm25_micro DESC, doc_id) <= 20),
        |emb AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |dense AS (
        |  SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_dot_product(q.v, e.v) / (q.nrm * e.nrm), 6)
        |        DESC, e.vec_id) AS r
        |  FROM emb e
        |    CROSS JOIN (SELECT * FROM emb WHERE vec_id % 100 = 0) q
        |  WHERE e.vec_id <> q.vec_id
        |  QUALIFY row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY round(list_dot_product(q.v, e.v) / (q.nrm * e.nrm), 6)
        |      DESC, e.vec_id) <= 20),
        |fused AS (
        |  SELECT coalesce(l.query_id, d.query_id) AS query_id,
        |    coalesce(l.doc_id, d.doc_id) AS doc_id,
        |    CAST(coalesce(1000000 // (60 + l.r), 0)
        |       + coalesce(1000000 // (60 + d.r), 0) AS BIGINT) AS rrf_micro,
        |    l.r IS NOT NULL AS in_lex, d.r IS NOT NULL AS in_dense
        |  FROM lex l FULL OUTER JOIN dense d
        |    ON l.query_id = d.query_id AND l.doc_id = d.doc_id)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf_micro DESC, doc_id) AS "rank",
        |  doc_id, rrf_micro, in_lex, in_dense
        |FROM fused
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |  ORDER BY rrf_micro DESC, doc_id) <= 5
        |ORDER BY query_id, "rank"""".stripMargin,

    // q123's BM25 CTEs feeding an R-bounded expansion ranking
    "q127_prf_expansion" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        |       FROM toks GROUP BY doc_id),
        |corpus AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |                  CAST(sum(dl) AS BIGINT) AS t FROM dl),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
        |  WHERE term IN ('table', 'window', 'hash', 'stream')
        |  GROUP BY doc_id, term),
        |idf AS (
        |  SELECT term,
        |    CAST(round(ln((c.n - CAST(count(DISTINCT doc_id) AS BIGINT) + 0.5)
        |        / (CAST(count(DISTINCT doc_id) AS BIGINT) + 0.5) + 1.0)
        |      * 1000000) AS BIGINT) AS idf_micro
        |  FROM tf CROSS JOIN corpus c GROUP BY term, c.n),
        |contrib AS (
        |  SELECT tf.doc_id,
        |    (idf.idf_micro * ((1000000 * (2200000 * tf.tf))
        |       // (1000000 * tf.tf + 300000
        |           + (9 * ((1000000 * dl.dl * c.n) // c.t)) // 10)))
        |      // 1000000 AS c_micro
        |  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id)
        |    CROSS JOIN corpus c),
        |scored AS (
        |  SELECT doc_id, CAST(sum(c_micro) AS BIGINT) AS bm25_micro
        |  FROM contrib GROUP BY doc_id),
        |r AS (SELECT doc_id FROM scored
        |      ORDER BY bm25_micro DESC, doc_id LIMIT 10),
        |rtf AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS tf_r
        |  FROM toks JOIN r USING (doc_id)
        |  WHERE term NOT IN ('table', 'window', 'hash', 'stream')
        |  GROUP BY term),
        |dfreq AS (
        |  SELECT toks.term,
        |    CAST(count(DISTINCT toks.doc_id) AS BIGINT) AS df
        |  FROM toks JOIN (SELECT term FROM rtf) cand USING (term)
        |  GROUP BY toks.term),
        |w AS (
        |  SELECT rtf.term, rtf.tf_r *
        |    CAST(round(ln((c.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
        |      * 1000000) AS BIGINT) AS weight_micro
        |  FROM rtf JOIN dfreq d USING (term) CROSS JOIN corpus c)
        |SELECT row_number() OVER (ORDER BY weight_micro DESC, term)
        |    AS "rank",
        |  term, weight_micro
        |FROM w
        |QUALIFY row_number() OVER (ORDER BY weight_micro DESC, term) <= 5
        |ORDER BY "rank"""".stripMargin,

    // q124's legs feeding exact-integer recall@20 / reciprocal rank
    "q128_retrieval_metrics" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        |       FROM toks GROUP BY doc_id),
        |corpus AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |                  CAST(sum(dl) AS BIGINT) AS t FROM dl),
        |qt AS (SELECT DISTINCT doc_id AS query_id, term FROM toks
        |       WHERE doc_id % 100 = 0),
        |allt AS (SELECT DISTINCT term FROM qt),
        |tf AS (
        |  SELECT toks.doc_id, toks.term, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks JOIN allt USING (term)
        |  GROUP BY toks.doc_id, toks.term),
        |idf AS (
        |  SELECT term,
        |    CAST(round(ln((c.n - CAST(count(DISTINCT doc_id) AS BIGINT) + 0.5)
        |        / (CAST(count(DISTINCT doc_id) AS BIGINT) + 0.5) + 1.0)
        |      * 1000000) AS BIGINT) AS idf_micro
        |  FROM tf CROSS JOIN corpus c GROUP BY term, c.n),
        |lexscore AS (
        |  SELECT qt.query_id, tf.doc_id, CAST(sum(
        |    (idf.idf_micro * ((1000000 * (2200000 * tf.tf))
        |       // (1000000 * tf.tf + 300000
        |           + (9 * ((1000000 * dl.dl * c.n) // c.t)) // 10)))
        |    // 1000000) AS BIGINT) AS bm25_micro
        |  FROM tf JOIN qt USING (term) JOIN idf USING (term)
        |    JOIN dl ON tf.doc_id = dl.doc_id
        |    CROSS JOIN corpus c
        |  WHERE tf.doc_id <> qt.query_id
        |  GROUP BY qt.query_id, tf.doc_id),
        |lex AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY bm25_micro DESC, doc_id) AS r
        |  FROM lexscore
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY bm25_micro DESC, doc_id) <= 20),
        |emb AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |dense AS (
        |  SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_dot_product(q.v, e.v) / (q.nrm * e.nrm), 6)
        |        DESC, e.vec_id) AS r
        |  FROM emb e
        |    CROSS JOIN (SELECT * FROM emb WHERE vec_id % 100 = 0) q
        |  WHERE e.vec_id <> q.vec_id
        |  QUALIFY row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY round(list_dot_product(q.v, e.v) / (q.nrm * e.nrm), 6)
        |      DESC, e.vec_id) <= 20),
        |perq AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth
        |         FROM dense GROUP BY query_id),
        |top1 AS (SELECT query_id, doc_id FROM dense WHERE r = 1),
        |rr AS (
        |  SELECT t.query_id,
        |    CAST(coalesce(1000000 // l.r, 0) AS BIGINT) AS rr_micro
        |  FROM top1 t LEFT JOIN lex l
        |    ON t.query_id = l.query_id AND t.doc_id = l.doc_id),
        |ov AS (
        |  SELECT l.query_id, CAST(count(*) AS BIGINT) AS n_overlap
        |  FROM lex l JOIN dense d
        |    ON l.query_id = d.query_id AND l.doc_id = d.doc_id
        |  GROUP BY l.query_id)
        |SELECT p.query_id, rr.rr_micro,
        |  coalesce(ov.n_overlap, 0) AS n_overlap,
        |  (1000000 * coalesce(ov.n_overlap, 0)) // p.n_truth
        |    AS recall_micro
        |FROM perq p JOIN rr USING (query_id) LEFT JOIN ov USING (query_id)
        |ORDER BY p.query_id""".stripMargin,

    // q124's legs with the fusion replaced by NOT EXISTS — the anti-join
    // definition of hard negatives
    "q126_hard_negatives" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        |       FROM toks GROUP BY doc_id),
        |corpus AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |                  CAST(sum(dl) AS BIGINT) AS t FROM dl),
        |qt AS (SELECT DISTINCT doc_id AS query_id, term FROM toks
        |       WHERE doc_id % 100 = 0),
        |allt AS (SELECT DISTINCT term FROM qt),
        |tf AS (
        |  SELECT toks.doc_id, toks.term, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks JOIN allt USING (term)
        |  GROUP BY toks.doc_id, toks.term),
        |idf AS (
        |  SELECT term,
        |    CAST(round(ln((c.n - CAST(count(DISTINCT doc_id) AS BIGINT) + 0.5)
        |        / (CAST(count(DISTINCT doc_id) AS BIGINT) + 0.5) + 1.0)
        |      * 1000000) AS BIGINT) AS idf_micro
        |  FROM tf CROSS JOIN corpus c GROUP BY term, c.n),
        |lexscore AS (
        |  SELECT qt.query_id, tf.doc_id, CAST(sum(
        |    (idf.idf_micro * ((1000000 * (2200000 * tf.tf))
        |       // (1000000 * tf.tf + 300000
        |           + (9 * ((1000000 * dl.dl * c.n) // c.t)) // 10)))
        |    // 1000000) AS BIGINT) AS bm25_micro
        |  FROM tf JOIN qt USING (term) JOIN idf USING (term)
        |    JOIN dl ON tf.doc_id = dl.doc_id
        |    CROSS JOIN corpus c
        |  WHERE tf.doc_id <> qt.query_id
        |  GROUP BY qt.query_id, tf.doc_id),
        |lex AS (
        |  SELECT query_id, doc_id, bm25_micro,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY bm25_micro DESC, doc_id) AS r
        |  FROM lexscore
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY bm25_micro DESC, doc_id) <= 20),
        |emb AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |dense AS (
        |  SELECT q.vec_id AS query_id, e.vec_id AS doc_id
        |  FROM emb e
        |    CROSS JOIN (SELECT * FROM emb WHERE vec_id % 100 = 0) q
        |  WHERE e.vec_id <> q.vec_id
        |  QUALIFY row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY round(list_dot_product(q.v, e.v) / (q.nrm * e.nrm), 6)
        |      DESC, e.vec_id) <= 20)
        |SELECT l.query_id, l.doc_id, l.r AS "rank", l.bm25_micro
        |FROM lex l
        |WHERE NOT EXISTS (SELECT 1 FROM dense d
        |                  WHERE d.query_id = l.query_id
        |                    AND d.doc_id = l.doc_id)
        |ORDER BY l.query_id, l.r""".stripMargin,

    // q124's fusion CTEs + q129's passage CTEs, composed per query
    "q130_rag_serving" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        |       FROM toks GROUP BY doc_id),
        |corpus AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |                  CAST(sum(dl) AS BIGINT) AS t FROM dl),
        |qt AS (SELECT DISTINCT doc_id AS query_id, term FROM toks
        |       WHERE doc_id % 100 = 0),
        |allt AS (SELECT DISTINCT term FROM qt),
        |tf AS (
        |  SELECT toks.doc_id, toks.term, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks JOIN allt USING (term)
        |  GROUP BY toks.doc_id, toks.term),
        |idf AS (
        |  SELECT term,
        |    CAST(round(ln((c.n - CAST(count(DISTINCT doc_id) AS BIGINT) + 0.5)
        |        / (CAST(count(DISTINCT doc_id) AS BIGINT) + 0.5) + 1.0)
        |      * 1000000) AS BIGINT) AS idf_micro
        |  FROM tf CROSS JOIN corpus c GROUP BY term, c.n),
        |lexscore AS (
        |  SELECT qt.query_id, tf.doc_id, CAST(sum(
        |    (idf.idf_micro * ((1000000 * (2200000 * tf.tf))
        |       // (1000000 * tf.tf + 300000
        |           + (9 * ((1000000 * dl.dl * c.n) // c.t)) // 10)))
        |    // 1000000) AS BIGINT) AS bm25_micro
        |  FROM tf JOIN qt USING (term) JOIN idf USING (term)
        |    JOIN dl ON tf.doc_id = dl.doc_id
        |    CROSS JOIN corpus c
        |  WHERE tf.doc_id <> qt.query_id
        |  GROUP BY qt.query_id, tf.doc_id),
        |lex AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY bm25_micro DESC, doc_id) AS r
        |  FROM lexscore
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY bm25_micro DESC, doc_id) <= 20),
        |emb AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |dense AS (
        |  SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_dot_product(q.v, e.v) / (q.nrm * e.nrm), 6)
        |        DESC, e.vec_id) AS r
        |  FROM emb e
        |    CROSS JOIN (SELECT * FROM emb WHERE vec_id % 100 = 0) q
        |  WHERE e.vec_id <> q.vec_id
        |  QUALIFY row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY round(list_dot_product(q.v, e.v) / (q.nrm * e.nrm), 6)
        |      DESC, e.vec_id) <= 20),
        |fused AS (
        |  SELECT coalesce(l.query_id, d.query_id) AS query_id,
        |    coalesce(l.doc_id, d.doc_id) AS doc_id,
        |    CAST(coalesce(1000000 // (60 + l.r), 0)
        |       + coalesce(1000000 // (60 + d.r), 0) AS BIGINT) AS rrf_micro
        |  FROM lex l FULL OUTER JOIN dense d
        |    ON l.query_id = d.query_id AND l.doc_id = d.doc_id),
        |fusedtop AS (
        |  SELECT query_id, doc_id, rrf_micro,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY rrf_micro DESC, doc_id) AS rnk
        |  FROM fused
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf_micro DESC, doc_id) <= 5),
        |base AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS arr
        |  FROM documents
        |  WHERE doc_id IN (SELECT doc_id FROM fusedtop)),
        |pos AS (
        |  SELECT doc_id, pt.pos AS pos, pt.term AS term FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(arr) + 1),
        |      i -> {'pos': i, 'term': arr[i]})) AS pt
        |    FROM base)),
        |hits AS (
        |  SELECT f.query_id, p.doc_id, p.pos
        |  FROM pos p
        |    JOIN qt ON p.term = qt.term
        |    JOIN fusedtop f
        |      ON f.query_id = qt.query_id AND f.doc_id = p.doc_id),
        |wins AS (
        |  SELECT s.query_id, s.doc_id, s.pos AS best_start,
        |    CAST(count(*) AS BIGINT) AS n_hits
        |  FROM hits s JOIN hits h
        |    ON s.query_id = h.query_id AND s.doc_id = h.doc_id
        |    AND h.pos >= s.pos AND h.pos < s.pos + 8
        |  GROUP BY s.query_id, s.doc_id, s.pos),
        |best AS (
        |  SELECT query_id, doc_id, best_start, n_hits
        |  FROM wins
        |  QUALIFY row_number() OVER (PARTITION BY query_id, doc_id
        |    ORDER BY n_hits DESC, best_start) = 1)
        |SELECT f.query_id, f.rnk AS "rank", f.doc_id, f.rrf_micro,
        |  b.best_start, b.n_hits,
        |  array_to_string(a.arr[b.best_start : b.best_start + 7], ' ')
        |    AS snippet
        |FROM fusedtop f
        |  JOIN best b ON f.query_id = b.query_id AND f.doc_id = b.doc_id
        |  JOIN base a ON f.doc_id = a.doc_id
        |ORDER BY f.query_id, f.rnk""".stripMargin,

    // hit-position band self-join + earliest-window argmax; 1-based
    // positions match Spark's pos+1, list slicing is inclusive a:b
    "q129_best_passage" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS arr
        |  FROM documents),
        |hits AS (
        |  SELECT doc_id,
        |    unnest(list_filter(list_transform(range(1, len(arr) + 1),
        |        i -> CASE WHEN arr[i] IN ('table', 'window', 'hash',
        |                                  'stream') THEN i END),
        |      x -> x IS NOT NULL)) AS pos
        |  FROM base),
        |wins AS (
        |  SELECT s.doc_id, s.pos AS best_start,
        |    CAST(count(*) AS BIGINT) AS n_hits
        |  FROM hits s JOIN hits h ON s.doc_id = h.doc_id
        |    AND h.pos >= s.pos AND h.pos < s.pos + 8
        |  GROUP BY s.doc_id, s.pos),
        |best AS (
        |  SELECT doc_id, best_start, n_hits
        |  FROM wins
        |  QUALIFY row_number() OVER (PARTITION BY doc_id
        |    ORDER BY n_hits DESC, best_start) = 1)
        |SELECT b.doc_id, b.best_start, b.n_hits,
        |  array_to_string(a.arr[b.best_start : b.best_start + 7], ' ')
        |    AS snippet
        |FROM best b JOIN base a USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,

    // the greedy MMR trace unrolled as five selection stages; the +1e6
    // shift keeps every // nonnegative, matching Spark's div exactly
    "q138_mmr_rerank" -> {
      val pre =
        """WITH e AS (
          |  SELECT vec_id, embedding::DOUBLE[] AS v,
          |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
          |  FROM embeddings),
          |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn
          |      FROM e WHERE vec_id % 100 = 0),
          |cands AS (
          |  SELECT query_id, neighbor_id,
          |    CAST(round(sim * 1000000) AS BIGINT) AS rel_micro
          |  FROM (
          |    SELECT q.query_id, e.vec_id AS neighbor_id,
          |      round(list_dot_product(q.qv, e.v) / (q.qn * e.nrm), 6) AS sim
          |    FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id)
          |  QUALIFY row_number() OVER (PARTITION BY query_id
          |    ORDER BY sim DESC, neighbor_id) <= 10),
          |pairs AS (
          |  SELECT a.query_id, a.neighbor_id AS id_a, b.neighbor_id AS id_b,
          |    CAST(round(list_dot_product(ea.v, eb.v) / (ea.nrm * eb.nrm)
          |      * 1000000) AS BIGINT) AS sim_micro
          |  FROM cands a JOIN cands b
          |    ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id
          |  JOIN e ea ON ea.vec_id = a.neighbor_id
          |  JOIN e eb ON eb.vec_id = b.neighbor_id),
          |sel1 AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT query_id, neighbor_id,
          |      (700000 * (rel_micro + 1000000)) // 1000000 AS mmr
          |    FROM cands)
          |  QUALIFY row_number() OVER (PARTITION BY query_id
          |    ORDER BY mmr DESC, neighbor_id) = 1)""".stripMargin
      val stages = (2 to 5).map { r =>
        val prevUnion = (1 until r)
          .map(i => s"SELECT * FROM sel$i").mkString(" UNION ALL ")
        s"""prev$r AS ($prevUnion),
           |sel$r AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT c.query_id, c.neighbor_id,
           |      (700000 * (c.rel_micro + 1000000)) // 1000000
           |        - (300000 * (coalesce(m.maxsim, -1000000) + 1000000))
           |          // 1000000 AS mmr
           |    FROM cands c
           |    LEFT JOIN (
           |      SELECT p.query_id, p.id_a AS neighbor_id,
           |        max(p.sim_micro) AS maxsim
           |      FROM pairs p JOIN prev$r s
           |        ON p.query_id = s.query_id AND p.id_b = s.neighbor_id
           |      GROUP BY p.query_id, p.id_a) m
           |      ON m.query_id = c.query_id
           |      AND m.neighbor_id = c.neighbor_id
           |    WHERE NOT EXISTS (SELECT 1 FROM prev$r s
           |      WHERE s.query_id = c.query_id
           |        AND s.neighbor_id = c.neighbor_id))
           |  QUALIFY row_number() OVER (PARTITION BY query_id
           |    ORDER BY mmr DESC, neighbor_id) = 1)""".stripMargin
      }
      val out = (1 to 5)
        .map(r => s"SELECT query_id, $r AS \"rank\", neighbor_id FROM sel$r")
        .mkString("\n  UNION ALL ")
      (pre +: stages).mkString(",\n") +
        s"\nSELECT * FROM (\n  $out)\nORDER BY query_id, \"rank\""
    },

    // q135's exact filtered top-k as truth, q136's funnel as system,
    // fed through q128's metric CTEs
    "q137_filtered_recall" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |allowed AS (
        |  SELECT doc_id AS vec_id FROM documents WHERE lang = 'en'),
        |q AS (SELECT vec_id AS query_id, v AS qvec, nrm AS qn
        |      FROM e WHERE vec_id % 100 = 0),
        |truth AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id) AS r
        |  FROM (
        |    SELECT q.query_id, e.vec_id AS neighbor_id,
        |      round(list_dot_product(q.qvec, e.v) / (q.qn * e.nrm), 6) AS sim
        |    FROM e JOIN allowed USING (vec_id) CROSS JOIN q
        |    WHERE e.vec_id <> q.query_id)
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) <= 5),
        |c AS (SELECT vec_id AS cid, v AS cvec, nrm AS cnrm
        |      FROM e ORDER BY vec_id LIMIT 8),
        |assigned AS (
        |  SELECT e.vec_id AS neighbor_id, c.cid AS list
        |  FROM e CROSS JOIN c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) = 1),
        |probes AS (
        |  SELECT e.vec_id AS query_id, c.cid AS list
        |  FROM e CROSS JOIN c
        |  WHERE e.vec_id % 100 = 0
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) <= 2),
        |system AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id) AS r
        |  FROM (
        |    SELECT p.query_id, a.neighbor_id,
        |      round(list_dot_product(qe.v, ne.v) / (qe.nrm * ne.nrm), 6) AS sim
        |    FROM assigned a JOIN probes p USING (list)
        |    JOIN allowed al ON al.vec_id = a.neighbor_id
        |    JOIN e qe ON qe.vec_id = p.query_id
        |    JOIN e ne ON ne.vec_id = a.neighbor_id
        |    WHERE a.neighbor_id <> p.query_id)
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) <= 5),
        |perq AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth
        |         FROM truth GROUP BY query_id),
        |top1 AS (SELECT query_id, neighbor_id FROM truth WHERE r = 1),
        |rr AS (
        |  SELECT t.query_id,
        |    CAST(coalesce(1000000 // s.r, 0) AS BIGINT) AS rr_micro
        |  FROM top1 t LEFT JOIN system s
        |    ON t.query_id = s.query_id AND t.neighbor_id = s.neighbor_id),
        |ov AS (
        |  SELECT s.query_id, CAST(count(*) AS BIGINT) AS n_overlap
        |  FROM system s JOIN truth t
        |    ON s.query_id = t.query_id AND s.neighbor_id = t.neighbor_id
        |  GROUP BY s.query_id)
        |SELECT p.query_id, rr.rr_micro,
        |  coalesce(ov.n_overlap, 0) AS n_overlap,
        |  (1000000 * coalesce(ov.n_overlap, 0)) // p.n_truth
        |    AS recall_micro
        |FROM perq p JOIN rr USING (query_id) LEFT JOIN ov USING (query_id)
        |ORDER BY p.query_id""".stripMargin,

    // q85's candidate CTEs + the allowed-id semi-join before rerank
    "q136_filtered_ivf" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |allowed AS (
        |  SELECT doc_id AS vec_id FROM documents WHERE lang = 'en'),
        |c AS (SELECT vec_id AS cid, v AS cvec, nrm AS cnrm
        |      FROM e ORDER BY vec_id LIMIT 8),
        |assigned AS (
        |  SELECT e.vec_id AS neighbor_id, c.cid AS list
        |  FROM e CROSS JOIN c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) = 1),
        |probes AS (
        |  SELECT e.vec_id AS query_id, c.cid AS list
        |  FROM e CROSS JOIN c
        |  WHERE e.vec_id % 100 = 0
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) <= 2),
        |scored AS (
        |  SELECT p.query_id, a.neighbor_id,
        |    round(list_dot_product(qe.v, ne.v) / (qe.nrm * ne.nrm), 6) AS sim
        |  FROM assigned a JOIN probes p USING (list)
        |  JOIN allowed al ON al.vec_id = a.neighbor_id
        |  JOIN e qe ON qe.vec_id = p.query_id
        |  JOIN e ne ON ne.vec_id = a.neighbor_id
        |  WHERE a.neighbor_id <> p.query_id)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS "rank",
        |  neighbor_id, sim
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5
        |ORDER BY query_id, "rank"""".stripMargin,

    // q30's scorer over the metadata-restricted corpus
    "q135_filtered_ann" ->
      """WITH corp AS (
        |  SELECT e.vec_id, e.embedding
        |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
        |  WHERE d.lang = 'en'),
        |q AS (SELECT vec_id AS query_id, embedding AS qvec
        |      FROM embeddings WHERE vec_id % 100 = 0),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    round(list_dot_product(q.qvec::DOUBLE[], e.embedding::DOUBLE[]) /
        |      (sqrt(list_dot_product(q.qvec::DOUBLE[], q.qvec::DOUBLE[])) *
        |       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
        |      6) AS sim
        |  FROM corp e CROSS JOIN q WHERE e.vec_id <> q.query_id)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) AS "rank",
        |  neighbor_id, sim
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |  ORDER BY sim DESC, neighbor_id) <= 5
        |ORDER BY query_id, "rank"""".stripMargin,

    // the same micro-unit recurrence unrolled as 10 CTEs (floor
    // division loses mass identically in both engines)
    "q134_pagerank" -> {
      val pre =
        """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
          |nodes AS (SELECT doc_id AS v FROM documents),
          |edges0 AS (
          |  SELECT doc_id AS u, (doc_id * 7 + 1) % nn.n AS v
          |  FROM documents, nn
          |  UNION ALL
          |  SELECT doc_id, (doc_id * 11 + 2) % nn.n FROM documents, nn
          |  UNION ALL
          |  SELECT doc_id, (doc_id * 13 + 3) % nn.n FROM documents, nn),
          |edges AS (SELECT DISTINCT u, v FROM edges0 WHERE u <> v),
          |outd AS (SELECT u, CAST(count(*) AS BIGINT) AS outd
          |         FROM edges GROUP BY u),
          |pr0 AS (SELECT nodes.v, CAST(1000000 // nn.n AS BIGINT)
          |          AS pr_micro FROM nodes, nn)""".stripMargin
      val iters = (1 to 10).map { k =>
        s"""pr$k AS (
           |  SELECT no.v,
           |    CAST(150000 // nn.n + coalesce(su.c, 0) AS BIGINT)
           |      AS pr_micro
           |  FROM nodes no CROSS JOIN nn
           |  LEFT JOIN (
           |    SELECT e.v,
           |      CAST(sum((85 * p.pr_micro) // (100 * o.outd)) AS BIGINT)
           |        AS c
           |    FROM edges e JOIN pr${k - 1} p ON p.v = e.u
           |      JOIN outd o ON o.u = e.u
           |    GROUP BY e.v) su ON su.v = no.v)""".stripMargin
      }
      (pre +: iters).mkString(",\n") +
        "\nSELECT v AS doc_id, pr_micro, pr_micro / 1000000.0 AS pr " +
        "FROM pr10 ORDER BY doc_id"
    },

    // per-frame grayscale samples predicted via md5 (identity palette →
    // lossless GIF round-trip); frame bits, candidates, per-frame-pair
    // hamming, and the clip roll-up all in plain SQL
    "q133_video_near_dup" ->
      """WITH ids AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 8 = 1 THEN doc_id - 1 ELSE doc_id END AS seed,
        |    CASE WHEN doc_id % 8 = 1 THEN 1 ELSE 0 END AS bump
        |  FROM documents),
        |par AS (SELECT doc_id, seed, bump, 2 + seed % 3 AS nf FROM ids),
        |px AS (
        |  SELECT p.doc_id, gf.f, gx.x, gy.y,
        |    ((('0x' || substring(md5(p.seed || ':' || gf.f || ':' || gy.y),
        |        2 * gx.x + 1, 2))::BIGINT
        |      + CASE WHEN gf.f = 0 AND gx.x = 0 AND gy.y = 0
        |             THEN p.bump ELSE 0 END) % 256) AS v
        |  FROM par p
        |    JOIN (SELECT unnest(range(0, 4)) AS f) gf ON gf.f < p.nf
        |    CROSS JOIN (SELECT unnest(range(0, 9)) AS x) gx
        |    CROSS JOIN (SELECT unnest(range(0, 8)) AS y) gy),
        |bits AS (
        |  SELECT a.doc_id, a.f, a.y // 2 AS band_idx,
        |    CAST(sum(CASE WHEN b.v > a.v
        |      THEN 1::BIGINT << ((a.y % 2) * 8 + a.x) ELSE 0 END)
        |      AS BIGINT) AS val
        |  FROM px a JOIN px b
        |    ON a.doc_id = b.doc_id AND a.f = b.f AND b.y = a.y
        |    AND b.x = a.x + 1
        |  WHERE a.x < 8
        |  GROUP BY a.doc_id, a.f, a.y // 2),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id_a, x.f AS f_a,
        |    y.doc_id AS id_b, y.f AS f_b
        |  FROM bits x JOIN bits y
        |    ON x.band_idx = y.band_idx AND x.val = y.val
        |    AND x.doc_id < y.doc_id),
        |ham AS (
        |  SELECT c.id_a, c.id_b, c.f_a, c.f_b,
        |    CAST(sum(bit_count(xor(p.val, q.val))) AS BIGINT) AS hamming
        |  FROM cand c
        |    JOIN bits p ON p.doc_id = c.id_a AND p.f = c.f_a
        |    JOIN bits q ON q.doc_id = c.id_b AND q.f = c.f_b
        |      AND q.band_idx = p.band_idx
        |  GROUP BY c.id_a, c.id_b, c.f_a, c.f_b
        |  HAVING CAST(sum(bit_count(xor(p.val, q.val))) AS BIGINT) <= 10)
        |SELECT id_a, id_b, CAST(min(hamming) AS BIGINT) AS best_hamming,
        |  CAST(count(*) AS BIGINT) AS n_frame_matches
        |FROM ham GROUP BY id_a, id_b
        |ORDER BY id_a, id_b""".stripMargin,

    // PCM samples predicted from the generation rule (WAV is lossless);
    // block bounds, floor-division means, bits, bands, candidates, and
    // hamming all in plain SQL — `//` floors like Math.floorDiv
    "q132_audio_near_dup" ->
      """WITH ids AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 8 = 1 THEN doc_id - 1 ELSE doc_id END AS seed,
        |    CASE WHEN doc_id % 8 = 1 THEN 1 ELSE 0 END AS bump
        |  FROM documents),
        |par AS (SELECT doc_id, seed, bump, 400 + (seed % 3) * 200 AS n
        |        FROM ids),
        |samp AS (
        |  SELECT p.doc_id, r.i,
        |    ((('0x' || substring(md5(p.seed || ':' || (r.i // 8)),
        |        4 * (r.i % 8) + 1, 4))::BIGINT
        |      + CASE WHEN r.i = 0 THEN p.bump ELSE 0 END) % 65536)
        |      - 32768 AS s
        |  FROM par p JOIN (SELECT unnest(range(0, 800)) AS i) r
        |    ON r.i < p.n),
        |blocks AS (
        |  SELECT s.doc_id, b.b,
        |    CAST(sum(s.s) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_s
        |  FROM samp s
        |    JOIN par p ON p.doc_id = s.doc_id
        |    JOIN (SELECT unnest(range(0, 65)) AS b) b
        |      ON s.i >= (b.b * p.n) // 65 AND s.i < ((b.b + 1) * p.n) // 65
        |  GROUP BY s.doc_id, b.b),
        |bits AS (
        |  SELECT a.doc_id, a.b // 16 AS band_idx,
        |    CAST(sum(CASE WHEN c.mean_s > a.mean_s
        |      THEN 1::BIGINT << (a.b % 16) ELSE 0 END) AS BIGINT) AS val
        |  FROM blocks a JOIN blocks c
        |    ON a.doc_id = c.doc_id AND c.b = a.b + 1
        |  WHERE a.b < 64
        |  GROUP BY a.doc_id, a.b // 16),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM bits x JOIN bits y
        |    ON x.band_idx = y.band_idx AND x.val = y.val
        |    AND x.doc_id < y.doc_id)
        |SELECT c.id_a, c.id_b,
        |  CAST(sum(bit_count(xor(p.val, q.val))) AS BIGINT) AS hamming
        |FROM cand c
        |  JOIN bits p ON p.doc_id = c.id_a
        |  JOIN bits q ON q.doc_id = c.id_b AND q.band_idx = p.band_idx
        |GROUP BY c.id_a, c.id_b
        |HAVING CAST(sum(bit_count(xor(p.val, q.val))) AS BIGINT) <= 10
        |ORDER BY id_a, id_b""".stripMargin,

    // the dHash predicted arithmetically from the pixel-generation rule
    // (PNG is lossless → decoded luma ≡ generated luma); bands, the
    // band-equality candidate join, and exact hamming all in plain SQL
    "q131_image_near_dup" ->
      """WITH ids AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 8 = 1 THEN doc_id - 1 ELSE doc_id END AS seed,
        |    CASE WHEN doc_id % 8 = 1 THEN 1 ELSE 0 END AS bump
        |  FROM documents),
        |px AS (
        |  SELECT i.doc_id, gx.x, gy.y,
        |    (('0x' || substring(md5(i.seed || ':' || gy.y),
        |        2 * gx.x + 1, 2))::BIGINT
        |     + CASE WHEN gx.x = 0 AND gy.y = 0 THEN i.bump ELSE 0 END)
        |    % 256 AS luma
        |  FROM ids i
        |    CROSS JOIN (SELECT unnest(range(0, 9)) AS x) gx
        |    CROSS JOIN (SELECT unnest(range(0, 8)) AS y) gy),
        |bits AS (
        |  SELECT a.doc_id, a.y // 2 AS band_idx,
        |    CAST(sum(CASE WHEN b.luma > a.luma
        |      THEN 1::BIGINT << ((a.y % 2) * 8 + a.x) ELSE 0 END)
        |      AS BIGINT) AS val
        |  FROM px a JOIN px b
        |    ON a.doc_id = b.doc_id AND b.y = a.y AND b.x = a.x + 1
        |  WHERE a.x < 8
        |  GROUP BY a.doc_id, a.y // 2),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM bits x JOIN bits y
        |    ON x.band_idx = y.band_idx AND x.val = y.val
        |    AND x.doc_id < y.doc_id)
        |SELECT c.id_a, c.id_b,
        |  CAST(sum(bit_count(xor(p.val, q.val))) AS BIGINT) AS hamming
        |FROM cand c
        |  JOIN bits p ON p.doc_id = c.id_a
        |  JOIN bits q ON q.doc_id = c.id_b AND q.band_idx = p.band_idx
        |GROUP BY c.id_a, c.id_b
        |HAVING CAST(sum(bit_count(xor(p.val, q.val))) AS BIGINT) <= 10
        |ORDER BY id_a, id_b""".stripMargin,

    // DSIR in the same micro-nat lattice discipline as the Spark side:
    // ln only on the ≤nBuckets lattice, doc scores are exact integer
    // dot products; ('0x'||hex)::BIGINT ≡ Spark conv(hex,16,10)
    "q125_dsir_weights" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tokf AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5('f:graft:' || term), 1, 8))::BIGINT % 256
        |      AS b
        |  FROM tok WHERE length(term) > 0),
        |ct AS (SELECT b, CAST(count(*) AS BIGINT) AS ct
        |       FROM tokf JOIN documents USING (doc_id)
        |       WHERE lang = 'en' GROUP BY b),
        |cr AS (SELECT b, CAST(count(*) AS BIGINT) AS cr
        |       FROM tokf GROUP BY b),
        |tot AS (SELECT (SELECT CAST(sum(ct) AS BIGINT) FROM ct) AS tt,
        |               (SELECT CAST(sum(cr) AS BIGINT) FROM cr) AS tr),
        |lattice AS (
        |  SELECT coalesce(ct.b, cr.b) AS b,
        |    CAST(round((ln((coalesce(ct.ct, 0) + 1.0) / (tot.tt + 256))
        |              - ln((coalesce(cr.cr, 0) + 1.0) / (tot.tr + 256)))
        |      * 1000000) AS BIGINT) AS lr_micro
        |  FROM ct FULL OUTER JOIN cr ON ct.b = cr.b CROSS JOIN tot),
        |perdoc AS (
        |  SELECT doc_id, CAST(sum(c * lr_micro) AS BIGINT) AS logw_micro
        |  FROM (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c
        |        FROM tokf GROUP BY doc_id, b) dbc
        |  JOIN lattice USING (b) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(len(string_split_regex(trim(lower(d.text)), '\s+')) AS BIGINT)
        |    AS n_tokens,
        |  coalesce(p.logw_micro, 0) AS logw_micro,
        |  coalesce(p.logw_micro, 0) / 1000000.0 AS logw
        |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // q85's candidate CTEs + q112's quantization, composed — the same
    // fragments that hash-check standalone verify the funnel jointly
    "q121_topk_ivf_int8" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
        |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS qmax,
        |    CASE WHEN list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) = 0
        |      THEN list_transform(embedding::DOUBLE[], x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(embedding::DOUBLE[], x -> CAST(round(
        |        x * 127.0 / list_max(list_transform(embedding::DOUBLE[], y -> abs(y)))
        |      ) AS BIGINT)) END AS qvec
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cvec, nrm AS cnrm
        |      FROM e ORDER BY vec_id LIMIT 8),
        |assigned AS (
        |  SELECT e.vec_id AS neighbor_id, c.cid AS list
        |  FROM e CROSS JOIN c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) = 1),
        |probes AS (
        |  SELECT e.vec_id AS query_id, c.cid AS list
        |  FROM e CROSS JOIN c
        |  WHERE e.vec_id % 100 = 0
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) <= 2),
        |cand AS (
        |  SELECT p.query_id, a.neighbor_id,
        |    round((qe.qmax / 127.0) * (ne.qmax / 127.0) *
        |      list_dot_product(qe.qvec::DOUBLE[], ne.qvec::DOUBLE[]) /
        |      (qe.nrm * ne.nrm), 6) AS approx_sim
        |  FROM assigned a JOIN probes p USING (list)
        |  JOIN e qe ON qe.vec_id = p.query_id
        |  JOIN e ne ON ne.vec_id = a.neighbor_id
        |  WHERE a.neighbor_id <> p.query_id),
        |shortlist AS (
        |  SELECT query_id, neighbor_id FROM cand
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY approx_sim DESC, neighbor_id) <= 20),
        |scored AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    round(list_dot_product(qe.v, ne.v) / (qe.nrm * ne.nrm), 6) AS sim
        |  FROM shortlist s
        |  JOIN e qe ON qe.vec_id = s.query_id
        |  JOIN e ne ON ne.vec_id = s.neighbor_id)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS "rank",
        |  neighbor_id, sim
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5
        |ORDER BY query_id, "rank"""".stripMargin,

    "q86_topk_lsh_portable" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |pv AS (
        |  SELECT p.p, j.j,
        |    CASE WHEN strpos('89abcdef',
        |        substr(md5('graft:rhp:' || p.p || ':' || (j.j - 1)), 1, 1)) > 0
        |      THEN 1.0 ELSE -1.0 END AS val
        |  FROM generate_series(0, 3) AS p(p)
        |  CROSS JOIN generate_series(1, 64) AS j(j)),
        |planes AS (SELECT p, list(val ORDER BY j) AS pvec FROM pv GROUP BY p),
        |sigs AS (
        |  SELECT e.vec_id,
        |    string_agg(CASE WHEN list_dot_product(e.v, pl.pvec) >= 0
        |        THEN '1' ELSE '0' END, '' ORDER BY pl.p) AS sig
        |  FROM e CROSS JOIN planes pl GROUP BY e.vec_id),
        |cands AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM sigs q JOIN sigs c USING (sig)
        |  WHERE q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |scored AS (
        |  SELECT cands.query_id, cands.neighbor_id,
        |    round(list_dot_product(qe.v, ne.v) / (qe.nrm * ne.nrm), 6) AS sim
        |  FROM cands
        |  JOIN e qe ON qe.vec_id = cands.query_id
        |  JOIN e ne ON ne.vec_id = cands.neighbor_id)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS "rank",
        |  neighbor_id, sim
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5
        |ORDER BY query_id, "rank"""".stripMargin,

    "q90_source_cap" ->
      """SELECT source, CAST(row_number() OVER w AS BIGINT) AS "rank", doc_id,
        |  CAST(n_chars AS DOUBLE) AS len
        |FROM documents
        |WINDOW w AS (PARTITION BY source ORDER BY CAST(n_chars AS DOUBLE) DESC, doc_id)
        |QUALIFY row_number() OVER w <= 10
        |ORDER BY source, "rank"""".stripMargin,

    "q88_near_dup_lsh_portable" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |pv AS (
        |  SELECT p.p, j.j,
        |    CASE WHEN strpos('89abcdef',
        |        substr(md5('graft:rhp:' || p.p || ':' || (j.j - 1)), 1, 1)) > 0
        |      THEN 1.0 ELSE -1.0 END AS val
        |  FROM generate_series(0, 3) AS p(p)
        |  CROSS JOIN generate_series(1, 64) AS j(j)),
        |planes AS (SELECT p, list(val ORDER BY j) AS pvec FROM pv GROUP BY p),
        |sigs AS (
        |  SELECT e.vec_id,
        |    string_agg(CASE WHEN list_dot_product(e.v, pl.pvec) >= 0
        |        THEN '1' ELSE '0' END, '' ORDER BY pl.p) AS sig
        |  FROM e CROSS JOIN planes pl GROUP BY e.vec_id),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_dot_product(ea.v, eb.v) / (ea.nrm * eb.nrm), 6) AS cosine
        |  FROM sigs a JOIN sigs b USING (sig)
        |  JOIN e ea ON ea.vec_id = a.vec_id
        |  JOIN e eb ON eb.vec_id = b.vec_id
        |  WHERE a.vec_id < b.vec_id)
        |SELECT id_a, id_b, cosine FROM pairs
        |WHERE cosine >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    "q89_pq_adc_exemplar" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |u AS (
        |  SELECT vec_id, v, nrm,
        |    list_transform(v, x -> x / (CASE WHEN nrm > 0 THEN nrm ELSE 1 END)) AS uv
        |  FROM e),
        |cw AS (
        |  SELECT s.s, t.vec_id AS cwid, t.uv[s.s * 8 + 1 : s.s * 8 + 8] AS cwv
        |  FROM (SELECT vec_id, uv FROM u ORDER BY vec_id LIMIT 16) t
        |  CROSS JOIN generate_series(0, 7) AS s(s)),
        |enc AS (
        |  SELECT vec_id AS neighbor_id, s, cwid FROM (
        |    SELECT n.vec_id, c.s, c.cwid,
        |      row_number() OVER (PARTITION BY n.vec_id, c.s
        |        ORDER BY round(list_distance(n.uv[c.s * 8 + 1 : c.s * 8 + 8], c.cwv), 6),
        |                 c.cwid) AS rn
        |    FROM u n CROSS JOIN cw c) WHERE rn = 1),
        |qlut AS (
        |  SELECT q.vec_id AS query_id, c.s, c.cwid,
        |    round(list_distance(q.uv[c.s * 8 + 1 : c.s * 8 + 8], c.cwv), 6) AS d
        |  FROM u q CROSS JOIN cw c
        |  WHERE q.vec_id % 100 = 0),
        |adc AS (
        |  SELECT l.query_id, enc.neighbor_id, round(sum(l.d), 6) AS approx
        |  FROM enc JOIN qlut l USING (s, cwid)
        |  WHERE enc.neighbor_id <> l.query_id
        |  GROUP BY 1, 2),
        |shortlist AS (
        |  SELECT query_id, neighbor_id FROM adc
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY approx, neighbor_id) <= 15),
        |scored AS (
        |  SELECT sl.query_id, sl.neighbor_id,
        |    round(list_dot_product(qe.v, ne.v) / (qe.nrm * ne.nrm), 6) AS sim
        |  FROM shortlist sl
        |  JOIN e qe ON qe.vec_id = sl.query_id
        |  JOIN e ne ON ne.vec_id = sl.neighbor_id)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS "rank",
        |  neighbor_id, sim
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5
        |ORDER BY query_id, "rank"""".stripMargin,

    "q87_lloyd_step_exemplar" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cvec, nrm AS cnrm
        |      FROM e ORDER BY vec_id LIMIT 8),
        |assigned AS (
        |  SELECT c.cid AS list, e.v, e.nrm
        |  FROM e CROSS JOIN c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) = 1),
        |comp AS (
        |  SELECT a.list, gs.pos - 1 AS pos,
        |    a.v[gs.pos] / (CASE WHEN a.nrm > 0 THEN a.nrm ELSE 1 END) AS ux
        |  FROM assigned a CROSS JOIN generate_series(1, 64) AS gs(pos)),
        |means AS (
        |  SELECT list, pos,
        |    CAST(sum(CAST(ux AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS m
        |  FROM comp GROUP BY 1, 2),
        |norms AS (
        |  SELECT list, sqrt(CAST(sum(CAST(m * m AS DECIMAL(30,12))) AS DOUBLE)) AS mn
        |  FROM means GROUP BY 1)
        |SELECT m.list, m.pos, floor(m.m / n.mn * 1e6) / 1e6 AS "value"
        |FROM means m JOIN norms n USING (list)
        |ORDER BY list, pos""".stripMargin,

    "q91_lloyd_iterate_exemplar" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, v AS cvec, nrm AS cnrm
        |       FROM e ORDER BY vec_id LIMIT 8),
        |assigned0 AS (
        |  SELECT c.cid AS list, e.v, e.nrm
        |  FROM e CROSS JOIN c0 c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) = 1),
        |comp0 AS (
        |  SELECT a.list, gs.pos - 1 AS pos,
        |    a.v[gs.pos] / (CASE WHEN a.nrm > 0 THEN a.nrm ELSE 1 END) AS ux
        |  FROM assigned0 a CROSS JOIN generate_series(1, 64) AS gs(pos)),
        |means0 AS (
        |  SELECT list, pos,
        |    CAST(sum(CAST(ux AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS m
        |  FROM comp0 GROUP BY 1, 2),
        |norms0 AS (
        |  SELECT list, sqrt(CAST(sum(CAST(m * m AS DECIMAL(30,12))) AS DOUBLE)) AS mn
        |  FROM means0 GROUP BY 1),
        |vals0 AS (
        |  SELECT m.list, m.pos, m.m / n.mn AS value
        |  FROM means0 m JOIN norms0 n USING (list)),
        |c1 AS (
        |  SELECT list AS cid, list(value ORDER BY pos) AS cvec
        |  FROM vals0 GROUP BY list),
        |c1n AS (SELECT cid, cvec, sqrt(list_dot_product(cvec, cvec)) AS cnrm
        |        FROM c1),
        |assigned1 AS (
        |  SELECT c.cid AS list, e.v, e.nrm
        |  FROM e CROSS JOIN c1n c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) = 1),
        |comp1 AS (
        |  SELECT a.list, gs.pos - 1 AS pos,
        |    a.v[gs.pos] / (CASE WHEN a.nrm > 0 THEN a.nrm ELSE 1 END) AS ux
        |  FROM assigned1 a CROSS JOIN generate_series(1, 64) AS gs(pos)),
        |means1 AS (
        |  SELECT list, pos,
        |    CAST(sum(CAST(ux AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS m
        |  FROM comp1 GROUP BY 1, 2),
        |norms1 AS (
        |  SELECT list, sqrt(CAST(sum(CAST(m * m AS DECIMAL(30,12))) AS DOUBLE)) AS mn
        |  FROM means1 GROUP BY 1)
        |SELECT m.list, m.pos, floor(m.m / n.mn * 1e6) / 1e6 AS "value"
        |FROM means1 m JOIN norms1 n USING (list)
        |ORDER BY list, pos""".stripMargin,

    // same op order as the engine: ((budget * sqrt(n)) / total) / n,
    // DECIMAL-exact Σ sqrt(n), md5-derived uniform — bit-identical keep
    // decisions cross-engine
    "q92_temperature_mix" ->
      """WITH counts AS (
        |  SELECT lang, count(*) AS n_src FROM documents GROUP BY lang),
        |total AS (
        |  SELECT sum(CAST(sqrt(n_src) AS DECIMAL(30,10))) AS total_pow
        |  FROM counts),
        |rates AS (
        |  SELECT c.lang,
        |    least(CAST(1.0 AS DOUBLE),
        |      400.0 * sqrt(c.n_src) / CAST(t.total_pow AS DOUBLE) / c.n_src)
        |      AS keep_rate
        |  FROM counts c CROSS JOIN total t)
        |SELECT d.lang, d.doc_id
        |FROM documents d JOIN rates r USING (lang)
        |WHERE ((('0x' || substr(md5('graft:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
        |       / 4294967296.0) < r.keep_rate
        |ORDER BY lang, doc_id""".stripMargin,

    // redaction order is part of the contract: email, then url, then ipv4
    "q93_pii_redact" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0
        |         THEN text || ' contact: user13@example.com via https://ex.example/path from 10.0.0.1'
        |         ELSE text END AS text
        |  FROM documents),
        |red AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(text,
        |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |        'https?://[^\s]+', '[URL]', 'g'),
        |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IPV4]', 'g')
        |      AS text_redacted
        |  FROM aug)
        |SELECT doc_id, md5(text_redacted) AS redacted_md5,
        |  CAST(len(text_redacted) AS BIGINT) AS len_redacted
        |FROM red ORDER BY doc_id""".stripMargin,

    // q46's shingle relation + the per-doc distinct-shingle count and
    // the integer-exact >= 10% drop verdict; left join keeps zero-hit docs
    "q94_contamination_report" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 8
        |      THEN list_transform(range(1, len(toks) - 6),
        |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
        |                          toks[i+4], toks[i+5], toks[i+6], toks[i+7]))
        |      ELSE [array_to_string(toks, ' ')] END)) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |        FROM documents)),
        |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 31 = 0),
        |nsh AS (SELECT doc_id, count(*) AS n_shingles FROM sh
        |        WHERE doc_id % 31 <> 0 GROUP BY doc_id),
        |hits AS (
        |  SELECT doc_id, count(*) AS n_hits
        |  FROM sh JOIN bench USING (s)
        |  WHERE doc_id % 31 <> 0
        |  GROUP BY doc_id)
        |SELECT n.doc_id, n.n_shingles,
        |  coalesce(h.n_hits, 0) AS n_hits,
        |  (n.n_shingles > 0 AND
        |   coalesce(h.n_hits, 0) * 100 >= n.n_shingles * 10) AS dropped
        |FROM nsh n LEFT JOIN hits h USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q95_shuffle_shards" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    md5('graft:' || CAST(doc_id AS VARCHAR)) AS hx
        |  FROM documents)
        |SELECT CAST((('0x' || substr(hx, 1, 8))::BIGINT % 8) AS INT) AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY ('0x' || substr(hx, 1, 8))::BIGINT % 8
        |    ORDER BY hx, doc_id) AS BIGINT) AS pos,
        |  doc_id
        |FROM h
        |ORDER BY shard, pos""".stripMargin,

    // the four release stages chained stage-by-stage, each mirroring its
    // standalone oracle (q94 gate on the augmented corpus, q93 redaction,
    // q92 mixing over the survivors' language counts, q95 layout)
    "q96_release_e2e" ->
      """WITH aug AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 13 = 0
        |         THEN text || ' contact: user13@example.com via https://ex.example/path from 10.0.0.1'
        |         ELSE text END AS text
        |  FROM documents WHERE doc_id % 31 <> 0),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 8
        |      THEN list_transform(range(1, len(toks) - 6),
        |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
        |                          toks[i+4], toks[i+5], toks[i+6], toks[i+7]))
        |      ELSE [array_to_string(toks, ' ')] END)) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |        FROM aug)),
        |bsh AS (
        |  SELECT DISTINCT unnest(list_distinct(CASE WHEN len(toks) >= 8
        |      THEN list_transform(range(1, len(toks) - 6),
        |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
        |                          toks[i+4], toks[i+5], toks[i+6], toks[i+7]))
        |      ELSE [array_to_string(toks, ' ')] END)) AS s
        |  FROM (SELECT string_split_regex(trim(text), '\s+') AS toks
        |        FROM documents WHERE doc_id % 31 = 0)),
        |rep AS (
        |  SELECT sh.doc_id, count(*) AS n_shingles,
        |    count(b.s) AS n_hits
        |  FROM sh LEFT JOIN (SELECT s, s AS hit FROM bsh) b USING (s)
        |  GROUP BY sh.doc_id),
        |kept AS (
        |  SELECT a.doc_id, a.lang, a.text
        |  FROM aug a JOIN rep r USING (doc_id)
        |  WHERE NOT (r.n_shingles > 0 AND r.n_hits * 100 >= r.n_shingles * 10)),
        |red AS (
        |  SELECT doc_id, lang,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(text,
        |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |        'https?://[^\s]+', '[URL]', 'g'),
        |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IPV4]', 'g')
        |      AS text_redacted
        |  FROM kept),
        |counts AS (SELECT lang, count(*) AS n_src FROM red GROUP BY lang),
        |total AS (
        |  SELECT sum(CAST(sqrt(n_src) AS DECIMAL(30,10))) AS total_pow
        |  FROM counts),
        |rates AS (
        |  SELECT c.lang,
        |    least(CAST(1.0 AS DOUBLE),
        |      300.0 * sqrt(c.n_src) / CAST(t.total_pow AS DOUBLE) / c.n_src)
        |      AS keep_rate
        |  FROM counts c CROSS JOIN total t),
        |mixed AS (
        |  SELECT d.doc_id, d.text_redacted,
        |    md5('graft:' || CAST(d.doc_id AS VARCHAR)) AS hx
        |  FROM red d JOIN rates r USING (lang)
        |  WHERE ((('0x' || substr(md5('graft:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
        |         / 4294967296.0) < r.keep_rate)
        |SELECT CAST((('0x' || substr(hx, 1, 8))::BIGINT % 4) AS INT) AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY ('0x' || substr(hx, 1, 8))::BIGINT % 4
        |    ORDER BY hx, doc_id) AS BIGINT) AS pos,
        |  doc_id, md5(text_redacted) AS redacted_md5
        |FROM mixed
        |ORDER BY shard, pos""".stripMargin,

    // intra-doc first-occurrence line filter: Spark's 0-based lambda
    // index pairs with 1-based array_position as i+1; DuckDB's lambda
    // index is already 1-based
    "q97_line_strip" ->
      """WITH lined AS (
        |  SELECT doc_id,
        |    regexp_replace(text, '((?:\S+ ){4}\S+) ', '\1' || chr(10), 'g') AS text
        |  FROM documents),
        |arr AS (SELECT doc_id, string_split(text, chr(10)) AS lns FROM lined),
        |u AS (SELECT doc_id, lns,
        |        list_filter(lns, (x, i) -> list_position(lns, x) = i) AS uniq
        |      FROM arr)
        |SELECT doc_id,
        |  CAST(len(lns) AS BIGINT) AS lines_total,
        |  CAST(len(uniq) AS BIGINT) AS lines_kept,
        |  md5(array_to_string(uniq, chr(10))) AS unique_md5
        |FROM u ORDER BY doc_id""".stripMargin,

    "q98_line_clean" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    text || chr(10) || 'Document ' || CAST(doc_id AS VARCHAR) ||
        |      ' retains this properly punctuated sentence.' ||
        |      chr(10) || 'Please enable javascript to continue.' ||
        |      chr(10) || 'Too short.' ||
        |      chr(10) || 'this line has words but no terminal punctuation' ||
        |      CASE WHEN doc_id % 4 = 0
        |           THEN chr(10) || 'An extra valid closing line appears here!'
        |           ELSE '' END AS text
        |  FROM documents),
        |arr AS (SELECT doc_id, string_split(text, chr(10)) AS lns FROM aug),
        |c AS (SELECT doc_id, lns,
        |        list_filter(lns, x ->
        |          regexp_matches(trim(x), '[.!?"]$')
        |          AND len(regexp_split_to_array(trim(x), '\s+')) >= 3
        |          AND NOT contains(lower(trim(x)), 'javascript')
        |          AND NOT contains(lower(trim(x)), 'cookie policy')
        |          AND NOT contains(lower(trim(x)), 'terms of use')) AS kept
        |      FROM arr)
        |SELECT doc_id,
        |  CAST(len(lns) AS BIGINT) AS lines_total,
        |  CAST(len(kept) AS BIGINT) AS lines_kept,
        |  array_to_string(kept, chr(10)) AS text_clean
        |FROM c ORDER BY doc_id""".stripMargin,

    // integer milli-weight sums are exact in both engines; the one double
    // division is floor-truncated, so threshold boundaries cannot flip
    "q99_quality_classifier" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id,
        |    CAST(len(ts) AS BIGINT) AS n_tokens,
        |    CAST(list_sum(list_transform(ts, t ->
        |      ('0x' || substr(md5('w:graft:' ||
        |         CAST(('0x' || substr(md5('f:graft:' || t), 1, 8))::BIGINT % 1024
        |              AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000))
        |      AS BIGINT) AS logit_milli
        |  FROM toks)
        |SELECT doc_id, n_tokens, logit_milli,
        |  floor(logit_milli / (n_tokens * 1000.0) * 1e6) / 1e6 AS quality_logit,
        |  floor(logit_milli / (n_tokens * 1000.0) * 1e6) / 1e6 >= 0.0 AS kept
        |FROM scored ORDER BY doc_id""".stripMargin,

    // merged-interval coverage via the sorted-starts lag identity; the
    // window key is the full md5 hex, identical in both engines
    "q100_dup_spans" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id,
        |    unnest(range(1, CASE WHEN len(toks) >= 3 THEN len(toks) - 1
        |                        ELSE 1 END)) AS i,
        |    toks
        |  FROM t),
        |s AS (
        |  SELECT doc_id, i,
        |    md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS k
        |  FROM w),
        |dup AS (SELECT k FROM s GROUP BY k HAVING count(DISTINCT doc_id) > 1),
        |d AS (SELECT s.doc_id, s.i FROM s JOIN dup USING (k)),
        |cov AS (
        |  SELECT doc_id, i,
        |    CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
        |         THEN 3
        |         ELSE least(3, i - lag(i) OVER (PARTITION BY doc_id ORDER BY i))
        |    END AS c
        |  FROM d),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_dup_windows,
        |    CAST(sum(c) AS BIGINT) AS dup_cov_tokens
        |  FROM cov GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
        |  coalesce(a.n_dup_windows, 0) AS n_dup_windows,
        |  coalesce(a.dup_cov_tokens, 0) AS dup_cov_tokens,
        |  floor(coalesce(a.dup_cov_tokens, 0) / (len(t.toks) * 1.0) * 1e6) / 1e6
        |    AS dup_ratio
        |FROM t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id""".stripMargin,

    // integer micro-shares ((1e6*n) // total) and their L1 distance are
    // exact in both engines; bins via integer division, capped at nBins-1
    "q104_drift_report" ->
      """WITH a AS (
        |  SELECT source,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tok
        |  FROM documents),
        |b AS (
        |  SELECT source,
        |    len(string_split_regex(trim(
        |      CASE WHEN doc_id % 7 = 0 THEN text || repeat(' x', 60)
        |           ELSE text END), '\s+')) AS n_tok
        |  FROM documents),
        |ca AS (SELECT source, least(n_tok // 50, 5) AS bin, count(*) AS n_a
        |       FROM a GROUP BY 1, 2),
        |cb AS (SELECT source, least(n_tok // 50, 5) AS bin, count(*) AS n_b
        |       FROM b GROUP BY 1, 2),
        |j AS (
        |  SELECT coalesce(ca.source, cb.source) AS source,
        |    coalesce(ca.bin, cb.bin) AS bin,
        |    coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
        |  FROM ca FULL OUTER JOIN cb
        |    ON ca.source = cb.source AND ca.bin = cb.bin),
        |tot AS (
        |  SELECT source, CAST(sum(n_a) AS BIGINT) AS tot_a,
        |    CAST(sum(n_b) AS BIGINT) AS tot_b
        |  FROM j GROUP BY source)
        |SELECT j.source, j.bin, j.n_a, j.n_b,
        |  (1000000 * j.n_a) // greatest(tot_a, 1) AS share_a_micro,
        |  (1000000 * j.n_b) // greatest(tot_b, 1) AS share_b_micro,
        |  abs((1000000 * j.n_a) // greatest(tot_a, 1) -
        |      (1000000 * j.n_b) // greatest(tot_b, 1)) AS drift_micro
        |FROM j JOIN tot USING (source)
        |ORDER BY j.source, j.bin""".stripMargin,

    // integer micro-prob contributions ((1e6*(c12+1)) // (c1+V)) sum and
    // average exactly in both engines; the only double op is the final /1e6
    "q103_bigram_lm_score" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
        |        FROM t WHERE len(ts) >= 2)),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
        |v AS (SELECT count(DISTINCT w1) AS v FROM c12),
        |sc AS (
        |  SELECT b.doc_id,
        |    (1000000 * (c12.c12 + 1)) // (c1.c1 + v.v) AS contrib
        |  FROM b JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
        |pd AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    CAST(sum(contrib) AS BIGINT) AS s
        |  FROM sc GROUP BY doc_id),
        |base AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens FROM t)
        |SELECT base.doc_id, n_tokens,
        |  coalesce(pd.n_bigrams, 0) AS n_bigrams,
        |  coalesce(pd.s // pd.n_bigrams, 0) AS mean_prob_micro,
        |  coalesce(pd.s // pd.n_bigrams, 0) / 1e6 AS mean_prob
        |FROM base LEFT JOIN pd USING (doc_id) ORDER BY base.doc_id""".stripMargin,

    // each stage mirrors its standalone oracle (q99 logit, keep-first
    // min-window, q94 contamination verdict) over the dup-implanted corpus
    "q101_curation_funnel" ->
      """WITH wd AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 17 = 0
        |         THEN 'duplicate stanza alpha shared across documents'
        |         ELSE text END AS text
        |  FROM documents),
        |corpus AS (SELECT doc_id, text FROM wd WHERE doc_id % 31 <> 0),
        |qt AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM corpus),
        |qf AS (
        |  SELECT doc_id,
        |    floor(CAST(list_sum(list_transform(ts, t ->
        |      ('0x' || substr(md5('w:graft:' ||
        |         CAST(('0x' || substr(md5('f:graft:' || t), 1, 8))::BIGINT % 1024
        |              AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000)) AS BIGINT)
        |      / (len(ts) * 1000.0) * 1e6) / 1e6 >= 0.0 AS q_ok
        |  FROM qt),
        |df AS (
        |  SELECT doc_id,
        |    doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS d_ok
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(tk) >= 8
        |      THEN list_transform(range(1, len(tk) - 6),
        |           i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3],
        |                          tk[i+4], tk[i+5], tk[i+6], tk[i+7]))
        |      ELSE [array_to_string(tk, ' ')] END)) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |        FROM wd)),
        |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 31 = 0),
        |nsh AS (SELECT doc_id, count(*) AS n_shingles FROM sh
        |        WHERE doc_id % 31 <> 0 GROUP BY doc_id),
        |hits AS (
        |  SELECT doc_id, count(*) AS n_hits
        |  FROM sh JOIN bench USING (s)
        |  WHERE doc_id % 31 <> 0
        |  GROUP BY doc_id),
        |cf AS (
        |  SELECT n.doc_id,
        |    NOT (n.n_shingles > 0 AND
        |         coalesce(h.n_hits, 0) * 100 >= n.n_shingles * 10) AS c_ok
        |  FROM nsh n LEFT JOIN hits h USING (doc_id)),
        |agg AS (
        |  SELECT count(*) AS n_total,
        |    count(CASE WHEN q_ok THEN 1 END) AS n_q,
        |    count(CASE WHEN q_ok AND d_ok THEN 1 END) AS n_qd,
        |    count(CASE WHEN q_ok AND d_ok AND c_ok THEN 1 END) AS n_qdc
        |  FROM qf JOIN df USING (doc_id) JOIN cf USING (doc_id)),
        |st AS (
        |  SELECT '1_quality' AS stage, n_total AS n_in, n_q AS n_out FROM agg
        |  UNION ALL SELECT '2_exact_dedup', n_q, n_qd FROM agg
        |  UNION ALL SELECT '3_decontaminate', n_qd, n_qdc FROM agg)
        |SELECT stage, n_in, n_out,
        |  floor(n_out / (n_in * 1.0) * 1e6) / 1e6 AS retention
        |FROM st ORDER BY stage""".stripMargin,

    "q49_stable_split" ->
      """SELECT CASE WHEN substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
        |            WHEN substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
        |            ELSE 'test' END AS split,
        |  count(*) AS n_docs, min(doc_id) AS min_id
        |FROM documents GROUP BY 1 ORDER BY split""".stripMargin,

    "q48_tfidf_topk" ->
      """WITH terms AS (
        |  SELECT doc_id, tok AS term, count(*) AS tf
        |  FROM (SELECT doc_id,
        |          unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |        FROM documents)
        |  GROUP BY doc_id, tok),
        |dfreq AS (SELECT term, count(*) AS df FROM terms GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.term,
        |    round(t.tf * (ln((n.n_docs + 1.0) / (d.df + 1.0)) + 1.0), 6)
        |      AS tfidf
        |  FROM terms t JOIN dfreq d USING (term) CROSS JOIN n)
        |SELECT doc_id,
        |  row_number() OVER (PARTITION BY doc_id
        |                     ORDER BY tfidf DESC, term) AS "rank",
        |  term, tfidf
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY doc_id
        |                           ORDER BY tfidf DESC, term) <= 5
        |ORDER BY doc_id, "rank"""".stripMargin,

    "q47_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |counts AS (
        |  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
        |tops AS (
        |  SELECT doc_id, max(c) AS max_c, sum(c) AS total
        |  FROM counts GROUP BY doc_id),
        |bi AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents)
        |SELECT bi.doc_id,
        |  round(tops.max_c::DOUBLE / tops.total, 6) AS top_token_share,
        |  CASE WHEN len(bi.t) >= 2
        |       THEN round(1 - len(list_distinct(list_transform(
        |              range(1, len(bi.t)),
        |              i -> concat_ws(' ', bi.t[i], bi.t[i+1]))))::DOUBLE
        |            / (len(bi.t) - 1), 6)
        |       ELSE 0.0 END AS dup_bigram_fraction
        |FROM bi JOIN tops ON bi.doc_id = tops.doc_id
        |ORDER BY bi.doc_id""".stripMargin,

    "q45_pii_scan" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0
        |         THEN text || ' contact: user13@example.com via https://ex.example/path from 10.0.0.1'
        |         ELSE text END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  len(regexp_extract_all(text, 'https?://[^\s]+')) AS n_url,
        |  len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS n_ipv4,
        |  (len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) > 0
        |   OR len(regexp_extract_all(text, 'https?://[^\s]+')) > 0
        |   OR len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) > 0) AS has_pii
        |FROM aug ORDER BY doc_id""".stripMargin,

    "q46_contamination" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 8
        |      THEN list_transform(range(1, len(toks) - 6),
        |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
        |                          toks[i+4], toks[i+5], toks[i+6], toks[i+7]))
        |      ELSE [array_to_string(toks, ' ')] END)) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |        FROM documents)),
        |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 31 = 0)
        |SELECT doc_id, count(*) AS n_hits
        |FROM sh JOIN bench USING (s)
        |WHERE doc_id % 31 <> 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // bloom prefilter + exact verify has no false negatives, so q55 IS
    // the q46 relation — same oracle
    "q55_contamination_bloom" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 8
        |      THEN list_transform(range(1, len(toks) - 6),
        |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
        |                          toks[i+4], toks[i+5], toks[i+6], toks[i+7]))
        |      ELSE [array_to_string(toks, ' ')] END)) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |        FROM documents)),
        |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 31 = 0)
        |SELECT doc_id, count(*) AS n_hits
        |FROM sh JOIN bench USING (s)
        |WHERE doc_id % 31 <> 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // parallel unnest zips in DuckDB, mirroring posexplode's (idx, line);
    // keep-first = row_number over the line ordered by (doc_id, idx)
    "q50_line_dedup" ->
      """WITH lines AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, 2)) AS idx,
        |    unnest([text, substr(text, 1, 50), 'graft boilerplate line']) AS line
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, idx, line,
        |    row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) = 1 AS kept
        |  FROM lines)
        |SELECT doc_id, count(*) AS n_lines,
        |  count(CASE WHEN kept THEN 1 END) AS n_kept,
        |  coalesce(string_agg(CASE WHEN kept THEN line END, chr(10) ORDER BY idx), '')
        |    AS text_kept
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // quantile_cont interpolates exactly like Spark's exact `percentile`
    "q51_column_profile" ->
      """WITH u AS (
        |  SELECT 'l_discount' AS col_name, l_discount AS value FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', l_quantity FROM lineitem)
        |SELECT col_name, count(*) AS n_rows, count(value) AS n_present,
        |  count(DISTINCT value) AS n_distinct,
        |  min(value) AS min_value, max(value) AS max_value,
        |  round(quantile_cont(value, 0.5), 6) AS p50
        |FROM u GROUP BY col_name ORDER BY col_name""".stripMargin,

    "q52_corpus_mixture" ->
      """WITH agg AS (
        |  SELECT source, lang, count(*) AS n_docs,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY source, lang)
        |SELECT source, lang, n_docs, n_tokens,
        |  round(n_tokens / sum(n_tokens) OVER (), 6) AS token_share
        |FROM agg ORDER BY source, lang""".stripMargin,

    // same edge set as q25; the recursive walk propagates every label to
    // everything reachable, so min(label) per node = min id in component
    "q53_dup_clusters" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, substr(text, 1, 32) AS block,
        |    list_distinct(CASE WHEN len(toks) >= 3
        |      THEN list_transform(range(1, len(toks) - 1),
        |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |      ELSE [array_to_string(toks, ' ')] END) AS shingles
        |  FROM (SELECT doc_id, text,
        |        string_split_regex(trim(text), '\s+') AS toks FROM documents)
        |  QUALIFY count(*) OVER (PARTITION BY substr(text, 1, 32)) <= 1000),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.block = b.block AND a.doc_id < b.doc_id
        |  WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE /
        |      (len(a.shingles) + len(b.shingles)
        |       - len(list_intersect(a.shingles, b.shingles))), 6) >= 0.5),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |walk (id, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, w.label FROM walk w JOIN edges e ON w.id = e.src),
        |lab AS (SELECT id AS doc_id, min(label) AS cluster_id FROM walk GROUP BY id)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM lab ORDER BY doc_id""".stripMargin,

    "q57_budget_sample" ->
      """WITH toks AS (
        |  SELECT doc_id, source, lang,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens,
        |    md5('graft:' || doc_id) AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source, lang
        |      ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_tokens
        |  FROM toks)
        |SELECT doc_id, source, lang, n_tokens, cum_tokens FROM c
        |WHERE cum_tokens <= 120 ORDER BY doc_id""".stripMargin,

    "q58_sequence_pack" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens,
        |    md5('graft:' || doc_id) AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
        |      AS BIGINT) AS start_tok
        |  FROM toks)
        |SELECT doc_id, source, n_tokens, start_tok,
        |  CAST(floor(start_tok / 512.0) AS BIGINT) AS seq_first,
        |  CAST(floor((start_tok + n_tokens - 1) / 512.0) AS BIGINT) AS seq_last
        |FROM c ORDER BY doc_id""".stripMargin,

    // LEFT JOIN + rank-1 filter is the quadratic-but-simple oracle twin of
    // the single-shuffle union+window plan; identical tie-break (max
    // orderkey at equal o_orderdate) keeps the pick deterministic
    "q59_asof_join" ->
      """WITH ranked AS (
        |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |SELECT event_id, user_id, ts, o_orderkey AS last_orderkey,
        |  o_totalprice AS last_price
        |FROM ranked WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q67_set_ops" ->
      """WITH a AS (SELECT doc_id FROM documents WHERE lang = 'en'),
        |b AS (SELECT doc_id FROM documents WHERE n_chars > 300)
        |SELECT doc_id, 'both' AS op FROM (SELECT doc_id FROM a INTERSECT SELECT doc_id FROM b)
        |UNION ALL
        |SELECT doc_id, 'en_only' FROM (SELECT doc_id FROM a EXCEPT SELECT doc_id FROM b)
        |UNION ALL
        |SELECT doc_id, 'long_only' FROM (SELECT doc_id FROM b EXCEPT SELECT doc_id FROM a)
        |ORDER BY op, doc_id""".stripMargin,

    "q64_window_battery" ->
      """SELECT o_custkey, o_orderkey,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS quartile,
        |  CAST(percent_rank() OVER w AS DOUBLE) AS pct_rank,
        |  CAST(cume_dist() OVER w AS DOUBLE) AS cdist,
        |  lead(o_orderkey, 1, -1) OVER w AS next_key,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rnk""".stripMargin,

    "q65_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "q102_grouping_sets" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
        |  coalesce(n_name, 'ALL') AS nation,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders,
        |  CAST(grouping(r_name) AS BIGINT) AS g_region,
        |  CAST(grouping(n_name) AS BIGINT) AS g_nation
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
        |ORDER BY region, nation""".stripMargin,

    // UNION ALL formulation — engine-neutral melt, no UNPIVOT dialect risk
    "q105_unpivot" ->
      """WITH w AS (
        |  SELECT o_orderpriority,
        |    count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |    count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |    count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, 'O' AS status, n_o AS n_orders FROM w
        |UNION ALL SELECT o_orderpriority, 'F', n_f FROM w
        |UNION ALL SELECT o_orderpriority, 'P', n_p FROM w
        |ORDER BY o_orderpriority, status""".stripMargin,

    "q66_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS price_o,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS price_f,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS price_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q68_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls, g_flag, g_status""".stripMargin,

    // range(0, n, stride) = the same start set as Spark's
    // sequence(0, n-1, stride); DuckDB list slicing is 1-based
    // inclusive with clamping, mirroring slice(toks, start+1, window).
    "q69_chunk_overlap" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS cs
        |  FROM tk)
        |SELECT doc_id, cs // 48 AS chunk_idx,
        |  array_to_string(toks[cs+1:cs+64], ' ') AS chunk_text,
        |  len(toks[cs+1:cs+64]) AS n_chunk_tokens
        |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,

    "q70_edit_distance" ->
      """WITH d AS (
        |  SELECT doc_id, text, substr(text, 1, 32) AS block,
        |    length(text) AS len
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  levenshtein(a.text, b.text) AS dist
        |FROM d a JOIN d b ON a.block = b.block AND a.doc_id < b.doc_id
        |WHERE abs(a.len - b.len) <= 40 AND levenshtein(a.text, b.text) <= 40
        |ORDER BY id_a, id_b""".stripMargin,

    // q53's recursive component walk + q23's quality formula + a
    // first_value window for the keep-best pick.
    "q71_canonical_doc" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, substr(text, 1, 32) AS block,
        |    list_distinct(CASE WHEN len(toks) >= 3
        |      THEN list_transform(range(1, len(toks) - 1),
        |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |      ELSE [array_to_string(toks, ' ')] END) AS shingles
        |  FROM (SELECT doc_id, text,
        |        string_split_regex(trim(text), '\s+') AS toks FROM documents)
        |  QUALIFY count(*) OVER (PARTITION BY substr(text, 1, 32)) <= 1000),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.block = b.block AND a.doc_id < b.doc_id
        |  WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE /
        |      (len(a.shingles) + len(b.shingles)
        |       - len(list_intersect(a.shingles, b.shingles))), 6) >= 0.5),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |walk (id, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, w.label FROM walk w JOIN edges e ON w.id = e.src),
        |lab AS (SELECT id AS doc_id, min(label) AS cluster_id FROM walk GROUP BY id),
        |qual AS (
        |  SELECT doc_id,
        |    floor((
        |      (CASE WHEN length(text) BETWEEN 100 AND 10000 THEN 1.0
        |            WHEN length(text) BETWEEN 20 AND 99 THEN 0.5 ELSE 0.1 END) * 0.4
        |      + least(len(list_distinct(string_split_regex(trim(text), '\s+')))::DOUBLE
        |           / greatest(len(string_split_regex(trim(text), '\s+')), 1), 1.0) * 0.3
        |      + (1.0 - least(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))::DOUBLE
        |           / greatest(length(text), 1) * 5, 1.0)) * 0.2
        |      + least(round(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |            x -> x IN ('the','a','of','and','to','in','is','it','that','for')))::DOUBLE
        |           / greatest(len(string_split_regex(trim(lower(text)), '\s+')), 1), 6) * 5, 1.0) * 0.1
        |    ) * 1000000.0) / 1000000.0 AS quality
        |  FROM documents)
        |SELECT lab.doc_id, lab.cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        |  (lab.doc_id = first_value(lab.doc_id) OVER w) AS is_canonical,
        |  first_value(lab.doc_id) OVER w AS canonical_id,
        |  qual.quality
        |FROM lab JOIN qual ON lab.doc_id = qual.doc_id
        |WINDOW w AS (PARTITION BY cluster_id ORDER BY quality DESC, lab.doc_id ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY lab.doc_id""".stripMargin,

    // generated to mirror TextOps.charEntropy bucket-for-bucket in the
    // same fold order (see entropyOracleSql below the map)
    "q72_char_entropy" -> entropyOracleSql,

    "q73_zscore_outliers" ->
      """WITH stx AS (
        |  SELECT event_type, count("value") AS n,
        |    CAST(sum(CAST("value" AS DECIMAL(30,10))) AS DOUBLE) AS s,
        |    CAST(sum(CAST("value" * "value" AS DECIMAL(30,10))) AS DOUBLE) AS s2
        |  FROM events GROUP BY event_type)
        |SELECT event_id, e.event_type, "value",
        |  round(("value" - s/n) / sqrt((s2 - s*s/n)/(n-1)), 4) AS z
        |FROM events e JOIN stx USING (event_type)
        |WHERE n > 1 AND (s2 - s*s/n)/(n-1) > 0
        |  AND abs(round(("value" - s/n) / sqrt((s2 - s*s/n)/(n-1)), 4)) > 3
        |ORDER BY event_id""".stripMargin,

    "q74_regional_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q76_small_order_revenue" ->
      """WITH pa AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      / count(*) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price,
        |  count(*) AS n_small
        |FROM lineitem JOIN pa USING (l_partkey)
        |WHERE l_quantity < avg_qty * 0.2
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q77_prequential_anomaly" ->
      """WITH scored AS (
        |  SELECT event_id, event_type, "value",
        |    count(*) OVER w AS n_prior,
        |    CAST(sum(CAST("value" AS DECIMAL(30,10))) OVER w AS DOUBLE) AS sm,
        |    CAST(sum(CAST("value" * "value" AS DECIMAL(30,10))) OVER w AS DOUBLE) AS s2
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, event_type, "value", n_prior,
        |  round(("value" - sm/n_prior)
        |    / sqrt((s2 - sm*sm/n_prior)/(n_prior - 1)), 4) AS z
        |FROM scored
        |WHERE n_prior >= 30 AND (s2 - sm*sm/n_prior)/(n_prior - 1) > 0
        |  AND abs(round(("value" - sm/n_prior)
        |    / sqrt((s2 - sm*sm/n_prior)/(n_prior - 1)), 4)) > 3
        |ORDER BY event_id""".stripMargin,

    "q82_gap_fill" ->
      """WITH bounds AS (
        |  SELECT event_type, date_trunc('hour', min(ts)) AS lo, max(ts) AS hi
        |  FROM events GROUP BY event_type),
        |grid AS (
        |  SELECT event_type,
        |    unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS t
        |  FROM bounds),
        |u AS (
        |  SELECT event_type, ts AS t, "value" AS v, 0 AS is_grid, event_id
        |  FROM events
        |  UNION ALL
        |  SELECT event_type, t, NULL, 1, NULL FROM grid),
        |f AS (
        |  SELECT event_type, t, is_grid,
        |    last_value(v IGNORE NULLS) OVER (
        |      PARTITION BY event_type ORDER BY t, is_grid, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |  FROM u)
        |SELECT event_type, t AS grid_ts, filled
        |FROM f WHERE is_grid = 1
        |ORDER BY event_type, grid_ts""".stripMargin,

    "q81_retention" ->
      """WITH fs AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        |  FROM events GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
        |  CAST(datediff('day', cohort_day, day) AS BIGINT) AS day_offset,
        |  count(DISTINCT a.user_id) AS n_active
        |FROM act a JOIN fs USING (user_id)
        |GROUP BY cohort_day, datediff('day', cohort_day, day)
        |ORDER BY cohort_day, day_offset""".stripMargin,

    "q80_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT s1.user_id, t1, min(CASE WHEN e.ts > t1 THEN e.ts END) AS t2
        |  FROM s1 LEFT JOIN events e
        |    ON e.user_id = s1.user_id AND e.event_type = 'click'
        |  GROUP BY s1.user_id, t1),
        |s3 AS (
        |  SELECT s2.user_id, t1, t2, min(CASE WHEN e.ts > t2 THEN e.ts END) AS t3
        |  FROM s2 LEFT JOIN events e
        |    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
        |  GROUP BY s2.user_id, t1, t2),
        |c AS (SELECT count(t1) AS n1, count(t2) AS n2, count(t3) AS n3 FROM s3)
        |SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type, n1 AS n_users,
        |  CASE WHEN n1 > 0 THEN floor(n1::DOUBLE / n1 * 1e4) / 1e4 ELSE 0.0 END AS conversion
        |FROM c
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'click', n2,
        |  CASE WHEN n1 > 0 THEN floor(n2::DOUBLE / n1 * 1e4) / 1e4 ELSE 0.0 END FROM c
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'purchase', n3,
        |  CASE WHEN n2 > 0 THEN floor(n3::DOUBLE / n2 * 1e4) / 1e4 ELSE 0.0 END FROM c
        |ORDER BY step""".stripMargin,

    "q78_weighted_sample" ->
      """WITH keyed AS (
        |  SELECT lang, doc_id, n_chars,
        |    -ln((('0x' || substr(md5('graft:' || doc_id), 1, 8))::BIGINT + 0.5)
        |        / 4294967296.0) / n_chars AS priority
        |  FROM documents WHERE n_chars > 0)
        |SELECT lang, doc_id, n_chars,
        |  CAST(row_number() OVER w AS BIGINT) AS sample_rank
        |FROM keyed
        |WINDOW w AS (PARTITION BY lang ORDER BY priority, doc_id)
        |QUALIFY row_number() OVER w <= 25
        |ORDER BY lang, sample_rank""".stripMargin,

    "q62_stratified_sample" ->
      """WITH ranked AS (
        |  SELECT lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('graft:' || CAST(doc_id AS VARCHAR)), doc_id)
        |      AS BIGINT) AS rank
        |  FROM documents)
        |SELECT lang, doc_id, rank FROM ranked WHERE rank <= 20
        |ORDER BY lang, rank""".stripMargin,

    // mirrors the engine's composition stage by stage; the stopword gate
    // uses the same integer-exact n_stop*25 > n_toks comparison
    "q63_curation_e2e" ->
      """WITH corpus AS (
        |  SELECT doc_id, text,
        |    len(string_split_regex(trim(text), '\s+')) AS n_toks,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      x -> x IN ('the','a','of','and','to','in','is','it','that','for')))
        |      AS n_stop
        |  FROM documents WHERE doc_id % 31 <> 0 AND lang = 'en'),
        |quality AS (
        |  SELECT doc_id, text, n_toks FROM corpus
        |  WHERE n_toks BETWEEN 20 AND 2000 AND n_stop * 25 > n_toks),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 8
        |      THEN list_transform(range(1, len(toks) - 6),
        |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],
        |                toks[i+3], toks[i+4], toks[i+5], toks[i+6],
        |                toks[i+7]))
        |      ELSE [array_to_string(toks, ' ')] END)) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |        FROM quality)),
        |bench AS (
        |  SELECT DISTINCT unnest(list_distinct(CASE WHEN len(toks) >= 8
        |      THEN list_transform(range(1, len(toks) - 6),
        |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],
        |                toks[i+3], toks[i+4], toks[i+5], toks[i+6],
        |                toks[i+7]))
        |      ELSE [array_to_string(toks, ' ')] END)) AS s
        |  FROM (SELECT string_split_regex(trim(text), '\s+') AS toks
        |        FROM documents WHERE doc_id % 31 = 0)),
        |contaminated AS (SELECT DISTINCT doc_id FROM sh JOIN bench USING (s)),
        |kept AS (
        |  SELECT min(doc_id) AS doc_id, min(n_toks) AS n_toks
        |  FROM quality GROUP BY sha256(text)),
        |survivors AS (
        |  SELECT doc_id, n_toks FROM kept
        |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
        |labeled AS (
        |  SELECT CASE
        |    WHEN substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
        |      THEN 'train'
        |    WHEN substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 1) <= 'd'
        |      THEN 'val'
        |    ELSE 'test' END AS split, doc_id, n_toks
        |  FROM survivors)
        |SELECT split, count(*) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS sum_tokens, min(doc_id) AS min_id
        |FROM labeled GROUP BY split ORDER BY split""".stripMargin,

    // integer ppm share keeps the result float-free; threshold n*(k+1) >
    // total mirrors the engine's overflow-safe integer comparison
    "q61_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT tok FROM (SELECT unnest(string_split_regex(
        |      trim(lower(text)), '\s+')) AS tok FROM documents)
        |  WHERE tok <> ''),
        |c AS (SELECT tok AS token, count(*) AS n FROM toks GROUP BY tok),
        |tot AS (SELECT count(*) AS total FROM toks)
        |SELECT token, n, n * 1000000 // total AS share_ppm
        |FROM c, tot WHERE n * 51 > total
        |ORDER BY n DESC, token""".stripMargin,

    "q60_range_join" ->
      """WITH periods AS (
        |  SELECT i AS period_id,
        |    DATE '1995-01-01' + (i*14) * INTERVAL 1 DAY AS lo,
        |    DATE '1995-01-01' + (i*14 + 30) * INTERVAL 1 DAY AS hi
        |  FROM range(60) t(i))
        |SELECT period_id, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM periods p JOIN orders o
        |  ON o.o_orderdate >= p.lo AND o.o_orderdate < p.hi
        |GROUP BY period_id ORDER BY period_id""".stripMargin,

    // the oracle pins the sketch's in-band flag to TRUE: at accuracy
    // 10000 the rank error is far inside the exact (p40, p60) band
    "q54_quantile_sketch" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_exact,
        |  true AS approx_in_band
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the salted two-stage aggregation is semantically a plain GROUP BY —
    // DECIMAL partials keep the sum exact, so the hash must match
    "q44_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(l_orderkey) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // mirrors runOnRegistry end to end: FK rule drops customers whose
    // nation was filtered out (null FKs kept), then the q12-style merge
    // classifies inserts/updates/deletes/unchanged against existing state
    "q42_pipeline_e2e" ->
      """WITH cleaned AS (
        |  SELECT c_custkey, c_nationkey,
        |         CASE WHEN c_custkey % 7 = 0 THEN c_acctbal * 2.0
        |              ELSE c_acctbal END AS c_acctbal
        |  FROM customer
        |  WHERE c_nationkey IS NULL OR c_nationkey IN
        |        (SELECT n_nationkey FROM nation WHERE n_nationkey < 20)),
        |existing AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal,
        |         TIMESTAMP '2020-01-01 00:00:00' AS updated_at,
        |         (c_custkey % 11 = 0) AS is_deleted
        |  FROM customer WHERE c_custkey % 3 <> 0),
        |updated AS (
        |  SELECT i.c_custkey, i.c_nationkey, i.c_acctbal, e.is_deleted
        |  FROM cleaned i JOIN existing e USING (c_custkey)
        |  WHERE (i.c_nationkey IS DISTINCT FROM e.c_nationkey)
        |     OR (i.c_acctbal IS DISTINCT FROM e.c_acctbal)),
        |deleted AS (
        |  SELECT e.* FROM existing e
        |  WHERE NOT EXISTS (SELECT 1 FROM cleaned i
        |                    WHERE i.c_custkey = e.c_custkey)
        |    AND NOT e.is_deleted),
        |merged AS (
        |  SELECT i.c_custkey, i.c_nationkey, i.c_acctbal,
        |         TIMESTAMP '2021-01-01 00:00:00' AS updated_at,
        |         false AS is_deleted
        |  FROM cleaned i
        |  WHERE NOT EXISTS (SELECT 1 FROM existing e
        |                    WHERE e.c_custkey = i.c_custkey)
        |  UNION ALL
        |  SELECT c_custkey, c_nationkey, c_acctbal,
        |         TIMESTAMP '2021-01-01 00:00:00', is_deleted
        |  FROM updated
        |  UNION ALL
        |  SELECT c_custkey, c_nationkey, c_acctbal,
        |         TIMESTAMP '2021-01-01 00:00:00', true
        |  FROM deleted
        |  UNION ALL
        |  SELECT e.* FROM existing e
        |  WHERE NOT EXISTS (SELECT 1 FROM updated u
        |                    WHERE u.c_custkey = e.c_custkey)
        |    AND NOT EXISTS (SELECT 1 FROM deleted d
        |                    WHERE d.c_custkey = e.c_custkey))
        |SELECT * FROM merged ORDER BY c_custkey""".stripMargin,

    // the sketch value itself is engine-specific, but the exact count and
    // the rsd=1% error bound (≤5% with huge margin) are deterministic
    // the oracle predicts the exact cardinalities and the (sparse-mode
    // deterministic) inclusion-exclusion bound flag
    "q117_corpus_overlap" ->
      """WITH d AS (
        |  SELECT md5(text) AS k,
        |    CAST(regexp_extract(source, '\d+') AS INT) AS sn
        |  FROM documents),
        |a AS (SELECT DISTINCT k FROM d WHERE sn < 10),
        |b AS (SELECT DISTINCT k FROM d WHERE sn >= 10
        |      UNION SELECT k FROM d WHERE sn < 5)
        |SELECT (SELECT count(*) FROM a) AS exact_a,
        |  (SELECT count(*) FROM b) AS exact_b,
        |  (SELECT count(*) FROM a JOIN b USING (k)) AS exact_overlap,
        |  true AS overlap_ok
        |ORDER BY exact_a""".stripMargin,

    // the oracle predicts the exact heavy-key counts and the (CMS-
    // guaranteed, deterministic at fixed seed) error-bound flag
    "q116_heavy_keys_cms" ->
      """WITH cnt AS (
        |  SELECT l_partkey, count(*) AS exact_cnt FROM lineitem
        |  GROUP BY l_partkey)
        |SELECT l_partkey, exact_cnt, true AS est_ok FROM cnt
        |QUALIFY row_number() OVER (ORDER BY exact_cnt DESC, l_partkey) <= 20
        |ORDER BY l_partkey""".stripMargin,

    // generated from Q120Merges (table and SQL cannot drift): framed-
    // string replace chain ≡ the native expression's fusion order
    "q120_bpe_tokenize" -> q120OracleSql,

    // window formulation of the graft_top_k selection (the q48/q83/q90
    // contract); cumulative share in integer ppm via floor division
    "q118_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT t.tok FROM documents,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS t(tok)
        |  WHERE t.tok <> ''),
        |cnt AS (SELECT tok AS token, count(*) AS cnt FROM toks GROUP BY tok),
        |tot AS (SELECT sum(cnt) AS total FROM cnt),
        |top AS (
        |  SELECT token, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, token) AS "rank"
        |  FROM cnt
        |  QUALIFY row_number() OVER (ORDER BY cnt DESC, token) <= 100)
        |SELECT "rank", token, cnt,
        |  CAST((sum(cnt) OVER (ORDER BY "rank")) * 1000000 // total AS BIGINT)
        |    AS cum_ppm
        |FROM top, tot
        |ORDER BY "rank"""".stripMargin,

    // every Gopher rule is an integer cross-multiplication — no float in
    // any decision, so the booleans are exact cross-engine; token split
    // ≡ Spark's (q21-pinned), line split via chr(10)
    "q114_gopher_rules" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || chr(10) || '- bullet one' ||
        |           chr(10) || '- bullet two' || chr(10) || '* bullet three'
        |         WHEN doc_id % 7 = 1 THEN text || chr(10) ||
        |           'to be continued...' || chr(10) || 'and then' || chr(8230)
        |         WHEN doc_id % 7 = 2 THEN text || ' ## ### #### ##'
        |         ELSE text END AS text
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS toks,
        |    string_split(text, chr(10)) AS lns,
        |    CAST(len(regexp_extract_all(text, '#|\.\.\.|' || chr(8230))) AS BIGINT) AS symbols
        |  FROM aug),
        |g AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS word_chars,
        |    symbols,
        |    CAST(len(lns) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(lns, x -> regexp_matches(x, '^[ \t]*[-*' || chr(8226) || ']'))) AS BIGINT) AS bullet_lines,
        |    CAST(len(list_filter(lns, x -> regexp_matches(x, '(\.\.\.|' || chr(8230) || ')[ \t]*$'))) AS BIGINT) AS ellipsis_lines,
        |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
        |    CAST(len(list_distinct(list_intersect(list_transform(toks, x -> lower(x)),
        |      ['the','be','to','of','and','that','have','with']))) AS BIGINT) AS stop_hits
        |  FROM f)
        |SELECT doc_id, n_words,
        |  n_words BETWEEN 50 AND 100000 AS pass_word_count,
        |  word_chars >= n_words * 3 AND word_chars <= n_words * 10 AS pass_mean_word_len,
        |  symbols * 10 <= n_words AS pass_symbol_ratio,
        |  bullet_lines * 10 <= n_lines * 9 AS pass_bullet,
        |  ellipsis_lines * 10 <= n_lines * 3 AS pass_ellipsis,
        |  alpha_words * 5 >= n_words * 4 AS pass_alpha,
        |  stop_hits >= 2 AS pass_stopwords,
        |  (n_words BETWEEN 50 AND 100000) AND
        |    (word_chars >= n_words * 3 AND word_chars <= n_words * 10) AND
        |    (symbols * 10 <= n_words) AND (bullet_lines * 10 <= n_lines * 9) AND
        |    (ellipsis_lines * 10 <= n_lines * 3) AND
        |    (alpha_words * 5 >= n_words * 4) AND (stop_hits >= 2) AS gopher_pass
        |FROM g ORDER BY doc_id""".stripMargin,

    // q40-pattern tolerance gate: the oracle predicts the exact counts
    // and the (always-true at these cardinalities) error-bound flag; the
    // Spark side computes the flag from the live sketch estimates
    "q113_shard_distinct_sketch" ->
      """SELECT source, count(DISTINCT md5(text)) AS exact_distinct,
        |  true AS est_within_5pct
        |FROM documents GROUP BY source
        |UNION ALL
        |SELECT '__all__', count(DISTINCT md5(text)), true FROM documents
        |ORDER BY source""".stripMargin,

    "q40_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
        |  true AS approx_within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q39_frame_sample" ->
      """SELECT doc_id, n_chars * 800 AS duration_ms, r.i AS frame_idx,
        |  (r.i * n_chars * 100)::BIGINT AS frame_time_ms
        |FROM documents, range(8) r(i)
        |WHERE doc_id % 50 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // the window formulation the aggregate replaces — same (revenue DESC,
    // custkey ASC) total order as graft_top_k's tie-break, DECIMAL-exact
    // revenue sums cast to DOUBLE on both sides
    "q83_topk_per_group" ->
      """WITH rev AS (
        |  SELECT c_nationkey, c_custkey,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_nationkey, c_custkey)
        |SELECT c_nationkey, CAST(row_number() OVER w AS BIGINT) AS rank,
        |  c_custkey, revenue
        |FROM rev
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY revenue DESC, c_custkey)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY c_nationkey, rank""".stripMargin
  )
}
