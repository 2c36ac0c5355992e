package graft.entry

/** The reference's ETL surface: TPC-H-style aggregation,
  * joins, rule checks, SCD2 merge, and the end-to-end pipeline.
  *
  * One slice of [[graft.SparkEntry]]'s catalog: `queries` and the
  * matching DuckDB `oracleSql` live side by side so an edit to a
  * query and its oracle is always a same-file change.
  */
import graft.entry.EntryTables._
import graft.ext.{Dedup, Multimodal, Retrieval, Similarity, TextOps}
import graft.model.{ColumnSpec, FkRef, TableConfig}
import graft.ops.{Merge, Normalize, TemporalJoin}
import graft.rules.Rules
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

private[graft] object EtlQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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
      // par: the interval-arithmetic projection otherwise runs twice
      // on the scan's single core (range-sort sampling + shuffle map)
      val base = par(t(s, dir, "orders"), "o_orderkey")
        .select(k, col("o_orderdate"))
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
  )

  val oracleSql: Map[String, String] = Map(

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
  )
}
