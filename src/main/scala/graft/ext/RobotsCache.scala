package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The persisted robots cache — the state RFC 9309 §2.4 actually talks
  * about. A polite crawler fetches `/robots.txt` per host, CACHES the
  * parsed rules, serves verdicts from the cache, and refetches when the
  * cached copy ages past the TTL (the RFC allows use of a cached copy
  * for up to 24 hours). The reference has no crawl tier at all
  * (`project/etl2.py` ingests trusted CSVs); this artifact is what
  * turns the engine's robots PARSER ([[UrlOps.parseRobotsTxt]]) and
  * scheduling gates (q188) into a crawl loop with real, aging state
  * instead of per-query replants.
  *
  * Layout (the persisted-index family pattern — `Retrieval
  * .writeBm25Index`, `Dedup.writeMinhashIndex`):
  *   - `<table>_fetches` — the append-only FETCH LOG: one row per
  *     robots fetch `(host, fetched_at_micros, crawl_delay_micros)`.
  *     Presence and age live here, NOT on the rules: a host whose
  *     robots.txt yields no applicable rules (empty file, 404 treated
  *     as allow-all) still has a fetch time the TTL gate must honor.
  *     The fetch's parsed `Crawl-delay` winner rides the same row
  *     (null when the body declares none or the value is
  *     non-numeric), so the POLITENESS tier serves from the cache too
  *     ([[latestDelays]]) — a refetch that changes the delay
  *     reschedules the host's slots the next cycle, with no raw-body
  *     re-parse anywhere downstream.
  *   - `<table>` — the parsed rules PER FETCH: `(host,
  *     fetched_at_micros, path_prefix, allow, from_specific,
  *     has_wildcard)`, bucketed by host so the latest-per-host read
  *     and the verdict's host semi-join run Exchange-free.
  *
  * Reads are LATEST-WINS: the newest fetch per host is the live rule
  * set; older fetches remain as history (append-only storage — a
  * refetch never rewrites files, which is what makes the maintenance
  * path a pure insert at any scale). Replay duplicates — the same
  * `(host, fetched_at_micros)` appended twice — are the one corruption
  * class appends can introduce; [[IndexAudit.auditRobotsCache]] trips
  * on them and on rules orphaned from the fetch log.
  */
object RobotsCache {

  /** Parse + append one batch of robots fetches to the cache.
    * `fetches` carries one row per (host, fetched-at, raw body);
    * rules come from [[UrlOps.parseRobotsTxt]] for `agent`. A body
    * with no applicable rules appends only its fetch-log row — the
    * allow-all default with a fresh TTL. The caller owns at-most-once
    * delivery per (host, fetched_at_micros): this is the same ingest
    * contract every append path in the persisted-index family carries
    * (`Dedup.appendToMinhashIndex`), and the audit's uniqueness check
    * is its backstop.
    */
  def refresh(fetches: DataFrame, hostCol: String, fetchedAtCol: String,
              bodyCol: String, table: String, agent: String = "*"): Unit = {
    val rules = parsedRules(fetches, hostCol, fetchedAtCol, bodyCol, agent)
    rules.write.mode("append").insertInto(table)
    fetchLog(fetches, hostCol, fetchedAtCol, bodyCol, agent)
      .write.mode("append").insertInto(s"${table}_fetches")
  }

  /** Build the cache FRESH from a first batch of fetches (overwrite) —
    * the bootstrap twin of [[refresh]]; establishes the bucket layout
    * appends then join. */
  def rebuild(fetches: DataFrame, hostCol: String, fetchedAtCol: String,
              bodyCol: String, table: String, agent: String = "*",
              nBuckets: Int = 32): Unit = {
    Warehouse.resetTable(fetches.sparkSession, table)
    Warehouse.resetTable(fetches.sparkSession, s"${table}_fetches")
    parsedRules(fetches, hostCol, fetchedAtCol, bodyCol, agent)
      .write.format("parquet")
      .bucketBy(nBuckets, "host").sortBy("host", "fetched_at_micros")
      .mode("overwrite").saveAsTable(table)
    fetchLog(fetches, hostCol, fetchedAtCol, bodyCol, agent)
      .write.format("parquet")
      .bucketBy(nBuckets, "host").sortBy("host")
      .mode("overwrite").saveAsTable(s"${table}_fetches")
  }

  /** One fetch-log row per fetch: `(host, fetched_at_micros,
    * crawl_delay_micros)` — the per-fetch `Crawl-delay` winner
    * ([[UrlOps.robotsCrawlDelay]]'s group selection for `agent`,
    * `keepEmpty` mode) computed in the SAME projection as the log row:
    * delay-less bodies keep their row with a null delay, the body
    * parses exactly once, and the output is strictly 1:1 with the
    * input — a batch carrying duplicate `(host, fetched_at_micros)`
    * fetches (a retried `foreachBatch` re-append) logs one row per
    * input row, never a join-multiplied cross of the duplicates.
    * Shared by [[rebuild]] and [[refresh]] — `insertInto` is
    * positional, so one definition site keeps the column order
    * identical on both paths. */
  private def fetchLog(fetches: DataFrame, hostCol: String,
                       fetchedAtCol: String, bodyCol: String,
                       agent: String): DataFrame =
    UrlOps.robotsCrawlDelay(
        fetches.select(col(hostCol).cast("string").as("__rc_host"),
          col(fetchedAtCol).cast("long").as("fetched_at_micros"),
          col(bodyCol).as("__rc_body")),
        "__rc_host", "__rc_body", agent,
        carry = Seq("fetched_at_micros"), keepEmpty = true)
      .select(col("host"), col("fetched_at_micros"),
        col("crawl_delay_micros"))

  private def parsedRules(fetches: DataFrame, hostCol: String,
                          fetchedAtCol: String, bodyCol: String,
                          agent: String): DataFrame =
    UrlOps.parseRobotsTxt(
        fetches.select(col(hostCol).cast("string").as("__rc_host"),
          col(fetchedAtCol).cast("long").as("fetched_at_micros"),
          col(bodyCol).as("__rc_body")),
        "__rc_host", "__rc_body", agent,
        carry = Seq("fetched_at_micros"))
      .select(col("host"), col("fetched_at_micros"), col("path_prefix"),
        col("allow"), col("from_specific"), col("has_wildcard"))

  /** The newest fetch per host: `(host, fetched_at_micros)` — the
    * cache's live edge. One map-side-combining aggregate on the
    * bucketed host key (Exchange-free). */
  def latestFetches(spark: SparkSession, table: String): DataFrame = {
    // appends may land from a streaming clone session whose writes
    // this session's relation cache hasn't seen — re-list (both
    // tables are host-sized; the listing is cheap)
    spark.catalog.refreshTable(s"${table}_fetches")
    spark.table(s"${table}_fetches")
      .groupBy(col("host"))
      .agg(max(col("fetched_at_micros")).as("fetched_at_micros"))
  }

  /** The LIVE rule set: each host's latest fetch's rules, in exactly
    * [[UrlOps.robotsVerdict]]'s expected shape `(host, path_prefix,
    * allow, from_specific, has_wildcard)`. Superseded fetches' rules
    * drop at the join. */
  def latestRules(spark: SparkSession, table: String): DataFrame = {
    spark.catalog.refreshTable(table)
    spark.table(table)
      .join(latestFetches(spark, table),
        Seq("host", "fetched_at_micros"))
      .select(col("host"), col("path_prefix"), col("allow"),
        col("from_specific"), col("has_wildcard"))
  }

  /** The LIVE per-host `Crawl-delay`: each host's latest fetch's
    * parsed delay, in [[UrlOps.politenessSchedule]]'s expected shape
    * `(host, crawl_delay_micros)`. Strictly latest-wins — a newest
    * body that declares NO delay yields no row (the host reverts to
    * the scheduler's default), never a fallback to a superseded
    * fetch's policy. Same Exchange-free bucket-key read as
    * [[latestRules]]. */
  def latestDelays(spark: SparkSession, table: String): DataFrame =
    spark.table(s"${table}_fetches")
      .join(latestFetches(spark, table),
        Seq("host", "fetched_at_micros"))
      .filter(col("crawl_delay_micros").isNotNull)
      .select(col("host"), col("crawl_delay_micros"))

  /** Cache ages against the scheduler's clock: `(host,
    * fetched_at_micros, robots_age_hours)` with the age in WHOLE hours
    * (floor — integer-exact, engine-portable). `asOfMicros` is the
    * injectable now (the F6 clock discipline — schedulers never read
    * the wall clock in-plan). */
  def ages(spark: SparkSession, table: String, asOfMicros: Long)
      : DataFrame =
    latestFetches(spark, table)
      .withColumn("robots_age_hours",
        expr(s"(${asOfMicros}L - fetched_at_micros) div 3600000000"))

  /** Robots POLICY-DELTA detection — what the cache's append-only
    * history exists to answer: when a refetch lands, did the origin
    * actually CHANGE its policy, and in which direction? Per host with
    * at least two recorded fetches, the rule-set diff between the
    * latest fetch and the previous one: `n_added` (rules in the latest
    * not the previous), `n_removed` (vice versa), `n_tightened` (added
    * DISALLOW rules plus COVERED removed ALLOW rules — dropping an
    * `Allow: /a/ok` carve-out forbids URLs only when a Disallow in the
    * LATEST rule set still covers them: under longest-prefix-match a
    * removed Allow whose prefix extends a standing Disallow's prefix
    * hands those URLs to the Disallow, whereas a removed Allow with no
    * standing Disallow prefix below it forbids nothing — the default
    * is allow, so that removal never triggers a re-verdict. A standing
    * WILDCARD Disallow on the host counts as covering (its match set
    * is a regex, not a prefix — the conservative over-approximation:
    * extra re-verdicts, never missed ones). This is the direction that
    * invalidates queued verdicts: URLs budgeted under the old policy
    * may now be forbidden, the re-verdict trigger), and
    * `policy_changed`. Hosts with one fetch emit nothing — no history,
    * no delta.
    *
    * Scale shape: two max-aggregates on the bucketed host key pick the
    * latest two fetch stamps (Exchange-free), the rules join on
    * (host, fetched_at) rides the same layout, the diff is one
    * full-outer on (host, rule), and the removed-Allow coverage check
    * is a semi-join of removed Allows against the latest Disallows on
    * the host key — rule rows are short strings, a few per host. */
  def policyDelta(spark: SparkSession, table: String): DataFrame = {
    spark.catalog.refreshTable(table)
    spark.catalog.refreshTable(s"${table}_fetches")
    val log = spark.table(s"${table}_fetches")
    val latest = log.groupBy(col("host"))
      .agg(max(col("fetched_at_micros")).as("__l"))
    val prev = log.join(latest, Seq("host"))
      .filter(col("fetched_at_micros") < col("__l"))
      .groupBy(col("host"))
      .agg(max(col("fetched_at_micros")).as("__p"), first(col("__l"))
        .as("__l"))
    val rules = spark.table(table)
    def ruleSet(stamp: Column, tag: String) =
      rules.join(prev.select(col("host"), stamp.as("fetched_at_micros")),
          Seq("host", "fetched_at_micros"))
        .select(col("host"), col("path_prefix"), col("allow"),
          col("from_specific"), lit(true).as(tag))
    val diff = ruleSet(col("__l"), "__in_l")
      .join(ruleSet(col("__p"), "__in_p"),
        Seq("host", "path_prefix", "allow", "from_specific"),
        "full_outer")
      .localCheckpoint() // host-rule-sized; three consumers below
    // removed-Allow coverage: only carve-outs a LATEST Disallow still
    // covers tighten (prefix-covering, wildcard conservatively covers)
    val latestDis = rules
      .join(prev.select(col("host"), col("__l").as("fetched_at_micros")),
        Seq("host", "fetched_at_micros"))
      .filter(!col("allow"))
      .select(col("host"), col("path_prefix").as("__dp"),
        col("has_wildcard").as("__dw"))
    val removedAllows = diff
      .filter(col("__in_p").isNotNull && col("__in_l").isNull &&
        col("allow"))
      .select(col("host"), col("path_prefix"))
    val coveredRa = removedAllows.as("ra")
      .join(latestDis.as("d"),
        col("ra.host") === col("d.host") &&
          (col("ra.path_prefix").startsWith(col("d.__dp")) ||
            col("d.__dw")),
        "left_semi")
      .groupBy(col("host"))
      .agg(count(lit(1)).as("__n_ra_tight"))
    diff.groupBy(col("host"))
      .agg(
        sum(when(col("__in_l").isNotNull && col("__in_p").isNull, 1L)
          .otherwise(0L)).as("n_added"),
        sum(when(col("__in_l").isNotNull && col("__in_p").isNull &&
          !col("allow"), 1L)
          .otherwise(0L)).as("__n_dis_tight"),
        sum(when(col("__in_p").isNotNull && col("__in_l").isNull, 1L)
          .otherwise(0L)).as("n_removed"))
      .join(coveredRa, Seq("host"), "left")
      .withColumn("n_tightened",
        col("__n_dis_tight") + coalesce(col("__n_ra_tight"), lit(0L)))
      .drop("__n_dis_tight", "__n_ra_tight")
      .join(prev.select(col("host")), Seq("host"), "right")
      .na.fill(0L, Seq("n_added", "n_removed", "n_tightened"))
      .withColumn("policy_changed",
        col("n_added") + col("n_removed") > 0L)
      .select(col("host"), col("n_added"), col("n_removed"),
        col("n_tightened"), col("policy_changed"))
  }

  /** Maintenance rewrite for the cache's append-only growth: keep the
    * LAST `keepFetches` fetches per host (default 2 — exactly the
    * window [[policyDelta]] compares) and drop older history from both
    * the fetch log and the per-fetch rules. Without a cadence rewrite
    * `<table>_fetches` grows one row per host per TTL period forever;
    * with it the pair stays O(hosts · keepFetches).
    *
    * Shape: the keep-set is a `graft_top_k` aggregate on the bucketed
    * host key (O(keepFetches) state per host, map-side combine — never
    * a window or a collect_list of the full history), and both
    * rewrites stage through `<table>__compact`
    * ([[Warehouse.stagedOverwrite]]) in the SAME bucket/sort layout,
    * so latest-wins reads and the verdict's host joins stay
    * Exchange-free and nothing history-sized is ever pinned in
    * executor storage. [[policyDelta]] output is bit-identical across
    * the rewrite (spec-pinned) because it only ever reads the latest
    * two fetches. */
  def compact(spark: SparkSession, table: String,
              keepFetches: Int = 2): Unit = {
    require(keepFetches >= 2,
      s"keepFetches=$keepFetches — policyDelta needs the last two fetches")
    graft.plans.GraftFunctions.register(spark)
    spark.catalog.refreshTable(table)
    spark.catalog.refreshTable(s"${table}_fetches")
    def buckets(t: String): Int =
      spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(t))
        .bucketSpec.map(_.numBuckets).getOrElse(32)
    val kept = spark.table(s"${table}_fetches")
      .groupBy(col("host"))
      .agg(call_function("graft_top_k",
        col("fetched_at_micros").cast("double"),
        struct(col("fetched_at_micros")), lit(keepFetches)).as("__top"))
      .select(col("host"), explode(col("__top")).as("__s"))
      .select(col("host"),
        col("__s.payload.fetched_at_micros").as("fetched_at_micros"))
    // semi-join the ORIGINAL log against the keep-set (rather than
    // writing the keep-set itself) so per-fetch payload columns —
    // crawl_delay_micros today, anything added later — survive the
    // rewrite
    val keptLog = spark.table(s"${table}_fetches")
      .join(kept, Seq("host", "fetched_at_micros"), "left_semi")
    Warehouse.stagedOverwrite(spark, s"${table}_fetches", keptLog,
      buckets(s"${table}_fetches"), Seq("host"), Seq("host"))
    spark.catalog.refreshTable(s"${table}_fetches")
    val rules = spark.table(table)
      .join(spark.table(s"${table}_fetches"),
        Seq("host", "fetched_at_micros"), "left_semi")
    Warehouse.stagedOverwrite(spark, table, rules, buckets(table),
      Seq("host"), Seq("host", "fetched_at_micros"))
  }

  /** The RFC 9309 §2.4 TTL gate over a scheduled budget: per host the
    * cache age, the stale flag (age strictly past the TTL, or NO
    * cached fetch at all — never-fetched hosts must fetch robots
    * first), and the action. Staleness compares RAW MICROS
    * (`age_micros > ttlHours·3600·10⁶`), not the floored report hours:
    * a floor-then-compare would serve a 24.5-hour-old copy, past the
    * RFC's "up to 24 hours" allowance. `robots_age_hours` stays the
    * floored integer-exact REPORT column. `budget` carries one row per
    * (host) with any per-host payload columns — including a
    * `fetched_at_micros` of its own: the cache's fetch stamp joins in
    * under the reserved alias `__rc_fetched_at`, so the gate never
    * collides with (or drops) a budget payload column. The output
    * keeps `hostCol` plus the gate columns. */
  def ttlGate(spark: SparkSession, budget: DataFrame, hostCol: String,
              table: String, asOfMicros: Long, ttlHours: Long = 24L)
      : DataFrame =
    budget.join(
        latestFetches(spark, table)
          .select(col("host").as(hostCol),
            col("fetched_at_micros").as("__rc_fetched_at")),
        Seq(hostCol), "left")
      .withColumn("robots_age_hours",
        expr(s"(${asOfMicros}L - __rc_fetched_at) div 3600000000"))
      .withColumn("robots_stale",
        col("__rc_fetched_at").isNull ||
          lit(asOfMicros) - col("__rc_fetched_at") >
            ttlHours * 3600000000L)
      .withColumn("action", when(col("robots_stale"),
        lit("refetch_robots_first")).otherwise(lit("proceed")))
      .drop("__rc_fetched_at")
}
