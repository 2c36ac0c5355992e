package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for the crawl front-end.
  *
  * The reference pipeline ingests rows whose provenance is a free-form
  * string column (reference `etl/extract.py:21` file-stem derivation is
  * its only provenance normalization); a crawl-scale corpus needs the
  * real thing: the frontier and the dedup layer both key on URLs, and
  * raw crawl URLs are noisy — mixed-case schemes and hosts, default
  * ports, tracking parameters, unsorted query strings, fragments,
  * doubled slashes, trailing slashes. Two fetches of the same resource
  * that differ only in that noise must collapse to ONE canonical key
  * BEFORE content dedup runs, or the corpus carries one redundant
  * fetch per syntactic variant (Common Crawl's own dedup keys on a
  * normalized URL for exactly this reason).
  *
  * Canonicalization rules (each pinned by a [[UrlOpsSpec]] case):
  *   1. scheme and host lowercase (RFC 3986 §6.2.2.1 — these are the
  *      case-insensitive components; the PATH KEEPS its case: `/Docs`
  *      and `/docs` are different resources),
  *   2. fragment dropped (never sent to the server),
  *   3. default port stripped (`:80` for http, `:443` for https; any
  *      other port is load-bearing and kept),
  *   4. a leading `www.` host label dropped (policy, not RFC — the
  *      dominant apex/www duplication in crawl frontiers),
  *   5. doubled slashes in the PATH collapsed, trailing slash dropped
  *      (empty path canonicalizes to `/`),
  *   6. tracking parameters removed ([[TrackingParamPrefixes]] —
  *      `utm_*` plus the click-id family, prefix-matched on
  *      `name=`), remaining parameters SORTED bytewise (order is
  *      almost never semantic; sorting makes equal param SETS equal
  *      strings), empty query dropped.
  *
  * 100 TB shape: one zero-shuffle projection — split/filter/sort run
  * per row over ≤ a few dozen query params (`array_sort` on a
  * handful of strings, not a relational sort), so the operator
  * composes into scan-side pipelines like the q145 extractor and
  * whole-stage codegen keeps it in one stage. Everything is built
  * from codegen'd `functions._` — no UDFs.
  */
object UrlOps {

  /** Query-parameter prefixes stripped as tracking noise. Matched
    * against `name=value` pairs, so `"ref="` removes exactly the
    * `ref` parameter while a legitimate `refresh=1` survives; the
    * `utm_` prefix covers the whole utm family. Shared verbatim with
    * the DuckDB oracle generator (q150/q151). */
  val TrackingParamPrefixes: Seq[String] =
    Seq("utm_", "gclid=", "fbclid=", "msclkid=", "ref=")

  /** The canonical URL of `u` per the rules above. Pure column
    * expression (codegen-friendly); `u` must be an absolute
    * `scheme://...` URL string. */
  def canonicalUrl(u: Column): Column = {
    // 1. fragment off first: everything downstream ignores it.
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    // authority = up to the first '/', '?' (fragment already gone).
    val authority = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val hostNoWww = regexp_replace(authority, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(hostNoWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostNoWww, ":443$", ""))
      .otherwise(hostNoWww)
    val pathQ = regexp_replace(rest, "^[^/?]*", "") // "", "/p?q", "?q", ...
    val rawPath = regexp_extract(pathQ, "^([^?]*)", 1)
    val path0 = regexp_replace(regexp_replace(rawPath, "//+", "/"), "/$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val rawQs = when(pathQ.contains("?"),
      regexp_replace(pathQ, "^[^?]*\\?", "")).otherwise(lit(""))
    val keptParams = array_sort(filter(split(rawQs, "&"), p =>
      p =!= "" && !TrackingParamPrefixes
        .map(pre => p.startsWith(pre)).reduce(_ || _)))
    val qs = array_join(keptParams, "&")
    concat(scheme, lit("://"), host, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** The lowercased, de-`www.`ed, port-stripped host of `u` — the
    * politeness/rollup key ([[canonicalUrl]] rule 3/4 component). */
  def urlHost(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val authority = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val hostNoWww = regexp_replace(authority, "^www\\.", "")
    when(scheme === "http", regexp_replace(hostNoWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostNoWww, ":443$", ""))
      .otherwise(hostNoWww)
  }

  /** Appends `url_canon`, `url_host`, `url_had_tracking` (a tracking
    * parameter was removed), `url_had_fragment` to `df`. One
    * projection, no shuffle. */
  def withCanonicalUrl(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val rawQs = when(u.contains("?"),
      regexp_replace(regexp_replace(u, "#.*$", ""), "^[^?]*\\?", ""))
      .otherwise(lit(""))
    val hadTracking = exists(filter(split(rawQs, "&"), p => p =!= ""), p =>
      TrackingParamPrefixes.map(pre => p.startsWith(pre)).reduce(_ || _))
    df.withColumn("url_canon", canonicalUrl(u))
      .withColumn("url_host", urlHost(u))
      .withColumn("url_had_tracking", hadTracking)
      .withColumn("url_had_fragment", u.contains("#"))
  }

  /** Host-level crawl rollup over canonicalized URLs: per host the
    * fetch count, the distinct canonical-URL count, and the
    * URL-level duplication rate in exact micro-units
    * (`(fetches − distinct) · 10⁶ div fetches` — the integer-div
    * trio, no doubles). This is the frontier's feedback table: a
    * host whose dup rate spikes is recrawling syntactic variants.
    *
    * 100 TB shape: ONE hash aggregation keyed by (host, canon) then a
    * host-keyed re-aggregation — both map-side combining; canonical
    * URLs are short strings, document payloads are NOT in the plan.
    */
  def hostRollup(df: DataFrame, urlCol: String): DataFrame = {
    val canon = withCanonicalUrl(df, urlCol)
      .select(col("url_host"), col("url_canon"), col("url_had_tracking"))
    canon
      .groupBy(col("url_host"), col("url_canon"))
      .agg(count(lit(1)).as("n_fetch"),
        sum(when(col("url_had_tracking"), 1L).otherwise(0L)).as("n_trk"))
      .groupBy(col("url_host"))
      .agg(sum(col("n_fetch")).as("n_fetches"),
        count(lit(1)).as("n_urls"),
        sum(col("n_trk")).as("n_tracking_fetches"))
      .withColumn("dup_rate_micro",
        expr("(n_fetches - n_urls) * 1000000 div n_fetches"))
  }
}
