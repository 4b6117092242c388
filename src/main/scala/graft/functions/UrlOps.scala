package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and host/domain extraction for web-corpus
  * pipelines (the URL-level dedup prerequisite: Common-Crawl-style
  * curation dedups fetch lists and attributes documents by
  * registrable domain). All chained built-in regexp expressions —
  * codegen'd, no UDFs — so a 100-TB URL column canonicalizes in one
  * scan, and every rule is reproducible in a SQL oracle.
  *
  * Canonicalization rules (the widely-agreed safe subset):
  *  1. drop the fragment (`#…` never reaches the server);
  *  2. lowercase the scheme and authority (host names are
  *     case-insensitive; paths are NOT touched);
  *  3. drop default ports (`:80` for http, `:443` for https);
  *  4. drop tracking parameters (`utm_*`, `fbclid`, `gclid`) and
  *     collapse the separator artifacts that leaves behind.
  */
object UrlOps {

  /** Scheme + authority prefix, e.g. `https://Host.Com:8080`. */
  private def prefixOf(noFrag: Column): Column =
    regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*", 0)

  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val prefix = prefixOf(noFrag)
    // rest = noFrag minus the prefix; expr-level substring keeps codegen
    val restCol = noFrag.substr(length(prefix) + 1, length(noFrag))
    val pLc = lower(prefix)
    val pNoDef = regexp_replace(
      regexp_replace(pLc, "^(http://[^:]*):80$", "$1"),
      "^(https://[^:]*):443$", "$1")
    // kill tracking params, keep the separator that introduced them,
    // then collapse "?&&" runs and trailing separators
    val noTrack = regexp_replace(restCol,
      "(?i)([?&])(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*", "$1")
    // a separator run keeps its FIRST char ("?&"→"?", "&&"→"&");
    // then trailing separators go entirely
    val collapsed = regexp_replace(
      regexp_replace(noTrack, "([?&])[?&]+", "$1"), "[?&]+$", "")
    concat(pNoDef, collapsed)
  }

  /** Lowercased host without port/userinfo; empty string when the
    * value is not an absolute URL.
    */
  def host(url: Column): Column =
    lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.\\-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1))

  /** Two-level TLDs where the registrable domain is three labels.
    * A pragmatic allowance list, not the full public-suffix list
    * (which is a data file, not an algorithm); covers the dominant
    * ccTLD second-level registries.
    */
  private val twoLevelTlds = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tr", "com.ar", "co.za", "com.sg", "co.nz")

  /** Registrable domain: last two host labels, or last three when the
    * suffix is on the two-level-TLD allowance list.
    */
  def registrableDomain(url: Column): Column = {
    val h = host(url)
    val twoSuffix = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    val isTwoLevel = twoLevelTlds
      .map(t => twoSuffix === lit(t)).reduce(_ || _)
    when(isTwoLevel, regexp_extract(h, "([^.]+\\.[^.]+\\.[^.]+)$", 1))
      .otherwise(twoSuffix)
  }

  /** URL-level dedup: one row per canonical URL, keeping the minimum
    * id and the fetch multiplicity. This is the crawl-frontier dedup
    * that runs BEFORE content dedup — the same page fetched with
    * different tracking params / fragments / host casing collapses
    * here without ever shuffling document text. The groupBy map-side
    * combines, so per-partition duplicate fetches collapse before the
    * exchange; the shuffle carries (canon_url, id) only. At 10^12
    * URLs, pre-hash the canonical form (cf. Dedup.exactDedup's 8-byte
    * normHash) if the URL bytes themselves dominate the exchange.
    */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalizeUrl(col(urlCol)).as("canon_url"))
      .groupBy("canon_url")
      .agg(min(col(idCol)).as(idCol),
        count(lit(1)).cast("long").as("fetch_count"))

  /** Drop rows whose registrable domain is on a blocklist — the
    * standard curation pass against known spam/SEO/adult domain lists
    * (UT1, RefinedWeb §3.1). The blocklist frame (one `domain`
    * column) is broadcast, so the scan never shuffles: a left-anti
    * broadcast-hash probe per row. Blocklists are O(10^6) rows —
    * always broadcastable.
    */
  def domainFilter(df: DataFrame, urlCol: String,
      blocklist: DataFrame): DataFrame =
    df.withColumn("__dom", registrableDomain(col(urlCol)))
      .join(broadcast(blocklist.select(col("domain").as("__dom"))),
        Seq("__dom"), "left_anti")
      .drop("__dom")
}
