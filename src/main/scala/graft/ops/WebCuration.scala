package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-crawl provenance operators: URL canonicalization, registered-domain
  * rollups, and per-domain contribution caps — the curation layer between a
  * raw crawl and a training mix (a CommonCrawl-scale corpus is dominated by
  * URL-level duplicates and a heavy-tailed domain distribution; both are
  * decided here, before any content-level dedup spends a shuffle).
  *
  * Scale shape: every per-URL derivation (parse, normalize, registered
  * domain) is a pure scan-stage expression — zero shuffle, streams
  * unchanged. Only the rollup ([[domainStats]]) and the cap rank
  * ([[domainCap]]) shuffle, both keyed on the registered domain (bounded
  * cardinality: the web has ~10^8 registered domains, each group fits an
  * executor; the cap window is domain-partitioned, never global).
  *
  * Reference scope note: the reference engine (Flink DataStream teaching
  * code) has no web-curation surface; this module is part of the
  * training-data-pipeline extension mandated by the build brief.
  */
object WebCuration {

  /** Tracking query parameters stripped by [[urlNormalize]]: the
    * click-identity params that make one page infinite distinct URLs.
    * Kept as a regex alternation so the filter is one scan-stage rlike.
    */
  private[graft] val TRACKING_PARAM_RE = "^(utm_[A-Za-z0-9_]*|gclid|fbclid)="

  /** Multi-label public suffixes recognized by [[registeredDomain]].
    * A deliberately small, documented subset of the public-suffix list —
    * production swaps in the full PSL as a broadcast set; the ALGORITHM
    * (longest known suffix + one label) is what's exercised here.
    */
  private[graft] val MULTI_SUFFIXES: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "co.jp", "or.jp", "com.au", "com.br",
    "co.in", "com.cn")

  private def re(c: Column, pattern: String): Column =
    regexp_extract(c, pattern, 1)

  /** Lowercased scheme of `url` ('' when the value is not a URL). */
  def urlScheme(url: Column): Column =
    lower(re(url, "^([A-Za-z][A-Za-z0-9+.-]*)://"))

  /** Lowercased host of `url` (port excluded). Case is insignificant in
    * DNS, so the host ALWAYS lowercases; path and query never do.
    */
  def urlHost(url: Column): Column =
    lower(re(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)"))

  /** Explicit port digits of `url` ('' when none). */
  def urlPort(url: Column): Column =
    re(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]+:([0-9]+)")

  /** Path of `url` (may be ''; query/fragment excluded). */
  def urlPath(url: Column): Column =
    re(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)")

  /** Raw query string of `url` (text between '?' and '#'/end; ''-safe). */
  def urlQuery(url: Column): Column = re(url, "\\?([^#]*)")

  /** Canonical form of a URL, the key URL-level dedup groups on:
    *  - scheme and host lowercase (DNS is case-insensitive; paths are not)
    *  - default ports dropped (:80 on http, :443 on https)
    *  - fragment dropped (never sent to the server)
    *  - tracking params dropped ([[TRACKING_PARAM_RE]])
    *  - surviving params sorted lexicographically (param order is
    *    server-insignificant in practice; sorting makes ?a=1&b=2 and
    *    ?b=2&a=1 one key) — '?' dropped entirely when none survive
    *  - empty path → '/', and a single trailing '/' stripped from longer
    *    paths ('/docs/' ≡ '/docs'; '/' itself stays)
    * One expression tree per row: no shuffle, no UDF, streams unchanged.
    */
  def normalizeUrl(url: Column): Column = {
    val scheme = urlScheme(url)
    val host = urlHost(url)
    val port = urlPort(url)
    val path = urlPath(url)
    val keepPort = (port =!= "") &&
      !((scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"))
    val strippedPath = when(path === "", lit("/"))
      .when(length(path) > 1 && path.endsWith("/"),
        path.substr(lit(1), length(path) - 1))
      .otherwise(path)
    val params = filter(split(urlQuery(url), "&"),
      p => p =!= "" && !p.rlike(TRACKING_PARAM_RE))
    val sortedQ = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      strippedPath,
      when(sortedQ =!= "", concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** Registered domain (eTLD+1) of a host: one label above the longest
    * recognized public suffix — last two labels normally, last three when
    * the final two form a multi-label suffix ([[MULTI_SUFFIXES]]).
    * 'www.news.example.co.uk' → 'example.co.uk';
    * 'a.b.example.com' → 'example.com'.
    */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val last2 = array_join(slice(labels, -2, 2), ".")
    val last3 = array_join(slice(labels, -3, 3), ".")
    when(size(labels) >= 3 && last2.isin(MULTI_SUFFIXES: _*), last3)
      .otherwise(when(size(labels) >= 2, last2).otherwise(host))
  }

  /** (id, url, norm_url, reg_domain) — the provenance projection a crawl
    * pipeline materializes once and keys everything else on. Pure scan.
    */
  def urlCanonical(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val u = col(urlCol)
    df.select(col(idCol), u.as("url"),
      normalizeUrl(u).as("norm_url"),
      registeredDomain(urlHost(u)).as("reg_domain"))
  }

  /** Per-registered-domain rollup: docs, distinct canonical URLs (the
    * URL-level dup signal: n_docs − n_urls = pages crawled twice under
    * tracking-param/fragment variants), distinct hosts, char mass. One
    * hash aggregation keyed on the bounded reg_domain dictionary.
    * `exact = true` (the oracle-parity default) pays the two-distinct
    * Expand (3× row volume into the shuffle); at 100 TB pass
    * `exact = false` for HLL++ `approx_count_distinct` — one un-expanded
    * pass, n_urls/n_hosts become ±2 % estimates (the
    * [[Contracts.tableProfile]] doctrine).
    */
  def domainStats(df: DataFrame, idCol: String, urlCol: String,
      charsCol: String, exact: Boolean = true): DataFrame = {
    val dist = (c: Column) =>
      if (exact) countDistinct(c) else approx_count_distinct(c)
    df.select(registeredDomain(urlHost(col(urlCol))).as("reg_domain"),
        normalizeUrl(col(urlCol)).as("_nu"),
        urlHost(col(urlCol)).as("_h"), col(charsCol))
      .groupBy("reg_domain")
      .agg(count(lit(1)).as("n_docs"),
        dist(col("_nu")).as("n_urls"),
        dist(col("_h")).as("n_hosts"),
        sum(col(charsCol)).as("n_chars"))
  }

  /** Cap any one registered domain's contribution at `maxDocs` rows: rows
    * rank on a salted deterministic hash clock within their domain and
    * keep rank ≤ cap — the heavy-tail guard that stops one mirror site
    * from being 10 % of the mix. The window partitions BY DOMAIN
    * (parallel across domains; within-domain state is one counter), the
    * decision is append-stable in distribution, and the kept set is
    * byte-reproducible across engines. Returns (id, reg_domain) — the
    * keep decision; semi-join the corpus by id to apply it.
    */
  def domainCap(df: DataFrame, idCol: String, urlCol: String,
      maxDocs: Int, salt: String = "domcap"): DataFrame = {
    require(maxDocs >= 1, s"domainCap: maxDocs must be >= 1, got $maxDocs")
    import org.apache.spark.sql.expressions.Window
    df.select(col(idCol),
        registeredDomain(urlHost(col(urlCol))).as("reg_domain"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("reg_domain"))
          .orderBy(Sampling.hashKey(col(idCol), salt), col(idCol))))
      .where(col("_rn") <= maxDocs)
      .drop("_rn")
  }

  /** 16-byte canonical-URL fingerprint — the key URL-level dedup carries
    * instead of the URL text (fingerprints shuffle, text never does).
    */
  def urlFingerprint(url: Column): Column = md5(normalizeUrl(url))

  /** Standing crawl-frontier index: the distinct canonical-URL
    * fingerprints already fetched. Additive under unions; the artifact a
    * recrawl probes instead of re-deduping the full history.
    */
  def urlFrontierIndex(seen: DataFrame, urlCol: String): DataFrame =
    seen.select(urlFingerprint(col(urlCol)).as("url_fp")).distinct()

  /** Frontier apply: increment rows whose canonical URL is NOT in the
    * standing index, keep-first (min id) within the increment for URLs
    * the increment itself repeats. The index probe is a bloom anti-join
    * ([[BloomJoin.bloomAntiJoin]]): at 100 TB the never-seen majority
    * bypasses the join shuffle on the bloom's no-false-negative side and
    * only probable hits are exactly adjudicated — the crawler-frontier
    * shape. Returns (id, url_fp).
    */
  def urlFrontierApply(incr: DataFrame, index: DataFrame, idCol: String,
      urlCol: String): DataFrame =
    BloomJoin.bloomAntiJoin(
        incr.select(col(idCol), urlFingerprint(col(urlCol)).as("url_fp")),
        index, "url_fp")
      .groupBy("url_fp").agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col("url_fp"))

  /** Standing per-domain kept counts from a [[domainCap]] (or
    * [[domainCapApply]]) decision — the state an INCREMENTAL cap carries
    * between crawl batches. Domain-sized, additive under unions of
    * disjoint decisions.
    */
  def domainCapIndex(kept: DataFrame): DataFrame =
    kept.groupBy("reg_domain").agg(count(lit(1)).as("kept"))

  /** Incremental per-domain cap: admit increment rows only into each
    * domain's REMAINING quota (cap − standing kept count). Semantics are
    * arrival-order ("first batches fill the quota first") — NOT a
    * re-decision of base ∪ increment, which could evict already-shipped
    * base rows; within one increment the admission order is the same
    * salted hash clock as [[domainCap]], so the decision is
    * layout/retry/engine independent. Applying with an EMPTY index ≡
    * the batch [[domainCap]]. The quota join broadcasts the
    * domain-sized index; the rank window partitions by domain.
    */
  def domainCapApply(incr: DataFrame, index: DataFrame, idCol: String,
      urlCol: String, maxDocs: Int,
      salt: String = "domcap"): DataFrame = {
    require(maxDocs >= 1,
      s"domainCapApply: maxDocs must be >= 1, got $maxDocs")
    import org.apache.spark.sql.expressions.Window
    incr.select(col(idCol),
        registeredDomain(urlHost(col(urlCol))).as("reg_domain"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("reg_domain"))
          .orderBy(Sampling.hashKey(col(idCol), salt), col(idCol))))
      .join(broadcast(index.select(col("reg_domain"),
        col("kept").as("_kept"))), Seq("reg_domain"), "left")
      .where(col("_rn") <= lit(maxDocs) - coalesce(col("_kept"), lit(0L)))
      .select(col(idCol), col("reg_domain"))
  }
}
