package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL hygiene for web-corpus curation: canonicalization (the dedup
  * identity for crawled pages) and registrable-domain extraction (the
  * grouping key for per-domain quality stats and crawl caps — the unit
  * C4/CCNet-style pipelines budget by). All codegen'd builtin columns —
  * regexp extraction/replacement and in-row array ops, no UDFs.
  *
  * Canonicalization contract (deliberately conservative — every rule is
  * a no-risk identity under RFC 3986, applied textually):
  *   - scheme and host lowercase; userinfo dropped;
  *   - default ports stripped (http:80, https:443), others kept;
  *   - fragment dropped;
  *   - tracking query params dropped (`utm_*`, `fbclid`, `gclid` — all
  *     analytics-only by their platforms' own definitions; bare `ref` is
  *     deliberately NOT dropped: it is content-bearing on common sites,
  *     e.g. a code host's `?ref=<branch>` selects different content, so
  *     dropping it would collapse distinct resources into one dedup
  *     identity), remaining params kept in ORIGINAL order (param
  *     reordering changes semantics for some endpoints, so it is not
  *     applied);
  *   - path and remaining query kept byte-for-byte (no percent-decoding:
  *     decoding is not an identity for reserved characters).
  * Inputs without a `scheme://` shape pass through unchanged (the caller
  * decides whether scheme-less strings are URLs at all).
  *
  * Like [[Scrub]], every pattern uses only syntax with identical
  * semantics in Java regex (Spark) and RE2 (DuckDB oracle): character
  * classes, anchors, alternation — no lookaround, no backreferences.
  */
object Urls {
  /** Pinned multi-label public suffixes (subset of the public-suffix
    * list covering the common ccTLD second levels; the full PSL is a
    * drop-in replacement for this set). A host's registrable domain is
    * its last THREE labels when the last two are in this set, else its
    * last two. */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "co.in", "co.kr",
    "com.mx", "co.nz", "com.sg", "com.tr", "co.za")

  private val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*://"
  private val TrackingParamRe = "^(utm_[^=]*|fbclid|gclid)(=|$)"

  /** Lowercased host of a URL: authority minus userinfo and port. Empty
    * string when the input has no `scheme://` shape. */
  def hostOf(url: Column): Column =
    lower(regexp_replace(
      regexp_extract(url, SchemeRe.dropRight(3) + "://([^/?#]*)", 1),
      "^[^@]*@|:[0-9]+$", ""))

  /** Registrable domain of a (already lowercased) host — last two labels,
    * or last three when the last two form a pinned multi-label suffix.
    * Hosts with fewer than two labels pass through unchanged. */
  def registrableDomainOf(host: Column): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".",
      element_at(parts, -3), element_at(parts, -2), element_at(parts, -1))
    when(n >= 3 && last2.isin(MultiLabelSuffixes: _*), last3)
      .when(n >= 2, last2)
      .otherwise(host)
  }

  /** Canonical form of a URL per the object contract. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = regexp_replace(
      regexp_extract(noFrag, SchemeRe.dropRight(3) + "://([^/?#]*)", 1),
      "^[^@]*@", "")
    val host = lower(regexp_replace(hostPort, ":[0-9]+$", ""))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keptPort = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_extract(noFrag, SchemeRe.dropRight(3) + "://[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val keptQ = array_join(
      filter(split(query, "&"), p => !p.rlike(TrackingParamRe)), "&")
    when(!url.rlike(SchemeRe), url)
      .otherwise(concat(scheme, lit("://"), host, keptPort, path,
        when(length(keptQ) > 0, concat(lit("?"), keptQ)).otherwise(lit(""))))
  }

  // ---- DuckDB twins ------------------------------------------------------

  /** DuckDB regex literal: RE2 accepts the pattern text verbatim and
    * single-quoted strings are raw — single-quote escaping only. */
  private def reLit(re: String) = "'" + re.replace("'", "''") + "'"

  /** DuckDB expression computing [[hostOf]] over `col`. */
  def duckdbHostSql(col: String): String =
    s"lower(regexp_replace(regexp_extract($col, " +
      reLit(SchemeRe.dropRight(3) + "://([^/?#]*)") +
      s", 1), ${reLit("^[^@]*@|:[0-9]+$")}, '', 'g'))"

  /** DuckDB expression computing [[registrableDomainOf]] over a host
    * expression. */
  def duckdbRegistrableDomainSql(host: String): String = {
    val inList = MultiLabelSuffixes.map(s => s"'$s'").mkString(", ")
    // string_split binds the host expression once via a lambda-free CASE:
    // DuckDB evaluates the split per reference, which is fine for the
    // oracle (correctness mirror, not the measured path).
    s"""CASE
       |  WHEN len(string_split($host, '.')) >= 3
       |       AND (string_split($host, '.')[-2] || '.' ||
       |            string_split($host, '.')[-1]) IN ($inList)
       |  THEN string_split($host, '.')[-3] || '.' ||
       |       string_split($host, '.')[-2] || '.' ||
       |       string_split($host, '.')[-1]
       |  WHEN len(string_split($host, '.')) >= 2
       |  THEN string_split($host, '.')[-2] || '.' ||
       |       string_split($host, '.')[-1]
       |  ELSE $host
       |END""".stripMargin
  }

  /** DuckDB expression computing [[canonicalUrl]] over `col`. */
  def duckdbCanonicalSql(col: String): String = {
    val noFrag = s"regexp_replace($col, '#.*$$', '')"
    val scheme = s"lower(regexp_extract($noFrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val hostPort = s"regexp_replace(regexp_extract($noFrag, " +
      reLit(SchemeRe.dropRight(3) + "://([^/?#]*)") + ", 1), '^[^@]*@', '')"
    val host = s"lower(regexp_replace($hostPort, ':[0-9]+$$', ''))"
    val port = s"regexp_extract($hostPort, ':([0-9]+)$$', 1)"
    val keptPort = s"CASE WHEN $port = '' OR ($scheme = 'http' AND $port = '80') " +
      s"OR ($scheme = 'https' AND $port = '443') THEN '' ELSE ':' || $port END"
    val path = s"regexp_extract($noFrag, " +
      reLit(SchemeRe.dropRight(3) + "://[^/?#]*([^?#]*)") + ", 1)"
    val query = s"regexp_extract($noFrag, ${reLit("\\?(.*)$")}, 1)"
    val keptQ = s"array_to_string(list_filter(string_split($query, '&'), " +
      s"p -> NOT regexp_matches(p, ${reLit(TrackingParamRe)})), '&')"
    s"""CASE WHEN NOT regexp_matches($col, ${reLit(SchemeRe)}) THEN $col
       |ELSE $scheme || '://' || $host || $keptPort || $path ||
       |  CASE WHEN length($keptQ) > 0 THEN '?' || $keptQ ELSE '' END
       |END""".stripMargin
  }
}
