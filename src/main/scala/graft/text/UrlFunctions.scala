package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL → host → registrable-domain extraction as pure codegen'd
  * Column expressions — the FIRST filter a crawl pipeline applies
  * (domain blocklists, per-domain caps, TLD stats all key on the
  * registrable domain, not the raw host).
  *
  * Everything here is a regexp/string expression, so it runs inside
  * whole-stage codegen at the scan with zero UDF or shuffle cost, and
  * restates verbatim in the DuckDB oracle (RE2-safe patterns only: no
  * backreferences, no lookaround).
  *
  * Scope honesty: the embedded public-suffix sample covers the
  * multi-label suffixes the gate corpus and specs exercise; a
  * production deployment swaps [[MultiLabelSuffixes]] for the full
  * publicsuffix.org list (same expression shape — the list only
  * changes the alternation literal, compiled once per query, not per
  * row). Bracketed IPv6 hosts are out of scope (return '' from
  * [[urlHost]]'s host class) and punycode (xn--) labels are treated as
  * ordinary labels, which is exactly what the PSL algorithm specifies.
  */
object UrlFunctions {

  /** Multi-label public suffixes recognized by [[registrableDomain]]
    * (sample of the PSL; see scope note above). */
  val MultiLabelSuffixes: Seq[String] =
    Seq("co.uk", "ac.uk", "gov.uk", "com.au", "co.jp", "com.br")

  private val HostPattern =
    "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#\\[\\]]+)"

  /** Lowercased host from an absolute URL: scheme stripped
    * (case-insensitive), userinfo (`user:pw@`) stripped, port and
    * path/query/fragment stopped at. '' when the value is not an
    * absolute URL. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, HostPattern, 1))

  /** Dotted-quad IPv4 literal test, exact octet ranges (0-255) — a
    * host like `999.1.1.1` is NOT an IP and falls through to label
    * logic, same as browsers treat it. */
  def isIpv4(host: Column): Column =
    host.rlike("^((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])$")

  private val multiSuffixAlt =
    MultiLabelSuffixes.map(_.replace(".", "\\.")).mkString("|")

  /** Registrable domain (eTLD+1): IP literals pass through whole; a
    * host ending in a multi-label suffix keeps its last THREE labels;
    * anything else keeps its last two; a bare suffix or single-label
    * host returns itself (no registrable part below it). */
  def registrableDomain(host: Column): Column = {
    val last3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    when(isIpv4(host), host)
      .when(host.rlike(s"(^|\\.)($multiSuffixAlt)$$"),
        when(last3 === "", host).otherwise(last3))
      .otherwise(when(last2 === "", host).otherwise(last2))
  }

  private val TrackingParam = "(utm_[A-Za-z0-9_]*|fbclid|gclid)"

  /** Canonical form of an absolute URL — the normalization a crawl
    * dedup keys on, so the same page fetched under cosmetic variants
    * collapses to one key:
    *
    *   - scheme and host lowercased (path/query case preserved);
    *   - userinfo dropped;
    *   - default ports stripped (http:80, https:443; other ports kept);
    *   - fragment dropped;
    *   - tracking query params removed (utm_*, fbclid, gclid), with
    *     `?`/`&` separators repaired and an emptied query dropped;
    *   - trailing slash stripped (END of URL only — a path-final
    *     slash before a surviving query string is kept: /p/?k and
    *     /p?k are distinct resources to most servers).
    *
    * '' when the value is not an absolute URL (same contract as
    * [[urlHost]]). Pure regexp_replace/extract chain, always-global
    * replacement on both engines (DuckDB side passes the 'g' flag —
    * its regexp_replace defaults to first-match-only, Spark's to all).
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val host = urlHost(url)
    val port = regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?[^/:?#\\[\\]]+:([0-9]+)", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") || (scheme === "https" && port === "443"))
    val rest = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([/?#].*)$", 1)
    val noFrag = regexp_replace(rest, "#.*$", "")
    val noTrackMid = regexp_replace(noFrag, s"&$TrackingParam=[^&]*", "")
    val noTrackLead = regexp_replace(noTrackMid, s"\\?$TrackingParam=[^&]*&", "?")
    val noTrack = regexp_replace(noTrackLead, s"\\?$TrackingParam=[^&]*$$", "")
    val noSlash = regexp_replace(noTrack, "/$", "")
    when(host === "", lit(""))
      .otherwise(concat(scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")), noSlash))
  }

  /** Public-suffix part of a registrable domain (everything after the
    * first label): `src4.co.uk` → `co.uk`. NULL for IP literals and
    * single-label domains (no suffix exists). */
  def domainTld(domain: Column, isIp: Column): Column =
    when(isIp, lit(null).cast("string"))
      .otherwise(nullif(regexp_extract(domain, "^[^.]+\\.(.+)$", 1), lit("")))
}
