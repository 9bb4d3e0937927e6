package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for corpus curation — the normalization pass
  * that runs before URL-level dedup and per-domain quotas (capPerKey):
  * raw crawl URLs differ in case, default ports, fragments and tracking
  * parameters while naming the same resource.
  *
  * Everything is composed from codegen'd built-ins (regexp_extract /
  * regexp_replace / concat / CASE) — no UDFs, map-only, and every rule
  * is reproducible in an external SQL engine for oracle checking. The
  * patterns stay inside the RE2-compatible subset (no backrefs, no
  * lookaround) so Java and RE2-based engines agree.
  */
object UrlFunctions {

  private val SchemePrefix = "^[a-zA-Z][a-zA-Z0-9+.-]*://"

  /** Lower-cased scheme ("https"); empty when the value has none. */
  def urlScheme(u: Column): Column =
    lower(regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))

  /** Lower-cased host, with any userinfo and port stripped. */
  def urlHost(u: Column): Column =
    lower(regexp_extract(u, SchemePrefix + "(?:[^/?#@]*@)?([^/:?#]+)", 1))

  /** Explicit port digits, "" when none. */
  def urlPort(u: Column): Column =
    regexp_extract(u, SchemePrefix + "(?:[^/?#@]*@)?[^/:?#]+:([0-9]+)", 1)

  /** Path component (case preserved — paths are case-sensitive), "" when
    * absent. */
  def urlPath(u: Column): Column =
    regexp_extract(u, SchemePrefix + "[^/?#]*(/[^?#]*)", 1)

  /** Query string without the leading '?', "" when absent. */
  def urlQuery(u: Column): Column =
    regexp_extract(u, "\\?([^#]*)", 1)

  /** Host with one leading "www." label removed — the grouping key for
    * per-domain caps and domain blocklists. */
  def urlDomain(u: Column): Column =
    regexp_replace(urlHost(u), "^www\\.", "")

  /** Canonical form: lower-cased scheme and host, userinfo dropped,
    * default ports (http:80 / https:443) dropped, empty path becomes
    * "/", `utm_*` tracking parameters removed from the query, fragment
    * dropped. Values without a scheme pass through unchanged (not a URL
    * — leave them to upstream filtering). */
  def normalizeUrl(u: Column): Column = {
    val scheme = urlScheme(u)
    val host = urlHost(u)
    val port = urlPort(u)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path = when(urlPath(u) === "", "/").otherwise(urlPath(u))
    val cleanedQuery = regexp_replace(
      regexp_replace(urlQuery(u), "(^|&)utm_[^&]*", ""), "^&", "")
    val canonical = concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(cleanedQuery =!= "", concat(lit("?"), cleanedQuery)).otherwise(lit("")))
    when(scheme === "", u).otherwise(canonical)
  }
}
