package graft.functions

import graft.expressions.{IdnAscii, PercentNormalize}
import org.apache.spark.sql.{Column, GraftColumnBridge}
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

  /** Query string without the leading '?', "" when absent. The fragment
    * is stripped FIRST: a '?' inside the fragment ("https://h/p#frag?x=1")
    * is fragment text, not a query — matching the raw string would
    * resurrect it after normalizeUrl drops the fragment. */
  def urlQuery(u: Column): Column =
    regexp_extract(regexp_replace(u, "#.*", ""), "\\?(.*)", 1)

  /** Host with one leading "www." label removed — the grouping key for
    * per-domain caps and domain blocklists. */
  def urlDomain(u: Column): Column =
    regexp_replace(urlHost(u), "^www\\.", "")

  /** RFC 3986 §6.2.2 percent-encoding normalization: unreserved escapes
    * (`%7E`, `%41`, ...) decode to their character, all other escapes
    * keep uppercase hex (`%3f` → `%3F`). Codegen'd single pass
    * ([[graft.expressions.PercentNormalize]]); reserved characters are
    * never decoded, so component boundaries cannot move. */
  def percentNormalize(u: Column): Column =
    GraftColumnBridge.column(PercentNormalize(GraftColumnBridge.expression(u)))

  /** IDN host → punycode ACE form (`münchen.de` → `xn--mnchen-3ya.de`),
    * ASCII hosts untouched — the canonical host spelling for URL-level
    * dedup of international crawls ([[graft.expressions.IdnAscii]]).
    * Compose as `idnAscii(urlHost(u))`; [[normalizeUrl]] leaves hosts
    * byte-for-byte (minus case) so its oracle stays SQL-reproducible. */
  def idnAscii(host: Column): Column =
    GraftColumnBridge.column(IdnAscii(GraftColumnBridge.expression(host)))

  /** Canonical form: lower-cased scheme and host, userinfo dropped,
    * default ports (http:80 / https:443) dropped, empty path becomes
    * "/", `utm_*` tracking parameters removed from the query, fragment
    * dropped, percent-escapes normalized (unreserved decoded, hex
    * uppercased — see [[percentNormalize]]). Values without a scheme
    * pass through unchanged (not a URL — leave them to upstream
    * filtering). */
  def normalizeUrl(raw: Column): Column = {
    // percent-normalizing the WHOLE url first is safe (reserved chars stay
    // encoded, so no delimiter can appear) and covers path + query at once
    val u = percentNormalize(raw)
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
    when(scheme === "", raw).otherwise(canonical)
  }
}
