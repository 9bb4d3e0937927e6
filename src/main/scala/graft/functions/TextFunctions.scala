package graft.functions

import graft.expressions.GraftExpressions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines, composed from
  * codegen'd `org.apache.spark.sql.functions` (no UDFs) so Catalyst can
  * push, prune, and fuse them. Every helper is deterministic and (except
  * the custom hashes) reproducible in ANSI SQL for oracle checks.
  */
object TextFunctions {

  /** Whitespace tokenization; empty/blank text → empty array. */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Token count via the BPE-ish boundary regex: words, numbers, or single
    * punctuation — a cheap proxy for tokenizer budgeting. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Rough subword count: words split to ~4-char chunks like BPE budgets.
    * ceil(chars-without-spaces / 4). */
  def subwordCountEstimate(c: Column): Column =
    ceil(length(regexp_replace(c, "\\s+", "")).cast("double") / lit(4.0)).cast("long")

  /** Word n-gram shingles; fewer than n tokens → empty array. One-pass
    * codegen'd expression (see graft.expressions.WordShingles for why the
    * higher-order-function formulation is a scale trap). */
  def wordShingles(c: Column, n: Int): Column =
    GraftExpressions.wordShingles(c, n)

  /** Script-based language ID heuristic: Unicode-block counters for CJK /
    * Cyrillic / Arabic / Hangul / Kana, Latin-language stopword markers
    * otherwise. Deterministic and expressible in DuckDB SQL. */
  def langId(c: Column): Column = {
    def hits(pattern: String): Column =
      size(regexp_extract_all(c, lit(pattern), lit(0)))
    val en = hits("\\b(the|and|of|to|is|in|that|it)\\b")
    val es = hits("\\b(el|la|los|las|de|que|y|en|un|una)\\b")
    val de = hits("\\b(der|die|das|und|ist|nicht|ein|eine)\\b")
    val fr = hits("\\b(le|les|des|est|et|une|dans|pour)\\b")
    when(hits("[\\x{4e00}-\\x{9fff}]") > 0, "zh")
      .when(hits("[\\x{3040}-\\x{30ff}]") > 0, "ja")
      .when(hits("[\\x{ac00}-\\x{d7af}]") > 0, "ko")
      .when(hits("[\\x{0400}-\\x{04ff}]") > 0, "ru")
      .when(hits("[\\x{0600}-\\x{06ff}]") > 0, "ar")
      .when(es > en && es >= de && es >= fr, "es")
      .when(de > en && de > es && de >= fr, "de")
      .when(fr > en && fr > es && fr > de, "fr")
      .when(en > 0, "en")
      .otherwise("und")
  }

  /** Composite quality score in [0,1]:
    * 0.3·length-saturation + 0.4·alpha-ratio + 0.3·stopword-signal,
    * rounded to 4 decimals. All three components are standard quality
    * heuristics (length, punctuation/alpha balance, stopword density). */
  def qualityScore(c: Column): Column = {
    val chars = length(c).cast("double")
    val lenNorm = least(chars / lit(500.0), lit(1.0))
    val alphaRatio =
      when(chars === 0, 0.0)
        .otherwise(length(regexp_replace(c, "[^A-Za-z]", "")).cast("double") / chars)
    val toks = tokenCount(c).cast("double")
    val stops = size(regexp_extract_all(c,
      lit("\\b(the|and|of|to|is|in|that|it|a|for)\\b"), lit(0))).cast("double")
    val stopSignal = when(toks === 0, 0.0)
      .otherwise(least(stops / toks * lit(5.0), lit(1.0)))
    round(lit(0.3) * lenNorm + lit(0.4) * alphaRatio + lit(0.3) * stopSignal, 4)
  }

  /** Canonical text normalization for dedup/fingerprinting: lowercase,
    * trim, collapse whitespace runs to single spaces. Pure codegen'd
    * string ops; reproducible in ANSI SQL (lower + regexp_replace). */
  def normalizeText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Mean word length proxy: non-whitespace chars / whitespace tokens.
    * 0.0 for blank text. Both operands are exact integers, so the double
    * division is bit-identical across engines. */
  def meanWordLength(c: Column): Column =
    when(tokenCount(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "\\s+", "")).cast("double") /
        tokenCount(c).cast("double"))

  /** Fraction of lines that open with a bullet marker (`-` or `*`).
    * Lines counted as newline count + 1 — integer-exact in any engine. */
  def bulletLineRatio(c: Column): Column = {
    val bullets = regexp_count(c, lit("(?m)^[ \\t]*[-*]")).cast("double")
    val lines = (length(c) - length(regexp_replace(c, "\n", "")) + lit(1))
      .cast("double")
    bullets / lines
  }

  /** Fraction of characters that are neither alphanumeric nor whitespace.
    * 0.0 for empty text. */
  def symbolRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[A-Za-z0-9\\s]", "")).cast("double") /
        length(c).cast("double"))

  /** Count of common-English stopword hits (same marker list the quality
    * score uses). */
  def stopwordHits(c: Column): Column =
    size(regexp_extract_all(c,
      lit("\\b(the|and|of|to|is|in|that|it|a|for)\\b"), lit(0))).cast("long")

  /** Gopher-style document keep rule (Rae et al. 2021, adapted): word
    * count in [minWords, maxWords], mean word length in [3, 10], symbol
    * ratio < 0.1, at most 90% bullet lines, and ≥ 2 stopword hits. Every
    * sub-metric is a map-only codegen'd expression — the filter runs in
    * the scan stage at any scale. */
  def gopherKeep(c: Column, minWords: Long = 50, maxWords: Long = 100000): Column =
    tokenCount(c).between(minWords, maxWords) &&
      meanWordLength(c).between(3.0, 10.0) &&
      symbolRatio(c) < 0.1 &&
      bulletLineRatio(c) <= 0.9 &&
      stopwordHits(c) >= 2

  /** Normalized rolling-hash fingerprint: lowercase, collapse whitespace,
    * FNV-1a 64 (custom codegen'd expression). Equal fingerprints ⇒
    * whitespace/case-insensitive duplicate documents. */
  def fingerprint(c: Column): Column =
    GraftExpressions.fingerprint64(
      regexp_replace(lower(trim(c)), "\\s+", " "))

  /** Sentence segmentation for curation heuristics (docs with very few
    * or pathologically many sentences, per-sentence dedup, sentence-count
    * quality features): runs of non-terminator characters plus their
    * trailing `.!?` run — `"a. b"` → `["a.", " b"]`, a trailing fragment
    * without punctuation still counts. Deliberately regex-simple (no
    * abbreviation model — "Dr. Smith" splits) and RE2-compatible, so the
    * oracle replays it verbatim; callers needing linguistic segmentation
    * plug their own model upstream. */
  def sentences(c: Column): Column =
    regexp_extract_all(c, lit("[^.!?]+[.!?]*"), lit(0))

  /** Number of [[sentences]] segments; 0 for empty AND blank text (the
    * segment regex alone would count a whitespace-only doc as one
    * sentence — spaces are not terminators). Blank = any whitespace,
    * not just spaces: `trim` strips only ' ', so a tab/newline-only doc
    * needs the regex check. */
  def sentenceCount(c: Column): Column =
    when(length(regexp_replace(c, "\\s", "")) === 0, lit(0L))
      .otherwise(size(sentences(c)).cast("long"))

  /** HTML → text for crawl curation: drop script/style blocks WITH their
    * content (a naive tag-strip leaks javascript into the corpus — and a
    * `<` inside script text derails it), drop comments, replace remaining
    * tags with spaces (block boundaries must not glue words), decode the
    * common entities (`&amp;` LAST, or `&amp;lt;` would double-decode),
    * collapse whitespace. A regexp_replace chain in the RE2-compatible
    * subset — no backreferences, so the same rules run verbatim in
    * DuckDB for the oracle. The tag pattern is ANCHORED on a tag-start
    * character (`<` + letter, `</`, `<!`) — HTML only opens tags that
    * way, so prose like `1 < 2` or `a < b` can never start a match —
    * and bounded at 1000 chars (RE2's repetition ceiling) so a letter-initial bare `<` in prose
    * (`i<n ... >`) cannot swallow kilobytes while real tags (including
    * long attribute lists up to 1000 chars) still strip whole. Not a browser: edge cases
    * degrade to stray markup characters surviving as text, never to
    * unbounded text loss. */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "</?[a-zA-Z!][^>]{0,1000}>", " ")
    val ent = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'",
      "&amp;" -> "&" // last: &amp;lt; must become &lt;, not <
    ).foldLeft(noTags) { case (acc, (e, r)) => regexp_replace(acc, e, r) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  // --- PII redaction (training-data hygiene) -----------------------------
  // RE2-compatible patterns (no backrefs/lookaround) so the same regexes
  // run in Spark's java.util.regex AND DuckDB's RE2 for oracle checks.
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  private[graft] val PhoneRe = "\\+?[0-9][0-9() .-]{6,}[0-9]"

  /** Redact emails, IPv4 addresses, and phone-like digit runs with typed
    * placeholders. Order matters: emails first (their digits would
    * otherwise feed the phone pattern), then IPs, then phones. Map-only,
    * codegen'd `regexp_replace` chain — no UDF, scales linearly. */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Count of PII matches (emails + IPv4s + phone runs) in `c`, counted on
    * the same progressive redaction the scrubber applies so nothing is
    * double-counted. */
  def piiCount(c: Column): Column = {
    val afterEmail = regexp_replace(c, EmailRe, "[EMAIL]")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "[IP]")
    (size(regexp_extract_all(c, lit(EmailRe), lit(0))) +
      size(regexp_extract_all(afterEmail, lit(Ipv4Re), lit(0))) +
      size(regexp_extract_all(afterIp, lit(PhoneRe), lit(0)))).cast("long")
  }

  /** Latin-1 double-encoding (mojibake) markers: UTF-8 bytes of a common
    * accented letter re-read as ISO-8859-1 — "é" becomes "Ã©", "ñ"
    * becomes "Ã±", etc. A fixed alternation so an external SQL engine
    * counts the exact same occurrences. */
  private val MojibakeRe = "Ã©|Ã¨|Ã¤|Ã¶|Ã¼|Ã§|Ã±|Ã¡|Ã³|Ãº"

  /** Count of Latin-1 mojibake markers — the encoding-damage detector for
    * crawl text that was decoded with the wrong charset somewhere in the
    * pipeline. Row-local codegen'd regex, same scan-stage cost class as
    * [[qualityScore]]. */
  def mojibakeCount(c: Column): Column =
    size(regexp_extract_all(c, lit(MojibakeRe), lit(0))).cast("long")

  /** Repair Latin-1 double-encoding by re-encoding the damaged string as
    * ISO-8859-1 bytes and decoding those bytes as the UTF-8 they
    * originally were ("Ã©" → bytes C3 A9 → "é"). Applied only when
    * [[mojibakeCount]] fires: the round-trip is the identity on ASCII
    * but LOSSY on text that legitimately mixes non-Latin-1 characters
    * with none of the markers, so clean rows must bypass it. Repairing
    * an already-repaired row is a no-op (its markers are gone). */
  def repairMojibake(c: Column): Column =
    when(mojibakeCount(c) > 0, decode(encode(c, "ISO-8859-1"), "UTF-8"))
      .otherwise(c)

  /** Invisible/format characters that survive naive crawl cleaning and
    * silently break tokenizers and dedup (two visually identical strings
    * hash apart): zero-width space/joiners, word joiner, BOM, soft
    * hyphen. */
  private val InvisibleRe =
    "[\u200B\u200C\u200D\u2060\uFEFF\u00AD]"

  /** Count of invisible format characters. Row-local codegen'd regex. */
  def invisibleCharCount(c: Column): Column =
    size(regexp_extract_all(c, lit(InvisibleRe), lit(0))).cast("long")

  /** Strip invisible format characters (they carry no content — unlike
    * whitespace they are DELETED, not replaced by a space, matching how
    * tokenizers treat them when text is clean). */
  def scrubInvisible(c: Column): Column =
    regexp_replace(c, InvisibleRe, "")

  /** Shannon entropy of the character distribution, in nats, rounded to
    * 4 dp — the gibberish detector that catches what word-level filters
    * miss: base64 blobs and hex dumps score near ln(alphabet) ≈ 4+,
    * single-character runs score ~0, natural English sits ~2.9–3.2.
    * NULL or empty text scores NULL (no distribution to measure).
    *
    * Entirely row-local — higher-order array functions over the char
    * array, no explode, no shuffle, codegen'd: at 100 TB this is a pure
    * scan-stage signal like [[qualityScore]]. Cost is O(distinct_chars ×
    * length) per row; distinct chars in real text is a few dozen. */
  def charEntropy(c: Column): Column = {
    val chars = filter(split(c, ""), ch => ch =!= "")
    val n = size(chars).cast("double")
    def p(ch: Column): Column =
      size(filter(chars, x => x === ch)).cast("double") / n
    when(c.isNull || size(chars) === 0, lit(null).cast("double"))
      .otherwise(round(
        aggregate(array_distinct(chars), lit(0.0),
          (acc, ch) => acc - p(ch) * log(p(ch))), 4))
  }
}
