package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-level repetition metrics — the "repetitious text" family of
  * quality filters (most-frequent-token concentration and vocabulary
  * diversity). Pipelines drop documents whose top token dominates (boiler-
  * plate, keyword stuffing, degenerate generations) or whose distinct-token
  * ratio collapses (copy-paste loops).
  *
  * Shape: explode → two map-side-combined aggregations, all counts — no
  * text moves after tokenization, and every step is reproducible in plain
  * SQL for the oracle gate. Documents with zero tokens drop out (no
  * denominator).
  */
object TextMetrics {

  /** Per-document: `top_token_frac` = occurrences of the most frequent
    * token / total tokens; `distinct_token_frac` = distinct tokens / total
    * tokens. Both rounded to 6 decimals for cross-engine hash parity. */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(
        round(max(col("cnt")).cast("double") / sum(col("cnt")).cast("double"), 6)
          .as("top_token_frac"),
        round(count(lit(1)).cast("double") / sum(col("cnt")).cast("double"), 6)
          .as("distinct_token_frac"))
  }

  /** Gopher-style duplicate-n-gram repetition metrics (Rae et al. 2021,
    * arXiv:2112.11446 Table A1; the reference filters documents on the same
    * family — see onetl's quality-filter gates). For each requested `n`,
    * per document with at least `n` tokens:
    *
    *  - `top_ngram_frac`: tokens covered by occurrences of the single most
    *    frequent n-gram / total tokens (`count * n / n_tok`), capped at 1.0
    *    because overlapping occurrences can multi-count a position;
    *  - `dup_ngram_frac`: distinct token POSITIONS covered by any n-gram
    *    that occurs more than once / total tokens — position-exact, so
    *    overlapping duplicate grams never double-count.
    *
    * Shape at 100 TB: everything is keyed by (doc, gram) or (doc, position)
    * — partial aggregation applies, no cross-document traffic, and the only
    * joins are doc-local (gram counts back to gram positions), so AQE plans
    * them as shuffle joins on the same doc-keyed exchange. Documents shorter
    * than `n` tokens emit no row for that `n` (no denominator). Fractions
    * round(6) for cross-engine hash parity. */
  def duplicateNgramStats(df: DataFrame, idCol: String, textCol: String,
                          ns: Seq[Int] = Seq(2, 3, 5)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 2), s"n-gram sizes must be >= 2: $ns")
    // tokenize the corpus ONCE: the per-n branches below are unioned
    // into one plan, and un-materialized each branch re-ran the whole
    // scan+tokenize (|ns| passes over the corpus). persist rather than
    // localCheckpoint for a corpus-sized frame (one token array per
    // doc): MEMORY_AND_DISK keeps recomputable lineage and spills to
    // disk under pressure, where localCheckpoint pins executor-local
    // blocks and loses the partition on executor death — the wrong
    // posture at 100 TB. The branches share the one cached compute
    // inside the single union action either way.
    val toksDf = df
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ns.map { n =>
      val docs = toksDf.where(size(col("__toks")) >= n)
      val perDoc = docs.select(col(idCol), size(col("__toks")).as("__ntok"))
      // positional n-grams: one space-joined string per start offset
      val grams = docs.select(col(idCol),
        posexplode(expr(
          s"transform(sequence(0, size(__toks) - $n), " +
            s"i -> concat_ws(' ', slice(__toks, i + 1, $n)))"))
          .as(Seq("__pos", "__gram")))
      val counts = grams.groupBy(col(idCol), col("__gram"))
        .agg(count(lit(1)).as("__cnt"))
      val top = perDoc.join(
        counts.groupBy(col(idCol)).agg(max(col("__cnt")).as("__top")),
        Seq(idCol))
      // positions covered by duplicated grams, de-overlapped via distinct
      val covered = grams
        .join(counts.where(col("__cnt") > 1).select(col(idCol), col("__gram")),
          Seq(idCol, "__gram"))
        .select(col(idCol),
          explode(expr(s"sequence(__pos, __pos + ${n - 1})")).as("__p"))
        .distinct()
        .groupBy(col(idCol)).agg(count(lit(1)).as("__cov"))
      top.join(covered, Seq(idCol), "left")
        .select(col(idCol), lit(n).as("n"),
          round(least(lit(1.0),
            col("__top") * n / col("__ntok").cast("double")), 6)
            .as("top_ngram_frac"),
          round(coalesce(col("__cov"), lit(0L)).cast("double") / col("__ntok"), 6)
            .as("dup_ngram_frac"))
    }.reduce(_.unionByName(_))
  }

  /** Flesch readability per document — Reading Ease (`206.835 −
    * 1.015·W/S − 84.6·Syl/W`) and Flesch–Kincaid grade (`0.39·W/S +
    * 11.8·Syl/W − 15.59`), the length-free quality signals a curation
    * pipeline uses to bucket prose difficulty. Counting rules are fixed
    * and engine-replayable: words are maximal [a-z]+ runs of the
    * lowercased text; sentences are maximal [.!?]+ runs (min 1);
    * syllables per word are maximal [aeiouy]+ vowel groups (min 1 — the
    * standard heuristic, ±1 syllable on silent-e words, which is fine
    * for corpus bucketing, not for linguistics).
    *
    * Returns (id, n_words, n_sentences, n_syllables, fre double round(4),
    * fk double round(4)); zero-word documents keep their counts and get
    * NULL scores (no denominator — surface, don't invent). Purely
    * map-side: three regexes per document, no explode, no shuffle. */
  def readabilityScores(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val words = expr(
      s"filter(split(lower($textCol), '[^a-z]+'), x -> x <> '')")
    val nW = size(words).cast("long")
    val nS = greatest(lit(1L),
      size(expr(s"regexp_extract_all($textCol, '[.!?]+', 0)")).cast("long"))
    val nSyl = expr(
      s"""aggregate(
         |  transform(filter(split(lower($textCol), '[^a-z]+'),
         |                   x -> x <> ''),
         |    w -> greatest(1L, size(regexp_extract_all(w, '[aeiouy]+', 0)))),
         |  0L, (acc, x) -> acc + x)""".stripMargin)
    val ws = col("n_words").cast("double") / col("n_sentences").cast("double")
    val sylw = col("n_syllables").cast("double") / col("n_words").cast("double")
    df.select(col(idCol), nW.as("n_words"), nS.as("n_sentences"),
        nSyl.as("n_syllables"))
      .withColumn("fre",
        when(col("n_words") > 0L,
          round(lit(206.835) - lit(1.015) * ws - lit(84.6) * sylw, 4)
            + lit(0.0)))
      .withColumn("fk",
        when(col("n_words") > 0L,
          round(lit(0.39) * ws + lit(11.8) * sylw - lit(15.59), 4)
            + lit(0.0)))
  }

  /** Per-document Shannon character entropy `H = Σ_c (n_c/N)·log₂(N/n_c)`
    * — the doc-internal randomness gauge that pairs with the corpus-level
    * compression-ratio gate: near-zero H flags single-character padding
    * and template spam, unusually HIGH H (≈ log₂ alphabet) flags
    * base64/hex blobs and mojibake masquerading as text. C4-style
    * pipelines cut both tails.
    *
    * Determinism: one term per DISTINCT (doc, char) —
    * `(n_c/N)·ln(N/n_c)/ln 2` as a fixed IEEE sequence (`ln 2` spelled
    * as the explicit division; log2() implementations may differ across
    * engines) — then the per-doc sum rounds to 6 dp, the
    * [[graft.operators.Corpus.unigramJsDivergence]] tolerance: at most
    * |alphabet| terms of magnitude ≤ log₂|alphabet| accumulate ~1e-15
    * error, far inside the rounding grid. A floor-quantize-per-term
    * scheme was rejected here: rational probabilities (p = 1/2, 1/4)
    * land terms EXACTLY on floor boundaries, where a 1-ulp ln
    * difference flips the micro-unit — rounding the small-sum total is
    * strictly safer for this operator.
    *
    * Returns one row per input doc: (idCol, n_chars long, n_distinct
    * long, entropy double round(6)); docs with NULL or empty text keep
    * a (id, 0, 0, 0.0) row.
    *
    * Scale shape: the char explode map-combines into the (doc, char)
    * count frame — per-doc distinct chars are alphabet-bounded, so the
    * shuffled frame is |docs|·|alphabet|, not corpus characters; one
    * keyed aggregate after, no windows, no driver state. */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // split-once, not substring-per-position: substring(t, i, 1) seeks
    // from the string START for non-ASCII UTF-8, making a
    // transform(sequence(1, length)) explode O(len²) per document —
    // split(t, "") emits exactly one element per code point (no empty
    // strings, verified incl. non-BMP) in one linear pass
    val counts = df
      .filter(col(textCol).isNotNull && length(col(textCol)) >= 1)
      .select(col(idCol).as("__id"),
        explode(split(col(textCol), "")).as("__c"))
      .groupBy(col("__id"), col("__c")).agg(count(lit(1)).as("__n"))
    val totals = counts.groupBy(col("__id"))
      .agg(sum(col("__n")).as("__t"), count(lit(1)).as("__d"))
    val scored = counts.join(totals, Seq("__id"))
      .select(col("__id"), col("__t"), col("__d"),
        ((col("__n").cast("double") / col("__t").cast("double")) *
          log(col("__t").cast("double") / col("__n").cast("double")) /
          log(lit(2.0))).as("__e"))
      .groupBy(col("__id"))
      .agg(first(col("__t")).as("n_chars"), first(col("__d")).as("n_distinct"),
        (round(sum(col("__e")), 6) + lit(0.0)).as("__h"))
    df.select(col(idCol).as("__id"))
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("__h"), lit(0.0)).as("entropy"))
  }

  /** BLEU-2 overlap counts between paired texts (Papineni et al., ACL
    * 2002) — the eval-side cousin of the decontamination gates: score a
    * model output (or a suspected near-copy) against its reference with
    * modified n-gram precision. Expects one row per pair with the two
    * texts side by side; returns per pair, for n = 1 and 2:
    * `matched_n` = Σ_g min(count_cand(g), count_ref(g)) (the CLIPPED
    * matches — a candidate repeating a reference word scores it at most
    * as often as the reference has it), `total_n` = candidate n-grams,
    * `p1`/`p2` the rounded precisions, and `bleu2` =
    * round(√(p1_raw·p2_raw), 6) — the geometric mean of the raw ratios
    * (no brevity penalty: its `e^{1−r/c}` is not reproducible across
    * engines digit-for-digit; the ratio inputs are all present for a
    * caller that wants it).
    *
    * All counts are exact integers; the only doubles are two divisions,
    * one multiply, one sqrt, one final round — the same IEEE sequence in
    * any engine. Pairs whose candidate has no tokens (or no bigrams for
    * n=2) report zero totals and 0.0 precisions.
    *
    * Scale shape: n-gram extraction is map-side (zip-with-tail, no
    * positional self-join); the clip join is keyed on (pair id, gram) —
    * a plain shuffled equi-join, no broadcast needed at any corpus
    * size. */
  def bleuCounts(pairs: DataFrame, idCol: String, candCol: String,
                 refCol: String): DataFrame = {
    def toks(c: String) =
      filter(split(lower(col(c)), "[^a-z]+"), t => t =!= "")
    def grams(side: String, c: String) = {
      val arr = toks(c).as("__a")
      val base = pairs.select(col(idCol).as("__id"), arr)
      val uni = base.select(col("__id"), explode(col("__a")).as("__g"))
      val bi = base.filter(size(col("__a")) >= 2)
        .select(col("__id"), explode(zip_with(
          slice(col("__a"), lit(1), size(col("__a")) - 1),
          slice(col("__a"), lit(2), size(col("__a")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("__g"))
      uni.withColumn("__n", lit(1)).union(bi.withColumn("__n", lit(2)))
        .groupBy(col("__id"), col("__n"), col("__g"))
        .agg(count(lit(1)).as(s"__c_$side"))
    }
    val clipped = grams("cand", candCol)
      .join(grams("ref", refCol), Seq("__id", "__n", "__g"), "left")
      .groupBy(col("__id"), col("__n"))
      .agg(sum(least(col("__c_cand"), coalesce(col("__c_ref"), lit(0L))))
        .as("__m"), sum(col("__c_cand")).as("__t"))
    val wide = pairs.select(col(idCol).as("__id"))
      .join(clipped.filter(col("__n") === 1)
        .select(col("__id"), col("__m").as("matched_1"),
          col("__t").as("total_1")), Seq("__id"), "left")
      .join(clipped.filter(col("__n") === 2)
        .select(col("__id"), col("__m").as("matched_2"),
          col("__t").as("total_2")), Seq("__id"), "left")
      .select(col("__id"),
        coalesce(col("matched_1"), lit(0L)).as("matched_1"),
        coalesce(col("total_1"), lit(0L)).as("total_1"),
        coalesce(col("matched_2"), lit(0L)).as("matched_2"),
        coalesce(col("total_2"), lit(0L)).as("total_2"))
    def ratio(m: String, t: String) =
      when(col(t) > 0L, col(m).cast("double") / col(t).cast("double"))
        .otherwise(lit(0.0))
    wide.select(col("__id").as(idCol), col("matched_1"), col("total_1"),
        col("matched_2"), col("total_2"),
        (round(ratio("matched_1", "total_1"), 6) + lit(0.0)).as("p1"),
        (round(ratio("matched_2", "total_2"), 6) + lit(0.0)).as("p2"),
        (round(sqrt(ratio("matched_1", "total_1") *
          ratio("matched_2", "total_2")), 6) + lit(0.0)).as("bleu2"))
  }

  /** ROUGE-1/2 overlap counts between paired texts (Lin, ACL 2004
    * "ROUGE: a package for automatic evaluation of summaries") — the
    * RECALL-oriented complement of [[bleuCounts]]: where BLEU asks
    * "what fraction of the candidate is in the reference", ROUGE asks
    * "what fraction of the reference did the candidate cover" — the
    * right direction for summarization / coverage eval. Per pair, for
    * n = 1 and 2: `matched_n` = Σ_g min(count_cand(g), count_ref(g))
    * (clipped, same as BLEU), `cand_n` / `ref_n` the two gram totals,
    * recall `rN` = matched/ref, precision `pN` = matched/cand, and
    * `f1_N` = 2pr/(p+r) — each a round(·,6) over at most two divisions
    * (the same IEEE sequence in any engine). Empty sides report zero
    * totals and 0.0 scores.
    *
    * Scale shape: identical to [[bleuCounts]] — n-gram extraction is
    * map-side (zip-with-tail), the clip join is keyed on
    * (pair id, n, gram); ref totals fold out of the same join with a
    * full-outer so grams the candidate missed still count. */
  def rougeCounts(pairs: DataFrame, idCol: String, candCol: String,
                  refCol: String): DataFrame = {
    def toks(c: String) =
      filter(split(lower(col(c)), "[^a-z]+"), t => t =!= "")
    def grams(side: String, c: String) = {
      val arr = toks(c).as("__a")
      val base = pairs.select(col(idCol).as("__id"), arr)
      val uni = base.select(col("__id"), explode(col("__a")).as("__g"))
      val bi = base.filter(size(col("__a")) >= 2)
        .select(col("__id"), explode(zip_with(
          slice(col("__a"), lit(1), size(col("__a")) - 1),
          slice(col("__a"), lit(2), size(col("__a")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("__g"))
      uni.withColumn("__n", lit(1)).union(bi.withColumn("__n", lit(2)))
        .groupBy(col("__id"), col("__n"), col("__g"))
        .agg(count(lit(1)).as(s"__c_$side"))
    }
    val joined = grams("cand", candCol)
      .join(grams("ref", refCol), Seq("__id", "__n", "__g"), "full_outer")
      .groupBy(col("__id"), col("__n"))
      .agg(
        sum(least(coalesce(col("__c_cand"), lit(0L)),
          coalesce(col("__c_ref"), lit(0L)))).as("__m"),
        sum(coalesce(col("__c_cand"), lit(0L))).as("__tc"),
        sum(coalesce(col("__c_ref"), lit(0L))).as("__tr"))
    def side(n: Int) = joined.filter(col("__n") === n)
      .select(col("__id"), col("__m").as(s"matched_$n"),
        col("__tc").as(s"cand_$n"), col("__tr").as(s"ref_$n"))
    val wide = pairs.select(col(idCol).as("__id"))
      .join(side(1), Seq("__id"), "left")
      .join(side(2), Seq("__id"), "left")
    def z(c: String) = coalesce(col(c), lit(0L))
    def ratio(m: Column, t: Column) =
      when(t > 0L, m.cast("double") / t.cast("double")).otherwise(lit(0.0))
    def scores(n: Int) = {
      val r = ratio(z(s"matched_$n"), z(s"ref_$n"))
      val p = ratio(z(s"matched_$n"), z(s"cand_$n"))
      Seq((round(r, 6) + lit(0.0)).as(s"r$n"),
        (round(p, 6) + lit(0.0)).as(s"p$n"),
        (round(when(p + r > 0.0, lit(2.0) * p * r / (p + r))
          .otherwise(lit(0.0)), 6) + lit(0.0)).as(s"f1_$n"))
    }
    wide.select(Seq(col("__id").as(idCol)) ++
      Seq(1, 2).flatMap(n => Seq(z(s"matched_$n").as(s"matched_$n"),
        z(s"cand_$n").as(s"cand_$n"), z(s"ref_$n").as(s"ref_$n"))) ++
      scores(1) ++ scores(2): _*)
  }

  // --- Unicode confusable (homoglyph) detection ---------------------------

  /** Latin-lookalike table — a deterministic subset of Unicode TR #39's
    * confusables (the Cyrillic and Greek letters visually identical to
    * ASCII in most fonts, both cases): the characters an attacker swaps
    * in to slip a spoofed domain / handle / document past an exact-match
    * filter. Kept single-codepoint → single-codepoint so the skeleton is
    * one `translate` call (codegen'd in Spark, built-in in DuckDB). */
  private[graft] val confusableFrom: String =
    "аеорсухіѕјԁɡաονυρκ" + "АВЕКМНОРСТХЅІЈ" + "αγ" + "ΑΒΕΖΗΙΚΜΝΟΡΤΥΧ"
  private[graft] val confusableTo: String =
    "aeopcyxisjdgwovupk" + "ABEKMHOPCTXSIJ" + "ay" + "ABEZHIKMNOPTYX"

  /** The confusable SKELETON of a string: every homoglyph mapped to its
    * ASCII target — two strings that render alike get EQUAL skeletons.
    * Map-only, one translate. */
  def confusableSkeleton(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    translate(c, confusableFrom, confusableTo)

  /** Homoglyph-spoof pairs: documents whose confusable skeletons are
    * EQUAL while the raw texts differ — the catch that byte-exact dedup
    * structurally misses (a Cyrillic 'о' swapped into an English doc
    * defeats md5 dedup while reading identically). Returns (id1, id2,
    * n_swapped long — confusable codepoints in the pair's non-ASCII
    * side(s), > 0 by construction) with id1 < id2.
    *
    * Scale shape: the join KEY is the skeleton's xxhash64 — an 8-byte,
    * skew-safe hash key (the skeleton and text ride the row for
    * verification) — and docs with ZERO confusable characters can only
    * match each other trivially (skeleton == raw ⇒ texts equal ⇒
    * excluded), so one side of the join is pre-filtered to the docs
    * containing at least one homoglyph: the clean majority is scanned
    * once and joined only against that small dirty side. */
  def confusableSpoofPairs(df: DataFrame, idCol: String,
                           textCol: String): DataFrame = {
    val base = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(textCol).as("__t"),
        confusableSkeleton(col(textCol)).as("__sk"))
      .withColumn("__n",
        (length(col("__t")) -
          length(translate(col("__t"), confusableFrom, ""))).cast("long"))
    // a pair needs at least one side with a homoglyph; keep clean docs
    // only as JOIN TARGETS of dirty ones by unioning roles — cheaper:
    // dirty side joins the full table, pairs dedup on (id1, id2)
    val dirty = base.filter(col("__n") > 0L)
      .select(col("id").as("__di"), col("__sk").as("__dsk"),
        col("__t").as("__dt"), col("__n").as("__dn"))
    dirty.join(base,
        xxhash64(col("__dsk")) === xxhash64(col("__sk")) &&
          col("__dsk") === col("__sk") && col("__dt") =!= col("__t"))
      .select(least(col("__di"), col("id")).as("id1"),
        greatest(col("__di"), col("id")).as("id2"),
        (col("__dn") + col("__n")).as("n_swapped"))
      .groupBy(col("id1"), col("id2"))
      .agg(max(col("n_swapped")).as("n_swapped"))
  }
}
