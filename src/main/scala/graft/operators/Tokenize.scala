package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer-training primitives: the corpus-statistics passes a BPE/
  * unigram tokenizer build runs before any model training. The reference
  * engine (MobileTeleSystems/onetl) moves corpora and delegates
  * transforms to Spark; this is the transform a 100 TB text corpus
  * actually needs before it can be tokenized at all.
  */
object Tokenize {

  /** One BPE merge-step's pair statistics (Sennrich et al. 2016,
    * arXiv:1508.07909 — "Neural Machine Translation of Rare Words with
    * Subword Units", Algorithm 1): count every adjacent symbol pair
    * across the corpus, weighted by word frequency, and return the
    * `topK` most frequent pairs — the candidates the next merge would
    * fuse. Symbols here are single characters (the algorithm's initial
    * state; after a merge the caller would re-run on the fused vocab).
    *
    * Returns (sym1 string, sym2 string, cnt long), most-frequent first,
    * ties broken by (sym1, sym2) so the top-k cut is total-ordered and
    * engine-independent.
    *
    * Scale shape — the whole trick is that pair counting NEVER touches
    * the corpus: phase 1 is the word-count pattern (map-side combine,
    * shuffles (word, count) pairs, collapses 100 TB of text to a
    * Zipf-bounded vocabulary of millions), phase 2 explodes characters
    * over UNIQUE WORDS only — per-word work is O(len) on a table that is
    * orders of magnitude smaller than the corpus. The final top-k is
    * TakeOrderedAndProject (per-partition heap + driver merge of k
    * rows), not a global sort. This is exactly how production BPE
    * trainers scale: frequency table first, merges on the table.
    */
  def bpePairCounts(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    // phase 1: corpus -> word frequency table (the only corpus-wide scan)
    val words = df
      .select(explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= "")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    // phase 2: adjacent char pairs over unique words, weighted by __c.
    // substring(w, i, 1) not split(w, "") — 1-based substring indexing
    // behaves identically in Spark and DuckDB, so the oracle replays
    // byte-for-byte; split-on-empty edge semantics differ across engines.
    val pairs = words
      .filter(length(col("__w")) >= 2)
      .select(col("__c"), explode(expr(
        "transform(sequence(1, length(__w) - 1), " +
          "i -> struct(substring(__w, i, 1) AS s1, substring(__w, i + 1, 1) AS s2))"
      )).as("__p"))
      .groupBy(col("__p.s1").as("sym1"), col("__p.s2").as("sym2"))
      .agg(sum(col("__c")).as("cnt"))
    pairs.orderBy(col("cnt").desc, col("sym1"), col("sym2")).limit(topK)
  }

  /** The FULL BPE merge-training loop (Sennrich et al. 2016, Algorithm
    * 1), completing [[bpePairCounts]]'s single step: `nMerges`
    * iterations of count-pairs → argmax → apply-merge, run entirely on
    * the word-frequency TABLE — the corpus is scanned exactly once and
    * collapses to its Zipf-bounded vocabulary; every iteration is one
    * map-combinable aggregate + one map-only rewrite of that table, so
    * the per-merge cost is O(vocab), never O(corpus).
    *
    * Segmentations are space-joined symbol strings, and a merge (a, b)
    * applies as the three-step replace chain
    * `' '+double-space+' '  →  ' a  b ' ⇒ ' ab '  →  collapse '  '` —
    * sequential non-overlapping left-to-right replacement, which IS the
    * greedy simultaneous merge of the paper (the doubled spaces stop one
    * match from consuming its neighbour's boundary), and which behaves
    * byte-identically in Spark's `replace` and DuckDB's `replace`, so
    * the unrolled SQL oracle replays every round exactly. Argmax ties
    * break on (sym1, sym2) — a total order, engine-independent.
    *
    * Returns (step int 1..nMerges, sym1, sym2, cnt long — the pair's
    * frequency when it was chosen), fewer rows if the corpus runs dry.
    *
    * Production note — where the cluster/driver boundary really sits: a
    * 32k-merge production train does NOT belong in per-merge cluster
    * jobs. The corpus-collapse to the (word, freq) table is the
    * distributed work; that table is Zipf-bounded (a few million rows
    * even at 100 TB) and FITS ON THE DRIVER, where the classic
    * delta-maintained merge loop runs the 32k merges in seconds. This
    * method keeps the loop on the cluster only because that makes every
    * round an oracle-replayable aggregate (and is capped at 4096 merges
    * accordingly); compose `bpePairCounts`-style collection with a
    * driver-local loop for real tokenizer training. */
  def bpeTrainMerges(df: DataFrame, textCol: String,
                     nMerges: Int): DataFrame = {
    val seg0 = df
      .select(explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= "")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .select(col("__c"), expr(
        "array_join(transform(sequence(1, length(__w)), " +
          "i -> substring(__w, i, 1)), ' ')").as("__seg"))
    trainMergesOnSeg(df.sparkSession, seg0, nMerges)
  }

  /** The shared Sennrich merge loop over a (`__c` count, `__seg`
    * space-joined symbols) frame — the engine behind [[bpeTrainMerges]]
    * (character alphabet) and [[bpeTrainMergesBytes]] (escaped-byte
    * alphabet). Symbols may be ANY space-free strings: the merge applies
    * through `functions.replace` column literals, never interpolated
    * SQL, so apostrophes/backslashes in byte-mode symbols cannot inject.
    */
  private def trainMergesOnSeg(spark: org.apache.spark.sql.SparkSession,
                               seg0: DataFrame, nMerges: Int): DataFrame = {
    require(nMerges >= 1 && nMerges <= 4096,
      s"nMerges must be in [1, 4096], got $nMerges")
    var seg = seg0.localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var dry = false
    while (step <= nMerges && !dry) {
      val best = seg
        .select(col("__c"), split(col("__seg"), " ").as("__l"))
        .filter(size(col("__l")) >= 2)
        .select(col("__c"), explode(expr(
          "transform(sequence(0, size(__l) - 2), " +
            "i -> struct(__l[i] AS s1, __l[i + 1] AS s2))")).as("__p"))
        .groupBy(col("__p.s1").as("s1"), col("__p.s2").as("s2"))
        .agg(sum(col("__c")).as("cnt"))
        .orderBy(col("cnt").desc, col("s1"), col("s2"))
        .limit(1).collect()
      if (best.isEmpty) dry = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((step, a, b, c))
        // the doubled-space replace chain: ' a  b ' => ' ab ', then
        // collapse — greedy simultaneous merge, literal-safe via lit()
        seg = seg.select(col("__c"), trim(replace(replace(
            concat(lit(" "), replace(col("__seg"), lit(" "), lit("  ")),
              lit(" ")),
            lit(s" $a  $b "), lit(s" $a$b ")), lit("  "), lit(" ")))
            .as("__seg"))
          .localCheckpoint() // flat lineage: one frame per merge round
        step += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("step", "sym1", "sym2", "cnt")
  }

  /** The GPT-2 byte→printable-unicode escape table (Radford et al. 2019,
    * `bytes_to_unicode` in the released encoder; openai/gpt-2
    * src/encoder.py): every byte that is printable and non-space —
    * 33..126, 161..172, 174..255 — maps to its own codepoint; the 68
    * excluded bytes (controls, space, DEL..NBSP region, soft hyphen 173)
    * map to 256 + their rank among the excluded, ascending. Pure
    * arithmetic, no RNG — so a SQL oracle recomputes the identical
    * mapping with a CASE over the byte value. All targets are < 0x250,
    * single UTF-16 chars, printable, and space-free — which is the
    * point: byte-level segmentations stay space-joinable strings and the
    * merge replace-chain needs no escaping beyond this map. */
  val byteUnicode: IndexedSeq[String] = (0 until 256).map { b =>
    val cp =
      if ((b >= 33 && b <= 126) || (b >= 161 && b <= 172) ||
          (b >= 174 && b <= 255)) b
      else if (b <= 32) 256 + b        // controls + space: ranks 0..32
      else if (b <= 160) 162 + b       // 127..160: ranks 33..66
      else 323                         // 173 (soft hyphen): rank 67
    new String(Character.toChars(cp))
  }

  /** Byte-level pretoken frequency table + escaped-byte segmentations —
    * the GPT-2 pretokenization discipline, simplified to its replayable
    * core: pretokens are space-split with ONE leading space kept
    * attached (`' ?[^ ]+'` — the Ġ-prefix behavior that lets merges
    * learn word boundaries), case is PRESERVED (byte level has no
    * canonical lowercase), and every pretoken's UTF-8 bytes escape
    * through [[byteUnicode]] into a space-joined symbol string. The
    * byte walk runs as hex-pair arithmetic (`hex(encode(w,'UTF-8'))`,
    * then `instr` on the hex alphabet) — 1-based, engine-identical, so
    * DuckDB replays the segmentation exactly; the escape table itself
    * is a broadcast 256-slot array literal indexed by byte value.
    * Returns (`__c` count, `__seg`). */
  private def byteSegments(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(regexp_extract_all(col(textCol), lit(" ?[^ ]+"),
        lit(0))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .withColumn("__bm", typedlit(byteUnicode))
      .withColumn("__h", hex(encode(col("__w"), "UTF-8")))
      .select(col("__c"), expr(
        "array_join(transform(sequence(1, length(__h) div 2), " +
          "i -> element_at(__bm, " +
          "(instr('0123456789ABCDEF', substring(__h, 2*i-1, 1)) - 1) * 16" +
          " + instr('0123456789ABCDEF', substring(__h, 2*i, 1)))), ' ')")
        .as("__seg"))

  /** [[bpePairCounts]] in byte-alphabet mode: adjacent escaped-byte pair
    * statistics over the byte-level pretoken table ([[byteSegments]]).
    * Same scale shape as the char mode — the corpus collapses to its
    * pretoken-frequency table first, pairs explode over unique pretokens
    * only — but the alphabet is the full 256-symbol byte map, so
    * punctuation, digits, whitespace prefixes, and multibyte UTF-8 all
    * participate. Returns (sym1, sym2, cnt) top-`topK` by
    * (cnt desc, sym1, sym2) — symbol order is raw UTF-8 byte order in
    * both Spark and DuckDB, so the cut replays. */
  def bpeBytePairCounts(df: DataFrame, textCol: String,
                        topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val pairs = byteSegments(df, textCol)
      .select(col("__c"), split(col("__seg"), " ").as("__l"))
      .filter(size(col("__l")) >= 2)
      .select(col("__c"), explode(expr(
        "transform(sequence(0, size(__l) - 2), " +
          "i -> struct(__l[i] AS s1, __l[i + 1] AS s2))")).as("__p"))
      .groupBy(col("__p.s1").as("sym1"), col("__p.s2").as("sym2"))
      .agg(sum(col("__c")).as("cnt"))
    pairs.orderBy(col("cnt").desc, col("sym1"), col("sym2")).limit(topK)
  }

  /** [[bpeTrainMerges]] in byte-alphabet mode — GPT-2-style byte-level
    * BPE training: the identical Sennrich merge loop
    * ([[trainMergesOnSeg]]) runs over [[byteSegments]]' escaped-byte
    * pretoken table. Merged symbols are concatenations of
    * [[byteUnicode]] chars (e.g. `Ġt` = space+t), exactly the tokens a
    * GPT-2 vocabulary file contains. Merge literals pass through
    * `functions.replace` as column literals — byte-mode symbols can
    * contain quotes and backslashes, which MUST NOT reach interpolated
    * SQL. Returns (step, sym1, sym2, cnt). */
  def bpeTrainMergesBytes(df: DataFrame, textCol: String,
                          nMerges: Int): DataFrame =
    trainMergesOnSeg(df.sparkSession, byteSegments(df, textCol), nMerges)

  /** Frequency-of-frequencies spectrum ("count of counts"): how many
    * distinct tokens occur exactly f times, for f = 1..`maxF`, plus one
    * overflow row (f = maxF+1 aggregating everything rarer than common).
    * THE corpus-health fingerprint: hapax share predicts OOV rates and
    * Good–Turing mass, a spectrum bending away from Zipf flags template
    * spam or tokenizer breakage. Empty rows are emitted for absent
    * frequencies so the spectrum's shape is fixed and diffable.
    *
    * Returns (freq long — maxF+1 = overflow, n_types long,
    * n_tokens long) ascending by freq.
    *
    * Scale shape: word-count, then count-of-counts — the second
    * aggregate's input is the vocabulary, already orders of magnitude
    * below the corpus; the spectrum frame is maxF+1 rows. */
  def frequencySpectrum(df: DataFrame, textCol: String,
                        maxF: Int = 10): DataFrame = {
    require(maxF >= 1, "maxF must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df
      .select(explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= "")).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
    val spectrum = counts
      .select(when(col("__c") <= maxF, col("__c"))
        .otherwise(lit(maxF + 1L)).as("freq"), col("__c"))
      .groupBy(col("freq"))
      .agg(count(lit(1)).as("n_types"), sum(col("__c")).as("n_tokens"))
    val shape = (1L to (maxF + 1L)).toDF("freq")
    broadcast(shape).join(spectrum, Seq("freq"), "left")
      .select(col("freq"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      .orderBy(col("freq"))
  }

  /** Vocabulary coverage curve: the smallest top-by-frequency vocabulary
    * covering each target share of corpus tokens — the number a
    * tokenizer build sizes its vocab by ("32k pieces cover 99.2%").
    * For each target t, reports the first rank (by count desc, token
    * asc — a total order, so the curve replays exactly) whose running
    * token share reaches t. Returns (target double, vocab_size long,
    * tokens_covered long); a target no finite vocab reaches (t > 1)
    * would simply yield no row.
    *
    * Scale shape: word-count, then [[Ranking.globalRunningSum]] over
    * the vocabulary (range exchange — vocab-sized, not corpus-sized),
    * then one broadcast of the |targets|-row frame and a min-aggregate
    * per target. */
  def coverageCurve(df: DataFrame, textCol: String,
                    targets: Seq[Double]): DataFrame = {
    require(targets.nonEmpty && targets.forall(t => t > 0 && t <= 1),
      "targets must be fractions in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df
      .select(explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= "")).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
    val ord = Seq(col("__c").desc, col("__t"))
    // rank and running sum over the SAME total order — both via the
    // range-exchange helpers, never a partition-less window
    val ordered = Ranking.globalRunningSum(
      Ranking.globalRowNumber(counts, ord, out = "__rank"), ord, "__c",
      out = "__run")
    val total = counts.agg(sum(col("__c")).cast("double").as("__n"))
    val tf = targets.distinct.sorted.toDF("target")
    ordered.crossJoin(broadcast(total))
      .join(broadcast(tf), col("__run") >= col("target") * col("__n"))
      .groupBy(col("target"))
      .agg(min(struct(col("__run"), col("__rank"))).as("__first"))
      .select(col("target"), col("__first.__rank").as("vocab_size"),
        col("__first.__run").as("tokens_covered"))
      .orderBy(col("target"))
  }

  /** Greedy BPE encoding of one word against a ranked merge list
    * (Sennrich et al. 2016 inference): start from characters, repeatedly
    * fuse the adjacent pair with the LOWEST merge rank anywhere in the
    * word (leftmost on rank ties) until no listed pair remains. This is
    * the reference BPE inference loop, exposed for specs and driver-side
    * use; the distributed path is [[bpeEncode]]. */
  def bpeEncodeWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    bpeEncodeSymbols(word.map(_.toString), merges)

  /** [[bpeEncodeWord]] in byte-alphabet mode: the pretoken's UTF-8
    * bytes escape through [[byteUnicode]] first, then the same ranked
    * greedy merge loop fuses them — GPT-2 inference over a
    * [[bpeTrainMergesBytes]] merge list. */
  def bpeEncodeBytesWord(word: String,
                         merges: Seq[(String, String)]): Seq[String] =
    bpeEncodeSymbols(word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .toIndexedSeq.map(b => byteUnicode(b & 0xff)), merges)

  /** The greedy ranked-merge fuse loop shared by the char and byte
    * encoders: repeatedly fuse the adjacent pair with the LOWEST merge
    * rank (leftmost on rank ties) until no listed pair remains. */
  def bpeEncodeSymbols(symbols: Seq[String],
                       merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    val toks = scala.collection.mutable.ArrayBuffer(symbols: _*)
    var done = toks.length < 2
    while (!done) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        val r = rank.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = i }
        i += 1
      }
      if (best < 0 || bestRank == Int.MaxValue) done = true
      else {
        toks(best) = toks(best) + toks(best + 1)
        toks.remove(best + 1)
        if (toks.length < 2) done = true
      }
    }
    toks.toSeq
  }

  /** Distributed BPE encoding: tokenize the corpus against a learned
    * merge list, WITHOUT ever running the merge loop over the corpus —
    * the corpus collapses to its word-frequency table (the only full
    * scan, map-side combined), each UNIQUE word encodes once in a typed
    * map over that vocab-sized table, and consumers join the result back
    * by word. A word seen a billion times costs one encode. Returns
    * (word string, count long, tokens array<string>, n_tokens int).
    *
    * The merge list rides the closure (it is KBs — a 50k-merge GPT-2
    * table is ~0.5 MB, broadcast-fine); ranks resolve by list position. */
  def bpeEncode(df: DataFrame, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= "")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    words.as[(String, Long)].map { case (w, c) =>
      val toks = bpeEncodeWord(w, merges)
      (w, c, toks, toks.length)
    }.toDF("word", "count", "tokens", "n_tokens")
  }

  /** [[bpeEncode]] in byte-alphabet mode: the corpus collapses to its
    * byte-level PRETOKEN frequency table (space-split, leading space
    * attached, case preserved — [[byteSegments]]' pretokenization), each
    * unique pretoken encodes ONCE against the ranked merge list via
    * [[bpeEncodeBytesWord]], and consumers join back by pretoken. Tokens
    * are [[byteUnicode]]-escaped strings — a GPT-2 vocabulary's surface
    * form. Returns (word, count, tokens array<string>, n_tokens). */
  def bpeEncodeBytes(df: DataFrame, textCol: String,
                     merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(regexp_extract_all(col(textCol), lit(" ?[^ ]+"),
        lit(0))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    words.as[(String, Long)].map { case (w, c) =>
      val toks = bpeEncodeBytesWord(w, merges)
      (w, c, toks, toks.length)
    }.toDF("word", "count", "tokens", "n_tokens")
  }

  /** Per-document token counts under a BPE merge list: the budget
    * column every packing / mixing / curriculum step keys on, computed
    * at the REAL tokenizer's granularity instead of the whitespace
    * estimate. One corpus scan for the (doc, word) stream, one
    * vocab-sized encode ([[bpeEncode]]), one broadcastable join back on
    * the word, one per-doc sum. Documents with no tokens keep a
    * (id, 0) row. Returns (idCol, n_tokens long). */
  def bpeTokenCounts(df: DataFrame, idCol: String, textCol: String,
                     merges: Seq[(String, String)]): DataFrame = {
    val docWords = df.select(col(idCol).as("__id"),
      explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= "")).as("__w"))
    val encoded = bpeEncode(df, textCol, merges)
      .select(col("word").as("__w"), col("n_tokens").as("__nt"))
    val summed = docWords.join(encoded, Seq("__w"))
      .groupBy(col("__id"))
      .agg(sum(col("__nt")).cast("long").as("n_tokens"))
    df.select(col(idCol).as("__id"))
      .join(summed, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }

  /** Greedy longest-match-first WordPiece encoding of one word (Wu et
    * al. 2016, arXiv:1609.08144 §4.1; the BERT tokenizer's algorithm):
    * at position 0 match the longest vocabulary piece WITHOUT the `##`
    * continuation marker; at later positions the longest piece WITH it;
    * if any position has no match — or the word exceeds `maxWordLen` —
    * the ENTIRE word becomes one unknown token (BERT's semantics: no
    * partial emissions). Greedy is the spec, not a shortcut: WordPiece
    * deliberately differs from optimal segmentation (a longer head
    * piece can strand the tail — e.g. vocab {col, ##u} beats {co,
    * ##lumn} to "column" and then dies), and that trap is pinned by the
    * specs. Returns (n_tokens, isUnk). */
  def wordPieceEncodeWord(word: String, heads: Set[String],
                          conts: Set[String], maxWordLen: Int): (Int, Boolean) = {
    if (word.length > maxWordLen) return (1, true)
    val maxH = if (heads.isEmpty) 0 else heads.iterator.map(_.length).max
    val maxC = if (conts.isEmpty) 0 else conts.iterator.map(_.length).max
    var pos = 0
    var toks = 0
    while (pos < word.length) {
      val cand = if (pos == 0) heads else conts
      val cap = math.min(word.length - pos, if (pos == 0) maxH else maxC)
      var l = cap
      var hit = 0
      while (l >= 1 && hit == 0) {
        if (cand.contains(word.substring(pos, pos + l))) hit = l
        l -= 1
      }
      if (hit == 0) return (1, true)
      pos += hit
      toks += 1
    }
    (toks, false)
  }

  /** Distributed WordPiece encoding against a fixed vocabulary (pieces
    * with a `##` prefix are continuations), on the [[bpeEncode]]
    * discipline: the corpus collapses to its word-frequency table (the
    * only full scan, map-side combined) and each UNIQUE word encodes
    * once in a typed map with the KB-scale vocab riding the closure — a
    * word seen a billion times costs one greedy match. Returns
    * (word string, count long, n_tokens int, is_unk boolean). */
  def wordPieceEncode(df: DataFrame, textCol: String, vocab: Seq[String],
                      maxWordLen: Int = 100): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val heads = vocab.filterNot(_.startsWith("##")).toSet
    val conts = vocab.filter(_.startsWith("##")).map(_.drop(2)).toSet
    require(conts.forall(_.nonEmpty), "a bare '##' piece matches nothing")
    val words = df
      .select(explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= "")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    words.as[(String, Long)].map { case (w, c) =>
      val (nt, unk) = wordPieceEncodeWord(w, heads, conts, maxWordLen)
      (w, c, nt, unk)
    }.toDF("word", "count", "n_tokens", "is_unk")
  }

  /** Per-document WordPiece budget columns: (idCol, n_words long,
    * n_tokens long, n_unk long) — word count, token count under the
    * vocab (an unknown word costs 1 token), and how many words fell to
    * UNK (the coverage signal a tokenizer build iterates on). Same join
    * shape as [[bpeTokenCounts]]; documents with no words keep a zero
    * row. */
  def wordPieceTokenCounts(df: DataFrame, idCol: String, textCol: String,
                           vocab: Seq[String],
                           maxWordLen: Int = 100): DataFrame = {
    val docWords = df.select(col(idCol).as("__id"),
      explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= "")).as("__w"))
    val encoded = wordPieceEncode(df, textCol, vocab, maxWordLen)
      .select(col("word").as("__w"), col("n_tokens").as("__nt"),
        col("is_unk").cast("long").as("__unk"))
    val summed = docWords.join(encoded, Seq("__w"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__nt")).cast("long").as("n_tokens"),
        sum(col("__unk")).as("n_unk"))
    df.select(col(idCol).as("__id"))
      .join(summed, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_unk"), lit(0L)).as("n_unk"))
  }

  /** Unigram-tokenizer seed vocabulary (Kudo 2018, arXiv:1804.10959
    * §3.2 seeds from frequent substrings): every substring of length
    * `minLen..maxLen` occurring in the corpus, scored by
    * occurrences × length (the EM initialization's frequency-length
    * heuristic), top `topK`. Like [[bpePairCounts]], the corpus
    * collapses to the word-frequency table before any substring work:
    * a word of length L contributes O(L · (maxLen-minLen)) substring
    * rows counted once and weighted by frequency, so the explode is
    * bounded by vocab size × word length, never corpus size.
    *
    * Returns (piece string, score long) ordered by (score desc, piece).
    */
  /** Optimal unigram-LM segmentation per word (the Viterbi/E-step of
    * Kudo 2018's SentencePiece unigram trainer): split each distinct
    * word into vocabulary pieces maximizing the summed piece scores.
    * Single characters always segment with a floor score of 1 (the UNK
    * guarantee), so every word is segmentable; multi-char pieces must be
    * in `vocab`.
    *
    * Ties resolve deterministically by PACKING the objective: a path's
    * value is `score·1024 + (1023 − pieces)`, so the DP maximizes score
    * first, then prefers FEWER pieces — one long per cell, one max per
    * transition, and the identical packed recurrence replays in SQL.
    * The pieces field is 10 bits, so words up to 1023 letters segment
    * exactly; a LONGER letter run (base64 blobs, spam runs) fails HARD
    * with a clear message instead of silently borrowing from the score
    * field — callers should pre-filter such non-linguistic runs (e.g.
    * [[graft.operators.Quality]]'s max-word-length filter). Per-piece
    * scores are bounded to 2^42 so the worst packed path (1023 pieces ×
    * 2^42 × 1024) stays under 2^63. Returns
    * (word, count long, score long, n_pieces long).
    *
    * Scale shape: the corpus collapses to its word-frequency table (the
    * only full scan); each UNIQUE word runs the DP once in a typed map
    * over that vocab-sized frame with the piece table riding the
    * closure (KBs) — the [[bpeEncode]] discipline. A word seen a
    * billion times costs one DP. */
  def unigramViterbiSegment(df: DataFrame, textCol: String,
                            vocab: Map[String, Long],
                            maxPieceLen: Int = 4): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(vocab.values.forall(s => s >= 1 && s <= (1L << 42)),
      "piece scores must be in [1, 2^42] for the packed objective")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= "")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    words.as[(String, Long)].map { case (w, c) =>
      val n = w.length
      // > 1023 pieces would underflow the 10-bit pieces field and
      // corrupt BOTH outputs with no error (r11 ADVICE); fail loudly
      require(n <= 1023,
        s"word of length $n exceeds the 1023-letter segmentation bound " +
          "(pre-filter non-linguistic letter runs before segmenting): " +
          w.take(40) + "...")
      val dp = viterbiDp(w, vocab, maxPieceLen)
      (w, c, dp(n) / 1024, 1023 - dp(n) % 1024)
    }.toDF("word", "count", "score", "n_pieces")
  }

  /** The packed-objective Viterbi forward table shared by
    * [[unigramViterbiSegment]] and [[unigramEmStep]]: dp(i) is the best
    * packed value over segmentations of the first i letters. */
  private def viterbiDp(w: String, vocab: Map[String, Long],
                        maxPieceLen: Int): Array[Long] = {
    val n = w.length
    val dp = new Array[Long](n + 1)
    dp(0) = 1023L // packed (score 0, pieces 0)
    var i = 1
    while (i <= n) {
      var best = Long.MinValue
      var l = 1
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax) {
        val piece = w.substring(i - l, i)
        val sc =
          if (l == 1) Some(vocab.getOrElse(piece, 1L)) else vocab.get(piece)
        sc.foreach { s =>
          val v = dp(i - l) + s * 1024 - 1
          if (v > best) best = v
        }
        l += 1
      }
      dp(i) = best
      i += 1
    }
    dp
  }

  /** Backtrace of the packed DP: the chosen pieces, ties resolved to the
    * SHORTEST piece at each step (a tie in the PACKED value — same score
    * and same piece count via different pieces — is rare but must pick
    * deterministically, and "smallest l" is what the SQL replay's
    * `min(l)` argmin reproduces). */
  private def viterbiPieces(w: String, vocab: Map[String, Long],
                            maxPieceLen: Int): List[String] = {
    val dp = viterbiDp(w, vocab, maxPieceLen)
    var pieces = List.empty[String]
    var i = w.length
    while (i > 0) {
      var picked = -1
      var l = 1
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax && picked < 0) {
        val piece = w.substring(i - l, i)
        val sc =
          if (l == 1) Some(vocab.getOrElse(piece, 1L)) else vocab.get(piece)
        if (sc.exists(s => dp(i - l) + s * 1024 - 1 == dp(i))) picked = l
        l += 1
      }
      assert(picked > 0, s"backtrace hole at $i in '$w'") // unreachable
      pieces ::= w.substring(i - picked, i)
      i -= picked
    }
    pieces
  }

  /** ONE EM iteration of the unigram-LM tokenizer trainer (Kudo 2018,
    * arXiv:1804.10959 §3.1 — the step [[substringSeedVocab]] seeds and
    * [[unigramViterbiSegment]] scores): E-step segments every DISTINCT
    * word under the current scores (identical packed DP, smallest-piece
    * tie-break) and counts the chosen pieces weighted by word frequency;
    * M-step re-scores each piece as its frequency share in exact
    * micro-units — `score' = (count(piece)·10^6) div total_pieces`.
    * Pieces the Viterbi never chooses simply don't appear (EM's pruning:
    * their count is zero, so the next vocab drops them); single-letter
    * fallback pieces DO appear — their mass is the UNK pressure the
    * trainer watches. Returns (piece, n_occurrences long, score_micro
    * long) ordered by piece; iterate by feeding score_micro back in as
    * the next round's vocab.
    *
    * Scale shape: the corpus collapses to its word-frequency table (the
    * only full scan); each unique word runs the DP + backtrace once in a
    * typed flatMap; piece counts are one map-combinable aggregate and
    * the total is a single collected long. */
  def unigramEmStep(df: DataFrame, textCol: String,
                    vocab: Map[String, Long],
                    maxPieceLen: Int = 4): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(vocab.values.forall(s => s >= 1 && s <= (1L << 42)),
      "piece scores must be in [1, 2^42] for the packed objective")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= "")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    val counts = words.as[(String, Long)].flatMap { case (w, c) =>
      require(w.length <= 1023,
        s"word of length ${w.length} exceeds the 1023-letter bound: " +
          w.take(40) + "...")
      viterbiPieces(w, vocab, maxPieceLen).map(p => (p, c))
    }.toDF("piece", "__c")
      .groupBy(col("piece")).agg(sum(col("__c")).as("n_occurrences"))
    val total = counts
      .agg(coalesce(sum(col("n_occurrences")), lit(0L))).first.getLong(0)
    require(total > 0, "no pieces segmented — empty corpus?")
    counts.select(col("piece"), col("n_occurrences"),
        call_function("div", col("n_occurrences") * lit(1000000L),
          lit(total)).as("score_micro"))
      .orderBy(col("piece"))
  }

  def substringSeedVocab(df: DataFrame, textCol: String,
                         minLen: Int, maxLen: Int, topK: Int): DataFrame = {
    require(minLen >= 1 && maxLen >= minLen,
      s"need 1 <= minLen <= maxLen, got ($minLen, $maxLen)")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val words = df
      .select(explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= "")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    val pieces = words
      .filter(length(col("__w")) >= minLen)
      .select(col("__c"), explode(expr(
        // all (start, len) windows with minLen <= len <= maxLen that fit
        s"flatten(transform(sequence(1, length(__w) - $minLen + 1), " +
          s"i -> transform(sequence($minLen, least($maxLen, length(__w) - i + 1)), " +
          "n -> substring(__w, i, n))))"
      )).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("__c") * length(col("piece"))).as("score"))
    pieces.orderBy(col("score").desc, col("piece")).limit(topK)
  }
}
