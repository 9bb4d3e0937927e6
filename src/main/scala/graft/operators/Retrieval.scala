package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus keyword retrieval — the lexical sibling of the embedding-ANN
  * family in [[Similarity]]. A training-data pipeline uses this for
  * targeted subset selection ("pull the top-k documents about X"),
  * contamination triage (rank the corpus against a benchmark prompt),
  * and boilerplate hunting — anywhere the query is words, not a vector.
  *
  * Reference scope: the reference engine (MobileTeleSystems/onetl) moves
  * data and delegates transforms to Spark; retrieval is part of the
  * curation layer this library adds on top (same status as Dedup /
  * Similarity / Corpus).
  */
object Retrieval {

  /** Okapi BM25 top-k retrieval (Robertson & Zaragoza 2009, the
    * Lucene-style idf variant): for each query, the k highest-scoring
    * documents under
    *
    *   score(q,d) = Σ_{t ∈ distinct(q)} idf(t) ·
    *                tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    *   idf(t)     = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )
    *
    * with the `+ 1` inside the ln keeping idf strictly positive even for
    * terms in more than half the corpus (the flat-vocabulary regime this
    * library's synthetic corpus is in). Query terms are DEDUPLICATED
    * (`array_distinct`) — a repeated word in a query counts once.
    * Tokenization is the shared corpus rule (lowercased ASCII-letter
    * runs, the same split [[Corpus.unigramNll]] uses) so corpus
    * statistics and retrieval agree on what a term is.
    *
    * Returns (qidCol, rank int 1-based, idCol, score double rounded to
    * 4 dp). Rounding happens BEFORE ranking and ties break on the doc
    * id, so the ranking is deterministic across engines and fp
    * summation orders.
    *
    * Scale shape: tf and dl are word-count aggregates (map-side
    * combine); the query side is a HANDFUL of rows and rides a
    * broadcast, as do the per-query-term df rows and the 1-row (N,
    * avgdl) stats — so the only non-broadcast joins are keyed on the
    * doc id, and nothing anywhere is O(corpus²). The top-k window
    * partitions by query id; with rank ≤ k Spark inserts
    * WindowGroupLimit partial limits ahead of the shuffle, so the
    * per-query candidate stream is pruned map-side at corpus scale.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qidCol: String, qtextCol: String,
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val toks = docs.select(col(idCol).as("__id"),
      explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= "")).as("__t"))
    val tf = toks.groupBy(col("__id"), col("__t"))
      .agg(count(lit(1)).as("__tf"))
    val dl = toks.groupBy(col("__id")).agg(count(lit(1)).as("__dl"))
    val stats = dl.agg(count(lit(1)).as("__n"), avg(col("__dl")).as("__avgdl"))
    val qterms = queries.select(col(qidCol).as("__qid"),
      explode(array_distinct(filter(split(lower(col(qtextCol)), "[^a-z]+"),
        t => t =!= ""))).as("__t"))
    // df only for terms some query mentions: semi-join the vocab-sized
    // df aggregate down to ≤|query terms| rows, then broadcast it
    val dfreq = tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
      .join(broadcast(qterms.select(col("__t")).distinct()), Seq("__t"),
        "left_semi")
    val scored = tf
      .join(broadcast(qterms), Seq("__t")) // prunes tf to query terms
      .join(broadcast(dfreq), Seq("__t"))
      .join(dl, Seq("__id")) // the one keyed shuffle join (doc id)
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log((col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1))
      .withColumn("__w",
        col("__idf") * col("__tf") * lit(k1 + 1) /
          (col("__tf") + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col("__qid"), col("__id"))
      .agg(round(sum(col("__w")), 4).as("score"))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("score").desc, col("__id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__qid").as(qidCol), col("rank"),
        col("__id").as(idCol), col("score"))
  }

  /** Rocchio-style pseudo-relevance-feedback expansion terms (Rocchio
    * 1971; Buckley TREC-3 practice): take each query's BM25 top-k
    * documents as pseudo-relevant, score every term they contain by
    * Σ_docs tf(t,d) · ln(N/df(t)), drop the original query terms, and
    * keep the top-m — the terms you'd OR into the query for recall.
    * Weights round(4) BEFORE ranking with (weight desc, term) ties, so
    * the expansion set is engine-reproducible.
    *
    * Returns (qidCol, rank int 1-based, term, weight). Scale shape: the
    * feedback set is |queries|·k doc ids (broadcast), so the candidate
    * pass is one keyed join of the tf stream against it; df joins on
    * the term; N rides a 1-row broadcast — same discipline as
    * [[bm25TopK]], nothing O(corpus²). */
  def rocchioExpansionTerms(docs: DataFrame, idCol: String, textCol: String,
                            queries: DataFrame, qidCol: String,
                            qtextCol: String, kDocs: Int = 10,
                            mTerms: Int = 5): DataFrame = {
    require(mTerms >= 1, "mTerms must be >= 1")
    val toks = docs.select(col(idCol).as("__id"),
      explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= "")).as("__t"))
    // ONE corpus tokenize: tf feeds three separate actions below (the
    // candidate sum, df, and N) — un-materialized, each re-ran the
    // whole explode+count over the corpus. N = docs with >= 1 token is
    // derivable from tf itself (distinct __id), identical to counting
    // distinct ids of the raw token stream. persist, not
    // localCheckpoint, for the corpus-wide tf: MEMORY_AND_DISK keeps
    // recomputable lineage and spills under pressure instead of
    // pinning executor-local checkpoint blocks — the honest posture
    // for a multi-TB corpus.
    val tf = toks.groupBy(col("__id"), col("__t"))
      .agg(count(lit(1)).as("__tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = tf.select(col("__id")).distinct()
      .agg(count(lit(1)).as("__n"))
    val dfreq = tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    val qterms = queries.select(col(qidCol).as("__qid"),
      explode(array_distinct(filter(split(lower(col(qtextCol)),
        "[^a-z]+"), t => t =!= ""))).as("__t"))
    val top = bm25TopK(docs, idCol, textCol, queries, qidCol, qtextCol,
        k = kDocs)
      .select(col(qidCol).as("__qid"), col(idCol).as("__id"))
    val cand = broadcast(top).join(tf, Seq("__id"))
      .groupBy(col("__qid"), col("__t")).agg(sum(col("__tf")).as("__stf"))
      .join(broadcast(qterms), Seq("__qid", "__t"), "left_anti")
    val weighted = cand.join(dfreq, Seq("__t"))
      .crossJoin(broadcast(stats))
      .withColumn("weight",
        round(col("__stf").cast("double") *
          log(col("__n").cast("double") / col("__df")), 4) + lit(0.0))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("weight").desc, col("__t"))
    weighted.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= mTerms)
      .select(col("__qid").as(qidCol), col("rank"),
        col("__t").as("term"), col("weight"))
  }

  /** TF-IDF keyword extraction: the k most distinctive terms of EVERY
    * document — `tf(t,d) · ln(N / df(t))`, the classic smoothing-free
    * form (df ≥ 1 always holds for a term being scored, so the ln is
    * defined; a term in every document scores exactly 0). A pipeline
    * uses the output as document descriptors: topic audit of a crawl,
    * cluster labeling after [[Dedup.semanticDedup]], targeted subset
    * pulls without an embedding model.
    *
    * Returns (idCol, rank int 1-based, term, score double rounded 4 dp).
    * Rounding happens BEFORE ranking with ties broken on the term, so
    * ranks are reproducible across engines and summation orders.
    * Documents with no tokens yield no rows (nothing to describe).
    *
    * Scale shape: tf is the word-count aggregate; df is vocab-sized and
    * joins the tf stream on the term (Zipf keeps it broadcastable —
    * UNLIKE [[bm25TopK]]'s df this one cannot be semi-joined down,
    * every term is scored); N rides a 1-row broadcast; top-k windows by
    * document with WindowGroupLimit pruning partial top-k map-side.
    * Nothing is O(corpus²). */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val toks = docs.select(col(idCol).as("__id"),
      explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= "")).as("__t"))
    val tf = toks.groupBy(col("__id"), col("__t"))
      .agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    val n = docs.select(col(idCol)).distinct()
      .agg(count(lit(1)).as("__n"))
    val scored = tf
      .join(dfreq, Seq("__t"))
      .crossJoin(broadcast(n))
      .select(col("__id"), col("__t"),
        round(col("__tf") * log(col("__n").cast("double") / col("__df")), 4)
          .as("score"))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("score").desc, col("__t"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__id").as(idCol), col("rank"), col("__t").as("term"),
        col("score"))
  }

  /** RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    * Extraction from Individual Documents"), corpus-level: candidate
    * phrases are maximal stopword-free word runs; each word scores
    * `degree/freq` where freq counts its phrase occurrences and degree
    * sums the lengths of the phrases it occurs in (co-occurrence
    * including self — the paper's deg(w)); a phrase scores the sum of
    * its member words' scores. Multi-word phrases whose members each
    * also appear alone outrank the singletons — RAKE's point.
    *
    * Determinism: word scores quantize to exact micro-units
    * (`(degree·10^6) div freq` — one integer division), phrase scores
    * are integer SUMS of those, and the top-k cut is total-ordered by
    * (score desc, phrase). No float summation anywhere. Returns
    * (phrase, n_occurrences long, score_micro long) — score_micro is
    * the phrase score in millionths — top `k` phrases.
    *
    * Scale shape: one corpus scan posexplodes to (doc, pos, word); the
    * phrase id is a per-DOC running stopword count (keyed window, never
    * global); phrase texts rebuild from bounded sort_array collects
    * (phrases are sentence fragments, not documents); word stats are
    * map-combinable counts over the member stream; the final cut is
    * TakeOrderedAndProject. Nothing is O(corpus²), nothing collects. */
  /** Ranking-quality metrics at cutoff `k` — the standard retrieval/
    * recommender eval triple over a scored candidate frame and a
    * relevance-judgment frame (Järvelin & Kekäläinen, TOIS 2002 for
    * nDCG; MRR and recall@k as in the TREC eval tradition):
    *
    *  - recall@k  = |relevant ∩ top-k| / |relevant|
    *  - MRR@k     = 1 / rank of the first relevant hit in the top k
    *                (0 when none)
    *  - nDCG@k    = DCG@k / IDCG@k with binary gains,
    *                DCG = Σ_{hits at rank i ≤ k} 1/log2(i+1)
    *
    * Ranks come from (score desc, doc asc) — the deterministic
    * total-order tiebreak every ranking operator here uses. The log2
    * discounts are pre-quantized driver-side to integer micro-units
    * (floor(1e9/log2(i+1)), k constants shipped as a literal array), so
    * the DCG sums are exact longs in any order and any engine — the
    * established cross-engine float discipline. Queries with no
    * relevant judgments are excluded (recall/nDCG are undefined there);
    * anti-join the output to find them.
    *
    * Returns per query: (queryCol, n_rel, hits_k, recall_k round(6),
    * mrr_k round(6), ndcg_k round(6)) ordered by query.
    *
    * Scale shape: one keyed window (rank within query, top-k filtered
    * immediately), one equi-join against the judgments, one
    * map-combinable aggregate, one broadcast-size join for n_rel —
    * no global sort, no driver collection. */
  def rankingMetrics(ranked: DataFrame, relevant: DataFrame,
                     queryCol: String, docCol: String, scoreCol: String,
                     k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1,1000], got $k")
    val discounts = (1 to k).map(i =>
      math.floor(1e9 / (math.log(i + 1.0) / math.log(2.0))).toLong)
    val prefix = discounts.scanLeft(0L)(_ + _).tail // IDCG@j in micro-units
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col(scoreCol).desc, col(docCol))
    val topk = ranked
      .select(col(queryCol), col(docCol), col(scoreCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
    val rels = relevant.select(col(queryCol), col(docCol))
      .distinct().withColumn("__rel", lit(1L))
    val nRel = rels.groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_rel"))
    val marked = topk.join(rels, Seq(queryCol, docCol), "left")
      .withColumn("__rel", coalesce(col("__rel"), lit(0L)))
      .withColumn("__disc",
        element_at(lit(discounts.toArray), col("__rk")))
    val agg = marked.groupBy(col(queryCol))
      .agg(sum(col("__rel")).as("hits_k"),
        sum(col("__rel") * col("__disc")).as("__dcg"),
        min(when(col("__rel") === 1L, col("__rk"))).as("__first"))
    agg.join(nRel, Seq(queryCol))
      .withColumn("__idcg",
        element_at(lit(prefix.toArray), least(col("n_rel"), lit(k.toLong))
          .cast("int")))
      .select(col(queryCol), col("n_rel"), col("hits_k"),
        (round(col("hits_k").cast("double") / col("n_rel").cast("double"),
          6) + lit(0.0)).as("recall_k"),
        (coalesce(round(lit(1.0) / col("__first").cast("double"), 6),
          lit(0.0)) + lit(0.0)).as("mrr_k"),
        (round(col("__dcg").cast("double") / col("__idcg").cast("double"),
          6) + lit(0.0)).as("ndcg_k"))
      .orderBy(col(queryCol))
  }

  /** Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * fuse any number of per-query rankings into one consensus list by
    * `RRF(d) = Σ_lists 1/(k0 + rank_list(d))` — the standard hybrid-
    * retrieval combiner (BM25 ∪ dense ANN) precisely because it needs
    * NO score calibration between lists, only ranks. A document missing
    * from a list simply contributes nothing.
    *
    * Exactness device: each list's weight is the INTEGER division
    * `1e9 div (k0 + rank)` — no floats anywhere until the cosmetic
    * final `score = rrf_nano/1e9` — so per-document sums are order-free
    * exact and the (rrf_nano desc, id) top-k cut is total-ordered and
    * engine-identical.
    *
    * Returns per query the fused top `k`: (query_id, rank 1..k, id,
    * n_lists long — how many input lists carried the doc, rrf_nano
    * long, score double exact). Scale shape: a map-only union of the
    * (already small, top-k-sized) ranked lists, one keyed aggregate,
    * one per-query WindowGroupLimit-able window — nothing corpus-sized
    * anywhere.
    *
    * Input hygiene (hard errors, not silence): a rank < 1 raises — with
    * k0 = 0 a rank-0 row would divide by zero into a NULL weight that
    * sum() silently drops, corrupting the fused score without any
    * signal. A (query, id) duplicated WITHIN one list collapses to its
    * best (smallest) rank so it can't inflate n_lists or double-count
    * its weight. */
  def reciprocalRankFusion(rankings: Seq[DataFrame], queryCol: String,
                           idCol: String, rankCol: String, k: Int,
                           k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k >= 1, s"k must be >= 1, got $k")
    require(k0 >= 0, s"k0 must be >= 0, got $k0")
    def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("div", a, b)
    val all = rankings.zipWithIndex
      .map { case (df, i) =>
        df.select(col(queryCol).as("query_id"), col(idCol).as("id"),
          col(rankCol).cast("long").as("__r"), lit(i).as("__list"))
      }
      .reduce(_.unionByName(_))
      .select(col("query_id"), col("id"), col("__list"),
        when(col("__r") >= 1L, col("__r")).otherwise(raise_error(concat(
          lit("reciprocalRankFusion: ranks must be >= 1, got "),
          col("__r").cast("string")))).as("__r"))
    val perList = all
      .groupBy(col("query_id"), col("id"), col("__list"))
      .agg(min(col("__r")).as("__r"))
    val agg = perList
      .select(col("query_id"), col("id"),
        idiv(lit(1000000000L), lit(k0.toLong) + col("__r")).as("__s"))
      .groupBy(col("query_id"), col("id"))
      .agg(count(lit(1)).as("n_lists"), sum(col("__s")).as("rrf_nano"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_nano").desc, col("id").asc)
    agg.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("n_lists"),
        col("rrf_nano"),
        (col("rrf_nano").cast("double") / lit(1e9)).as("score"))
  }

  /** Rank-biased overlap at depth k (Webber, Moffat & Zobel, TOIS 2010
    * — "A similarity measure for indefinite rankings"): how much two
    * per-query rankings agree, weighted toward the top —
    * `RBO@k = (1−p)·Σ_{d=1..k} (X_d/d)·p^{d−1}` with `X_d` the overlap
    * of the two depth-d prefixes. THE standard number for "how closely
    * does the approximate ranker track the exact one" (brute vs IVF vs
    * HNSW), where plain set overlap ignores order and Kendall's τ
    * overweights the tail.
    *
    * Exactness device: an item ranked (a, b) by the two lists enters
    * every prefix pair from depth `max(a,b)` on, so its total
    * contribution is the CLOSED weight `(1−p)·Σ_{d=max(a,b)}^{k}
    * p^{d−1}/d` — precomputed driver-side for the k possible depths,
    * quantized to nano-units ONCE, and looked up per item from a
    * broadcast literal array. Per-query RBO is then an exact integer
    * SUM of nano-weights: no float accumulation, total-ordered,
    * engine-replayable (the oracle inlines the same k literals).
    *
    * Returns one row per query of `a`: (query_id, overlap_k long —
    * |top-k(a) ∩ top-k(b)|, rbo double = nano-sum/1e9 exact). Queries
    * absent from `b` report (0, 0.0). Scale shape: two rank filters,
    * one keyed equi-join on (query, id), one map-combinable sum —
    * the frames are top-k-sized, nothing corpus-shaped. */
  def rankBiasedOverlap(a: DataFrame, b: DataFrame, queryCol: String,
                        idCol: String, rankCol: String, k: Int,
                        p: Double = 0.9): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1,1000], got $k")
    require(p > 0 && p < 1, s"p must be in (0,1), got $p")
    val wNano = rboWeightsNano(k, p)
    def side(df: DataFrame, as: String) = df
      .select(col(queryCol).as("query_id"), col(idCol).as("id"),
        col(rankCol).cast("int").as(as))
      .filter(col(as) >= 1 && col(as) <= k)
    val joined = side(a, "__ra").join(side(b, "__rb"), Seq("query_id", "id"))
      .select(col("query_id"),
        element_at(lit(wNano), greatest(col("__ra"), col("__rb")))
          .as("__w"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("overlap_k"), sum(col("__w")).as("__s"))
    a.select(col(queryCol).as("query_id")).distinct()
      .join(joined, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("overlap_k"), lit(0L)).as("overlap_k"),
        (coalesce(col("__s"), lit(0L)).cast("double") / lit(1e9))
          .as("rbo"))
  }

  /** The k closed per-depth RBO weights in nano-units:
    * `wNano(m) = floor(1e9·(1−p)·Σ_{d=m}^{k} p^{d−1}/d)` — shared with
    * the SQL oracle, which inlines these exact literals. */
  def rboWeightsNano(k: Int, p: Double): Array[Long] =
    Array.tabulate(k) { i =>
      val m = i + 1
      var s = 0.0
      var d = m
      while (d <= k) { s += math.pow(p, d - 1.0) / d; d += 1 }
      math.floor(1e9 * (1 - p) * s).toLong
    }

  def rakeKeywords(docs: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String], k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val stops = stopwords.map(_.toLowerCase).toSet
    val words = docs.select(col(idCol).as("__id"),
        posexplode(filter(split(lower(col(textCol)), "[^a-z]+"),
          t => t =!= "")).as(Seq("__pos", "__w")))
      .withColumn("__stop", col("__w").isInCollection(stops))
    val w = Window.partitionBy(col("__id")).orderBy(col("__pos"))
    val withPhrase = words
      .withColumn("__ph", sum(col("__stop").cast("long")).over(w))
      .filter(!col("__stop"))
    // one row per phrase OCCURRENCE: its text and length
    val occurrences = withPhrase
      .groupBy(col("__id"), col("__ph"))
      .agg(array_join(transform(
          sort_array(collect_list(struct(col("__pos"), col("__w")))),
          s => s.getField("__w")), " ").as("phrase"),
        count(lit(1)).as("__len"))
    // member stream: every (word, phrase length) occurrence
    val members = withPhrase
      .join(occurrences.select(col("__id"), col("__ph"), col("__len")),
        Seq("__id", "__ph"))
      .select(col("__w"), col("__len"))
    val wordScores = members.groupBy(col("__w"))
      .agg(count(lit(1)).as("__freq"), sum(col("__len")).as("__deg"))
      .select(col("__w"),
        call_function("div", col("__deg") * lit(1000000L), col("__freq"))
          .as("__ws"))
    // score each DISTINCT phrase once: re-explode its words, sum scores
    val distinctPhrases = occurrences.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"))
    val phraseScores = distinctPhrases
      .select(col("phrase"), col("n_occurrences"),
        explode(split(col("phrase"), " ")).as("__w"))
      .join(wordScores, Seq("__w"))
      .groupBy(col("phrase"), col("n_occurrences"))
      .agg(sum(col("__ws")).as("score_micro"))
    phraseScores
      .orderBy(col("score_micro").desc, col("phrase"))
      .limit(k)
  }

  /** Kendall τ-b rank correlation between two per-query rankings
    * (Kendall 1938; the τ-b tie correction) — the pairwise-agreement
    * companion to [[rankBiasedOverlap]]: RBO weights the HEAD of the
    * lists, τ-b counts every discordant swap equally, which is the
    * right meter for "how faithfully does the quantized/approximate
    * ranking preserve the exact ordering" (sq8 vs brute, IVF vs flat).
    * Computed over the items present in BOTH lists for a query;
    * C/D/tie counts are EXACT integers from sign products, and
    * `τ = (C−D)/√((n₀−T_a)(n₀−T_b))` is two exact-integer products, one
    * IEEE sqrt and one division, round(6) — identical in any engine.
    * Queries with no comparable pair (n < 2 shared items, or all tied)
    * report τ = 0 with their counts.
    *
    * Returns (query_id, n_items, n_pairs, concordant, discordant,
    * ties_a, ties_b, tau). Scale shape: one keyed equi-join of the two
    * lists + a per-query pair self-join — |Q|·k² rows for top-k lists,
    * the [[rankingMetrics]] family's bounded-frame discipline; corpus
    * size never appears. */
  def kendallTauB(a: DataFrame, b: DataFrame, queryCol: String,
                  idCol: String, rankCol: String): DataFrame = {
    val l = a.select(col(queryCol).as("query_id"), col(idCol).as("id"),
      col(rankCol).cast("long").as("__ra"))
    val r = b.select(col(queryCol).as("query_id"), col(idCol).as("id"),
      col(rankCol).cast("long").as("__rb"))
    val m = l.join(r, Seq("query_id", "id"))
    val pairs = m.as("x").join(m.as("y"),
        col("x.query_id") === col("y.query_id") &&
          col("x.id") < col("y.id"))
      .select(col("x.query_id").as("query_id"),
        signum(col("x.__ra") - col("y.__ra")).cast("long").as("__da"),
        signum(col("x.__rb") - col("y.__rb")).cast("long").as("__db"))
    val counts = pairs.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("__da") * col("__db") === 1L).cast("long"))
          .as("concordant"),
        sum((col("__da") * col("__db") === -1L).cast("long"))
          .as("discordant"),
        sum((col("__da") === 0L).cast("long")).as("ties_a"),
        sum((col("__db") === 0L).cast("long")).as("ties_b"))
    val nItems = m.groupBy(col("query_id")).agg(count(lit(1)).as("n_items"))
    val den = sqrt(((col("n_pairs") - col("ties_a")) *
      (col("n_pairs") - col("ties_b"))).cast("double"))
    nItems.join(counts, Seq("query_id"), "left")
      .select(col("query_id"), col("n_items"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("concordant"), lit(0L)).as("concordant"),
        coalesce(col("discordant"), lit(0L)).as("discordant"),
        coalesce(col("ties_a"), lit(0L)).as("ties_a"),
        coalesce(col("ties_b"), lit(0L)).as("ties_b"))
      .withColumn("tau",
        coalesce(when(den > 0.0,
            round((col("concordant") - col("discordant")).cast("double") /
              den, 6) + lit(0.0)),
          lit(0.0)))
  }

  /** Maximal Marginal Relevance diversified top-k (Carbonell &
    * Goldstein, SIGIR 1998): greedily select `k` results from a
    * relevance pool of `poolK`, each step maximizing
    * `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)` — the re-ranker that
    * keeps a near-duplicate-heavy corpus from returning k copies of the
    * same document. λ = `lamNum`/`lamDen` rational, and both rel and sim
    * are EXACT integer dot products of micro-floor-quantized vectors
    * (the [[Similarity.sq8TopK]] grid), so the reported
    * `score = lamNum·rel − (lamDen−lamNum)·maxsim` and every selection
    * is bit-reproducible in any engine; ties break on the smaller id.
    * Step 1 has an empty selected set — its score is `lamNum·rel`.
    *
    * Returns (query_id long, rank int 1..k, id long, rel long, score
    * long) — ids must be integral (they cast to long for the typed
    * greedy stage).
    *
    * Scale shape: pass 1 is the brute-pool discipline — broadcast(query
    * codes) cross the corpus scan, WindowGroupLimit-pruned to poolK per
    * query (swap in any ANN pool upstream; the greedy stage only needs
    * (id, rel, vector) rows). The greedy stage is ONE groupByKey
    * shuffle of the |Q|·poolK pool rows; the k selection steps run
    * locally per query group (O(k·poolK·d) integer ops, state bounded
    * by poolK) — corpus size never appears again, and queries
    * distribute across executors. */
  def mmrDiversify(corpus: DataFrame, queries: DataFrame,
                   idCol: String, vecCol: String,
                   poolK: Int, k: Int,
                   lamNum: Long = 1L, lamDen: Long = 2L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(poolK >= k, s"poolK ($poolK) must cover k ($k)")
    require(lamDen >= 1L && lamNum >= 0L && lamNum <= lamDen,
      s"need 0 <= lamNum <= lamDen, got $lamNum/$lamDen")
    def micro(c: org.apache.spark.sql.Column) = transform(c,
      x => floor(x.cast("double") * lit(1000000.0)).cast("long"))
    def doti(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val c = corpus.select(col(idCol).as("id"), micro(col(vecCol)).as("m"))
    val q = queries.select(col(idCol).as("query_id"),
      micro(col(vecCol)).as("qm"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("id").asc)
    val pool = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"), doti(col("qm"), col("m")).as("rel"),
        col("m"))
      .withColumn("__r", row_number().over(pw))
      .filter(col("__r") <= poolK).drop("__r")
    // greedy stage: ONE shuffle groups each query's ≤ poolK pool rows,
    // then the k selection steps run LOCALLY per group (O(k·poolK·d)
    // integer ops — ~100k per query). The iterative-join formulation
    // (k rounds × join+window) pays ~4 shuffle stage barriers per step
    // for frames of a few hundred rows; grouping once is both the
    // faster and the 100 TB shape — queries distribute, the per-query
    // state is bounded by poolK.
    val spark = corpus.sparkSession
    import spark.implicits._
    val mu = lamDen - lamNum
    val kk = k
    pool.select(col("query_id").cast("long"), col("id").cast("long"),
        col("rel"), col("m"))
      .as[(Long, Long, Long, Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Long, Seq[Long])]) =>
        val rows = it.toArray
        val n = rows.length
        val vecs = rows.map(_._4.toArray)
        val taken = new Array[Boolean](n)
        val maxSim = new Array[Long](n)
        val out = Seq.newBuilder[(Long, Int, Long, Long, Long)]
        var rank = 1
        while (rank <= math.min(kk, n)) {
          var best = -1
          var bestScore = 0L
          var i = 0
          while (i < n) {
            if (!taken(i)) {
              val ms = if (rank == 1) 0L else maxSim(i)
              val score = lamNum * rows(i)._3 - mu * ms
              if (best == -1 || score > bestScore ||
                  (score == bestScore && rows(i)._2 < rows(best)._2)) {
                best = i; bestScore = score
              }
            }
            i += 1
          }
          out += ((qid, rank, rows(best)._2, rows(best)._3, bestScore))
          taken(best) = true
          val bv = vecs(best)
          var j = 0
          while (j < n) {
            if (!taken(j)) {
              var d = 0
              var dot = 0L
              val vj = vecs(j)
              while (d < bv.length) { dot += bv(d) * vj(d); d += 1 }
              if (rank == 1 || dot > maxSim(j)) maxSim(j) = dot
            }
            j += 1
          }
          rank += 1
        }
        out.result()
      }
      .toDF("query_id", "rank", "id", "rel", "score")
  }
}
