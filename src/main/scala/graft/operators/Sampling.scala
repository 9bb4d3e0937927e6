package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for dataset curation.
  *
  * The keep/drop decision is a pure-arithmetic multiplicative hash of an
  * integer key (Knuth's 2654435761, i.e. floor(2^32/phi)), so:
  *  - the SAME rows are selected on every run and every engine — unlike
  *    `df.sample`, whose partition-seeded RNG changes with partitioning;
  *  - selection is reproducible from the key alone (re-runs of an
  *    incremental pipeline keep/drop consistently);
  *  - an external SQL engine can verify the sample exactly;
  *  - nested samples: fraction f1 < f2 implies sample(f1) ⊆ sample(f2).
  *
  * Scale: map-only — no shuffle, plain codegen'd arithmetic on a long.
  */
object Sampling {

  private val Knuth = 2654435761L // floor(2^32 / golden ratio), odd
  private val M32 = 4294967296L // 2^32

  /** `(key mod 2^31) * 2654435761 mod 2^32`, uniform on [0, 2^32).
    * The key is folded to 31 bits first so the product stays below 2^63
    * (no silent long overflow here, and the same expression stays exact
    * in engines where BIGINT overflow is an error).
    *
    * COMPOSITION WARNING: this hash is AFFINE — `knuthHash32(x + s)`
    * equals `knuthHash32(x) + s·K (mod 2^32)`, so salting the input
    * does NOT decorrelate it, and two independent DECISIONS keyed on
    * the same column (a sample-keep threshold and a split band, a fold
    * assignment and a shard) are PERFECTLY correlated: the sample keeps
    * exactly the ids whose hash is small, which a downstream split then
    * sends 100% to its first band (observed live: every
    * temperature-sampled doc landed in 'train'). When composing two
    * hash decisions on one key, re-key one of them with
    * [[surrogateKey]]. */
  def knuthHash32(key: Column): Column =
    pmod(pmod(key.cast("long"), lit(M32 / 2)) * lit(Knuth), lit(M32))

  /** A salted md5-derived numeric surrogate for `key` — the
    * decorrelation device for composing two hash decisions on the same
    * column (see the [[knuthHash32]] composition warning): uniform on
    * [0, 1e9), deterministic, engine-replayable as
    * `CAST('0x' || substr(md5(salt || '#' || key), 1, 15) AS BIGINT)
    * % 1000000000`. Distinct salts give independent surrogates. */
  def surrogateKey(key: Column, salt: String): Column = {
    require(salt.nonEmpty, "surrogateKey needs a non-empty salt")
    pmod(conv(substring(
      md5(concat_ws("#", lit(salt), key.cast("string"))), 1, 15),
      16, 10).cast("long"), lit(1000000000L))
  }

  /** Every operator hashing a key column must reject non-numeric keys
    * LOUDLY: knuthHash32 casts to long, so a string key hashes to NULL
    * for every row — a silently empty sample, a key-ordered "shuffle", a
    * voided split. String keys: pre-hash with xxhash64 into a numeric
    * column. */
  private def requireNumericKey(df: DataFrame, keyCol: String, op: String): Unit =
    require(df.schema(keyCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$op needs a numeric key column; '$keyCol' is " +
        s"${df.schema(keyCol).dataType.simpleString} — pre-hash string keys " +
        "with xxhash64 into a numeric column first")

  private def threshold(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    (fraction * M32).toLong
  }

  /** Keep ~`fraction` of rows, chosen deterministically by `keyCol`. */
  def sampleByKey(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    requireNumericKey(df, keyCol, "sampleByKey")
    df.filter(knuthHash32(col(keyCol)) < lit(threshold(fraction)))
  }

  /** Per-stratum fractions; strata not listed get `default`. One codegen'd
    * CASE on the stratum column — no join, no shuffle. */
  def stratifiedSampleByKey(df: DataFrame, keyCol: String, strataCol: String,
                            fractions: Map[String, Double],
                            default: Double = 0.0): DataFrame = {
    requireNumericKey(df, keyCol, "stratifiedSampleByKey")
    val thr = fractions.toSeq.sortBy(_._1).foldLeft(lit(threshold(default))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(threshold(f))).otherwise(acc)
    }
    df.filter(knuthHash32(col(keyCol)) < thr)
  }

  /** Deterministic train/val/test assignment: label each row by which
    * cumulative hash band its key falls in — `splitByHash(df, "doc_id",
    * Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))`. Map-only (one
    * codegen'd CASE, no shuffle, no RNG state), and STABLE under corpus
    * growth: a key's split never changes when rows are added, which is
    * what keeps eval sets uncontaminated across ingestion runs — the
    * property `randomSplit` cannot give you. Weights summing below 1
    * leave the remainder `NULL` (an explicit holdout). */
  def splitByHash(df: DataFrame, keyCol: String,
                  weights: Seq[(String, Double)],
                  outCol: String = "split"): DataFrame = {
    requireNumericKey(df, keyCol, "splitByHash")
    require(weights.nonEmpty, "splitByHash needs at least one split")
    require(weights.forall(_._2 > 0), "split weights must be positive")
    require(weights.map(_._2).sum <= 1.0 + 1e-9,
      s"split weights must sum to <= 1, got ${weights.map(_._2).sum}")
    require(weights.map(_._1).distinct.size == weights.size,
      "split names must be unique")
    val h = knuthHash32(col(keyCol))
    val cum = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val expr = weights.zip(cum).foldRight(lit(null).cast("string")) {
      case (((name, _), cumW), acc) =>
        when(h < lit(threshold(math.min(cumW, 1.0))), name).otherwise(acc)
    }
    df.withColumn(outCol, expr)
  }

  /** Temperature-scaled source mixing — the multilingual/multi-corpus
    * rebalancing rule (Brown et al. 2020 §2.2 sample corpora
    * non-proportionally; Conneau & Lample 2019 eq. 3 give the
    * temperature form): source i receives share n_i^tau / Σ_j n_j^tau of
    * a `budgetDocs` document budget. tau = 1 is proportional sampling,
    * tau = 0 an equal share per source, tau in between flattens the
    * head's dominance and upweights small sources. Shares are capped at
    * a source's actual size (frac ≤ 1 — no replication here; repeat the
    * call's output if an epoch needs oversampling).
    *
    * Selection is [[sampleByKey]]-style (Knuth hash threshold per
    * source), so it is deterministic across re-runs, and a kept doc
    * stays kept when OTHER sources grow (its own source growing changes
    * n_i, hence the threshold — shares are corpus statistics, unlike
    * [[splitByHash]] bands).
    *
    * Fully declarative at any scale: per-source counts are one
    * map-combinable aggregate (|sources| rows), the normalizer is a
    * 1-row aggregate over THAT, both ride broadcast joins back onto the
    * stream, and the keep decision is a codegen'd hash compare — no
    * driver-side collect, nothing proportional to the corpus beyond the
    * one scan. */
  def temperatureSampleBySource(df: DataFrame, keyCol: String,
                                sourceCol: String, tau: Double,
                                budgetDocs: Long): DataFrame = {
    requireNumericKey(df, keyCol, "temperatureSampleBySource")
    require(tau >= 0.0 && tau <= 1.0, s"tau must be in [0,1], got $tau")
    require(budgetDocs > 0, "budgetDocs must be positive")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
    val z = counts.agg(sum(pow(col("__n"), lit(tau))).as("__z"))
    val thr = counts.crossJoin(broadcast(z))
      .withColumn("__frac", least(lit(1.0),
        lit(budgetDocs.toDouble) * pow(col("__n"), lit(tau)) / col("__z")
          / col("__n")))
      // floor to an exact integer threshold so the boundary compare is
      // int-vs-int (cross-engine reproducible modulo 1-ulp pow drift)
      .select(col(sourceCol), floor(col("__frac") * lit(M32.toDouble))
        .cast("long").as("__thr"))
    df.join(broadcast(thr), Seq(sourceCol))
      .filter(knuthHash32(col(keyCol)) < col("__thr"))
      .select(df.columns.map(col): _*)
  }

  /** Leakage-guarded train/val/test split: [[splitByHash]] keyed on the
    * near-duplicate CLUSTER representative instead of the raw id, so two
    * documents connected by a duplicate pair can never straddle a split
    * boundary — the eval-contamination failure mode of per-doc
    * splitting, where a training document's near-copy lands in test and
    * the model is graded on memorization. `pairs` is any duplicate-pair
    * frame this library produces (MinHash / SimHash / n-gram /
    * embedding-cosine / semantic); paired docs split by the min id of
    * their connected component, unpaired docs by their own id.
    *
    * Stability contract: deterministic across re-runs, and a doc's split
    * changes ONLY when new pairs merge its cluster with another — which
    * is exactly when re-splitting is required for the guarantee to keep
    * holding (the alternative, freezing the old assignment, IS the leak).
    *
    * Scale shape: components run on the pair graph only (tiny next to
    * the corpus — see [[Dedup.connectedComponents]]'s iteration bound);
    * the label join is keyed on the id and the band assignment is the
    * same map-only codegen'd CASE as [[splitByHash]]. Unpaired docs —
    * the overwhelming majority — never enter the component loop. */
  def leakFreeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                    weights: Seq[(String, Double)],
                    pairCol1: String = "id1", pairCol2: String = "id2",
                    outCol: String = "split",
                    checkpointDir: Option[String] = None): DataFrame = {
    requireNumericKey(df, idCol, "leakFreeSplit")
    val comps = Dedup.connectedComponents(pairs, pairCol1, pairCol2,
      checkpointDir = checkpointDir)
    val keyed = df.join(comps, df(idCol) === comps("id"), "left")
      .withColumn("__skey", coalesce(col("comp"), col(idCol).cast("long")))
      .drop("id", "comp")
    splitByHash(keyed, "__skey", weights, outCol).drop("__skey")
  }

  /** Token-budget corpus mixing — the data-mixture step of a training
    * run: each source contributes documents, in a deterministic
    * pseudo-random order (Knuth hash of `tieBreak`), until its share of
    * the global token budget (`budget · weights(source)`) is reached;
    * sources not in `weights` contribute nothing. One hash shuffle on
    * the source column + a running-sum window per source — the same
    * shape as any per-key cumulative cut. Selection is deterministic
    * across re-runs but NOT stable under corpus growth (new docs insert
    * into the hash order and can displace later ones) — mixing decides a
    * training run's diet, it is not a split ([[splitByHash]] is).
    *
    * The per-source window scans the full source in one task; for a
    * single source holding a large corpus share, pre-trim with
    * [[sampleByKey]] to ~the budget first (the same hot-key argument as
    * [[capPerKeySkewAware]], which cannot apply here because a
    * cumulative SUM, unlike a top-k rank, has no per-cell decomposition). */
  def mixByTokenBudget(df: DataFrame, sourceCol: String, tokensCol: String,
                       weights: Map[String, Double], budget: Long,
                       tieBreak: String): DataFrame = {
    requireNumericKey(df, tieBreak, "mixByTokenBudget(tieBreak)")
    require(budget > 0, "budget must be positive")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    require(weights.values.sum <= 1.0 + 1e-9,
      s"weights must sum to <= 1, got ${weights.values.sum}")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(knuthHash32(col(tieBreak)), col(tieBreak))
    val cap = weights.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (src, frac)) =>
        when(col(sourceCol) === src, lit(budget * frac)).otherwise(acc)
    }
    df.withColumn("__mix_cum", sum(col(tokensCol)).over(w))
      .filter(col("__mix_cum") <= cap)
      .drop("__mix_cum")
  }

  /** Deterministic k-fold assignment: fold = knuthHash(key) mod k —
    * every row gets a stable fold in [0, k), so cross-validation and
    * sharded evaluation reproduce across runs and engines, and a row's
    * fold never changes as the corpus grows (same hash-stability
    * argument as [[splitByHash]]). Map-only; NULL/non-numeric keys
    * rejected loudly by the shared key guard. */
  def kFold(df: DataFrame, keyCol: String, k: Int,
            out: String = "fold"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    requireNumericKey(df, keyCol, "kFold")
    df.withColumn(out, pmod(knuthHash32(col(keyCol)), lit(k)).cast("int"))
  }

  /** Leakage-safe TEMPORAL holdout: rows strictly before
    * `cutoff − embargo` train, rows at or after `cutoff` test, and the
    * embargo band between them is DROPPED — the purge window that keeps
    * slow-moving signals (a document revised hours before the cutoff, a
    * user session straddling it) from leaking test-period information
    * into training. The time-series counterpart of [[splitByHash]]:
    * hash splits assume exchangeable rows; temporal data is not
    * exchangeable, and hashing it leaks by construction. Map-only
    * column compare; returns the input plus `split` ∈
    * {'train','test'} with embargoed rows absent. */
  def temporalSplit(df: DataFrame, tsCol: String,
                    cutoff: java.sql.Timestamp,
                    embargoSeconds: Long = 0L,
                    out: String = "split"): DataFrame = {
    require(embargoSeconds >= 0, "embargo must be >= 0")
    val cutoffExpr = lit(cutoff).cast("timestamp")
    val trainEnd = (cutoffExpr.cast("double") - embargoSeconds)
      .cast("timestamp")
    df.withColumn(out,
        when(col(tsCol) < trainEnd, lit("train"))
          .when(col(tsCol) >= cutoffExpr, lit("test"))
          .otherwise(lit(null).cast("string")))
      .filter(col(out).isNotNull)
  }

  /** Systematic probability-proportional-to-size sampling: lay the rows
    * out in the deterministic total order of `sortCols`, accumulate the
    * integer `weightCol` (token counts, byte sizes), and keep every row
    * whose weight span crosses a multiple of `stride` — inclusion
    * probability ≈ weight/stride, expected sample weight = total/stride,
    * and a row with weight ≥ stride is ALWAYS kept (the classic PPS
    * guarantee). All arithmetic is integer, so the selection replays
    * bit-identically in any engine — no `pow(u, 1/w)` key whose last-ulp
    * libm differences could flip a rank (the reason this is the
    * exponential-keys method's engine-portable sibling).
    *
    * Scale shape: rides [[Ranking.globalRunningSum]] — one
    * range-partitioned sort + per-partition offsets broadcast, then the
    * crossing test is a map-only integer compare. NULL weights count 0
    * (never sampled, never shift the lattice). */
  def systematicSampleByWeight(df: DataFrame,
                               sortCols: Seq[org.apache.spark.sql.Column],
                               weightCol: String,
                               stride: Long): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    Ranking.globalRunningSum(df, sortCols, weightCol, out = "__pps_run")
      .filter(call_function("div", col("__pps_run"), lit(stride)) >
        call_function("div",
          col("__pps_run") - coalesce(col(weightCol).cast("long"), lit(0L)),
          lit(stride)))
      .drop("__pps_run")
  }

  /** Deterministic global shuffle for training order: sort by the Knuth
    * hash of the key (ties by key). The hash is map-only; the sort is one
    * range-partitioned exchange, identical on re-runs — no RNG state, so
    * a resumed job re-derives the same permutation. Writers preserve the
    * sorted partition order on disk. */
  def shuffled(df: DataFrame, keyCol: String): DataFrame = {
    requireNumericKey(df, keyCol, "shuffled")
    df.orderBy(knuthHash32(col(keyCol)), col(keyCol))
  }

  /** Per-key quota: keep at most `maxPerKey` rows per key group — the
    * per-domain cap every web-corpus curation run applies (a handful of
    * hosts otherwise dominate the corpus). Which rows survive is
    * deterministic: the group's rows rank by `orderBy` descending
    * ("best first" — e.g. a quality score) with `tieBreak` ascending as
    * the total tiebreaker, and rank > maxPerKey is dropped.
    *
    * Scale: one hash shuffle on the key columns + a rank inside each
    * group — the same shape as any windowed top-k. A key hot enough to
    * straggle here is exactly the key the cap exists to cut, but the
    * FULL group still sorts in one task before the cap applies; for a
    * pathological host (>~10^8 rows in one group) pre-trim with
    * `sampleByKey` on a per-row id first, then cap exactly. */
  def capPerKey(df: DataFrame, keyCols: Seq[String], maxPerKey: Int,
                orderBy: String, tieBreak: String): DataFrame = {
    require(maxPerKey > 0, "maxPerKey must be positive")
    require(keyCols.nonEmpty, "capPerKey needs at least one key column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderBy).desc_nulls_last, col(tieBreak).asc)
    df.withColumn("__cap_rank", row_number().over(w))
      .filter(col("__cap_rank") <= maxPerKey)
      .drop("__cap_rank")
  }

  /** [[capPerKey]] for skewed key distributions with LARGE caps —
    * result-identical (given a unique `tieBreak`, the same requirement
    * the plain path has), but no single task ever holds a hot key's
    * full group.
    *
    * When it matters: for caps under
    * `spark.sql.optimizer.windowGroupLimitThreshold` (default 1000)
    * Spark's own InferWindowGroupLimit already trims each map partition
    * to the top `maxPerKey` per key BEFORE the shuffle, so the plain
    * window is skew-safe (plan-asserted in SamplingSpec). Production
    * per-domain caps are often larger than that threshold — keep the
    * best 10k docs per domain — and above it the rule does not fire:
    * the hot domain's ENTIRE group (30% of a crawl, for a 30% domain)
    * then shuffles into ONE window task. This variant restores the
    * bound:
    *
    *  1. a pre-aggregated count finds the keys OVER the cap (map-side
    *     combinable; the over-cap key set is the Zipf head the cap
    *     exists to cut, so it broadcasts);
    *  2. rows of under-cap keys bypass ranking entirely via a broadcast
    *     anti-join (map-only): every one of their rows survives by
    *     definition — for a crawl corpus, the vast majority of rows
    *     never shuffle at all;
    *  3. over-cap rows run a salted two-phase top-k: rank within
    *     (key, salt-of-tieBreak) cells keeping `maxPerKey` per cell —
    *     any global top-`maxPerKey` row is in its cell's top-`maxPerKey`
    *     — then rank the ≤ salt·maxPerKey survivors per key exactly.
    *
    * Worst-task load drops from the hot group's full size to
    * ~max(group/salt, salt·maxPerKey). Use plain [[capPerKey]] when the
    * cap is inside the group-limit threshold — this variant costs one
    * extra count aggregation and a second (tiny) window. */
  def capPerKeySkewAware(df: DataFrame, keyCols: Seq[String], maxPerKey: Int,
                         orderBy: String, tieBreak: String,
                         salt: Int = 16): DataFrame = {
    require(maxPerKey > 0, "maxPerKey must be positive")
    require(keyCols.nonEmpty, "capPerKey needs at least one key column")
    require(salt > 1, "salt must exceed 1 or the pre-rank is the plain path")
    // null-SAFE key matching throughout: groupBy puts all null-key rows
    // in one group, and if that group exceeds the cap it must route to
    // the capped path — a plain equi-join would never match the null key,
    // silently exempting every null-key row from the cap (the window in
    // [[capPerKey]] partitions nulls together, so the two paths would
    // diverge exactly on the skewed-junk rows most likely to be null)
    val overKeys = broadcast(df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxPerKey).drop("__n")
      .withColumnsRenamed(keyCols.map(k => k -> s"__ok_$k").toMap))
    val matchCond = keyCols
      .map(k => col(k) <=> col(s"__ok_$k")).reduce(_ && _)
    val under = df.join(overKeys, matchCond, "left_anti")
    val overRows = df.join(overKeys, matchCond, "left_semi")
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy((keyCols.map(col) :+ col("__cap_salt")): _*)
      .orderBy(col(orderBy).desc_nulls_last, col(tieBreak).asc)
    val partial = overRows
      .withColumn("__cap_salt", pmod(xxhash64(col(tieBreak)), lit(salt)))
      .withColumn("__cap_r1", row_number().over(w1))
      .filter(col("__cap_r1") <= maxPerKey)
      .drop("__cap_salt", "__cap_r1")
    capPerKey(partial, keyCols, maxPerKey, orderBy, tieBreak)
      .unionByName(under)
  }

  /** Deterministic epoch replication — the oversampling half of a data
    * recipe (the Llama/GPT mixture tables quote "epochs" per source:
    * high-quality sources repeat >1×, bulk web <1×), complementing
    * [[temperatureSampleBySource]], which only downsamples (share
    * capped at 1). A source with `epochs(s) = e` emits floor(e) full
    * copies of every document plus one extra copy for the
    * deterministically-hashed `frac(e)` slice — so expected copies = e
    * exactly, and WHICH docs get the extra epoch is a stable function of
    * the key (re-runs and incremental rebuilds agree). Sources absent
    * from `epochs` default to 1.0 (pass through unchanged).
    *
    * Output: the input columns plus `epoch` (int, 0-based copy index) —
    * interleave-ready for a training shuffle downstream. e < 1 drops
    * the unlucky slice entirely (0 copies), which makes this a strict
    * superset of fractional sampling.
    *
    * Scale shape: the epochs table is |sources| rows broadcast onto the
    * stream; copy count is a codegen'd hash compare; replication is one
    * map-side posexplode of a sequence — no shuffle at all, output size
    * is exactly the token budget the recipe asked for. */
  def epochReplicate(df: DataFrame, keyCol: String, sourceCol: String,
                     epochs: Map[String, Double],
                     epochCol: String = "epoch"): DataFrame = {
    requireNumericKey(df, keyCol, "epochReplicate")
    require(epochs.values.forall(e => e >= 0.0 && e < 100.0),
      "epochs must be in [0, 100) — triple-digit replication is a typo")
    val spark = df.sparkSession
    import spark.implicits._
    val plan = epochs.toSeq.map { case (s, e) =>
      (s, math.floor(e).toLong, threshold(e - math.floor(e)))
    }.toDF(sourceCol, "__whole", "__thr")
    val joined = df.join(broadcast(plan), Seq(sourceCol), "left")
      .withColumn("__n",
        coalesce(col("__whole"), lit(1L)) +
          when(knuthHash32(col(keyCol)) < coalesce(col("__thr"), lit(0L)),
            lit(1L)).otherwise(lit(0L)))
    joined.filter(col("__n") > 0)
      .withColumn(epochCol,
        explode(expr("sequence(0, int(__n) - 1)")))
      .drop("__whole", "__thr", "__n")
      .select((df.columns.map(col) :+ col(epochCol)): _*)
  }

  /** DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169
    * "Data Selection for Language Models via Importance Resampling"):
    * score every document by the mean per-token log-likelihood ratio
    * ln(p_target(w) / p_raw(w)) between a target subset (`targetPred`,
    * e.g. a trusted high-quality slice) and the raw corpus — the signal
    * DSIR resamples on to tilt a web-scale corpus toward a target
    * domain. The paper hashes n-grams into buckets; with exact
    * distributed counting available there is no need to hash — the
    * unigram tables ARE the feature distributions (hashing exists to fit
    * one machine). Both distributions use add-1 smoothing over the raw
    * vocabulary (target tokens are a subset of raw tokens by
    * construction, so V covers every scored token).
    *
    * Returns one row per document: (idCol, n_toks long, logratio double
    * rounded to 4 dp — absorbs sub-ulp ln/summation drift across
    * engines). Positive = target-like; token-less docs keep a
    * (id, 0, NULL) row. Downstream selection is `ORDER BY logratio DESC`
    * top-n or a threshold filter — both total-ordered by (logratio, id).
    *
    * Scale shape: ONE corpus scan feeds a single word-count aggregate
    * that carries both distributions (raw count + conditional target
    * count per token — no second pass over the target slice); Zipf keeps
    * the vocab broadcastable for the score join; N_t/N_r/V ride a 1-row
    * broadcast; the per-doc mean is map-combinable. Nothing is
    * O(corpus²) and no text leaves the scan except (token, id, flag). */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
                  targetPred: Column): DataFrame = {
    val toks = df.select(col(idCol).as("__id"),
      coalesce(targetPred, lit(false)).as("__tgt"),
      explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => t =!= "")).as("__t"))
    val vocab = toks.groupBy(col("__t"))
      .agg(count(lit(1)).as("__cr"),
        sum(when(col("__tgt"), lit(1L)).otherwise(lit(0L))).as("__ct"))
    val stats = vocab.agg(sum(col("__cr")).as("__nr"),
      sum(col("__ct")).as("__nt"), count(lit(1)).as("__v"))
    val scored = toks.join(vocab, Seq("__t"))
      .crossJoin(broadcast(stats))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_toks"),
        round(avg(
          log((col("__ct") + 1).cast("double") / (col("__nt") + col("__v"))) -
            log((col("__cr") + 1).cast("double") / (col("__nr") + col("__v")))
        ), 4).as("logratio"))
    df.select(col(idCol).as("__id"))
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        col("logratio"))
  }

  /** One DoReMi domain-reweighting step (Xie et al. 2023,
    * arXiv:2305.10429): the Group-DRO multiplicative-weights update that
    * turns per-example proxy/reference losses into the next mixture's
    * domain weights —
    *
    *   excess_d = max(0, avg proxy loss_d − avg reference loss_d)
    *   w'_d     = w_d · exp(η · excess_d)
    *   out_d    = (1 − c) · w'_d / Σ w' + c / |domains|
    *
    * The per-example loss tables are corpus-scale; both collapse in ONE
    * map-combinable avg per domain, after which everything is
    * |domains|-sized: the normalizer rides a 1-row broadcast exactly like
    * the other global-scalar gates. Domains missing from either loss
    * table drop (inner joins) — a domain the proxy never saw has no
    * defined excess. Weights round(6) for cross-engine parity; the prior
    * weight's absolute scale cancels in the normalization. */
  def doremiWeightUpdate(proxyLosses: DataFrame, refLosses: DataFrame,
                         priorWeights: DataFrame, domainCol: String,
                         lossCol: String, weightCol: String,
                         eta: Double = 1.0,
                         smoothing: Double = 1e-3): DataFrame = {
    require(eta > 0, s"step size eta must be positive: $eta")
    require(smoothing >= 0 && smoothing < 1, s"smoothing in [0,1): $smoothing")
    val p = proxyLosses.groupBy(col(domainCol)).agg(avg(col(lossCol)).as("__pl"))
    val r = refLosses.groupBy(col(domainCol)).agg(avg(col(lossCol)).as("__rl"))
    val scaled = priorWeights.join(p, Seq(domainCol)).join(r, Seq(domainCol))
      .select(col(domainCol),
        (col(weightCol) *
          exp(lit(eta) * greatest(col("__pl") - col("__rl"), lit(0.0)))).as("__s"))
    val tot = scaled.agg(sum(col("__s")).as("__tot"), count(lit(1)).as("__k"))
    scaled.crossJoin(broadcast(tot))
      .select(col(domainCol),
        round(lit(1.0 - smoothing) * col("__s") / col("__tot")
          + lit(smoothing) / col("__k"), 6).as("weight"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * the A-Res reservoir key, equivalently Gumbel top-k): each row gets
    * key `ln(u) / w` with `u` a deterministic hash-uniform in (0,1), and
    * the k LARGEST keys are the sample — inclusion probability
    * proportional to weight, no replacement, one pass, no sequential
    * reservoir (the classic algorithm's loop collapses to a top-k, which
    * is exactly what distributes).
    *
    * Determinism: `u = (knuthHash32(id)+1) / (2^32+1)` is an exact
    * integer-derived double, and the key is ROUNDED to 6 dp before
    * ranking with the id as tiebreak, so the selected set replays across
    * engines (sub-ulp `ln` differences cannot flip a rank unless a key
    * sits within 1 ulp of a 5e-7 boundary). Rows with weight <= 0 or
    * NULL are excluded — zero-weight rows have inclusion probability 0.
    *
    * Returns the input columns plus `es_key double`, the k sampled rows.
    * Scale shape: `orderBy(...).limit(k)` plans as TakeOrderedAndProject
    * — per-partition top-k heaps merged on the driver, k rows held
    * anywhere, no global sort, no single-partition window. */
  def weightedSampleWithoutReplacement(df: DataFrame, idCol: String,
                                       weightCol: String, k: Int): DataFrame = {
    requireNumericKey(df, idCol, "weightedSampleWithoutReplacement")
    require(k >= 1, s"sample size k must be >= 1, got $k")
    val u = (knuthHash32(col(idCol)) + lit(1L)).cast("double") / lit(M32 + 1.0)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("es_key", round(log(u) / col(weightCol).cast("double"), 6))
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
  }

  /** Neyman optimal stratified allocation (Neyman 1934): split a total
    * sample budget `k` across strata proportionally to `N_h · σ_h` — the
    * minimum-variance allocation for estimating a population mean, and
    * the principled answer to "how many docs should QA hand-review from
    * each source" (high-variance sources earn more eyes than uniform or
    * size-proportional splits give them). Integer seats come from the
    * LARGEST-REMAINDER method (floor every quota, hand the `k − Σfloor`
    * leftovers to the largest fractional parts, stratum-ascending ties),
    * so the allocation is exact and engine-replayable.
    *
    * Exactness: per-stratum (N, ΣV, ΣV²) are integer-exact aggregates
    * (`valCol` is read as long); σ, the rounded weight `round(N·σ, 6)`,
    * and the quotas are a FIXED double sequence; the weight total is a
    * DECIMAL sum of the rounded weights (order-free), so shares match
    * across engines. Strata with under 2 rows or zero variance weigh 0
    * (nothing to learn from sampling a constant stratum — they receive
    * seats only if every stratum is degenerate, which is rejected).
    *
    * Returns (stratumCol, n_rows long, alloc long). Scale shape: one
    * map-combinable aggregate collapses the table to a per-stratum
    * sidecar; the seat assignment is driver-side over that bounded
    * frame, like [[unimaxAllocation]]. */
  def neymanAllocation(df: DataFrame, stratumCol: String, valCol: String,
                       k: Int): DataFrame = {
    require(k >= 0, s"budget must be >= 0, got $k")
    val spark = df.sparkSession
    val stats = graft.util.DriverBound.collectBounded(
        df.groupBy(col(stratumCol))
          .agg(count(lit(1)).as("__n"),
            sum(coalesce(col(valCol).cast("long"), lit(0L))).as("__c"),
            sum(coalesce(col(valCol).cast("long"), lit(0L))
              * coalesce(col(valCol).cast("long"), lit(0L))).as("__s2")),
        65536, s"neymanAllocation($stratumCol)")
      .map { r =>
        require(!r.isNullAt(0),
          s"neymanAllocation: NULL $stratumCol — repair or filter upstream")
        (r.get(0).toString, r.getLong(1), r.getLong(2), r.getLong(3))
      }
      .sortBy(_._1)
    def weight(n: Long, c: Long, s2: Long): Double =
      if (n < 2) 0.0
      else {
        val variance = math.max(0.0,
          (s2.toDouble - c.toDouble * c.toDouble / n.toDouble) / (n - 1).toDouble)
        val w = n.toDouble * math.sqrt(variance)
        BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    val ws = stats.map { case (s, n, c, s2) => (s, n, weight(n, c, s2)) }
    val tot = ws.map(w => BigDecimal(w._3).setScale(6))
      .foldLeft(BigDecimal(0))(_ + _)
    require(tot > 0,
      "neymanAllocation: every stratum is degenerate (constant or <2 rows)")
    val totD = tot.toDouble
    val quotas = ws.map { case (s, n, w) =>
      val quota = k * (w / totD)
      val base = math.floor(quota).toLong
      (s, n, base, quota - base)
    }
    val leftovers = (k - quotas.map(_._3).sum).toInt
    val bonus = quotas.sortBy { case (s, _, _, frac) => (-frac, s) }
      .take(leftovers).map(_._1).toSet
    val rows = quotas.map { case (s, n, base, _) =>
      (s, n, base + (if (bonus(s)) 1L else 0L))
    }
    spark.createDataFrame(rows.toSeq).toDF(stratumCol, "n_rows", "alloc")
  }

  /** UniMax budget allocation (Chung et al., ICLR 2023, arXiv:2304.09151
    * Algorithm 1): split a total training budget across sources so that
    * no source repeats more than `maxEpochs` times and the leftover is
    * shared as uniformly as possible. Walk sources by available cost
    * ASCENDING; each gets `min(maxEpochs · avail, remaining div left)` —
    * a small source is capped by its epoch bound and the budget it
    * cannot absorb flows to the larger sources, which is the paper's
    * fairness argument against temperature sampling's tuned-τ guesswork.
    *
    * All arithmetic is integer (floor division, like the oracle's `//`),
    * so allocations replay bit-exactly across engines. Ties in `avail`
    * order by `sourceCol` ascending.
    *
    * Returns (sourceCol, avail long, alloc long), one row per source.
    * Scale shape: the corpus collapses to ONE map-combinable per-source
    * aggregate; the greedy walk runs driver-side over that sidecar
    * (sources number in the hundreds — same bounded-collect discipline
    * as the DoReMi/temperature mixers), and the result is a broadcast-
    * sized quota frame downstream samplers join against. */
  def unimaxAllocation(df: DataFrame, sourceCol: String, costCol: String,
                       budget: Long, maxEpochs: Int): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val spark = df.sparkSession
    val avail = graft.util.DriverBound.collectBounded(
        df.groupBy(col(sourceCol))
          .agg(sum(coalesce(col(costCol).cast("long"), lit(0L))).as("__a")),
        65536, s"unimaxAllocation($sourceCol)")
      .map { r =>
        require(!r.isNullAt(0),
          s"unimaxAllocation: NULL $sourceCol — repair or filter upstream")
        (r.get(0).toString, r.getLong(1))
      }
      .sortBy { case (s, a) => (a, s) }
    var remaining = budget
    var left = avail.length
    val rows = avail.map { case (s, a) =>
      val fair = if (left == 0) 0L else remaining / left
      val alloc = math.min(maxEpochs.toLong * a, fair)
      remaining -= alloc
      left -= 1
      (s, a, alloc)
    }
    spark.createDataFrame(rows.toSeq)
      .toDF(sourceCol, "avail", "alloc")
  }

  /** Greedy k-center coreset (Gonzalez 1985 farthest-point traversal —
    * a 2-approximation of the optimal k-center cover): pick the
    * smallest-id vector, then k−1 times the point FARTHEST from the
    * chosen set (ties to the smaller id) — the corpus-global "maximum
    * coverage" subset selection that complements query-relative MMR:
    * seed sets for clustering, diverse eval panels, annotation budgets.
    * Distances are exact integer squared L2 over micro-floor-quantized
    * components (the [[graft.operators.Retrieval.mmrDiversify]] grid),
    * so every pick is bit-reproducible; ids must be integral.
    *
    * Returns (rank int 1..k, id long, radius2 long) — radius2 is the
    * point's squared distance to the set that EXCLUDES it (its max-min
    * score when chosen; 0 for the seed), a monotone non-increasing
    * sequence = the cover radius curve k-center is chosen to minimize.
    *
    * Scale shape: per pick ONE map-only pass folds the new center
    * (a broadcast literal) into each row's running min-distance, plus a
    * TakeOrdered(1) for the argmax — k passes total, no pairwise
    * materialization anywhere; driver state is the k chosen vectors
    * (the bounded-sidecar discipline). */
  def kCenterCoreset(df: DataFrame, idCol: String, vecCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.storage.StorageLevel
    def micro(c: Column) = transform(c,
      x => floor(x.cast("double") * lit(1000000.0)).cast("long"))
    def dist2(a: Column, b: Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v)
    val base = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), micro(col(vecCol)).as("m"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = base.count()
    require(n >= 1, "kCenterCoreset needs at least one vector")
    // each argmax row already CARRIES its vector — read it from the
    // TakeOrdered result instead of a separate filter-by-id job (the
    // old vecOf re-scanned the state once per pick, doubling the
    // per-round job count)
    val firstRow = base.orderBy(col("id").asc).limit(1).head()
    val firstId = firstRow.getLong(0)
    val picks = Seq.newBuilder[(Int, Long, Long)]
    picks += ((1, firstId, 0L))
    var state = base
      .withColumn("best", dist2(col("m"), typedlit(firstRow.getSeq[Long](1))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var lastState = state
    var chosen = Set(firstId)
    var rank = 2
    while (rank <= math.min(k.toLong, n).toInt) {
      val top = state.filter(!col("id").isInCollection(chosen))
        .orderBy(col("best").desc, col("id").asc).limit(1)
        .head()
      val pid = top.getLong(0)
      picks += ((rank, pid, top.getLong(2)))
      chosen += pid
      val next = state
        .withColumn("best",
          least(col("best"), dist2(col("m"), typedlit(top.getSeq[Long](1)))))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      lastState.unpersist()
      state = next
      lastState = next
      rank += 1
    }
    state.unpersist()
    base.unpersist()
    val spark = df.sparkSession
    import spark.implicits._
    picks.result().toDF("rank", "id", "radius2")
  }

  /** Poisson(1) CDF on the nano grid, cumulative P(X ≤ k) for k = 0..7,
    * floor-quantized to integer billionths: a hash-uniform u ∈ [0, 1e9)
    * draws `k = #{i : u ≥ cdf_i}` replicate multiplicities — the
    * inverse-CDF walk as a literal array both engines index
    * identically. P(X > 7) ≈ 1e-5 collapses into k = 8. */
  private[graft] val poissonOneCdfNano: Seq[Long] = Seq(
    367879441L, 735758882L, 919698602L, 981011843L,
    996340153L, 999405815L, 999916758L, 999989750L)

  /** Poisson bootstrap of a per-group mean (Oza & Russell, AISTATS
    * 2001 online bagging; Chamandy et al. 2012 "Estimating uncertainty
    * for massive data streams" — the Google poisson-bootstrap paper):
    * each of `reps` replicates re-weights every row by an independent
    * Poisson(1) count, turning resampling-with-replacement into ONE
    * map-side weight draw per (row, replicate) — no per-replicate
    * shuffle of the data, THE bootstrap that works at 100 TB (classical
    * resampling would shuffle the dataset `reps` times).
    *
    * Determinism device: ONE 60-bit md5 per row (not per replicate —
    * measured 10× on the hash bill), folded to the 1e-9 grid; replicate
    * j's uniform is the golden-ratio Weyl rotation `(h + j·618033988)
    * mod 1e9`. BE AWARE WHAT THAT BUYS AND COSTS: Weyl shifts are
    * equidistributed, so each replicate's weights are uniform
    * MARGINALLY — but across replicates a row's uniforms are a
    * deterministic lattice (perfectly dependent: u_{j+1} − u_j is the
    * same constant for every row), so the draws are quasi-Monte-Carlo,
    * not independent. Replicate means decorrelate only by mixing over
    * many rows; for SMALL groups the across-replicate variance
    * systematically UNDERSTATES true sampling noise. Pass
    * `independentReps = true` to draw one md5 per (row, replicate)
    * instead — statistically independent replicates at ~9× the hash
    * bill (still outside any lambda, still whole-stage codegen; the
    * measured shapes are 1.6 s Weyl vs 14.4 s independent at sf0.1) —
    * the right mode when the SE itself is the deliverable and groups
    * may be small. The multiplicity is the
    * inverse-CDF walk against [[poissonOneCdfNano]] — exact integer
    * compares, replayable anywhere. Replicate means are
    * floor-quantized micro integers (`floordiv(Σ k·v_micro, Σ k)`), and
    * the across-replicate spread is the exact integer identity
    * `var = floordiv(B·Σm² − (Σm)², B²)`; the only double is the final
    * `boot_se = round(√var / 1e6, 6)`.
    *
    * Returns one row per group: n_reps, boot_mean_micro (floordiv of
    * replicate-mean sum), boot_var_micro2, boot_se. A replicate whose
    * group draws zero total weight drops out of that group's fold
    * (P ≈ e^{−n}: real only for near-empty groups, and the n_reps
    * column exposes it).
    *
    * Scale shape: explode ×reps on the row side (map-local), one
    * (group, rep) aggregate, one group aggregate — two shuffles of
    * frames that SHRINK at each step; no collect, no data resample. */
  def poissonBootstrap(df: DataFrame, groupCol: String, idCol: String,
                       valueMicroCol: String, reps: Int = 32,
                       independentReps: Boolean = false): DataFrame = {
    require(reps >= 2 && reps <= 1000, s"reps must be in [2,1000], got $reps")
    val base0 = df
      .filter(col(groupCol).isNotNull && col(idCol).isNotNull &&
        col(valueMicroCol).isNotNull)
    // Everything up to the first (group, rep) aggregate — the ×reps
    // explode, the md5 draws, the CDF walk — is map-side work that runs
    // inside the SCAN's partitions. A small/unsplittable input (one
    // parquet file under maxPartitionBytes) therefore serializes reps×
    // the per-row hash bill into ONE task while every other core idles
    // (guide §2.5 input skew: "one huge unsplittable file ...
    // repartition immediately after the read"). Spread the PRE-explode
    // frame by the deterministic id when the scan's parallelism is
    // below the session's shuffle partitions: the shuffle moves 1/reps
    // of the downstream row count, and at real scale (thousands of
    // input splits) the condition is false and no exchange is added.
    val shufflePartitions =
      df.sparkSession.sessionState.conf.numShufflePartitions
    val base =
      if (base0.rdd.getNumPartitions < shufflePartitions)
        base0.repartition(shufflePartitions, col(idCol))
      else base0
    val withU =
      if (independentReps)
        // one md5 per (row, replicate) — independent draws; the hash is
        // a PLAIN column after the explode (outside any lambda), so the
        // stage stays whole-stage codegen'd: measured 14.4 s at sf0.1
        // vs 135 s for the same hash inside an array-filter lambda
        base.select(col(groupCol).as("__g"), col(valueMicroCol).as("__v"),
            col(idCol).cast("string").as("__id"))
          .select(col("__g"), col("__v"), col("__id"),
            explode(sequence(lit(0), lit(reps - 1))).as("__rep"))
          .withColumn("__u", pmod(conv(substring(
            md5(concat_ws(" ", col("__id"), col("__rep").cast("string"))),
            1, 15), 16, 10).cast("long"), lit(1000000000L)))
      else
        // ONE md5 per row, BEFORE the replicate explode; per-replicate
        // uniform = golden-ratio Weyl rotation of the row hash (the
        // quasi-MC lattice trade documented above) — ~2 s at sf0.1
        base.select(col(groupCol).as("__g"), col(valueMicroCol).as("__v"),
            pmod(conv(substring(md5(col(idCol).cast("string")), 1, 15),
              16, 10).cast("long"), lit(1000000000L)).as("__h"))
          .select(col("__g"), col("__v"), col("__h"),
            explode(sequence(lit(0), lit(reps - 1))).as("__rep"))
          .withColumn("__u", pmod(col("__h") +
            col("__rep").cast("long") * lit(618033988L), lit(1000000000L)))
    // CDF walk as a sum of plain comparisons — codegen-friendly
    val weighted = withU
      .select(col("__g"), col("__v"), col("__rep"),
        poissonOneCdfNano
          .map(t => (col("__u") >= lit(t)).cast("long"))
          .reduce(_ + _).as("__k"))
    val perRep = weighted
      .groupBy(col("__g"), col("__rep"))
      .agg(sum(col("__k") * col("__v")).as("__sv"), sum(col("__k")).as("__sk"))
      .filter(col("__sk") > 0L)
      // values arrive micro-quantized, so the replicate mean is already
      // a micro integer: floordiv(Σ k·v_micro, Σ k), no re-scaling
      .select(col("__g"),
        ((col("__sv") - pmod(col("__sv"), col("__sk"))) / col("__sk"))
          .cast("long").as("__m"))
    perRep.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_reps"), sum(col("__m")).as("__sm"),
        sum(col("__m") * col("__m")).as("__sm2"))
      .select(col("__g").as(groupCol), col("n_reps"),
        ((col("__sm") - pmod(col("__sm"), col("n_reps"))) / col("n_reps"))
          .cast("long").as("boot_mean_micro"),
        ((col("n_reps") * col("__sm2") - col("__sm") * col("__sm") -
          pmod(col("n_reps") * col("__sm2") - col("__sm") * col("__sm"),
            col("n_reps") * col("n_reps")))
          / (col("n_reps") * col("n_reps")))
          .cast("long").as("boot_var_micro2"))
      .withColumn("boot_se",
        round(sqrt(col("boot_var_micro2").cast("double")) / lit(1e6), 6)
          + lit(0.0))
  }
}
