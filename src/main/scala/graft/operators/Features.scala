package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-engineering operators that need leakage discipline — the
  * transforms a training pipeline computes FROM the label column, where
  * naively using a row's own label to build its feature leaks the target
  * into the input (the classic target-leakage bug that makes offline
  * metrics great and the deployed model useless).
  */
object Features {

  /** Deterministic fold id in [0, k): the corpus-wide Knuth
    * multiplicative hash (`(id mod 2^31) · 2654435761 mod 2^32`) mod k —
    * the same split family the sampling operators use, so folds line up
    * across feature / split / mixing stages. */
  def foldOf(id: Column, k: Int): Column =
    pmod(pmod(id, lit(2147483648L)) * lit(2654435761L), lit(4294967296L)) %
      lit(k.toLong)

  /** K-fold out-of-fold target-encoding table: for each (category, fold)
    * cell, the mean label computed over every OTHER fold's rows of that
    * category — the encoding the cell's rows are allowed to see. Rows
    * whose category has no out-of-fold labels (a category living entirely
    * in one fold) fall back to the global out-of-fold-agnostic mean, the
    * standard prior.
    *
    * Cross-engine exactness: the label is read as LONG, all sums/counts
    * are exact integers, and each encoding is ONE double division
    * (`(S_c − s_cf) / (n_c − n_cf)`), rounded to 6 dp — no accumulated
    * double sequence anywhere.
    *
    * Returns (category string, fold long, n long — rows IN the cell,
    * enc double). NULL categories and NULL labels are excluded.
    *
    * Scale shape: one map-combinable groupBy on (category, fold) — the
    * word-count shape — then a per-category total via a second tiny
    * aggregate broadcast-joined back (both frames are bounded by
    * |categories| · k, not by the table). Applying the encoding to rows
    * ([[applyTargetEncoding]]) is one broadcast hash join. */
  def targetEncodeKFold(df: DataFrame, catCol: String, targetCol: String,
                        idCol: String, k: Int = 5): DataFrame = {
    require(k >= 2, s"need at least 2 folds, got $k")
    val base = df
      .filter(col(catCol).isNotNull && col(targetCol).isNotNull)
      .select(col(catCol).cast("string").as("category"),
        col(targetCol).cast("long").as("__t"),
        foldOf(col(idCol), k).as("fold"))
    val cells = base.groupBy(col("category"), col("fold"))
      .agg(count(lit(1)).as("n"), sum(col("__t")).as("__s"))
    val cats = cells.groupBy(col("category"))
      .agg(sum(col("n")).as("__cn"), sum(col("__s")).as("__cs"))
    val tot = cats.agg(coalesce(sum(col("__cn")), lit(0L)),
      coalesce(sum(col("__cs")), lit(0L))).first
    val bigN = tot.getLong(0); val bigS = tot.getLong(1)
    require(bigN > 0, "targetEncodeKFold needs labeled rows")
    val outN = col("__cn") - col("n")
    val outS = col("__cs") - col("__s")
    cells.join(broadcast(cats), "category")
      .select(col("category"), col("fold"), col("n"),
        (round(when(outN > 0, outS.cast("double") / outN.cast("double"))
          .otherwise(lit(bigS.toDouble / bigN.toDouble)), 6) + lit(0.0))
          .as("enc"))
      .orderBy(col("category"), col("fold"))
  }

  /** Per-cell mutual-information contributions between two categorical
    * columns — the feature-selection score ("how much does knowing
    * `source` tell you about `lang`?") and the redundancy check before
    * adding a feature that's a proxy for the label. Each (x, y) cell
    * contributes `(c_xy/N) · ln(c_xy·N / (c_x·c_y))` nats; Σ contrib is
    * the MI, zero iff independent. Cells with c_xy = 0 contribute 0 and
    * are omitted (lim p→0 of p·ln p).
    *
    * Cross-engine exactness: counts are exact integers; the log argument
    * is formed as one integer-product division (`(c_xy·N) / (c_x·c_y)`,
    * products through DECIMAL(38,0) so a 10^12-row table cannot
    * overflow), so each contribution is the same short double sequence in
    * any engine; round(6)+0.0 per cell.
    *
    * Returns (x string, y string, n_xy long, contrib double), ordered by
    * (x, y). Scale shape: one groupBy on (x, y) plus two marginal
    * aggregates broadcast back — output bounded by |X|·|Y|. */
  def mutualInfoCells(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("string").as("x"),
        col(yCol).cast("string").as("y"))
    val xy = base.groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_xy"))
    val xs = xy.groupBy(col("x")).agg(sum(col("n_xy")).as("__cx"))
    val ys = xy.groupBy(col("y")).agg(sum(col("n_xy")).as("__cy"))
    val n = base.count()
    require(n > 0, "mutualInfoCells needs non-null rows")
    def d(c: Column) = c.cast("decimal(38,0)")
    val ratio = (d(col("n_xy")) * lit(n)).cast("double") /
      (d(col("__cx")) * col("__cy")).cast("double")
    xy.join(broadcast(xs), "x").join(broadcast(ys), "y")
      .select(col("x"), col("y"), col("n_xy"),
        (round(col("n_xy").cast("double") / lit(n.toDouble) * log(ratio), 6)
          + lit(0.0)).as("contrib"))
      .orderBy(col("x"), col("y"))
  }

  /** The MI scalar off [[mutualInfoCells]]: DECIMAL(28,6) sum of the
    * rounded cells (order-free), one row (mi_nats double, n_cells long). */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame =
    mutualInfoCells(df, xCol, yCol)
      .agg(sum(col("contrib").cast("decimal(28,6)")).cast("double")
        .as("mi_nats"), count(lit(1)).as("n_cells"))

  /** Reliability-diagram bins for a probabilistic scorer — the
    * calibration check that belongs next to any quality-classifier gate:
    * bucket rows by predicted score (`bin = max(0, min(bins−1,
    * ⌊score·bins⌋))` — clamped on BOTH sides, so an out-of-range scorer
    * lands in the edge bins where its mean_score-vs-frac_pos gap
    * exposes it, instead of leaking negative bin ids), and per bin
    * report the mean predicted score vs the empirical
    * positive rate. A calibrated model's per-bin gap ~ 0; Σ (n/N)·gap is
    * the Expected Calibration Error if the caller wants the scalar.
    *
    * Cross-engine exactness: scores pass through DECIMAL(18,6) so the
    * per-bin sum is exact and order-free; each reported value is one
    * double division off exact sums, round(6)+0.0; the gap is the
    * difference OF THE ROUNDED values (deterministic in any engine).
    *
    * Returns (bin 0..bins−1 long — empty bins omitted, n long,
    * mean_score double, frac_pos double, gap double), bin ascending.
    * NULL scores/labels excluded. One map-combinable groupBy. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 65536,
      s"bins must be in [2, 65536] (the bin frame is a driver-bounded " +
        s"sidecar), got $bins")
    val base = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(
        greatest(lit(0L), least(lit((bins - 1).toLong),
          floor(col(scoreCol) * lit(bins)).cast("long"))).as("bin"),
        col(scoreCol).cast("decimal(18,6)").as("__s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__p"))
    val agg = base.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__s")).as("__ss"),
        sum(col("__p")).as("__pp"))
      .select(col("bin"), col("n"),
        (round(col("__ss").cast("double") / col("n").cast("double"), 6)
          + lit(0.0)).as("mean_score"),
        (round(col("__pp").cast("double") / col("n").cast("double"), 6)
          + lit(0.0)).as("frac_pos"))
    agg.select(col("bin"), col("n"), col("mean_score"), col("frac_pos"),
        (round(abs(col("mean_score") - col("frac_pos")), 6) + lit(0.0))
          .as("gap"))
      .orderBy(col("bin"))
  }

  /** ROC AUC of a scorer against a binary label — the ranking-quality
    * companion to [[calibrationBins]] (calibration says "are the
    * probabilities honest", AUC says "does the ordering separate the
    * classes"). Computed by the Mann–Whitney identity with exact tie
    * handling: collapsing to per-distinct-score (pos_v, neg_v) counts,
    * `2·U = Σ_v (2·pos_v·negBelow_v + pos_v·neg_v)` — ties credit ½ —
    * and `AUC = 2U / (2·n_pos·n_neg)`.
    *
    * Cross-engine exactness: everything up to the final division is
    * exact integer arithmetic (products through DECIMAL(38,0)); ONE
    * double division, round(6)+0.0. No per-row ranks, no windows over
    * rows: the prefix sum runs over the DISTINCT-SCORE frame via
    * [[Ranking.globalRunningSum]] — the same shape as the KS statistic,
    * linear at any corpus size.
    *
    * Returns one row: (auc double, n_pos long, n_neg long). NULL scores
    * or labels excluded; requires both classes present. */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val counts = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("__v"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__p"))
      .groupBy(col("__v"))
      .agg(sum(col("__p")).as("__pos"),
        (count(lit(1)) - sum(col("__p"))).as("__neg"))
      // materialize ONCE: the totals action below and the running-sum
      // pass are separate actions, and without this the caller's whole
      // scoring pipeline upstream of `df` re-executes for each (the
      // distinct-score frame is small by construction)
      .localCheckpoint()
    val tot = counts.agg(coalesce(sum(col("__pos")), lit(0L)),
      coalesce(sum(col("__neg")), lit(0L))).first
    val nPos = tot.getLong(0); val nNeg = tot.getLong(1)
    require(nPos > 0 && nNeg > 0,
      s"rocAuc needs both classes, got pos=$nPos neg=$nNeg")
    val cum = Ranking.globalRunningSum(counts, Seq(col("__v")), "__neg",
      out = "__cumNeg")
    def d(c: Column) = c.cast("decimal(38,0)")
    val u2 = cum.select(
        (d(col("__pos")) * (col("__cumNeg") - col("__neg")) * lit(2L)
          + d(col("__pos")) * col("__neg")).as("__t"))
      .agg(coalesce(sum(col("__t")), lit(java.math.BigDecimal.ZERO))
        .as("__u2"))
      .first.getDecimal(0)
    val auc = u2.doubleValue / (2.0 * nPos.toDouble * nNeg.toDouble)
    val r6 = BigDecimal(auc)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val spark = df.sparkSession
    import spark.implicits._
    Seq((r6, nPos, nNeg)).toDF("auc", "n_pos", "n_neg")
  }

  /** Optimal classification threshold by Youden's J statistic
    * (Youden, Cancer 1950): over candidate thresholds t (the distinct
    * scores; predict positive iff score ≥ t), maximize
    * `J(t) = TPR − FPR`. This is where a quality-filter cut ACTUALLY
    * comes from once a scorer exists — the threshold that best
    * separates the classes, not an eyeballed 0.5.
    *
    * Cross-engine exactness: J is ranked by the INTEGER numerator
    * `tp·N − fp·P` (exact DECIMAL(38) products — tpr/fpr fractions
    * share the denominator P·N, so the argmax is identical), ties break
    * to the LARGER threshold (the conservative cut); the reported j is
    * one double division, round(6). Returns one row
    * (threshold double, tp, fp long, j double, n_pos, n_neg long).
    *
    * Scale shape: same as [[rocAuc]] — one map-combinable groupBy on
    * the distinct score, prefix sums via the range-partitioned
    * [[Ranking.globalRunningSum]] (never a single-task window), one
    * tiny argmax aggregate. */
  def youdenThreshold(df: DataFrame, scoreCol: String,
                      labelCol: String): DataFrame = {
    val counts = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("__v"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__p"))
      .groupBy(col("__v"))
      .agg(sum(col("__p")).as("__pos"),
        (count(lit(1)) - sum(col("__p"))).as("__neg"))
      // materialize ONCE — same multi-action recompute hazard as rocAuc
      .localCheckpoint()
    val tot = counts.agg(coalesce(sum(col("__pos")), lit(0L)),
      coalesce(sum(col("__neg")), lit(0L))).first
    val nPos = tot.getLong(0); val nNeg = tot.getLong(1)
    require(nPos > 0 && nNeg > 0,
      s"youdenThreshold needs both classes, got pos=$nPos neg=$nNeg")
    // suffix sums (scores >= t) from ascending-inclusive prefix sums
    val c1 = Ranking.globalRunningSum(counts, Seq(col("__v")), "__pos",
      out = "__cumPos")
    val c2 = Ranking.globalRunningSum(c1, Seq(col("__v")), "__neg",
      out = "__cumNeg")
    def d(c: Column) = c.cast("decimal(38,0)")
    val scored = c2.select(col("__v"),
        (lit(nPos) - col("__cumPos") + col("__pos")).as("__tp"),
        (lit(nNeg) - col("__cumNeg") + col("__neg")).as("__fp"))
      .select(col("__v"), col("__tp"), col("__fp"),
        (d(col("__tp")) * lit(nNeg) - d(col("__fp")) * lit(nPos))
          .as("__jn"))
    val best = scored
      .agg(max(struct(col("__jn"), col("__v"), col("__tp"), col("__fp")))
        .as("m")).first.getStruct(0)
    val j = best.getDecimal(0).doubleValue /
      (nPos.toDouble * nNeg.toDouble)
    val r6 = BigDecimal(j)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val spark = df.sparkSession
    import spark.implicits._
    Seq((best.getDouble(1), best.getLong(2), best.getLong(3), r6,
        nPos, nNeg))
      .toDF("threshold", "tp", "fp", "j", "n_pos", "n_neg")
  }

  /** Cohen's kappa between two categorical columns — chance-corrected
    * agreement, the number to quote when comparing a cheap classifier
    * against gold labels (or two labeling runs against each other):
    * `κ = (p_o − p_e) / (1 − p_e)` with p_o the observed agreement and
    * p_e the agreement expected from the marginals.
    *
    * Cross-engine exactness: computed as the INTEGER identity
    * `κ = (N·Σdiag − Σ_k row_k·col_k) / (N² − Σ_k row_k·col_k)` —
    * numerator and denominator are exact integers (BigInt / DECIMAL(38)
    * products), ONE double division, round(6). Returns one row
    * (kappa double — NULL when the denominator is 0 (both columns
    * constant; agreement is undefined, surfaced not invented), po, pe,
    * n long). NULL labels excluded pairwise.
    *
    * Scale shape: one groupBy on the label pair; the |A|·|B| cell frame
    * is a driver-bounded sidecar. */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // |A|·|B| label-pair cells — enforced, not documented: two id-like
    // columns here would otherwise OOM the driver
    val cells = graft.util.DriverBound.collectBounded(
        df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
          .select(col(aCol).cast("string").as("a"),
            col(bCol).cast("string").as("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c")),
        65536, s"cohensKappa($aCol, $bCol)")
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = cells.map(_._3).sum
    require(n > 0, "cohensKappa needs non-null label pairs")
    val diag = cells.filter(c => c._1 == c._2).map(_._3).sum
    val rows = cells.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val cols = cells.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    val src = (rows.keySet ++ cols.keySet).toSeq.map { k =>
      BigInt(rows.getOrElse(k, 0L)) * BigInt(cols.getOrElse(k, 0L))
    }.sum
    val num = BigInt(n) * BigInt(diag) - src
    val den = BigInt(n) * BigInt(n) - src
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val kappa: Option[Double] =
      if (den == BigInt(0)) None
      else Some(r6(num.toDouble / den.toDouble))
    val po = r6(diag.toDouble / n.toDouble)
    val pe = r6(src.toDouble / (n.toDouble * n.toDouble))
    val spark = df.sparkSession
    import spark.implicits._
    Seq((kappa, po, pe, n)).toDF("kappa", "po", "pe", "n")
  }

  /** Join the [[targetEncodeKFold]] table back onto the rows: each row
    * gets the encoding of its (category, fold) cell in a new `outCol`.
    * Rows with a NULL category or an unseen cell get NULL — surface,
    * don't invent. The encoding table is broadcast (|categories| · k
    * rows); the big side never shuffles. */
  def applyTargetEncoding(df: DataFrame, encTable: DataFrame,
                          catCol: String, idCol: String, k: Int,
                          outCol: String = "cat_enc"): DataFrame = {
    val enc = encTable.select(col("category").as("__ec"),
      col("fold").as("__ef"), col("enc").as(outCol))
    df.withColumn("__fold", foldOf(col(idCol), k))
      .join(broadcast(enc),
        col(catCol).cast("string") === col("__ec") &&
          col("__fold") === col("__ef"),
        "left")
      .drop("__ec", "__ef", "__fold")
  }

  /** Isotonic calibration over score bins — the pool-adjacent-violators
    * fit (Ayer et al. 1955) computed via its CLOSED FORM
    * `fitted(i) = max_{l ≤ i} min_{j ≥ i} mean(l..j)`: no iterative
    * pooling, so the fit is trivially engine-replayable — the interval
    * means are single divisions of exact integer sums and max/min over
    * a set of doubles is order-free. Output is the monotone
    * non-decreasing step function a scorer's raw bin rates get snapped
    * to — the standard post-hoc calibrator when Platt's sigmoid shape
    * doesn't hold.
    *
    * Uses [[calibrationBins]]' fixed-width binning (scores in [0,1],
    * bin = min(bins−1, ⌊score·bins⌋)); empty bins simply don't appear
    * (the closed form runs over the observed bins in order). Returns
    * (bin, n, frac_pos round(6), fitted round(6)) with fitted
    * non-decreasing in bin.
    *
    * Scale shape: one map-combinable aggregate to the ≤`bins`-row
    * frame, then an O(bins²) driver fold — a bounded sidecar. */
  def isotonicCalibration(df: DataFrame, scoreCol: String,
                          labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 65536,
      s"bins must be in [2, 65536] (the bin frame is a driver-bounded " +
        s"sidecar), got $bins")
    val agg = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(
        greatest(lit(0L), least(lit((bins - 1).toLong),
          floor(col(scoreCol) * lit(bins)).cast("long"))).as("bin"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__p"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__p")).as("__pp"))
      .orderBy(col("bin"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val k = agg.length
    // prefix sums over the observed-bin order for O(1) interval means
    val cn = agg.scanLeft(0L)(_ + _._2).toArray
    val cp = agg.scanLeft(0L)(_ + _._3).toArray
    def mean(l: Int, j: Int): Double =
      (cp(j + 1) - cp(l)).toDouble / (cn(j + 1) - cn(l)).toDouble
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val rows = agg.zipWithIndex.map { case ((b, n, p), i) =>
      val fitted = (0 to i).map { l =>
        (i until k).map(j => mean(l, j)).min
      }.max
      (b, n, r6(p.toDouble / n.toDouble), r6(fitted))
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    rows.toDF("bin", "n", "frac_pos", "fitted").orderBy(col("bin"))
  }

  /** Murphy decomposition of the Brier score (Murphy, J. Appl. Met.
    * 1973): `BS = reliability − resolution + uncertainty (+ within-bin
    * variance)` over [[calibrationBins]]' fixed-width bins —
    * reliability is the calibration error a recalibration could remove,
    * resolution the discrimination the scorer actually has, uncertainty
    * the base-rate floor no scorer can beat, and the residual is the
    * binning remainder (within-bin forecast variance MINUS twice the
    * within-bin forecast–outcome covariance — zero when forecasts are
    * constant per bin, NEGATIVE when scores still rank outcomes inside
    * a bin, i.e. discrimination the bin grid is too coarse to credit).
    * The single-number
    * companion to the reliability DIAGRAM: "is this quality scorer bad
    * because it is miscalibrated (fixable) or because it cannot
    * discriminate (not fixable)".
    *
    * Exactness: scores quantize to micro-units (floor(s·1e6)); BS's
    * numerator Σ(m − 1e6·y)² is an exact DECIMAL integer; per-bin sums
    * (n_k, Σm, Σy) are exact longs, and each bin's reliability /
    * resolution term is ONE fixed left-to-right IEEE expression
    * floor-quantized to nano-units before the (order-free) long sum —
    * both engines evaluate the identical operation tree. One division +
    * round(6) per reported figure.
    *
    * Returns one row: (n, brier, reliability, resolution, uncertainty,
    * residual — all round 6). Scale shape: one map-combinable grouped
    * aggregate (≤ bins rows) + one global aggregate; the decomposition
    * folds over the bounded bin sidecar on the driver. */
  def brierDecomposition(df: DataFrame, scoreCol: String, labelCol: String,
                         bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 65536,
      s"bins must be in [2, 65536] (the bin frame is a driver-bounded " +
        s"sidecar), got $bins")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(
        greatest(lit(0L), least(lit((bins - 1).toLong),
          floor(col(scoreCol) * lit(bins)).cast("long"))).as("bin"),
        floor(col(scoreCol).cast("double") * lit(1000000.0)).cast("long")
          .as("__m"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
    // ONE pass: the global (n, p, sq) aggregate is the exact integer sum
    // of the per-bin partials, so folding it driver-side from the
    // ≤bins-row sidecar removes a second full scan of the caller's
    // scoring pipeline (previously two separate actions over `base`)
    val perBinRows = base.groupBy(col("bin"))
      .agg(count(lit(1)).as("nk"), sum(col("__m")).as("sk"),
        sum(col("__y")).as("pk"),
        sum(((col("__m") - lit(1000000L) * col("__y")) *
          (col("__m") - lit(1000000L) * col("__y"))).cast(dec)).as("sqk"))
      .collect()
    val n = perBinRows.map(_.getLong(1)).sum
    require(n >= 1, "brierDecomposition needs at least one scored row")
    val p = perBinRows.map(_.getLong(3)).sum
    val sq = perBinRows.map(_.getDecimal(4))
      .foldLeft(new java.math.BigDecimal(0))(_.add(_))
    val perBin = perBinRows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // nano-unit bin terms: rel_k = D²/(n_k·1e12·N)·1e9, D = Σm − 1e6·Σy;
    // res_k = E²/(n_k·N³)·1e9, E = Σy·N − P·n_k — D, E exact longs, the
    // float tree is division-by-division left to right in BOTH engines
    val relNano = perBin.map { case (nk, sk, pk) =>
      val d = (sk - 1000000L * pk).toDouble
      math.floor(d * d / nk / n / 1000.0).toLong
    }.sum
    val resNano = perBin.map { case (nk, _, pk) =>
      val e = (pk * n - p * nk).toDouble
      math.floor(e * e / nk / n / n / n * 1000000000.0).toLong
    }.sum
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val brier = r6(sq.doubleValue() / (n.toDouble * 1.0e12))
    val rel = r6(relNano.toDouble / 1.0e9)
    val res = r6(resNano.toDouble / 1.0e9)
    val unc = r6(p.toDouble * (n - p).toDouble / (n.toDouble * n.toDouble))
    val resid = r6(brier - (rel - res + unc))
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n, brier, rel, res, unc, resid))
      .toDF("n", "brier", "reliability", "resolution", "uncertainty",
        "residual")
  }

  /** Spearman rank correlation per group — `ρ = 1 − 6Σd²/(n(n²−1))`
    * (Spearman 1904) over TOTAL-ORDER ranks: monotone-association
    * strength between two columns, robust to any monotone transform —
    * the complement of [[graft.operators.Retrieval.kendallTauB]]
    * (τ counts pairwise swaps; ρ weights displacement DISTANCE, so one
    * element far out of place moves ρ much more than τ).
    *
    * Tie policy: ranks are `row_number` over (value, id) — a
    * deterministic TOTAL order, not midranks — so the classical
    * no-ties identity above is exact; with heavy ties this measures
    * "order by (value, id)" agreement, stated plainly rather than
    * approximated (midrank ρ needs Pearson-on-ranks, a different
    * estimator). Exactness: Σd² is an exact integer; the score is one
    * DECIMAL(38,0) floordiv to micro units — `rho_micro =
    * floordiv(1e6·(n(n²−1) − 6Σd²), n(n²−1))` — overflow-safe to
    * n ≈ 10⁹ rows per group.
    *
    * Scale shape: two per-group rank windows (one shuffle each on the
    * group key) + one aggregate; groups distribute, the window sorts
    * within a group — the [[Retrieval]] ranking discipline. */
  def spearmanRho(df: DataFrame, groupCol: String, xCol: String,
                  yCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(col(groupCol).isNotNull && col(idCol).isNotNull &&
      col(xCol).isNotNull && col(yCol).isNotNull)
    val rx = Window.partitionBy(col(groupCol))
      .orderBy(col(xCol), col(idCol))
    val ry = Window.partitionBy(col(groupCol))
      .orderBy(col(yCol), col(idCol))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val ranked = base.select(col(groupCol).as("__g"),
        row_number().over(rx).cast("long").as("__rx"),
        row_number().over(ry).cast("long").as("__ry"))
      .select(col("__g"),
        ((col("__rx") - col("__ry")) * (col("__rx") - col("__ry")))
          .as("__d2"))
    ranked.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), sum(col("__d2")).as("sum_d2"))
      .filter(col("n") >= 2L)
      .select(col("__g").as(groupCol), col("n"), col("sum_d2"),
        {
          val denom = dec(col("n")) * (dec(col("n")) * dec(col("n")) - 1)
          val num = dec(lit(1000000L)) * (denom - dec(col("sum_d2")) * 6)
          ((num - pmod(num, denom)) / denom).cast("long").as("rho_micro")
        })
      .withColumn("rho", col("rho_micro").cast("double") / lit(1e6))
  }

  /** Pairwise association rules over baskets (Agrawal & Srikant, VLDB
    * 1994 — the Apriori support/confidence frame, plus lift): for every
    * co-occurring item pair, `support = P(a,b)`, the two directed
    * confidences `P(b|a)` / `P(a|b)`, and `lift = P(a,b)/(P(a)·P(b))` —
    * the co-occurrence miner behind "docs containing X also contain Y"
    * curation rules and feature-cross candidates.
    *
    * Exactness device: presence counts are exact integers (items dedup
    * within a basket first), and every ratio is ONE floor to micro
    * units — `lift_micro = floordiv(1e6·c_ab·N, c_a·c_b)` — so the
    * (lift desc, a, b) top-k cut is total-ordered and replayable.
    *
    * Scale shape: the pair join is per-basket self-join — Σ|basket|²,
    * the wedge-bomb shape — so baskets larger than `maxBasketSize`
    * items are EXCLUDED by construction (the [[graft.operators.Graph
    * .adamicAdar]] hub-guard lesson; N counts only surviving baskets,
    * keeping every probability consistent). `minPairCount` prunes the
    * pair tail BEFORE the stats joins; item counts broadcast onto the
    * surviving pairs. */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
                       minPairCount: Long = 2L, topK: Int = 100,
                       maxBasketSize: Int = 1000): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    val items = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    import org.apache.spark.sql.expressions.Window
    // basket-size guard as a window over the distinct items, not a
    // self-join: the join shape evaluated the caller's whole upstream
    // (fact-dim join + distinct) TWICE — once per join side — and paid
    // an extra shuffle; the window reuses the distinct's partitioning
    // (same key, no second exchange) and keeps exactly the same rows
    val kept = items
      .withColumn("__sz",
        count(lit(1)).over(Window.partitionBy(col("__b"))))
      .filter(col("__sz") <= maxBasketSize)
      .drop("__sz")
      .localCheckpoint() // reused three times below; cut the lineage
    val nB = kept.select(col("__b")).distinct().count()
    val itemCnt = kept.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val pairs = kept.select(col("__b"), col("__i").as("item_a"))
      .join(kept.select(col("__b"), col("__i").as("item_b")), Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minPairCount)
    def fdiv(a: Column, b: Column) =
      ((a - pmod(a, b)) / b).cast("long")
    pairs
      .join(broadcast(itemCnt.select(col("__i").as("item_a"),
        col("__c").as("count_a"))), Seq("item_a"))
      .join(broadcast(itemCnt.select(col("__i").as("item_b"),
        col("__c").as("count_b"))), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("pair_count"),
        col("count_a"), col("count_b"),
        fdiv(lit(1000000L) * col("pair_count"), lit(nB))
          .as("support_micro"),
        fdiv(lit(1000000L) * col("pair_count"), col("count_a"))
          .as("conf_a_to_b_micro"),
        fdiv(lit(1000000L) * col("pair_count"), col("count_b"))
          .as("conf_b_to_a_micro"),
        fdiv(lit(1000000L) * col("pair_count") * lit(nB),
          col("count_a") * col("count_b")).as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }
}
