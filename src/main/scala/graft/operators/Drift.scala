package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-drift monitors between a reference and a current slice
  * of the same column — the check an ingest pipeline runs per snapshot
  * ("did this crawl's value distribution move?") before a drifted batch
  * poisons downstream statistics. Complements the per-key anomaly
  * z-scores (Ranking.groupZScores) and the unigram JS divergence
  * (Corpus.unigramJsDivergence), which watch keys and text rather than a
  * numeric column's shape.
  */
object Drift {
  import graft.util.DriverBound.collectBounded

  /** Hard bound for the daily-calendar sidecars every daily monitor
    * folds on the driver: 20 000 days is 54+ years of daily data —
    * anything larger means the timestamp column isn't daily-bucketed
    * data (or the bucketing upstream broke), and collecting it would
    * OOM the driver silently. */
  private val MaxCalendarDays = 20000

  /** Population Stability Index per reference-decile bucket: cut the
    * reference into `k` equal-count buckets (quantile boundaries from
    * the scale-safe [[Ranking.globalNtile]], total-ordered by (value,
    * id)), place both slices into those buckets, and report each
    * bucket's `(p − q) · ln(p/q)` contribution with the standard +0.5
    * count smoothing so empty buckets stay finite. Σ contrib is the PSI
    * (rule of thumb: < 0.1 stable, > 0.25 drifted).
    *
    * Cross-engine exactness: boundaries are per-tile maxima of a
    * deterministic total order; bucket assignment is "smallest i with
    * v <= b_i" — pure double comparisons on identical values; p, q and
    * the contribution are a fixed double sequence on integer counts,
    * rounded to 6 dp.
    *
    * Returns (bucket 1..k, n_ref long, n_cur long, contrib double) —
    * all k buckets emitted even when empty. NULL values are excluded.
    * Scale shape: one range-partitioned sort of the REFERENCE for the
    * boundaries (k−1 doubles — a driver-bounded sidecar, the
    * globalRunningSum discipline), then one map-combinable bucket count
    * per slice; the k-row shape frame broadcasts. */
  /** Two-sample Kolmogorov–Smirnov statistic: `D = max_x |F_ref(x) −
    * F_cur(x)|` over the observed support — the binning-free complement
    * of [[psiBuckets]] (PSI answers "how much mass moved between my
    * buckets"; KS answers "how far apart are the CDFs, anywhere").
    *
    * Returns ONE row: (at_value double — the smallest value attaining
    * the max, d_stat double round(6), n_ref long, n_cur long). NULLs
    * excluded. Every per-value step is exact integer CDF counts through
    * identical double divisions, so the argmax and the statistic replay
    * across engines with no pre-rounding.
    *
    * Scale shape: both slices collapse to per-DISTINCT-VALUE counts
    * first (map-combinable), then the CDF is two [[Ranking
    * .globalRunningSum]] passes over that distinct-value frame — the
    * prefix-sum cure for `SUM() OVER (ORDER BY)`'s single-partition
    * trap; the final argmax is a 1-row TakeOrdered. */
  def ksStatistic(ref: DataFrame, cur: DataFrame,
                  valCol: String): DataFrame = {
    def counted(df: DataFrame, as: String) =
      df.filter(col(valCol).isNotNull)
        .select(col(valCol).cast("double").as("__v"))
        .groupBy(col("__v")).agg(count(lit(1)).as(as))
    // materialize the per-distinct-value count frames ONCE: the totals
    // actions below and the running-sum passes are separate actions, and
    // each would otherwise re-execute the caller's upstream pipeline
    val r = counted(ref, "__nr").localCheckpoint()
    val c = counted(cur, "__nc").localCheckpoint()
    val nR = r.agg(coalesce(sum(col("__nr")), lit(0L))).first.getLong(0)
    val nC = c.agg(coalesce(sum(col("__nc")), lit(0L))).first.getLong(0)
    require(nR > 0 && nC > 0, "ksStatistic needs non-empty slices")
    val g = r.join(c, Seq("__v"), "full")
    val cum = Ranking.globalRunningSum(
      Ranking.globalRunningSum(g, Seq(col("__v")), "__nr", "__cr"),
      Seq(col("__v")), "__nc", "__cc")
    val diff = abs(col("__cr").cast("double") / lit(nR.toDouble)
      - col("__cc").cast("double") / lit(nC.toDouble))
    cum.select(col("__v"), diff.as("__d"))
      .orderBy(col("__d").desc, col("__v"))
      .limit(1)
      .select(col("__v").as("at_value"), round(col("__d"), 6).as("d_stat"),
        lit(nR).as("n_ref"), lit(nC).as("n_cur"))
  }

  /** Exact 1-D Wasserstein-1 distance (earth mover's distance) between
    * two numeric slices — the third leg of the numeric-drift stool:
    * [[psiBuckets]] needs bins, [[ksStatistic]] reports only the WORST
    * CDF gap; W₁ = ∫|F_ref − F_cur| dx integrates the whole gap, so a
    * broad small shift and a narrow large one rank the way an embedding
    * or length distribution actually moved (Ramdas, García Trillos &
    * Cuturi 2017 survey the two-sample use).
    *
    * Exactness device: values quantize to the micro-unit grid
    * (`floor(v·1e6)` — the same double multiply+floor in any engine),
    * then `W₁·nR·nC·1e6 = Σ_i |cr_i·nC − cc_i·nR|·(vq_{i+1} − vq_i)` is
    * a sum of exact integers in DECIMAL(38,0) — order-free, no float
    * accumulation anywhere — and the statistic is ONE final double
    * division, round(6). Returns one row: (w1 double round(6),
    * n_ref long, n_cur long). NULLs excluded; both slices must be
    * non-empty.
    *
    * Scale shape: both slices collapse to per-DISTINCT-quantized-value
    * counts (map-combinable), the CDF is two [[Ranking
    * .globalRunningSum]] passes + one [[Ranking.globalRowNumber]] over
    * that distinct-value frame (range exchanges, no single-partition
    * window), the gap term is a rank+1 self-equi-join on the narrow
    * numbered frame, and the total is one map-combinable DECIMAL sum. */
  def wasserstein1d(ref: DataFrame, cur: DataFrame,
                    valCol: String): DataFrame = {
    def counted(df: DataFrame, as: String) =
      df.filter(col(valCol).isNotNull)
        .select(floor(col(valCol).cast("double") * lit(1e6))
          .cast("long").as("__vq"))
        .groupBy(col("__vq")).agg(count(lit(1)).as(as))
    // same multi-action recompute hazard as ksStatistic: materialize the
    // small distinct-value count frames before the totals actions
    val r = counted(ref, "__nr").localCheckpoint()
    val c = counted(cur, "__nc").localCheckpoint()
    val nR = r.agg(coalesce(sum(col("__nr")), lit(0L))).first.getLong(0)
    val nC = c.agg(coalesce(sum(col("__nc")), lit(0L))).first.getLong(0)
    require(nR > 0 && nC > 0, "wasserstein1d needs non-empty slices")
    val g = r.join(c, Seq("__vq"), "full")
    val cum = Ranking.globalRunningSum(
      Ranking.globalRunningSum(
        Ranking.globalRowNumber(g, Seq(col("__vq")), out = "__rn"),
        Seq(col("__vq")), "__nr", "__cr"),
      Seq(col("__vq")), "__nc", "__cc")
    val nxt = cum.select((col("__rn") - 1).as("__rn"),
      col("__vq").as("__vq_next"))
    // inner join drops only the LAST distinct value, where both CDFs
    // are 1 and the term is 0 by construction
    val dec = DecimalType(38, 0)
    val terms = cum.join(nxt, Seq("__rn"))
      .select((abs(col("__cr").cast(dec) * lit(nC) -
          col("__cc").cast(dec) * lit(nR)) *
        (col("__vq_next") - col("__vq")).cast(dec)).as("__t"))
    terms.agg(coalesce(sum(col("__t")), lit(0).cast(dec)).as("__s"))
      .select(
        (round(col("__s").cast("double") /
          (lit(nR.toDouble) * lit(nC.toDouble) * lit(1e6)), 6) + lit(0.0))
          .as("w1"),
        lit(nR).as("n_ref"), lit(nC).as("n_cur"))
  }

  /** Chi-square contingency drift for a CATEGORICAL column — the
    * complement of [[ksStatistic]]/[[psiBuckets]], which need an
    * ordered numeric domain: did the category MIX shift between two
    * snapshots ("is this crawl suddenly 80% one event type")?
    *
    * Builds the 2×k contingency table (slice × category) and reports,
    * per category, both slices' `(o − e)² / e` terms summed —
    * Σ contrib is the χ² statistic with k−1 degrees of freedom.
    * Expected counts are `e = rowTotal · colTotal / n`, the fixed
    * double sequence `(nCat · nSlice) / n` on exact integer counts, so
    * the contributions replay across engines; round(6)+0.0 guards the
    * zero corner. Categories absent from one slice contribute their
    * full expected mass (o = 0) — that IS the drift signal.
    *
    * Returns one row per category seen in either slice: (category,
    * n_ref long, n_cur long, contrib double), category ascending.
    * NULL categories are excluded. Scale shape: two map-combinable
    * groupBy-counts and a k-row full join — no sorts, no windows; the
    * two scalar totals are driver-bounded sidecars. */
  def chiSquareDrift(ref: DataFrame, cur: DataFrame,
                     catCol: String): DataFrame =
    chiSquareAgainstReference(cur, catCol, categoryCounts(ref, catCol))

  /** The reference slice's per-category counts as a driver sidecar —
    * compute ONCE, then score any number of slices or micro-batches
    * with [[chiSquareAgainstReference]]. The |categories| bound is
    * ENFORCED, not documented: `limit(cap+1)` caps what can reach the
    * driver, so passing an id/URL column by mistake fails loudly
    * instead of OOMing the driver at scale. */
  def categoryCounts(df: DataFrame, catCol: String,
                     maxCategories: Int = 65536): Seq[(String, Long)] =
    graft.util.DriverBound.collectBounded(
        df.filter(col(catCol).isNotNull)
          .select(col(catCol).cast("string").as("category"))
          .groupBy(col("category")).agg(count(lit(1)).as("n")),
        maxCategories, s"categoryCounts($catCol)")
      .map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy(_._1)

  /** Score one slice against a PRECOMPUTED reference — the scoring half
    * of [[chiSquareDrift]], reusable per micro-batch by the streaming
    * categorical-drift monitor. Same output contract. */
  def chiSquareAgainstReference(cur: DataFrame, catCol: String,
                                refCounts: Seq[(String, Long)]): DataFrame = {
    val nR = refCounts.map(_._2).sum
    val spark = cur.sparkSession
    import spark.implicits._
    // no broadcast hint: full outer joins can't broadcast-build, and the
    // ref frame is |categories| rows — the shuffle is trivial by design
    val r = refCounts.toDF("category", "n_ref")
    // materialize the ≤|categories|-row count frame ONCE: the nC total
    // below is a separate action, and un-materialized it re-scanned the
    // whole slice (per MICRO-BATCH in the streaming monitor)
    val c = cur.filter(col(catCol).isNotNull)
      .select(col(catCol).cast("string").as("category"))
      .groupBy(col("category")).agg(count(lit(1)).as("n_cur"))
      .localCheckpoint()
    val nC = c.agg(coalesce(sum(col("n_cur")), lit(0L))).first.getLong(0)
    require(nR > 0 && nC > 0, "chiSquareDrift needs non-empty slices")
    val n = (nR + nC).toDouble
    val g = r.join(c, Seq("category"), "full")
      .select(col("category"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    def term(o: Column, slice: Long) = {
      val e = (col("n_ref") + col("n_cur")).cast("double") *
        lit(slice.toDouble) / lit(n)
      (o.cast("double") - e) * (o.cast("double") - e) / e
    }
    g.select(col("category"), col("n_ref"), col("n_cur"),
        (round(term(col("n_ref"), nR) + term(col("n_cur"), nC), 6) +
          lit(0.0)).as("contrib"))
      .orderBy(col("category"))
  }

  /** Cramér's V — the [0, 1]-normalized effect size of
    * [[chiSquareDrift]]'s χ²: `sqrt(χ² / (n · min(r−1, k−1)))` with
    * r = 2 slices, so `sqrt(χ² / n)`. One row: (chi2 double, v double,
    * n long, k long).
    *
    * Cross-engine exactness: per-category terms are the SAME rounded
    * doubles [[chiSquareDrift]] emits; χ² sums them as DECIMAL(28,6)
    * (exact, order-free — a plain double SUM would expose both
    * engines' accumulation order), and only then divides/sqrt's. */
  def cramersV(ref: DataFrame, cur: DataFrame, catCol: String): DataFrame = {
    val contrib = chiSquareDrift(ref, cur, catCol)
    val nRow = contrib
      .agg(sum(col("n_ref") + col("n_cur")).as("n"), count(lit(1)).as("k"),
        sum(col("contrib").cast("decimal(28,6)")).as("chi2d"))
      .first
    val n = nRow.getLong(0); val k = nRow.getLong(1)
    val chi2 = nRow.getDecimal(2).doubleValue
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val spark = ref.sparkSession
    import spark.implicits._
    Seq((chi2, r6(math.sqrt(chi2 / n)), n, k)).toDF("chi2", "v", "n", "k")
  }

  /** Per-dimension embedding mean drift between two corpus slices — the
    * linear-kernel MMD decomposition: `MMD² = ||μ_ref − μ_cur||²`, here
    * reported per dimension so the drifted axes are visible, not just
    * the scalar. The embedding-space complement of the scalar monitors:
    * PSI/KS watch one numeric column; this watches where the REPRESENTATION
    * moved (a new crawl source, a tokenizer change, an encoder swap all
    * show up as mean shift long before downstream metrics do).
    *
    * Cross-engine exactness: each float component is floor-quantized to
    * integer nano-units (`⌊x·10⁹⌋` — the same double multiply and floor
    * in every engine; a float→DECIMAL cast is NOT portable, the engines
    * round the 9th digit differently), so per-dimension sums are exact
    * integers; each mean is the fixed sequence `(S/n)/10⁹`, round(9);
    * the per-dim |Δ| is a difference of those rounded doubles.
    *
    * Returns (dim 0.., mean_ref, mean_cur, drift double), dim ascending.
    * NULL vectors excluded. Scale shape: posexplode to (dim, x) with
    * map-side partial aggregation into d cells per task — the shuffle
    * carries d rows per partition, not n·d. */
  def embeddingMeanDrift(ref: DataFrame, cur: DataFrame,
                         vecCol: String): DataFrame = {
    def dimSums(df: DataFrame, n: String, s: String) =
      df.filter(col(vecCol).isNotNull)
        .select(posexplode(col(vecCol)).as(Seq("dim", "__x")))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as(n),
          sum(floor(col("__x").cast("double") * lit(1.0e9)).cast("long")
            .cast("decimal(38,0)")).as(s))
    val r = dimSums(ref, "__nr", "__sr")
    val c = dimSums(cur, "__nc", "__sc")
    def mean(s: String, n: String) = round(
      col(s).cast("double") / col(n).cast("double") / lit(1.0e9), 9)
    val mr = mean("__sr", "__nr")
    val mc = mean("__sc", "__nc")
    r.join(c, Seq("dim"))
      .select(col("dim").cast("long").as("dim"),
        (mr + lit(0.0)).as("mean_ref"), (mc + lit(0.0)).as("mean_cur"))
      .withColumn("drift",
        round(abs(col("mean_ref") - col("mean_cur")), 9) + lit(0.0))
      .orderBy(col("dim"))
  }

  /** The scalar linear-kernel MMD² off [[embeddingMeanDrift]]: each
    * squared per-dim drift (a deterministic product of two doubles) is
    * cast straight to DECIMAL(38,18) — same 18-dp rounding of the same
    * binary value in every engine, no tie cases for non-dyadic products
    * — summed exactly, one row (mmd2 double round(12), dims long). */
  def embeddingMmd2(ref: DataFrame, cur: DataFrame,
                    vecCol: String): DataFrame =
    embeddingMeanDrift(ref, cur, vecCol)
      .select((col("drift") * col("drift")).cast("decimal(38,18)").as("__d2"))
      .agg((round(sum(col("__d2")).cast("double"), 12) + lit(0.0)).as("mmd2"),
        count(lit(1)).as("dims"))

  def psiBuckets(ref: DataFrame, cur: DataFrame, valCol: String,
                 idCol: String, k: Int = 10): DataFrame = {
    val bounds = referenceBoundaries(ref, valCol, idCol, k)
    val refCounts = bucketCounts(ref, valCol, bounds, k)
    psiAgainstReference(cur, valCol, bounds, refCounts)
  }

  /** The reference's quantile cut points (k−1 ascending doubles) —
    * compute ONCE, then score any number of slices or micro-batches
    * against them with [[psiAgainstReference]]. A driver-bounded
    * sidecar by construction. */
  def referenceBoundaries(ref: DataFrame, valCol: String, idCol: String,
                          k: Int): Array[Double] = {
    require(k >= 2, s"need at least 2 buckets, got $k")
    val r = ref.filter(col(valCol).isNotNull)
      .select(col(valCol).cast("double").as("__v"), col(idCol).as("__id"))
    val bounds = collectBounded(
        Ranking.globalNtile(r, k, Seq(col("__v"), col("__id")),
          out = "__tile")
          .filter(col("__tile") < k)
          .groupBy(col("__tile")).agg(max(col("__v")).as("__b")),
        k, "referenceBoundaries")
      .map(_.getDouble(1)).sorted
    require(bounds.nonEmpty, "psi needs a non-empty reference slice")
    bounds
  }

  /** "Smallest i with v <= bounds(i−1), else k" as a chained CASE. */
  private def bucketOf(bounds: Array[Double], k: Int) =
    bounds.zipWithIndex
      .foldLeft(Option.empty[org.apache.spark.sql.Column]) {
        case (acc, (b, i)) =>
          Some(acc.fold(when(col("__v") <= b, lit(i + 1)))(
            _.when(col("__v") <= b, lit(i + 1))))
      }.get.otherwise(lit(k))

  /** Per-bucket counts of a slice under fixed boundaries, as a length-k
    * array indexed by bucket−1 (zero for empty buckets). */
  def bucketCounts(df: DataFrame, valCol: String, bounds: Array[Double],
                   k: Int): Array[Long] = {
    val rows = collectBounded(
        df.filter(col(valCol).isNotNull)
          .select(col(valCol).cast("double").as("__v"))
          .select(bucketOf(bounds, k).as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("n")),
        k + 1, "bucketCounts")
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    Array.tabulate(k)(i => rows.getOrElse(i + 1, 0L))
  }

  /** PSI of one slice against a PRECOMPUTED reference (boundaries +
    * per-bucket counts): the scoring half of [[psiBuckets]], reusable
    * per micro-batch by the streaming drift monitor — the reference
    * never recomputes. Same output contract as [[psiBuckets]]. */
  def psiAgainstReference(cur: DataFrame, valCol: String,
                          bounds: Array[Double],
                          refCounts: Array[Long]): DataFrame = {
    val k = refCounts.length
    require(bounds.length == k - 1,
      s"need ${k - 1} boundaries for $k buckets, got ${bounds.length}")
    val spark = cur.sparkSession
    val c = cur.filter(col(valCol).isNotNull)
      .select(col(valCol).cast("double").as("__v"))
    val nR = refCounts.sum.toDouble
    import spark.implicits._
    val shape = refCounts.zipWithIndex
      .map { case (n, i) => (i + 1, n) }.toSeq.toDF("bucket", "n_ref")
    // ONE scan of the slice: every non-null value lands in exactly one
    // bucket, so the slice total is the sum of the materialized ≤k-row
    // bucket counts — the separate c.count() action re-scanned the
    // whole slice (per MICRO-BATCH in the streaming monitor)
    val counted = c.select(bucketOf(bounds, k).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_cur"))
      .localCheckpoint()
    val nC = counted.agg(coalesce(sum(col("n_cur")), lit(0L)))
      .first.getLong(0).toDouble
    val p = (col("n_ref").cast("double") + lit(0.5)) / lit(nR + 0.5 * k)
    val q = (coalesce(col("n_cur"), lit(0L)).cast("double") + lit(0.5)) /
      lit(nC + 0.5 * k)
    // hint the RIGHT (non-preserved) side: `counted` is the ≤k-row
    // bucket aggregate; a broadcast hint on the preserved side of a
    // left join is unsupported and only logged a warning
    shape
      .join(broadcast(counted), Seq("bucket"), "left")
      .select(col("bucket"), col("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        round((p - q) * log(p / q), 6).as("contrib"))
      .orderBy(col("bucket"))
  }

  /** One-sided CUSUM change detector (Page, Biometrika 1954) over daily
    * event counts: the sequential scheme that catches a persistent mean
    * SHIFT long before a per-bucket z-score fires — small daily excesses
    * accumulate instead of resetting. The first `refBuckets` days are
    * the in-control baseline μ0; each monitored day contributes its
    * deviation from μ0 (minus `slackPerBucket`, CUSUM's allowance k) and
    * the statistic is clamped at zero: S_b = max(0, S_{b−1} + d_b).
    *
    * EXACT INTEGER arithmetic throughout: μ0 = sum_ref / n_ref is never
    * divided — deviations are scaled by n_ref
    * (`d_b = (x_b − slack)·n_ref − sum_ref`), so S is in count·n_ref
    * units and `alarm` fires when S > threshold·n_ref (threshold in
    * per-bucket count units). Bit-identical in any engine.
    *
    * Returns one row per monitored (post-reference) day: (bucket date,
    * x long, cusum long — scaled units, alarm long 0/1).
    *
    * Scale shape: the distributed work is one map-combinable count by
    * calendar day; the recurrence folds driver-side over the bucket
    * frame — bounded by CALENDAR DAYS, not data volume (a 100 TB year
    * is 365 rows), the same bounded-sidecar discipline as hllEstimate. */
  def cusumDailyCounts(df: DataFrame, tsCol: String, refBuckets: Int = 7,
                       slackPerBucket: Long = 0L,
                       thresholdPerBucket: Long = 100L): DataFrame = {
    require(refBuckets >= 1, s"refBuckets must be >= 1, got $refBuckets")
    val spark = df.sparkSession
    val buckets = collectBounded(
        df.filter(col(tsCol).isNotNull)
          .select(to_date(date_trunc("day", col(tsCol))).as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("x"))
          .orderBy(col("bucket")),
        MaxCalendarDays, "cusumDailyCounts")
      .map(r => (r.getDate(0), r.getLong(1)))
    require(buckets.length > refBuckets,
      s"need more than $refBuckets buckets, got ${buckets.length}")
    val ref = buckets.take(refBuckets)
    val nRef = ref.length.toLong
    val sumRef = ref.map(_._2).sum
    var s = 0L
    val rows = buckets.drop(refBuckets).map { case (b, x) =>
      val d = (x - slackPerBucket) * nRef - sumRef
      s = math.max(0L, s + d)
      (b, x, s, if (s > thresholdPerBucket * nRef) 1L else 0L)
    }.toSeq
    import spark.implicits._
    rows.toDF("bucket", "x", "cusum", "alarm").orderBy(col("bucket"))
  }

  /** Theil–Sen trend over daily event counts — the median of all
    * pairwise slopes (Theil 1950, Sen 1968): breakdown point 29%, so a
    * handful of outage days or backfill spikes cannot swing the trend
    * the way least squares would. Days are indexed 1..n in date order;
    * each slope is one double division of two small exact integers, the
    * median is the explicit order statistic (middle element, or the
    * exact mean of the two middles — commutative, so engine sort-tie
    * order is irrelevant).
    *
    * Returns one row: (n_days, n_pairs, slope_per_day round(6)).
    *
    * Scale shape: one count-by-day aggregate distributed; the O(days²)
    * pair enumeration folds over the calendar-bounded sidecar (a year
    * is 365 days → 66k slopes on the driver — trivial), the same
    * discipline as [[cusumDailyCounts]]. */
  def theilSenDailyTrend(df: DataFrame, tsCol: String): DataFrame = {
    val spark = df.sparkSession
    // tighter cap than the other daily monitors: the slope fold is
    // O(days²) driver memory (4096 days is already 8.4M slopes)
    val ys = collectBounded(
        df.filter(col(tsCol).isNotNull)
          .select(to_date(date_trunc("day", col(tsCol))).as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("y"))
          .orderBy(col("bucket")),
        4096, "theilSenDailyTrend")
      .map(_.getLong(1))
    require(ys.length >= 2, s"need >= 2 buckets, got ${ys.length}")
    val slopes = (for {
      i <- ys.indices; j <- (i + 1) until ys.length
    } yield (ys(j) - ys(i)).toDouble / (j - i).toDouble).sorted
    val n = slopes.length
    val med =
      if (n % 2 == 1) slopes(n / 2)
      else (slopes(n / 2 - 1) + slopes(n / 2)) / 2.0
    val r6 = BigDecimal(med)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    import spark.implicits._
    Seq((ys.length.toLong, n.toLong, r6))
      .toDF("n_days", "n_pairs", "slope_per_day")
  }

  /** Mann–Kendall trend test over daily event counts — the
    * significance-test partner of [[theilSenDailyTrend]]: S = Σ_{i<j}
    * sign(y_j − y_i) is an EXACT integer, the tie-corrected variance
    * numerator n(n−1)(2n+5) − Σ t(t−1)(2t+5) is an exact integer, and
    * the continuity-corrected z = (S ∓ 1)/√(num/18) is three double ops.
    * Returns one row: (n_days, s_stat long, var_s round(6), z round(6)).
    * Same calendar-bounded-sidecar shape as the other daily monitors. */
  def mannKendallDailyTrend(df: DataFrame, tsCol: String): DataFrame = {
    val spark = df.sparkSession
    val ys = collectBounded(
        df.filter(col(tsCol).isNotNull)
          .select(to_date(date_trunc("day", col(tsCol))).as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("y"))
          .orderBy(col("bucket")),
        MaxCalendarDays, "mannKendallDailyTrend")
      .map(_.getLong(1))
    val n = ys.length.toLong
    require(n >= 3, s"need >= 3 buckets, got $n")
    var s = 0L
    for (i <- ys.indices; j <- (i + 1) until ys.length)
      s += java.lang.Long.signum(ys(j) - ys(i)).toLong
    val tieTerm = ys.groupBy(identity).values.map(_.size.toLong)
      .filter(_ > 1L).map(t => t * (t - 1L) * (2L * t + 5L)).sum
    val num = n * (n - 1L) * (2L * n + 5L) - tieTerm
    val varS = num.toDouble / 18.0
    val z =
      if (s > 0L) (s - 1L).toDouble / math.sqrt(varS)
      else if (s < 0L) (s + 1L).toDouble / math.sqrt(varS)
      else 0.0
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + 0.0
    import spark.implicits._
    Seq((n, s, r6(varS), r6(z))).toDF("n_days", "s_stat", "var_s", "z")
  }

  /** Day-of-week seasonality profile: per weekday (1=Sunday … 7, the
    * Spark `dayofweek` convention), the distinct-day count, event total,
    * and the RATIO of that weekday's events-per-day to the overall
    * events-per-day — computed as one division of two exact integer
    * products ((events_d · total_days) / (days_d · total_events)), so
    * the per-day means are never materialized as doubles. Ratio > 1 =
    * busier-than-typical weekday; the profile is the denominator for
    * deseasonalized monitoring. Fully distributed: a count by calendar
    * day, a 7-group rollup, and a broadcast 1-row total. */
  def dayOfWeekProfile(df: DataFrame, tsCol: String): DataFrame = {
    val byDay = df.filter(col(tsCol).isNotNull)
      .select(to_date(date_trunc("day", col(tsCol))).as("__d"))
      .groupBy(col("__d")).agg(count(lit(1)).as("__y"))
    val byDow = byDay
      .groupBy(dayofweek(col("__d")).cast("long").as("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("__y")).as("n_events"))
    val tot = byDay.agg(count(lit(1)).as("__td"), sum(col("__y")).as("__te"))
    byDow.join(broadcast(tot))
      .select(col("dow"), col("n_days"), col("n_events"),
        (round((col("n_events") * col("__td")).cast("double") /
          (col("n_days") * col("__te")).cast("double"), 6) + lit(0.0))
          .as("ratio"))
      .orderBy(col("dow"))
  }

  /** Lag-k autocorrelation of the daily series, k = 1..`maxLag` — the
    * seasonality/stickiness fingerprint (a weekly cycle shows as a
    * positive spike at lag 7). Computed in the N-scaled integer form:
    * with S = Σy, both Σ(N·y_t − S)(N·y_{t+k} − S) and the lag-0
    * denominator are EXACT integers; r_k is one double division.
    * Returns (lag, n_pairs, r round(6)) per lag; same calendar-bounded
    * sidecar fold as the other daily monitors. Exactness bound: the
    * c² terms are longs, so daily counts must stay below ~3·10⁹/N —
    * rescale the series (e.g. to thousands) for volumes beyond that. */
  def autocorrDaily(df: DataFrame, tsCol: String,
                    maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val spark = df.sparkSession
    val ys = collectBounded(
        df.filter(col(tsCol).isNotNull)
          .select(to_date(date_trunc("day", col(tsCol))).as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("y"))
          .orderBy(col("bucket")),
        MaxCalendarDays, "autocorrDaily")
      .map(_.getLong(1))
    val n = ys.length
    require(n > maxLag, s"need > $maxLag buckets, got $n")
    val s = ys.sum
    val c = ys.map(y => n * y - s) // N-scaled centering, exact longs
    val den = c.map(v => v * v).sum
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + 0.0
    val rows = (1 to maxLag).map { k =>
      val num = (0 until n - k).map(i => c(i) * c(i + k)).sum
      val r = if (den == 0L) 0.0 else num.toDouble / den.toDouble
      (k.toLong, (n - k).toLong, r6(r))
    }
    import spark.implicits._
    rows.toDF("lag", "n_pairs", "r").orderBy(col("lag"))
  }

  /** EWMA control chart (Roberts, Technometrics 1959) over daily event
    * counts — the monitor between the per-bucket z-score (memoryless)
    * and CUSUM (infinite memory): the smoothed statistic
    * `z_t = α·x_t + (1−α)·z_{t−1}` forgets geometrically, so it catches
    * SMALL persistent shifts a z-score misses without CUSUM's
    * never-resets behavior. α = 1/2^`alphaBits`, and the recurrence is
    * EXACT INTEGER floor arithmetic on a ×`nRef` grid:
    * `z_t = (x_t·nRef + (2^a−1)·z_{t−1}) div 2^a` with
    * `z_0 = sum_ref` (= μ0·nRef), alarm when |z_t − sum_ref| >
    * `thresholdPerBucket`·nRef. Truncating division on both engines
    * (Spark `div`, DuckDB `//`, Scala `/` all truncate toward zero),
    * so a run is bit-reproducible.
    *
    * Returns one row per monitored (post-reference) day: (bucket, x,
    * ewma long — ×nRef units, dev long — |z−μ0·nRef|, alarm 0/1).
    *
    * Scale shape: identical to [[cusumDailyCounts]] — one
    * map-combinable count-by-day distributed; the recurrence folds over
    * the calendar-bounded sidecar (a 100 TB year is 365 rows). */
  def ewmaDailyBand(df: DataFrame, tsCol: String, refBuckets: Int = 7,
                    alphaBits: Int = 2,
                    thresholdPerBucket: Long = 50L): DataFrame =
    ewmaOverDailyCounts(
      df.filter(col(tsCol).isNotNull)
        .select(to_date(date_trunc("day", col(tsCol))).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("x")),
      refBuckets, alphaBits, thresholdPerBucket)

  /** [[ewmaDailyBand]] over a PRE-AGGREGATED (bucket date, x long)
    * frame — the entry point for maintained count registers (the
    * streaming sidecar: per-batch daily-count frames fold by keyed sum,
    * which equals the whole-history counts exactly, then this
    * recurrence runs over the bounded calendar series). Duplicate
    * bucket rows sum (shard/batch frames fold associatively). */
  def ewmaOverDailyCounts(counts: DataFrame, refBuckets: Int = 7,
                          alphaBits: Int = 2,
                          thresholdPerBucket: Long = 50L): DataFrame = {
    require(refBuckets >= 1, s"refBuckets must be >= 1, got $refBuckets")
    require(alphaBits >= 1 && alphaBits <= 8,
      s"alphaBits must be in [1,8], got $alphaBits")
    val spark = counts.sparkSession
    val buckets = collectBounded(
        counts.groupBy(col("bucket")).agg(sum(col("x")).as("x"))
          .orderBy(col("bucket")),
        MaxCalendarDays, "ewmaOverDailyCounts")
      .map(r => (r.getDate(0), r.getLong(1)))
    require(buckets.length > refBuckets,
      s"need more than $refBuckets buckets, got ${buckets.length}")
    val ref = buckets.take(refBuckets)
    val nRef = ref.length.toLong
    val sumRef = ref.map(_._2).sum
    val twoA = 1L << alphaBits
    var z = sumRef // μ0 · nRef
    val rows = buckets.drop(refBuckets).map { case (b, x) =>
      z = (x * nRef + (twoA - 1L) * z) / twoA
      val dev = math.abs(z - sumRef)
      (b, x, z, dev, if (dev > thresholdPerBucket * nRef) 1L else 0L)
    }.toSeq
    import spark.implicits._
    rows.toDF("bucket", "x", "ewma", "dev", "alarm").orderBy(col("bucket"))
  }

  /** Kaplan–Meier product-limit survival estimate (Kaplan & Meier,
    * JASA 1958) over INTEGER durations with right censoring — the
    * censoring-correct answer to "what fraction of users have not yet
    * converted by day t", where a naive conversion-rate-by-day silently
    * treats the not-yet-converted as never-converting. Input: one row
    * per subject, `durCol` = integer duration units, `observedCol` =
    * 1/true if the event happened at that duration, 0/false if the
    * subject was CENSORED there (study ended, still at risk).
    *
    * Product-limit on a ×`scale` integer grid: at each distinct
    * duration t in order, `S' ← (S' · (n_t − d_t)) div n_t` with n_t =
    * subjects still at risk (duration ≥ t; same-day censorings count AS
    * at-risk, the standard events-before-censorings convention) and
    * d_t = events at t. Censoring-only days multiply by n/n — EXACTLY 1
    * in integer division, so they cannot drift the grid. Truncating
    * division both engines share ⇒ bit-reproducible; each step's floor
    * loses < 1 grid unit (1e−12), negligible against the estimator's
    * own variance.
    *
    * Returns one row per EVENT day: (t, n_risk, n_events, surv_grid
    * long, survival double round 6). Scale shape: one map-combinable
    * (duration → counts) aggregate distributed; the recurrence folds
    * over the duration-bounded sidecar (a year of days = 365 rows), the
    * [[cusumDailyCounts]] discipline. */
  def kaplanMeier(df: DataFrame, durCol: String, observedCol: String,
                  scale: Long = 1000000000000L): DataFrame = {
    require(scale >= 1000000L, s"scale too coarse: $scale")
    val spark = df.sparkSession
    // distinct DURATIONS drive this sidecar — a micro-resolution
    // duration column would explode it, so the bound is enforced:
    // pre-bucket durations (days, hours) before calling
    val days = collectBounded(
        df.filter(col(durCol).isNotNull && col(observedCol).isNotNull)
          .select(col(durCol).cast("long").as("t"),
            col(observedCol).cast("boolean").cast("long").as("o"))
          .groupBy(col("t"))
          .agg(sum(col("o")).as("d"), count(lit(1)).as("all"))
          .orderBy(col("t")),
        65536, "kaplanMeier")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    require(days.nonEmpty, "kaplanMeier needs at least one subject")
    var atRisk = days.map(_._3).sum
    require(atRisk < Long.MaxValue / scale,
      s"risk set $atRisk too large for the $scale grid (S·n must fit a " +
        "long); shrink scale or pre-aggregate")
    var s = scale
    val out = Seq.newBuilder[(Long, Long, Long, Long, Double)]
    days.foreach { case (t, d, all) =>
      s = s * (atRisk - d) / atRisk
      if (d >= 1L) {
        val r6 = BigDecimal(s.toDouble / scale.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
        out += ((t, atRisk, d, s, r6))
      }
      atRisk -= all
    }
    import spark.implicits._
    out.result().toDF("t", "n_risk", "n_events", "surv_grid", "survival")
      .orderBy(col("t"))
  }

  /** Holt double-exponential smoothing (Holt 1957; the linear-trend
    * member the daily-monitor family lacked): level `l` and trend `b`
    * evolve as `l_t = α·x_t + (1−α)(l_{t−1}+b_{t−1})`,
    * `b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}`, and the one-step-ahead
    * forecast `f_t = l_{t−1}+b_{t−1}` yields residuals that stay small
    * under a steady TREND — where EWMA/CUSUM against a flat μ0 alarm on
    * every growing series. α = 1/2^`alphaBits`, β = 1/2^`betaBits`, all
    * state on a ×`scale` integer grid with truncating division
    * (identical in Spark/DuckDB/Scala), initialized textbook-style from
    * the first two buckets: l = x_1·scale, b = (x_2−x_1)·scale.
    *
    * Returns one row per bucket from the third on: (bucket, x,
    * forecast/level/trend longs — ×scale units, resid long — x·scale −
    * forecast, alarm 0/1 when |resid| > thresholdPerBucket·scale).
    *
    * Same calendar-bounded-sidecar shape as [[cusumDailyCounts]]. */
  def holtDailyForecast(df: DataFrame, tsCol: String, alphaBits: Int = 2,
                        betaBits: Int = 3, thresholdPerBucket: Long = 50L,
                        scale: Long = 1000000L): DataFrame = {
    require(alphaBits >= 1 && alphaBits <= 8,
      s"alphaBits must be in [1,8], got $alphaBits")
    require(betaBits >= 1 && betaBits <= 8,
      s"betaBits must be in [1,8], got $betaBits")
    require(scale >= 1000L, s"scale too coarse: $scale")
    val spark = df.sparkSession
    val buckets = collectBounded(
        df.filter(col(tsCol).isNotNull)
          .select(to_date(date_trunc("day", col(tsCol))).as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("x"))
          .orderBy(col("bucket")),
        MaxCalendarDays, "holtDailyForecast")
      .map(r => (r.getDate(0), r.getLong(1)))
    require(buckets.length >= 3,
      s"need >= 3 buckets, got ${buckets.length}")
    val twoA = 1L << alphaBits
    val twoB = 1L << betaBits
    var l = buckets(0)._2 * scale
    var b = (buckets(1)._2 - buckets(0)._2) * scale
    val rows = buckets.drop(2).map { case (d, x) =>
      val f = l + b
      val lPrev = l
      l = (x * scale + (twoA - 1L) * f) / twoA
      b = ((l - lPrev) + (twoB - 1L) * b) / twoB
      val resid = x * scale - f
      (d, x, f, l, b, resid,
        if (math.abs(resid) > thresholdPerBucket * scale) 1L else 0L)
    }.toSeq
    import spark.implicits._
    rows.toDF("bucket", "x", "forecast", "level", "trend", "resid", "alarm")
      .orderBy(col("bucket"))
  }

  /** Additive seasonal decomposition of a daily event-count series —
    * the classical moving-average method (the first pass of STL /
    * census X-11, Cleveland et al. 1990 §2): `count = trend + seasonal
    * + remainder`, with trend the CENTERED 7-day moving average,
    * seasonal the per-weekday mean of the detrended series, and
    * remainder what neither explains. This is the monitor-side
    * decomposition the [[ewmaDailyBand]]/[[holtDailyForecast]] family
    * lacks: those smooth THROUGH weekly shape, this names it — a
    * weekend dip stops eating alarm budget and the remainder becomes
    * the clean anomaly channel.
    *
    * Exactness device: everything is micro-unit integer arithmetic —
    * `trend_micro = floordiv(1e6·Σ_{±3} count, 7)` (only days with all
    * 7 calendar neighbors present), `detrended = 1e6·count − trend`,
    * `seasonal_micro(s) = floordiv(Σ detrended over weekday s, n_s)`,
    * remainder the integer difference — with floordiv written
    * `(a − pmod(a, b)) / b` so negative detrended sums floor
    * identically in any engine. Weekday index = `epoch_day mod 7`
    * (0 = Thursday): calendar-stable, timezone-free, no engine
    * dayofweek convention to reconcile.
    *
    * Scale shape: after the one map-combinable daily count, every step
    * runs on |distinct days| rows. The centered window is an explode of
    * the 7 target days each count contributes to + a keyed re-sum — a
    * shuffle on the day key, NO single-partition global window — so
    * calendar gaps self-exclude (their neighbor count < 7) instead of
    * silently averaging over a shorter span. */
  def seasonalDecompose(df: DataFrame, tsCol: String,
                        halfWindow: Int = 3): DataFrame =
    seasonalDecomposeOverDailyCounts(
      df.filter(col(tsCol).isNotNull)
        .select(to_date(date_trunc("day", col(tsCol))).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("x")),
      halfWindow)

  /** [[seasonalDecompose]] over a PRE-AGGREGATED (bucket date, x long)
    * frame — the entry point for maintained count registers (the
    * [[ewmaOverDailyCounts]] streaming-sidecar contract): per-batch
    * daily-count frames fold by keyed sum, which equals the
    * whole-history counts exactly, then the decomposition runs over
    * the bounded calendar series. Duplicate bucket rows sum. */
  def seasonalDecomposeOverDailyCounts(counts: DataFrame,
                                       halfWindow: Int = 3): DataFrame = {
    require(halfWindow >= 1, s"halfWindow must be >= 1, got $halfWindow")
    val span = 2 * halfWindow + 1
    val daily = counts
      .groupBy(col("bucket")).agg(sum(col("x")).as("x"))
      .select(datediff(col("bucket"),
        lit("1970-01-01").cast("date")).cast("long").as("__d"), col("x"))
    def floordiv(a: Column, b: Column): Column = (a - pmod(a, b)) / b
    // each day's count contributes to the centered windows of its
    // ±halfWindow calendar neighbors; a full window re-sums exactly span
    val trend = daily
      .select(col("x"), explode(sequence(col("__d") - halfWindow,
        col("__d") + halfWindow)).as("__t"))
      .groupBy(col("__t")).agg(sum(col("x")).as("__s"),
        count(lit(1)).as("__n"))
      .filter(col("__n") === span)
      .select(col("__t").as("__d"),
        floordiv(lit(1000000L) * col("__s"), lit(span.toLong))
          .cast("long").as("trend_micro"))
    val det = daily.join(trend, Seq("__d"))
      .select(col("__d"), col("x"), col("trend_micro"),
        (lit(1000000L) * col("x") - col("trend_micro")).as("__det"),
        pmod(col("__d"), lit(7L)).as("season"))
    val seasonal = det.groupBy(col("season"))
      .agg(floordiv(sum(col("__det")), count(lit(1)))
        .cast("long").as("seasonal_micro"))
    det.join(seasonal, Seq("season"))
      .select(
        date_add(lit("1970-01-01").cast("date"),
          col("__d").cast("int")).as("bucket"),
        col("x"), col("season"), col("trend_micro"), col("seasonal_micro"),
        (col("__det") - col("seasonal_micro")).cast("long")
          .as("remainder_micro"))
      .orderBy(col("bucket"))
  }

  /** Fano factor (index of dispersion) of the per-type daily count
    * series — `F = Var/Mean` (Fano 1947): a Poisson-like arrival
    * process sits at F ≈ 1; F ≫ 1 is burst clustering (retries,
    * batch backfills, bot storms), F ≪ 1 is suspicious regularity
    * (schedulers, dedup artifacts). The one-number burstiness triage
    * BEFORE reaching for [[cusumShift]]/[[ewmaDailyBand]].
    *
    * Exactness: population variance over mean collapses to
    * `F_micro = floordiv(1e6·(n·Σx² − (Σx)²), n·Σx)` — exact integer
    * counts in, one floor out. Types with zero total report NULL. */
  def fanoFactorDaily(df: DataFrame, typeCol: String,
                      tsCol: String): DataFrame = {
    val daily = df.filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .groupBy(col(typeCol), to_date(date_trunc("day", col(tsCol)))
        .as("__day"))
      .agg(count(lit(1)).as("__x"))
    daily.groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_days"), sum(col("__x")).as("total"),
        sum(col("__x") * col("__x")).as("__sx2"))
      .select(col(typeCol), col("n_days"), col("total"),
        {
          // DECIMAL(38,0) end-to-end like the sibling exact rationals
          // (degreeAssortativity, spearmanRho): raw Long arithmetic
          // would wrap once 1e6*total^2 exceeds Long.MaxValue (~3e6
          // total events per type).
          def d(c: Column) = c.cast("decimal(38,0)")
          val num = d(lit(1000000L)) *
            (d(col("n_days")) * d(col("__sx2")) -
              d(col("total")) * d(col("total")))
          val den = d(col("n_days")) * d(col("total"))
          when(col("total") > 0L,
            ((num - pmod(num, den)) / den).cast("long"))
            .otherwise(lit(null).cast("long")).as("fano_micro")
        })
      .withColumn("fano", col("fano_micro").cast("double") / lit(1e6))
  }

  /** Discrete periodogram of the daily count series — the Schuster
    * power spectrum at integer frequencies k = 1..maxK cycles over the
    * observed CALENDAR span (max − min + 1 days, gap-safe):
    * `P(k) = C_k² + S_k²` with `C_k = Σ_t x_t·cos(2πkt/span)`
    * (Schuster 1898; the detection side of [[seasonalDecompose]] —
    * decomposition ASSUMES period 7, the periodogram shows which
    * periods are actually in the data, seasonal or injected: a weekly
    * rhythm on a 28-day span peaks at k = 4).
    *
    * Determinism device: each cosine/sine QUANTIZES before it touches
    * data — `floor(cos(angle)·1e6)` — so C/S are exact integer sums of
    * (count × micro-trig) products, order-free across partitions and
    * engines; the only cross-engine float surface is the libm cos/sin
    * of identical angle doubles (the adamicAdar ln discipline: one
    * IEEE call per (k, t), then integers). Power is reported as the
    * double `(C/1e6)² + (S/1e6)²`, round(6).
    *
    * Scale shape: one map-combinable daily count, a 1-row (min day,
    * span) broadcast to index t, an explode ×maxK (days × maxK rows —
    * thousands), one grouped integer sum. */
  def dailyPeriodogram(df: DataFrame, tsCol: String,
                       maxK: Int = 12): DataFrame =
    periodogramOverDailyCounts(
      df.filter(col(tsCol).isNotNull)
        .select(to_date(date_trunc("day", col(tsCol))).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("x")),
      maxK)

  /** [[dailyPeriodogram]] over a PRE-AGGREGATED (bucket date, x long)
    * frame — the [[seasonalDecomposeOverDailyCounts]] register
    * contract: per-batch daily-count frames fold by keyed sum, then
    * the spectrum reads the bounded series. Duplicate buckets sum. */
  def periodogramOverDailyCounts(counts: DataFrame,
                                 maxK: Int = 12): DataFrame = {
    require(maxK >= 1 && maxK <= 64, s"maxK must be in [1,64], got $maxK")
    val daily = counts
      .groupBy(col("bucket")).agg(sum(col("x")).as("x"))
      .select(datediff(col("bucket"),
        lit("1970-01-01").cast("date")).cast("long").as("__d"), col("x"))
    // the angle denominator is the CALENDAR span (max − min + 1), not
    // the count of observed days: t indexes by calendar offset, so on a
    // gappy series t can exceed the day count — span keeps "k cycles
    // over the observed span" true with or without gaps (on a gap-free
    // series the two coincide)
    val span = daily.agg(min(col("__d")).as("__d0"),
      (max(col("__d")) - min(col("__d")) + lit(1L)).as("__span"),
      count(lit(1)).as("__n"))
    val terms = daily.crossJoin(broadcast(span))
      .select(col("x"), (col("__d") - col("__d0")).as("__t"), col("__n"),
        col("__span"), explode(sequence(lit(1), lit(maxK))).as("k"))
      .select(col("k"), col("__n"), {
        val angle = lit(2.0) * lit(math.Pi) * col("k").cast("double") *
          col("__t").cast("double") / col("__span").cast("double")
        (col("x") * floor(cos(angle) * lit(1e6)).cast("long")).as("__c")
      }, {
        val angle = lit(2.0) * lit(math.Pi) * col("k").cast("double") *
          col("__t").cast("double") / col("__span").cast("double")
        (col("x") * floor(sin(angle) * lit(1e6)).cast("long")).as("__s")
      })
    terms.groupBy(col("k"))
      .agg(max(col("__n")).as("n_days"),
        sum(col("__c")).as("c_micro"), sum(col("__s")).as("s_micro"))
      .withColumn("power",
        round((col("c_micro").cast("double") / lit(1e6)) *
          (col("c_micro").cast("double") / lit(1e6)) +
          (col("s_micro").cast("double") / lit(1e6)) *
          (col("s_micro").cast("double") / lit(1e6)), 6) + lit(0.0))
      .orderBy(col("k"))
  }
}
