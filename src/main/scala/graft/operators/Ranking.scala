package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scale-safe global ranking.
  *
  * `row_number()/ntile() OVER (ORDER BY ...)` with no PARTITION BY moves
  * the ENTIRE dataset into one partition (Spark's WindowExec warns and
  * then does exactly that) — a guaranteed out-of-memory at 100 TB. These
  * operators produce the same numbers from a range-partitioned sort:
  * `repartitionByRange` gives globally ordered partitions, a per-partition
  * scan numbers rows locally, and partition row-counts (a tiny driver-side
  * array, one long per partition) turn local indices into global ones.
  * That is `RDD.zipWithIndex`: one extra count job, no single-partition
  * stage, every partition bounded by the range split.
  *
  * The reference delegates all ranking to Spark (SURVEY §2.9); these exist
  * because the Spark built-in is the wrong shape for a global total order.
  */
object Ranking {

  /** Append 1-based global row numbers in the total order of `sortCols`.
    *
    * `sortCols` must be a TOTAL order (break ties — e.g. end with the id
    * column): rows that compare equal may land in either range partition,
    * making their relative numbering nondeterministic otherwise.
    *
    * Cost: one range exchange + local sort + zipWithIndex's count job.
    * The RDD round-trip pins the schema before numbering, so apply column
    * pruning upstream.
    */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
                      out: String = "rn"): DataFrame = {
    require(sortCols.nonEmpty, "globalRowNumber needs at least one sort column")
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism,
      df.rdd.getNumPartitions)
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    // persist between zipWithIndex's internal count job and the real
    // pass — un-persisted, the range sort (and the caller's whole
    // upstream) ran TWICE per action (the globalRunningSum discipline)
    val rdd = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val numbered = rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(numbered, sorted.schema.add(out, LongType, nullable = false))
  }

  /** Append the standard SQL `NTILE(k)` bucket (1..k) over the global
    * total order of `sortCols` — computed from the global row number, not
    * a window: with n rows, q = n div k and r = n mod k, the first r
    * tiles get q+1 rows and the rest get q.
    *
    * The row count comes from `df.count()` BEFORE the ranking sort (a
    * pushdown-friendly count on the source, not a recompute of the sorted
    * lineage); the tile is then pure integer arithmetic on the row number.
    */
  def globalNtile(df: DataFrame, k: Int, sortCols: Seq[Column],
                  out: String = "tile"): DataFrame = {
    require(k >= 1, s"ntile bucket count must be >= 1, got $k")
    val n = df.count()
    val q = n / k
    val r = n % k
    val boundary = r * (q + 1) // rows 1..boundary live in the r fat tiles
    val withRn = globalRowNumber(df, sortCols, out = "__graft_rn")
    val i = col("__graft_rn")
    // integral `div`, not `/`: double division mis-floors at exact tile
    // boundaries once q approaches 2^53 / n
    def idiv(a: Column, b: Long) = call_function("div", a, lit(b))
    val tile =
      if (q == 0) i // n < k: every row its own tile
      else when(i <= boundary, idiv(i - 1, q + 1) + 1)
        .otherwise(lit(r) + idiv(i - lit(boundary) - 1, q) + 1)
    withRn
      .withColumn(out, tile.cast("long"))
      .drop("__graft_rn")
  }

  /** Append the global running (inclusive-prefix) sum of `valueCol` in
    * the total order of `sortCols` — the distributed prefix-sum:
    * `SUM(...) OVER (ORDER BY ...)` with no PARTITION BY is the same
    * single-partition trap as global row_number, and this is the same
    * cure. Range-partitioned sort → one tiny job collecting per-partition
    * sums (one long per partition) → prefix offsets broadcast back → a
    * local streaming cumsum per partition. The sorted RDD is persisted
    * (memory-and-disk) between the two passes so the range sort is paid
    * once.
    *
    * `sortCols` must be a TOTAL order (end with the id), and `valueCol`
    * is read as long (NULL counts 0). */
  def globalRunningSum(df: DataFrame, sortCols: Seq[Column], valueCol: String,
                       out: String = "running"): DataFrame = {
    require(sortCols.nonEmpty, "globalRunningSum needs at least one sort column")
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism,
      df.rdd.getNumPartitions)
    val sorted = df
      .withColumn("__grs_v", coalesce(col(valueCol).cast("long"), lit(0L)))
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val vIdx = sorted.schema.fieldIndex("__grs_v")
    val rdd = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; it.foreach(r => s += r.getLong(vIdx)); Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(partSums.scanLeft(0L)(_ + _))
    val summed = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets.value(i)
      it.map { r => acc += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ acc) }
    }
    spark.createDataFrame(summed,
        sorted.schema.add(out, LongType, nullable = false))
      .drop("__grs_v")
  }

  /** Append the global running MAX of `valueCol` in the total order of
    * `sortCols` — [[globalRunningSum]]'s sibling (same two-pass range
    * sort + per-partition offsets; max instead of sum), plus an
    * `inclusive = false` mode returning the STRICT-prefix max (the
    * value BEFORE this row folds in; Long.MinValue for the first row) —
    * what a dominance sweep needs. NULL values count Long.MinValue. */
  def globalRunningMax(df: DataFrame, sortCols: Seq[Column],
                       valueCol: String, out: String = "running_max",
                       inclusive: Boolean = true): DataFrame = {
    require(sortCols.nonEmpty, "globalRunningMax needs at least one sort column")
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism,
      df.rdd.getNumPartitions)
    val sorted = df
      .withColumn("__grm_v",
        coalesce(col(valueCol).cast("long"), lit(Long.MinValue)))
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val vIdx = sorted.schema.fieldIndex("__grm_v")
    val rdd = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partMaxes = rdd.mapPartitionsWithIndex { (i, it) =>
      var m = Long.MinValue
      it.foreach(r => m = math.max(m, r.getLong(vIdx)))
      Iterator((i, m))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(
      partMaxes.scanLeft(Long.MinValue)(math.max))
    val maxed = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets.value(i)
      it.map { r =>
        val v = r.getLong(vIdx)
        val pre = acc
        acc = math.max(acc, v)
        Row.fromSeq(r.toSeq :+ (if (inclusive) acc else pre))
      }
    }
    spark.createDataFrame(maxed,
        sorted.schema.add(out, LongType, nullable = false))
      .drop("__grm_v")
  }

  /** 2-D skyline (Pareto front) maximizing (x, y) — Börzsönyi, Kossmann
    * & Stocker, ICDE 2001 "The Skyline operator": the rows no other row
    * beats-or-ties on BOTH axes while strictly beating on one. The
    * multi-objective selection primitive (quality vs length, balance vs
    * spend, score vs freshness) that single-key top-k cannot express.
    *
    * Distributed sweep, not the quadratic NOT-EXISTS: collapse to one
    * `(x, max y)` row per distinct x (map-combinable), take the
    * STRICT-prefix running max of y in x-descending order
    * ([[globalRunningMax]] exclusive mode — range-partitioned, no
    * single-task window), keep x-groups whose best y strictly exceeds
    * every better-x group's best, and join the survivors back to the
    * input keyed on (x, y). Exact-duplicate (x, y) rows all survive
    * (neither dominates), matching the NOT-EXISTS definition row for
    * row. `xCol`/`yCol` read as LONG — micro-quantize upstream. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val best = base.groupBy(col(xCol))
      .agg(max(col(yCol).cast("long")).as("__gy"))
    val survivors = globalRunningMax(best,
        Seq(col(xCol).desc), "__gy", out = "__pre", inclusive = false)
      .filter(col("__gy") > col("__pre"))
      .select(col(xCol), col("__gy"))
    base.join(survivors,
      base(xCol) === survivors(xCol) &&
        base(yCol).cast("long") === col("__gy"))
      .select(base.columns.map(base(_)): _*)
  }

  /** Cost-balanced shard assignment — "write the corpus into shards of
    * ~`budget` tokens each", the packing step before a training run
    * materializes its shuffled dataset: rows take their place in the
    * deterministic total order of `sortCols`, and a row starts in the
    * shard its FIRST cost unit lands in (shard = exclusive-prefix-sum
    * div budget). Every shard except the last then carries at least
    * `budget` minus one row's cost, and assignment is reproducible
    * across engines and re-runs — no greedy bin-packing heuristics,
    * whose output depends on traversal order. */
  def shardByCostBudget(df: DataFrame, sortCols: Seq[Column], costCol: String,
                        budget: Long, out: String = "shard"): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    globalRunningSum(df, sortCols, costCol, out = "__grs_run")
      .withColumn(out, call_function("div",
        col("__grs_run") - coalesce(col(costCol).cast("long"), lit(0L)),
        lit(budget)))
      .drop("__grs_run")
  }

  /** Equi-DEPTH histogram: `k` buckets holding (near-)equal row counts,
    * with each bucket's value envelope — the quantile-shaped complement
    * of [[equiWidthHistogram]] (equi-width answers "how is mass spread
    * over the range"; equi-depth answers "where are the quantile cuts",
    * robust to heavy tails that would drown an equi-width plot in one
    * bucket). Ties land by the deterministic (value, tiebreak-free row
    * number) order of [[globalNtile]], so bucket contents replay
    * exactly. Returns (tile 1..k, n long, lo, hi) ascending. */
  def equiDepthHistogram(df: DataFrame, valCol: String,
                         k: Int): DataFrame = {
    require(k >= 1, "need at least one bucket")
    globalNtile(df.select(col(valCol)).filter(col(valCol).isNotNull),
        k, Seq(col(valCol)))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n"), min(col(valCol)).as("lo"),
        max(col(valCol)).as("hi"))
      .orderBy(col("tile"))
  }

  /** Reciprocal rank fusion (Cormack et al. 2009): combine several
    * quality/relevance signals by summing `1 / (k + rankᵢ)` over each
    * signal's descending rank — the standard score-free ensembling for
    * signals on incomparable scales (a perplexity, a length prior, a
    * classifier logit): ranks need no calibration, and k=60 damps any
    * single signal's top ranks from dominating. Ties within a signal
    * break on ascending `idCol`, so ranks — and therefore the fused
    * score — are deterministic and engine-replayable.
    *
    * Returns the input plus `rrf double` (rounded to 6 dp). Rank each
    * signal with [[globalRowNumber]] — a range exchange per signal, no
    * single-task window — then join the rank frames back on the id:
    * |signals| sorts of (id, signal) pairs, never the payload. */
  def reciprocalRankFusion(df: DataFrame, idCol: String,
                           signalCols: Seq[String],
                           k: Int = 60): DataFrame = {
    require(signalCols.nonEmpty, "need at least one signal column")
    require(k >= 1, "k must be >= 1")
    val fused = signalCols.zipWithIndex.map { case (sc, i) =>
      globalRowNumber(df.select(col(idCol), col(sc)),
        Seq(col(sc).desc, col(idCol)), out = s"__rrf_rn_$i")
        .select(col(idCol), (lit(1.0) / (lit(k) + col(s"__rrf_rn_$i")))
          .as(s"__rrf_$i"))
    }.reduce(_.join(_, Seq(idCol)))
    val sum = signalCols.indices.map(i => col(s"__rrf_$i"))
      .reduce(_ + _)
    df.join(fused.select(col(idCol), round(sum, 6).as("rrf")), Seq(idCol))
  }

  /** Robust per-group z-scores: `(x − median) / (1.4826 · MAD)` with
    * `MAD = median(|x − median|)` — [[groupZScores]]'s outlier-immune
    * sibling. Mean/stddev z-scores are corrupted by the very anomalies
    * they hunt (one 1000× spike inflates σ until nothing else scores);
    * the median/MAD pair has a 50% breakdown point, and 1.4826 rescales
    * MAD to σ under normality so thresholds carry over. Groups with
    * zero MAD (over half the values identical) or under 2 rows yield
    * NULL. Two grouped median aggregates joined on the same key — still
    * no window, no per-group sort of the raw stream. */
  def groupRobustZScores(df: DataFrame, groupCols: Seq[String],
                         valCol: String, out: String = "rz"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val meds = df.groupBy(groupCols.map(col): _*)
      .agg(median(col(valCol)).as("__rz_med"))
    val withMed = df.join(meds, groupCols)
    val mads = withMed.groupBy(groupCols.map(col): _*)
      .agg(median(abs(col(valCol) - col("__rz_med"))).as("__rz_mad"))
    withMed.join(mads, groupCols)
      .withColumn(out,
        when(col("__rz_mad") > 0,
          (col(valCol) - col("__rz_med")) / (lit(1.4826) * col("__rz_mad")))
          .otherwise(lit(null).cast("double")))
      .drop("__rz_med", "__rz_mad")
  }

  /** Per-group percent rank of a value column — score CALIBRATION
    * across heterogeneous sources: a quality score of 0.7 means
    * different things in Wikipedia and Common Crawl; its within-source
    * percent rank is comparable, so cross-source thresholds and
    * curricula act on `(rank − 1)/(n − 1)` instead of raw scores.
    * Singleton groups score 0.0 (percent_rank's convention). Ties share
    * a rank in both engines, so the output replays exactly — the
    * division is the same integers in the same order.
    *
    * A window, not a stats join — percent rank NEEDS the full group
    * order. Groups here are sources (thousands at most); a pathological
    * single-group corpus degrades to one sorted task, which is the
    * operator's documented bound (use [[groupZScores]] when a
    * rank-free calibration suffices). */
  def percentRankWithin(df: DataFrame, groupCols: Seq[String],
                        valCol: String, out: String = "pr"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    import org.apache.spark.sql.expressions.Window
    df.withColumn(out, percent_rank().over(
      Window.partitionBy(groupCols.map(col): _*).orderBy(col(valCol))))
  }

  /** Equi-width histogram of a numeric column over [lo, hi): bucket b
    * covers `[lo + b·w, lo + (b+1)·w)` with `w = (hi − lo)/buckets`;
    * values below `lo` land in bucket −1, values at or above `hi` in
    * bucket `buckets` — out-of-range mass is REPORTED, never silently
    * clipped into the edge buckets (a distribution audit that hides its
    * tails is how length-filter regressions go unnoticed). Empty buckets
    * inside the range are emitted with n = 0 so the output shape is
    * fixed and diffable across runs. NULL values are excluded.
    *
    * Returns (bucket int, lo double, hi double, n long), bucket
    * ascending. One map-combinable aggregate; the bucket frame is
    * `buckets + 2` rows — driver-bounded like every sidecar here. */
  def equiWidthHistogram(df: DataFrame, valCol: String, buckets: Int,
                         lo: Double, hi: Double): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val w = (hi - lo) / buckets
    val spark = df.sparkSession
    val counted = df.filter(col(valCol).isNotNull)
      .select(
        when(col(valCol).cast("double") < lo, lit(-1))
          .when(col(valCol).cast("double") >= hi, lit(buckets))
          // least() clamp: for non-integer lo/w, float rounding can push
          // floor((v - lo) / w) to `buckets` for v just below hi; such a
          // value is in-range and belongs in the last real bucket
          .otherwise(least(lit(buckets - 1),
            floor((col(valCol).cast("double") - lo) / w)).cast("int"))
          .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    import spark.implicits._
    val shape = (-1 to buckets).toDF("bucket")
    // broadcast the non-preserved side (the ≤buckets-row aggregate);
    // hinting the preserved side of a left join is unsupported
    shape.join(broadcast(counted), Seq("bucket"), "left")
      .select(col("bucket"),
        when(col("bucket") === -1, lit(Double.NegativeInfinity))
          .when(col("bucket") === buckets, lit(hi))
          .otherwise(lit(lo) + col("bucket") * w).as("lo"),
        when(col("bucket") === -1, lit(lo))
          .when(col("bucket") === buckets, lit(Double.PositiveInfinity))
          .otherwise(lit(lo) + (col("bucket") + 1) * w).as("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("bucket"))
  }

  /** Gini coefficient of a non-negative value column — inequality of a
    * distribution in one number: 0 = perfectly uniform, → 1 = all mass
    * on one row. Over token frequencies it quantifies vocabulary
    * concentration (the scalar cousin of the Zipf slope); over per-source
    * doc counts, corpus imbalance; over shard costs, how well packing
    * balanced the load.
    *
    * Uses the sorted-rank identity `G = (2·Σ i·c_i − (n+1)·ΣC) / (n·ΣC)`
    * with ranks i from the scale-safe [[globalRowNumber]] total order
    * (value, id) — no single-partition window. Everything up to the one
    * double division is exact integer arithmetic (rank·value products
    * through DECIMAL(38,0)). Returns one row: (gini double round(6),
    * n long, total long). NULL/negative values excluded. */
  def giniCoefficient(df: DataFrame, valCol: String,
                      idCol: String): DataFrame = {
    val vals = df.filter(col(valCol).isNotNull && col(valCol) >= 0)
      .select(col(valCol).cast("long").as("__v"), col(idCol).as("__id"))
    val ranked = globalRowNumber(vals, Seq(col("__v"), col("__id")),
      out = "__i")
    def d(c: Column) = c.cast("decimal(38,0)")
    val agg = ranked.agg(
      count(lit(1)).as("n"),
      coalesce(sum(col("__v")), lit(0L)).as("c"),
      coalesce(sum(d(col("__i")) * col("__v")),
        lit(java.math.BigDecimal.ZERO)).as("ic")).first
    val n = agg.getLong(0); val c = agg.getLong(1)
    val ic = BigDecimal(agg.getDecimal(2))
    require(n > 0 && c > 0, "giniCoefficient needs positive total mass")
    val num = BigDecimal(2) * ic - BigDecimal(n + 1) * BigDecimal(c)
    val den = BigDecimal(n) * BigDecimal(c)
    val g = BigDecimal(num.toDouble / den.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val spark = df.sparkSession
    import spark.implicits._
    Seq((g, n, c)).toDF("gini", "n", "total")
  }

  /** V-optimal histogram (Jagadish et al., VLDB 1998): the `buckets`-
    * bucket partition of the sorted value domain minimizing total
    * within-bucket sum of squared errors — the histogram a query
    * optimizer wants for selectivity estimation, where equi-width
    * drowns skew and equi-depth splits uniform runs for no gain.
    *
    * Two-level construction (the standard scale shape): the column is
    * first compressed to `atoms` equi-depth tiles (total-ordered by
    * (value, idCol) via [[globalNtile]] — deterministic tile membership
    * for duplicate values), whose integer (n, Σv, Σv²) aggregates form a
    * driver-bounded sidecar; the O(atoms² · buckets) DP then runs
    * driver-side on exact integer prefix sums. `valCol` is read as LONG
    * so the SSE numerators are integer-exact; each cost is the fixed
    * double sequence `S2 − S·S/N`, and DP ties break on the smallest
    * split point — the same `min(struct(cost, i))` the oracle takes.
    *
    * Returns min(buckets, tiles) rows: (bucket 1.., atom_from, atom_to,
    * n long, lo long, hi long, sse double round(6)), bucket ascending in
    * value order. NULLs excluded. */
  def vOptimalHistogram(df: DataFrame, valCol: String, idCol: String,
                        atoms: Int = 64, buckets: Int = 6): DataFrame = {
    require(atoms >= 1 && buckets >= 1 && atoms >= buckets,
      s"need atoms >= buckets >= 1, got ($atoms, $buckets)")
    val spark = df.sparkSession
    val vals = df.filter(col(valCol).isNotNull)
      .select(col(valCol).cast("long").as("__v"), col(idCol).as("__id"))
    val stats = graft.util.DriverBound.collectBounded(
        globalNtile(vals, atoms, Seq(col("__v"), col("__id")),
          out = "__t")
          .groupBy(col("__t"))
          .agg(count(lit(1)).as("n"), sum(col("__v")).as("s"),
            sum(col("__v") * col("__v")).as("s2"),
            min(col("__v")).as("lo"), max(col("__v")).as("hi")),
        atoms, "vOptimalHistogram")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    val a = stats.length // < atoms when the input has fewer rows
    require(a >= 1, "vOptimalHistogram needs a non-empty input")
    val b = math.min(buckets, a)
    val pn = new Array[Long](a + 1); val ps = new Array[Long](a + 1)
    val ps2 = new Array[Long](a + 1)
    stats.zipWithIndex.foreach { case ((_, n, s, s2, _, _), i) =>
      pn(i + 1) = pn(i) + n; ps(i + 1) = ps(i) + s; ps2(i + 1) = ps2(i) + s2
    }
    def cost(i: Int, j: Int): Double = {
      val n = pn(j) - pn(i); val s = ps(j) - ps(i); val s2 = ps2(j) - ps2(i)
      (s2.toDouble - s.toDouble * s.toDouble / n.toDouble)
    }
    // dp(bk)(j): best SSE of splitting atoms 1..j into bk buckets
    val dp = Array.fill(b + 1, a + 1)(Double.PositiveInfinity)
    val prev = Array.fill(b + 1, a + 1)(0)
    for (j <- 1 to a) dp(1)(j) = cost(0, j)
    for (bk <- 2 to b; j <- bk to a) {
      var bestI = -1; var bestC = Double.PositiveInfinity
      for (i <- (bk - 1) until j) {
        val cnd = dp(bk - 1)(i) + cost(i, j)
        if (cnd < bestC) { bestC = cnd; bestI = i } // strict '<' == smallest i on ties
      }
      dp(bk)(j) = bestC; prev(bk)(j) = bestI
    }
    val cuts = new Array[Int](b + 1) // cuts(bk) = last atom of bucket bk
    cuts(b) = a
    for (bk <- b until 1 by -1) cuts(bk - 1) = prev(bk)(cuts(bk))
    val rows = (1 to b).map { bk =>
      val (from, to) = (cuts(bk - 1) + 1, cuts(bk))
      val sse = BigDecimal(cost(from - 1, to))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (bk.toLong, from.toLong, to.toLong, pn(to) - pn(from - 1),
        stats(from - 1)._5, stats(to - 1)._6, sse)
    }
    spark.createDataFrame(rows)
      .toDF("bucket", "atom_from", "atom_to", "n", "lo", "hi", "sse")
  }

  /** Per-group z-scores of a value column — the anomaly primitive under
    * "which day's event volume is off for this event type", "which
    * document's quality score is an outlier for its source": each row
    * gains `(value − mean_group) / stddev_group` (sample stddev). Groups
    * with fewer than 2 rows, or zero spread, yield NULL z — "no basis
    * for surprise" is not z = 0. Input columns pass through.
    *
    * Scale shape: the group statistics are one map-combinable aggregate
    * over the SAME key the scoring join uses, and the stats frame has
    * one row per group — broadcastable for any real group count; no
    * window function, so no per-group sort and no single-task risk on a
    * skewed group. */
  def groupZScores(df: DataFrame, groupCols: Seq[String], valCol: String,
                   out: String = "z"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(avg(col(valCol)).as("__zs_mean"),
        stddev_samp(col(valCol)).as("__zs_sd"))
    df.join(stats, groupCols)
      .withColumn(out,
        when(col("__zs_sd") > 0,
          (col(valCol) - col("__zs_mean")) / col("__zs_sd"))
          .otherwise(lit(null).cast("double")))
      .drop("__zs_mean", "__zs_sd")
  }

  /** Per-group trimmed mean — the robust location estimate between the
    * mean (breakdown 0) and the median (information-discarding): drop
    * the lowest and highest `floor(n·trim)` values by EXACT rank and
    * average the middle. Values are floor-quantized to micro-units
    * (the established cross-engine discipline — double sums don't
    * commute, micro-unit long sums do), ranked per group by (value, a
    * caller-supplied tiebreak) so the trimmed SET is deterministic, and
    * the mean is one integer sum + two double ops.
    *
    * Returns per group: (groupCol, n long, n_trimmed long — per side,
    * trimmed_mean double round(6)).
    *
    * Scale shape: one keyed per-group window (rank) + one map-combinable
    * aggregate; no global ordering, no driver collection. */
  def trimmedMeanByGroup(df: DataFrame, groupCol: String, valCol: String,
                         tiebreakCol: String, trim: Double = 0.1,
                         scale: Long = 1000000L): DataFrame = {
    require(trim >= 0.0 && trim < 0.5, s"trim in [0, 0.5), got $trim")
    import org.apache.spark.sql.expressions.Window
    val q = floor(col(valCol).cast("double") * lit(scale.toDouble))
      .cast("long")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valCol), col(tiebreakCol))
    val ranked = df.filter(col(valCol).isNotNull)
      .select(col(groupCol), q.as("__q"),
        row_number().over(w).as("__r"),
        count(lit(1)).over(Window.partitionBy(col(groupCol))).as("__n"))
    val cut = floor(col("__n") * lit(trim)).cast("long")
    ranked.filter(col("__r") > cut && col("__r") <= col("__n") - cut)
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"), max(cut).as("n_trimmed"),
        (round((sum(col("__q")).cast("double") / lit(scale.toDouble)) /
          count(lit(1)).cast("double"), 6) + lit(0.0)).as("trimmed_mean"))
      .orderBy(col(groupCol))
  }

  /** EXACT q-quantiles of a column — the discrete (type-1) quantile: for
    * j in 1..q the value whose 1-based rank in the ascending order is
    * `max(1, (j·n) div q)`, so j = q is the maximum and j = q/2 the
    * lower median. `approxQuantile` answers "roughly where"; training-
    * data curation cuts (length caps, score floors, per-bucket budgets)
    * want the exact cut point, reproducibly, which approx sketches are
    * not.
    *
    * Value-at-rank is invariant under tie order — equal values may be
    * numbered either way across partitions but the value AT each rank is
    * the same — so sorting by value alone is deterministic here even
    * though [[globalRowNumber]] normally demands a tiebreak column.
    *
    * Returns (q_idx 1..q long, value) ordered by q_idx; NULLs excluded.
    * Rows with rank hit by several j (n < q) appear once per j.
    *
    * Scale shape: ONE range-partitioned sort of the (single-column,
    * pruned) projection + zipWithIndex — the same exchange a global sort
    * already costs, with no single-partition window — then a broadcast
    * join of the q-row rank table against the rank-filtered (q rows
    * survive the pushed `isin`) numbered frame. The q target ranks are
    * pure driver arithmetic on one count.
    *
    * STABLE-INPUT requirement: the source is evaluated twice (the count,
    * then the ranking scan). A nondeterministic input — a sample without
    * a fixed seed, a non-snapshot read — can make `n` disagree with the
    * numbered frame, yielding missing or duplicated quantile rows.
    * Materialize such inputs (localCheckpoint/write) first. */
  def exactQuantiles(df: DataFrame, valueCol: String, q: Int,
                     out: String = "value"): DataFrame = {
    require(q >= 1, s"quantile count must be >= 1, got $q")
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as(out))
    val n = vals.count()
    val spark = df.sparkSession
    import spark.implicits._
    if (n == 0)
      return spark.emptyDataFrame
        .select(lit(0L).as("q_idx"), lit(null).cast(vals.schema.head.dataType).as(out))
        .limit(0)
    val targets = (1 to q).map(j => (j.toLong, math.max(1L, j * n / q)))
    val ranks = targets.map(_._2).distinct
    val numbered = globalRowNumber(vals, Seq(col(out)), out = "__rank")
      .filter(col("__rank").isin(ranks: _*))
    numbered
      .join(broadcast(targets.toDF("q_idx", "__rank")), Seq("__rank"))
      .select(col("q_idx"), col(out))
      .orderBy(col("q_idx"))
  }

  /** Per-GROUP exact q-quantiles — [[exactQuantiles]]'s rank arithmetic
    * (value at 1-based rank `max(1, (j·n_g) div q)` within each group's
    * ascending order) behind a KEYED window: per-language length cuts,
    * per-source score floors, per-bucket budgets. The window partitions
    * by the group, so no single-task stage — the scale bound is the
    * LARGEST group, same as any per-group sort, and groups here are
    * languages/sources (thousands of rows each at most, by construction
    * of the use cases). Returns (groupCol, q_idx 1..q, value) ordered. */
  def exactQuantilesByGroup(df: DataFrame, groupCol: String,
                            valueCol: String, q: Int,
                            out: String = "value"): DataFrame = {
    require(q >= 1, s"quantile count must be >= 1, got $q")
    import org.apache.spark.sql.expressions.Window
    def idiv(a: Column, b: Column) = call_function("div", a, b)
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).as(out))
    val ranked = vals.withColumn("__rank", row_number().over(
      Window.partitionBy(col(groupCol)).orderBy(col(out))))
    // (group, q_idx, target rank) — |groups|·q rows, an EQUI-join key
    // (a rank predicate against a j-table would plan a nested loop);
    // the j list explodes from a literal array, so there is no join at
    // all on this side
    val targets = vals.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(groupCol), col("__n"),
        explode(lit((1 to q).map(_.toLong).toArray)).as("q_idx"))
      .select(col(groupCol), col("q_idx"),
        greatest(lit(1L),
          idiv(col("q_idx") * col("__n"), lit(q.toLong))).as("__rank"))
    ranked.join(targets, Seq(groupCol, "__rank"))
      .select(col(groupCol), col("q_idx"), col(out))
      .orderBy(col(groupCol), col("q_idx"))
  }
}
