package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketching — the HyperLogLog shape (Flajolet
  * et al., AofA 2007) built from an explicit md5-derived hash so the
  * registers (and therefore the estimate) are bit-reproducible in ANY
  * engine, unlike `approx_count_distinct`'s opaque implementation-defined
  * sketch. The register frame is tiny (2^p rows), MERGEABLE by per-bucket
  * max — union two corpora's registers and re-aggregate — and computing it
  * is one map-combinable aggregate over the values: the estimator a
  * 100 TB pipeline can afford to keep per shard/day/source and fold
  * together at read time.
  */
object Sketch {

  /** Register index + rank for one value: a 60-bit hash from the first 15
    * hex chars of md5 (15 so the `conv` result fits a signed long with no
    * unsigned edge cases); top `p` bits pick the bucket, and the rank is
    * the 1-based position of the first set bit in the remaining q = 60−p
    * bits (q+1 when they are all zero) — counted via `lpad(bin(rest))`,
    * which both Spark and DuckDB evaluate identically. The rank is
    * clamped at 53 so the estimator's exact-integer harmonic fold
    * (Σ 2^(53−rank) in longs) never sees a negative shift: at p < 8 an
    * all-zero tail would otherwise rank q+1 = 61−p > 53 (r11 ADVICE) —
    * a 2^−53-probability event whose clamp shifts the harmonic term by
    * under 2^−53, far below the estimator's own error. */
  private def hashParts(v: Column, p: Int): (Column, Column) = {
    val q = 60 - p
    val h = conv(substring(md5(v.cast("string").cast("binary")), 1, 15),
      16, 10).cast("long")
    val bucket = shiftrightunsigned(h, q)
    val rest = h.bitwiseAND(lit((1L << q) - 1L))
    val rank = when(rest === 0L, lit(math.min(q + 1, 53).toLong))
      .otherwise(instr(lpad(bin(rest), q, "0"), "1").cast("long"))
    (bucket, rank)
  }

  /** The bias-correction constant α_m from Flajolet et al. 2007, §4:
    * exact table values for the small register counts the asymptotic
    * formula overshoots (m = 16/32/64), the asymptotic form for
    * m ≥ 128. */
  private def alphaFor(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1 + 1.079 / m.toDouble)
  }

  /** The 2^p-row register table of a column: (bucket 0..2^p−1, max_rank
    * long — 0 for buckets no value hashed into). NULLs excluded. One
    * word-count aggregate; the empty-bucket fill is a broadcast join
    * against a generated 2^p-row frame. */
  def hllRegisters(df: DataFrame, valCol: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 12, s"p must be in [4,12], got $p")
    val m = 1 << p
    val (bucket, rank) = hashParts(col(valCol), p)
    val regs = df.filter(col(valCol).isNotNull)
      .select(bucket.as("bucket"), rank.as("__r"))
      .groupBy(col("bucket")).agg(max(col("__r")).as("__mr"))
    df.sparkSession.range(m).select(col("id").as("bucket"))
      .join(broadcast(regs), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("__mr"), lit(0L)).as("max_rank"))
      .orderBy(col("bucket"))
  }

  /** Fold register tables from several shards/snapshots into one: the
    * sketch's defining property — `estimate(merge(a, b)) ==
    * estimate(a ∪ b)` exactly, because max commutes with max. */
  def hllMerge(regs: DataFrame*): DataFrame = {
    require(regs.nonEmpty, "hllMerge needs at least one register table")
    regs.reduce(_ unionByName _)
      .groupBy(col("bucket")).agg(max(col("max_rank")).as("max_rank"))
      .orderBy(col("bucket"))
  }

  /** Cardinality estimate from a register table — one row: (estimate
    * double round(4), n_buckets long, v_zero long — empty registers).
    *
    * Cross-engine exactness: the harmonic-mean denominator Σ 2^(−M_j) is
    * computed as the INTEGER Σ 2^(53−M_j) (ranks are ≤ 53 at p ≥ 4, so
    * terms are exact longs and the sum is order-free), and the raw
    * estimate is the fixed double sequence `α_m · m² · 2^53 / S`. The
    * small-range linear-counting correction (`m · ln(m/V)` when the raw
    * estimate ≤ 2.5m and empty registers exist) uses one log — the same
    * double in both engines. */
  def hllEstimate(registers: DataFrame): DataFrame = {
    val rows = graft.util.DriverBound.collectBounded(
      registers.select(col("bucket"), col("max_rank")),
      65536, "hllEstimate registers (max p = 16)")
    val m = rows.length
    require(m >= 16 && (m & (m - 1)) == 0, s"register count must be 2^p, got $m")
    val maxRank = 53L
    require(rows.forall(_.getLong(1) <= maxRank),
      "register rank exceeds the estimator's 53-rank bound " +
        "(hashParts clamps at 53 — foreign register tables must too)")
    val sInt = rows.map(r => 1L << (maxRank - r.getLong(1))).sum
    val vZero = rows.count(_.getLong(1) == 0L).toLong
    val alpha = alphaFor(m)
    val raw = alpha * (m.toLong * m).toDouble * 9007199254740992.0 /
      sInt.toDouble
    val est =
      if (raw <= 2.5 * m.toDouble && vZero > 0)
        m.toDouble * math.log(m.toDouble / vZero.toDouble)
      else raw
    val spark = registers.sparkSession
    import spark.implicits._
    val r4 = BigDecimal(est)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    Seq((r4, m.toLong, vZero)).toDF("estimate", "n_buckets", "v_zero")
  }

  /** Per-group SPARSE HLL registers: (grp, bucket, max_rank) for
    * buckets some value hashed into — the grouped cardinality sidecar
    * (vocab per source, users per day) at ≤ |groups|·2^p rows, still
    * mergeable by per-(grp, bucket) max. */
  def hllRegistersByGroup(df: DataFrame, groupCol: String, valCol: String,
                          p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 12, s"p must be in [4,12], got $p")
    val (bucket, rank) = hashParts(col(valCol), p)
    df.filter(col(valCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"), bucket.as("bucket"), rank.as("__r"))
      .groupBy(col("grp"), col("bucket")).agg(max(col("__r")).as("max_rank"))
  }

  /** Per-group estimates off [[hllRegistersByGroup]] — same integer-
    * exact harmonic fold as [[hllEstimate]] (absent buckets contribute
    * 2^53 each), folded driver-side over the bounded register sidecar.
    * Returns (grp, estimate round(4), v_zero). */
  def hllEstimateByGroup(registers: DataFrame, p: Int = 8): DataFrame = {
    val m = 1 << p
    val maxRank = 53L
    // groups × m rows: the group column's cardinality is enforced here
    // (8192 groups at p=8), not assumed
    val rows = graft.util.DriverBound.collectBounded(
      registers
        .select(col("grp").cast("string"), col("bucket"), col("max_rank")),
      m * 8192, "hllEstimateByGroup registers")
    val spark = registers.sparkSession
    import spark.implicits._
    val out = rows.groupBy(_.getString(0)).toSeq.map { case (g, rs) =>
      require(rs.forall(r => r.getLong(2) >= 1L && r.getLong(2) <= maxRank),
        s"group $g has a rank outside [1, $maxRank]")
      val present = rs.length
      val sInt = rs.map(r => 1L << (maxRank - r.getLong(2))).sum +
        (m - present).toLong * (1L << maxRank)
      val vZero = (m - present).toLong
      val alpha = alphaFor(m)
      val raw = alpha * (m.toLong * m).toDouble * 9007199254740992.0 /
        sInt.toDouble
      val est =
        if (raw <= 2.5 * m.toDouble && vZero > 0)
          m.toDouble * math.log(m.toDouble / vZero.toDouble)
        else raw
      (g, BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + 0.0, vZero)
    }.sortBy(_._1)
    out.toDF("grp", "estimate", "v_zero")
  }

  // --- Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) ---

  /** Cell index of value `v` in depth-row `row`: the row number salts the
    * md5 input (`"<row>:" + v`), the first 15 hex chars become a 60-bit
    * non-negative long, mod `width`. Positive dividend, so `pmod` here and
    * plain `%` in any replaying engine agree. */
  private def cmCell(v: Column, row: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$row:"), v.cast("string"))
      .cast("binary")), 1, 15), 16, 10).cast("long"), lit(width.toLong))

  /** The dense depth×width counter table of a column: (row, cell, cnt),
    * zero-filled so counter tables from different shards/days align
    * cell-for-cell. The input first collapses to its value-frequency
    * table, so hashing touches |vocab|·depth rows, not |corpus|·depth —
    * at 100 TB the frequency groupBy is the only corpus-sized pass and it
    * map-side combines. Counters are sums, so the sketch is MERGEABLE by
    * per-cell addition ([[cmMerge]]) and the estimate never undercounts. */
  def cmCounters(df: DataFrame, valCol: String, depth: Int = 4,
                 width: Int = 512): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    require(width >= 16, s"width must be >= 16, got $width")
    val freq = df.filter(col(valCol).isNotNull)
      .groupBy(col(valCol).as("__v")).agg(count(lit(1)).as("__c"))
    val cells = freq.select(posexplode(array((0 until depth).map(r =>
        cmCell(col("__v"), r, width)): _*)).as(Seq("row", "cell")),
        col("__c"))
      .groupBy(col("row").cast("long").as("row"), col("cell"))
      .agg(sum(col("__c")).as("cnt"))
    // dense shape from ONE range (row = id / width, cell = id % width) —
    // no cross join, and the d·w frame is tiny by construction
    val shape = df.sparkSession.range(depth.toLong * width)
      .select((col("id") / lit(width)).cast("long").as("row"),
        pmod(col("id"), lit(width.toLong)).as("cell"))
    shape.join(broadcast(cells), Seq("row", "cell"), "left")
      .select(col("row"), col("cell"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy(col("row"), col("cell"))
  }

  /** Fold counter tables from several shards into one — per-cell sum.
    * `estimate(merge(a, b)) == estimate(a ⊎ b)` exactly, because the
    * cells are plain sums. */
  def cmMerge(counters: DataFrame*): DataFrame = {
    require(counters.nonEmpty, "cmMerge needs at least one counter table")
    counters.reduce(_ unionByName _)
      .groupBy(col("row"), col("cell")).agg(sum(col("cnt")).as("cnt"))
      .orderBy(col("row"), col("cell"))
  }

  /** Point estimates for a (small, broadcast) probe frame: est(v) =
    * min over rows of counter[row, h_row(v)] — the classic CM upper
    * bound, an overestimate by at most the hash-collision mass. Returns
    * (probe value column, est_cnt). Counters are d·w rows and the probe
    * side is broadcast, so the lookup never shuffles the corpus. */
  def cmEstimate(counters: DataFrame, probes: DataFrame, valCol: String,
                 depth: Int, width: Int): DataFrame = {
    val pcells = probes.select(col(valCol).as("__v"),
      posexplode(array((0 until depth).map(r =>
        cmCell(col(valCol), r, width)): _*)).as(Seq("row", "cell")))
      .select(col("__v"), col("row").cast("long").as("row"), col("cell"))
    counters.join(broadcast(pcells), Seq("row", "cell"))
      .groupBy(col("__v").as(valCol))
      .agg(min(col("cnt")).as("est_cnt"))
  }

  /** Count-Min inner product — the classic sketch estimate of an
    * equi-join SIZE (Cormode & Muthukrishnan §4.2): for counter tables
    * built over the two join columns with the SAME (depth, width),
    * est = min over rows of Σ_cell a[cell]·b[cell]. Never undercounts;
    * the overcount is the collision mass (expected n_a·n_b/width —
    * size the width to the key cardinality product when the bias
    * matters). The input counters are d·w-row sidecars, so the
    * estimate costs one tiny join — the point: plan a 100 TB join's
    * output size WITHOUT running it, from sketches each side maintains
    * incrementally. Returns one row: (est_inner long). */
  def cmInnerProduct(countersA: DataFrame, countersB: DataFrame): DataFrame =
    countersA.select(col("row"), col("cell"), col("cnt").as("__ca"))
      .join(countersB.select(col("row"), col("cell"),
        col("cnt").as("__cb")), Seq("row", "cell"))
      .groupBy(col("row")).agg(sum(col("__ca") * col("__cb")).as("__dot"))
      .agg(min(col("__dot")).as("est_inner"))

  // --- KMV / bottom-k distinct sketch (Bar-Yossef et al., RANDOM'02) ---

  /** The k smallest DISTINCT 60-bit md5 hash values of a column — a
    * bottom-k sketch. Global smallest-k is a TakeOrderedAndProject
    * (per-partition top-k, then a k-row driver merge), never a full sort.
    * Mergeable: union registers, distinct, keep the k smallest. */
  def kmvRegisters(df: DataFrame, valCol: String, k: Int = 128): DataFrame = {
    require(k >= 8, s"k must be >= 8, got $k")
    val h = conv(substring(md5(col(valCol).cast("string").cast("binary")),
      1, 15), 16, 10).cast("long")
    df.filter(col(valCol).isNotNull).select(h.as("h")).distinct()
      .orderBy(col("h")).limit(k)
  }

  /** Fold bottom-k registers from several shards: distinct-union, keep
    * the k smallest — exactly the registers of the unioned input. */
  def kmvMerge(k: Int, regs: DataFrame*): DataFrame = {
    require(regs.nonEmpty, "kmvMerge needs at least one register table")
    regs.reduce(_ unionByName _).distinct().orderBy(col("h")).limit(k)
  }

  /** Fold a streaming-maintained HLL register table
    * ([[graft.streaming.StreamRunner.runIncrementalHllMaintain]] appends
    * one dense 2^p frame per batch): per-bucket max over all appended
    * frames == the whole-history registers exactly. */
  def hllFoldTable(spark: org.apache.spark.sql.SparkSession,
                   table: String): DataFrame =
    hllMerge(spark.read.parquet(table))

  /** Fold a streaming-maintained bottom-k table
    * ([[graft.streaming.StreamRunner.runIncrementalKmvMaintain]]):
    * distinct-union of the appended batch registers, keep the k
    * smallest == the whole-history registers exactly. */
  def kmvFoldTable(spark: org.apache.spark.sql.SparkSession,
                   table: String, k: Int): DataFrame =
    kmvMerge(k, spark.read.parquet(table))

  /** Fold a streaming-maintained KLL register table
    * ([[graft.streaming.StreamRunner.runIncrementalKllMaintain]] appends
    * one ≤ 2k-row register frame per batch): one [[kllMerge]] over all
    * appended frames. NOT replay-idempotent — a re-delivered batch's
    * registers would compact in twice and inflate every weight — so the
    * exactly-once ledger is load-bearing here, like the Count-Min sums
    * and unlike the HLL max-fold (spec-forged). */
  def kllFoldTable(spark: org.apache.spark.sql.SparkSession,
                   table: String, k: Int): DataFrame =
    kllMerge(k, spark.read.parquet(table))

  /** Fold a streaming-maintained log-histogram register table
    * ([[graft.streaming.StreamRunner.runIncrementalLogHistMaintain]]
    * appends one bounded frame per batch): one [[logHistMerge]] keyed
    * sum — equal to the whole-history build register for register,
    * which is why this is the cheapest live quantile profile of the
    * family. NOT replay-idempotent (counts would double), so the
    * exactly-once ledger is load-bearing, like the Count-Min sums. */
  def logHistFoldTable(spark: org.apache.spark.sql.SparkSession,
                       table: String): DataFrame =
    logHistMerge(spark.read.parquet(table))

  /** Distinct-count estimate from a bottom-k register table — one row:
    * (n_regs, kth_hash, estimate round(4)). With fewer than k distinct
    * hashes the register set IS the distinct set (estimate = n, exact);
    * otherwise the unbiased estimator (k−1)·2^60 / h_(k) over the
    * [0, 2^60) hash space. The division is one double op on two exactly-
    * representable operands — identical in any engine. */
  def kmvEstimate(registers: DataFrame, k: Int): DataFrame = {
    // limit(k+1) bounds driver memory even when a non-register frame is
    // passed by mistake; the require then names the contract violation
    val hs = registers.select(col("h")).limit(k + 1).collect()
      .map(_.getLong(0))
    require(hs.length <= k, s"register table has ${hs.length} rows > k=$k")
    val n = hs.length.toLong
    val hk = if (hs.isEmpty) 0L else hs.max
    val est =
      if (n < k) n.toDouble
      else (k - 1).toDouble * 1152921504606846976.0 / hk.toDouble
    val spark = registers.sparkSession
    import spark.implicits._
    val r4 = BigDecimal(est)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    Seq((n, hk, r4)).toDF("n_regs", "kth_hash", "estimate")
  }

  /** Set-operation estimates from TWO bottom-k register tables (Beyer
    * et al., SIGMOD 2007 "On Synopses for Distinct-Value Estimation
    * under Multiset Operations"): combine both registers into the
    * union's bottom-k K; the Jaccard estimate is the fraction of K
    * present in BOTH input registers, the union estimate is the
    * standard (k−1)·2^60/h_(k) on K, and the intersection estimate is
    * their product — how two 100 TB corpora's overlap is sized from two
    * KB-scale sidecars, no join of the corpora anywhere.
    *
    * When the combined registers hold fewer than k hashes the sketches
    * ARE the distinct sets and every figure is exact. Returns one row
    * (k_used, n_common, kth_hash long, jaccard round(6), union_est,
    * intersection_est round(4)). Driver work is bounded by 2k longs —
    * the [[kmvEstimate]] discipline. */
  def kmvSetEstimates(regsA: DataFrame, regsB: DataFrame,
                      k: Int): DataFrame = {
    // bound checked on the PRE-dedup row count: a register table with
    // > k rows containing duplicates could dedup back under k, slip the
    // size check, and silently estimate from an arbitrary truncated
    // subset of the registers (limit has no order) — the limit(k+1)
    // keeps the driver read bounded; the row-count require keeps it
    // honest
    val aRows = regsA.select(col("h")).limit(k + 1).collect()
    val bRows = regsB.select(col("h")).limit(k + 1).collect()
    require(aRows.length <= k && bRows.length <= k,
      s"register tables exceed k=$k: ${aRows.length} x ${bRows.length} rows")
    val a = aRows.map(_.getLong(0)).toSet
    val b = bRows.map(_.getLong(0)).toSet
    val union = (a ++ b).toSeq.sorted.take(k)
    val kU = union.size.toLong
    require(kU > 0, "both register tables are empty")
    val hk = union.last
    val nCommon = union.count(h => a.contains(h) && b.contains(h)).toLong
    val unionEst =
      if (kU < k) kU.toDouble
      else (k - 1).toDouble * 1152921504606846976.0 / hk.toDouble
    val jaccard = nCommon.toDouble / kU.toDouble
    def r(v: Double, s: Int) = BigDecimal(v)
      .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val spark = regsA.sparkSession
    import spark.implicits._
    Seq((kU, nCommon, hk, r(jaccard, 6), r(unionEst, 4),
        r(jaccard * unionEst, 4)))
      .toDF("k_used", "n_common", "kth_hash", "jaccard", "union_est",
        "intersection_est")
  }

  // --- KLL-style mergeable quantile sketch ---------------------------------
  // (Karnin, Lang & Liberty, "Optimal Quantile Approximation in Streams",
  // FOCS 2016 — the level/compaction discipline; here in the house
  // deterministic-replay dress: the compaction coin is an md5 bit, so the
  // register table is bit-reproducible in any engine.)

  /** Parity coin for compaction round `r`: the low bit of the 60-bit
    * md5-derived hash of the string "kll:r" — the same value any engine
    * computes, so a replay unrolls the compaction schedule verbatim.
    * Driver-side (the rounds are driver-scheduled; the per-row work never
    * sees the coin). */
  def kllCoin(r: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"kll:$r".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) & 1L).toInt
  }

  /** Compaction-round arithmetic, driver-side: starting from `n` rows of
    * equal weight, run conditional rounds — "while count > cap, sort by
    * (value, tiebreak), keep the ranks whose parity equals kllCoin(r),
    * double the weight" — WITHOUT touching the data: round r keeps
    * original positions p ≡ t (mod 2^r) for a t determined by the coins
    * alone, so the whole schedule collapses to one modular filter.
    * Returns (rounds R, keep-offset t in [0, 2^R), surviving count m):
    * survivors are positions p in 1..n with p ≡ t (mod 2^R), each of
    * weight 2^R. Deterministic rank error: any original rank is
    * reconstructed from the survivors within 2^R − 1 < 2·n/cap. */
  def kllSchedule(n: Long, cap: Int): (Int, Long, Long) = {
    require(cap >= 2, s"cap must be >= 2, got $cap")
    var m = n; var a = 0L; var r = 0
    while (m > cap) {
      require(r < 48, s"kll compaction did not converge (n=$n, cap=$cap)")
      if (kllCoin(r) == 1) { a += (1L << r); m = (m + 1) / 2 }
      else m = m / 2
      r += 1
    }
    val w = 1L << r
    ((r, ((w - (a % w)) % w + w) % w, m))
  }

  /** The KLL register table of a numeric column: at most `2k` rows
    * (value double, tb long — the caller's unique tiebreak id, w long —
    * the power-of-two weight this register carries). Built by the
    * deterministic compaction schedule above: ONE range-partitioned sort
    * + zipWithIndex (the [[Ranking.globalRowNumber]] shape — no
    * single-partition window) and a modular rank filter; the n rows in
    * cost exactly one exact-quantile-style sort, and what comes out is a
    * BOUNDED, MERGEABLE summary a 100 TB profiler can keep per
    * shard/day/source and fold at read time ([[kllMerge]]), which the
    * exact sort can never be. NULL values are excluded. `tiebreakCol`
    * must be unique per row (register identity and the replay's sort
    * order both ride on it). STABLE-INPUT requirement as in
    * [[Ranking.exactQuantiles]]: the source evaluates twice (count +
    * ranking scan) — materialize nondeterministic inputs first. */
  def kllRegisters(df: DataFrame, valCol: String, tiebreakCol: String,
                   k: Int = 200): DataFrame = {
    require(k >= 8, s"k must be >= 8, got $k")
    val cap = 2 * k
    val vals = df.filter(col(valCol).isNotNull)
      .select(col(valCol).cast("double").as("value"),
        col(tiebreakCol).cast("long").as("tb"))
    val n = vals.count()
    val (rounds, t, _) = kllSchedule(n, cap)
    val w = 1L << rounds
    val numbered = Ranking.globalRowNumber(vals,
      Seq(col("value"), col("tb")), out = "__p")
    numbered.filter(pmod(col("__p"), lit(w)) === lit(t))
      .select(col("value"), col("tb"), lit(w).as("w"))
  }

  /** Fold KLL register tables from several shards/days into one table of
    * at most `2k` rows — the KLL merge: union the registers, then
    * conditionally compact the LOWEST weight class (sort it by (value,
    * tb), keep the md5-coin parity, double its weight) until the total
    * fits. Register tables are bounded sidecars (≤ 2k rows each), so the
    * fold is driver-side over collected rows — the [[kmvEstimate]]
    * discipline — and bit-deterministic: coins continue the round
    * numbering at 48 (disjoint from any build schedule, so a replay
    * can't confuse build coins with merge coins). */
  def kllMerge(k: Int, regs: DataFrame*): DataFrame = {
    require(regs.nonEmpty, "kllMerge needs at least one register table")
    val cap = 2 * k
    val spark = regs.head.sparkSession
    import spark.implicits._
    var rows = regs.map { rg =>
      // limit() bounds the fetch itself; the require names the contract
      val v = rg.select(col("value").cast("double"), col("tb"), col("w"))
        .limit(16 * cap + 1)
        .as[(Double, Long, Long)].collect().toVector
      require(v.size <= 16L * cap,
        s"a register table has ${v.size} rows — not a bounded KLL " +
          s"sidecar for k=$k (cap $cap)")
      v
    }.reduce(_ ++ _)
    var r = 48 // merge coins live above any build schedule's rounds
    while (rows.size > cap) {
      require(r < 96, "kll merge compaction did not converge")
      val wmin = rows.map(_._3).min
      val (cls, rest) = rows.partition(_._3 == wmin)
      val sorted = cls.sortBy(x => (x._1, x._2))
      val coin = kllCoin(r)
      val kept = sorted.zipWithIndex.collect {
        case ((v, tb, w), i) if (i + 1) % 2 == coin => (v, tb, w * 2)
      }
      rows = rest ++ kept
      r += 1
    }
    rows.sortBy(x => (x._1, x._2)).toDF("value", "tb", "w")
  }

  /** Quantile estimates from a KLL register table — [[Ranking
    * .exactQuantiles]]'s contract (q_idx 1..q, the value whose estimated
    * 1-based rank reaches max(1, (j·W) div q), W = total weight) at
    * sketch cost: the registers collect driver-side (bounded ≤ 2k rows),
    * cumulative weights are exact long sums in (value, tb) order, and
    * quantile j is the first register whose cumulative weight reaches
    * the target — pure integer arithmetic, identical in any engine.
    * Estimated ranks differ from true ranks by < max register weight
    * (≤ 2n/cap deterministically), so with the default k the cut points
    * land within n/k ranks of the exact ones. */
  def kllQuantiles(registers: DataFrame, q: Int): DataFrame = {
    require(q >= 1, s"quantile count must be >= 1, got $q")
    val rows = graft.util.DriverBound.collectBounded(
        registers.select(col("value").cast("double"), col("tb"),
          col("w")),
        262144, "kllQuantiles registers")
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    val spark = registers.sparkSession
    import spark.implicits._
    if (rows.isEmpty)
      return Seq.empty[(Long, Double)].toDF("q_idx", "value")
    val totalW = rows.map(_._3).sum
    val cum = rows.scanLeft(0L)(_ + _._3).tail // cum(i) = Σ w(0..i)
    val out = (1 to q).map { j =>
      val target = math.max(1L, j.toLong * totalW / q)
      val i = cum.indexWhere(_ >= target)
      (j.toLong, rows(if (i < 0) rows.length - 1 else i)._1)
    }
    out.toDF("q_idx", "value")
  }

  // --- Bloom filter as an explicit bit-position set (Bloom, CACM 1970) --

  /** The set bit positions of an m-bit, k-hash Bloom filter over a
    * column: one row per DISTINCT set bit. Same row-salted md5 cell hash
    * as Count-Min, so any engine replays the positions verbatim.
    * Mergeable by distinct-union (Bloom OR). The frame is at most m rows
    * — the 100 TB shape is one distinct over |vocab|·k positions. */
  def bloomBits(df: DataFrame, valCol: String, m: Int = 4096,
                k: Int = 5): DataFrame = {
    require(k >= 1 && k <= 8, s"k must be in [1,8], got $k")
    require(m >= 64, s"m must be >= 64, got $m")
    df.filter(col(valCol).isNotNull)
      .select(explode(array((0 until k).map(r =>
        cmCell(col(valCol), r, m)): _*)).as("bit"))
      .distinct().orderBy(col("bit"))
  }

  /** Membership probe: for each (small, broadcast) probe value, 1 iff
    * ALL k bit positions are set — no false negatives by construction,
    * false positives at the documented (1−e^{−kn/m})^k rate. Returns
    * (probe value column, maybe_in long 0/1). */
  def bloomMightContain(bits: DataFrame, probes: DataFrame, valCol: String,
                        m: Int, k: Int): DataFrame = {
    val pbits = probes.select(col(valCol).as("__v"),
      explode(array((0 until k).map(r =>
        cmCell(col(valCol), r, m)): _*)).as("bit"))
    pbits.join(broadcast(bits.withColumn("__hit", lit(1L))),
        Seq("bit"), "left")
      .groupBy(col("__v").as(valCol))
      .agg((sum(coalesce(col("__hit"), lit(0L))) === lit(k.toLong))
        .cast("long").as("maybe_in"))
  }

  // --- Log-bucketed relative-error quantile histogram ----------------------
  // (the DDSketch discipline — Masson, Rim & Lee, VLDB 2019: fixed
  // RELATIVE-error buckets, counts mergeable by plain addition — but on a
  // base-2 grid built from pure integer arithmetic, so the registers are
  // bit-identical in any engine: no log() whose last ulp could move a
  // boundary value between buckets.)

  /** The log-histogram register table of a positive numeric column:
    * values are quantized to the integer grid `u = floor(value ·
    * unitScale)` (exact double multiply + floor, the house cross-engine
    * idiom), and bucket identity is the top `subBits + 1` BITS of `u` —
    * key `(e, top)` with `e = ⌊log₂ u⌋ = length(bin(u)) − 1` and
    * `top = u div 2^max(e−subBits, 0)`. Every step is integer arithmetic
    * both Spark and DuckDB evaluate identically.
    *
    * Returns (e int, top long, lo long, cnt long) where `lo = top ·
    * 2^max(e−subBits,0)` is the bucket's inclusive lower bound on the
    * `unitScale` grid. Bucket width is 2^−subBits of its magnitude, so
    * any value is within a factor (1 + 2^−subBits) of its bucket's `lo`
    * — a guaranteed RELATIVE error, where an equi-width histogram's
    * error explodes on heavy-tailed data. Rows with NULL or
    * non-positive quantized values are excluded (log buckets need
    * positive support; offset upstream for signed data).
    *
    * Scale shape: ONE map-combinable count aggregate over the rows — no
    * sort, no window, no driver state (contrast [[kllRegisters]], which
    * pays a full range sort for its tighter RANK guarantee). The table
    * is bounded by 63·2^subBits + subBits rows regardless of input
    * size, and [[logHistMerge]] is a plain keyed sum — the per-shard/
    * per-day profile sidecar a 100 TB pipeline folds at read time
    * without ever touching the data again. */
  def logHistRegisters(df: DataFrame, valCol: String,
                       unitScale: Long = 100L, subBits: Int = 3): DataFrame = {
    require(unitScale >= 1L, s"unitScale must be >= 1, got $unitScale")
    require(subBits >= 1 && subBits <= 6,
      s"subBits must be in [1,6], got $subBits")
    val u = floor(col(valCol).cast("double") * lit(unitScale.toDouble))
      .cast("long")
    val e = (length(bin(col("__u"))) - 1).cast("int")
    df.filter(col(valCol).isNotNull)
      .select(u.as("__u")).filter(col("__u") >= 1L)
      .select(col("__u"), e.as("e"))
      .select(col("__u"), col("e"),
        greatest(col("e") - lit(subBits), lit(0)).as("__sh"))
      .select(col("e"),
        pow(lit(2.0), col("__sh")).cast("long").as("__unit"), col("__u"))
      .select(col("e"),
        call_function("div", col("__u"), col("__unit")).as("top"),
        col("__unit"))
      .groupBy(col("e"), col("top"))
      .agg(first(col("__unit")).as("__unit"), count(lit(1)).as("cnt"))
      .select(col("e"), col("top"), (col("top") * col("__unit")).as("lo"),
        col("cnt"))
  }

  /** Fold log-histogram register tables from several shards/days/sources
    * into one: union + keyed sum — fully DISTRIBUTED (no driver collect,
    * unlike the KLL merge's coin rounds), associative, and idempotent to
    * re-aggregation, which is what makes this the cheapest mergeable
    * quantile profile in the family. */
  def logHistMerge(regs: DataFrame*): DataFrame = {
    require(regs.nonEmpty, "logHistMerge needs at least one register table")
    regs.map(_.select(col("e"), col("top"), col("lo"), col("cnt")))
      .reduce(_.unionByName(_))
      .groupBy(col("e"), col("top"))
      .agg(first(col("lo")).as("lo"), sum(col("cnt")).as("cnt"))
      .select(col("e"), col("top"), col("lo"), col("cnt"))
  }

  /** Quantile estimates from a log-histogram register table —
    * [[Ranking.exactQuantiles]]'s contract (q_idx 1..q; the bucket whose
    * cumulative count reaches max(1, (j·N) div q)) at histogram cost.
    * Registers collect driver-side (bounded ≤ 63·2^subBits rows, the
    * sidecar discipline), cumulative counts are exact long sums in `lo`
    * order (bucket keys order exactly as their lower bounds — the (e,
    * top) lexicographic order IS numeric order), and the estimate
    * reported is the bucket's lower bound mapped back through
    * `unitScale` — within a factor (1 + 2^−subBits) of every value the
    * bucket holds, the sketch's guarantee. Pure integer rank arithmetic;
    * identical in any engine. */
  def logHistQuantiles(registers: DataFrame, q: Int,
                       unitScale: Long = 100L): DataFrame = {
    require(q >= 1, s"quantile count must be >= 1, got $q")
    val rows = graft.util.DriverBound.collectBounded(
        registers.select(col("lo").cast("long"), col("cnt").cast("long")),
        65536, "logHistQuantiles registers")
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val spark = registers.sparkSession
    import spark.implicits._
    if (rows.isEmpty)
      return Seq.empty[(Long, Long, Double)].toDF("q_idx", "lo", "value")
    val totalN = rows.map(_._2).sum
    val cum = rows.scanLeft(0L)(_ + _._2).tail
    val out = (1 to q).map { j =>
      val target = math.max(1L, j.toLong * totalN / q)
      val i = cum.indexWhere(_ >= target)
      val lo = rows(if (i < 0) rows.length - 1 else i)._1
      (j.toLong, lo, lo.toDouble / unitScale.toDouble)
    }
    out.toDF("q_idx", "lo", "value")
  }

  /** AMS "tug-of-war" second-moment sketch (Alon, Matias & Szegedy,
    * STOC 1996): estimate `F2 = Σ_v f_v²` — the self-join size / skew
    * number — from `counters` independent ±1 projections. Each counter
    * j holds `c_j = Σ_v s_j(v)·f_v` with `s_j(v) ∈ {−1,+1}` a
    * deterministic hash sign; `E[c_j²] = F2`, so the estimate is the
    * median of `groups` group-means of the `c_j²` (median-of-means —
    * the variance/confidence trade the paper's §2.2 construction).
    * Where [[cmCells]]-based join-size estimation answers "how big is
    * A ⋈ B", F2 answers "how big is A ⋈ A" — the skew early-warning
    * before a self-join family (wedges, minhash bands) is attempted.
    *
    * Determinism device: the sign is bit 0 of the 60-bit md5 prefix of
    * `value#j` (the [[kmvRegisters]] hash idiom — hex prefix arithmetic
    * any engine reproduces); counters, squares, group sums and the
    * even-`groups` median (mean of the two middle order statistics,
    * floor) are exact integer arithmetic end-to-end.
    *
    * Scale shape: one map-combinable frequency aggregate, then
    * `counters` rows per DISTINCT value (not per row), one keyed re-sum
    * to `counters` rows, and an O(groups) driver-free final fold over a
    * frame of `groups` rows. `c_j` is bounded by total row count N, so
    * `c_j²` needs N ≤ ~3·10⁹ to stay in a long — the require guards the
    * square, sized for any per-shard sketch (merge shards by SUMMING
    * counter vectors before squaring, the mergeable-sketch discipline:
    * signs depend only on (value, j)). */
  def amsF2(df: DataFrame, valCol: String, counters: Int = 64,
            groups: Int = 8): DataFrame = {
    require(groups >= 2 && groups % 2 == 0,
      s"groups must be even and >= 2 (the median is the mean of the two " +
        s"middle group means), got $groups")
    require(counters >= 2 && counters % (2 * groups) == 0,
      s"counters must be a multiple of 2*groups, got $counters/$groups")
    val freq = df.filter(col(valCol).isNotNull)
      .groupBy(col(valCol).cast("string").as("__v"))
      .agg(count(lit(1)).as("__f"))
    val perGroup = counters / groups
    val cj = freq
      .select(col("__v"), col("__f"),
        explode(sequence(lit(0), lit(counters - 1))).as("__j"))
      .select(col("__j"),
        (when(pmod(conv(substring(md5(concat(col("__v"), lit("#"),
            col("__j").cast("string"))), 1, 15), 16, 10).cast("long"),
          lit(2L)) === 1L, lit(1L)).otherwise(lit(-1L)) * col("__f"))
          .as("__s"))
      .groupBy(col("__j")).agg(sum(col("__s")).as("__c"))
    val means = cj
      .select((col("__j") - pmod(col("__j"), lit(perGroup.toLong)))
        .divide(lit(perGroup.toLong)).cast("long").as("grp"),
        (col("__c") * col("__c")).as("__c2"))
      .groupBy(col("grp"))
      .agg(((sum(col("__c2")) - pmod(sum(col("__c2")),
        lit(perGroup.toLong))) / lit(perGroup.toLong))
        .cast("long").as("mean_c2"))
    // median of the group means: mean of the two middle order stats
    // (groups is even by the require), exact integer floor
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("mean_c2"), col("grp"))
    val mid = means.select(col("grp"), col("mean_c2"),
        row_number().over(w).as("__r"))
      .filter(col("__r") === groups / 2 || col("__r") === groups / 2 + 1)
      .agg(((sum(col("mean_c2")) - pmod(sum(col("mean_c2")), lit(2L)))
        / lit(2L)).cast("long").as("f2_estimate"))
    val exact = freq.agg(sum(col("__f") * col("__f")).as("f2_exact"))
    means.crossJoin(broadcast(mid)).crossJoin(broadcast(exact))
      .select(col("grp"), col("mean_c2"), col("f2_estimate"),
        col("f2_exact"))
      .orderBy(col("grp"))
  }
}
