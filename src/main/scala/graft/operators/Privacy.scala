package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy / re-identification audits over a dataset's quasi-identifier
  * columns — the release-gate a data-governance pipeline runs before a
  * corpus (or its metadata) leaves the curation boundary. These complement
  * the row-level PII scrubbing in [[graft.functions.TextFunctions]]:
  * scrubbing removes direct identifiers; these audits measure whether the
  * REMAINING attribute combinations still single people (or documents)
  * out.
  *
  * Both audits are one map-combinable aggregate over the quasi-identifier
  * key — the word-count shape: no window, no self-join, output bounded by
  * the number of distinct combinations, which is what makes them runnable
  * as a routine check on a 100 TB table.
  */
object Privacy {

  /** k-anonymity audit (Sweeney 2002): a row is k-anonymous when at
    * least `k` rows share its full quasi-identifier combination; any
    * combination with fewer is a re-identification risk. Returns one row
    * per distinct combination: (quasiCols..., n long, at_risk boolean).
    * NULL quasi-values group as their own combination (SQL GROUP BY
    * semantics) — an absent attribute is itself identifying.
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
  }

  /** l-diversity audit (Machanavajjhala et al. 2007): k-anonymity is not
    * enough when everyone in an equivalence class shares the same
    * SENSITIVE value — the attacker learns it without singling anyone
    * out. A class is (distinct) l-diverse when its sensitive column
    * takes at least `l` distinct values. Returns one row per distinct
    * quasi combination: (quasiCols..., n long, n_sensitive long,
    * at_risk boolean). NULL sensitive values are excluded from the
    * distinct count (SQL count-distinct semantics, identical in every
    * engine) — an all-NULL class therefore reports 0 and is at risk.
    */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("at_risk", col("n_sensitive") < l)
  }

  /** Payment-card PII scan — digit runs of plausible card length
    * (13–19) validated by the Luhn checksum (ISO/IEC 7812), the filter
    * that separates card numbers from order ids and timestamps: a
    * pattern-only scrubber either drowns in false positives or misses
    * formats, while Luhn rejects 90% of random digit runs for free.
    *
    * Pure integer arithmetic over ASCII digits (double every second
    * digit from the right, subtract 9 over 9, sum % 10 == 0) expressed
    * as SQL-level array ops — identical in any engine, map-only, no
    * UDF. Returns (id, n_candidates long — digit runs of card length,
    * n_valid long — runs passing Luhn, any_valid boolean). NULL text
    * scans as zero candidates. */
  def luhnScan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val runs = s"regexp_extract_all(coalesce($textCol, ''), '[0-9]{13,19}', 0)"
    val valids =
      s"""filter(transform($runs, s ->
         |  aggregate(sequence(1, length(s)), 0, (acc, i) ->
         |    acc + (CASE WHEN (length(s) - i) % 2 = 1
         |      THEN (CASE WHEN (ascii(substring(s, i, 1)) - 48) * 2 > 9
         |            THEN (ascii(substring(s, i, 1)) - 48) * 2 - 9
         |            ELSE (ascii(substring(s, i, 1)) - 48) * 2 END)
         |      ELSE ascii(substring(s, i, 1)) - 48 END)) % 10 = 0),
         |  b -> b)""".stripMargin
    df.select(col(idCol),
        expr(s"size($runs)").cast("long").as("n_candidates"),
        expr(s"size($valids)").cast("long").as("n_valid"))
      .withColumn("any_valid", col("n_valid") > 0L)
  }

  /** t-closeness audit (Li et al., ICDE 2007) — the refinement l-diversity
    * still misses: a class can be l-diverse yet have a sensitive
    * DISTRIBUTION far from the table's (e.g. 90% one disease where the
    * population has 5%), and the attacker learns the skew. A class is
    * t-close when the distance between its sensitive distribution and the
    * global one is <= `t`; `ordered = true` uses the paper's Earth Mover's
    * Distance for ordered attributes, `(1/(m−1)) Σ_i |Σ_{j<=i} (p_j − q_j)|`
    * over the m-value global support; `ordered = false` the categorical
    * variational distance `(1/2) Σ |p_j − q_j|`.
    *
    * Cross-engine exactness: both distances are computed as EXACT INTEGER
    * numerators — `|cum_c·N − cum_g·n|` (resp. `|c·N − g·n|`), summed as
    * DECIMAL(38,0) (overflow-safe at any table size), with ONE double
    * division `/ (n·N·(m−1))` (resp. `/ (2·n·N)`) at the end, then
    * round(6). No per-term double accumulates, so the audit replays
    * bit-identically in any engine.
    *
    * Returns one row per class: (quasiCols..., n long, emd double,
    * at_risk boolean). NULL sensitive values are excluded (they carry no
    * release risk for this attribute); classes that are all-NULL on the
    * sensitive column therefore do not appear.
    *
    * Scale shape: per-value class counts (map-combinable), an m-row
    * broadcast of the global support onto the distinct-class frame via a
    * constant-key hash join (m = |support| is audit-bounded), and a
    * window partitioned BY CLASS — thousands of independent partitions,
    * never the global single-partition trap. */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, t: Double,
                      ordered: Boolean = true): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(t > 0.0 && t < 1.0, s"t must be in (0,1), got $t")
    val qc = quasiCols.map(col)
    val base = df.filter(col(sensitiveCol).isNotNull)
      .select(qc :+ col(sensitiveCol).as("__v"): _*)
    val global = base.groupBy(col("__v")).agg(count(lit(1)).as("__g"))
    val tot = global.agg(coalesce(sum(col("__g")), lit(0L)),
      count(lit(1))).first
    val bigN = tot.getLong(0); val m = tot.getLong(1)
    require(bigN > 0, "tClosenessAudit needs rows with a sensitive value")
    require(!ordered || m >= 2,
      s"ordered EMD needs >= 2 distinct sensitive values, got $m")
    val classes = base.groupBy(qc: _*).agg(count(lit(1)).as("__n"))
    // class-list × global support: constant-key broadcast hash join (the
    // grid is |classes| · m rows — audit-bounded, never O(table))
    val grid = classes.withColumn("__k", lit(1))
      .join(broadcast(global.withColumn("__k", lit(1))), "__k").drop("__k")
    // null-safe (<=>) join: a NULL quasi-value is its own class (GROUP BY
    // semantics) and must still receive its per-value counts
    val cv = base.groupBy(qc :+ col("__v"): _*).agg(count(lit(1)).as("__c"))
      .select(quasiCols.zipWithIndex.map { case (q, i) =>
        col(q).as(s"__q$i") } ++ Seq(col("__v").as("__w"), col("__c")): _*)
    val joinCond = quasiCols.zipWithIndex
      .map { case (q, i) => col(q) <=> col(s"__q$i") }
      .reduce(_ && _) && col("__v") === col("__w")
    val joined = grid.join(cv, joinCond, "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qc: _*).orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // ordered: the final (i = m) cumulative term is |n·N − N·n| = 0 by
    // construction, so summing all m rows IS the 1..m−1 paper sum.
    // Products go through DECIMAL(38,0) BEFORE multiplying — count·count
    // in long would overflow at ~3e9 rows
    def d(c: Column) = c.cast("decimal(38,0)")
    val num =
      if (ordered) abs(d(sum(col("__c")).over(w)) * lit(bigN)
        - d(sum(col("__g")).over(w)) * col("__n"))
      else abs(d(col("__c")) * lit(bigN) - d(col("__g")) * col("__n"))
    val denom =
      if (ordered) col("__n").cast("double") * lit(bigN.toDouble) *
        lit((m - 1).toDouble)
      else col("__n").cast("double") * lit(bigN.toDouble) * lit(2.0)
    joined
      .withColumn("__num", num.cast("decimal(38,0)"))
      .groupBy(qc :+ col("__n"): _*)
      .agg(sum(col("__num")).as("__s"))
      .select(qc ++ Seq(col("__n").as("n"),
        (round(col("__s").cast("double") / denom, 6) + lit(0.0)).as("emd")): _*)
      .withColumn("at_risk", col("emd") > t)
  }

  /** Deterministic keyed pseudonymization (GDPR Art. 4(5) discipline):
    * each value of the listed columns is replaced by the stable
    * surrogate `pn_` + first 16 hex chars of `md5(salt || ":" || value)`.
    * SAME salt + SAME value → SAME token, so referential integrity
    * survives — two tables pseudonymized with one salt still join on
    * the token — while recovery requires the salt (keep it out of the
    * released data; rotate it to break linkage between releases).
    * Contrast [[graft.functions.TextFunctions]]'s scrubbing, which
    * REDACTS and destroys joinability. NULLs stay NULL (absent ≠
    * identifying here, unlike the k-anonymity audit's grouping).
    *
    * Scale shape: MAP-ONLY — one codegen'd md5 per cell, no shuffle, no
    * driver state; the cheapest possible 100 TB transform. */
  /** Differentially-private noisy counts — the Laplace mechanism
    * (Dwork, McSherry, Nissim & Smith, TCC 2006): release per-group
    * counts with additive Laplace(1/ε) noise so any single row's
    * presence changes each released number's distribution by at most
    * e^ε (count queries have sensitivity 1). The release-side
    * complement of the [[kAnonymityAudit]]/[[tClosenessAudit]] family:
    * those audit a table you intend to publish, this publishes only
    * noised aggregates.
    *
    * Determinism device (this is an ENGINE, not an RNG service): the
    * Laplace draw is the inverse-CDF transform of a hash uniform —
    * `u = (h60 mod 1e9 + 0.5)/1e9`, `noise = −(1/ε)·sign(u−½)·
    * ln(1 − 2|u−½|)` — one md5 + the same four IEEE double ops in any
    * engine, then ONE floor to micro units. Runs are replayable (same
    * groups → same noise), which is what a pipeline needs to audit or
    * re-emit a release; PRIVACY therefore rests on the salt staying
    * secret and per-release (a public salt lets anyone re-derive the
    * noise — the scaladoc contract, stated plainly). Budget
    * composition across releases is the caller's: ε sums over releases
    * touching the same individuals (see [[dpMedianGrid]]'s composition
    * paragraph — it governs all three DP release functions here).
    *
    * Returns (groupCols…, dp_count_micro long, dp_count double
    * round(6)); true counts are NOT in the output. Negative releases
    * are kept (clamping is caller post-processing and costs bias).
    * Scale shape: one map-combinable count + map-only noise — nothing
    * about the mechanism touches row data beyond the count. */
  def dpNoisyCounts(df: DataFrame, groupCols: Seq[String], salt: String,
                    epsilonMicro: Long = 1000000L): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(epsilonMicro >= 1000L && epsilonMicro <= 100000000L,
      s"epsilonMicro must be in [1e3,1e8], got $epsilonMicro")
    val key = concat_ws("#",
      (lit(salt) +: groupCols.map(c => col(c).cast("string"))): _*)
    val uNano = pmod(conv(substring(md5(key), 1, 15), 16, 10)
      .cast("long"), lit(1000000000L))
    val d = (uNano.cast("double") + lit(0.5)) / lit(1e9) - lit(0.5)
    val noise = when(d >= 0, lit(-1.0)).otherwise(lit(1.0)) *
      log(lit(1.0) - lit(2.0) * abs(d)) *
      (lit(1e6) / lit(epsilonMicro.toDouble))
    df.filter(groupCols.map(c => col(c).isNotNull).reduce(_ && _))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .select(groupCols.map(col) ++ Seq(
        (lit(1000000L) * col("__n") +
          floor(noise * lit(1e6)).cast("long")).as("dp_count_micro")): _*)
      .withColumn("dp_count",
        round(col("dp_count_micro").cast("double") / lit(1e6), 6)
          + lit(0.0))
  }

  /** Exponential-mechanism median HEURISTIC (McSherry & Talwar, FOCS
    * 2007 scoring), the selection primitive beside [[dpNoisyCounts]]'
    * Laplace: every observed value competes with utility
    * `u(v) = −|#below(v)·2 + #eq(v) − n|` (twice the rank distance to
    * the middle; sensitivity 2) and the release is the argmax of
    * `ε·u/4 + Gumbel(hash)` — the Gumbel-max trick makes
    * "sample ∝ exp(ε·u/2Δ)" a deterministic hash argmax.
    *
    * NOT formally ε-DP: candidates are drawn from the OBSERVED
    * distinct values, so the output support is data-dependent — a
    * value contributed by a single individual has probability 0 under
    * the neighboring dataset that drops them, which is unbounded
    * privacy loss on that outcome. Treat this as a deterministic
    * exponential-mechanism heuristic; for the formal guarantee use
    * [[dpMedianGrid]], which scores a FIXED caller-supplied candidate
    * grid independent of the data.
    *
    * Determinism device: per candidate, u is exact integer rank
    * arithmetic (one partitioned running sum); the Gumbel draw is
    * `−ln(−ln(u01))` of the salted md5 nano-uniform of the (group,
    * value) pair — the [[dpNoisyCounts]] hash discipline; the argmax
    * tie-breaks on (score desc, value asc). Values must arrive as
    * LONGS (quantize floats upstream): hashing a float's string is
    * engine-dependent, a long's is not. Replayable release — the salt
    * staying secret and per-release IS the privacy boundary, as
    * documented on [[dpNoisyCounts]].
    *
    * Scale shape: one distinct-value count frame per group, one
    * partitioned cumulative window over it (bounded by distinct
    * values, not rows), one max_by per group. */
  def dpMedian(df: DataFrame, groupCols: Seq[String], valCol: String,
               salt: String, epsilonMicro: Long = 1000000L): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(epsilonMicro >= 1000L && epsilonMicro <= 100000000L,
      s"epsilonMicro must be in [1e3,1e8], got $epsilonMicro")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val counts = df
      .filter(groupCols.map(c => col(c).isNotNull).reduce(_ && _) &&
        col(valCol).isNotNull)
      .groupBy(g :+ col(valCol).cast("long").as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(g: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(g: _*)
    val ranked = counts
      .withColumn("__upto", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(wn))
      .select(g ++ Seq(col("__v"), col("__c"),
        (lit(2L) * (col("__upto") - col("__c")) + col("__c") -
          col("__n")).as("__d")): _*)
      .withColumn("__u", -abs(col("__d")))
    val key = concat_ws("#",
      (lit(salt) +: g.map(_.cast("string"))) :+
        col("__v").cast("string"): _*)
    val uNano = pmod(conv(substring(md5(key), 1, 15), 16, 10)
      .cast("long"), lit(1000000000L))
    val u01 = (uNano.cast("double") + lit(0.5)) / lit(1e9)
    val scored = ranked.withColumn("__score",
      lit(epsilonMicro.toDouble / 1e6) * col("__u").cast("double") /
        lit(4.0) - log(-log(u01)))
    val pick = Window.partitionBy(g: _*)
      .orderBy(col("__score").desc, col("__v"))
    scored.withColumn("__r", row_number().over(pick))
      .filter(col("__r") === 1)
      .select(g :+ col("__v").as("dp_median"): _*)
  }

  /** [[dpMedian]] over a FIXED, data-independent candidate grid — the
    * variant that is ε-DP WHEN the salt is a uniformly random, secret,
    * SINGLE-USE seed (the same framing as [[dpNoisyCounts]]: the
    * Gumbel draw is a deterministic function of the salt, so the
    * mechanism's randomness IS the salt's; a public, guessed, or
    * reused salt voids the guarantee). Mechanically everything the
    * exponential mechanism needs holds: the candidate set is
    * `lo, lo+step, …, ≤ hi` regardless of the data (the public-domain
    * requirement), values are CLAMPED into [lo, hi] before ranking
    * (bounding the utility's sensitivity at 2), and every grid point
    * gets the same integer rank utility
    * `u(v) = −|2·#below(v) + #eq(v) − n|` and salted Gumbel score as
    * [[dpMedian]]. The release is always a grid point, so an outlier
    * contributed by one individual can shift scores but never mint a
    * new candidate.
    *
    * PRIVACY BUDGET IS YOURS TO COMPOSE: each release over data
    * containing the same individuals spends its own ε, and the total
    * loss is the SUM across releases (sequential composition) — this
    * library prices one release; nothing here tracks or enforces a
    * cumulative budget, and re-releasing under a fresh salt does not
    * reset it. The same paragraph governs [[dpNoisyCounts]] and the
    * [[dpMedian]] heuristic.
    *
    * Shape: the grid joins the distinct-value count frame by a
    * union–sort–carry (the as-of idiom), NOT a range join — one
    * cumulative window over (values + grid markers) prices every
    * candidate's rank in a single shuffle. Grid rows sort AFTER data
    * rows at equal value, so a grid point's running sum already
    * includes ties. Scale shape: distinct values + |grid|·|groups|
    * rows through one window — bounded by cardinality, not row count.
    * Same one-release-per-salt caveat as [[dpNoisyCounts]]. */
  def dpMedianGrid(df: DataFrame, groupCols: Seq[String], valCol: String,
                   salt: String, lo: Long, hi: Long, step: Long = 1L,
                   epsilonMicro: Long = 1000000L): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(epsilonMicro >= 1000L && epsilonMicro <= 100000000L,
      s"epsilonMicro must be in [1e3,1e8], got $epsilonMicro")
    require(step >= 1L && hi >= lo, s"need hi >= lo and step >= 1")
    val m = (hi - lo) / step + 1
    require(m <= 65536L,
      s"grid has $m candidates; keep it <= 65536 (widen step)")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val groupsNonNull = groupCols.map(c => col(c).isNotNull).reduce(_ && _)
    val data = df
      .filter(groupsNonNull && col(valCol).isNotNull)
      .select(g :+ greatest(least(col(valCol).cast("long"), lit(hi)),
        lit(lo)).as("__v"): _*)
      .groupBy(g :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__grid", lit(0))
    val grid = df.filter(groupsNonNull && col(valCol).isNotNull)
      .select(g: _*).distinct()
      .select(g :+ explode(sequence(lit(lo), lit(hi), lit(step)))
        .as("__v"): _*)
      .withColumn("__c", lit(0L)).withColumn("__grid", lit(1))
    val wCum = Window.partitionBy(g: _*)
      .orderBy(col("__v").asc, col("__grid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wEq = Window.partitionBy(g :+ col("__v"): _*)
    val wN = Window.partitionBy(g: _*)
    val ranked = data.unionByName(grid)
      .withColumn("__upto", sum(col("__c")).over(wCum))
      .withColumn("__eq", sum(col("__c")).over(wEq))
      .withColumn("__n", sum(col("__c")).over(wN))
      .filter(col("__grid") === 1)
      // d = 2·#below + #eq − n with #below = upto − eq
      .withColumn("__u",
        -abs(lit(2L) * col("__upto") - col("__eq") - col("__n")))
    val key = concat_ws("#",
      (lit(salt) +: g.map(_.cast("string"))) :+
        col("__v").cast("string"): _*)
    val uNano = pmod(conv(substring(md5(key), 1, 15), 16, 10)
      .cast("long"), lit(1000000000L))
    val u01 = (uNano.cast("double") + lit(0.5)) / lit(1e9)
    val scored = ranked.withColumn("__score",
      lit(epsilonMicro.toDouble / 1e6) * col("__u").cast("double") /
        lit(4.0) - log(-log(u01)))
    val pick = Window.partitionBy(g: _*)
      .orderBy(col("__score").desc, col("__v"))
    scored.withColumn("__r", row_number().over(pick))
      .filter(col("__r") === 1)
      .select(g :+ col("__v").as("dp_median"): _*)
  }

  def pseudonymize(df: DataFrame, salt: String,
                   cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to pseudonymize")
    require(salt.nonEmpty, "empty salt defeats pseudonymization")
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(col(c).isNull, lit(null)).otherwise(
        concat(lit("pn_"),
          substring(md5(concat(lit(salt), lit(":"),
            col(c).cast("string"))), 1, 16))))
    }
  }

  /** Format-preserving email pseudonymization: `local@domain` keeps its
    * DOMAIN (per-provider aggregates stay computable) while the local
    * part becomes the keyed token; strings without `@` tokenize whole.
    * Same salt-keyed md5 surrogate as [[pseudonymize]]. */
  def pseudonymizeEmail(c: Column, salt: String): Column = {
    require(salt.nonEmpty, "empty salt defeats pseudonymization")
    val at = instr(c, "@")
    def token(s: Column) =
      concat(lit("pn_"), substring(md5(concat(lit(salt), lit(":"), s)), 1, 16))
    when(c.isNull, lit(null))
      .when(at > 0, concat(token(c.substr(lit(1), at - 1)),
        c.substr(at, length(c) - at + 1)))
      .otherwise(token(c))
  }
}
