package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the batch twin of
  * [[graft.streaming]]'s stateful sessionizer.
  *
  * One shuffle on the key, one within-key sort; the session index is a
  * running sum of new-session markers (`gap` exceeded vs previous event),
  * so the whole computation is two window functions over the same sorted
  * partition — no self-join, no state store.
  */
object Sessions {

  /** Adds `session_seq` (0-based per-key session index) to `df`.
    * `tsCol` must be a timestamp; events exactly `gapSeconds` apart stay
    * in the same session (strict `>` starts a new one). */
  def assign(df: DataFrame, keyCol: String, tsCol: String,
             gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, "gap must be positive")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull, lit(0))
      .when(col(tsCol).cast("double") - prev.cast("double") > gapSeconds, lit(1))
      .otherwise(lit(0))
    df.withColumn("session_seq",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
  }

  /** Per-key, per-session aggregate: event count and span in seconds. */
  def stats(df: DataFrame, keyCol: String, tsCol: String,
            gapSeconds: Long): DataFrame =
    assign(df, keyCol, tsCol, gapSeconds)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        (max(col(tsCol)).cast("double") - min(col(tsCol)).cast("double"))
          .cast("long").as("span_sec"))

  /** Cohort retention: group keys by the period of their FIRST event
    * (the cohort), then count how many of each cohort come back in each
    * later period. Returns (cohort date, offset int ≥ 0, n_keys long) —
    * offset 0 is the cohort's size by construction. `periodDays` buckets
    * time as `floor(days_since_epoch / periodDays)`, so periods are
    * aligned and engine-replayable (no calendar-week locale traps).
    *
    * Scale shape: first-event is a min-aggregate on the key; activity
    * is a distinct on (key, period); their join is keyed on the SAME
    * key; the final rollup groups (cohort, offset) — all map-combinable,
    * nothing O(keys²), no window over the event stream. */
  def cohortRetention(df: DataFrame, keyCol: String, tsCol: String,
                      periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, "periodDays must be >= 1")
    def period(c: org.apache.spark.sql.Column) =
      floor(datediff(to_date(c), lit("1970-01-01").cast("date"))
        .cast("double") / periodDays).cast("long")
    val active = df.select(col(keyCol).as("__ck"),
      period(col(tsCol)).as("__p")).distinct()
    val first = active.groupBy(col("__ck")).agg(min(col("__p")).as("__c0"))
    active.join(first, Seq("__ck"))
      .groupBy(col("__c0"), (col("__p") - col("__c0")).cast("int").as("offset"))
      .agg(count(lit(1)).as("n_keys"))
      .select(date_add(lit("1970-01-01").cast("date"),
          (col("__c0") * periodDays).cast("int")).as("cohort"),
        col("offset"), col("n_keys"))
  }

  /** Ordered funnel: how many keys reach each stage of
    * `stages = Seq(A, B, C, …)`, where reaching stage k means an event
    * of type `stages(k)` occurred AT OR AFTER the earliest qualifying
    * event of stage k−1 (the standard product-analytics conversion
    * funnel; ties at the same timestamp count, matching the usual
    * "same-batch pixel" convention). Returns one row per stage:
    * (stage int 1-based, event_type, n_keys long) — n_keys is
    * monotonically non-increasing by construction.
    *
    * Scale shape: stage k is a filtered min-aggregate on the key joined
    * to stage k−1's frame — every shuffle is keyed on the SAME key
    * column, so AQE coalesces them into co-partitioned exchanges, and
    * per-stage frames only shrink. k stages = k passes over the (typed,
    * pre-filtered) event subsets, never a per-key sort of the full
    * stream and never anything O(keys²). Single-pass sequence matching
    * per key is possible with a sorted window but serializes hot keys;
    * the per-stage aggregate form keeps every stage map-combinable. */
  def funnel(df: DataFrame, keyCol: String, typeCol: String, tsCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    require(stages.distinct.length == stages.length,
      "repeated stage types are ambiguous — rename or pre-tag them")
    val spark = df.sparkSession
    import spark.implicits._
    // each stage's frame is materialized before its count: the per-stage
    // count actions would otherwise re-execute the whole join chain up
    // to that stage (O(stages²) scans instead of O(stages)); the state
    // is one (key, first-ts) row per key still in the funnel, shrinking
    // stage over stage
    var reached = df.filter(col(typeCol) === stages.head)
      .groupBy(col(keyCol).as("__fk"))
      .agg(min(col(tsCol)).as("__ft"))
      .localCheckpoint()
    val counts = Seq.newBuilder[(Int, String, Long)]
    counts += ((1, stages.head, reached.count()))
    for ((st, i) <- stages.zipWithIndex.drop(1)) {
      reached = df.filter(col(typeCol) === st)
        .select(col(keyCol).as("__fk"), col(tsCol).as("__ts"))
        .join(reached, Seq("__fk"))
        .filter(col("__ts") >= col("__ft"))
        .groupBy(col("__fk"))
        .agg(min(col("__ts")).as("__ft"))
        .localCheckpoint()
      counts += ((i + 1, st, reached.count()))
    }
    counts.result().toDF("stage", "event_type", "n_keys")
  }

  /** First-order Markov transition matrix over per-key event sequences —
    * (prev_type, next_type, n, p) where p is row-normalized over each
    * prev_type. The behavioral-analytics sibling of [[funnel]]: funnels
    * test ONE hypothesized path, the transition matrix surfaces every
    * observed one (and anomalies: error→error loops, view→purchase
    * shortcuts).
    *
    * One lag window per key ordered by (ts, tiebreakCol) — the explicit
    * tiebreak makes equal-timestamp pairs deterministic across engines —
    * then a map-combinable pair count; the per-prev normalizer joins on
    * prev_type (|types| rows, broadcast). Each key's first event has no
    * predecessor and contributes nothing. p rounds to 6 dp. */
  def transitionMatrix(df: DataFrame, keyCol: String, tsCol: String,
                       typeCol: String, tiebreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val pairs = df
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("prev_type")).agg(sum(col("n")).as("__tot"))
    pairs.join(broadcast(totals), Seq("prev_type"))
      .select(col("prev_type"), col("next_type"), col("n"),
        round(col("n").cast("double") / col("__tot"), 6).as("p"))
  }

  /** Interval-union coverage per key — merge overlapping/touching
    * half-open intervals and report how much of the timeline each key
    * actually covers (the gaps-and-islands UNION, where [[assign]]
    * sessionizes by inactivity gaps): the "real exposure time" number
    * behind ad-viewability, on-call coverage, sensor uptime, and
    * dwell-time dedup — summing raw durations double-counts every
    * overlap.
    *
    * Sweep device: in (start, end) order per key, an interval starts a
    * new island iff its start exceeds the running max of all PRIOR
    * ends (strict: touching half-open intervals merge); island length
    * is `max(end) − min(start)` — exact integer micros end-to-end, one
    * partitioned window + one grouped aggregate, keys distribute. */
  def intervalCoverage(df: DataFrame, keyCol: String, startCol: String,
                       endCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val marked = df
      .filter(col(keyCol).isNotNull && col(startCol).isNotNull &&
        col(endCol).isNotNull)
      .withColumn("__new",
        when(prevMax.isNull || col(startCol) > prevMax, 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    marked.groupBy(col(keyCol), col("__isl"))
      .agg(count(lit(1)).as("__n"),
        (max(col(endCol)) - min(col(startCol))).as("__len"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n_events"),
        count(lit(1)).as("n_islands"),
        sum(col("__len")).as("covered_micros"))
  }

  /** Stationary distribution of the first-order transition chain —
    * where the [[transitionMatrix]] process SPENDS ITS TIME in the
    * long run (π = πP by power iteration): the behavioral base-rate
    * vector that turns "view→click is 30%" rows into "the system is in
    * `click` 12% of the time", the reference against which funnel and
    * drift monitors read deviations.
    *
    * Integer-exact device (the [[Graph.personalizedPageRank]] grid
    * discipline, made SCALE-INDEPENDENT): transition probabilities
    * quantize ONCE to micro units (`p = floordiv(1e6·c_ij, Σ_j c_ij)`),
    * mass lives on a 1e12 grid, and each push is
    * `floordiv(π_i·p_ij, 1e6)` — products bounded by 1e18 REGARDLESS
    * of the raw counts, so no count magnitude can overflow the grid.
    * Each floor leaks ≤ 1 pico per (edge, round) — one-sided, bounded,
    * and replayed exactly by the oracle. Nodes with no out-edges keep
    * their mass in place (self-loop semantics, documented).
    *
    * Scale shape: per round ONE keyed equi-join of the edge frame
    * against π + one grouped sum; state localCheckpoints per round
    * (the iterative-graph lineage discipline). k×k edge frames
    * distribute; nothing collects but the node count. */
  def markovStationary(counts: DataFrame, prevCol: String,
                       nextCol: String, cntCol: String,
                       iterations: Int = 3): DataFrame = {
    require(iterations >= 1 && iterations <= 16,
      s"iterations must be in [1,16], got $iterations")
    def fdiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)) / b).cast("long")
    val c = counts
      .select(col(prevCol).as("__i"), col(nextCol).as("__j"),
        col(cntCol).cast("long").as("__c"))
      .filter(col("__i").isNotNull && col("__j").isNotNull &&
        col("__c") > 0L)
      .localCheckpoint() // upstream is typically a window over raw events
    val tot = c.groupBy(col("__i")).agg(sum(col("__c")).as("__t"))
    val p = c.join(tot, Seq("__i"))
      .select(col("__i"), col("__j"),
        fdiv(lit(1000000L) * col("__c"), col("__t")).as("__p"))
      .localCheckpoint()
    val nodes = c.select(col("__i").as("node"))
      .union(c.select(col("__j")))
      .distinct().localCheckpoint()
    val k = nodes.count()
    val dangling = nodes.join(tot.select(col("__i").as("node")),
      Seq("node"), "left_anti").withColumn("__dang", lit(1L))
    var pi = nodes.withColumn("pi", lit(1000000000000L / k))
      .localCheckpoint()
    var r = 0
    while (r < iterations) {
      val influx = p
        .join(pi.select(col("node").as("__i"), col("pi")), Seq("__i"))
        .select(col("__j").as("node"),
          fdiv(col("pi") * col("__p"), lit(1000000L)).as("__f"))
        .groupBy(col("node")).agg(sum(col("__f")).as("__f"))
      pi = pi
        .join(influx, Seq("node"), "left")
        .join(dangling, Seq("node"), "left")
        .select(col("node"),
          (coalesce(col("__f"), lit(0L)) +
            when(col("__dang") === 1L, col("pi")).otherwise(lit(0L)))
            .as("pi"))
        .localCheckpoint()
      r += 1
    }
    pi.select(col("node"), col("pi").as("pi_pico")).orderBy(col("node"))
  }

  /** Top-k 3-step event paths: the most common `a>b>c` trigrams of the
    * per-user event stream — the n-gram extension of
    * [[transitionMatrix]] that surfaces multi-step flows (view>click>
    * purchase vs view>error>view) instead of memoryless hops. Two lags
    * over the per-user (ts, tiebreak) order, one count, a deterministic
    * (n desc, path) top-k. Keyed windows only. */
  def topEventPaths(df: DataFrame, keyCol: String, tsCol: String,
                    tiebreakCol: String, typeCol: String,
                    k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    df.withColumn("__p1", lag(col(typeCol), 1).over(w))
      .withColumn("__p2", lag(col(typeCol), 2).over(w))
      .filter(col("__p1").isNotNull && col("__p2").isNotNull)
      .select(concat_ws(">", col("__p2"), col("__p1"), col(typeCol))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(k)
  }

  /** Last-touch conversion attribution: for every `target` event, the
    * most recent PRIOR event of the same user that isn't itself a
    * target — the channel that "gets credit". Carried with one
    * ignore-nulls `last` over a per-user (ts, tiebreak)-ordered window
    * with a strictly-preceding frame, so a conversion with no prior
    * touch attributes to 'none' and back-to-back conversions don't
    * credit each other. Returns (attributed, n_conversions long).
    *
    * Scale shape: one keyed per-user window (no global ordering) + one
    * map-combinable count by channel — the |channels|-row result is the
    * only thing that leaves the shuffle. */
  def lastTouchAttribution(df: DataFrame, keyCol: String, tsCol: String,
                           tiebreakCol: String, typeCol: String,
                           target: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__lt",
        last(when(col(typeCol) =!= target, col(typeCol)),
          ignoreNulls = true).over(w))
      .filter(col(typeCol) === target)
      .groupBy(coalesce(col("__lt"), lit("none")).as("attributed"))
      .agg(count(lit(1)).as("n_conversions"))
      .orderBy(col("attributed"))
  }
}
