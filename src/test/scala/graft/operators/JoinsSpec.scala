package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val events = Seq(
    (1L, 100L, ts("2024-01-10 00:00:00")), // after two orders
    (2L, 100L, ts("2024-01-05 00:00:00")), // exactly at an order's time
    (3L, 100L, ts("2024-01-01 00:00:00")), // before any order
    (4L, 200L, ts("2024-06-01 00:00:00")), // other key
    (5L, 300L, ts("2024-06-01 00:00:00"))  // key with no orders at all
  ).toDF("event_id", "user_id", "ts")

  private val orders = Seq(
    (10L, 100L, ts("2024-01-03 00:00:00"), 30.0),
    (11L, 100L, ts("2024-01-05 00:00:00"), 50.0), // tie on time with 12
    (12L, 100L, ts("2024-01-05 00:00:00"), 70.0), // wins tie (bigger key)
    (20L, 200L, ts("2024-05-01 00:00:00"), 99.0)
  ).toDF("o_id", "cust", "o_ts", "price")

  test("asofJoin: backward match, <= inclusivity, deterministic tiebreak") {
    val out = Joins.asofJoin(events, orders,
        leftTime = "ts", rightTime = "o_ts",
        leftBy = Seq("user_id"), rightBy = Seq("cust"),
        rightCols = Seq("o_id", "price"),
        tiebreak = Some("o_id"), how = "left")
      .orderBy($"event_id")
      .select($"event_id", $"o_id", $"price")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(out.toSeq == Seq(
      (1L, Some(12L), Some(70.0)), // latest time 01-05, tie -> max o_id
      (2L, Some(12L), Some(70.0)), // same-instant order IS visible (<=)
      (3L, None, None),            // nothing at or before
      (4L, Some(20L), Some(99.0)),
      (5L, None, None)))           // key absent from right
  }

  test("asofJoin inner drops unmatched left rows; left schema is preserved") {
    val out = Joins.asofJoin(events, orders,
      "ts", "o_ts", Seq("user_id"), Seq("cust"),
      Seq("o_id"), tiebreak = Some("o_id"), how = "inner")
    assert(out.columns.toSeq == Seq("event_id", "user_id", "ts", "o_id"))
    assert(out.select($"event_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 4L))
  }

  test("asofJoin plan: one shuffle per side on the key, no nested loop") {
    val out = Joins.asofJoin(events, orders,
      "ts", "o_ts", Seq("user_id"), Seq("cust"), Seq("o_id"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"asof must not degenerate to a nested-loop join: $plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("asofJoin salt: identical results on a planted hot key, straggler rows drop") {
    // one user holds 50% of all events and 50% of all orders — the
    // unsalted carry window serializes that key through one task
    val n = 20000
    val hotEvents = (0 until n / 2).map(i =>
      (i.toLong, 1L, 1000L + i * 4L))
    val coldEvents = (n / 2 until n).map(i =>
      (i.toLong, 2L + (i % 500).toLong, 1000L + i * 4L))
    val ev = (hotEvents ++ coldEvents).toDF("event_id", "user_id", "t")
    val hotOrders = (0 until n / 2).map(i =>
      (100000L + i, 1L, 990L + i * 4L, i * 1.5))
    val coldOrders = (n / 2 until n).map(i =>
      (100000L + i, 2L + (i % 500).toLong, 990L + i * 4L, i * 1.5))
    val ord = (hotOrders ++ coldOrders).toDF("o_id", "cust", "o_t", "price")

    def run(salt: Option[Double]) = Joins.asofJoin(ev, ord,
      "t", "o_t", Seq("user_id"), Seq("cust"),
      Seq("o_id", "price"), tiebreak = Some("o_id"),
      saltBucketWidth = salt)

    // correctness: salting must not change a single row
    val plain = run(None).orderBy($"event_id").collect().toSeq
    val salted = run(Some(2000.0)).orderBy($"event_id").collect().toSeq
    assert(salted === plain)

    // skew: the worst shuffle-read task must shrink by severalfold —
    // measured on records (compression-independent), worst stage of each.
    // .rdd.count() materializes every output column so the carry window
    // (and its shuffle) cannot be pruned the way .count() prunes it; AQE
    // off keeps the 32 reduce tasks distinct, like MetricsSkewSpec
    import graft.metrics.SkewAudit
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (_, plainRep) = SkewAudit.audit(spark) { run(None).rdd.count() }
      val (_, saltedRep) = SkewAudit.audit(spark) { run(Some(2000.0)).rdd.count() }
      val plainMax = plainRep.map(_.maxShuffleReadRecords).max
      val saltedMax = saltedRep.map(_.maxShuffleReadRecords).max
      assert(plainMax >= n.toLong,
        s"hot key should pin ~half of all ${2 * n} rows in one task, got $plainMax")
      // the straggler measure is max/median WITHIN the worst stage: the
      // hot key makes one task carry ~4.5x the median; salted, every
      // stage is balanced. (An absolute-max bound would be partition-
      // count-limited: the test session runs few reduce tasks, so even a
      // perfectly flat distribution keeps max near total/partitions.)
      val plainSkew = plainRep.map(_.recordSkew).max
      val saltedSkew = saltedRep.map(_.recordSkew).max
      assert(plainSkew > 3.0,
        s"hot key should show record skew > 3x, got $plainSkew")
      assert(saltedSkew < 2.0,
        s"salted stages must be balanced, got $saltedSkew: " +
          saltedRep.filter(_.maxShuffleReadRecords > 0).toString)
      assert(saltedMax < plainMax,
        s"salting must strictly shrink the straggler: $plainMax -> $saltedMax")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("bandJoin: inclusive band, cross-bin matches, key isolation") {
    val pts = Seq((1L, 10L, 100.0), (2L, 10L, 205.0), (3L, 20L, 100.0))
      .toDF("pid", "k", "x")
    val refs = Seq(
      (50L, 10L, 90.0),   // |100-90|=10 == band → inclusive match for pid 1
      (51L, 10L, 199.0),  // bin below 205 but within band → cross-bin match
      (52L, 10L, 300.0),  // out of band for everyone
      (53L, 30L, 100.0))  // exact value, wrong key
      .toDF("rid", "rk", "y")
    val out = Joins.bandJoin(pts, refs, "x", "y",
        Seq("k"), Seq("rk"), band = 10.0)
      .select($"pid", $"rid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 50L), (2L, 51L)))
  }

  test("bandJoin: pairs meet in exactly one bin (no duplicates)") {
    val pts = Seq((1L, 1L, 100.0)).toDF("pid", "k", "x")
    val refs = Seq((9L, 1L, 99.0)).toDF("rid", "rk", "y")
    // narrow bins: the ref row replicates to many bins, but only the
    // left row's single bin can produce the pair
    val out = Joins.bandJoin(pts, refs, "x", "y", Seq("k"), Seq("rk"),
      band = 10.0, binWidth = Some(2.0))
    assert(out.count() == 1)
  }

  test("intervalOverlapJoin: parity vs the naive nested-loop join on " +
       "random intervals, across bin widths") {
    val rnd = new scala.util.Random(7)
    val lft = (0 until 120).map(i =>
      (i.toLong, i.toLong % 4, rnd.nextInt(1000).toDouble,
        rnd.nextInt(40).toDouble)).map { case (id, k, s, len) =>
      (id, k, s, s + len) }.toDF("lid", "lk", "ls", "le")
    val rgt = (0 until 120).map(i =>
      (1000L + i, i.toLong % 4, rnd.nextInt(1000).toDouble,
        rnd.nextInt(40).toDouble)).map { case (id, k, s, len) =>
      (id, k, s, s + len) }.toDF("rid", "rk", "rs", "re")
    val naive = lft.crossJoin(rgt)
      .filter($"lk" === $"rk" && $"ls" <= $"re" && $"rs" <= $"le")
      .select($"lid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    // narrow bins (many replicas), matched bins, wide bins — identical
    // pair sets, each pair exactly once
    for (w <- Seq(7.0, 40.0, 500.0)) {
      val got = Joins.intervalOverlapJoin(lft, rgt, "ls", "le", "rs", "re",
          Seq("lk"), Seq("rk"), binWidth = w)
        .select($"lid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"duplicate pairs at binWidth=$w")
      assert(got.toSet == naive, s"pair-set mismatch at binWidth=$w")
    }
  }

  test("intervalOverlapJoin: empty intervals match nothing; empty sides " +
       "are fine; plan is an equi-join, not a nested loop") {
    val lft = Seq((1L, 10.0, 5.0), (2L, 0.0, 100.0)).toDF("lid", "ls", "le")
    val rgt = Seq((9L, 50.0, 60.0)).toDF("rid", "rs", "re")
    // row 1 has end < start → dropped; row 2 overlaps
    val out = Joins.intervalOverlapJoin(lft, rgt, "ls", "le", "rs", "re",
      Nil, Nil, binWidth = 10.0)
    assert(out.select("lid").collect().map(_.getLong(0)).toSeq == Seq(2L))
    val empty = Seq.empty[(Long, Double, Double)].toDF("rid", "rs", "re")
    assert(Joins.intervalOverlapJoin(lft, empty, "ls", "le", "rs", "re",
      Nil, Nil, binWidth = 10.0).count() == 0L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("Sessions.assign: gap starts a new session, boundary stays inside") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:20:00")), // 1200s gap -> same session
      (1L, ts("2024-01-01 00:50:00")), // exactly 1800s -> same (strict >)
      (1L, ts("2024-01-01 02:00:00")), // 4200s -> new session
      (2L, ts("2024-01-01 00:00:00"))  // other key independent
    ).toDF("uid", "t")
    val got = Sessions.assign(ev, "uid", "t", 1800L)
      .orderBy($"uid", $"t")
      .select($"uid", $"session_seq").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (1L, 0L), (1L, 0L), (1L, 1L), (2L, 0L)))
    val st = Sessions.stats(ev, "uid", "t", 1800L)
      .filter($"uid" === 1 && $"session_seq" === 0).head()
    assert(st.getAs[Long]("n_events") == 3 && st.getAs[Long]("span_sec") == 3000L)
  }

  test("funnel: order matters, ties count, drop-off is monotone, " +
       "missing stages zero out") {
    import java.sql.Timestamp
    def t(s: Int) = new Timestamp(s * 1000L)
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", t(10)), (1L, "click", t(20)), (1L, "purchase", t(30)),
      // user 2: purchase BEFORE click — reaches stage 2 only
      (2L, "view", t(10)), (2L, "purchase", t(15)), (2L, "click", t(20)),
      // user 3: click tied with view — tie counts; no purchase
      (3L, "view", t(10)), (3L, "click", t(10)),
      // user 4: click only — never entered the funnel
      (4L, "click", t(5))
    ).toDF("user_id", "event_type", "ts")
    val out = Sessions.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase")).orderBy($"stage").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, "view", 3L), (2, "click", 3L),
      (3, "purchase", 1L)))
    intercept[IllegalArgumentException] {
      Sessions.funnel(ev, "user_id", "event_type", "ts", Seq("a", "a"))
    }
  }

  test("transitionMatrix: hand-counted pairs, row-normalized, first event " +
       "contributes nothing, tiebreak fixes equal timestamps") {
    import java.sql.Timestamp
    def t(s: Int) = new Timestamp(s * 1000L)
    val ev = Seq(
      // user 1: a -> b -> a  => (a,b), (b,a)
      (1L, 10L, "a", t(10)), (1L, 11L, "b", t(20)), (1L, 12L, "a", t(30)),
      // user 2: a -> a       => (a,a)
      (2L, 20L, "a", t(10)), (2L, 21L, "a", t(20)),
      // user 3: equal timestamps — event_id orders b BEFORE c => (b,c)
      (3L, 30L, "b", t(10)), (3L, 31L, "c", t(10)),
      // user 4: single event — no pair
      (4L, 40L, "c", t(5))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val out = Sessions.transitionMatrix(ev, "user_id", "ts", "event_type",
        "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      ("a", "b") -> ((1L, 0.5)),     // from a: b once, a once
      ("a", "a") -> ((1L, 0.5)),
      ("b", "a") -> ((1L, 0.5)),     // from b: a once, c once
      ("b", "c") -> ((1L, 0.5))), out)
    // per-prev probabilities always sum to 1
    val sums = Sessions.transitionMatrix(ev, "user_id", "ts", "event_type",
        "event_id")
      .groupBy($"prev_type").agg(sum($"p").as("s"))
      .select($"s").as[Double].collect()
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  test("lastTouchAttribution: prior touch credited, cold conversion is " +
       "'none', back-to-back conversions don't credit each other") {
    import java.sql.Timestamp
    def t(s: Int) = new Timestamp(s * 1000L)
    val ev = Seq(
      // user 1: view -> purchase -> purchase  => view credited TWICE
      (1L, 10L, "view", t(10)), (1L, 11L, "purchase", t(20)),
      (1L, 12L, "purchase", t(30)),
      // user 2: cold purchase, then click, error, purchase => none + error
      (2L, 20L, "purchase", t(5)), (2L, 21L, "click", t(10)),
      (2L, 22L, "error", t(15)), (2L, 23L, "purchase", t(20)),
      // user 3: no purchase at all — contributes nothing
      (3L, 30L, "view", t(1))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val out = Sessions.lastTouchAttribution(ev, "user_id", "ts",
        "event_id", "event_type", target = "purchase")
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("error", 1L), ("none", 1L), ("view", 2L)))
  }

  test("fellegiSunterScore: agreement weights sum, NULL disagrees, three-way cut") {
    // weights: log2(.9/.1) = 3.169925, log2(.1/.9) = -3.169925
    val pairs = Seq(
      (1L, 2L, Some("x"), Some("x"), Some("p"), Some("p")), // both agree
      (3L, 4L, Some("x"), Some("y"), Some("p"), Some("p")), // one agrees
      (5L, 6L, Some("x"), Some("y"), Some("p"), Some("q")), // none
      (7L, 8L, None, Some("x"), Some("p"), Some("p"))       // NULL = disagree
    ).toDF("id_a", "id_b", "f1a", "f1b", "f2a", "f2b")
    val out = Joins.fellegiSunterScore(pairs, "id_a", "id_b",
        Seq(("f1", col("f1a") === col("f1b"), 0.9, 0.1),
          ("f2", col("f2a") === col("f2b"), 0.9, 0.1)),
        upper = 3.0, lower = 0.0)
      .as[(Long, Long, Double, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 6.33985, "link"),
      (3L, 4L, 0.0, "possible"),
      (5L, 6L, -6.33985, "non_link"),
      (7L, 8L, 0.0, "possible")))
  }

  test("fellegiSunterEm: one-iteration M-step matches the hand-computed " +
       "pattern-table update exactly") {
    // patterns over 2 fields: 4×(1,1), 4×(0,0), 2×(1,0); p0=.5, m0=.8,
    // u0=.2. E-step (6-dp HALF_UP): w(1,1)=.32/.34=0.941176,
    // w(0,0)=.02/.34=0.058824, w(1,0)=.08/.16=0.5. Sums: W=4·.941176 +
    // 4·.058824 + 2·.5 = 5 exactly; N=10 → p=.5.
    // f1: W1=4·.941176+2·.5=4.764704 → m1=.952941 (r6 of .9529408);
    //     C1=6, u1=(6−4.764704)/5=.247059
    // f2: W2=3.764704 → m2=.752941; C2=4, u2=.235296/5=.047059
    val pairs = (
      Seq.fill(4)(("x", "x", "y", "y")) ++
      Seq.fill(4)(("x", "z", "y", "w")) ++
      Seq.fill(2)(("x", "x", "y", "w"))
    ).zipWithIndex.map { case ((a, b, c, d), i) => (i.toLong, a, b, c, d) }
      .toDF("id", "f1a", "f1b", "f2a", "f2b")
    val out = Joins.fellegiSunterEm(pairs,
        Seq(("f1", col("f1a") === col("f1b")),
          ("f2", col("f2a") === col("f2b"))),
        p0 = 0.5, m0 = 0.8, u0 = 0.2, iterations = 1)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("f1") == (("f1", 0.952941, 0.247059, 0.5)))
    assert(out("f2") == (("f2", 0.752941, 0.047059, 0.5)))
  }

  test("fellegiSunterEm: converges toward the planted match structure; " +
       "NULL disagrees; degenerate fields clamp instead of exploding") {
    // 30 'match' pairs agree on both fields, 300 'non-match' pairs agree
    // on nothing; a few iterations should push m up and u down for both
    val pairs = (
      (1 to 30).map(i => (i.toLong, "a", "a", "b", "b")) ++
      (31 to 330).map(i => (i.toLong, "a", "z", "b", "w"))
    ).toDF("id", "f1a", "f1b", "f2a", "f2b")
    val est = Joins.fellegiSunterEm(pairs,
        Seq(("f1", col("f1a") === col("f1b")),
          ("f2", col("f2a") === col("f2b"))),
        iterations = 10)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(est("f1")._2 > 0.9 && est("f1")._3 < 0.05, est("f1"))
    assert(est("f2")._2 > 0.9 && est("f2")._3 < 0.05, est("f2"))
    assert(est("f1")._4 > 0.05 && est("f1")._4 < 0.2, "p near 30/330")
    // all pairs agree on a constant field -> EM drives u toward 1; the
    // clamp must cap it at 0.999999 (and never emit NaN/Inf)
    val const = (1 to 20).map(i => (i.toLong, "c", "c")).toDF("id", "ga", "gb")
    val c = Joins.fellegiSunterEm(const,
        Seq(("g", col("ga") === col("gb"))), iterations = 5)
      .as[(String, Double, Double, Double)].collect().head
    assert(c._2 <= 0.999999 && c._3 <= 0.999999 && !c._2.isNaN && !c._3.isNaN)
    // NULL predicate counts as disagreement, not a dropped row
    val withNull = Seq((1L, Some("a"), Some("a")), (2L, None, Some("a")))
      .toDF("id", "ga", "gb")
    val n = Joins.fellegiSunterEm(withNull,
        Seq(("g", col("ga") === col("gb"))), iterations = 1)
      .as[(String, Double, Double, Double)].collect().head
    assert(n._2 > 0.0 && n._2 < 1.0)
  }

  test("joinSkewAudit: hot keys from both sides, products, one-sided keys") {
    val l = Seq(1L, 1L, 1L, 2L, 3L).toDF("lk")
    val r = Seq(1L, 2L, 2L, 9L).toDF("rk")
    val out = Joins.joinSkewAudit(l, "lk", r, "rk", topK = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // hot set: left top-2 {1, 2}; right top-2 {2, 1} -> {1, 2}
    assert(out == Seq((1L, 3L, 1L, 3L), (2L, 1L, 2L, 2L)))
    // widen: key 9 only on the right contributes 0 output rows
    val w = Joins.joinSkewAudit(l, "lk", r, "rk", topK = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(w.contains((9L, 0L, 1L, 0L)) && w.contains((3L, 1L, 0L, 0L)))
  }

  test("blockingStats: pair mass, reduction ratio, monster block") {
    val df = Seq((1L, "aa1"), (2L, "aa2"), (3L, "aa3"), (4L, "bb1"))
      .toDF("id", "name")
    val out = Joins.blockingStats(df, "id",
        org.apache.spark.sql.functions.expr("substring(name, 1, 2)"))
      .as[(Long, Long, Long, Double, Long)].collect().head
    // blocks {aa:3, bb:1}: pairs = 3, C(4,2) = 6 -> rr = 0.5
    assert(out == ((4L, 2L, 3L, 0.5, 3L)))
  }

  test("sortedNeighborhoodPairs: adjacent ranks only, window widens, " +
       "lower rank is id_a") {
    val df = Seq((10L, "b"), (20L, "a"), (30L, "c")).toDF("id", "k")
    val w2 = Joins.sortedNeighborhoodPairs(df, "id", col("k"), window = 2)
      .as[(Long, Long, Long)].collect().toSet
    // rank order by k: 20(a), 10(b), 30(c)
    assert(w2 == Set((20L, 10L, 1L), (10L, 30L, 1L)))
    val w3 = Joins.sortedNeighborhoodPairs(df, "id", col("k"), window = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(w3 == w2 + ((20L, 30L, 2L)))
  }

  test("topEventPaths: 3-step trigrams per user, short histories skipped") {
    import java.sql.Timestamp
    def t(s: Int) = new Timestamp(s * 1000L)
    val ev = Seq(
      (1L, 10L, "a", t(1)), (1L, 11L, "b", t(2)), (1L, 12L, "c", t(3)),
      (1L, 13L, "c", t(4)),                     // paths a>b>c, b>c>c
      (2L, 20L, "a", t(1)), (2L, 21L, "b", t(2)),
      (2L, 22L, "c", t(3)),                     // path a>b>c again
      (3L, 30L, "z", t(1)), (3L, 31L, "z", t(2)) // too short: none
    ).toDF("user_id", "event_id", "event_type", "ts")
    val out = Sessions.topEventPaths(ev, "user_id", "ts", "event_id",
        "event_type", k = 5)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a>b>c", 2L), ("b>c>c", 1L)))
  }

  test("cohortRetention: offset 0 equals cohort size, gaps don't break " +
       "offsets, multiple same-period events count once") {
    import java.sql.Timestamp
    def d(day: Int) = Timestamp.valueOf(f"1970-01-${day}%02d 12:00:00")
    val ev = Seq(
      // users 1,2 start period 0 (days 1-7); user 1 returns periods 1
      // and 3 (skipping 2); user 2 never returns
      (1L, d(2)), (1L, d(3)), (1L, d(9)), (1L, d(23)),
      (2L, d(5)),
      // user 3 starts period 1, returns period 2
      (3L, d(10)), (3L, d(16))
    ).toDF("user_id", "ts")
    val out = Sessions.cohortRetention(ev, "user_id", "ts", periodDays = 7)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
      .toSet
    assert(out == Set(
      ("1970-01-01", 0, 2L), ("1970-01-01", 1, 1L), ("1970-01-01", 3, 1L),
      ("1970-01-08", 0, 1L), ("1970-01-08", 1, 1L)))
  }

  test("edge cases: empty sides, single rows, tiny corpora") {
    val emptyOrders = orders.filter($"o_id" < 0)
    // asof against an empty right: left keeps nulls, inner drops all
    assert(Joins.asofJoin(events, emptyOrders, "ts", "o_ts",
      Seq("user_id"), Seq("cust"), Seq("o_id")).count() == 5)
    assert(Joins.asofJoin(events, emptyOrders, "ts", "o_ts",
      Seq("user_id"), Seq("cust"), Seq("o_id"), how = "inner").count() == 0)
    // band with empty right
    assert(Joins.bandJoin(
      Seq((1L, 1L, 1.0)).toDF("pid", "k", "x"),
      Seq.empty[(Long, Long, Double)].toDF("rid", "rk", "y"),
      "x", "y", Seq("k"), Seq("rk"), 1.0).count() == 0)
    // sessionization of a single event
    val one = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("uid", "t")
    assert(Sessions.stats(one, "uid", "t", 60L).head()
      .getAs[Long]("n_events") == 1)
    // IVF with a corpus smaller than nLists still answers exactly
    import graft.operators.Similarity
    val tiny = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(1f, 1f))).toDF("vec_id", "embedding")
    val got = Similarity.ivfTopK(tiny, tiny.filter($"vec_id" === 1),
        "vec_id", "embedding", 2, nLists = 8, nProbe = 8, iters = 1)
      .select($"id").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
    // topk sketch over an empty frame → empty array, no crash
    val empty = Seq.empty[String].toDF("s")
    assert(empty.agg(graft.expressions.GraftExpressions
      .topkSketch($"s", 3, 8).as("tk")).head().getSeq[Any](0).isEmpty)
  }

  test("bandJoin plan: equi-join on bins, no nested loop") {
    val pts = Seq((1L, 1L, 1.0)).toDF("pid", "k", "x")
    val refs = Seq((2L, 1L, 1.5)).toDF("rid", "rk", "y")
    val plan = Joins.bandJoin(pts, refs, "x", "y", Seq("k"), Seq("rk"), 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("bloomKeyPrefilter: prefilter+join ≡ plain join on planted keys") {
    // planted so the sketch must pass SOME keys and could false-positive
    // on others: fact keys 0..999, dim keys = multiples of 7 in [0, 500)
    val fact = (0L until 1000L).map(k => (k, k * 2)).toDF("fk", "payload")
    val dim = (0L until 500L by 7).map(k => (k, s"d$k")).toDF("dk", "name")
    val pre = Joins.bloomKeyPrefilter(fact, "fk", dim, "dk", fpp = 0.01)
    val plain = fact.join(dim, fact("fk") === dim("dk"))
      .select($"fk", $"payload", $"name")
    val viaBloom = pre.join(dim, pre("fk") === dim("dk"))
      .select($"fk", $"payload", $"name")
    val a = plain.collect().map(_.toSeq).sortBy(_.head.toString)
    val b = viaBloom.collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty) // non-vacuous: 72 matching keys
    // no false negatives even at a sloppy fpp
    val sloppy = Joins.bloomKeyPrefilter(fact, "fk", dim, "dk", fpp = 0.5)
    assert(sloppy.join(dim, sloppy("fk") === dim("dk")).count() ==
      plain.count())
  }

  test("bloomKeyPrefilter: empty dim short-circuits to zero rows, no NPE") {
    val fact = (0L until 100L).map(k => (k, k)).toDF("fk", "v")
    val dim = Seq.empty[(Long, String)].toDF("dk", "name")
    // counted path (expectedItems not given): count() sees 0
    assert(Joins.bloomKeyPrefilter(fact, "fk", dim, "dk").count() == 0L)
    // skip-count path (expectedItems given, dim still empty): the null
    // treeAggregate result must be caught, not dereferenced
    assert(Joins.bloomKeyPrefilter(fact, "fk", dim, "dk",
      expectedItems = 50L).count() == 0L)
    // and a non-empty dim FILTERED to empty (the r9 regression shape:
    // a date predicate matching zero rows)
    val dim2 = Seq((1L, "x"), (2L, "y")).toDF("dk", "name")
      .filter($"dk" > 100L)
    assert(Joins.bloomKeyPrefilter(fact, "fk", dim2, "dk").count() == 0L)
  }

  test("domainBlocklistFlags: a domain entry blocks every subdomain, a " +
       "subdomain entry only itself; www and case fold; no false positives") {
    val docs = Seq(
      (1L, "https://www.a.b.Example.COM/x"),  // blocked: suffix example.com
      (2L, "https://example.com/y"),          // blocked: exact
      (3L, "https://notexample.com/z"),       // NOT blocked: label boundary
      (4L, "https://bad.sub.org/q"),          // blocked: exact subdomain entry
      (5L, "https://sub.org/q"),              // NOT blocked: parent of an entry
      (6L, "https://clean.io/ok")             // NOT blocked
    ).toDF("id", "url")
    val bl = Seq("Example.com", "bad.sub.org").toDF("dom")
    val out = Joins.domainBlocklistFlags(docs, "id", "url", bl, "dom")
      .select($"id", $"blocked").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> false,
      4L -> true, 5L -> false, 6L -> false), out)
  }

  test("fuzzySelfPairs: in-block pairs within maxDist; cross-block twins never compared") {
    val df = Seq(
      (1L, "smith", "sm"), (2L, "smyth", "sm"), (3L, "smish", "sm"),
      (4L, "smith", "zz"),              // identical string, different block
      (5L, null.asInstanceOf[String], "sm")
    ).toDF("id", "name", "blk")
    val out = Joins.fuzzySelfPairs(df, "id", "name", col("blk"), maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    // smith~smyth 1, smith~smish 1, smyth~smish 2 (excluded); block zz alone
    assert(out == Set((1L, 2L, 1L), (1L, 3L, 1L)))
    // maxDist 2 admits the third pair; id_a < id_b canonical
    val out2 = Joins.fuzzySelfPairs(df, "id", "name", col("blk"), maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(out2 == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L)))
  }

  test("fuzzySelfPairs plan: equi-join on the block key, no cartesian") {
    val df = Seq((1L, "a", "x")).toDF("id", "name", "blk")
    val plan = Joins.fuzzySelfPairs(df, "id", "name", col("blk"), 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("asofJoinNearest: picks the closer side, distance ties resolve " +
       "backward, per-side tiebreaks are deterministic, left rows " +
       "before all rights match forward, how=left keeps unmatched") {
    val left = Seq(("u", -5L, 1L), ("u", 10L, 2L), ("u", 11L, 3L),
      ("u", 100L, 4L), ("w", 7L, 5L)).toDF("k", "t", "lid")
    val right = Seq(("u", 0L, 10L), ("u", 8L, 20L),
      ("u", 12L, 30L), ("u", 12L, 31L), ("u", 200L, 40L))
      .toDF("k", "rt", "rid")
    def run(how: String) = Joins.asofJoinNearest(left, right,
        "t", "rt", Seq("k"), Seq("k"), Seq("rid"),
        tiebreak = Some("rid"), how = how)
      .select($"lid", $"rid").as[(Long, Option[Long])]
      .collect().toMap
    val out = run("left")
    assert(out(1L) == Some(10L)) // nothing before: forward rt=0
    assert(out(2L) == Some(20L)) // d=2 both sides: backward wins
    assert(out(3L) == Some(30L)) // fwd d=1 beats back d=3; min-key tie
    assert(out(4L) == Some(31L)) // back rt=12 (greatest-rid carry,
                                 // d=88) beats fwd rt=200 (d=100)
    assert(out(5L) == None)      // key w has no rights
    val inner = run("inner")
    assert(!inner.contains(5L) && inner.size == 4)
  }

  test("asofJoinNearest: NULL times never match — a null-time right " +
       "row is not carried as a candidate, a null-time left row gets " +
       "no match (left keeps it, inner drops it)") {
    val left = Seq(("u", Some(10L), 1L), ("u", None, 2L))
      .toDF("k", "t", "lid")
    val right = Seq(("u", None, 99L), ("u", Some(50L), 20L))
      .toDF("k", "rt", "rid")
    def run(how: String) = Joins.asofJoinNearest(left, right,
        "t", "rt", Seq("k"), Seq("k"), Seq("rid"),
        tiebreak = Some("rid"), how = how)
      .select($"lid", $"rid").as[(Long, Option[Long])]
      .collect().toMap
    val out = run("left")
    // lid=1 must match rid=20, NOT the null-time rid=99 (which would
    // sort first and be carried as the poisoning backward candidate)
    assert(out(1L) == Some(20L))
    assert(out(2L) == None) // null left time: no defined distance
    val inner = run("inner")
    assert(inner == Map(1L -> Some(20L)))
  }

  test("intervalCoverage: overlaps merge, half-open touches merge, " +
       "gaps split islands, per-key totals are exact micros") {
    val iv = Seq(
      ("u", 0L, 10L), ("u", 5L, 15L),   // overlap -> one island
      ("u", 15L, 25L),                  // touches: [0,25) continues
      ("u", 30L, 40L),                  // gap -> second island
      ("v", 0L, 100L), ("v", 10L, 20L)  // fully contained interval
    ).toDF("k", "s", "e")
    val out = Sessions.intervalCoverage(iv, "k", "s", "e")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("u") == ((4L, 2L, 35L)))
    assert(out("v") == ((2L, 1L, 100L)))
    // summing raw durations would have said 40 and 110
  }

  test("markovStationary: symmetric 2-cycle is the fixed point; a sink " +
       "absorbs all mass; one asymmetric push matches hand floors") {
    // a<->b: uniform is stationary on the grid exactly
    val cyc = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("i", "j", "c")
    val s2 = Sessions.markovStationary(cyc, "i", "j", "c", iterations = 3)
      .as[(String, Long)].collect().toMap
    assert(s2 == Map("a" -> 500000000000L, "b" -> 500000000000L))
    // a->b only: b is dangling and keeps its mass -> everything at b
    val sink = Seq(("a", "b", 1L)).toDF("i", "j", "c")
    val s1 = Sessions.markovStationary(sink, "i", "j", "c", iterations = 2)
      .as[(String, Long)].collect().toMap
    assert(s1 == Map("a" -> 0L, "b" -> 1000000000000L))
    // a->{b:3, c:1}, b->a, c->a; one push from uniform 1e12/3
    val tri = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L),
      ("c", "a", 1L)).toDF("i", "j", "c")
    val s3 = Sessions.markovStationary(tri, "i", "j", "c", iterations = 1)
      .as[(String, Long)].collect().toMap
    assert(s3 == Map("a" -> 666666666666L, "b" -> 249999999999L,
      "c" -> 83333333333L))
    // partitioning-invariant
    val rep = Sessions.markovStationary(tri.repartition(5), "i", "j",
      "c", iterations = 1).as[(String, Long)].collect().toMap
    assert(rep == s3)
  }

  test("deletionEditPairs: finds substitution/insert/delete neighbors " +
       "without a blocking key; d=2 candidates are verified away; " +
       "minLen drops short words; bucket cap excludes mass collisions") {
    val words = Seq("house", "mouse", "houses", "horse", "table", "cat")
      .toDF("w")
    val out = Joins.deletionEditPairs(words, "w")
      .as[(String, String, Long)].collect().toSet
    // house~mouse (sub), house~houses (insert), house~horse (sub);
    // mouse~horse is d=2 and shares no deletion variant; cat < minLen
    assert(out == Set(("house", "mouse", 1L), ("house", "houses", 1L),
      ("horse", "house", 1L)))
    // aaaa/baaa/abaa all delete to "aaa" (bucket of 3); abaa~baaa also
    // share "baa" (bucket of 2) but verify rejects them at d=2
    val aa = Seq("aaaa", "baaa", "abaa").toDF("w")
    assert(Joins.deletionEditPairs(aa, "w")
      .as[(String, String, Long)].collect().toSet ==
      Set(("aaaa", "baaa", 1L), ("aaaa", "abaa", 1L)))
    // maxBucket=2 excludes the "aaa" bucket; the surviving "baa"
    // candidate fails the levenshtein verify -> empty
    assert(Joins.deletionEditPairs(aa, "w", maxBucket = 2)
      .collect().isEmpty)
    // duplicate input words collapse (distinct), null words drop
    val dup = Seq("house", "house", null, "mouse").toDF("w")
    assert(Joins.deletionEditPairs(dup, "w")
      .as[(String, String, Long)].collect().toSet ==
      Set(("house", "mouse", 1L)))
  }

  test("deletionEditPairs plan: equi-join on the variant key, no cartesian") {
    val plan = Joins.deletionEditPairs(Seq("abcd").toDF("w"), "w")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
