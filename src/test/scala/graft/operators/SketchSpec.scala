package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("hllRegisters: full 2^p shape, duplicate values leave registers unchanged") {
    val df = Seq("a", "b", "c").toDF("v")
    val once = Sketch.hllRegisters(df, "v", p = 4)
      .as[(Long, Long)].collect().toSeq
    assert(once.length == 16 && once.map(_._1) == (0L until 16L))
    // registers are a max — duplicating the input cannot move them
    val dup = Sketch.hllRegisters(df.union(df).union(df), "v", p = 4)
      .as[(Long, Long)].collect().toSeq
    assert(dup == once)
    // at most 3 non-empty registers for 3 values
    assert(once.count(_._2 > 0L) <= 3)
  }

  test("hllMerge == registers of the union; estimate within 5% at 10k distinct") {
    val a = spark.range(10000).select(col("id").cast("string").as("v"))
    val b = spark.range(5000, 15000).select(col("id").cast("string").as("v"))
    val merged = Sketch.hllMerge(
      Sketch.hllRegisters(a, "v"), Sketch.hllRegisters(b, "v"))
      .as[(Long, Long)].collect().toSeq
    val direct = Sketch.hllRegisters(a.union(b), "v")
      .as[(Long, Long)].collect().toSeq
    assert(merged == direct) // max commutes with union — exactly
    val est = Sketch.hllEstimate(Sketch.hllRegisters(a.union(b), "v"))
      .as[(Double, Long, Long)].collect().head
    assert(est._2 == 256L)
    assert(math.abs(est._1 - 15000.0) / 15000.0 < 0.05, est)
  }

  test("hllEstimate: small-range linear counting kicks in; NULLs excluded") {
    val tiny = Seq(Some("x"), Some("y"), None).toDF("v")
    val est = Sketch.hllEstimate(Sketch.hllRegisters(tiny, "v"))
      .as[(Double, Long, Long)].collect().head
    // 2 values -> v_zero >= 254, linear counting ~= 2
    assert(est._3 >= 254L && est._1 > 0.0 && est._1 < 10.0, est)
  }

  test("hllEstimate at p=4: small-m alpha table, clamped ranks never trip the bound") {
    // m=16 uses the paper's exact alpha 0.673, not the asymptotic form
    // (which overshoots small m by a few percent), and hashParts' rank
    // clamp keeps every register within the estimator's 53-rank bound
    // even though q+1 = 57 at p=4 (r11 ADVICE)
    val df = spark.range(2000).select(col("id").cast("string").as("v"))
    val est = Sketch.hllEstimate(Sketch.hllRegisters(df, "v", p = 4))
      .as[(Double, Long, Long)].collect().head
    assert(est._2 == 16L)
    // HLL at m=16 has ~26% standard error; accept a generous band
    assert(est._1 > 500.0 && est._1 < 8000.0, est)
  }

  test("cmCounters: dense d×w, mass conservation per row, merge == union") {
    val a = spark.range(2000).select((col("id") % 7).cast("string").as("v"))
    val b = spark.range(500).select((col("id") % 3).cast("string").as("v"))
    val direct = Sketch.cmCounters(a.union(b), "v", depth = 4, width = 64)
      .collect()
    assert(direct.length == 4 * 64)
    // every depth-row holds the full input mass once
    assert(direct.groupBy(_.getLong(0)).values
      .forall(_.map(_.getLong(2)).sum == 2500L))
    val merged = Sketch.cmMerge(
      Sketch.cmCounters(a, "v", 4, 64), Sketch.cmCounters(b, "v", 4, 64))
      .collect()
    assert(merged.toSeq == direct.toSeq)
  }

  test("cmEstimate: never undercounts, exact when collision-free") {
    val df = spark.range(3000).select((col("id") % 11).cast("string").as("v"))
    val truth = df.groupBy("v").agg(count(lit(1)).as("true_cnt"))
    val est = Sketch.cmEstimate(
      Sketch.cmCounters(df, "v", 4, 512), truth.select("v"), "v", 4, 512)
      .join(truth, "v").collect()
    assert(est.length == 11)
    assert(est.forall(r =>
      r.getAs[Long]("est_cnt") >= r.getAs[Long]("true_cnt")))
    // 11 values in 4 independent rows of 512 cells: some row is
    // collision-free for every value, so min-over-rows is exact
    assert(est.forall(r =>
      r.getAs[Long]("est_cnt") == r.getAs[Long]("true_cnt")))
  }

  test("hllRegistersByGroup + hllEstimateByGroup: per-group == per-subset") {
    val df = spark.range(3000).select(
      when(col("id") % 3 === 0, "a").otherwise("b").as("g"),
      col("id").cast("string").as("v"))
    val grouped = Sketch.hllEstimateByGroup(
      Sketch.hllRegistersByGroup(df, "g", "v"), p = 8)
      .as[(String, Double, Long)].collect()
      .map { case (g, e, z) => g -> ((e, z)) }.toMap
    // each group's estimate must equal the single-group pipeline run on
    // just that slice — grouping changes bookkeeping, not math
    for (g <- Seq("a", "b")) {
      val solo = Sketch.hllEstimate(
        Sketch.hllRegisters(df.filter(col("g") === g), "v"))
        .as[(Double, Long, Long)].collect().head
      assert(grouped(g) == ((solo._1, solo._3)), g)
    }
    // p=8 -> ~6.5% relative error at 1 sigma; 15% is a 2+ sigma band
    assert(math.abs(grouped("a")._1 - 1000.0) / 1000.0 < 0.15)
    assert(math.abs(grouped("b")._1 - 2000.0) / 2000.0 < 0.15)
  }

  test("cmInnerProduct: join-size estimate, exact when collision-free") {
    val a = Seq("1", "1", "2").toDF("k")            // counts 1:2, 2:1
    val b = Seq("1", "2", "2", "3").toDF("k")       // counts 1:1, 2:2, 3:1
    // true equi-join size = 2*1 + 1*2 = 4
    val est = Sketch.cmInnerProduct(
      Sketch.cmCounters(a, "k", 4, 512), Sketch.cmCounters(b, "k", 4, 512))
      .collect().head.getLong(0)
    // never undercounts; 4 keys in 512 cells leave some row
    // collision-free, so the min is exact here
    assert(est == 4L)
    // disjoint key sets: estimate is 0 unless cells collide — and with
    // 2 keys it cannot
    val z = Sketch.cmInnerProduct(
      Sketch.cmCounters(Seq("x").toDF("k"), "k", 4, 512),
      Sketch.cmCounters(Seq("y").toDF("k"), "k", 4, 512))
      .collect().head.getLong(0)
    assert(z == 0L)
  }

  test("kmvRegisters: k smallest distinct hashes; merge == union; exact under k") {
    val a = spark.range(1000).select(col("id").cast("string").as("v"))
    val b = spark.range(500, 1500).select(col("id").cast("string").as("v"))
    val k = 64
    val merged = Sketch.kmvMerge(k,
      Sketch.kmvRegisters(a, "v", k), Sketch.kmvRegisters(b, "v", k))
      .as[Long].collect().toSeq
    val direct = Sketch.kmvRegisters(a.union(b), "v", k)
      .as[Long].collect().toSeq
    assert(merged == direct)
    assert(direct.length == k && direct == direct.sorted &&
      direct.distinct == direct)
    val est = Sketch.kmvEstimate(
      Sketch.kmvRegisters(a.union(b), "v", k), k).collect().head
    assert(est.getLong(0) == k.toLong)
    assert(math.abs(est.getDouble(2) - 1500.0) / 1500.0 < 0.4, est)
    // fewer than k distinct -> the sketch IS the distinct set, exact
    val e2 = Sketch.kmvEstimate(
      Sketch.kmvRegisters(Seq("x", "y", "x").toDF("v"), "v", k), k)
      .collect().head
    assert(e2.getLong(0) == 2L && e2.getDouble(2) == 2.0)
  }

  test("bloomBits: no false negatives; OR-merge == bits of the union") {
    val a = spark.range(200).select(concat(lit("a"), col("id")).as("v"))
    val bits = Sketch.bloomBits(a, "v", m = 2048, k = 5)
    val mc = Sketch.bloomMightContain(bits, a.limit(50), "v", 2048, 5)
      .collect()
    assert(mc.length == 50 && mc.forall(_.getLong(1) == 1L))
    val b = spark.range(200, 400).select(concat(lit("a"), col("id")).as("v"))
    val mergedBits = Sketch.bloomBits(a.union(b), "v", 2048, 5)
      .as[Long].collect().toSeq
    val ored = bits.union(Sketch.bloomBits(b, "v", 2048, 5))
      .distinct().orderBy("bit").as[Long].collect().toSeq
    assert(ored == mergedBits)
    // an unrelated probe set: flags are 0/1 longs, never null
    val far = spark.range(20).select(concat(lit("zz"), col("id")).as("v"))
    val fm = Sketch.bloomMightContain(bits, far, "v", 2048, 5).collect()
    assert(fm.length == 20 && fm.forall(r => Set(0L, 1L)(r.getLong(1))))
  }

  test("kmvSetEstimates: exact when registers cover the sets; estimator " +
       "within sketch tolerance on a planted overlap; oversize rejected") {
    import spark.implicits._
    // tiny sets, k=64 -> the sketches ARE the sets: everything exact
    val a = Seq("a", "b", "c").toDF("v")
    val b = Seq("b", "c", "d").toDF("v")
    val exact = Sketch.kmvSetEstimates(
        Sketch.kmvRegisters(a, "v", 64), Sketch.kmvRegisters(b, "v", 64), 64)
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(exact._1 == 4L && exact._2 == 2L)      // |union|=4, common=2
    assert(exact._4 == 0.5 && exact._5 == 4.0 && exact._6 == 2.0)
    // planted overlap 500 of 1500: k=64 estimates land in sketch range
    val big1 = spark.range(1, 1001).select(col("id").cast("string").as("v"))
    val big2 = spark.range(501, 1501).select(col("id").cast("string").as("v"))
    val est = Sketch.kmvSetEstimates(
        Sketch.kmvRegisters(big1, "v", 64), Sketch.kmvRegisters(big2, "v", 64), 64)
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(est._1 == 64L)
    assert(est._5 > 1000.0 && est._5 < 2200.0, s"union_est ${est._5}")
    assert(est._6 > 150.0 && est._6 < 900.0, s"inter_est ${est._6}")
    assert(est._4 > 0.1 && est._4 < 0.6, s"jaccard ${est._4}")
    // a register table larger than k is a corrupt input, not a clamp
    val e = intercept[IllegalArgumentException] {
      Sketch.kmvSetEstimates(Sketch.kmvRegisters(big1, "v", 128),
        Sketch.kmvRegisters(big2, "v", 64), 64)
    }
    assert(e.getMessage.contains("exceed"))
  }

  test("kllSchedule: the modular collapse equals the naive sequential " +
       "conditional compaction, position for position") {
    def naive(n: Long, cap: Int): (Vector[Long], Int) = {
      var pos = (1L to n).toVector; var r = 0
      while (pos.size > cap) {
        val coin = Sketch.kllCoin(r)
        pos = pos.zipWithIndex.collect {
          case (p, i) if (i + 1) % 2 == coin => p
        }
        r += 1
      }
      (pos, r)
    }
    for (n <- Seq(0L, 1L, 7L, 16L, 100L, 999L, 12345L);
         cap <- Seq(2, 16, 100)) {
      val (rounds, t, m) = Sketch.kllSchedule(n, cap)
      val (pos, rN) = naive(n, cap)
      val w = 1L << rounds
      assert(rounds == rN, s"rounds n=$n cap=$cap")
      assert(m == pos.size.toLong, s"count n=$n cap=$cap")
      assert(pos == (1L to n).filter(p => p % w == t).toVector,
        s"positions n=$n cap=$cap")
    }
  }

  test("kllRegisters: deterministic register table; quantile rank error " +
       "within the 2^R bound; exact when the input fits the cap") {
    val n = 5000L
    val df = spark.range(1, n + 1)
      .select(col("id").as("tb"), col("id").cast("double").as("v"))
    val regs = Sketch.kllRegisters(df, "v", "tb", k = 32) // cap 64
    val rows = regs.as[(Double, Long, Long)].collect().sortBy(_._1)
    val (rounds, t, m) = Sketch.kllSchedule(n, 64)
    val w = 1L << rounds
    assert(rows.length.toLong == m && rows.forall(_._3 == w))
    // values 1..n sorted by themselves: survivor positions == values
    assert(rows.map(_._1.toLong).toVector ==
      (1L to n).filter(p => p % w == t).toVector)
    // quantile read-out: |returned value - ideal rank| < 3w
    // (estimated rank within w of true, target within |W-n| <= w of j*n/q)
    val qs = Sketch.kllQuantiles(regs, 10).as[(Long, Double)].collect()
    assert(qs.map(_._1).toSeq == (1L to 10L))
    qs.foreach { case (j, v) =>
      val ideal = math.max(1L, j * n / 10)
      assert(math.abs(v.toLong - ideal) < 3 * w, s"q$j: $v vs $ideal")
    }
    // under the cap the sketch IS the data: quantiles == exact
    val small = spark.range(1, 51)
      .select(col("id").as("tb"), col("id").cast("double").as("v"))
    val exact = Ranking.exactQuantiles(small, "v", 10)
      .as[(Long, Double)].collect().toSeq
    val viaKll = Sketch.kllQuantiles(
      Sketch.kllRegisters(small, "v", "tb", k = 32), 10)
      .as[(Long, Double)].collect().toSeq
    assert(viaKll == exact)
  }

  test("kllMerge: folding shard sketches stays bounded and within the " +
       "rank-error band; duplicate register frames INFLATE the fold " +
       "(the non-idempotence the streaming ledger exists to prevent)") {
    val n = 5000L
    def half(lo: Long, hi: Long) = spark.range(lo, hi + 1)
      .select(col("id").as("tb"), col("id").cast("double").as("v"))
    val r1 = Sketch.kllRegisters(half(1, n / 2), "v", "tb", k = 32)
    val r2 = Sketch.kllRegisters(half(n / 2 + 1, n), "v", "tb", k = 32)
    val merged = Sketch.kllMerge(32, r1, r2)
    val mrows = merged.as[(Double, Long, Long)].collect()
    assert(mrows.length <= 64, s"merge exceeded cap: ${mrows.length}")
    val totalW = mrows.map(_._3).sum
    // total weight conserved within a few compaction weights (each
    // build loses <= w to rounding, each merge round <= wmin)
    assert(math.abs(totalW - n) <= 3 * mrows.map(_._3).max,
      s"weight drifted: $totalW vs $n")
    val qs = Sketch.kllQuantiles(merged, 10).as[(Long, Double)].collect()
    qs.foreach { case (j, v) =>
      val ideal = math.max(1L, j * n / 10)
      assert(math.abs(v.toLong - ideal) < 600, s"q$j: $v vs $ideal")
    }
    // duplicate frame: weight roughly doubles -> fold is NOT idempotent
    val forged = Sketch.kllMerge(32, r1, r2, r1)
      .as[(Double, Long, Long)].collect()
    assert(forged.map(_._3).sum > totalW + n / 4,
      "a duplicated register frame should inflate the folded weight")
  }

  /** The log-histogram bucket key of a positive grid value, mirrored in
    * plain Scala: e = floor(log2 u), top = u >> max(e - subBits, 0). */
  private def lhKey(u: Long, subBits: Int): (Int, Long) = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(u)
    (e, u >> math.max(e - subBits, 0))
  }

  test("logHistRegisters: buckets match the bit arithmetic exactly; " +
      "counts conserve; non-positive and NULL excluded") {
    val vals: Seq[java.lang.Double] =
      (1L to 300L).map(v => java.lang.Double.valueOf(v.toDouble)) ++
        Seq(java.lang.Double.valueOf(0.0),
          java.lang.Double.valueOf(-7.0), null)
    val df = vals.toDF("v")
    val regs = Sketch.logHistRegisters(df, "v", unitScale = 1L, subBits = 2)
      .as[(Int, Long, Long, Long)].collect().toSeq.sortBy(_._3)
    val expected = (1L to 300L).groupBy(u => lhKey(u, 2))
      .map { case ((e, top), us) =>
        (e, top, top << math.max(e - 2, 0), us.size.toLong) }
      .toSeq.sortBy(_._3)
    assert(regs == expected)
    assert(regs.map(_._4).sum == 300L, "counts must conserve the rows")
    // bound: at most 63 * 2^subBits + subBits registers, data-independent
    assert(regs.size <= 63 * 4 + 2)
  }

  test("logHistMerge: distributed fold over shards equals the whole-corpus " +
      "build; quantile estimates carry the relative-error guarantee") {
    val n = 5000
    // heavy-tailed: u = i^2 spans ~24 doubling ranges
    val us = (1 to n).map(i => i.toLong * i)
    val df = us.map(_.toDouble).toDF("v")
    val whole = Sketch.logHistRegisters(df, "v", unitScale = 1L, subBits = 3)
    val shards = us.grouped(1700).map(g =>
      Sketch.logHistRegisters(g.map(_.toDouble).toDF("v"),
        "v", unitScale = 1L, subBits = 3)).toSeq
    val folded = Sketch.logHistMerge(shards: _*)
    assert(folded.as[(Int, Long, Long, Long)].collect().sortBy(_._3).toSeq ==
      whole.as[(Int, Long, Long, Long)].collect().sortBy(_._3).toSeq,
      "merge must equal the single-pass build register for register")
    val sorted = us.sorted
    Sketch.logHistQuantiles(whole, 10, unitScale = 1L)
      .as[(Long, Long, Double)].collect().foreach { case (j, lo, v) =>
        val target = math.max(1L, j * n.toLong / 10)
        val exact = sorted((target - 1).toInt)
        val e = 63 - java.lang.Long.numberOfLeadingZeros(lo)
        val unit = 1L << math.max(e - 3, 0)
        assert(lo <= exact && exact < lo + unit,
          s"q$j: exact $exact outside bucket [$lo, ${lo + unit})")
        assert(v == lo.toDouble)
      }
  }

  test("amsF2: exact F2 column, estimate = floor-median of the group " +
       "means, partitioning-invariant, in the right ballpark on a " +
       "fixed corpus") {
    val rows = (0 until 100).flatMap(i => Seq.fill(i % 10 + 1)(s"w$i"))
    val out = Sketch.amsF2(rows.toDF("w"), "w")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == (0L to 7L))
    val f2 = (0 until 100).map { i =>
      val f = (i % 10 + 1).toLong; f * f
    }.sum
    assert(out.forall(_._4 == f2))
    // the estimate is the floor-mean of the two middle group means
    val ms = out.map(_._2).sorted
    val med = (ms(3) + ms(4)) / 2
    assert(out.forall(_._3 == med))
    // signs depend only on (value, counter): any partitioning agrees
    val rep = Sketch.amsF2(rows.toDF("w").repartition(7), "w")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rep == out)
    // deterministic fixed-input quality: within 4x of exact (E[c²]=F2)
    assert(med > f2 / 4 && med < f2 * 4, s"estimate $med vs exact $f2")
    // the median-of-means needs an even group count >= 2: groups=1
    // (counters=2 passes the old multiple-of-2g check but halves the
    // estimate) and odd groups are refused loudly
    intercept[IllegalArgumentException] {
      Sketch.amsF2(rows.toDF("w"), "w", counters = 2, groups = 1)
    }
    intercept[IllegalArgumentException] {
      Sketch.amsF2(rows.toDF("w"), "w", counters = 30, groups = 3)
    }
  }
}
