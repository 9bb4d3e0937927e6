package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking must reproduce the window built-ins exactly — from a
  * range-partitioned sort, never a single-partition window. */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def sample(n: Int) = {
    // keys deliberately skewed + shuffled across partitions
    val rows = (1 to n).map(i => ((i * 37) % n, s"v$i", i.toLong))
    spark.createDataFrame(rows).toDF("k", "v", "id")
      .repartition(7, col("v"))
  }

  test("globalRowNumber matches row_number over a global window") {
    val df = sample(500)
    val got = Ranking.globalRowNumber(df, Seq(col("k"), col("id")), out = "rn")
    val want = df.withColumn("rn",
      row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("globalRowNumber is dense, 1-based, and deterministic across runs") {
    val df = sample(300)
    val a = Ranking.globalRowNumber(df, Seq(col("k"), col("id")))
      .select("rn", "id").as[(Long, Long)].collect().sortBy(_._1)
    val b = Ranking.globalRowNumber(df, Seq(col("k"), col("id")))
      .select("rn", "id").as[(Long, Long)].collect().sortBy(_._1)
    assert(a.map(_._1).toSeq == (1L to 300L))
    assert(a.toSeq == b.toSeq)
  }

  test("globalNtile matches ntile() for divisible and ragged row counts") {
    for ((n, k) <- Seq((100, 10), (103, 10), (7, 3), (5, 8), (1, 4))) {
      val df = sample(n)
      val got = Ranking.globalNtile(df, k, Seq(col("k"), col("id")), out = "tile")
      val want = df.withColumn("tile",
        ntile(k).over(Window.orderBy(col("k"), col("id"))).cast("long"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"ntile mismatch at n=$n k=$k")
    }
  }

  test("no Window operator in the physical plan") {
    val df = sample(50)
    val plan = Ranking.globalNtile(df, 5, Seq(col("k"), col("id")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in plan:\n$plan")
  }

  test("globalRunningSum matches the window running sum; NULL costs " +
       "count as zero") {
    val df = sample(300).withColumn("v",
      when(col("id") % 7 === 0, lit(null)).otherwise(col("id") % 13))
    val got = Ranking.globalRunningSum(df, Seq(col("k"), col("id")), "v",
        out = "run")
      .select("id", "run").as[(Long, Long)].collect().toMap
    val want = df.withColumn("run",
        sum(coalesce(col("v"), lit(0L)))
          .over(Window.orderBy(col("k"), col("id"))))
      .select("id", "run").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("shardByCostBudget: every shard but the last reaches the budget " +
       "minus at most one row's cost; assignment deterministic") {
    val df = sample(200).withColumn("cost", col("id") % 50 + 1)
    val sharded = Ranking.shardByCostBudget(df,
      Seq(col("k"), col("id")), "cost", budget = 100L)
    val perShard = sharded.groupBy(col("shard"))
      .agg(sum(col("cost")).as("c")).orderBy(col("shard"))
      .as[(Long, Long)].collect()
    assert(perShard.map(_._1).toSeq == perShard.indices.map(_.toLong),
      "shard ids are dense from 0")
    // a row overflows INTO the next shard, so a shard's cost can exceed
    // budget by at most (maxCost - 1), and only the last can undershoot
    val maxCost = 50L
    for ((s, c) <- perShard.dropRight(1))
      assert(c >= 100L - maxCost + 1 && c <= 100L + maxCost - 1,
        s"shard $s cost $c outside the budget envelope")
    val again = Ranking.shardByCostBudget(df,
        Seq(col("k"), col("id")), "cost", budget = 100L)
      .select("id", "shard").as[(Long, Long)].collect().toSet
    assert(again == sharded.select("id", "shard")
      .as[(Long, Long)].collect().toSet)
  }

  test("equiDepthHistogram: balanced counts (fat tiles first), " +
       "monotone envelopes, heavy tail isolated instead of drowning") {
    // 98 small values + 2 huge outliers, 10 rows per tile at k = 10
    val df = ((1 to 98).map(_.toDouble) ++ Seq(1e9, 2e9)).toDF("v")
    val out = Ranking.equiDepthHistogram(df, "v", 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == (1L to 10L))
    assert(out.forall(_._2 == 10L))
    // envelopes are monotone and non-overlapping
    assert(out.sliding(2).forall { case Array(a, b) => a._4 <= b._3 })
    // the outliers live alone at the top instead of flattening the rest
    assert(out.last._3 >= 91.0 && out.last._4 == 2e9)
  }

  test("reciprocalRankFusion: hand-computed fusion, agreement beats " +
       "disagreement, deterministic ties") {
    // a: rank 1 on s1, rank 2 on s2; b: rank 2 on s1, rank 1 on s2;
    // c: rank 3 on both → c fused lowest; a == b by symmetry
    val df = Seq((1L, 10.0, 5.0), (2L, 9.0, 6.0), (3L, 1.0, 1.0))
      .toDF("id", "s1", "s2")
    val out = Ranking.reciprocalRankFusion(df, "id", Seq("s1", "s2"), k = 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(1L) == r6(1.0 / 61 + 1.0 / 62))
    assert(out(2L) == r6(1.0 / 62 + 1.0 / 61))
    assert(out(3L) == r6(2.0 / 63))
    assert(out(1L) == out(2L) && out(3L) < out(1L))
  }

  test("groupRobustZScores: outlier does not poison the scale, " +
       "zero-MAD groups yield NULL") {
    // group a: {1..5, 1000}: med 3.5, MAD = median(2.5,1.5,.5,.5,1.5,996.5) = 1.5
    val df = (Seq.tabulate(5)(i => ("a", (i + 1).toDouble)) :+ (("a", 1000.0)))
      .++(Seq(("b", 7.0), ("b", 7.0), ("b", 7.0))).toDF("g", "v")
    val out = Ranking.groupRobustZScores(df, Seq("g"), "v").collect()
      .map(r => (r.getString(0), r.getDouble(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    val spike = out.find(r => r._1 == "a" && r._2 == 1000.0).get._3.get
    assert(math.abs(spike - (1000.0 - 3.5) / (1.4826 * 1.5)) < 1e-9)
    // an in-range value stays small despite the spike
    val mid = out.find(r => r._1 == "a" && r._2 == 3.0).get._3.get
    assert(math.abs(mid) < 1.0)
    // constant group: MAD 0 → NULL
    assert(out.filter(_._1 == "b").forall(_._3.isEmpty))
  }

  test("percentRankWithin: 0..1 span per group, ties share ranks, " +
       "singleton groups score 0") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 20.0), ("a", 30.0),
      ("b", 99.0)).toDF("g", "v")
    val out = Ranking.percentRankWithin(df, Seq("g"), "v").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val a = out.filter(_._1 == "a").sortBy(_._2).map(_._3)
    // ranks 1,2,2,4 of 4 → pr = 0, 1/3, 1/3, 1
    assert(a.toSeq == Seq(0.0, 1.0 / 3, 1.0 / 3, 1.0))
    assert(out.filter(_._1 == "b").map(_._3).toSeq == Seq(0.0))
  }

  test("equiWidthHistogram: exact bucketing, boundary values fall right, " +
       "out-of-range mass reported in sentinel buckets, empty buckets " +
       "emitted, NULLs excluded") {
    val df = Seq[java.lang.Double](0.0, 9.999, 10.0, 25.0, 39.9, 40.0,
      -5.0, 100.0, null).toDF("v")
    val out = Ranking.equiWidthHistogram(df, "v", 4, 0.0, 40.0).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
    assert(out.map(_._1).toSeq == Seq(-1, 0, 1, 2, 3, 4))
    val m = out.toMap
    assert(m(-1) == (Double.NegativeInfinity, 0.0, 1L)) // -5
    assert(m(0)._3 == 2L)  // 0.0, 9.999
    assert(m(1)._3 == 1L)  // 10.0 lands in [10,20), not [0,10)
    assert(m(2)._3 == 1L)  // 25
    assert(m(3)._3 == 1L)  // 39.9
    assert(m(4) == (40.0, Double.PositiveInfinity, 2L)) // 40, 100
    assert(m(2)._1 == 20.0 && m(2)._2 == 30.0)
  }

  test("groupZScores: hand-computed z per group; singleton and " +
       "zero-spread groups yield NULL; no window in the plan") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), // mean 2, sd 1 → z = -1, 0, 1
      ("b", 5.0),                          // singleton → NULL
      ("c", 4.0), ("c", 4.0)               // zero spread → NULL
    ).toDF("g", "v")
    val out = Ranking.groupZScores(df, Seq("g"), "v")
    val rows = out.collect().map(r => (r.getString(0), r.getDouble(1),
      Option(r.get(2)).map(_.asInstanceOf[Double])))
    val a = rows.filter(_._1 == "a").sortBy(_._2).map(_._3)
    assert(a.flatten.toSeq == Seq(-1.0, 0.0, 1.0))
    assert(rows.filter(_._1 == "b").forall(_._3.isEmpty))
    assert(rows.filter(_._1 == "c").forall(_._3.isEmpty))
    assert(out.columns.toSeq == Seq("g", "v", "z"))
    assert(!out.queryExecution.executedPlan.toString.contains("WindowExec"))
  }

  test("giniCoefficient: uniform 0, maximal concentration, textbook mid value") {
    // uniform: every value equal -> G = 0
    val uni = (1L to 10L).map(i => (i, 5L)).toDF("id", "v")
    assert(Ranking.giniCoefficient(uni, "v", "id")
      .as[(Double, Long, Long)].collect().head == ((0.0, 10L, 50L)))
    // all mass on one of n rows -> G = (n-1)/n
    val conc = ((1L to 9L).map(i => (i, 0L)) :+ (10L, 100L)).toDF("id", "v")
    assert(Ranking.giniCoefficient(conc, "v", "id")
      .as[(Double, Long, Long)].collect().head == ((0.9, 10L, 100L)))
    // hand-computed {1,2,3,4}: G = (2*(1+4+9+16) - 5*10) / (4*10) = 0.25
    val mid = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("id", "v")
    assert(Ranking.giniCoefficient(mid, "v", "id")
      .as[(Double, Long, Long)].collect().head == ((0.25, 4L, 10L)))
  }

  test("vOptimalHistogram: finds the zero-SSE cluster split equi-width/depth would miss") {
    import spark.implicits._
    // two tight clusters of unequal size: the optimal 2-bucket split is
    // between them (total SSE 0); equi-depth would cut inside a cluster
    val df = (Seq.fill(6)(1L) ++ Seq.fill(2)(1000L)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = Ranking.vOptimalHistogram(df, "v", "id", atoms = 8, buckets = 2)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 6L, 6L, 1L, 1L, 0.0),
      (2L, 7L, 8L, 2L, 1000L, 1000L, 0.0)))
  }

  test("vOptimalHistogram: buckets cap at available atoms; NULLs excluded") {
    import spark.implicits._
    val df = Seq((1L, Some(5L)), (2L, Some(9L)), (3L, None))
      .toDF("id", "v")
    val out = Ranking.vOptimalHistogram(df, "v", "id", atoms = 8, buckets = 6)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out.length == 2) // 2 non-null rows -> 2 atoms -> 2 buckets
    assert(out.map(_._4).sum == 2L && out.forall(_._7 == 0.0))
  }

  test("trimmedMeanByGroup: exact-rank trim, outlier immunity, small-n no-op") {
    val rows =
      (1 to 10).map(i => ("a", i.toLong, i.toDouble)) ++
        Seq(("b", 1L, 1.0), ("b", 2L, 100.0), ("b", 3L, 2.0)) ++
        ((1 to 9).map(i => ("c", i.toLong, i.toDouble)) :+ ("c", 10L, 1000.0))
    val df = rows.toDF("g", "id", "v")
    val out = Ranking.trimmedMeanByGroup(df, "g", "v", "id", trim = 0.1)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("a", 10L, 1L, 5.5),            // keep 2..9
      ("b", 3L, 0L, 34.333333),       // floor(0.3) = 0: nothing trimmed
      ("c", 10L, 1L, 5.5)))           // the 1000 outlier is cut away
  }

  test("exactQuantiles: hand-checked ranks, n<q duplication, ties, NULLs") {
    import spark.implicits._
    // n=10, q=4: ranks max(1,(j*10)/4) = 2,5,7,10 -> values 20,50,70,100
    val df = (1 to 10).map(i => (i.toLong, i * 10.0)).toDF("id", "v")
    val out = Ranking.exactQuantiles(df, "v", q = 4)
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 20.0), (2L, 50.0), (3L, 70.0), (4L, 100.0)))
    // q=1 is the max; NULLs are excluded before counting
    val withNull = Seq(Some(3.0), None, Some(1.0)).toDF("v")
    assert(Ranking.exactQuantiles(withNull, "v", q = 1)
      .as[(Long, Double)].collect().toSeq == Seq((1L, 3.0)))
    // n < q: several j hit the same rank and each reports its row;
    // n=2, q=4 -> ranks 1,1,1,2
    val small = Seq(7.0, 9.0).toDF("v")
    assert(Ranking.exactQuantiles(small, "v", q = 4)
      .as[(Long, Double)].collect().toSeq ==
      Seq((1L, 7.0), (2L, 7.0), (3L, 7.0), (4L, 9.0)))
    // all-equal values: every quantile is that value, no nondeterminism
    val ties = Seq.fill(5)(2.5).toDF("v")
    assert(Ranking.exactQuantiles(ties, "v", q = 3)
      .as[(Long, Double)].collect().toSeq ==
      Seq((1L, 2.5), (2L, 2.5), (3L, 2.5)))
  }

  test("exactQuantilesByGroup: per-group ranks, tiny-group duplication, " +
       "NULLs excluded, no cross-group leakage") {
    import spark.implicits._
    val rows = (1 to 10).map(i => ("a", Some(i * 10.0))) ++
      Seq(("b", Some(1.0)), ("b", Some(2.0)), ("b", None))
    val out = Ranking.exactQuantilesByGroup(
        rows.toDF("g", "v"), "g", "v", q = 4)
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("a", 1L, 20.0), ("a", 2L, 50.0), ("a", 3L, 70.0), ("a", 4L, 100.0),
      // n=2, q=4: ranks 1,1,1,2
      ("b", 1L, 1.0), ("b", 2L, 1.0), ("b", 3L, 1.0), ("b", 4L, 2.0)))
  }

  test("globalRunningMax: inclusive and strict-prefix modes match the " +
       "sequential scan across any partitioning") {
    val df = Seq((1L, 3L), (2L, 1L), (3L, 4L), (4L, 1L), (5L, 5L))
      .toDF("id", "v").repartition(4)
    val inc = Ranking.globalRunningMax(df, Seq(col("id")), "v")
      .orderBy($"id").select($"id", $"running_max")
      .as[(Long, Long)].collect().toSeq
    assert(inc == Seq((1L, 3L), (2L, 3L), (3L, 4L), (4L, 4L), (5L, 5L)))
    val exc = Ranking.globalRunningMax(df, Seq(col("id")), "v",
        out = "pre", inclusive = false)
      .orderBy($"id").select($"id", $"pre")
      .as[(Long, Long)].collect().toSeq
    assert(exc == Seq((1L, Long.MinValue), (2L, 3L), (3L, 3L),
      (4L, 4L), (5L, 4L)))
  }

  test("skyline2D: matches the NOT-EXISTS dominance definition — " +
       "within-x losers drop, full-tie duplicates both survive, the " +
       "best-x row always survives") {
    val pts = Seq((10L, 0L, 9L), (11L, 1L, 5L), (12L, 2L, 4L),
      (13L, 2L, 4L), (14L, 2L, 3L), (15L, 3L, 1L))
      .toDF("id", "x", "y")
    val out = Ranking.skyline2D(pts.repartition(5), "x", "y")
      .select($"id").as[Long].collect().toSet
    // (2,3) is dominated by (2,4); everything else is on the front
    assert(out == Set(10L, 11L, 12L, 13L, 15L))
    // a fully dominated interior point also drops
    val dom = pts.union(Seq((16L, 1L, 4L)).toDF("id", "x", "y"))
    assert(!Ranking.skyline2D(dom, "x", "y")
      .select($"id").as[Long].collect().toSet.contains(16L))
  }
}
