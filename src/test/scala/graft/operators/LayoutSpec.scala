package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue: hand-computed Morton interleave, column 0 in the low lane") {
    // q0 = 0b10 (2), q1 = 0b01 (1): bit0 of q0 -> pos0 (0), bit0 of
    // q1 -> pos1 (1), bit1 of q0 -> pos2 (1), bit1 of q1 -> pos3 (0)
    // => 0b0110 = 6
    val out = Seq((2L, 1L)).toDF("a", "b")
      .select(Layout.zValue(Seq(col("a"), col("b")), bits = 2).as("z"))
      .as[Long].collect().head
    assert(out == 6L)
    intercept[IllegalArgumentException] {
      Layout.zValue(Seq(col("a"), col("b")), bits = 31) // 62 > 60
    }
  }

  test("quantizeMinMax: endpoints hit 0 and 2^bits-1; constant column " +
       "degenerates to 0, not divide-by-zero") {
    val df = Seq(10L, 20L, 30L).toDF("x")
      .withColumn("mn", lit(10L)).withColumn("mx", lit(30L))
    val q = df.select(Layout.quantizeMinMax(col("x"), col("mn"), col("mx"), 8)
      .as("q")).as[Long].collect().toSeq
    assert(q == Seq(0L, 127L, 255L)) // (20-10)*255/20 = 127.5 -> 127
    val const = Seq(5L).toDF("x")
      .select(Layout.quantizeMinMax(col("x"), lit(5L), lit(5L), 8).as("q"))
      .as[Long].collect().head
    assert(const == 0L)
  }

  test("zorderBy tightens per-bucket envelopes on BOTH columns vs a " +
       "single-column sort — the file-skipping win") {
    // a 64x64 grid: x-sorted layout gives each bucket the full y range;
    // z-order gives sub-ranges on both dimensions
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val z = Layout.zorderBy(grid, Seq("x", "y"), bits = 6)
    val zStats = Layout.clusterStats(z, "__z", zBits = 12, bucketBits = 2,
      cols = Seq("x", "y")).collect()
    // every z-bucket envelope covers at most half of each dimension
    // (top-2 z-bits split the plane into 2x2 quadrants)
    assert(zStats.length == 4)
    for (r <- zStats) {
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 31L)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 31L)
    }
    // the x-sorted baseline cannot: its buckets span the full y range
    val xSorted = grid.withColumn("__z",
      Layout.quantizeMinMax(col("x"), lit(0L), lit(63L), 12))
    val xStats = Layout.clusterStats(xSorted, "__z", zBits = 12,
      bucketBits = 2, cols = Seq("x", "y")).collect()
    assert(xStats.forall(r =>
      r.getAs[Long]("max_y") - r.getAs[Long]("min_y") == 63L))
  }

  test("zorderBy plan: one range exchange on the z-value, min/max stats " +
       "broadcast — no extra shuffles, no cartesian blowup") {
    val df = (0L until 100L).map(i => (i, i * 7 % 100)).toDF("a", "b")
    val plan = Layout.zorderBy(df, Seq("a", "b"), bits = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // exactly one Exchange over the data path (the range repartition);
    // the stats side rides a BroadcastExchange
    val exchanges = "(?i)\\bExchange rangepartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 1, s"want 1 range exchange, plan:\n$plan")
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("rowsPerFile: per-file counts match the written layout, " +
       "round-robin split is balanced to ±1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rpf").toString
    (0L until 101L).toDF("id").coalesce(1).repartition(4)
      .write.mode("overwrite").parquet(dir)
    val counts = Layout.rowsPerFile(spark.read.parquet(dir))
      .select($"n_rows").as[Long].collect()
    assert(counts.length == 4)
    assert(counts.sum == 101L)
    // round-robin is balanced to a few rows (Spark's start offset makes
    // exact ±1 non-contractual), far from the order-of-magnitude skew
    // this audit exists to catch
    assert(counts.max - counts.min <= 4, counts.mkString(","))
  }

  test("rendezvousShard: range, determinism, minimal movement on growth") {
    val df = spark.range(1000).toDF("k")
    val s8 = Layout.rendezvousShard(df, "k", 8, "s8")
    val both = Layout.rendezvousShard(s8, "k", 9, "s9")
      .select($"k", $"s8", $"s9").as[(Long, Long, Long)].collect()
    assert(both.forall(r => r._2 >= 0 && r._2 < 8 && r._3 >= 0 && r._3 < 9))
    // deterministic under recomputation and repartitioning
    val again = Layout.rendezvousShard(
      Layout.rendezvousShard(df.repartition(7), "k", 8, "s8"), "k", 9, "s9")
      .select($"k", $"s8", $"s9").as[(Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq == both.sortBy(_._1).toSeq)
    // HRW property: only keys won by the NEW shard move — every mover
    // lands on shard 8, and the moved fraction is near 1/9, nowhere
    // near mod-resharding's ~8/9
    val moved = both.filter(r => r._2 != r._3)
    assert(moved.forall(_._3 == 8L))
    assert(moved.length > 50 && moved.length < 250, moved.length)
    // spread: every shard is populated on 1000 keys
    assert(both.groupBy(_._2).size == 8)
  }

  test("hilbertSteps: the canonical 4x4 xy2d table; bijective and " +
       "NO-JUMP (adjacent d = grid neighbors) exhaustively at bits=5") {
    import spark.implicits._
    // the classic order-2 Hilbert curve, x right / y up
    val expect4 = Map(
      (0, 0) -> 0L, (1, 0) -> 1L, (1, 1) -> 2L, (0, 1) -> 3L,
      (0, 2) -> 4L, (0, 3) -> 5L, (1, 3) -> 6L, (1, 2) -> 7L,
      (2, 2) -> 8L, (2, 3) -> 9L, (3, 3) -> 10L, (3, 2) -> 11L,
      (3, 1) -> 12L, (2, 1) -> 13L, (2, 0) -> 14L, (3, 0) -> 15L)
    val pts4 = (for (x <- 0 to 3; y <- 0 to 3) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val got4 = Layout.hilbertSteps(pts4, $"x", $"y", bits = 2, out = "d")
      .as[(Long, Long, Long)].collect()
      .map { case (x, y, d) => (x.toInt, y.toInt) -> d }.toMap
    assert(got4 == expect4)
    // bits=5 (32x32 = 1024 points): a bijection onto [0, 4^bits) whose
    // consecutive indices are Manhattan-distance-1 neighbors — the
    // property that separates Hilbert from Morton (Morton jumps at
    // every quadrant seam)
    val n = 32
    val pts = (for (x <- 0 until n; y <- 0 until n)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val got = Layout.hilbertSteps(pts, $"x", $"y", bits = 5, out = "d")
      .as[(Long, Long, Long)].collect()
    val byD = got.map { case (x, y, d) => d -> (x, y) }.toMap
    assert(byD.size == n * n && byD.keys.min == 0L &&
      byD.keys.max == (n * n - 1).toLong)
    (0L until (n * n - 1).toLong).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1L,
        s"jump between d=$d ($x1,$y1) and d=${d + 1} ($x2,$y2)")
    }
  }

  test("hilbertBy: one range exchange on the index; envelopes at least " +
       "as tight as unclustered on both columns") {
    import spark.implicits._
    val df = (0 until 4096).map { i =>
      (i.toLong, ((i * 2654435761L) % 4096).toLong)
    }.toDF("a", "b")
    val h = Layout.hilbertBy(df, "a", "b", bits = 8)
    val plan = h.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") ||
      plan.toLowerCase.contains("range"), plan.take(400))
    val stats = Layout.clusterStats(h, "__h", zBits = 16, bucketBits = 4,
      cols = Seq("a", "b")).collect()
    // 16 buckets, each bucket's envelope must cover well under the full
    // domain on column a (clustering must actually localize)
    assert(stats.length == 16)
    val spans = stats.map(r => r.getLong(2 + 1) - r.getLong(2))
    assert(spans.count(_ < 2048L) >= 12, spans.mkString(","))
  }
}
