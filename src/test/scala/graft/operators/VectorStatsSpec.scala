package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorStatsSpec extends SparkSpec {
  import spark.implicits._

  test("covarianceMatrix: exact values on a hand-checkable 2-D set; " +
       "partition layout does not change the result") {
    // x = [1,2,3,4], y = [2,4,6,8]: var(x)=5/3, var(y)=20/3, cov=10/3
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f)), (2L, Array(2.0f, 4.0f)),
      (3L, Array(3.0f, 6.0f)), (4L, Array(4.0f, 8.0f)))
    for (parts <- Seq(1, 3)) {
      val df = vecs.toDF("id", "v").repartition(parts)
      val out = VectorStats.covarianceMatrix(df, "v").collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      assert(out.size == 3)
      assert(math.abs(out((0, 0)) - 5.0 / 3) < 1e-12)
      assert(math.abs(out((0, 1)) - 10.0 / 3) < 1e-12)
      assert(math.abs(out((1, 1)) - 20.0 / 3) < 1e-12)
    }
  }

  test("covarianceMatrix: NULL vectors skipped; degenerate inputs yield " +
       "an empty frame; ragged dims fail loudly") {
    val withNull = Seq((1L, Array(1.0f, 0f)), (2L, null.asInstanceOf[Array[Float]]),
      (3L, Array(3.0f, 0f))).toDF("id", "v")
    val out = VectorStats.covarianceMatrix(withNull, "v").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out((0, 0)) - 2.0) < 1e-12) // var([1,3]) = 2
    // one row (n == ddof) and zero rows both produce empty output
    assert(VectorStats.covarianceMatrix(
      Seq((1L, Array(1.0f))).toDF("id", "v"), "v").count() == 0)
    assert(VectorStats.covarianceMatrix(
      Seq.empty[(Long, Array[Float])].toDF("id", "v"), "v").count() == 0)
    val ragged = Seq((1L, Array(1.0f, 2f)), (2L, Array(1.0f))).toDF("id", "v")
    val e = intercept[Exception] {
      VectorStats.covarianceMatrix(ragged.repartition(1), "v").collect()
    }
    assert(e.getMessage != null)
  }

  test("jacobiEigen: recovers a known symmetric eigendecomposition") {
    // [[2,1],[1,2]] has eigenvalues 3 and 1
    val (vals, vecs) = VectorStats.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-10)
    assert(math.abs(sorted(1) - 3.0) < 1e-10)
    // columns are orthonormal
    val dot = vecs(0)(0) * vecs(0)(1) + vecs(1)(0) * vecs(1)(1)
    assert(math.abs(dot) < 1e-10)
  }

  test("whiten: output covariance is the identity on correlated input; " +
       "degenerate dims pass through unscaled instead of exploding") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 300).map { i =>
      val a = rnd.nextGaussian(); val b = rnd.nextGaussian()
      // strongly correlated pair + an independent dim + a CONSTANT dim
      (i.toLong, Array((2 * a).toFloat, (2 * a + 0.3 * b).toFloat,
        rnd.nextGaussian().toFloat, 7.0f))
    }
    val df = vecs.toDF("id", "v")
    val out = VectorStats.whiten(df, "id", "v")
    val cov = VectorStats.covarianceMatrix(
      out.select($"id", $"white".as("v")), "v").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for (((i, j), c) <- cov if i < 3 && j < 3) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(c - want) < 1e-8, s"cov($i,$j)=$c")
    }
    // constant dim: centered to 0, scale 1 → whitened component ~0 var
    assert(math.abs(cov((3, 3))) < 1e-8)
    // projection stage itself is map-only
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("pcaComponents + pcaProject: top component captures the planted " +
       "direction; projected variance matches the eigenvalue; projection " +
       "is map-only (no shuffle)") {
    // points along (1,1,0) with small noise in (1,-1,0)
    val rnd = new scala.util.Random(3)
    val vecs = (0 until 200).map { i =>
      val t = rnd.nextGaussian() * 10
      val e = rnd.nextGaussian() * 0.1
      (i.toLong, Array((t + e).toFloat, (t - e).toFloat, 0.0f))
    }
    val df = vecs.toDF("id", "v")
    val (means, vals, w) = VectorStats.pcaComponents(df, "v", 2)
    assert(means.length == 3 && vals.length == 2 && w.length == 2)
    // dominant direction ~ (1,1,0)/sqrt(2)
    val top = w(0)
    assert(math.abs(math.abs(top(0)) - math.abs(top(1))) < 0.05)
    assert(math.abs(top(2)) < 0.05)
    assert(vals(0) > 50 * vals(1))
    val proj = VectorStats.pcaProject(df, "id", "v", 2)
    // sample variance of the first projected coordinate == eigenvalue 1
    val varOut = proj.select(element_at($"pca", 1).as("p1"))
      .agg(var_samp($"p1")).head().getDouble(0)
    assert(math.abs(varOut - vals(0)) / vals(0) < 1e-6)
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("kmeansIntegers: seed migration, hand wcss, partitioning invariance") {
    // two dyadic-coordinate blobs (exactly representable, so the micro-
    // unit quantization is trivially exact): both seeds (ids 1, 2) start
    // in blob A; Lloyd pulls centroid 2 across to blob B
    val df = Seq(
      (1L, Array(0.0, 0.0)), (2L, Array(0.25, 0.0)),
      (3L, Array(0.0, 0.25)),
      (10L, Array(8.0, 8.0)), (11L, Array(8.25, 8.0))).toDF("id", "v")
    val out = VectorStats.kmeansIntegers(df, "id", "v", k = 2, iters = 2)
      .as[(Long, Long, Long)].collect().toSeq
    // final centroids (83333, 83333) and (8125000, 8000000) — wcss by
    // hand: blob A 2*83333^2 + 2*(166667^2 + 83333^2); blob B 2*125000^2
    assert(out == Seq((1L, 3L, 83333333334L), (2L, 2L, 31250000000L)))
    // bit-identical under a different partitioning
    val re = VectorStats.kmeansIntegers(df.repartition(7), "id", "v",
      k = 2, iters = 2).as[(Long, Long, Long)].collect().toSeq
    assert(re == out)
    // duplicate seed points: round 1 ties everything into cluster 1
    // (smaller-cid tie-break), cluster 2 keeps its (0,0) centroid while
    // c1 drifts to the mean — the kept centroid then wins both origin
    // points back in the final assignment
    val dup = Seq((1L, Array(0.0, 0.0)), (2L, Array(0.0, 0.0)),
      (3L, Array(0.5, 0.0))).toDF("id", "v")
    val o2 = VectorStats.kmeansIntegers(dup, "id", "v", k = 2, iters = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(o2 == Seq((1L, 1L, 111111555556L), (2L, 2L, 0L)))
  }

  test("mahalanobisScores: hand-computed diagonal scores; zero-variance " +
       "dims contribute nothing; null vectors drop; deterministic") {
    // driver-side replica of the operator's exact IEEE sequence
    // (nano-quantize, DECIMAL-exact sums, mu one double division, va the
    // CENTERED (n·Σx²−(Σx)²)/n² with an exact integer numerator — the
    // E[x²]−μ² double form cancels catastrophically at scale and its
    // 1-ulp σ² error even landed this spec's 1.5-in-the-reals score on
    // the floor boundary as 1.499999; the exact numerator yields 1.5),
    // then micro-floor per dim
    def replica(corpus: Seq[Seq[Float]], x: Seq[Float]): Double = {
      val dims = corpus.head.length
      var total = 0L
      for (d <- 0 until dims) {
        val xq = corpus.map(v => math.floor(v(d).toDouble * 1e9).toLong)
        val n = xq.length
        val mu = xq.sum.toDouble / n
        val num = xq.map(q => BigInt(q) * BigInt(q)).sum * n -
          BigInt(xq.sum) * BigInt(xq.sum)
        val va = num.toDouble / (n.toDouble * n.toDouble)
        if (va > 0) {
          val dv = math.floor(x(d).toDouble * 1e9) - mu
          total += math.floor(1e6 * dv * dv / va).toLong
        }
      }
      total / 1e6
    }
    val c1 = Seq(Seq(0.0f), Seq(2.0f), Seq(4.0f))
    val d1 = Seq((1L, Array(0.0f)), (2L, Array(2.0f)), (3L, Array(4.0f)))
      .toDF("id", "v")
    val o1 = VectorStats.mahalanobisScores(d1, "id", "v")
      .orderBy($"id").as[(Long, Double)].collect().toSeq
    assert(o1 == Seq((1L, replica(c1, c1(0))), (2L, replica(c1, c1(1))),
      (3L, replica(c1, c1(2)))))
    assert(o1(1)._2 == 0.0 && o1(0)._2 == o1(2)._2 &&
      math.abs(o1(0)._2 - 1.5) < 2e-6) // ~1.5 sigma^2, floor-quantized
    // constant dim 0 is skipped, live dim 1 gives ~1 sigma^2 each
    val c2 = Seq(Seq(1.0f, 5.0f), Seq(1.0f, 7.0f))
    val d2 = Seq((1L, Array(1.0f, 5.0f)), (2L, Array(1.0f, 7.0f)))
      .toDF("id", "v")
    val o2 = VectorStats.mahalanobisScores(d2, "id", "v")
      .orderBy($"id").as[(Long, Double)].collect().toSeq
    assert(o2 == Seq((1L, replica(c2, c2(0))), (2L, replica(c2, c2(1)))))
    assert(math.abs(o2(0)._2 - 1.0) < 2e-6)
    // null vectors are excluded from stats AND output
    val d3 = Seq((1L, Some(Array(0.0f))), (2L, Some(Array(2.0f))),
      (3L, None), (4L, Some(Array(4.0f)))).toDF("id", "v")
    val o3 = VectorStats.mahalanobisScores(d3, "id", "v")
      .orderBy($"id").as[(Long, Double)].collect().toSeq
    assert(o3.map(_._1) == Seq(1L, 2L, 4L) &&
      o3.map(_._2) == o1.map(_._2))
    // determinism on real gate data (64-dim floats)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = VectorStats.mahalanobisScores(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = VectorStats.mahalanobisScores(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a == b && a.size == 500)
    // the corpus-mean vector scores lowest-ish: outliers exist
    assert(a.values.max > a.values.min)
  }

  test("pcaPowerIteration: a rank-1 cloud recovers its axis — v2 = 2*v1, " +
       "dead dim exactly 0, share ~ 1, lambda = the axis variance; " +
       "partitioning-invariant; positive-start sign pin") {
    // x(t) = (t, 2t, 0): population covariance = Var(t)*[[1,2,0],[2,4,0],0]
    // Var(t) over -5..5 = 10 -> eigenvalue 50, eigvec (1,2,0)/sqrt(5)
    val rows = (-5 to 5).map(t =>
      (t.toLong + 5L, Array(t.toFloat, 2f * t, 0f)))
    val df = rows.toDF("vec_id", "embedding")
    val out = VectorStats.pcaPowerIteration(df, "vec_id", "embedding")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L))
    val v = out.map(_._2)
    assert(v(2) == 0L)
    assert(math.abs(v(1) - 2 * v(0)) <= 3, s"v=$v") // integer-grid slack
    assert(v(0) > 0L) // all-positive start pins the sign
    // |v| = 1e6 up to grid loss
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1e6) < 5)
    val (lam, tr, share) = (out.head._3, out.head._4, out.head._5)
    assert(math.abs(lam - 50000000L) < 50000L, s"lambda=$lam")
    assert(math.abs(tr - 50000000L) < 50000L, s"trace=$tr")
    assert(share >= 999000L, s"share=$share")
    val rep = VectorStats.pcaPowerIteration(df.repartition(5), "vec_id",
        "embedding").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rep == out)
  }
}
