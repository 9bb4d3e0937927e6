package graft.operators

import graft.expressions.GraftExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Second-moment statistics over an embedding column — covariance and
  * PCA — built on ONE fixed-size mergeable aggregate
  * ([[graft.expressions.VectorMomentsAgg]]): each task folds its vectors
  * into a d + d(d+1)/2 double buffer, partials tree-merge, and only the
  * O(d²) summary ever reaches the driver. The corpus is scanned once,
  * shuffles nothing but the summary, and the projection that follows is
  * map-only — the same bounded-sidecar discipline as the IVF centroids
  * and PQ codebooks (driver state is O(d²), never O(rows)).
  *
  * Reference scope: the reference engine moves data and delegates
  * transforms to Spark; whitening / decorrelating embedding columns is
  * part of the curation stage a training-data pipeline runs on top.
  */
object VectorStats {

  /** Upper-triangle covariance matrix of a vector column as a DataFrame
    * (i int, j int, cov double), i ≤ j, sample-normalized by
    * `n − ddof`. One aggregate pass + an explode of the single summary
    * row; no per-row shuffle at any scale. Rows with NULL vectors are
    * skipped; needs `n > ddof` rows (empty/degenerate input returns an
    * empty frame). Ragged vector dimensions fail loudly in the
    * aggregate rather than mis-summing. */
  def covarianceMatrix(df: DataFrame, vecCol: String,
                       ddof: Int = 1): DataFrame = {
    require(ddof >= 0, "ddof must be >= 0")
    df.agg(GraftExpressions.vectorMoments(col(vecCol)).as("__m"))
      .filter(col("__m").isNotNull && col("__m.n") > ddof)
      .select(col("__m.n").as("__n"), col("__m.sums").as("__s"),
        explode(col("__m.pairs")).as("__p"))
      .select(col("__p.i").as("i"), col("__p.j").as("j"),
        ((col("__p.sxy") -
          element_at(col("__s"), col("__p.i") + 1) *
            element_at(col("__s"), col("__p.j") + 1) / col("__n")) /
          (col("__n") - ddof)).as("cov"))
  }

  /** Diagonal-covariance Mahalanobis outlier score per vector:
    * `score(x) = Σ_d (x_d − μ_d)²/σ²_d` — the classic embedding-space
    * anomaly number ("how many standard deviations is this vector from
    * the corpus center, per axis, summed"), the multivariate rung above
    * the per-feature robust z-scores. The full-covariance variant wants
    * [[whiten]]; the diagonal form is the standard first cut and is
    * exactly replayable.
    *
    * Exactness device: components quantize to nano-units
    * (`floor(x·1e9)` on the float→double cast, [[graft.operators.Drift
    * .embeddingMeanDrift]]'s bridge); per-dimension Σx and Σx² are
    * EXACT DECIMAL sums, μ is one double division, and σ² is the
    * centered form (n·Σx² − (Σx)²)/n² with an EXACT integer numerator
    * (E[x²]−μ² in doubles cancels catastrophically on large-magnitude
    * low-variance dims); each dimension's term quantizes to micro-units before
    * the per-vector total, which is therefore an exact integer SUM —
    * no float accumulation across dimensions or rows anywhere.
    * Zero-variance dimensions contribute 0 (a constant axis carries no
    * outlier signal — and would otherwise divide by zero). Population
    * variance (ddof = 0). NULL vectors are excluded.
    *
    * Returns (idCol, score double = score_micro/1e6 exact, round-free).
    * Scale shape: one explode+groupBy pass for the d-row stats frame
    * (map-combinable; d rows total), stats collect as a bounded O(d)
    * sidecar, and scoring is MAP-ONLY — an aggregate() fold over the
    * vector against two broadcast literal arrays; no join, no shuffle,
    * no window. */
  def mahalanobisScores(df: DataFrame, idCol: String,
                        vecCol: String): DataFrame = {
    // per-DIMENSION sidecar: bounded by embedding width, enforced (a
    // 65k-wide "embedding" is a data bug, not a model)
    val stats = graft.util.DriverBound.collectBounded(
        df.filter(col(vecCol).isNotNull)
          .select(posexplode(col(vecCol)).as(Seq("__d", "__x")))
          .select(col("__d"),
            floor(col("__x").cast("double") * lit(1e9)).cast("long")
              .as("__xq"))
          .groupBy(col("__d"))
          .agg(count(lit(1)).as("__n"),
            sum(col("__xq")
              .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
              .as("__sx"),
            sum((col("__xq")
              .cast(org.apache.spark.sql.types.DecimalType(38, 0))
              * col("__xq")).as("__xq2")).as("__sx2")),
        65536, s"mahalanobisScores($vecCol)")
      .map { r =>
        val n = r.getLong(1)
        val sx = r.getDecimal(2)
        val sx2 = r.getDecimal(3)
        val mu = sx.doubleValue() / n
        // variance as (n·Σx² − (Σx)²)/n² with the numerator EXACT in
        // BigDecimal integer arithmetic before the one double division:
        // the naive E[x²]−μ² double subtraction cancels catastrophically
        // for large-magnitude low-variance dimensions (nano-quantized
        // sums pass 2^53 at ~1e6 rows of |x|≈100), leaving σ² noise-
        // dominated; the exact numerator can't cancel
        val nBd = java.math.BigDecimal.valueOf(n)
        val num = sx2.multiply(nBd).subtract(sx.multiply(sx))
        val va = num.doubleValue() / (n.toDouble * n.toDouble)
        (r.getInt(0), mu, va)
      }.sortBy(_._1)
    require(stats.nonEmpty, "mahalanobisScores needs non-null vectors")
    require(stats.map(_._1).toSeq == stats.indices.toSeq,
      "ragged vector dimensions")
    val mus = stats.map(_._2).toSeq
    val vas = stats.map(_._3).toSeq
    df.filter(col(vecCol).isNotNull)
      .withColumn("__mu", typedlit(mus))
      .withColumn("__va", typedlit(vas))
      .withColumn("__sm", expr(
        s"aggregate(transform(transform(`$vecCol`, " +
          // nano-quantized component minus the dimension's mean...
          "(x, i) -> CAST(floor(CAST(x AS DOUBLE) * 1000000000.0) AS DOUBLE)" +
          " - __mu[i]), " + // [] is 0-based, matching the lambda index
          // ...squared over the variance, micro-quantized per dimension
          "(dv, i) -> CASE WHEN __va[i] > 0D THEN " +
          "CAST(floor(1000000.0 * dv * dv / __va[i]) AS BIGINT) " +
          "ELSE 0L END), " +
          "0L, (acc, t) -> acc + t)"))
      .select(col(idCol),
        (col("__sm").cast("double") / lit(1e6)).as("score"))
  }

  /** Top-k principal components: (eigenvalue desc, eigenvector) pairs of
    * the sample covariance, solved on the DRIVER by cyclic Jacobi — the
    * matrix is d×d (an embedding dim, not a data size), so the O(d³)
    * solve is microseconds; the distributed work is the single moments
    * pass. Eigenvector sign is fixed deterministically (largest-|.|
    * component made positive) so runs and engines agree. */
  def pcaComponents(df: DataFrame, vecCol: String,
                    k: Int): (Array[Double], Array[Double], Array[Array[Double]]) = {
    val row = df.agg(GraftExpressions.vectorMoments(col(vecCol)).as("m"))
      .select(col("m.n"), col("m.sums"), col("m.pairs.sxy"))
      .head()
    val n = row.getLong(0)
    require(n > 1, s"PCA needs >= 2 vectors, got $n")
    val sums = row.getSeq[Double](1).toArray
    val sxy = row.getSeq[Double](2).toArray
    val d = sums.length
    require(k >= 1 && k <= d, s"k must be in [1, $d], got $k")
    val means = sums.map(_ / n)
    // unpack upper triangle into a full symmetric covariance matrix
    val cov = Array.ofDim[Double](d, d)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (sxy(idx) - sums(i) * sums(j) / n) / (n - 1)
        cov(i)(j) = c; cov(j)(i) = c
        idx += 1; j += 1
      }
      i += 1
    }
    val (eigVals, eigVecs) = jacobiEigen(cov)
    val order = eigVals.indices.sortBy(i => -eigVals(i)).take(k)
    val vals = order.map(eigVals(_)).toArray
    val vecs = order.map { oi =>
      val v = eigVecs.map(_(oi))
      // deterministic sign: component with the largest magnitude positive
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(pivot) < 0) v.map(-_) else v
    }.toArray
    (means, vals, vecs)
  }

  /** Project every vector onto the top-k principal components:
    * (idCol, pca array<double> length k). The eigenbasis rides the plan
    * as a codegen reference object; the projection is map-only and stays
    * inside whole-stage codegen — at 100 TB this is a pure scan-stage
    * transform, no shuffle, no driver round-trip per row. */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String,
                 k: Int): DataFrame = {
    val (means, _, w) = pcaComponents(df, vecCol, k)
    df.select(col(idCol),
      GraftExpressions.matrixProject(col(vecCol), means, w).as("pca"))
  }

  /** ZCA whitening: x ↦ E D^(−1/2) Eᵀ (x − μ), the symmetric whitening
    * transform — output components are decorrelated with unit variance,
    * and among all whitenings ZCA stays closest to the original basis
    * (Bell & Sejnowski '97), which is why it is the standard choice for
    * embedding post-processing. Same cost model as [[pcaProject]]: one
    * moments pass, a driver-side d×d solve, then a map-only codegen'd
    * projection — no shuffle at any scale.
    *
    * Eigendirections with variance ≤ `eps` (degenerate/constant dims)
    * are passed through UNSCALED (factor 1) instead of exploding
    * 1/√λ → ∞ noise: whitening a dimension with no variance is
    * undefined, and dropping it would change the output dimension.
    * Returns (idCol, white array<double> length d). */
  def whiten(df: DataFrame, idCol: String, vecCol: String,
             eps: Double = 1e-9): DataFrame = {
    val (means, vals, vecs) = {
      val row = df.agg(GraftExpressions.vectorMoments(col(vecCol)).as("m"))
        .select(col("m.n"), col("m.sums"), col("m.pairs.sxy"))
        .head()
      val n = row.getLong(0)
      require(n > 1, s"whitening needs >= 2 vectors, got $n")
      val sums = row.getSeq[Double](1).toArray
      val sxy = row.getSeq[Double](2).toArray
      val d = sums.length
      val cov = Array.ofDim[Double](d, d)
      var idx = 0; var i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          val c = (sxy(idx) - sums(i) * sums(j) / n) / (n - 1)
          cov(i)(j) = c; cov(j)(i) = c
          idx += 1; j += 1
        }
        i += 1
      }
      val (ev, evec) = jacobiEigen(cov)
      (sums.map(_ / n), ev, evec)
    }
    val d = means.length
    // W = E diag(s) Eᵀ with s_k = 1/sqrt(λ_k) (or 1 when λ_k <= eps)
    val scale = vals.map(l => if (l <= eps) 1.0 else 1.0 / math.sqrt(l))
    val w = Array.tabulate(d, d) { (r, c) =>
      var acc = 0.0
      var k = 0
      while (k < d) { acc += vecs(r)(k) * scale(k) * vecs(c)(k); k += 1 }
      acc
    }
    df.select(col(idCol),
      GraftExpressions.matrixProject(col(vecCol), means, w).as("white"))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix V with V[:,i] the i-th vector).
    * Textbook rotations until off-diagonal mass is ~machine-zero;
    * d ≤ a few hundred solves in well under a millisecond. */
  private[operators] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-12 * math.max(1.0, frobenius(a))
    while (off > tol && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol / (d * d)) {
            // rotation angle zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  /** Lloyd k-means in scaled INTEGER arithmetic — the bit-reproducible
    * sibling of the float k-means inside [[Similarity]]'s IVF coarse
    * quantizer. Components are floor-quantized to `scale` units
    * (`floor(x · scale)` — one double multiply + floor, identical in
    * every engine; the established discipline from the drift family),
    * distances are exact long sums of squares, the argmin breaks ties
    * by smaller centroid id, and the centroid update is integer FLOOR
    * division (`(s − posmod(s, n)) div n` — spelled out because Spark's
    * `div` truncates toward zero while other engines floor; the posmod
    * subtraction makes the dividend exactly divisible so every rounding
    * mode agrees). Result: the same clustering on any engine, any
    * partitioning, any run — which is what makes cluster ASSIGNMENTS
    * auditable (SemDeDup-style keep/drop decisions can be replayed),
    * where float Lloyd can only be checked by recall proxies.
    *
    * Seeding: the vectors of the `k` smallest ids (deterministic; pass a
    * pre-shuffled/sampled frame for quality seeding). `iters` full
    * Lloyd updates, then a final assignment under the settled centroids.
    * Empty clusters keep their previous centroid.
    *
    * Returns (cluster = seed id, n_members long, wcss long — Σ of
    * within-cluster squared distances in scale² units).
    *
    * Scale shape: vectors live in long form (id, dim, q) and never
    * move — each round joins them against the k·d-row centroid frame
    * (broadcast) on the dim index, aggregates (id, cid) partial sums
    * map-side, and the update is one keyed groupBy(cid, dim). Driver
    * holds nothing; lineage grows one join per round (bounded iters). */
  def kmeansIntegers(df: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int,
                     scale: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1 && iters <= 10, s"iters in [1,10], got $iters")
    val q = df.select(col(idCol).as("__id"),
        posexplode(col(vecCol)).as(Seq("__i", "__x")))
      .select(col("__id"), col("__i"),
        floor(col("__x").cast("double") * lit(scale.toDouble))
          .cast("long").as("__q"))
    val seedIds = df.select(col(idCol).as("__id"))
      .orderBy(col("__id")).limit(k)
    var cents = q.join(broadcast(seedIds), Seq("__id"), "left_semi")
      .select(col("__id").as("__cid"), col("__i"), col("__q").as("__c"))
    def assign(c: DataFrame) = {
      val d2 = q.join(broadcast(c), Seq("__i"))
        .groupBy(col("__id"), col("__cid"))
        .agg(sum((col("__q") - col("__c")) * (col("__q") - col("__c")))
          .as("__d2"))
      d2.groupBy(col("__id"))
        .agg(min(struct(col("__d2"), col("__cid"))).as("__m"))
        .select(col("__id"), col("__m.__cid").as("__cid"),
          col("__m.__d2").as("__d2"))
    }
    for (_ <- 1 to iters) {
      val upd = assign(cents).select(col("__id"), col("__cid"))
        .join(q, Seq("__id"))
        .groupBy(col("__cid"), col("__i"))
        .agg(sum(col("__q")).as("__s"), count(lit(1)).as("__n"))
        .select(col("__cid"), col("__i"),
          call_function("div",
            col("__s") - pmod(col("__s"), col("__n")), col("__n"))
            .as("__cnew"))
      cents = cents.join(upd, Seq("__cid", "__i"), "left")
        .select(col("__cid"), col("__i"),
          coalesce(col("__cnew"), col("__c")).as("__c"))
        .localCheckpoint(false)
    }
    assign(cents)
      .groupBy(col("__cid").as("cluster"))
      .agg(count(lit(1)).as("n_members"), sum(col("__d2")).as("wcss"))
      .orderBy(col("cluster"))
  }

  /** Top principal component by POWER ITERATION on an integer grid
    * (von Mises & Pollaczek-Geiringer 1929; the PCA pass every
    * embedding pipeline wants before whitening/compression decisions):
    * the dominant eigenvector of the population covariance, its
    * eigenvalue, and the explained-variance share λ₁/trace — "is this
    * embedding space basically one axis?" answered distributedly and
    * bit-reproducibly.
    *
    * Exactness device: components nano-quantize on the float→double
    * bridge; the covariance matrix is DECIMAL-exact moment sums folded
    * by ONE signed micro floordiv per cell (`C = (n·Σxy − Σx·Σy) /
    * (n²·1e12)` in micro units); each iteration is an exact integer
    * mat-vec (`w = floordiv(C·v, 1e6)`), ONE norm per round
    * (`floor(√Σw²)` — the DECIMAL→DOUBLE cast and sqrt are correctly
    * rounded in any engine), and a renormalization floordiv back to
    * the 1e6 grid. Convergence is the standard power-iteration rate
    * (λ₂/λ₁ per round); `rounds` defaults to 3 — a spectrum audit, not
    * a solver. Sign is pinned by the all-positive start vector.
    *
    * Scale shape: the pair-moment build is the only heavy pass — a
    * per-row self-join of the exploded components, O(rows·d²) products
    * map-combined into d² cells (the [[covarianceMatrix]] moment
    * shape); afterwards everything runs on d- and d²-row frames.
    * Returns d rows: (i 1-based, v_micro, lambda_micro, trace_micro,
    * share_micro). */
  def pcaPowerIteration(df: DataFrame, idCol: String, vecCol: String,
                        rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 10,
      s"rounds must be in [1,10], got $rounds")
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def fdiv(a: org.apache.spark.sql.Column,
             b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)) / b).cast("long")
    val base = df.filter(col(vecCol).isNotNull)
    // widen BEFORE the explode/checkpoint: the d²-cell self-join below
    // streams O(rows·d²) products out of comps' partitions, and a
    // narrow scan (one parquet file) would run that whole pass in ONE
    // task (guide §2.5); no-op when the input is already parallel
    val comps = graft.util.SparkUtils.widen(
        base.select(col(idCol).as("__r"), col(vecCol).as("__vec")))
      .select(col("__r"), posexplode(col("__vec")).as(Seq("__p", "__x")))
      .select(col("__r"), (col("__p") + 1).cast("long").as("__i"),
        floor(col("__x").cast("double") * lit(1e9)).cast("long")
          .as("__v"))
      .localCheckpoint() // feeds sums AND the d²-cell self-join
    val nF = base.agg(count(lit(1)).as("__n"))
    val sums = comps.groupBy(col("__i"))
      .agg(sum(dec(col("__v"))).as("__s"))
    val cMat = comps
      .join(comps.select(col("__r"), col("__i").as("__j"),
        col("__v").as("__w")), Seq("__r"))
      .groupBy(col("__i"), col("__j"))
      .agg(sum(dec(col("__v")) * dec(col("__w"))).as("__sxy"))
      .join(sums.select(col("__i"), col("__s").as("__si")), Seq("__i"))
      .join(sums.select(col("__i").as("__j"), col("__s").as("__sj")),
        Seq("__j"))
      .crossJoin(broadcast(nF))
      .select(col("__i"), col("__j"),
        fdiv(dec(col("__n")) * col("__sxy") - col("__si") * col("__sj"),
          dec(col("__n")) * dec(col("__n")) *
            dec(lit(1000000000000L))).as("__c"))
      .localCheckpoint()
    var v = cMat.select(col("__i")).distinct()
      .withColumn("__v", lit(1000000L))
    var lambda = nF.select(lit(0L).as("__nrm")) // replaced each round
    var r = 0
    while (r < rounds) {
      val w = cMat
        .join(v.select(col("__i").as("__j"), col("__v")), Seq("__j"))
        .groupBy(col("__i"))
        .agg(sum(dec(col("__c")) * dec(col("__v"))).as("__raw"))
        .select(col("__i"),
          fdiv(col("__raw"), dec(lit(1000000L))).as("__w"))
      val nrm = w.agg(floor(sqrt(
        sum(dec(col("__w")) * dec(col("__w"))).cast("double")))
        .cast("long").as("__nrm"))
      v = w.crossJoin(broadcast(nrm))
        .select(col("__i"),
          when(col("__nrm") > 0L,
            fdiv(dec(lit(1000000L)) * dec(col("__w")),
              dec(col("__nrm")))).otherwise(lit(0L)).as("__v"))
        .localCheckpoint()
      lambda = nrm
      r += 1
    }
    val trace = cMat.filter(col("__i") === col("__j"))
      .agg(sum(col("__c")).cast("long").as("trace_micro"))
    v.crossJoin(broadcast(lambda)).crossJoin(broadcast(trace))
      .select(col("__i").as("i"), col("__v").as("v_micro"),
        col("__nrm").as("lambda_micro"), col("trace_micro"),
        when(col("trace_micro") > 0L,
          fdiv(lit(1000000L) * col("__nrm"), col("trace_micro")))
          .otherwise(lit(0L)).as("share_micro"))
      .orderBy(col("i"))
  }
}
