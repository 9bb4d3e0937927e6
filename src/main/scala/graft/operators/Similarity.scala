package graft.operators

import graft.expressions.{GraftExpressions, HyperplaneSignature64, NearestCentroid}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - `bruteForceTopK`: broadcast the (small) query set against the full
  *    corpus, one fused cosine per (query, doc), per-query top-k. Exact —
  *    the baseline/oracle. The corpus is streamed, never collected; the
  *    only shuffle is the final per-query top-k, over ≤ |corpus| rows of
  *    (qid, id, cosine) — at 100 TB keep the query batch bounded and this
  *    scales linearly.
  *  - `lshTopK`: random-hyperplane signatures bucket the corpus — the
  *    64-bit signature splits into `nChunks` bands (default 8×8-bit) and
  *    a candidate needs ONE full band to collide; only candidates get an
  *    exact cosine, then per-query top-k. Approximate, near-linear — the
  *    scale path. Fewer/wider chunks → fewer candidates and lower recall;
  *    more/narrower chunks → the reverse.
  */
object Similarity {

  def hyperplaneSig(v: Column, bits: Int = 64, seed: Long = 42L): Column = {
    require(bits == 64, "current implementation emits a 64-bit signature")
    GraftColumnBridge.column(HyperplaneSignature64(GraftColumnBridge.expression(v), seed))
  }

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     queryIdCol: String = null,
                     queryVecCol: String = null): DataFrame = {
    val qid = Option(queryIdCol).getOrElse(idCol)
    val qvec = Option(queryVecCol).getOrElse(vecCol)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val q = queries.select(col(qid).as("query_id"), col(qvec).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        round(GraftExpressions.cosineSimilarity(col("qv"), col("v")), 6).as("cosine"))
    topK(scored, k)
  }

  /** Hard-negative mining for contrastive training (the heavy data-prep
    * step behind embedding-model fine-tuning, e.g. SimCSE/DPR-style
    * in-batch negatives upgraded to mined ones): for each anchor, the
    * top-k most-cosine-similar vectors whose `labelCol` DIFFERS from the
    * anchor's — similar enough to be hard, labeled differently so they
    * are true negatives. Output (query_id, rank, id, cosine, label).
    *
    * This exact variant broadcasts the anchors (they are a training
    * batch or a sampled subset — small by construction) against the full
    * corpus scan: cost is one corpus pass per anchor set, no shuffle of
    * the corpus, same shape as [[bruteForceTopK]]. When the anchor set
    * is NOT small, compose the IVF path instead: assign both sides to
    * centroids and mine within probed cells ([[ivfTopK]] with the label
    * filter) — same recall story as ANN search.
    *
    * The label filter runs BEFORE ranking, so rank k means "k-th hardest
    * negative", not "survivors of a post-filtered top-k" — a
    * post-filtered variant would under-fill k whenever the true top-k is
    * dominated by same-label positives (it always is, for a good
    * encoder). */
  def mineHardNegatives(corpus: DataFrame, anchors: DataFrame,
                        idCol: String, vecCol: String, labelCol: String,
                        k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      col(labelCol).as("label"))
    val q = anchors.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("qlabel"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("label") =!= col("qlabel"))
      .select(col("query_id"), col("id"), col("label"),
        round(GraftExpressions.cosineSimilarity(col("qv"), col("v")), 6)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("cosine"),
        col("label"))
  }

  /** Contrastive TRIPLET mining — (anchor, positive, negative) rows for
    * metric-learning losses: per anchor, the positive is its most
    * cosine-similar SAME-label vector and the negative its most similar
    * DIFFERENT-label vector ([[mineHardNegatives]] with k = 1) — the
    * "hardest positive, hardest negative" recipe that makes triplet
    * margins informative. Anchors with no same-label or no
    * different-label candidate yield no row (an unusable triplet, not a
    * NULL-padded one). Output (query_id, pos_id, pos_cosine, neg_id,
    * neg_cosine, margin = pos − neg, rounded 6).
    *
    * Scale: ONE broadcast corpus scan scores both sides (the label
    * filter splits the same scored stream), two per-anchor top-1
    * windows, one id join — nothing beyond [[bruteForceTopK]]'s cost.
    * For non-broadcastable anchor sets, compose the IVF path per side. */
  def mineTriplets(corpus: DataFrame, anchors: DataFrame,
                   idCol: String, vecCol: String,
                   labelCol: String): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      col(labelCol).as("clabel"))
    val q = anchors.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("qlabel"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"), col("clabel"), col("qlabel"),
        round(GraftExpressions.cosineSimilarity(col("qv"), col("v")), 6)
          .as("cosine"))
    def top1(df: DataFrame, idAs: String, cosAs: String) = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("id").asc)
      df.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("query_id"), col("id").as(idAs),
          col("cosine").as(cosAs))
    }
    top1(scored.filter(col("clabel") === col("qlabel")),
        "pos_id", "pos_cosine")
      .join(top1(scored.filter(col("clabel") =!= col("qlabel")),
        "neg_id", "neg_cosine"), Seq("query_id"))
      .withColumn("margin",
        round(col("pos_cosine") - col("neg_cosine"), 6))
  }

  /** Random-projection pre-filter ANN: brute-force the top-`shortlist`
    * on Rademacher-projected `outDim`-dim float vectors, then exact
    * cosine re-rank on the raw vectors. The all-pairs compare drops to
    * outDim/dim of the brute cost and the broadcast/shuffle payload
    * shrinks the same way (float halves it again vs double); recall
    * rides JL distortion O(1/√outDim) and lives only in shortlist
    * membership — returned cosines are exact, as in [[pqTopK]]. The
    * middle ground between [[bruteForceTopK]] (exact, full cost) and
    * [[lshTopK]] (bucketed, needs tuning). */
  def projectedBruteForceTopK(corpus: DataFrame, queries: DataFrame,
                              idCol: String, vecCol: String, k: Int,
                              outDim: Int = 16, shortlist: Int = 50,
                              seed: Long = 42L): DataFrame = {
    require(shortlist >= k, "shortlist must cover k")
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("pv", GraftExpressions.randomProject(col("v"), outDim, seed))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("pq", GraftExpressions.randomProject(col("qv"), outDim, seed))
    val candW = Window.partitionBy(col("query_id"))
      .orderBy(col("pcos").desc, col("id").asc)
    val candidates = c.select(col("id"), col("pv"))
      .crossJoin(broadcast(q.select(col("query_id"), col("pq"))))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        GraftExpressions.cosineSimilarity(col("pq"), col("pv")).as("pcos"))
      .withColumn("r", row_number().over(candW))
      .filter(col("r") <= shortlist)
      .select(col("query_id"), col("id"))
    val exact = candidates
      .join(c.select(col("id"), col("v")), Seq("id"))
      .join(broadcast(q.select(col("query_id"), col("qv"))), Seq("query_id"))
      .select(col("query_id"), col("id"),
        round(GraftExpressions.cosineSimilarity(col("qv"), col("v")), 6).as("cosine"))
    topK(exact, k)
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nChunks: Int = 8,
              seed: Long = 42L): DataFrame = {
    // Banding trade-off: a candidate needs ONE full chunk of hyperplane
    // bits to match, so P(candidate) = 1-(1-p^w)^nChunks with
    // p = 1-θ/π and w = 64/nChunks. The 16-bit chunks that are right for
    // near-duplicate mining (θ→0) retrieve almost nothing for general
    // ANN queries — 8×8-bit banding keeps the candidate set ~nChunks·p^8
    // of the corpus while recall@k for genuinely-close vectors stays high.
    require(nChunks > 0 && 64 % nChunks == 0, "nChunks must divide 64")
    val width = 64 / nChunks
    val mask = (1L << width) - 1
    // only (chunk_idx, chunk, id) flows through the bucket join — the
    // embedding arrays would otherwise be replicated nChunks× through the
    // shuffle; they rejoin by id once candidates are deduplicated
    def chunked(df: DataFrame, id: String) =
      df.select(col(id), hyperplaneSig(col("__v"), 64, seed).as("sig"))
        .select(col(id),
          posexplode(transform(sequence(lit(0), lit(nChunks - 1)),
            i => call_function("shiftright", col("sig"), (i * width).cast("int")).bitwiseAND(lit(mask))))
            .as(Seq("chunk_idx", "chunk")))
    val cVec = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"))
    val qVec = queries.select(col(idCol).as("query_id"), col(vecCol).as("__v"))
    val c = chunked(cVec, "id")
    val q = chunked(qVec, "query_id")
    val candidateIds = c.join(q,
        c("chunk_idx") === q("chunk_idx") && c("chunk") === q("chunk") &&
          col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"))
      .dropDuplicates("query_id", "id")
    val candidates = candidateIds
      .join(cVec.withColumnRenamed("__v", "v"), Seq("id"))
      .join(broadcast(qVec.withColumnRenamed("__v", "qv")), Seq("query_id"))
      .select(col("query_id"), col("id"),
        round(GraftExpressions.cosineSimilarity(col("qv"), col("v")), 6).as("cosine"))
    topK(candidates, k)
  }

  def nearestCentroid(v: Column, cents: Array[Array[Double]]): Column =
    GraftColumnBridge.column(NearestCentroid(GraftColumnBridge.expression(v), cents))

  /** IVF coarse quantizer: nLists centroids learned with `iters` Lloyd
    * iterations from deterministic hash-chosen seeds (the nLists vectors
    * with the smallest xxhash64(seed, id) — no RNG, stable across runs).
    *
    * Per iteration: assignment is map-only (codegen'd [[NearestCentroid]]
    * with the centroid matrix as a reference object), and the update
    * shuffles only (cid, pos, partial-sum) — map-side combined to
    * ≤ nLists×dim rows per task regardless of corpus size. Centroids are
    * collected to the driver between iterations (nLists×dim doubles,
    * bounded small — same driver-side role as the reference's min/max
    * bound queries, jdbc_connection/connection.py:340-391). */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                   nLists: Int, iters: Int = 2,
                   seed: Long = 42L): Array[Array[Double]] = {
    require(nLists > 0 && iters >= 0)
    require(nLists <= 65536,
      s"nLists=$nLists centroids would be a driver-side array, not a " +
        "sidecar; IVF fanout above 65536 lists wants a 2-level quantizer")
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    var cents: Array[Array[Double]] =
      c.orderBy(xxhash64(lit(seed), col("id")))
        .limit(nLists)
        .select(col("v")).collect()
        .map(_.getSeq[Double](0).toArray)
    var it = 0
    while (it < iters) {
      val upd = c.select(nearestCentroid(col("v"), cents).as("cid"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("x"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("x")))),
          s => s("x")).as("cv"))
        .collect()
      val next = cents.map(_.clone())
      upd.foreach(r => next(r.getInt(0)) = r.getSeq[Double](1).toArray)
      cents = next
      it += 1
    }
    cents
  }

  /** IVF top-k: assign every corpus vector to its nearest of nLists
    * centroids (map-only), probe each query's nProbe nearest lists, exact
    * cosine only inside probed lists. The probe set (|queries| × nProbe
    * rows) is broadcast, so the scan side never shuffles — at 100 TB the
    * exact-cosine work drops to ~nProbe/nLists of brute force and the only
    * shuffle is the final per-query top-k. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nLists: Int = 16, nProbe: Int = 4, iters: Int = 2,
              seed: Long = 42L): DataFrame = {
    require(nProbe >= 1 && nProbe <= nLists)
    val cents = ivfCentroids(corpus, idCol, vecCol, nLists, iters, seed)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cid", nearestCentroid(col("v"), cents))
    val centLit = typedlit(cents.toSeq.zipWithIndex.map {
      case (v, i) => (i, v.toSeq)
    })
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cid").asc)
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"), explode(centLit).as("c"))
      .select(col("query_id"), col("qv"), col("c._1").as("cid"),
        GraftExpressions.cosineSimilarity(col("c._2"), col("qv")).as("ccos"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid"))
    val candidates = c.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        round(GraftExpressions.cosineSimilarity(col("qv"), col("v")), 6).as("cosine"))
    topK(candidates, k)
  }

  /** Product-quantization codebooks: per-subspace k-means over a
    * DETERMINISTIC sample (the `sampleN` vectors with smallest
    * xxhash64(seed, id) — no RNG, stable across runs; same bounded
    * driver-probe role as [[ivfCentroids]]'s seeds). Vectors are
    * L2-normalized before subspacing so ADC dot sums approximate cosine.
    * Lloyd iterations use L2 on the subvectors; empty clusters keep their
    * previous centroid. Driver cost: sampleN × dim doubles — bounded,
    * independent of corpus size. */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                  m: Int = 8, ks: Int = 16,
                  sampleN: Int = 2000, iters: Int = 5,
                  seed: Long = 42L): Array[Array[Array[Double]]] = {
    require(m >= 1 && m <= 8 && ks >= 1 && ks <= 256)
    val sample = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .orderBy(xxhash64(lit(seed), col("id")))
      .limit(sampleN)
      .select(col("v")).collect()
      .map { r =>
        val raw = r.getSeq[Double](0).toArray
        val n = math.sqrt(raw.map(x => x * x).sum)
        if (n > 0) raw.map(_ / n) else raw
      }
    require(sample.nonEmpty, "empty corpus sample")
    val dim = sample.head.length
    def subRange(i: Int): (Int, Int) = {
      val base = dim / m; val rem = dim % m
      val lo = i * base + math.min(i, rem)
      (lo, lo + base + (if (i < rem) 1 else 0))
    }
    Array.tabulate(m) { i =>
      val (lo, hi) = subRange(i)
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, lo, hi))
      var cents = subs.take(ks).map(_.clone())
      if (cents.length < ks) // tiny sample: pad by repeating (harmless)
        cents = Array.tabulate(ks)(c => subs(c % subs.length).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(ks)(new Array[Double](hi - lo))
        val counts = new Array[Int](ks)
        subs.foreach { s =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < ks) {
            var d = 0.0; var j = 0
            while (j < s.length) { val t = s(j) - cents(c)(j); d += t * t; j += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var j = 0
          while (j < s.length) { sums(best)(j) += s(j); j += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(ks) { c =>
          if (counts(c) == 0) cents(c)
          else sums(c).map(_ / counts(c))
        }
        it += 1
      }
      cents
    }
  }

  /** PQ top-k with exact re-ranking — the memory-bound 100 TB path: the
    * corpus is scanned as 8-byte packed codes (one `PqEncode` map pass;
    * 32x less I/O than raw 64-dim float vectors), each query broadcasts a
    * precomputed `PqTable`, candidate scoring is m table-lookups per
    * (query, doc) inside codegen, and only the top `shortlist` ADC
    * candidates per query fetch their true vectors for an exact cosine
    * re-rank. Approximation error lives entirely in shortlist membership;
    * the returned cosines are exact. */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, k: Int,
             m: Int = 8, ks: Int = 16,
             shortlist: Int = 50, sampleN: Int = 2000,
             iters: Int = 5, seed: Long = 42L): DataFrame = {
    require(shortlist >= k, "shortlist must cover k")
    val codebooks = pqCodebooks(corpus, idCol, vecCol, m, ks, sampleN, iters, seed)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val codes = c.select(col("id"),
      GraftExpressions.pqEncode(col("v"), codebooks).as("code"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("tbl", GraftExpressions.pqTable(col("qv"), codebooks))
    val adcW = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("id").asc)
    val candidates = codes.crossJoin(broadcast(q.select(col("query_id"), col("tbl"))))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        GraftExpressions.pqAdcScore(col("code"), col("tbl"), m, ks).as("adc"))
      .withColumn("r", row_number().over(adcW))
      .filter(col("r") <= shortlist)
      .select(col("query_id"), col("id"))
    val exact = candidates
      .join(c, Seq("id"))
      .join(broadcast(q.select(col("query_id"), col("qv"))), Seq("query_id"))
      .select(col("query_id"), col("id"),
        round(GraftExpressions.cosineSimilarity(col("qv"), col("v")), 6).as("cosine"))
    topK(exact, k)
  }

  /** IVF-PQ top-k — the full FAISS-style scale design: a coarse
    * quantizer prunes COMPUTE (each query ADC-scores only its nProbe
    * nearest inverted lists, ~nProbe/nLists of the corpus) while PQ codes
    * shrink MEMORY (the scan carries cid + 8-byte code, not the vector).
    * The index frame (id, cid, code) is one map-only pass over the
    * corpus; at 100 TB it is the thing you'd persist, partitioned by cid.
    * Exact-cosine re-rank of the per-query shortlist confines the
    * approximation to shortlist membership, as in [[pqTopK]]. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String, k: Int,
                nLists: Int = 16, nProbe: Int = 4,
                m: Int = 8, ks: Int = 16,
                shortlist: Int = 50, sampleN: Int = 2000,
                iters: Int = 2, seed: Long = 42L): DataFrame = {
    require(nProbe >= 1 && nProbe <= nLists && shortlist >= k)
    val cents = ivfCentroids(corpus, idCol, vecCol, nLists, iters, seed)
    val codebooks = pqCodebooks(corpus, idCol, vecCol, m, ks, sampleN,
      math.max(iters, 3), seed)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val index = c.select(col("id"),
      nearestCentroid(col("v"), cents).as("cid"),
      GraftExpressions.pqEncode(col("v"), codebooks).as("code"))
    ivfPqQuery(index, cents, codebooks, Some(c),
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      k, nProbe, m, ks, shortlist)
  }

  /** The probe → ADC-shortlist → exact-re-rank pipeline shared by the
    * build-inline [[ivfPqTopK]] and the amortized [[ivfPqTopKFromIndex]]:
    * identical inputs produce identical results, which is what lets the
    * persisted-index gate reuse the inline path's oracle. `reRank` is the
    * (id, v) source for the exact pass; `None` = ADC-only mode (the
    * shortlist IS the answer, ranked by the approximate score in column
    * `adc`). */
  private def ivfPqQuery(index: DataFrame, cents: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], reRank: Option[DataFrame],
      queries: DataFrame, k: Int, nProbe: Int,
      m: Int, ks: Int, shortlist: Int): DataFrame = {
    val centLit = typedlit(cents.toSeq.zipWithIndex.map {
      case (v, i) => (i, v.toSeq)
    })
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cid").asc)
    val probes = queries
      .select(col("query_id"), col("qv"), explode(centLit).as("c"))
      .select(col("query_id"), col("qv"), col("c._1").as("cid"),
        GraftExpressions.cosineSimilarity(col("c._2"), col("qv")).as("ccos"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("cid"),
        GraftExpressions.pqTable(col("qv"), codebooks).as("tbl"))
    val adcW = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("id").asc)
    // duplicate shortlist ids (a replayed index append stores the same
    // (id, code) twice) are collapsed AFTER the shortlist cut — the
    // deduplicating shuffle then touches <= |Q|*shortlist rows, not the
    // full probed scan; the only cost of a replay is a slightly
    // shallower effective shortlist, never a duplicated result slot.
    // max(adc) (not dropDuplicates' arbitrary row) keeps the collapse
    // DETERMINISTIC even if an id was re-appended with a drifted code.
    val scored = index.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        GraftExpressions.pqAdcScore(col("code"), col("tbl"), m, ks).as("adc"))
      .withColumn("r", row_number().over(adcW))
      .filter(col("r") <= shortlist)
      .groupBy(col("query_id"), col("id"))
      .agg(max(col("adc")).as("adc"))
    reRank match {
      case Some(vecs) =>
        // duplicate (id, v) rows (a replayed append stored an id's vector
        // twice, possibly DRIFTED): score every copy and keep
        // max(cosine) — deterministic like the max(adc) collapse above,
        // where dropDuplicates("id") would pick an arbitrary copy; the
        // collapsing shuffle touches only the joined shortlist rows
        val exact = scored.select(col("query_id"), col("id"))
          .join(vecs, Seq("id"))
          .join(broadcast(queries), Seq("query_id"))
          .select(col("query_id"), col("id"),
            round(GraftExpressions.cosineSimilarity(col("qv"), col("v")), 6)
              .as("cosine"))
          .groupBy(col("query_id"), col("id"))
          .agg(max(col("cosine")).as("cosine"))
        topK(exact, k)
      case None =>
        // ADC-only: re-rank the deduplicated shortlist (the pre-dedup r
        // may skip values once a duplicate is dropped)
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("adc").desc, col("id").asc)
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .select(col("query_id"), col("rank"), col("id"),
            round(col("adc"), 6).as("adc"))
    }
  }

  /** Builds the IVF-PQ index ONCE and persists it — at 100 TB the build
    * (centroid training + a full encode pass over every vector) is the
    * expensive stage, and rebuilding it per query batch (what the inline
    * [[ivfPqTopK]] does) throws that work away. Layout under `path`:
    *
    *  - `codes/` — the (id, code) frame as parquet, PARTITIONED BY cid:
    *    a query batch probing nProbe of nLists lists prunes the scan to
    *    those directories (verified partition pruning, not just a filter);
    *  - `centroids/` — (cid, v): nLists rows, the coarse quantizer;
    *  - `codebooks/` — (sub, code, v): m × ks rows, the PQ codebooks.
    *
    *  - `vectors/` — (id, v), also PARTITIONED BY cid (when
    *    `persistVectors`, the default): the exact re-rank reads ONLY the
    *    probed partitions. Without it, re-rank must join the shortlist
    *    back to the raw corpus — at 100 TB that is a full corpus scan per
    *    query batch, which is exactly the cost this index exists to
    *    avoid. FAISS stores the vectors inside the IVF lists for the same
    *    reason; this is the parquet rendition of that layout.
    *
    * The sidecars are small by construction (nLists + m·ks rows) — the
    * same bounded-driver-collect contract as [[ivfCentroids]]. With
    * `persistVectors` the build costs one extra map-only corpus pass
    * (assign + write; no shuffle) and stores dim·8 bytes/row next to the
    * 8-byte codes — the classic FAISS trade: pay storage once, never
    * rescan the corpus at query time. */
  def buildIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                      path: String,
                      nLists: Int = 16, m: Int = 8, ks: Int = 16,
                      sampleN: Int = 2000, iters: Int = 2,
                      seed: Long = 42L,
                      persistVectors: Boolean = true): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = ivfCentroids(corpus, idCol, vecCol, nLists, iters, seed)
    val codebooks = pqCodebooks(corpus, idCol, vecCol, m, ks, sampleN,
      math.max(iters, 3), seed)
    corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"),
        nearestCentroid(col("v"), cents).as("cid"),
        GraftExpressions.pqEncode(col("v"), codebooks).as("code"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/codes")
    if (persistVectors)
      corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
        .select(col("id"), col("v"), nearestCentroid(col("v"), cents).as("cid"))
        .write.mode("overwrite").partitionBy("cid").parquet(s"$path/vectors")
    cents.zipWithIndex.toSeq.map { case (v, i) => (i, v.toSeq) }
      .toDF("cid", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    codebooks.zipWithIndex.toSeq.flatMap { case (book, sub) =>
      book.zipWithIndex.map { case (v, code) => (sub, code, v.toSeq) }
    }.toDF("sub", "code", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Queries a persisted IVF-PQ index: loads the two tiny sidecars to the
    * driver (nLists + m·ks rows), computes the probed list ids, and scans
    * ONLY those cid partitions of `codes/` — the parquet scan carries
    * `PartitionFilters: cid IN (...)`, so at 100 TB the I/O is
    * ~nProbe/nLists of the index, and the index itself is ~dim·4/8 bytes
    * smaller per row than the raw vectors.
    *
    * Exact re-rank reads the index's own `vectors/` layout when present,
    * pruned to the SAME probed partitions (plan-asserted in
    * PipelineOpsSpec) — the shortlist's true vectors live in the probed
    * lists by construction, so no other partition can be needed. When the
    * index was built with `persistVectors = false`:
    *  - `adcOnly = true` skips the exact re-rank and returns the
    *    ADC-approximate ranking (column `adc` instead of `cosine`) — the
    *    scale path when storing vectors twice is unacceptable;
    *  - otherwise `corpus` is the re-rank source, which at 100 TB streams
    *    the FULL corpus under the shortlist join — correct, but the cost
    *    the persisted layout exists to avoid; reserve it for small
    *    corpora. */
  def ivfPqTopKFromIndex(indexPath: String,
                         corpus: DataFrame, queries: DataFrame,
                         idCol: String, vecCol: String, k: Int,
                         nProbe: Int = 4, shortlist: Int = 50,
                         adcOnly: Boolean = false): DataFrame = {
    require(shortlist >= k)
    val spark = corpus.sparkSession
    val (cents, codebooks) = loadIndexSidecars(spark, indexPath)
    val m = codebooks.length
    val ks = codebooks.head.length
    require(nProbe >= 1 && nProbe <= cents.length)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // the probed lists across the whole query batch: ≤ nLists values,
    // collected so the scans below are PARTITION-pruned reads, not
    // full-index scans with a post-filter
    val probedCids = probeCids(q, cents, nProbe)
    val index = spark.read.parquet(s"$indexPath/codes")
      .filter(col("cid").isin(probedCids: _*))
    val vectorsPath = new org.apache.hadoop.fs.Path(s"$indexPath/vectors")
    val hasVectors = vectorsPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(vectorsPath)
    val reRank =
      if (adcOnly) None
      else if (hasVectors)
        Some(spark.read.parquet(s"$indexPath/vectors")
          .filter(col("cid").isin(probedCids: _*))
          .select(col("id"), col("v")))
      else Some(corpus.select(col(idCol).as("id"), col(vecCol).as("v")))
    ivfPqQuery(index, cents, codebooks, reRank,
      q, k, nProbe, m, ks, shortlist)
  }

  /** Load the two tiny sidecars to the driver (nLists + m·ks rows — the
    * bounded-collect contract of the index layout). */
  private def loadIndexSidecars(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val cents: Array[Array[Double]] =
      graft.util.DriverBound.collectBounded(
          spark.read.parquet(s"$indexPath/centroids").orderBy(col("cid")),
          65536, s"index centroids at $indexPath")
        .map(_.getAs[Seq[Double]]("v").toArray)
    val books = graft.util.DriverBound.collectBounded(
      spark.read.parquet(s"$indexPath/codebooks"),
      8 * 256, s"index codebooks at $indexPath")
      .map(r => (r.getAs[Int]("sub"), r.getAs[Int]("code"),
        r.getAs[Seq[Double]]("v").toArray))
    val m = books.map(_._1).max + 1
    val ks = books.map(_._2).max + 1
    val codebooks = Array.tabulate(m, ks)((s, c) =>
      books.find(b => b._1 == s && b._2 == c).get._3)
    (cents, codebooks)
  }

  /** Append new vectors to a persisted IVF-PQ index with its EXISTING
    * coarse quantizer and codebooks — the FAISS `add` operation: one
    * map-only encode pass over the batch, appending only to the cid
    * partitions the new vectors land in; nothing existing is rewritten
    * and no retraining happens. This is what makes the index a GROWABLE
    * structure for continuous ingestion (pair with the incremental dedup
    * indexes): daily embeddings append in O(batch), queries stay
    * partition-pruned. Quantization quality for appended vectors rides
    * the ORIGINAL training sample — re-train with [[buildIvfPqIndex]]
    * when the embedding distribution drifts (same rebuild cadence FAISS
    * recommends). Appends also land in `vectors/` when the index stores
    * vectors, so exact re-rank covers appended rows. */
  def appendToIvfPqIndex(newVectors: DataFrame, idCol: String,
                         vecCol: String, path: String): Unit = {
    val spark = newVectors.sparkSession
    val (cents, codebooks) = loadIndexSidecars(spark, path)
    val assigned = newVectors.select(col(idCol).as("id"), col(vecCol).as("v"))
    // vectors BEFORE codes: only codes/ drives shortlist membership, so a
    // crash between the writes leaves orphan vector rows (never probed,
    // harmless) instead of code rows whose exact re-rank join would
    // silently DROP a shortlisted neighbor. A replayed append duplicates
    // (id, code) rows; the query path deduplicates shortlist ids, so
    // replays cost bytes, never result slots.
    val vectorsPath = new org.apache.hadoop.fs.Path(s"$path/vectors")
    if (vectorsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(vectorsPath))
      assigned.select(col("id"), col("v"),
          nearestCentroid(col("v"), cents).as("cid"))
        .write.mode("append").partitionBy("cid").parquet(s"$path/vectors")
    assigned.select(col("id"),
        nearestCentroid(col("v"), cents).as("cid"),
        GraftExpressions.pqEncode(col("v"), codebooks).as("code"))
      .write.mode("append").partitionBy("cid").parquet(s"$path/codes")
  }

  /** Distinct list ids any query in the batch probes — bounded by nLists. */
  private def probeCids(q: DataFrame, cents: Array[Array[Double]],
      nProbe: Int): Seq[Int] = {
    val centLit = typedlit(cents.toSeq.zipWithIndex.map {
      case (v, i) => (i, v.toSeq)
    })
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cid").asc)
    q.select(col("query_id"), col("qv"), explode(centLit).as("c"))
      .select(col("query_id"), col("c._1").as("cid"),
        GraftExpressions.cosineSimilarity(col("c._2"), col("qv")).as("ccos"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select(col("cid")).distinct()
      .limit(cents.length).collect().map(_.getInt(0)).toSeq
  }

  /** Robust per-group centroid outlier scoring — the embedding-space
    * curation step that flags off-topic/mislabeled documents: each
    * vector's cosine DISTANCE to its group's per-dimension MEDIAN
    * centroid. Median, not mean, for two reasons: (a) robustness — the
    * centroid of a contaminated group should not chase its own outliers
    * (the classic robust-statistics argument); (b) determinism — an
    * exact median is an order statistic, reproducible bit-for-bit
    * regardless of aggregation order, while a mean of floats depends on
    * shuffle-order summation. Float32 values interpolate exactly in
    * double (24-bit mantissas; sums/halving are exact), so the Spark
    * `percentile(_, 0.5)` and DuckDB `median` agree to the last bit.
    *
    * Returns (idCol, grpCol, dist double rounded to 6 dp), dist in
    * [0, 2]; high = far from the group's consensus direction. Callers
    * threshold or top-k downstream (total-ordered by (dist, id)).
    *
    * Scale shape: the explode shuffles n·d (group, dim, value) rows
    * into a map-combinable exact-percentile aggregate (Spark's
    * percentile partial-aggregates value→count maps — bounded when
    * embeddings are quantized; substitute approx_percentile at extreme
    * cardinality, trading the bit-exact oracle); centroids are
    * |groups|·d doubles and broadcast back; the scoring pass is one
    * codegen'd expression per row. Nothing is O(n²). */
  def centroidOutlierScores(df: DataFrame, idCol: String, vecCol: String,
                            grpCol: String): DataFrame = {
    val dims = df.select(col(grpCol).as("__g"),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("__i", "__x")))
    val med = dims.groupBy(col("__g"), col("__i"))
      .agg(expr("percentile(__x, 0.5)").as("__m"))
    val cents = med.groupBy(col("__g"))
      .agg(array_sort(collect_list(struct(col("__i"), col("__m"))))
        .getField("__m").as("__cent"))
    df.join(broadcast(cents), col(grpCol) === col("__g"))
      .select(col(idCol), col(grpCol),
        round(lit(1.0) - GraftExpressions.cosineSimilarity(
          col(vecCol), col("__cent")), 6).as("dist"))
  }

  /** Robust per-dimension feature scaling for embedding columns — the
    * RobustScaler transform ((x − median) / IQR per dimension), which
    * unlike mean/std scaling is not dragged by the heavy-tailed
    * dimensions embedding models routinely produce. All three statistics
    * are exact order statistics (median, p25, p75 at the (n−1)·q
    * interpolation both Spark's `percentile` and DuckDB's
    * `quantile_cont` use), and float32 inputs interpolate exactly in
    * double at q ∈ {.25, .5, .75} (power-of-two fractions), so the
    * scaling constants are bit-identical across engines. Degenerate
    * dimensions (IQR 0) scale by 1 — centered but not stretched.
    *
    * Returns (idCol, vecCol array<double> scaled). Same percentile
    * scale shape as [[centroidOutlierScores]]: explode → map-combinable
    * exact-percentile aggregate → d-row stats broadcast back →
    * codegen'd per-row transform. */
  def robustScaleVectors(df: DataFrame, idCol: String,
                         vecCol: String): DataFrame = {
    val dims = df.select(
      posexplode(col(vecCol).cast("array<double>")).as(Seq("__i", "__x")))
    val stats = dims.groupBy(col("__i"))
      .agg(expr("percentile(__x, 0.5)").as("__med"),
        (expr("percentile(__x, 0.75)") - expr("percentile(__x, 0.25)"))
          .as("__iqr"))
    val cents = stats.agg(
      array_sort(collect_list(struct(col("__i"), col("__med"))))
        .getField("__med").as("__meds"),
      array_sort(collect_list(struct(col("__i"),
        when(col("__iqr") === 0.0, 1.0).otherwise(col("__iqr")).as("__s"))))
        .getField("__s").as("__iqrs"))
    df.crossJoin(broadcast(cents))
      .select(col(idCol),
        expr(s"zip_with($vecCol, sequence(1, size($vecCol)), " +
          "(x, i) -> (cast(x AS double) - element_at(__meds, i)) " +
          "/ element_at(__iqrs, i))").as(vecCol))
  }

  /** 1-bit binary-quantized ANN: candidates by Hamming distance over
    * sign-packed codes, exact cosine re-rank on the survivors.
    *
    * Pass 1 moves ONLY (query_id, id, hamming) through the per-query
    * ranking window — 20 bytes a row instead of the full vector, and the
    * distance itself is popcount-XOR on ceil(dim/64) longs (SignPack /
    * HammingDistance, both codegen'd). Pass 2 joins the tiny survivor set
    * (|queries| × rerank rows) back to the corpus by id — AQE plans it as
    * a broadcast join against the corpus scan, so the corpus is never
    * shuffled and float math runs on survivors only. At 100 TB the codes
    * column is the thing you'd persist (32× smaller than float32 vectors);
    * this operator reads vectors twice only because it derives codes
    * inline.
    *
    * Ranking is deterministic both passes: Hamming ties break on id asc
    * (so the candidate pool is engine-independent), final rank is
    * (cosine desc, id asc). Self-matches are excluded. `rerank` >= k
    * controls the recall/cost trade: recall@k rises with rerank/k exactly
    * as in the binary-quantization literature (bit flips are θ/π per
    * hyperplane). */
  def signBitTopK(corpus: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String, k: Int,
                  rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank pool ($rerank) must cover k ($k)")
    val c = corpus.select(col(idCol).as("id"),
      GraftExpressions.signPack(col(vecCol)).as("code"))
    val q = queries.select(col(idCol).as("query_id"),
      GraftExpressions.signPack(col(vecCol)).as("qcode"))
    val pool = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        GraftExpressions.hammingDistance(col("qcode"), col("code")).as("hamming"))
    val hw = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("id").asc)
    val survivors = pool.withColumn("__hr", row_number().over(hw))
      .filter(col("__hr") <= rerank)
      .drop("__hr")
    // exact re-rank: survivors are small — broadcast them at the corpus
    // and query vectors (never the other way round)
    val cv = corpus.select(col(idCol).as("id"), col(vecCol).as("__cv"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val rescored = cv.join(broadcast(survivors), Seq("id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("id"), col("hamming"),
        round(GraftExpressions.cosineSimilarity(col("__qv"), col("__cv")), 6)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("hamming"), col("cosine"))
  }

  /** Matryoshka-truncation ANN (Kusupati et al. 2022, arXiv:2205.13147):
    * candidate generation on the FIRST `dims` components only, exact
    * full-dimension cosine re-rank on the survivors. MRL-trained
    * embeddings pack coarse semantics into the prefix, so the truncated
    * cosine preserves neighborhood order well enough that a small
    * `rerank` pool recovers the full-dim top-k at `dims/d` of the float
    * math and memory traffic — the third compression lever next to int8
    * codes and sign bits, and the one that needs no codebook at all.
    *
    * Same two-pass shape as [[signBitTopK]]: pass 1 moves only
    * (query_id, id, trunc_cosine) through the per-query window; pass 2
    * broadcasts the survivor set back at the corpus scan. Both rankings
    * are deterministic (score desc, id asc; scores round(6)). */
  def matryoshkaTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     dims: Int, rerank: Int): DataFrame = {
    require(dims >= 1, s"dims must be >= 1: $dims")
    require(rerank >= k, s"rerank pool ($rerank) must cover k ($k)")
    val c = corpus.select(col(idCol).as("id"),
      slice(col(vecCol), 1, dims).as("tv"))
    val q = queries.select(col(idCol).as("query_id"),
      slice(col(vecCol), 1, dims).as("qtv"))
    val pool = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        round(GraftExpressions.cosineSimilarity(col("qtv"), col("tv")), 6)
          .as("trunc_cosine"))
    val tw = Window.partitionBy(col("query_id"))
      .orderBy(col("trunc_cosine").desc, col("id").asc)
    val survivors = pool.withColumn("__tr", row_number().over(tw))
      .filter(col("__tr") <= rerank)
      .drop("__tr")
    val cv = corpus.select(col(idCol).as("id"), col(vecCol).as("__cv"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val rescored = cv.join(broadcast(survivors), Seq("id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("id"), col("trunc_cosine"),
        round(GraftExpressions.cosineSimilarity(col("__qv"), col("__cv")), 6)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"),
        col("trunc_cosine"), col("cosine"))
  }

  /** Scalar-quantized int8 two-stage retrieval — the fourth compression
    * lever next to sign bits ([[signBitTopK]]), prefix truncation
    * ([[matryoshkaTopK]]) and PQ codebooks: vectors quantize to 8-bit
    * codes `c_d = (⌊x_d·10⁶⌋ · 127) div S` with ONE global scale
    * `S = max |⌊x·10⁶⌋|` over the corpus (per-dim scales would buy
    * little on whitened embeddings and cost an extra join per scan), and
    * candidates rank by the EXACT INTEGER dot product of the codes — no
    * float in the hot loop, bit-identical in any engine, 4× less memory
    * traffic than f32 scans. Survivors (`rerank` per query) get the
    * exact full-precision cosine; final rank (cosine desc, id).
    *
    * Scale shape: identical to [[signBitTopK]] — pass 1 moves only
    * (query_id, id, dot8) longs through the per-query window over a
    * map-only scan of the code table (in production the codes persist
    * as a column; here they derive in the scan), pass 2 broadcasts the
    * tiny survivor set back at the corpus. The scale S is a single
    * scalar aggregate collected once. Output (query_id, rank, id, dot8,
    * cosine). */
  def sq8TopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank pool ($rerank) must cover k ($k)")
    def micro(c: Column) = transform(c,
      x => floor(x.cast("double") * lit(1000000.0)).cast("long"))
    val s = corpus.select(
        aggregate(micro(col(vecCol)), lit(0L),
          (acc, x) => greatest(acc, abs(x))).as("__m"))
      .agg(max(col("__m"))).head().getLong(0)
    require(s >= 1L, s"corpus max |component| quantized to $s — all-zero?")
    def codes(c: Column) = transform(micro(c),
      x => call_function("div", x * lit(127L), lit(s)))
    val c = corpus.select(col(idCol).as("id"), codes(col(vecCol)).as("code"))
    val q = queries.select(col(idCol).as("query_id"),
      codes(col(vecCol)).as("qcode"))
    val pool = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        aggregate(zip_with(col("qcode"), col("code"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("dot8"))
    val dw = Window.partitionBy(col("query_id"))
      .orderBy(col("dot8").desc, col("id").asc)
    val survivors = pool.withColumn("__dr", row_number().over(dw))
      .filter(col("__dr") <= rerank)
      .drop("__dr")
    val cv = corpus.select(col(idCol).as("id"), col(vecCol).as("__cv"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val rescored = cv.join(broadcast(survivors), Seq("id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("id"), col("dot8"),
        round(GraftExpressions.cosineSimilarity(col("__qv"), col("__cv")), 6)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("dot8"),
        col("cosine"))
  }

  /** Asymmetric sign-bit retrieval — the "asymmetric hashing" upgrade
    * of [[signBitTopK]] (Gordo et al., TPAMI 2014 asymmetric distances;
    * the RaBitQ/ADC discipline): the CORPUS stays 1-bit (sign per
    * dimension — the same 32× memory cut), but the QUERY keeps its full
    * precision, scoring candidates by `Σ_d q_d · sign(c_d)` instead of
    * popcount-Hamming. Magnitude information in the query survives —
    * dimensions where the query is strong dominate the score — which is
    * exactly what symmetric Hamming throws away; same memory, strictly
    * better candidate ordering. The score is an EXACT integer
    * (micro-floor query components × ±1), bit-identical in any engine;
    * survivors get the exact full-precision cosine.
    *
    * Scale shape: identical to [[signBitTopK]]/[[sq8TopK]] — pass 1
    * broadcasts the micro query rows across the corpus sign scan with a
    * partial WindowGroupLimit (≤ rerank rows per query leave the map
    * side; in production the signs persist as the stored column), pass
    * 2 re-ranks the broadcast survivor set. Output (query_id, rank, id,
    * asym_score, cosine). */
  def asymmetricSignTopK(corpus: DataFrame, queries: DataFrame,
                         idCol: String, vecCol: String, k: Int,
                         rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank pool ($rerank) must cover k ($k)")
    def micro(c: Column) = transform(c,
      x => floor(x.cast("double") * lit(1000000.0)).cast("long"))
    def signs(c: Column) = transform(c,
      x => when(x.cast("double") >= 0.0, lit(1L)).otherwise(lit(-1L)))
    val cs = corpus.select(col(idCol).as("id"), signs(col(vecCol)).as("sg"))
    val q = queries.select(col(idCol).as("query_id"),
      micro(col(vecCol)).as("qm"))
    val pool = cs.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        aggregate(zip_with(col("qm"), col("sg"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("asym_score"))
    val dw = Window.partitionBy(col("query_id"))
      .orderBy(col("asym_score").desc, col("id").asc)
    val survivors = pool.withColumn("__dr", row_number().over(dw))
      .filter(col("__dr") <= rerank)
      .drop("__dr")
    val cv = corpus.select(col(idCol).as("id"), col(vecCol).as("__cv"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val rescored = cv.join(broadcast(survivors), Seq("id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("id"), col("asym_score"),
        round(GraftExpressions.cosineSimilarity(col("__qv"), col("__cv")), 6)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("asym_score"),
        col("cosine"))
  }

  /** Deterministic per-query top-k: rank on (cosine desc, id asc) so ties
    * are stable across engines. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("cosine"))
  }

  // --- Navigable-small-world graph ANN (Malkov & Yashunin's NSW layer,
  // re-expressed as batch joins: the graph is a persisted table, search
  // is a fixed number of expand-score-prune rounds) -----------------------

  /** Batch-build a k-NN adjacency graph — the NSW base layer: every
    * vector keeps its `m` nearest neighbors among candidates proposed by
    * shared IVF cells. Each vector multi-assigns to its `nProbe` nearest
    * of `nLists` centroids (multi-probe is the long-link device: border
    * vectors join the neighboring cell's candidates, which is what makes
    * greedy search cross cell boundaries), candidate pairs generate only
    * WITHIN a shared cell — the SemDeDup shape, never a cartesian — and
    * per-node top-m is one window over (cosine round6 desc, id).
    *
    * `nLists = 1` degenerates to the EXACT global kNN graph (all pairs
    * share the one cell) — O(n²) scoring, which is the oracle-able gate
    * configuration; at scale use nLists ≈ √n so candidate volume is
    * ~n²·nProbe/nLists. Returns (id, rank 1..m, neighbor, cosine
    * round6) — a bucketed-table-friendly persisted adjacency. */
  def nswGraph(corpus: DataFrame, idCol: String, vecCol: String,
               m: Int = 8, nLists: Int = 16, nProbe: Int = 2,
               iters: Int = 2, seed: Long = 42L): DataFrame = {
    require(m >= 1 && nProbe >= 1 && nProbe <= nLists)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val cells: DataFrame =
      if (nLists == 1) c.withColumn("cid", lit(0))
      else {
        val cents = ivfCentroids(corpus, idCol, vecCol, nLists, iters, seed)
        val centLit = typedlit(cents.toSeq.zipWithIndex.map {
          case (v, i) => (i, v.toSeq)
        })
        val w = Window.partitionBy(col("id"))
          .orderBy(col("ccos").desc, col("cid").asc)
        c.select(col("id"), col("v"), explode(centLit).as("c"))
          .select(col("id"), col("v"), col("c._1").as("cid"),
            GraftExpressions.cosineSimilarity(col("c._2"), col("v")).as("ccos"))
          .withColumn("pr", row_number().over(w))
          .filter(col("pr") <= nProbe)
          .select(col("id"), col("v"), col("cid"))
      }
    // nLists == 1 constant-folds the cid equi-key away and the planner
    // emits a BroadcastNestedLoopJoin whose STREAM side is the raw scan
    // — one input split at gate scale, so the whole O(n²) scoring ran in
    // ONE task while every other core idled (guide §2.5 input skew / §3
    // exploding join; measured 4.1 s single-task at 2000 vectors).
    // Hash-repartitioning the stream side by id spreads the quadratic
    // work across the session's shuffle partitions (scale-adaptive: the
    // conf, not a constant) — with an EXPLICIT partition count, because
    // AQE's byte-based coalescing sees a sub-MB exchange and would fold
    // it back to one partition, blind to the O(n²) join output behind
    // it. The pair SET is unchanged. Real multi-list builds keep their
    // equi-join shape and need no spread.
    val shufflePartitions =
      corpus.sparkSession.sessionState.conf.numShufflePartitions
    val basePartitions =
      if (nLists == 1) c.rdd.getNumPartitions.max(1) else 1
    val a = (if (nLists == 1) cells.repartition(shufflePartitions, col("id"))
             else cells)
      .select(col("cid"), col("id"), col("v"))
    val b = cells.select(col("cid"), col("id").as("nb"), col("v").as("nv"))
    // cosine is symmetric: score each unordered pair ONCE (id < nb) and
    // mirror it — half the fused-cosine work and half the rows into the
    // dedup, with the mirror a map-side union, no extra exchange
    val half = a.join(b, Seq("cid"))
      .filter(col("id") < col("nb"))
      .select(col("id"), col("nb"),
        round(GraftExpressions.cosineSimilarity(col("v"), col("nv")), 6)
          .as("cosine"))
    // two shared cells must not duplicate a candidate pair; dedup the
    // NARROW scored rows (same pair → same rounded cosine), not the
    // vector-carrying frame. At nProbe = 1 every node lives in exactly
    // one cell, a pair can only meet once, and the distinct would be a
    // pure full-shuffle tax on the widest frame of the build — skip it.
    val dedupedHalf = if (nProbe > 1) half.distinct() else half
    // mirror by exploding both directions out of ONE row — a self-union
    // would recompute the scored-join subtree for the second branch
    val pairs = dedupedHalf.select(explode(array(
        struct(col("id"), col("nb"), col("cosine")),
        struct(col("nb").as("id"), col("id").as("nb"), col("cosine"))))
        .as("p"))
      .select(col("p.id").as("id"), col("p.nb").as("nb"),
        col("p.cosine").as("cosine"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("cosine").desc, col("nb").asc)
    val out = pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= m)
      .select(col("id"), col("rank"), col("nb").as("neighbor"), col("cosine"))
    // The spread above parallelizes the O(n²) SCORING stage, but it also
    // leaves the final n·m-row adjacency spread over shuffle-partitions
    // many partitions — and the search/insert walks that consume a
    // (checkpointed) adjacency then pay partitions-many tasks per
    // expand round on frames of a few thousand rows (measured +1.7 s on
    // the hnsw insert gate). Compact the SMALL result back to the
    // input's own parallelism with an explicit (tiny: n·m narrow rows)
    // exchange — NOT coalesce, which would collapse the ranking window's
    // stage (the one that ranks all n²/2 scored pairs) into one task.
    // The multi-list scale path is untouched.
    if (nLists == 1) out.repartition(basePartitions) else out
  }

  /** Beam search over a [[nswGraph]] adjacency — greedy graph descent as
    * `rounds` expand-score-prune iterations, each a join against the
    * persisted adjacency plus one per-query top-`beam` window:
    *
    *  1. seed: the `entries` smallest corpus ids (deterministic, no RNG)
    *     scored against every query, pruned to the beam;
    *  2. round: frontier = beam ∪ neighbors-of-beam (one equi-join on
    *     the adjacency's node id), dedup, score vs the query, keep
    *     top-beam by (cosine round6 desc, id);
    *  3. answer: top-k of the final beam.
    *
    * The adjacency is SYMMETRIZED before walking (out-edges ∪ reversed
    * in-edges, distinct) — NSW's graph is undirected, and on
    * concentrated high-dim data a directed kNN graph strands the walk
    * in sink neighborhoods (measured: 66% → 84% recall on the gate
    * corpus from this alone).
    *
    * Per-round cost is |queries|·beam·m narrow rows — independent of
    * corpus size, which is the point: the corpus is touched only through
    * the adjacency table and the id-keyed vector lookups. All tiebreaks
    * are total orders, so the walk is deterministic and SQL-replayable
    * round by round. The query's own vector (same id) is excluded from
    * every beam, matching [[bruteForceTopK]]. */
  def nswBeamSearch(adj: DataFrame, corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    beam: Int = 8, rounds: Int = 3,
                    entries: Int = 4): DataFrame = {
    require(k >= 1 && beam >= k && rounds >= 0 && entries >= 1)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val ent = c.orderBy(col("id").asc).limit(entries).select(col("id"))
    val adjN = symmetrized(adj)
    val seed = topBeam(scoreIds(
      q.select(col("query_id")).crossJoin(broadcast(ent)), c, q), beam)
      .localCheckpoint()
    topK(beamWalk(adjN, c, q, seed, beam, rounds), k)
  }

  /** Score (query_id, id) candidate rows against the corpus vectors:
    * one id-keyed lookup join for the vector, one query join, round-6
    * cosine; the query's own id is excluded (matches
    * [[bruteForceTopK]]). */
  private def scoreIds(ids: DataFrame, c: DataFrame,
                       q: DataFrame): DataFrame = ids
    .join(c, Seq("id"))
    .join(q, Seq("query_id"))
    .filter(col("id") =!= col("query_id"))
    .select(col("query_id"), col("id"),
      round(GraftExpressions.cosineSimilarity(col("qv"), col("v")), 6)
        .as("cosine"))

  /** Per-query top-`beam` prune by (cosine desc, id) — the walk's one
    * total-ordered tiebreak. */
  private def topBeam(scored: DataFrame, beam: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= beam)
      .select(col("query_id"), col("id"), col("cosine"))
  }

  /** Materialize the symmetrized (undirected) adjacency ONCE: it is
    * joined every round, and when the build arrives as a lazy plan (the
    * common call shape) each round would otherwise re-run the whole
    * k-NN construction. The frame is narrow and bounded (<= 2·m·n
    * rows). */
  private def symmetrized(adj: DataFrame): DataFrame = {
    val adjOut = adj.select(col("id"), col("neighbor"))
    adjOut
      .unionByName(adjOut.select(col("neighbor").as("id"),
        col("id").as("neighbor")))
      .distinct()
      .localCheckpoint()
  }

  /** [[symmetrized]] for a layered adjacency, all levels in ONE
    * materialized pass: the level is part of the distinct key, so
    * filtering the result on `level === l` yields exactly the rows
    * `symmetrized(adj.filter(level === l))` would — one checkpoint
    * action instead of one per layer. */
  private def symmetrizedByLevel(adj: DataFrame): DataFrame = {
    val adjOut = adj.select(col("level"), col("id"), col("neighbor"))
    adjOut
      .unionByName(adjOut.select(col("level"),
        col("neighbor").as("id"), col("id").as("neighbor")))
      .distinct()
      .localCheckpoint()
  }

  /** `rounds` expand-score-prune iterations from an already-scored beam:
    * frontier = beam ∪ neighbors-of-beam (one equi-join on the
    * symmetrized adjacency), dedup, score, keep per-query top-`beam`.
    * The engine behind [[nswBeamSearch]] (one flat layer) and
    * [[hnswSearch]] (one call per descending layer). */
  private def beamWalk(adjN: DataFrame, c: DataFrame, q: DataFrame,
                       seed: DataFrame, beam: Int, rounds: Int): DataFrame = {
    var beamDf = seed
    var r = 0
    while (r < rounds) {
      val frontier = beamDf.select(col("query_id"), col("id"))
        .join(adjN, Seq("id"))
        .select(col("query_id"), col("neighbor").as("id"))
        .unionByName(beamDf.select(col("query_id"), col("id")))
        .distinct()
      beamDf = topBeam(scoreIds(frontier, c, q), beam).localCheckpoint()
      r += 1
    }
    beamDf
  }

  /** Incremental NSW maintenance — the HNSW INSERT step (Malkov &
    * Yashunin 2018 §4, batch-ified): each new vector finds its `m`
    * nearest graph members by the SAME beam walk queries use
    * ([[nswBeamSearch]] with k = m), and joins the graph with edges to
    * them. Existing nodes' stored lists never rewrite — the walk
    * symmetrizes edges, so a new node is reachable through its
    * neighbors' reversed edges immediately (the undirected-NSW
    * discipline this module's search already uses; HNSW's reverse-list
    * pruning exists to bound stored degree, which symmetrization makes
    * unnecessary here). Returns the grown adjacency in [[nswGraph]]'s
    * schema (id, rank, neighbor, cosine) — old rows verbatim plus one
    * row per (new node, rank ≤ m).
    *
    * Scale shape: the batch pays |batch| beam walks against the
    * EXISTING graph — per round one equi-join with the (materialized)
    * adjacency and a per-query top-beam window — and never touches
    * corpus pairs; the append itself is a union. This is the daily-batch
    * cost being O(batch · beam · m), independent of graph size — the
    * same contract as the IVF-PQ map-only append and the incremental
    * dedup indexes. Batch ids must be disjoint from graph ids. */
  def appendToNswGraph(adj: DataFrame, corpus: DataFrame, batch: DataFrame,
                       idCol: String, vecCol: String, m: Int = 4,
                       beam: Int = 8, rounds: Int = 3,
                       entries: Int = 4): DataFrame = {
    val found = nswBeamSearch(adj, corpus, batch, idCol, vecCol,
      k = m, beam = beam, rounds = rounds, entries = entries)
    adj.select(col("id"), col("rank"), col("neighbor"), col("cosine"))
      .unionByName(found.select(col("query_id").as("id"), col("rank"),
        col("id").as("neighbor"), col("cosine")))
  }

  // --- Hierarchical NSW (Malkov & Yashunin 2018, the H in HNSW): a
  // geometric layer hierarchy over the flat NSW graph so search crosses
  // the corpus in O(log n) hops from a fixed entry instead of the flat
  // walk's O(diameter) rounds ---------------------------------------------

  /** Deterministic hash-geometric HNSW level of a node id (the paper's
    * `floor(-ln(unif) · mL)` draw, replayed as arithmetic): level =
    * number of trailing 1-bits of the 60-bit md5 hash of `"hnsw:" + id`,
    * capped at `maxLevel` — P(level ≥ l) = 2^-l, the paper's geometric
    * distribution at mL = 1/ln 2. No RNG: the same id lands on the same
    * level in any engine (`('0x'||substr(md5(...),1,15))::UBIGINT` in
    * DuckDB ≡ `conv(substring(md5(...),1,15),16,10)` here), and levels
    * NEST — membership at l implies membership at every l' < l — which
    * is what lets a descent reuse the upper beam as the lower seed. */
  def hnswLevel(id: Column, maxLevel: Int): Column = {
    require(maxLevel >= 1 && maxLevel <= 30,
      s"maxLevel must be in [1, 30], got $maxLevel")
    val h = conv(substring(md5(concat(lit("hnsw:"), id.cast("string"))
      .cast("binary")), 1, 15), 16, 10).cast("long")
    (1 to maxLevel).foldLeft(lit(0)) { (acc, l) =>
      when(pmod(h, lit(1L << l)) === lit((1L << l) - 1), lit(l))
        .otherwise(acc)
    }
  }

  /** Build the HNSW layer stack: for each level 0..`maxLevel`, the nodes
    * whose [[hnswLevel]] reaches it form a layer, and the layer's
    * adjacency is a [[nswGraph]] over just those members. Levels are
    * geometric, so layer l has ~n/2^l nodes and the whole stack costs
    * < 2× the base layer; layers above 0 are small enough for exact
    * (nLists = 1) builds — only the base layer needs IVF cells at scale.
    * Returns [[nswGraph]]'s schema plus `level`; one persisted table
    * serves every layer (filter on `level` is a cheap scan). */
  def hnswGraph(corpus: DataFrame, idCol: String, vecCol: String,
                m: Int = 8, maxLevel: Int = 2, nLists: Int = 16,
                nProbe: Int = 2, iters: Int = 2,
                seed: Long = 42L): DataFrame = {
    val withL = corpus.withColumn("__lvl", hnswLevel(col(idCol), maxLevel))
    (0 to maxLevel).map { l =>
      val members = withL.filter(col("__lvl") >= l)
      val (nl, np) = if (l == 0) (nLists, nProbe) else (1, 1)
      nswGraph(members, idCol, vecCol, m, nl, np, iters, seed)
        .withColumn("level", lit(l))
    }.reduce(_.unionByName(_))
  }

  /** HNSW search (Malkov & Yashunin 2018 §4 SEARCH-LAYER descent,
    * batch-ified): seed from the `entries` ids ranked by (level DESC,
    * id ASC) — identical to "the smallest top-layer ids" whenever the
    * top layer has ≥ `entries` members, and a deterministic non-empty
    * fallback to lower layers when the geometric draw left the top
    * layer sparse or empty (small corpora / large maxLevel: P(no node
    * at maxLevel) = (1−2^−maxLevel)^n — a silent empty result
    * otherwise). Walk `upperRounds` expand-score-prune rounds per layer from
    * `maxLevel` down to 1 — each layer's final beam seeds the next,
    * sound because levels nest — then run the full `rounds` walk on the
    * base layer and cut top-k. Against the flat [[nswBeamSearch]] the
    * upper layers replace long base-layer crossings: layer l hops span
    * ~2^l base hops, so a fixed entry reaches any neighborhood in
    * O(log n) rounds total instead of O(graph diameter).
    *
    * The full adjacency localCheckpoints ONCE (a lazy [[hnswGraph]]
    * plan must not rebuild per layer filter), then each layer
    * symmetrizes its own narrow slice. Per-round cost stays
    * |queries|·beam·m rows, corpus touched only via id-keyed lookups;
    * every tiebreak is the same total order the flat walk uses, so the
    * descent is deterministic and SQL-replayable layer by layer. */
  def hnswSearch(adj: DataFrame, corpus: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int, maxLevel: Int,
                 beam: Int = 8, rounds: Int = 3, upperRounds: Int = 1,
                 entries: Int = 2): DataFrame = {
    require(k >= 1 && beam >= k && rounds >= 0 && upperRounds >= 0 &&
      entries >= 1 && maxLevel >= 1)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // symmetrize ALL layers in one materialized pass (level rides along
    // in the distinct key): the per-layer shape paid one checkpoint
    // action per layer — maxLevel+2 actions per search — for identical
    // rows, since union+distinct commutes with the level filter. The
    // walk's adjacency join ignores the extra level column.
    val symAll = symmetrizedByLevel(
      adj.select(col("level"), col("id"), col("neighbor")))
    def layer(l: Int): DataFrame = symAll.filter(col("level") === l)
    val entTop = hnswEntries(c, maxLevel, entries)
    var beamDf = topBeam(scoreIds(
      q.select(col("query_id")).crossJoin(broadcast(entTop)), c, q), beam)
      .localCheckpoint()
    var l = maxLevel
    while (l >= 1) {
      beamDf = beamWalk(layer(l), c, q, beamDf, beam, upperRounds)
      l -= 1
    }
    topK(beamWalk(layer(0), c, q, beamDf, beam, rounds), k)
  }

  /** Descent entry points: the `entries` corpus ids ranked by
    * ([[hnswLevel]] DESC, id ASC). Equal to "the `entries` smallest
    * top-layer ids" whenever the top layer is populated, but NEVER
    * empty for a non-empty corpus — a top-layer-only filter silently
    * returned zero search rows (and appended unreachable nodes) when no
    * node drew the top level. One TakeOrderedAndProject over (id,
    * level) — map-side top-n, no shuffle. */
  private def hnswEntries(c: DataFrame, maxLevel: Int,
                          entries: Int): DataFrame =
    c.select(col("id"), hnswLevel(col("id"), maxLevel).as("__lvl"))
      .orderBy(col("__lvl").desc, col("id").asc).limit(entries)
      .select(col("id"))

  /** HNSW INSERT, batch-ified (Malkov & Yashunin 2018 §4 Alg. 1): each
    * new vector draws its deterministic [[hnswLevel]], every batch
    * vector descends from the top entry exactly as [[hnswSearch]] does,
    * and at each layer l ≤ its level it records the top-`m` of its
    * current beam as its layer-l edges — existing nodes' lists never
    * rewrite (the undirected-walk symmetrization makes new nodes
    * reachable through reversed edges immediately, the
    * [[appendToNswGraph]] discipline lifted to the hierarchy). Batch
    * ids must be disjoint from graph ids.
    *
    * Returns the grown adjacency in [[hnswGraph]]'s schema (id, rank,
    * neighbor, cosine, level) — old rows verbatim plus one row per
    * (new node, layer ≤ its level, rank ≤ m). Scale shape: the whole
    * batch pays ONE shared descent (per layer, one adjacency equi-join
    * + one per-query top-beam window on |batch|·beam·m rows) — cost
    * O(batch·beam·m·levels), independent of graph size; the level draw
    * is pure map-side hash arithmetic. */
  def appendToHnswGraph(adj: DataFrame, corpus: DataFrame, batch: DataFrame,
                        idCol: String, vecCol: String, m: Int = 4,
                        maxLevel: Int = 2, beam: Int = 8, rounds: Int = 3,
                        upperRounds: Int = 1, entries: Int = 2): DataFrame = {
    require(m >= 1 && beam >= m && rounds >= 0 && upperRounds >= 0 &&
      entries >= 1 && maxLevel >= 1)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val q = batch.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // one materialized all-layer symmetrization (see [[hnswSearch]])
    val symAll = symmetrizedByLevel(
      adj.select(col("level"), col("id"), col("neighbor")))
    def layer(l: Int): DataFrame = symAll.filter(col("level") === l)
    val entTop = hnswEntries(c, maxLevel, entries)
    val qLvl = batch.select(col(idCol).as("query_id"),
      hnswLevel(col(idCol), maxLevel).as("__lvl"))
    var beamDf = topBeam(scoreIds(
      q.select(col("query_id")).crossJoin(broadcast(entTop)), c, q), beam)
      .localCheckpoint()
    var edges: DataFrame = null
    var l = maxLevel
    while (l >= 0) {
      beamDf = beamWalk(layer(l), c, q, beamDf, beam,
        if (l == 0) rounds else upperRounds)
      val connect = topK(beamDf, m)
        .join(qLvl.filter(col("__lvl") >= l), Seq("query_id"), "left_semi")
        .select(col("query_id").as("id"), col("rank"),
          col("id").as("neighbor"), col("cosine"), lit(l).as("level"))
      edges = if (edges == null) connect else edges.unionByName(connect)
      l -= 1
    }
    adj.select(col("id"), col("rank"), col("neighbor"), col("cosine"),
        col("level"))
      .unionByName(edges)
  }

  /** Margin-based bitext mining (Artetxe & Schwenk, ACL 2019 — the
    * LASER mining objective): score a candidate pair by its cosine
    * NORMALIZED by how similar each side is to its own neighborhood —
    * `margin(x,y) = cos(x,y) / ((avgK(x→R) + avgK(y→L)) / 2)` — then
    * keep pairs that are each other's best margin (mutual-best) above
    * `minMargin`. Raw-cosine thresholds fail on hubness (some vectors
    * are close to everything); the margin cancels it, which is why this
    * is the standard mined-parallel-corpus objective.
    *
    * Determinism: cosines quantize to exact micro-units (round(6)·1e6
    * longs), each side's k-NN denominator is an integer SUM over a
    * total-ordered top-k (ties by neighbor id), and the margin is ONE
    * double division of exact longs — bit-identical in any engine, no
    * float-summation-order drift. Both sides must have ≥ k rows (hard
    * error otherwise: a padded average would silently skew margins).
    *
    * Returns (left_id, right_id, margin round(6)) for mutual-best pairs
    * with margin ≥ minMargin, ordered by left_id.
    *
    * Scale shape: this exact variant broadcasts the RIGHT side (mine a
    * query batch / one shard pair at a time — the [[bruteForceTopK]]
    * discipline); the cross score is map-only, then two per-side top-k
    * windows (keyed, never global) and keyed equi-joins. For unbounded
    * sides, compose with IVF: assign both sides to coarse lists and
    * mine within probed cells, same recall story as [[ivfTopK]]. */
  def mineBitext(left: DataFrame, right: DataFrame,
                 idCol: String, vecCol: String, k: Int,
                 minMargin: Double = 1.0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val l = left.select(col(idCol).as("left_id"), col(vecCol).as("lv"))
    val r = right.select(col(idCol).as("right_id"), col(vecCol).as("rv"))
    val nL = l.count(); val nR = r.count()
    require(nL >= k && nR >= k,
      s"both sides need >= k=$k rows for the k-NN margin; got $nL x $nR")
    val scored = l.crossJoin(broadcast(r))
      .select(col("left_id"), col("right_id"),
        round(round(GraftExpressions.cosineSimilarity(col("lv"), col("rv")), 6)
          * lit(1e6)).cast("long").as("cm"))
    val wf = Window.partitionBy(col("left_id"))
      .orderBy(col("cm").desc, col("right_id").asc)
    val fwd = scored.withColumn("__rn", row_number().over(wf))
      .filter(col("__rn") <= k)
      .groupBy(col("left_id")).agg(sum(col("cm")).as("sl"))
    val wb = Window.partitionBy(col("right_id"))
      .orderBy(col("cm").desc, col("left_id").asc)
    val bwd = scored.withColumn("__rn", row_number().over(wb))
      .filter(col("__rn") <= k)
      .groupBy(col("right_id")).agg(sum(col("cm")).as("sr"))
    val margins = scored
      .join(fwd, Seq("left_id")).join(bwd, Seq("right_id"))
      .select(col("left_id"), col("right_id"),
        (round((lit(2.0 * k) * col("cm")) / (col("sl") + col("sr")), 6)
          + lit(0.0)).as("margin"))
    val bestL = margins.withColumn("__rn", row_number().over(
        Window.partitionBy(col("left_id"))
          .orderBy(col("margin").desc, col("right_id").asc)))
      .filter(col("__rn") === 1).select(col("left_id"), col("right_id"))
    val bestR = margins.withColumn("__rn", row_number().over(
        Window.partitionBy(col("right_id"))
          .orderBy(col("margin").desc, col("left_id").asc)))
      .filter(col("__rn") === 1).select(col("left_id"), col("right_id"))
    margins
      .join(bestL, Seq("left_id", "right_id"), "left_semi")
      .join(bestR, Seq("left_id", "right_id"), "left_semi")
      .filter(col("margin") >= minMargin)
      .orderBy(col("left_id"))
  }
}
