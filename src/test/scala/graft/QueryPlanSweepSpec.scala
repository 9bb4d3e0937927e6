package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine-wide plan invariant over EVERY SparkEntry query: no plan may
  * contain a CartesianProduct — the quadratic, undistributable shape that
  * appears when a join degenerates (e.g. an inequality-only condition).
  * BroadcastNestedLoopJoin is allowed only where it is the deliberate
  * bounded-broadcast design (brute-force similarity scoring broadcasts a
  * small query set against the corpus); everywhere else it flags a join
  * that lost its equi-keys. Runs against sf0.001 so plan construction
  * (which for some queries includes live Derby/Hive/file side effects)
  * stays cheap.
  *
  * Caveat: queries that EXECUTE iterative work at construction time
  * (dedup_components' per-round joins run behind localCheckpoint) expose
  * only their final plan here — their inner join shapes are covered by
  * their own operator specs, not this sweep.
  */
class QueryPlanSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val broadcastNestedLoopAllowed = Set(
    "similarity_topk_brute",  // deliberate: broadcast(queries) cross corpus
    "similarity_topk_signbit", // deliberate: broadcast(query codes) cross
                              // corpus codes — 8 bytes/row, the point
    "similarity_topk_matryoshka", // deliberate: broadcast(truncated
                              // queries) cross truncated corpus
    "similarity_topk_sq8",    // deliberate: broadcast(query int8 codes)
                              // cross corpus codes (Similarity.sq8TopK
                              // pass 1 — the signbit discipline)
    "retrieval_mmr_diversify", // deliberate: broadcast(query codes)
                              // cross corpus for the relevance pool
                              // (Retrieval.mmrDiversify pass 1)
    "similarity_topk_asym",   // deliberate: broadcast(micro queries)
                              // cross the corpus sign scan
                              // (Similarity.asymmetricSignTopK pass 1)
    "similarity_hard_negatives", // same shape: broadcast(anchors) cross
                              // corpus scan (Similarity.mineHardNegatives)
    "similarity_bitext_margin", // deliberate: broadcast(right shard)
                              // cross the left scan (Similarity.mineBitext
                              // — the bruteForceTopK discipline)
    "similarity_triplets",    // same shape: broadcast(anchors) cross the
                              // corpus scan, split by label (mineTriplets)
    "pii_t_closeness",        // deliberate: m-row global-support broadcast
                              // onto the bounded class list (the EMD grid
                              // is |classes|·m, never O(table)); the
                              // constant-key hash join folds to BNLJ
    "pii_t_closeness_cat",    // same grid, categorical variant
    "corpus_drift_js",        // deliberate: 1-row token-totals broadcast
                              // cross the vocab frame (unigramJsDivergence)
    "retrieval_tfidf_terms",  // deliberate: 1-row doc-count N broadcast
                              // cross the tf stream (tfidfTopTerms)
    "corpus_pmi_collocations", // same shape: 1-row token-total N cross
                              // the thresholded pair table (pmiCollocations)
    "tokenizer_coverage_curve", // deliberate: |targets|-row broadcast
                              // inequality-joined to the vocab-sized
                              // running-share frame (coverageCurve)
    "similarity_topk_ivf",    // deliberate: broadcast probe set
    "similarity_topk_lsh",    // deliberate: broadcast query vectors
    "similarity_topk_pq",     // deliberate: broadcast ADC tables cross codes
    "similarity_topk_ivfpq",  // deliberate: gate compares vs broadcast brute
    "similarity_topk_ivfpq_index", // same gate shape: recall vs broadcast brute
    "similarity_topk_rp",     // deliberate: broadcast projected queries cross
                              // the projected corpus (the pre-filter IS the
                              // broadcast-bounded scan), + recall vs brute
    "dedup_embedding_cosine", // gate runs the bruteForce=true oracle path
                              // (all-pairs small-N); LSH is the scale path
    "q22_dormant_customers",  // deliberate: 1-row global-aggregate scalar
                              // broadcast as the acctbal threshold
    "events_dow_profile",     // deliberate: 1-row (total_days, total
                              // events) broadcast onto the 7-row DOW
                              // rollup (Drift.dayOfWeekProfile)
    "quality_unigram_nll",    // deliberate: 1-row corpus-total N broadcast
                              // cross the token stream (Corpus.unigramNll);
                              // O(n) with a single-row build side
    "quality_bigram_nll",     // same shape: 1-row N cross the bigram stream
    "retrieval_bm25",         // deliberate: 1-row (N, avgdl) stats broadcast
                              // cross the candidate stream (Retrieval)
    "retrieval_rocchio_terms", // same shapes: bm25's 1-row stats cross +
                              // the expansion pass's own 1-row N cross
                              // (Retrieval.rocchioExpansionTerms)
    "sample_temperature_mix", // deliberate: 1-row normalizer Z broadcast
                              // cross the |sources|-row count frame
                              // (Sampling.temperatureSampleBySource)
    "sample_doremi_weights",  // same shape: 1-row (Σw', k) normalizer
                              // broadcast cross the |domains|-row frame
                              // (Sampling.doremiWeightUpdate)
    "sample_dsir_weights",    // deliberate: 1-row (N_t, N_r, V) stats
                              // broadcast cross the token stream
                              // (Sampling.dsirWeights)
    "layout_zorder_stats",    // deliberate: 1-row global min/max envelope
                              // broadcast cross the table being clustered
                              // (Layout.zorderBy)
    "layout_hilbert_stats",   // same shape: 1-row min/max envelope
                              // broadcast cross the table (Layout.hilbertBy)
    "embedding_robust_scale", // deliberate: 1-row (meds, iqrs) stats
                              // broadcast cross the vectors
                              // (Similarity.robustScaleVectors)
    "quality_curriculum",     // unigramNll's 1-row corpus-total N
                              // broadcast (same shape as quality_unigram_nll)
    "quality_ccnet_buckets",  // bigramNll's 1-row corpus-total N broadcast
                              // (Corpus.ccnetPerplexityBuckets composes it)
    "quality_trigram_backoff_nll", // same shape: 1-row (N, V) Laplace-floor
                              // totals broadcast cross the test trigram
                              // frame (Corpus.trigramNllBackoff)
    "similarity_nsw_graph"    // deliberate: nLists=1 is the EXACT-graph
                              // oracle configuration — every pair shares
                              // the one cell, the constant-key join folds
                              // to BNLJ (same device as similarity_topk_
                              // ivf's full-probe gate); multi-list builds
                              // plan a real equi-join on cid
    , "similarity_nsw_append" // same device: the appended batch walks the
                              // nLists=1 exact graph (build's constant-key
                              // join + the walk's tiny entries×queries seed)
    , "similarity_hnsw_append" // same device again: the output unions the
                              // LAZY hnswGraph layer stack, whose nLists=1
                              // exact-oracle builds fold their constant-key
                              // joins to BNLJ (hnsw_search escapes the sweep
                              // only because its output roots at the final
                              // checkpointed beam)
    , "retrieval_rrf_fusion"  // deliberate: the fused brute ranking is
                              // bruteForceTopK's tiny-query-side broadcast
                              // cross (the similarity_topk_brute device)
    , "eval_rank_biased_overlap" // same two ranker inputs as rrf_fusion:
                              // brute's query broadcast cross by design
    , "eval_kendall_tau"      // same two ranker inputs again (brute +
                              // signbit pools): the tau comparison itself
                              // is pair joins over the k-row lists
    , "decontaminate_semantic" // deliberate: the exact leak check IS
                              // bruteForceTopK (eval side broadcast,
                              // corpus streamed map-only); the scale
                              // path swaps in hnswSearch/ivfTopK
                              // candidates per the operator scaladoc
    , "sketch_ams_f2"         // deliberate: 1-row median estimate and
                              // 1-row exact-F2 broadcasts cross the
                              // 8-row group-means frame (Sketch.amsF2
                              // — the events_dow_profile device)
    , "corpus_good_turing"    // deliberate: 1-row token-total N
                              // broadcast cross the ≤ maxR-row
                              // count-of-counts frame (goodTuringProfile)
    , "events_periodogram"    // deliberate: 1-row (min day, span)
                              // broadcast cross the daily-count frame
                              // (Drift.dailyPeriodogram)
    , "corpus_burrows_delta"  // deliberate: 30-row top-words broadcast
                              // cross the |sources|-row totals frame —
                              // the zero-completed stylometry grid
    , "graph_modularity"      // deliberate: 1-row edge-total m broadcast
                              // cross the 1-row community aggregate
                              // (Graph.modularity)
    , "embedding_pca_power"   // deliberate: 1-row n / norm / eigenvalue
                              // / trace broadcasts cross the d- and
                              // d²-row frames (VectorStats
                              // .pcaPowerIteration)
    , "corpus_ctfidf_terms"   // deliberate: 1-row source-count broadcast
                              // cross the per-source term frame
                              // (Corpus.cTfIdfTerms)
    , "streaming_periodogram_fold" // events_periodogram's 1-row
                              // (min day, span) broadcast, read off the
                              // maintained register instead of raw ts
  )

  /** Global `OVER (ORDER BY ...)` windows with no PARTITION BY run the
    * whole input through ONE task. The only tolerated site is a window
    * over an already-aggregated, cardinality-bounded frame (q15 ranks
    * |supplier| post-aggregation rows — documented in-line at the query).
    * Everything else must use Ranking.globalRowNumber/globalNtile.
    */
  private val partitionlessWindowAllowed = Set(
    "q15_top_supplier", // rank() over |supplier| aggregated rows (bounded)
    "sketch_ams_f2"     // median row_number over the GROUPS-row (8) means
                        // frame — bounded by the sketch width, never data
  )

  test("no query plans a CartesianProduct; nested-loop only where designed") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val exec =
          try fn(spark, dir).queryExecution.executedPlan
          catch { case e: Throwable => fail(s"$name failed to plan: $e") }
        val plan = exec.toString
        val cartesian = plan.contains("CartesianProduct")
        val nestedLoop = plan.contains("BroadcastNestedLoopJoin") &&
          !broadcastNestedLoopAllowed(name)
        val globalWindow = (exec.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.partitionSpec.isEmpty => w
        }).nonEmpty && !partitionlessWindowAllowed(name)
        if (cartesian) Some(s"$name: CartesianProduct")
        else if (nestedLoop) Some(s"$name: unexpected BroadcastNestedLoopJoin")
        else if (globalWindow) Some(s"$name: single-partition WindowExec (no PARTITION BY)")
        else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
