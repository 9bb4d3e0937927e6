package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full training-data curation RECIPE — the eight-stage composition
  * a real pretraining-data run executes, wired end to end from the
  * library's individually-gated stages:
  *
  *   1. normalize      — crawl HTML → text ([[TextFunctions.stripHtml]])
  *   2. quality cut    — token-count band ([[TextFunctions.tokenCount]])
  *   3. exact dedup    — first occurrence per normalized fingerprint
  *                       ([[Dedup.exactDedup]] semantics, min id wins)
  *   4. near dedup     — WITHIN-source MinHash-LSH pairs, with the
  *                       source IN the band key ([[Dedup.minhashDupPairs]]
  *                       partitionCols — cross-source candidates never
  *                       form or verify; cross-source overlap is the
  *                       next stage's job); the larger id of every
  *                       verified pair drops
  *   5. decontaminate  — (a) verbatim: corpus docs with n-gram Jaccard ≥
  *                       threshold against ANY benchmark-source doc drop,
  *                       and the benchmark source itself leaves the
  *                       training corpus ([[Dedup.crossNgramJaccardPairs]]);
  *                       (b) semantic: paraphrase-level leaks flagged by
  *                       [[Dedup.decontaminateSemantic]] drop
  *   6. temperature mix— per-source share ∝ n^τ under a document budget
  *                       ([[Sampling.temperatureSampleBySource]])
  *   7. leak-free split— chunk FAMILIES (same source, id div familySize —
  *                       the provenance cluster of one crawl record)
  *                       split as a unit ([[Sampling.leakFreeSplit]] over
  *                       star pairs to the family's smallest kept id)
  *   8. pack + shard   — head+tail truncation to the context window
  *                       ([[Packing.truncateHeadTail]]) and cost-balanced
  *                       shard assignment over the deterministic training
  *                       order ([[Ranking.shardByCostBudget]])
  *
  * Every stage rule is deterministic and SQL-replayable, so ONE oracle
  * can replay the whole chain — the point is pinning the STAGE HANDOFFS
  * (schemas, column contracts, drop rules) that the per-stage gates
  * cannot see. [[curate]]/[[curateWithAudit]] are the BATCH forms (one
  * full-corpus run); [[curateIncremental]] is the daily-ingest form,
  * where the dedup/decontamination stages consult the persisted
  * bucketed indexes instead and append to them.
  *
  * Scale shape: every stage is the already-audited operator — no new
  * shuffles beyond their documented ones; the only all-pairs surface is
  * LSH-candidate verification (stage 4/5a), bounded by band collisions,
  * and the semantic brute-force top-k (stage 5b), bounded by |eval|·|corpus|
  * with k-row state per query.
  *
  * Returns one row per SURVIVING document:
  * (idCol, sourceCol, n_tokens, split, truncated, n_tokens_kept, shard).
  */
object Recipe {

  /** Label the jobs an eager materialization runs (guide §1.5): stage
    * attribution in the UI and in GateProf, at zero plan cost. Job
    * descriptions are thread-local; the previous value is restored so a
    * caller's own label survives. */
  private def labeled[T](spark: org.apache.spark.sql.SparkSession,
                         tag: String)(body: => T): T = {
    val sc = spark.sparkContext
    val old = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(s"recipe: $tag")
    try body finally sc.setJobDescription(old)
  }

  def curate(docs: DataFrame, idCol: String, sourceCol: String,
             textCol: String,
             benchmarkSource: String,
             semanticCorpus: Option[DataFrame] = None,
             semanticEval: Option[DataFrame] = None,
             semanticVecCol: String = "embedding",
             semanticK: Int = 8,
             semanticMinCosine: Double = 0.9,
             semanticMinMargin: Double = 0.2,
             minTokens: Long = 35L, maxTokens: Long = 100L,
             nearThreshold: Double = 0.85,
             contaminationThreshold: Double = 0.7,
             tau: Double = 0.5, budgetDocs: Long = 300L,
             familySize: Long = 50L,
             splits: Seq[(String, Double)] =
               Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
             headTokens: Int = 20, tailTokens: Int = 10,
             shardBudget: Long = 2000L): DataFrame =
    curateWithAudit(docs, idCol, sourceCol, textCol, benchmarkSource,
      semanticCorpus, semanticEval, semanticVecCol, semanticK,
      semanticMinCosine, semanticMinMargin, minTokens, maxTokens,
      nearThreshold, contaminationThreshold, tau, budgetDocs, familySize,
      splits, headTokens, tailTokens, shardBudget)._1

  /** [[curate]] plus the DROP LEDGER — the funnel report that answers
    * the first question every real curation run gets: "why did my
    * document disappear?". Returns (survivors, audit) where audit has
    * one row per dropped document: (idCol, sourceCol, stage), stage ∈
    * quality | exact_dup | near_dup | benchmark | contaminated |
    * semantic | mix_budget. A document appears in the audit exactly
    * once (the FIRST stage that dropped it) or in the survivors —
    * never both, never neither (spec-pinned conservation). The ledger
    * derives from the already-materialized stage boundaries, so the
    * marginal cost over [[curate]] is a handful of anti-joins on
    * bounded frames. */
  def curateWithAudit(docs: DataFrame, idCol: String, sourceCol: String,
             textCol: String,
             benchmarkSource: String,
             semanticCorpus: Option[DataFrame] = None,
             semanticEval: Option[DataFrame] = None,
             semanticVecCol: String = "embedding",
             semanticK: Int = 8,
             semanticMinCosine: Double = 0.9,
             semanticMinMargin: Double = 0.2,
             minTokens: Long = 35L, maxTokens: Long = 100L,
             nearThreshold: Double = 0.85,
             contaminationThreshold: Double = 0.7,
             tau: Double = 0.5, budgetDocs: Long = 300L,
             familySize: Long = 50L,
             splits: Seq[(String, Double)] =
               Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
             headTokens: Int = 20, tailTokens: Int = 10,
             shardBudget: Long = 2000L): (DataFrame, DataFrame) = {
    require(minTokens >= 1 && maxTokens >= minTokens,
      s"need 1 <= minTokens <= maxTokens, got [$minTokens, $maxTokens]")
    require(familySize >= 1, s"familySize must be >= 1, got $familySize")
    require(semanticCorpus.isDefined == semanticEval.isDefined,
      "semantic decontamination needs BOTH a corpus and an eval vector set")

    // 1. normalize + 2. quality cut
    val qual = docs
      .withColumn("__t", TextFunctions.stripHtml(col(textCol)))
      .withColumn("n_tokens",
        TextFunctions.tokenCount(col("__t")).cast("long"))
      .filter(col("n_tokens").between(minTokens, maxTokens))
      .select(col(idCol), col(sourceCol), col("__t"), col("n_tokens"))
      // stage-boundary materialization: every stage below references
      // its upstream 2-3 times (dedup pairs join back to the corpus,
      // anti-joins reuse both sides), so an unchecked lineage doubles
      // per stage — the iterative-operator plan-growth lesson applied
      // to a LINEAR pipeline. At real scale swap localCheckpoint for a
      // persisted staging table per stage (also your recovery points).
      .localCheckpoint()

    // 3. exact dedup — smallest id per normalized fingerprint survives
    val exact = qual.join(
      Dedup.exactDedupIds(qual, idCol, "__t").select(col(idCol)),
      Seq(idCol), "left_semi")
      .localCheckpoint()

    // 4. near dedup WITHIN source — the larger id of every verified
    // same-source pair drops (greedy smaller-id-wins; chained families
    // keep exactly their smallest member). The source is IN the LSH
    // band key (partitionCols): cross-source candidates never form or
    // exact-verify, instead of being verified corpus-wide and filtered
    // afterwards — at 100 TB with heavy cross-source mirroring the
    // discarded verification would dominate the stage.
    val nearDrop = Dedup.minhashDupPairs(exact, idCol, "__t",
        shingleSize = 3, bands = 32, rowsPerBand = 4,
        threshold = nearThreshold, partitionCols = Seq(sourceCol))
      .select(col("id2").as(idCol)).distinct()
    val near = exact.join(nearDrop, Seq(idCol), "left_anti")
      .localCheckpoint()

    // 5a. verbatim decontamination — benchmark leaves the corpus; any
    // corpus doc overlapping a benchmark doc at n-gram Jaccard ≥ the
    // threshold leaves with it
    val bench = near.filter(col(sourceCol) === benchmarkSource)
    val corpus = near.filter(col(sourceCol) =!= benchmarkSource)
    val contaminated = Dedup.crossNgramJaccardPairs(corpus, bench,
        idCol, "__t", shingleSize = 3, threshold = contaminationThreshold)
      .select(col("corpus_id").as(idCol)).distinct()
    val decon1 = corpus.join(contaminated, Seq(idCol), "left_anti")

    // 5b. semantic decontamination — paraphrase leaks by embedding
    val decon = ((semanticCorpus, semanticEval) match {
      case (Some(cEmb), Some(eEmb)) =>
        val flagged = Dedup.decontaminateSemantic(cEmb, eEmb,
            idCol, semanticVecCol, k = semanticK,
            minCosine = semanticMinCosine, minMargin = semanticMinMargin)
          .select(col("corpus_id").as(idCol)).distinct()
        decon1.join(flagged, Seq(idCol), "left_anti")
      case _ => decon1
    }).localCheckpoint()

    // 6. temperature mix — on a SALTED md5 surrogate key, NOT the raw
    // id: both the mix-keep rule and the split bands below are
    // knuthHash32 thresholds, and keying two independent decisions on
    // the SAME hash correlates them perfectly (the mix keeps exactly
    // the ids whose hash is small, which the split would then send
    // 100% to the first band — every sampled doc in 'train'; this
    // recipe gate caught that live). The md5 surrogate decorrelates.
    val mixed = Sampling.temperatureSampleBySource(
        decon.withColumn("__mix",
          Sampling.surrogateKey(col(idCol), "recipemix")),
        "__mix", sourceCol, tau = tau, budgetDocs = budgetDocs)
      .drop("__mix")
      .localCheckpoint()

    // 7. leak-free split over chunk families: star pairs to the
    // family's smallest KEPT id make each family one component
    // FLOOR division (id − pmod(id, size) is always a multiple of size,
    // so the div is exact): bare `div` truncates toward zero, which for
    // a NEGATIVE doc id disagrees with the oracle's `//` floor — the id
    // would join the wrong family and silently straddle the split
    val fam = mixed.select(col(idCol), col(sourceCol))
      .withColumn("__fam", call_function("div",
        col(idCol).cast("long") - pmod(col(idCol).cast("long"),
          lit(familySize)),
        lit(familySize)))
    val famMin = fam.groupBy(col(sourceCol), col("__fam"))
      .agg(min(col(idCol)).as("__fmin"))
    val famPairs = fam.join(famMin, Seq(sourceCol, "__fam"))
      .filter(col(idCol) =!= col("__fmin"))
      .select(col("__fmin").as("id1"), col(idCol).as("id2"))
    val split = Sampling.leakFreeSplit(mixed, idCol, famPairs, splits)

    // 8. pack to the context window + cost-balanced shards over the
    // deterministic (Knuth-hash, id) training order
    val packed = Packing.truncateHeadTail(split, "__t",
      headTokens = headTokens, tailTokens = tailTokens)
    val survivors = Ranking.shardByCostBudget(packed,
        Seq(Sampling.knuthHash32(col(idCol)), col(idCol)),
        "n_tokens_kept", budget = shardBudget)
      .select(col(idCol), col(sourceCol), col("n_tokens"), col("split"),
        col("truncated"), col("n_tokens_kept"), col("shard"))

    // the drop ledger: each document lands in exactly one stage row —
    // the FIRST stage that dropped it — or in the survivors. All the
    // operands below are the materialized stage boundaries, so this
    // costs anti-joins on bounded frames, not a pipeline re-run.
    def ids(f: DataFrame) = f.select(col(idCol), col(sourceCol))
    def drop(from: DataFrame, kept: DataFrame, stage: String) =
      ids(from).join(kept.select(col(idCol)), Seq(idCol), "left_anti")
        .withColumn("stage", lit(stage))
    val audit = drop(docs, qual, "quality")
      .unionByName(drop(qual, exact, "exact_dup"))
      .unionByName(drop(exact, near, "near_dup"))
      .unionByName(ids(bench).withColumn("stage", lit("benchmark")))
      .unionByName(drop(corpus, decon1, "contaminated"))
      .unionByName(drop(decon1, decon, "semantic"))
      .unionByName(drop(decon, mixed, "mix_budget"))
    (survivors, audit)
  }

  /** Create the EMPTY persisted indexes [[curateIncremental]] resumes
    * from, so batch 1 takes exactly the same code path as batch N (an
    * anti-join against an empty index keeps everything). Four bucketed
    * tables: the exact-dedup fingerprint set, the MinHash band/shingle
    * pair (bucket-salted by source — the within-source policy), and the
    * benchmark inverted shingle index. Ids are pinned LONG — the type
    * every later append must match. */
  def initRecipeIndexes(spark: org.apache.spark.sql.SparkSession,
                        fingerprintTable: String, minhashTable: String,
                        benchNgramTable: String, buckets: Int = 8): Unit = {
    import org.apache.spark.sql.types._
    def empty(fields: (String, DataType)*) =
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(fields.map { case (n, t) => StructField(n, t) }))
    Bucketing.writeBucketed(empty("fp" -> LongType),
      fingerprintTable, buckets, Seq("fp"))
    Bucketing.writeBucketed(
      empty("id" -> LongType, "band" -> IntegerType, "bucket" -> LongType),
      s"${minhashTable}_bands", buckets, Seq("band", "bucket"))
    Bucketing.writeBucketed(
      empty("id" -> LongType, "n_sh" -> IntegerType,
        "shingles" -> ArrayType(LongType)),
      s"${minhashTable}_shingles", buckets, Seq("id"))
    Bucketing.writeBucketed(
      empty("id" -> LongType, "n_sh" -> IntegerType, "sh" -> LongType),
      benchNgramTable, buckets, Seq("sh"))
  }

  /** Offline maintenance for the [[curateIncremental]] index set: every
    * batch APPENDS at least one file per written bucket, so a year of
    * daily ingests leaves each bucket as ~365 small files and the
    * per-batch scans pay per-file open cost (see
    * [[Bucketing.compactBucketed]] for the crash-recovery contract).
    * One call rewrites all four tables to one sorted file per bucket
    * and collapses replay-duplicated rows. Run it from the same
    * maintenance window that would VACUUM anything else — never
    * concurrently with an ingest. */
  def compactRecipeIndexes(spark: org.apache.spark.sql.SparkSession,
                           fingerprintTable: String, minhashTable: String,
                           benchNgramTable: String,
                           buckets: Int = 8): Unit = {
    Dedup.compactFingerprintIndexTable(spark, fingerprintTable, buckets)
    Dedup.compactMinHashIndexTable(spark, minhashTable, buckets)
    Bucketing.compactBucketed(spark, benchNgramTable, buckets, Seq("sh"),
      dropDuplicates = true)
  }

  /** The INCREMENTAL form of [[curateWithAudit]] — the shape a real
    * daily ingest of a 100 TB corpus actually executes: one batch flows
    * through the same eight stages, but every dedup/decontamination
    * decision consults the PERSISTED bucketed indexes accumulated from
    * all prior batches instead of re-scanning history ([[Dedup
    * .exactDedupAgainstIndexTable]], [[Dedup
    * .minhashDedupAgainstIndexTable]] with the source in the band salt,
    * [[Dedup.crossNgramJaccardAgainstIndexTable]]), and — when
    * `appendIndexes` — appends its own survivors so the NEXT batch
    * resumes where this one ended. Per-batch cost is O(batch), never
    * O(history): the index sides of every anti-join are bucketed and
    * exchange-free.
    *
    * Stage semantics per batch (create the tables once with
    * [[initRecipeIndexes]]; batch 1 against empty indexes behaves like
    * the batch form modulo the split/mix notes below):
    *   3. exact    — in-batch first occurrence (min id per fingerprint)
    *                 AND fingerprint absent from the index. Index gains
    *                 this stage's survivors: "seen" is the dedup
    *                 relation, so a doc sampled away at stage 6 still
    *                 blocks tomorrow's identical copy.
    *   4. near     — a doc drops if it has a verified same-source
    *                 near-dup in HISTORY (the index = prior batches'
    *                 stage-4 survivors), or is the larger id of an
    *                 in-batch same-source pair over this stage's INPUT
    *                 (so a doc that near-dups a history-duplicate also
    *                 drops — greedy, deterministic, SQL-replayable).
    *                 Index gains this stage's survivors.
    *   5a. decon   — this batch's `benchmarkSource` docs leave the
    *                 corpus and join the benchmark inverted index;
    *                 corpus docs are checked against ALL benchmark
    *                 history INCLUDING this batch's benchmark docs.
    *   5b. semantic— unchanged: the eval vector set is a FIXED
    *                 reference, naturally incremental (each batch's
    *                 embeddings vs the same eval set).
    *   6. mix      — temperature shares from THIS batch's source
    *                 counts under a PER-BATCH `budgetDocs` (a daily
    *                 budget — the incremental reading of the mix law).
    *   7. split    — hash of the FAMILY KEY (source, floor(id /
    *                 familySize)) via a salted surrogate, NOT the
    *                 batch form's smallest-kept-id component label:
    *                 family members arriving in different batches must
    *                 land in the same split, and the component label is
    *                 batch-dependent. Leak-free within a family by
    *                 construction, stable across any batch order.
    *   8. pack+shard — per batch; shard ids restart at 0 each batch
    *                 (a daily delivery is its own shard set — tag
    *                 outputs with a batch id downstream).
    *
    * Returns (survivors, audit) with the same schemas and stage names
    * as [[curateWithAudit]]. Every index-reading decision is
    * materialized (stage-boundary localCheckpoints) BEFORE the index
    * appends run, so evaluating either returned frame after the
    * appends never sees the batch's own index rows. */
  def curateIncremental(batch: DataFrame, idCol: String, sourceCol: String,
             textCol: String,
             benchmarkSource: String,
             fingerprintTable: String,
             minhashTable: String,
             benchNgramTable: String,
             batchEmb: Option[DataFrame] = None,
             semanticEval: Option[DataFrame] = None,
             semanticVecCol: String = "embedding",
             semanticK: Int = 8,
             semanticMinCosine: Double = 0.9,
             semanticMinMargin: Double = 0.2,
             minTokens: Long = 35L, maxTokens: Long = 100L,
             nearThreshold: Double = 0.85,
             contaminationThreshold: Double = 0.7,
             tau: Double = 0.5, budgetDocs: Long = 300L,
             familySize: Long = 50L,
             splits: Seq[(String, Double)] =
               Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
             splitSalt: String = "recipesplit",
             headTokens: Int = 20, tailTokens: Int = 10,
             shardBudget: Long = 2000L,
             appendIndexes: Boolean = true,
             buckets: Int = 8): (DataFrame, DataFrame) = {
    val (survivors, audit, append) = curateIncrementalStaged(batch, idCol,
      sourceCol, textCol, benchmarkSource, fingerprintTable, minhashTable,
      benchNgramTable, batchEmb, semanticEval, semanticVecCol, semanticK,
      semanticMinCosine, semanticMinMargin, minTokens, maxTokens,
      nearThreshold, contaminationThreshold, tau, budgetDocs, familySize,
      splits, splitSalt, headTokens, tailTokens, shardBudget, buckets)
    if (appendIndexes) append()
    (survivors, audit)
  }

  /** [[curateIncremental]] with the index appends returned as a closure
    * instead of executed — the form a STREAMING caller needs: the
    * documented crash-replay discipline of the incremental runners
    * ([[graft.streaming.StreamRunner]]) is sink-commit BEFORE
    * index-append (appending first would make a replayed batch
    * anti-join its own rows away and LOSE them), and only the caller
    * knows when its sink committed. Survivors are fully materialized;
    * the audit is a lazy derivation of materialized stage boundaries
    * plus the caller's input frame (never an index table), so both are
    * safe to evaluate after `append`, which itself is idempotent-
    * replayable (duplicate index rows are harmless in all three
    * indexes). */
  def curateIncrementalStaged(batch: DataFrame, idCol: String,
             sourceCol: String, textCol: String,
             benchmarkSource: String,
             fingerprintTable: String,
             minhashTable: String,
             benchNgramTable: String,
             batchEmb: Option[DataFrame] = None,
             semanticEval: Option[DataFrame] = None,
             semanticVecCol: String = "embedding",
             semanticK: Int = 8,
             semanticMinCosine: Double = 0.9,
             semanticMinMargin: Double = 0.2,
             minTokens: Long = 35L, maxTokens: Long = 100L,
             nearThreshold: Double = 0.85,
             contaminationThreshold: Double = 0.7,
             tau: Double = 0.5, budgetDocs: Long = 300L,
             familySize: Long = 50L,
             splits: Seq[(String, Double)] =
               Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
             splitSalt: String = "recipesplit",
             headTokens: Int = 20, tailTokens: Int = 10,
             shardBudget: Long = 2000L,
             buckets: Int = 8): (DataFrame, DataFrame, () => Unit) = {
    require(minTokens >= 1 && maxTokens >= minTokens,
      s"need 1 <= minTokens <= maxTokens, got [$minTokens, $maxTokens]")
    require(familySize >= 1, s"familySize must be >= 1, got $familySize")
    require(batchEmb.isDefined == semanticEval.isDefined,
      "semantic decontamination needs BOTH batch embeddings and an eval set")

    val session = batch.sparkSession

    // 1+2. normalize + quality cut (identical to the batch form)
    val qual = labeled(session, "qual ckpt")(batch
      .withColumn("__t", TextFunctions.stripHtml(col(textCol)))
      .withColumn("n_tokens",
        TextFunctions.tokenCount(col("__t")).cast("long"))
      .filter(col("n_tokens").between(minTokens, maxTokens))
      .select(col(idCol), col(sourceCol), col("__t"), col("n_tokens"))
      .localCheckpoint())

    // 3. exact dedup: in-batch first occurrence + vs-history anti-join
    val exact = labeled(session, "exact ckpt")(
      Dedup.exactDedupAgainstIndexTable(qual, idCol, "__t",
        fingerprintTable).localCheckpoint())

    // 4. near dedup WITHIN source, vs history then in-batch. The batch
    // is shingled and MinHash-signed exactly ONCE (the streaming
    // runners' one-signing discipline): the vs-history join, the
    // in-batch pair pass AND the deferred index append below all reuse
    // these two frames — re-signing from raw text tripled the
    // per-batch cost and let parameters silently diverge.
    val docsSh = labeled(session, "shingle ckpt")(
      Dedup.shingleDocsOf(exact, idCol, "__t",
        extraCols = Seq(sourceCol)).localCheckpoint())
    val bandedSh = labeled(session, "band ckpt")(
      Dedup.bandRowsOf(docsSh,
        partitionCols = Seq(sourceCol)).localCheckpoint())
    val vsHist = Dedup.minhashDedupVsIndexPre(exact, idCol,
      docsSh.select(col("id"), col("n_sh"), col("shingles")),
      bandedSh.select(col("id"), col("band"), col("bucket")),
      minhashTable, nearThreshold)
    val inBatchDrop = Dedup.minhashDupPairsPre(docsSh, bandedSh,
        nearThreshold, partitionCols = Seq(sourceCol))
      .select(col("id2").as(idCol)).distinct()
    val near = labeled(session, "near ckpt")(
      vsHist.join(inBatchDrop, Seq(idCol), "left_anti")
        .localCheckpoint())

    // 5a. verbatim decontamination vs benchmark history ∪ this batch's
    // benchmark docs (checked BEFORE the index append, so the union is
    // explicit rather than a read-after-write)
    val bench = near.filter(col(sourceCol) === benchmarkSource)
    val corpus = near.filter(col(sourceCol) =!= benchmarkSource)
    val contaminated = Dedup.crossNgramJaccardAgainstIndexTable(corpus,
        idCol, "__t", benchNgramTable, shingleSize = 3,
        threshold = contaminationThreshold)
      .select(col("corpus_id").as(idCol))
      .unionByName(Dedup.crossNgramJaccardPairs(corpus, bench, idCol,
          "__t", shingleSize = 3, threshold = contaminationThreshold)
        .select(col("corpus_id").as(idCol)))
      .distinct()
    val decon1 = labeled(session, "decon ckpt")(
      corpus.join(contaminated, Seq(idCol), "left_anti")
        .localCheckpoint())

    // 5b. semantic decontamination vs the fixed eval set (when absent,
    // decon IS the already-materialized decon1 — a second checkpoint of
    // the identical frame would just burn a job per micro-batch)
    val decon = (batchEmb, semanticEval) match {
      case (Some(cEmb), Some(eEmb)) =>
        val flagged = Dedup.decontaminateSemantic(cEmb, eEmb,
            idCol, semanticVecCol, k = semanticK,
            minCosine = semanticMinCosine, minMargin = semanticMinMargin)
          .select(col("corpus_id").as(idCol)).distinct()
        labeled(session, "semantic ckpt")(
          decon1.join(flagged, Seq(idCol), "left_anti").localCheckpoint())
      case _ => decon1
    }

    // 6. per-batch temperature mix on the salted surrogate (see the
    // batch form's hash-coupling note). NOT checkpointed: the mix frame
    // has exactly one eager consumer (the survivor chain below — the
    // audit is lazy and rarely evaluated), it reads no index table
    // (decon, its checkpointed upstream, is the last index-reading
    // frame), and the mix itself is a groupBy + broadcast join on an
    // already-bounded frame — a checkpoint here bought one extra job
    // per micro-batch and nothing else. An audit consumer recomputes
    // the cheap mix from the decon checkpoint.
    val mixed = Sampling.temperatureSampleBySource(
        decon.withColumn("__mix",
          Sampling.surrogateKey(col(idCol), "recipemix")),
        "__mix", sourceCol, tau = tau, budgetDocs = budgetDocs)
      .drop("__mix")

    // 7. batch-stable leak-free split on the family KEY itself
    val famCol = call_function("div",
      col(idCol).cast("long") - pmod(col(idCol).cast("long"),
        lit(familySize)),
      lit(familySize))
    val split = Sampling.splitByHash(
        mixed.withColumn("__skey", Sampling.surrogateKey(
          concat_ws("|", col(sourceCol), famCol), splitSalt)),
        "__skey", splits)
      .drop("__skey")

    // 8. pack + shard (per batch)
    val packed = Packing.truncateHeadTail(split, "__t",
      headTokens = headTokens, tailTokens = tailTokens)
    val survivors = labeled(session, "pack+shard ckpt")(
      Ranking.shardByCostBudget(packed,
          Seq(Sampling.knuthHash32(col(idCol)), col(idCol)),
          "n_tokens_kept", budget = shardBudget)
        .select(col(idCol), col(sourceCol), col("n_tokens"), col("split"),
          col("truncated"), col("n_tokens_kept"), col("shard"))
        .localCheckpoint())

    def ids(f: DataFrame) = f.select(col(idCol), col(sourceCol))
    def drop(from: DataFrame, kept: DataFrame, stage: String) =
      ids(from).join(kept.select(col(idCol)), Seq(idCol), "left_anti")
        .withColumn("stage", lit(stage))
    val audit = drop(batch, qual, "quality")
      .unionByName(drop(qual, exact, "exact_dup"))
      .unionByName(drop(exact, near, "near_dup"))
      .unionByName(ids(bench).withColumn("stage", lit("benchmark")))
      .unionByName(drop(corpus, decon1, "contaminated"))
      .unionByName(drop(decon1, decon, "semantic"))
      .unionByName(drop(decon, mixed, "mix_budget"))
    // audit stays LAZY on purpose: every operand above is either a
    // materialized stage boundary or the caller's own input frame —
    // none reads an index table — so evaluating it after the appends is
    // safe, and a caller that discards the ledger (a sink that only
    // wants survivors) pays nothing for it.

    // appends run only AFTER every decision frame is materialized: the
    // batch's own rows must never be in the index its own decisions
    // read. bench is a filter over the checkpointed `near`, so the
    // closure stays valid however late the caller invokes it.
    val append = () => {
      // reuse the stage-4 signing — restricted to the near survivors —
      // instead of re-shingling the survivors from raw text
      val keptIds = near.select(col(idCol).as("id"))
      // the three appends write three INDEPENDENT tables from already-
      // materialized frames: submit them from a small pool so the next
      // append's tasks back-fill executors freed by the previous one's
      // tail (guide-style job overlap) — serial, each small write paid
      // its full fixed cost end to end. Order among them never
      // mattered (the sink-before-append discipline orders the GROUP,
      // not its members); any failure still fails the whole append.
      val work: Seq[() => Unit] = Seq(
        () => labeled(session, "append fp")(
          Dedup.appendToFingerprintIndexTable(exact, "__t",
            fingerprintTable, buckets)),
        () => labeled(session, "append minhash")(
          Dedup.appendToMinHashIndexTablePre(
            docsSh.select(col("id"), col("n_sh"), col("shingles"))
              .join(keptIds, Seq("id"), "left_semi"),
            bandedSh.select(col("id"), col("band"), col("bucket"))
              .join(keptIds, Seq("id"), "left_semi"),
            minhashTable, buckets)),
        () => labeled(session, "append bench ngram")(
          Dedup.appendToNgramInvertedIndexTable(bench, idCol, "__t",
            benchNgramTable, shingleSize = 3, buckets = buckets)))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try scala.concurrent.Await.result(
        scala.concurrent.Future.traverse(work)(f =>
          scala.concurrent.Future(f())),
        scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
      ()
    }
    (survivors, audit, append)
  }
}
