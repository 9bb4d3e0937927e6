package graft
import org.apache.spark.sql.SparkSession

/** Pure per-query run summarization, separated from the Bench main so the
  * failed-run and noise rules are unit-testable (BenchSummarySpec): a
  * failed run's time-to-exception must never masquerade as the query's
  * min, and the noise ratio that drives adaptive reruns considers only
  * successful runs. */
object BenchSummary {
  /** Min over SUCCESSFUL runs; all-failed falls back to the raw min (the
    * query is separately listed in `failed`, which is the driver's
    * failure signal). */
  def minOf(runs: Vector[(Double, Boolean)]): Double = {
    val oks = runs.collect { case (s, true) => s }
    if (oks.nonEmpty) oks.min else runs.map(_._1).min
  }

  /** max/min over successful runs; 0 when fewer than one succeeded or
    * the min is non-positive. */
  def noiseOf(runs: Vector[(Double, Boolean)]): Double = {
    val oks = runs.collect { case (s, true) => s }
    if (oks.nonEmpty && oks.min > 0) oks.max / oks.min else 0.0
  }

  /** Rerun predicate for the adaptive loop: noisy (ratio > 2 over >= 2
    * successful runs) or nothing succeeded yet. */
  def needsRerun(runs: Vector[(Double, Boolean)]): Boolean = {
    val oks = runs.collect { case (s, true) => s }
    (oks.size >= 2 && oks.min > 0 && oks.max / oks.min > 2.0) || oks.isEmpty
  }

  /** The ONE stdout line the driver tail-captures (~4 KB): metric/value/
    * unit/queries/sf is the driver contract; everything else (skew and
    * incremental experiments, per-run arrays, noise) lives ONLY in
    * BENCH_FULL.json, because every byte here competes with per-query
    * entries for the tail window. Built here, not inline in the main, so
    * BenchSummarySpec can size-budget it against the REAL gate list
    * (BENCH_r03 shipped `parsed: null` when the line outgrew the tail). */
  /** Locale-stable numeric formatting: the default-locale `f""`
    * interpolator prints "0,123" under e.g. de_DE and corrupts the JSON
    * line the driver parses. Every number in bench output goes through
    * here. */
  def num(v: Double, dp: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))

  def stdoutLine(total: Double, mins: Map[String, Double],
                 failed: List[String], fullOut: String, sfDir: String,
                 nMemoized: Int = 0, memoBuildSec: Double = 0.0): String = {
    // Per-query times live ONLY in BENCH_FULL.json: at 130 gates the
    // inline map alone is ~3.9 KB (r9 measured 3987 B total), which
    // pushed the line past the driver's ~4 KB stdout tail and produced
    // `parsed: null` BENCH records in r3-r9. The stdout line keeps the
    // driver-contract fields with an EMPTY queries map (shape-stable for
    // any parser that indexes it), the failure signal, the gate count,
    // and the pointer to the full record.
    // The failed array is capped: at 180+ gates even the names alone
    // outgrow the tail in the everything-failed worst case. The first
    // `FailedCap` names (sorted) identify the breakage; n_failed carries
    // the true count; the full list is in BENCH_FULL.json.
    val FailedCap = 100
    val failedJson = failed.sorted.take(FailedCap)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // n_memoized / memo_build_sec (r16 verdict #2): `value` now INCLUDES
    // the memoized families' isolated build costs (measured solo every
    // forked run, not just COMMIT refreshes) so a memoized ~21 s gate can
    // never print as 0.1 s in the total the driver sees; the two fields
    // say how many gates share memos and how much of the total is that
    // one-time build cost.
    s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","queries":{},"n_queries":${mins.size},"n_failed":${failed.size},"n_memoized":$nMemoized,"memo_build_sec":${num(memoBuildSec, 3)},"failed":$failedJson,"full":"$fullOut","sf":"$sfDir"}"""
  }
}

object Bench {
  private def num(v: Double, dp: Int): String = BenchSummary.num(v, dp)

  /** Experiments (skew, incremental-dedup, multipattern, hnsw_vs_flat)
    * run ONLY when SPARK_GRAFT_BENCH_EXPERIMENTS=1 (or in EXPERIMENTS_ONLY
    * mode). The driver's per-round bench has a hard wall-clock budget and
    * BENCH_r13 was its first rc-124 timeout in 13 rounds — the experiments
    * (three ANN index builds + three skew plans + two dedup shapes) are
    * builder-side quality meters, not part of the driver's gate contract,
    * so they now cost the driver run nothing. */
  private def experimentsEnabled: Boolean =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_EXPERIMENTS", "0") == "1"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runsPerQuery =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // The record file: any bench invocation used to overwrite the
    // committed BENCH_FULL.json in place, so a killed/partial run (the
    // r13 driver timeout) left a corrupt working tree shadowing the real
    // record. Now a run writes BENCH_FULL.candidate.json unless the
    // builder explicitly opts into a record refresh with
    // SPARK_GRAFT_BENCH_COMMIT=1 (or names a path via
    // SPARK_GRAFT_BENCH_FULL, which always wins).
    val fullOut = sys.env.get("SPARK_GRAFT_BENCH_FULL").getOrElse(
      if (sys.env.getOrElse("SPARK_GRAFT_BENCH_COMMIT", "0") == "1")
        "BENCH_FULL.json"
      else "BENCH_FULL.candidate.json")
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // One shared SparkSession across 276 gates accumulates JVM state
    // (codegen/JIT caches, GC pressure, catalog): BENCH_r11 measured the
    // common-197-gate set 1.35x slower than r10 on byte-identical code,
    // with eight unchanged gates 3-18x slow IN SEQUENCE yet at their old
    // floor when re-run in a fresh JVM (similarity_topk_brute 3.65 ->
    // 0.25 s, q3 5.94 -> 0.72 s; adjudicated round 12). So the default
    // bench FORKS: gates split into alphabetical chunks, each chunk runs
    // in its own child JVM (same flags/classpath), the parent merges the
    // per-chunk records and runs the experiments in its own session.
    // ONLY-mode and fork failure fall back to the in-process path.
    val fork = sys.env.getOrElse("SPARK_GRAFT_BENCH_FORK", "1") == "1"
    // experiments-only mode: iterate on an experiment without paying the
    // full gate sequence (prints each experiment's JSON to stderr)
    if (sys.env.contains("SPARK_GRAFT_BENCH_EXPERIMENTS_ONLY")) {
      // value "1" runs all four; a comma-separated list of names runs
      // just those (the sweep loop for one experiment's knobs)
      val sel = sys.env("SPARK_GRAFT_BENCH_EXPERIMENTS_ONLY")
      val wanted: String => Boolean =
        if (sel == "1" || sel.isEmpty) _ => true
        else sel.split(",").map(_.trim).toSet
      val spark = buildSession()
      for ((name, f) <- Seq[(String, (SparkSession, String) => String)](
          ("skew", skewExperiment),
          ("incremental_dedup_vs_stateless", incrementalDedupExperiment),
          ("multipattern_vs_contains", multiPatternExperiment),
          ("hnsw_vs_flat", hnswVsFlatExperiment))
          if wanted(name)) {
        val out = try f(spark, sfDir) catch { case e: Throwable =>
          e.printStackTrace()
          // jackson-escape the message: a quote/backslash in the
          // exception text must not produce malformed JSON on stderr
          val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
          s"""{"error":${mapper.writeValueAsString(e.toString)}}"""
        }
        System.err.println(s"[experiment] $name -> $out")
      }
      spark.stop()
      return
    }
    if (only.isEmpty && fork) runForked(sfDir, runsPerQuery, fullOut)
    else runInProcess(sfDir, runsPerQuery, fullOut, only)
  }

  /** Splits the gate list into `SPARK_GRAFT_BENCH_CHUNK`-sized sorted
    * chunks and runs each in a freshly forked JVM (inherited classpath,
    * JVM flags, and env; `SPARK_GRAFT_BENCH_ONLY` names the chunk, so
    * the child takes the exact in-process path below and skips the
    * experiments). A chunk whose child exits nonzero or writes no record
    * reruns in-process here — degraded measurement beats a hole in the
    * record. The parent then runs the skew/incremental experiments in
    * its own session and writes the merged BENCH_FULL + stdout line. */
  private def runForked(sfDir: String, runsPerQuery: Int,
                        fullOut: String): Unit = {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val chunkSize =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_CHUNK", "70").toInt.max(1)
    val chunks = names.grouped(chunkSize).toVector
    val javaBin = java.nio.file.Paths
      .get(sys.props("java.home"), "bin", "java").toString
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
    val cp = sys.props("java.class.path")
    // merge the chunk records verbatim (Jackson rides in Spark's jars)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def mergeParts(parts: Seq[String])
        : (String, List[String], Double, Map[String, Double]) = {
      val queries = mapper.createObjectNode()
      var failed = List.empty[String]
      var total = 0.0
      val mins = scala.collection.mutable.Map.empty[String, Double]
      parts.foreach { part =>
        val node = mapper.readTree(new java.io.File(part))
        node.get("queries").properties().forEach { e =>
          // NOTE: no `: Unit` ascription — set[T] would infer T=BoxedUnit
          // and CCE at runtime
          val _ = queries.set[com.fasterxml.jackson.databind.JsonNode](
            e.getKey, e.getValue)
          mins(e.getKey) = e.getValue.get("min").asDouble()
        }
        node.get("failed").forEach(f => failed ::= f.asText())
        total += node.get("total_min_sec").asDouble()
      }
      (mapper.writeValueAsString(queries), failed, total, mins.toMap)
    }
    val donePartsBuf = scala.collection.mutable.ArrayBuffer.empty[String]
    val parts = chunks.zipWithIndex.map { case (chunk, i) =>
      val part = s"$fullOut.part$i"
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(part))
      val ok = try {
        val cmd = new java.util.ArrayList[String]()
        cmd.add(javaBin)
        jvmArgs.forEach(a => cmd.add(a))
        cmd.add("-cp"); cmd.add(cp); cmd.add("graft.Bench")
        val pb = new ProcessBuilder(cmd)
        pb.environment().put("SPARK_GRAFT_BENCH_ONLY", chunk.mkString(","))
        pb.environment().put("SPARK_GRAFT_BENCH_FULL", part)
        pb.environment().put("SPARK_GRAFT_BENCH_FORK", "0")
        // child stdout is logging + its own (unused) summary line; the
        // parent's stdout line must stay the process's final output
        pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        val p = pb.start()
        p.waitFor() == 0 && java.nio.file.Files
          .exists(java.nio.file.Paths.get(part))
      } catch { case e: Exception =>
        System.err.println(s"[bench] fork chunk $i FAILED: ${e.getMessage}")
        false
      }
      if (!ok) {
        System.err.println(s"[bench] chunk $i: falling back in-process")
        runInProcess(sfDir, runsPerQuery, part, Some(chunk.toSet))
      }
      donePartsBuf += part
      // incremental record write after EVERY chunk: a timeout killing the
      // run mid-sequence (BENCH_r13) still leaves a parseable merged
      // record on disk with everything that finished
      val (entriesSoFar, failedSoFar, totalSoFar, _) =
        mergeParts(donePartsBuf.toSeq)
      writeFullMerged(fullOut, sfDir, runsPerQuery, entriesSoFar,
        failedSoFar, "{}", "{}", "{}", "{}", totalSoFar, donePartsBuf.size)
      part
    }
    val (entries, failed, total, mins) = mergeParts(parts)
    // memo_isolated (EVERY forked run since r17; r16 verdict #2): each
    // memoized family's representative re-measured ALONE in a fresh JVM,
    // so the record carries the family's true solo cost mechanically —
    // the in-sequence mins above bill the shared build to whichever
    // member ran first, and min-of-N then EXCLUDES it (run 1 pays the
    // build, later runs reuse the memo), so without this block the build
    // is billed to nobody. The measured costs are SUMMED INTO the total
    // the driver sees (below), closing the "memoized ~21 s gate prints
    // as 0.1 s" gap; ~4 solo runs ≈ 2 min of wall-clock, well inside the
    // driver's budget.
    val memoIsolated: Seq[(String, String, Double)] =
      SparkEntry.memoFamilies.toSeq.sortBy(_._1).flatMap {
        case (fam, gates) =>
          val rep = gates.head
          val part = s"$fullOut.memo_$fam"
          java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(part))
          val ok = try {
            val cmd = new java.util.ArrayList[String]()
            cmd.add(javaBin)
            jvmArgs.forEach(a => cmd.add(a))
            cmd.add("-cp"); cmd.add(cp); cmd.add("graft.Bench")
            val pb = new ProcessBuilder(cmd)
            pb.environment().put("SPARK_GRAFT_BENCH_ONLY", rep)
            pb.environment().put("SPARK_GRAFT_BENCH_FULL", part)
            pb.environment().put("SPARK_GRAFT_BENCH_FORK", "0")
            pb.environment().put("SPARK_GRAFT_BENCH_RUNS", "1")
            pb.environment().put("SPARK_GRAFT_BENCH_MAX_RUNS", "1")
            pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
            pb.redirectError(ProcessBuilder.Redirect.INHERIT)
            pb.start().waitFor() == 0 &&
              java.nio.file.Files.exists(java.nio.file.Paths.get(part))
          } catch { case e: Exception =>
            System.err.println(s"[bench] memo_isolated $fam FAILED: ${e.getMessage}")
            false
          }
          val out = if (!ok) None else try {
            val node = mapper.readTree(new java.io.File(part))
            Some((fam, rep,
              node.get("queries").get(rep).get("min").asDouble()))
          } catch { case _: Exception => None }
          java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(part))
          out
      }
    val memoIsolatedJson = memoIsolated.map { case (fam, rep, sec) =>
      s""""$fam":{"gate":"$rep","isolated_min_sec":${num(sec, 3)}}"""
    }.mkString("{", ",", "}")
    val memoBuildSec = memoIsolated.map(_._3).sum
    val nMemoized = SparkEntry.memoFamilyOf.size
    val grandTotal = total + memoBuildSec
    // experiments (opt-in) run AFTER all children so they see a quiet
    // machine; with the flag off the parent never even builds a session
    val (skewJson, incrJson, acJson, annJson) =
      if (!experimentsEnabled) ("{}", "{}", "{}", "{}")
      else {
        val spark = buildSession()
        try {
          val skew =
            try skewExperiment(spark, sfDir) catch { case e: Throwable =>
              System.err.println(s"[bench] skew experiment FAILED: ${e.getMessage}")
              "{}"
            }
          val incr =
            try incrementalDedupExperiment(spark, sfDir)
            catch { case e: Throwable =>
              System.err.println(s"[bench] incr experiment FAILED: ${e.getMessage}")
              "{}"
            }
          val ac =
            try multiPatternExperiment(spark, sfDir)
            catch { case e: Throwable =>
              System.err.println(s"[bench] multipattern experiment FAILED: $e")
              e.printStackTrace()
              "{}"
            }
          val ann =
            try hnswVsFlatExperiment(spark, sfDir)
            catch { case e: Throwable =>
              System.err.println(s"[bench] hnsw_vs_flat experiment FAILED: $e")
              "{}"
            }
          (skew, incr, ac, ann)
        } finally spark.stop()
      }
    writeFullMerged(fullOut, sfDir, runsPerQuery, entries, failed, skewJson,
      incrJson, acJson, annJson, grandTotal, chunks.size, memoIsolatedJson,
      memoBuildSec)
    parts.foreach(p =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p)))
    println(BenchSummary.stdoutLine(grandTotal, mins, failed, fullOut, sfDir,
      nMemoized, memoBuildSec))
    System.out.flush()
  }

  private def buildSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def runInProcess(sfDir: String, runsPerQuery: Int,
      fullOut: String, only: Option[Set[String]]): Unit = {
    val spark = buildSession()
    // Each query runs `runsPerQuery` times and reports the MIN. Run 1
    // carries whole-stage-codegen compilation and page-cache warm-up, so
    // the min is taken over runs that include at least two steady-state
    // executions — the single-run numbers of earlier rounds drifted a
    // median 1.62x on byte-identical code (BENCH_r04 vs r05), which is the
    // sandbox noise floor this min-of-N exists to cut through. All runs
    // for every query are preserved in the full JSON so the noise floor
    // itself stays measurable round over round.
    // Noisy queries rerun adaptively: after the base `runsPerQuery` runs,
    // a query whose in-run noise ratio (max/min over SUCCESSFUL runs)
    // still exceeds 2 gets extra runs up to `maxRuns` — 24/110 queries
    // showed >2x in-run noise at min-of-3 (BENCH_r06), so their min may
    // still overstate; more samples tighten it at negligible cost since
    // only the noisy tail reruns.
    val maxRuns =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_RUNS", "5").toInt.max(runsPerQuery)
    var failed = List.empty[String]
    // `only` (from SPARK_GRAFT_BENCH_ONLY=a,b,c) restricts the run to
    // named gates — the per-chunk child path of runForked, and the knob
    // for A/B-ing a regression in a quiet JVM without paying the full
    // gate sequence
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    // per query: (seconds, succeeded) per run. A failed run records its
    // time-to-exception but is EXCLUDED from min/noise — a query that
    // throws fast in one run must not report the failure time as its
    // benchmark number when other runs succeeded.
    // Inter-gate hygiene (default on; SPARK_GRAFT_BENCH_GATE_GC=0 to
    // disable for A/B): gates leave state behind — localCheckpoint
    // blocks (NSW adjacency, iterative graph frames) sit in the
    // BlockManager until their RDD is garbage-collected and the async
    // ContextCleaner runs, and cached relations accumulate — so a gate's
    // measured time depends on its POSITION in the chunk, not just its
    // code (r12 adjudication: mid-chunk gates 2-7x over their isolated
    // floors). Clearing the cache and forcing a GC between gates frees
    // those blocks deterministically instead of whenever the JVM gets
    // around to it, making per-gate numbers position-independent.
    val gateGc = sys.env.getOrElse("SPARK_GRAFT_BENCH_GATE_GC", "1") == "1"
    // Let the async ContextCleaner DRAIN before the next gate starts: the
    // block/broadcast removal the gc queues runs on background threads,
    // and without a drain window that churn lands inside the NEXT gate's
    // timed runs — measured on streaming_dedup (wall-clock micro-batch
    // gate): 6.6 s billed with no drain window vs 2.0 s with the gc off.
    // The r13 fixed 3 s sleep solved that but cost 312 × 3 s ≈ 936 s of
    // wall-clock, which timed out the driver's budget (BENCH_r13 rc 124).
    // Event-driven instead: poll the public RDD storage listing until the
    // cleaner has removed the dead gate's blocks (count hits zero or
    // stops shrinking — a deliberately-shared memoized block stays put
    // and must not stall the cap), hard cap 3 s. Gates that leave no
    // blocks behind — the vast majority — pay ~0 instead of 3 s.
    def interGateCleanup(): Unit = if (gateGc) {
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      System.gc() // feeds the async ContextCleaner the dead RDD/broadcast refs
      def blocks(): Int =
        try spark.sparkContext.getRDDStorageInfo.length
        catch { case _: Throwable => 0 }
      var n = blocks()
      if (n > 0) {
        val deadline = System.nanoTime() + 3_000_000_000L
        var stable = 0
        while (n > 0 && stable < 2 && System.nanoTime() < deadline) {
          Thread.sleep(100)
          val m = blocks()
          if (m == n) stable += 1 else stable = 0
          n = m
        }
        // small settle for the broadcast-removal tail the RDD listing
        // can't see; only paid by the gates that actually had blocks
        Thread.sleep(200)
      }
    }
    val acc =
      scala.collection.mutable.Map.empty[String, Vector[(Double, Boolean)]]
    var gatesSinceWrite = 0
    selected.foreach { case (name, fn) =>
      def once(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true } catch { case e: Throwable =>
            if (!failed.contains(name)) failed ::= name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      var runs = (1 to runsPerQuery).toVector.map(_ => once())
      while (runs.size < maxRuns && BenchSummary.needsRerun(runs))
        runs :+= once()
      interGateCleanup()
      acc(name) = runs
      gatesSinceWrite += 1
      // checkpoint the record every 10 gates so a wall-clock kill
      // (BENCH_r13's driver timeout) loses at most 10 gates of this
      // process's numbers, not the whole chunk
      if (gatesSinceWrite >= 10) {
        gatesSinceWrite = 0
        val partialMins = acc.map { case (k, v) => BenchSummary.minOf(v) }
        writeFull(fullOut, sfDir, runsPerQuery, acc.toMap, failed,
          "{}", "{}", "{}", "{}", partialMins.sum)
      }
    }
    val results: Map[String, Vector[(Double, Boolean)]] = acc.toMap
    val mins = results.map { case (k, v) => k -> BenchSummary.minOf(v) }
    val total = if (mins.nonEmpty) mins.values.sum else 0.0
    // experiments are opt-in (SPARK_GRAFT_BENCH_EXPERIMENTS=1) and always
    // skipped in ONLY mode — an A/B run wants a quiet JVM
    val runExps = experimentsEnabled && only.isEmpty
    val skewJson = if (!runExps) "{}" else
      try skewExperiment(spark, sfDir) catch { case e: Throwable =>
        System.err.println(s"[bench] skew experiment FAILED: ${e.getMessage}")
        "{}"
      }
    // full-file-only experiment (the stdout line is budgeted against the
    // driver's ~4 KB tail; BENCH_FULL has room for more evidence)
    val incrJson = if (!runExps) "{}" else
      try incrementalDedupExperiment(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] incr experiment FAILED: ${e.getMessage}")
        "{}"
      }
    val acJson = if (!runExps) "{}" else
      try multiPatternExperiment(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] multipattern experiment FAILED: $e")
        e.printStackTrace()
        "{}"
      }
    val annJson = if (!runExps) "{}" else
      try hnswVsFlatExperiment(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] hnsw_vs_flat experiment FAILED: $e")
        "{}"
      }
    writeFull(fullOut, sfDir, runsPerQuery, results, failed, skewJson,
      incrJson, acJson, annJson, total)
    // stop Spark BEFORE printing: the driver keeps only a ~4 KB stdout
    // TAIL, and shutdown logging emitted after the JSON line is what
    // pushed it out of the capture window in rounds 3-5 (parsed: null).
    // The line must be the process's final output.
    spark.stop()
    // a failed query must not masquerade as a fast success: its name is
    // listed and the run's exit signal is the non-empty "failed" array.
    // Skew/incremental experiment blocks ride BENCH_FULL only — the
    // stdout byte budget is spec-pinned (BenchSummarySpec).
    println(BenchSummary.stdoutLine(total, mins, failed, fullOut, sfDir))
    System.out.flush()
  }

  /** Writes the complete benchmark record — every run of every query, the
    * min, and the observed per-query noise ratio (max/min across runs) —
    * to a file the driver's 4 KB stdout tail cannot truncate. */
  /** Incremental-vs-stateless dedup at bench scale: the fingerprint
    * index's reason to exist is that a daily batch should cost O(batch),
    * not O(corpus). Timed head-to-head on identical inputs: (a) dedup
    * the new batch against the persisted bucketed index; (b) what a
    * stateless pipeline must do instead — re-deduplicate history+batch
    * from raw text. Also reports the one-time index build. At sf0.1 the
    * corpus:batch ratio is ~4:1; at a real 100 TB corpus with daily
    * batches it is ~1000:1, so the measured gap is the FLOOR of the
    * production win. */
  private def incrementalDedupExperiment(spark: SparkSession,
      sfDir: String): String = {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val histN = (nDocs * 4) / 5
    val hist = docs.filter(col("doc_id") < histN)
    val batch = docs.filter(col("doc_id") >= histN)
      .unionByName(docs.filter(col("doc_id") < 200)
        .withColumn("doc_id", col("doc_id") + 10_000_000L))
    val table = "bench_fp_idx"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    def timed(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = body
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    val (buildSec, _) = timed {
      Dedup.buildFingerprintIndexTable(hist, "text", table); 0L
    }
    try {
      // warm both shapes once (codegen compile), then time
      Dedup.exactDedupAgainstIndexTable(batch, "doc_id", "text", table).count()
      Dedup.exactDedup(hist.unionByName(batch), "doc_id", "text").count()
      val (incrSec, incrRows) = timed(
        Dedup.exactDedupAgainstIndexTable(batch, "doc_id", "text", table).count())
      val (statelessSec, _) = timed(
        Dedup.exactDedup(hist.unionByName(batch), "doc_id", "text").count())
      s"""{"index_build_sec":${num(buildSec, 3)},"incremental_sec":${num(incrSec, 3)},""" +
        s""""stateless_full_sec":${num(statelessSec, 3)},"batch_survivors":$incrRows,""" +
        s""""corpus_docs":$nDocs}"""
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  private def writeFull(path: String, sfDir: String, runsPerQuery: Int,
      results: Map[String, Vector[(Double, Boolean)]], failed: List[String],
      skewJson: String, incrJson: String, acJson: String, annJson: String,
      total: Double): Unit = {
    val noiseNote =
      "Single-run local[32] timings on this sandbox drift up to 4x per " +
      "query and ~1.6x at the median on identical code (measured " +
      "BENCH_r04 vs r05). 'min' is the minimum over successful 'runs' " +
      "(run 1 includes codegen compilation; failed runs are listed in " +
      "'failed_runs' and excluded from min/noise); 'noise' is max/min " +
      "across successful runs and is the per-query noise floor observed " +
      "within this very run. Queries whose noise exceeded 2 were rerun " +
      "adaptively up to SPARK_GRAFT_BENCH_MAX_RUNS times. Compare " +
      "rounds on 'min'; treat ratios inside a query's own 'noise' band " +
      "as measurement error."
    val entries = results.toSeq.sortBy(_._1).map { case (name, runs) =>
      val runsJson = runs.map(r => num(r._1, 3)).mkString("[", ",", "]")
      val noise = BenchSummary.noiseOf(runs)
      val min = BenchSummary.minOf(runs)
      val failedRuns = runs.count(!_._2)
      val failedPart = if (failedRuns > 0) s""","failed_runs":$failedRuns""" else ""
      // memo tag: this gate's min shares its family's memoized block —
      // the first family member to run in the JVM paid the build; see
      // the record's memo_isolated block for the solo-JVM cost
      val memoPart = SparkEntry.memoFamilyOf.get(name)
        .map(f => s""","memo":"$f"""").getOrElse("")
      s""""$name":{"runs":$runsJson,"min":${num(min, 3)},"noise":${num(noise, 2)}$failedPart$memoPart}"""
    }.mkString("{", ",", "}")
    writeFullBody(path, sfDir, runsPerQuery, entries, failed, skewJson,
      incrJson, acJson, annJson, total, noiseNote, forkedChunks = 0)
  }

  private def writeFullMerged(path: String, sfDir: String,
      runsPerQuery: Int, entries: String, failed: List[String],
      skewJson: String, incrJson: String, acJson: String, annJson: String,
      total: Double, chunks: Int,
      memoIsolatedJson: String = "{}",
      memoBuildSec: Double = 0.0): Unit = {
    val note =
      "Forked bench: gates ran in " + chunks + " per-chunk child JVMs " +
      "(fresh SparkSession + JIT/codegen state each) because a single " +
      "276-gate session accumulates JVM state that inflated late gates " +
      "3-18x in BENCH_r11 (adjudicated by isolated re-run, round 12). " +
      "Since round 13 each child also clears the Spark cache and forces " +
      "a GC BETWEEN gates (SPARK_GRAFT_BENCH_GATE_GC, default on): the " +
      "r12 residual 2-7x mid-chunk inflation was heap pressure from " +
      "prior gates' localCheckpoint/cached blocks awaiting the async " +
      "ContextCleaner — A/B at the production 8g heap, the flagged " +
      "gates recover to at-or-below their isolated floors with the " +
      "inter-gate GC (events_psi_drift 1.44 -> 0.76 s), so per-gate " +
      "numbers are position-independent. Since round 14 the post-GC " +
      "ContextCleaner drain is event-driven (poll the RDD storage " +
      "listing until the dead blocks are gone, 3 s cap) instead of a " +
      "fixed 3 s sleep, and experiments run only under " +
      "SPARK_GRAFT_BENCH_EXPERIMENTS=1 — the r13 fixed sleep cost " +
      "312 x 3 s and timed out the driver's wall-clock budget " +
      "(BENCH_r13 rc 124). 'min' is the minimum over successful " +
      "'runs' within the owning chunk; 'noise' is max/min across " +
      "successful runs; queries whose noise exceeded 2 were rerun " +
      "adaptively. Compare rounds on 'min'. Since r17 'total_min_sec' " +
      "INCLUDES 'memo_build_sec' — the summed isolated solo-JVM costs " +
      "of the memoized families' shared builds (memo_isolated block), " +
      "measured every forked run — because min-of-N billed those builds " +
      "to nobody (run 1 pays, later runs reuse, the min excludes it). " +
      "For apples-to-apples with pre-r17 records subtract memo_build_sec."
    writeFullBody(path, sfDir, runsPerQuery, entries, failed, skewJson,
      incrJson, acJson, annJson, total, note, forkedChunks = chunks,
      memoIsolatedJson = memoIsolatedJson, memoBuildSec = memoBuildSec)
  }

  private def writeFullBody(path: String, sfDir: String, runsPerQuery: Int,
      entries: String, failed: List[String], skewJson: String,
      incrJson: String, acJson: String, annJson: String, total: Double,
      note: String, forkedChunks: Int,
      memoIsolatedJson: String = "{}",
      memoBuildSec: Double = 0.0): Unit = {
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"sf":"$sfDir","runs_per_query":$runsPerQuery,"total_min_sec":${num(total, 3)},
         |"memo_build_sec":${num(memoBuildSec, 3)},
         |"forked_chunks":$forkedChunks,
         |"note":"$note",
         |"failed":$failedJson,
         |"memo_isolated":$memoIsolatedJson,
         |"skew":$skewJson,
         |"incremental_dedup_vs_stateless":$incrJson,
         |"multipattern_vs_contains":$acJson,
         |"hnsw_vs_flat":$annJson,
         |"queries":$entries}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Planted-hot-key join at bench scale: measures the cure, not just the
    * disease (SURVEY §9 claims salting/AQE handle skew; this produces the
    * numbers). ~95% of a 4x-exploded lineitem lands on ONE key; the dim
    * side (1000 keys) is too big to broadcast in the simulated scenario
    * (autoBroadcastJoinThreshold=-1 — at 100 TB the dim IS too big), so
    * the join must shuffle. Three plans over identical inputs:
    * naive sort-merge (AQE off) = the straggler baseline; saltedJoin
    * (AQE off) = our operator's fix; AQE skew-join = Spark's runtime fix.
    * Emits wall seconds plus max/median shuffle-read ratio of the worst
    * stage so the JSON shows BOTH that skew existed and that the cures
    * flatten it. */
  /** Aho–Corasick vs contains-any at bench scale: the same
    * distinct-patterns-present question answered by (a) ONE automaton
    * pass per document ([[graft.expressions.MultiPatternDistinct]],
    * O(len + hits) regardless of list size) and (b) the naive
    * formulation — one `instr` per pattern per document,
    * O(patterns·len). The pattern list is two-word phrases built from
    * the corpus's own most frequent words, so matches actually fire.
    * At a few hundred patterns the naive plan is already an order of
    * magnitude slower; production blocklists are 10-100x larger, so the
    * measured gap is the floor of the win. min-of-2 per side, identical
    * input scan. */
  /** HNSW vs flat NSW at bench scale: the hierarchy's claim is that a
    * fixed entry reaches any neighborhood in O(log n) hops where the
    * flat walk needs O(diameter) rounds — this produces the numbers on
    * an 8000-vector corpus (the sf embeddings replicated 4x with a
    * deterministic per-copy perturbation). Both graphs build with the
    * SAME base-layer m/IVF settings and are materialized BEFORE timing,
    * so the measured seconds are search-only. Reports recall@10 vs
    * brute force and min-of-2 seconds for the flat walk at 3 and at 5
    * rounds against the HNSW descent (1 round per upper layer + 3 base
    * rounds) at the same beam. */
  private def hnswVsFlatExperiment(spark: SparkSession,
      sfDir: String): String = {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    // operating point (r14, from the sweep recorded in PERF_NOTES): the
    // r13 point (m=8, nLists=64, nProbe=2, beam=16, rounds=3) measured
    // recall 0.316@10 — the base "kNN" graph built from 2/64 IVF cells
    // per node was mostly wrong on near-uniform 64-dim vectors, and no
    // beam can walk a graph whose edges don't point at true neighbors.
    // Build-side quality (nProbe, m) is the lever that matters; it is
    // paid ONCE, untimed (the index persists in production), while the
    // timed search cost only grows with rounds/beam. Env knobs
    // (SPARK_GRAFT_ANN_*) exist for sweeping without a recompile.
    def knob(name: String, dflt: Int): Int =
      sys.env.get(s"SPARK_GRAFT_ANN_$name").map(_.toInt).getOrElse(dflt)
    val m = knob("M", 16)
    val nLists = knob("NLISTS", 64)
    val nProbe = knob("NPROBE", 8)
    val beam = knob("BEAM", 32)
    val rounds = knob("ROUNDS", 4)
    val entries = knob("ENTRIES", 8)
    val upper = knob("UPPER", 1)
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("rep", explode(lit((0 until 4).toArray)))
      .select((col("vec_id") * 4 + col("rep")).as("vec_id"), expr(
        // deterministic perturbation: copy r shifts dim r by 0.05 and
        // every dim by 0.001*r, so replicas are distinct but clustered
        "transform(embedding, (x, i) -> x + CAST(rep AS FLOAT) * " +
          "(CASE WHEN i = rep THEN CAST(0.05 AS FLOAT) " +
          "ELSE CAST(0.001 AS FLOAT) END))").as("embedding"))
      .localCheckpoint()
    val q = corpus.filter(col("vec_id") % 163 === 0).limit(50)
      .localCheckpoint()
    val n = corpus.count()
    val brute = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding",
        10).select(col("query_id"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val flatAdj = Similarity.nswGraph(corpus, "vec_id", "embedding",
      m = m, nLists = nLists, nProbe = nProbe).localCheckpoint()
    val hAdj = Similarity.hnswGraph(corpus, "vec_id", "embedding",
      m = m, maxLevel = 2, nLists = nLists, nProbe = nProbe)
      .localCheckpoint()
    def measure(run: => org.apache.spark.sql.DataFrame): (Double, Double) = {
      var found: Set[(Long, Long)] = Set.empty
      val sec = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        found = run.select(col("query_id"), col("id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        (System.nanoTime() - t0) / 1e9
      }.min
      (sec, found.count(brute.contains).toDouble / brute.size)
    }
    val (f3s, f3r) = measure(Similarity.nswBeamSearch(flatAdj, corpus, q,
      "vec_id", "embedding", k = 10, beam = beam, rounds = 3,
      entries = entries))
    val (f5s, f5r) = measure(Similarity.nswBeamSearch(flatAdj, corpus, q,
      "vec_id", "embedding", k = 10, beam = beam, rounds = 5,
      entries = entries))
    val (hs, hr) = measure(Similarity.hnswSearch(hAdj, corpus, q,
      "vec_id", "embedding", k = 10, maxLevel = 2, beam = beam,
      rounds = rounds, upperRounds = upper, entries = entries))
    s"""{"n_vectors":$n,"n_queries":50,"m":$m,"n_lists":$nLists,""" +
      s""""n_probe":$nProbe,"beam":$beam,"rounds":$rounds,""" +
      s""""entries":$entries,"upper_rounds":$upper,""" +
      s""""flat_r3_sec":${num(f3s, 3)},"flat_r3_recall":${num(f3r, 3)},""" +
      s""""flat_r5_sec":${num(f5s, 3)},"flat_r5_recall":${num(f5r, 3)},""" +
      s""""hnsw_sec":${num(hs, 3)},"hnsw_recall":${num(hr, 3)}}"""
  }

  private def multiPatternExperiment(spark: SparkSession,
      sfDir: String): String = {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text"))
      .withColumn("rep", explode(lit((0 until 4).toArray)))
      .drop("rep")
    val top = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(filter(split(lower(col("text")), "[^a-z]+"),
        t => t =!= "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(32)
      .select(col("w")).collect().map(_.getString(0)).toSeq
    val pats = (for (a <- top; b <- top if a != b) yield s"$a $b").take(1000)
    def timeMin(df: => org.apache.spark.sql.DataFrame): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.count()
        (System.nanoTime() - t0) / 1e9
      }.min
    val acSec = timeMin(docs.select(
      graft.expressions.GraftExpressions
        .multiPatternDistinct(col("text"), pats).as("d")))
    // balanced addition tree: a left-nested 300-term reduce overflows
    // the column-node converter's recursion (and would be a 300-deep
    // codegen expression besides)
    def balancedSum(cs: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
      if (cs.size == 1) cs.head
      else balancedSum(cs.grouped(2)
        .map(g => if (g.size == 2) g(0) + g(1) else g(0)).toSeq)
    val containsSec = timeMin(docs.select(balancedSum(
      pats.map(p => when(instr(col("text"), p) > 0L, 1L).otherwise(0L)))
      .as("d")))
    s"""{"n_patterns":${pats.size},"ac_sec":${num(acSec, 3)},""" +
      s""""contains_any_sec":${num(containsSec, 3)},""" +
      s""""speedup":${num(containsSec / math.max(acSec, 1e-9), 2)}}"""
  }

  private def skewExperiment(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions._
    import graft.metrics.SkewAudit
    val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
      .withColumn("rep", explode(lit((0 until 4).toArray))) // amplify volume
      .withColumn("k",
        when(pmod(xxhash64(col("l_orderkey"), col("rep")), lit(20)) =!= 0, 0L)
          .otherwise(pmod(col("l_orderkey"), lit(1000))))
    val dim = spark.range(1000).select(col("id").as("dk"),
      (col("id") * 7).as("dv"))
    def run(name: String, aqe: Boolean)(q: => org.apache.spark.sql.DataFrame)
        : (Double, Double, Double) = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", -1)
      try {
        val t0 = System.nanoTime()
        val (_, report) = SkewAudit.audit(spark) { q.count() }
        val sec = (System.nanoTime() - t0) / 1e9
        // judge the stage that moved the most ROWS (the join shuffle):
        // its max-task record count is the straggler's load, independent
        // of shuffle compression (repetitive hot keys compress so well
        // that byte metrics invert the story) — the number that decides
        // whether one executor stalls the stage at 100 TB
        val worst = report.filter(_.maxShuffleReadRecords > 0)
          .maxByOption(_.maxShuffleReadRecords)
        (sec,
          worst.map(_.maxShuffleReadRecords / 1e6).getOrElse(0.0),
          worst.map(_.recordSkew).getOrElse(0.0))
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", true)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
    def naiveQ = fact.join(dim, fact("k") === dim("dk"))
      .groupBy(col("dk")).agg(sum(col("l_quantity") * col("dv")).as("s"))
    // factor 64 over 32 shuffle partitions: each partition lands ~2 salt
    // cells of the hot key, so the straggler's load drops ~30x instead of
    // riding the balls-into-bins maximum of a factor==partitions salt
    def saltedQ = graft.operators.Joins
      .saltedJoin(fact, dim, Seq("k"), Seq("dk"), factor = 64)
      .groupBy(col("dk")).agg(sum(col("l_quantity") * col("dv")).as("s"))
    // warm-up: compile codegen for both shapes outside the timed runs
    naiveQ.count(); saltedQ.count()
    val (naiveSec, naiveMaxM, naiveSkew) = run("naive", aqe = false)(naiveQ)
    val (saltedSec, saltedMaxM, saltedSkew) = run("salted", aqe = false)(saltedQ)
    val (aqeSec, aqeMaxM, aqeSkew) = run("aqe", aqe = true)(naiveQ)
    s"""{"naive_sec":${num(naiveSec, 3)},"salted_sec":${num(saltedSec, 3)},"aqe_skewjoin_sec":${num(aqeSec, 3)},""" +
      s""""naive_max_task_mrows":${num(naiveMaxM, 2)},"salted_max_task_mrows":${num(saltedMaxM, 2)},"aqe_max_task_mrows":${num(aqeMaxM, 2)},""" +
      s""""naive_record_skew":${num(naiveSkew, 1)},"salted_record_skew":${num(saltedSkew, 1)},"aqe_record_skew":${num(aqeSkew, 1)}}"""
  }
}
