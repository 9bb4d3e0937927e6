package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Hardened after round 16, whose driver verify produced an EMPTY
  * correctness record: the old shape ran all 367 gates sequentially in
  * ONE JVM (accumulating localCheckpoint blocks and cached relations the
  * whole way — the exact heap-pressure disease the bench had to fork
  * chunks and inter-gate-GC to survive, r11–r13) and wrote
  * oracle_sql.json LAST, so a JVM death or timeout anywhere in the gate
  * loop zeroed the whole round. Now it fails PARTIAL, never empty:
  *
  *  1. oracle_sql.json is written FIRST, before any gate runs — the
  *     driver's comparator scores whatever gate dirs exist against it.
  *  2. Gates run in alphabetical chunks, each chunk in a freshly forked
  *     child JVM (same flags/classpath, SPARK_GRAFT_VERIFY_ONLY names
  *     the chunk), so per-JVM state is bounded to one chunk and a dead
  *     chunk loses only its own remaining gates. A chunk whose child
  *     exits nonzero reruns in-process — degraded beats a hole.
  *  3. Chunk children run PARALLEL (small pool, guide §2.6): verify has
  *     no timing contract, only a wall-clock budget, and at the tiny
  *     correctness SFs the gates are driver-overhead-bound, so two
  *     in-flight chunks overlap well. SPARK_GRAFT_VERIFY_PAR tunes it.
  *  4. Inside a chunk: per-gate job-group time-box (a hung gate is
  *     cancelled and recorded as that gate's failure, not the chunk's)
  *     and inter-gate clearCache()+GC hygiene every few gates
  *     (mirroring Bench.interGateCleanup) so checkpoint blocks from
  *     finished gates are freed deterministically. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    new java.io.File(outDir).mkdirs()
    // comma-separated gate filter for fast local iteration on one query
    // (same contract as Bench's SPARK_GRAFT_BENCH_ONLY); driver runs
    // unset. ONLY-mode is also how a forked chunk child names its work.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // manifest FIRST: a partial verify must still be scoreable. Chunk
    // children (marked by the parent) never touch it; a standalone
    // ONLY-mode run writes a manifest restricted to its own gates so
    // check_oracle.py stays usable for local iteration.
    val isChild = sys.env.getOrElse("SPARK_GRAFT_VERIFY_CHILD", "0") == "1"
    if (!isChild) writeOracleManifest(outDir, only)
    val fork = sys.env.getOrElse("SPARK_GRAFT_VERIFY_FORK", "1") == "1"
    if (only.isEmpty && fork) runForked(sfDir, outDir)
    else runInProcess(sfDir, outDir, only)
  }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness. */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def writeOracleManifest(outDir: String,
      only: Option[Set[String]]): Unit = {
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }

  /** Sorted chunks, one forked JVM per chunk, a bounded pool of chunks
    * in flight. Mirrors Bench.runForked; parallel because verify is
    * wall-clock-budgeted, not timed. */
  private def runForked(sfDir: String, outDir: String): Unit = {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val chunkSize =
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_CHUNK", "70").toInt.max(1)
    val par =
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "2").toInt.max(1)
    val chunks = names.grouped(chunkSize).toVector
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
    val cp = sys.props("java.class.path")
    def runChunk(i: Int, chunk: Seq[String]): Boolean =
      try {
        val cmd = new java.util.ArrayList[String]()
        cmd.add(javaBin)
        jvmArgs.forEach(a => cmd.add(a))
        cmd.add("-cp"); cmd.add(cp); cmd.add("graft.Verify")
        cmd.add(sfDir); cmd.add(outDir)
        val pb = new ProcessBuilder(cmd)
        pb.environment().put("SPARK_GRAFT_VERIFY_ONLY", chunk.mkString(","))
        pb.environment().put("SPARK_GRAFT_VERIFY_FORK", "0")
        pb.environment().put("SPARK_GRAFT_VERIFY_CHILD", "1")
        pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        pb.start().waitFor() == 0
      } catch { case e: Exception =>
        System.err.println(s"[verify] fork chunk $i FAILED: ${e.getMessage}")
        false
      }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = chunks.zipWithIndex.map { case (chunk, i) =>
      Future((i, chunk, runChunk(i, chunk)))
    }
    val results =
      try Await.result(Future.sequence(futures), Duration.Inf)
      finally pool.shutdown()
    // failed chunks rerun sequentially in-process: each gate still
    // try/caught individually, so at worst the chunk's own bad gate is
    // the only hole
    results.filterNot(_._3).foreach { case (i, chunk, _) =>
      System.err.println(s"[verify] chunk $i: falling back in-process")
      runInProcess(sfDir, outDir, Some(chunk.toSet))
    }
  }

  private def runInProcess(sfDir: String, outDir: String,
      only: Option[Set[String]]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // a hung gate must cost its timeout, not the whole run: cancel the
    // gate's job group at the deadline and move on (driver-side hangs —
    // planning, metastore — are not interruptible this way, but every
    // observed death mode has been executor work)
    val gateTimeoutSec = sys.env
      .getOrElse("SPARK_GRAFT_VERIFY_GATE_TIMEOUT", "240").toLong.max(1)
    val watchdog =
      java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
        val t = new Thread(r, "verify-gate-watchdog"); t.setDaemon(true); t
      })
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    var sinceGc = 0
    selected.foreach { case (name, fn) =>
      spark.sparkContext.setJobGroup(name, s"verify $name",
        interruptOnCancel = true)
      val cancel = watchdog.schedule(new Runnable {
        def run(): Unit = {
          System.err.println(s"[verify] $name TIMED OUT (${gateTimeoutSec}s), cancelling")
          try spark.sparkContext.cancelJobGroup(name)
          catch { case _: Throwable => () }
        }
      }, gateTimeoutSec, java.util.concurrent.TimeUnit.SECONDS)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally {
        cancel.cancel(false)
        spark.sparkContext.clearJobGroup()
      }
      // inter-gate hygiene (Bench.interGateCleanup's cheap sibling):
      // free finished gates' checkpoint blocks and cached relations
      // before they stack up across the chunk. Every 8 gates rather
      // than every gate — verify is wall-clock-budgeted and a full GC
      // on an 8g heap is not free; the forked chunks already bound
      // accumulation to one chunk's worth.
      sinceGc += 1
      if (sinceGc >= 8) {
        sinceGc = 0
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        System.gc()
      }
    }
    watchdog.shutdownNow()
    spark.stop()
  }
}
