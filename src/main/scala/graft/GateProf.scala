package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Debug utility (guide §1: measure first): run named gates under the
  * BENCH session shape (local[$SPARK_GRAFT_CPUS], same confs) with a
  * job-level listener, printing every Spark job's wall time and
  * description plus the per-run gate total. This is how a gate's
  * seconds are attributed to its stages — localCheckpoint jobs, index
  * appends, stream micro-batches — before touching any code.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.GateProf similarity_nsw_search"
  *
  * `SPARK_GRAFT_PROF_RUNS` (default 2) repeats each gate — run 1 carries
  * codegen warmup, so read run 2+ for steady state. */
object GateProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROF_RUNS", "2").toInt.max(1)
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
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    // (jobId, startMs, endMs, desc) — kept until the run prints, so the
    // report can also show DRIVER GAPS: wall time where no job ran at
    // all (plan/analysis/metastore/commit work between actions)
    val ended = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        starts.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(je.jobId, (je.time, "?"))
        ended.add((je.jobId, t0, je.time, desc))
      }
    })
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      (1 to runs).foreach { r =>
        ended.clear()
        val w0 = System.currentTimeMillis()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val w1 = System.currentTimeMillis()
        // drain the async listener bus before printing (private API —
        // a short sleep is enough for a profiler)
        Thread.sleep(300)
        println(f"==== $name run $r: $sec%.3f s ($n rows), jobs: ====")
        val jobs = {
          val b = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, String)]
          ended.forEach(j => b += j)
          b.sortBy(_._2).toSeq
        }
        var cursor = w0
        jobs.foreach { case (id, s0, s1, desc) =>
          val gap = s0 - cursor
          if (gap > 80)
            println(f"    --- driver gap ${gap / 1000.0}%7.3f s (before job $id)")
          println(f"    job $id%4d  +${(s0 - w0) / 1000.0}%7.3f  ${(s1 - s0) / 1000.0}%7.3f s  $desc")
          cursor = math.max(cursor, s1)
        }
        if (w1 - cursor > 80)
          println(f"    --- driver gap ${(w1 - cursor) / 1000.0}%7.3f s (after last job)")
      }
    }
    spark.stop()
  }
}
