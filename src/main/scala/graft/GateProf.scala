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
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
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
        lines.add(f"    job ${je.jobId}%4d  ${(je.time - t0) / 1000.0}%7.3f s  $desc")
      }
    })
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      (1 to runs).foreach { r =>
        lines.clear()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        // drain the async listener bus before printing (private API —
        // a short sleep is enough for a profiler)
        Thread.sleep(300)
        println(f"==== $name run $r: $sec%.3f s ($n rows), jobs: ====")
        lines.forEach(l => println(l))
      }
    }
    spark.stop()
  }
}
