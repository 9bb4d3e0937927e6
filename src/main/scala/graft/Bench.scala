package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    // Warm every query once at the SAME scale factor that gets timed, so
    // the timed pass measures steady-state operator cost: the first
    // execution of each plan shape compiles its generated Java, and plan
    // shapes can differ between scale factors (e.g. broadcast vs
    // sort-merge), so warming at a smaller sf would leave compilation
    // inside the timed run. Warm failures are loud — a silently skipped
    // warm-up would re-inflate the timings it exists to remove.
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $name FAILED: ${e.getMessage}")
      }
    }
    var failed = List.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // 3-decimal values keep the whole line inside the driver's ~4 KB tail
    // capture — full-precision doubles pushed the JSON past it, so the
    // driver recorded rc/tail but failed to parse the line (BENCH_r03)
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val skewJson = try skewExperiment(spark, sfDir) catch { case e: Throwable =>
      System.err.println(s"[bench] skew experiment FAILED: ${e.getMessage}")
      "{}"
    }
    // a failed query must not masquerade as a fast success: its name is
    // listed and the run's exit signal is the non-empty "failed" array
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"skew":$skewJson,"sf":"$sfDir"}""")
    spark.stop()
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
    f"""{"naive_sec":$naiveSec%.3f,"salted_sec":$saltedSec%.3f,"aqe_skewjoin_sec":$aqeSec%.3f,""" +
      f""""naive_max_task_mrows":$naiveMaxM%.2f,"salted_max_task_mrows":$saltedMaxM%.2f,"aqe_max_task_mrows":$aqeMaxM%.2f,""" +
      f""""naive_record_skew":$naiveSkew%.1f,"salted_record_skew":$saltedSkew%.1f,"aqe_record_skew":$aqeSkew%.1f}"""
  }
}
