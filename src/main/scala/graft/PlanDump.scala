package graft
import org.apache.spark.sql.SparkSession

/** Debug utility: print the formatted physical plan of selected SparkEntry
  * queries (all of them when no names are given). Used to author and keep
  * docs/PLANS.md and docs/plans/ honest — run with
  * `sbt "runMain graft.PlanDump q1_pricing_summary q_asof_join"`.
  *
  * `SPARK_GRAFT_PLAN_EXEC=1` EXECUTES each query first and prints the
  * FINAL adaptive plan (AQE re-optimizes at runtime: coalesced
  * shuffle reads, demoted/promoted broadcasts, skew splits only exist
  * in the executed plan — the static explain is the plan Spark starts
  * from, not the one it finishes with). Pair with
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32` to see
  * the bench-shaped plan. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val exec = sys.env.get("SPARK_GRAFT_PLAN_EXEC").contains("1")
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
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"==== $name ====")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (exec) df.count() // materialize so AQE finalizes every stage
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      catch { case e: Throwable => println(s"(failed: ${e.getMessage})") }
    }
    spark.stop()
  }
}
