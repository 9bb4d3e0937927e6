package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange

/** The bucketed fingerprint index exists for what is ABSENT from the
  * anti-join plan: the historical index side must have NO Exchange — only
  * the incoming batch may shuffle — and the index must be appendable so
  * ingestion resumes without a rebuild. */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def exchanges(plan: SparkPlan): Seq[Exchange] = {
    val resolved = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    resolved.collect { case e: Exchange => e }
  }

  private val hist = Seq(
    (1L, "history document one about rivers and banks"),
    (2L, "history document two about spark and shuffles"),
    (3L, "history document three about bucketed layouts")
  ).toDF("doc_id", "text")

  test("two-batch resume: appended fps kill batch-1 re-ingestions in batch 2") {
    val table = "graft_fp_idx_resume"
    Dedup.buildFingerprintIndexTable(hist, "text", table, buckets = 4)
    try {
      val batch1 = Seq(
        (10L, "history document one about rivers and banks"), // killed by index
        (11L, "brand new content in batch one"),
        (12L, "brand new content in batch one"), // in-batch dup of 11
        (13L, "more new content in batch one")
      ).toDF("doc_id", "text")
      val s1 = Dedup.exactDedupAgainstIndexTable(batch1, "doc_id", "text", table)
        .localCheckpoint()
      assert(s1.select($"doc_id").as[Long].collect().sorted.toSeq === Seq(11L, 13L))
      Dedup.appendToFingerprintIndexTable(s1, "text", table, buckets = 4)
      val batch2 = Seq(
        (20L, "brand new content in batch one"),   // killed by APPENDED fp
        (21L, "history document two about spark and shuffles"), // killed by original index
        (22L, "genuinely new in batch two")
      ).toDF("doc_id", "text")
      val s2 = Dedup.exactDedupAgainstIndexTable(batch2, "doc_id", "text", table)
      assert(s2.select($"doc_id").as[Long].collect().toSeq === Seq(22L))
      // the table stayed bucketed through the append (still one spec)
      assert(spark.table(table).count() === 5L) // 3 hist + 2 batch-1 fps
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("anti-join shuffles ONLY the batch side; plain parquet index shuffles both") {
    val table = "graft_fp_idx_plan"
    Dedup.buildFingerprintIndexTable(hist, "text", table, buckets = 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val batch = Seq((10L, "x"), (11L, "y"), (12L, "z")).toDF("doc_id", "text")
      val kept = Dedup.exactDedupAgainstIndexTable(batch, "doc_id", "text", table)
      kept.count()
      val ex = exchanges(kept.queryExecution.executedPlan)
      assert(ex.size === 1,
        s"bucketed index anti-join must shuffle only the batch, found: ${ex.map(_.nodeName)}")
      // sanity — the detector sees the second shuffle when the index is
      // a plain (unbucketed) parquet directory
      val dir = java.nio.file.Files.createTempDirectory("fp_idx_plain").toString
      Dedup.buildFingerprintIndex(hist, "text", dir)
      val keptPlain = Dedup.exactDedupAgainstIndex(batch, "doc_id", "text", dir)
      keptPlain.count()
      assert(exchanges(keptPlain.queryExecution.executedPlan).size === 2)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }
}
