package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

/** Pins the crash-recovery contract of [[Bucketing.compactBucketed]]'s
  * rename-rename-drop swap: at every crash point at least one COMPLETE
  * copy of the data exists under a known name, and
  * [[Bucketing.recoverCompaction]] restores the live name from it. Each
  * test stages one intermediate state the swap can crash in (metastore
  * renames simulate the crash exactly — the swap IS three metastore ops)
  * and asserts recovery lands on the right copy, cleans every straggler,
  * and keeps the bucketed layout (the whole point of the table). */
class CompactionSwapSpec extends SparkSpec {
  import spark.implicits._

  private def exchanges(plan: SparkPlan): Seq[Exchange] = {
    val resolved = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    resolved.collect { case e: Exchange => e }
  }

  // live copy carries a replay-duplicated row (3 rows); the compacted
  // copy is its distinct() (2 rows) — row counts identify which copy
  // recovery chose
  private val liveRows = Seq((1L, "a"), (1L, "a"), (2L, "b"))
  private def stage(table: String, liveAs: Option[String],
                    compactExists: Boolean, oldAs: Boolean): Unit = {
    val live = liveRows.toDF("k", "s")
    liveAs.foreach(n => Bucketing.writeBucketed(live, n, 2, Seq("k")))
    if (oldAs) Bucketing.writeBucketed(live, s"${table}__old", 2, Seq("k"))
    if (compactExists)
      Bucketing.writeBucketed(live.distinct(), s"${table}__compact", 2, Seq("k"))
  }
  private def dropAll(table: String): Unit =
    Seq(table, s"${table}__compact", s"${table}__old")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("crash between the two renames (live gone, __old + __compact): " +
       "recovery prefers the completed compacted copy") {
    val t = "graft_swap_mid"
    try {
      stage(t, liveAs = None, compactExists = true, oldAs = true)
      Bucketing.recoverCompaction(spark, t)
      assert(spark.catalog.tableExists(t))
      assert(spark.table(t).count() === 2L, "must restore the COMPACT copy")
      assert(!spark.catalog.tableExists(s"${t}__compact"))
      assert(!spark.catalog.tableExists(s"${t}__old"))
    } finally dropAll(t)
  }

  test("crash before the final DROP (new live + __old): straggler dropped, " +
       "live untouched") {
    val t = "graft_swap_predrop"
    try {
      // live is already the compacted table at this crash point
      Bucketing.writeBucketed(liveRows.toDF("k", "s").distinct(), t, 2, Seq("k"))
      Bucketing.writeBucketed(liveRows.toDF("k", "s"), s"${t}__old", 2, Seq("k"))
      Bucketing.recoverCompaction(spark, t)
      assert(spark.table(t).count() === 2L)
      assert(!spark.catalog.tableExists(s"${t}__old"))
    } finally dropAll(t)
  }

  test("crash before the first rename (live + stale __compact): live wins, " +
       "straggler dropped") {
    val t = "graft_swap_prerename"
    try {
      stage(t, liveAs = Some(t), compactExists = true, oldAs = false)
      Bucketing.recoverCompaction(spark, t)
      assert(spark.table(t).count() === 3L, "live copy must be kept as-is")
      assert(!spark.catalog.tableExists(s"${t}__compact"))
    } finally dropAll(t)
  }

  test("only __old survives: recovery restores it as live") {
    val t = "graft_swap_oldonly"
    try {
      stage(t, liveAs = None, compactExists = false, oldAs = true)
      Bucketing.recoverCompaction(spark, t)
      assert(spark.catalog.tableExists(t))
      assert(spark.table(t).count() === 3L)
      assert(!spark.catalog.tableExists(s"${t}__old"))
    } finally dropAll(t)
  }

  test("recovery is idempotent and a no-op on a clean table") {
    val t = "graft_swap_clean"
    try {
      stage(t, liveAs = Some(t), compactExists = false, oldAs = false)
      Bucketing.recoverCompaction(spark, t)
      Bucketing.recoverCompaction(spark, t) // second run must change nothing
      assert(spark.table(t).count() === 3L)
      assert(!spark.catalog.tableExists(s"${t}__compact"))
      assert(!spark.catalog.tableExists(s"${t}__old"))
    } finally dropAll(t)
  }

  test("recovered table keeps its bucketed layout (agg on the key plans " +
       "zero Exchange) and a later compaction heals the stragglers itself") {
    val t = "graft_swap_layout"
    try {
      stage(t, liveAs = None, compactExists = true, oldAs = true)
      Bucketing.recoverCompaction(spark, t)
      // renames are metastore-only: the restored table must still expose
      // HashPartitioning(k) — the layout the index operators rely on
      val agg = spark.table(t).groupBy($"k").agg(count(lit(1)).as("n"))
      assert(agg.count() === 2L)
      assert(exchanges(agg.queryExecution.executedPlan).isEmpty,
        "bucket-key aggregation on the recovered table must not shuffle")
      // stage ANOTHER crash, then run a normal compaction: its leading
      // recoverCompaction call must heal first, then compact to distinct
      Bucketing.writeBucketed(liveRows.toDF("k", "s"),
        s"${t}__compact", 2, Seq("k"))
      Bucketing.compactBucketed(spark, t, 2, Seq("k"), dropDuplicates = true)
      assert(spark.table(t).count() === 2L)
      assert(!spark.catalog.tableExists(s"${t}__compact"))
      assert(!spark.catalog.tableExists(s"${t}__old"))
    } finally dropAll(t)
  }
}
