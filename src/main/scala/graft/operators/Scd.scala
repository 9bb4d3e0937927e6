package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Kimball SCD Type 2) versioning — the
  * warehouse-side counterpart of the reader/writer machinery: turn a
  * change log of dimension snapshots into versioned rows with validity
  * intervals, and answer "what did the dimension look like at time T"
  * without mutating anything (append-only history, reproducible
  * backfills — the property a 100 TB pipeline needs to re-run last
  * month's training mix byte-for-byte).
  */
object Scd {

  /** Build SCD2 version rows from a change log with ONE row per
    * (key, ts) — each row the full attribute tuple observed at `ts`.
    * Consecutive rows with unchanged attributes collapse (a re-observed
    * identical snapshot opens no new version; a value that changes BACK
    * later opens a fresh one); `valid_from` = the observation ts,
    * `valid_to` = the next version's start (NULL while current),
    * `is_current` flags the open version.
    *
    * NULL attributes compare null-safely (NULL -> NULL is "unchanged").
    * Everything is two keyed per-key windows (detect-change lag, then
    * close-interval lead on the survivors) — no global ordering, no
    * driver state; the plan scales with the log, not the key count. */
  def scd2Build(changeLog: DataFrame, keyCol: String, attrCols: Seq[String],
                tsCol: String): DataFrame = {
    require(attrCols.nonEmpty, "scd2Build needs at least one attribute")
    val attrs = struct(attrCols.map(col): _*)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val changed = changeLog
      .withColumn("__prev", lag(attrs, 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> attrs))
      .drop("__prev")
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to",
        lead(col(tsCol), 1).over(
          Window.partitionBy(col(keyCol)).orderBy(col(tsCol))))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tsCol)
  }

  /** Point-in-time read over [[scd2Build]] output: the rows whose
    * validity interval covers `asOf` (`valid_from <= asOf < valid_to`,
    * open versions unbounded). Map-only — at scale this is the partition-
    * prunable filter a time-travel catalog compiles to. */
  def scd2AsOf(versions: DataFrame, asOf: Column): DataFrame =
    versions.filter(col("valid_from") <= asOf &&
      (col("valid_to").isNull || asOf < col("valid_to")))

  /** Last-writer-wins CDC apply (the Type-1 sibling of [[scd2Build]]):
    * fold a change stream of upserts ('U'/'I' with the full attribute
    * tuple) and deletes ('D') into a base snapshot. Per key, the change
    * with the greatest `ts` wins (ties break by op then attributes —
    * document one row per (key, ts) upstream for a clean contract);
    * a winning delete removes the key, a winning upsert replaces the
    * attributes, untouched base rows pass through.
    *
    * One keyed window over the changes (latest-per-key) + one outer
    * join against the base — the standard merge shape; at 100 TB both
    * sides shuffle once on the key and nothing collects. */
  def applyCdc(base: DataFrame, changes: DataFrame, keyCol: String,
               attrCols: Seq[String], tsCol: String,
               opCol: String): DataFrame = {
    require(attrCols.nonEmpty, "applyCdc needs at least one attribute")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(opCol).desc,
        struct(attrCols.map(col): _*).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(keyCol) +: col(opCol).as("__op") +:
        attrCols.map(c => col(c).as(s"__c_$c")): _*)
    base.join(latest, Seq(keyCol), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(col(keyCol) +: attrCols.map(c =>
        when(col("__op").isNotNull, col(s"__c_$c"))
          .otherwise(col(c)).as(c)): _*)
  }
}
