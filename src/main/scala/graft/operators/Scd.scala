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
}
