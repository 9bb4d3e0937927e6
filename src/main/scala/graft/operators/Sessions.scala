package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the batch twin of
  * [[graft.streaming]]'s stateful sessionizer.
  *
  * One shuffle on the key, one within-key sort; the session index is a
  * running sum of new-session markers (`gap` exceeded vs previous event),
  * so the whole computation is two window functions over the same sorted
  * partition — no self-join, no state store.
  */
object Sessions {

  /** Adds `session_seq` (0-based per-key session index) to `df`.
    * `tsCol` must be a timestamp; events exactly `gapSeconds` apart stay
    * in the same session (strict `>` starts a new one). */
  def assign(df: DataFrame, keyCol: String, tsCol: String,
             gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, "gap must be positive")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull, lit(0))
      .when(col(tsCol).cast("double") - prev.cast("double") > gapSeconds, lit(1))
      .otherwise(lit(0))
    df.withColumn("session_seq",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
  }

  /** Per-key, per-session aggregate: event count and span in seconds. */
  def stats(df: DataFrame, keyCol: String, tsCol: String,
            gapSeconds: Long): DataFrame =
    assign(df, keyCol, tsCol, gapSeconds)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        (max(col(tsCol)).cast("double") - min(col(tsCol)).cast("double"))
          .cast("long").as("span_sec"))
}
