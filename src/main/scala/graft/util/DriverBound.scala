package graft.util

import org.apache.spark.sql.{DataFrame, Row}

/** Hard bound for driver-side sidecar collects.
  *
  * Every `.collect()` in the operator layer is a SIDECAR — a register,
  * calendar, centroid table or k-row summary whose size is bounded by a
  * sketch parameter or a column's cardinality, never by row count. A
  * comment stating that bound protects nobody: pass a mistakenly
  * high-cardinality column (an id, a URL) at 100× scale and the driver
  * dies with an opaque OOM. This helper makes the bound MECHANICAL:
  * `limit(cap + 1)` caps what can ever reach the driver (the failure
  * path costs cap+1 rows of memory, not the full frame), then a loud
  * `require` names the operator and the fix.
  */
object DriverBound {

  /** Collect at most `cap` rows, failing loudly if the frame holds
    * more. Row order is preserved for ordered frames (LIMIT after SORT
    * takes the first rows in order). */
  def collectBounded(df: DataFrame, cap: Int, what: String): Array[Row] = {
    require(cap >= 1, s"$what: cap must be >= 1, got $cap")
    val rows = df.limit(cap + 1).collect()
    require(rows.length <= cap,
      s"$what: driver-side sidecar exceeds $cap rows — the column or " +
        "parameter driving it has far higher cardinality than this " +
        "operator budgets for (an id/URL passed as a category, a " +
        "register that should be bounded). Aggregate first, pick a " +
        "true categorical, or raise the cap only if cap rows of " +
        "driver memory are genuinely affordable.")
    rows
  }
}
