package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-level repetition metrics — the "repetitious text" family of
  * quality filters (most-frequent-token concentration and vocabulary
  * diversity). Pipelines drop documents whose top token dominates (boiler-
  * plate, keyword stuffing, degenerate generations) or whose distinct-token
  * ratio collapses (copy-paste loops).
  *
  * Shape: explode → two map-side-combined aggregations, all counts — no
  * text moves after tokenization, and every step is reproducible in plain
  * SQL for the oracle gate. Documents with zero tokens drop out (no
  * denominator).
  */
object TextMetrics {

  /** Per-document: `top_token_frac` = occurrences of the most frequent
    * token / total tokens; `distinct_token_frac` = distinct tokens / total
    * tokens. Both rounded to 6 decimals for cross-engine hash parity. */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(
        round(max(col("cnt")).cast("double") / sum(col("cnt")).cast("double"), 6)
          .as("top_token_frac"),
        round(count(lit(1)).cast("double") / sum(col("cnt")).cast("double"), 6)
          .as("distinct_token_frac"))
  }
}
