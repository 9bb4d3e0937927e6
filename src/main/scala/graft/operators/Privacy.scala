package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy / re-identification audits over a dataset's quasi-identifier
  * columns — the release-gate a data-governance pipeline runs before a
  * corpus (or its metadata) leaves the curation boundary. These complement
  * the row-level PII scrubbing in [[graft.functions.TextFunctions]]:
  * scrubbing removes direct identifiers; these audits measure whether the
  * REMAINING attribute combinations still single people (or documents)
  * out.
  *
  * Both audits are one map-combinable aggregate over the quasi-identifier
  * key — the word-count shape: no window, no self-join, output bounded by
  * the number of distinct combinations, which is what makes them runnable
  * as a routine check on a 100 TB table.
  */
object Privacy {

  /** k-anonymity audit (Sweeney 2002): a row is k-anonymous when at
    * least `k` rows share its full quasi-identifier combination; any
    * combination with fewer is a re-identification risk. Returns one row
    * per distinct combination: (quasiCols..., n long, at_risk boolean).
    * NULL quasi-values group as their own combination (SQL GROUP BY
    * semantics) — an absent attribute is itself identifying.
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
  }

  /** l-diversity audit (Machanavajjhala et al. 2007): k-anonymity is not
    * enough when everyone in an equivalence class shares the same
    * SENSITIVE value — the attacker learns it without singling anyone
    * out. A class is (distinct) l-diverse when its sensitive column
    * takes at least `l` distinct values. Returns one row per distinct
    * quasi combination: (quasiCols..., n long, n_sensitive long,
    * at_risk boolean). NULL sensitive values are excluded from the
    * distinct count (SQL count-distinct semantics, identical in every
    * engine) — an all-NULL class therefore reports 0 and is at risk.
    */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("at_risk", col("n_sensitive") < l)
  }
}
