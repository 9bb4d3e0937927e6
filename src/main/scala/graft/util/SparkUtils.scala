package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small Spark utilities ported from the reference's _util/spark.py. */
object SparkUtils {

  /** Label jobs in the Spark UI for the duration of `body`, restoring the
    * previous description (reference _util/spark.py:204
    * `override_job_description`). */
  def withJobDescription[A](spark: SparkSession, description: String)(body: => A): A = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(description)
    try body finally sc.setJobDescription(prev)
  }

  /** Total executor cores available to the app (reference
    * _util/spark.py:149 `get_executor_total_cores`). In local[N] mode this
    * is N. */
  def executorTotalCores(spark: SparkSession): Int =
    spark.sparkContext.defaultParallelism

  /** Rough in-memory size estimate of a frame's plan output (reference
    * _util/spark.py:132 `estimate_dataframe_size` uses the same
    * SizeEstimator idea); here we use Catalyst's logical plan statistics,
    * which also power broadcast decisions — i.e. the number that actually
    * matters for planning. */
  def estimateDataFrameBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** Strip trailing semicolon + dedent (reference _util/sql.py:3). */
  def clearStatement(statement: String): String =
    statement.linesIterator.map(_.stripLeading()).mkString("\n").trim.stripSuffix(";").trim
}
