package graft.operators

import graft.connections.{DbConnection, IfExists}
import graft.metrics.{MetricsRecorder, SparkCommandMetrics}
import org.apache.spark.sql.DataFrame

/** Write a DataFrame to a target with if-exists semantics + metrics capture.
  * Port of reference onetl/db/db_writer/db_writer.py:132-193: rejects
  * streaming frames (:154-155) and records command metrics around the write
  * (:165). */
final case class DbWriter(connection: DbConnection,
                          target: String,
                          ifExists: IfExists = IfExists.Append,
                          options: Map[String, String] = Map.empty) {

  def run(df: DataFrame): SparkCommandMetrics = {
    require(!df.isStreaming,
      "DbWriter cannot write streaming DataFrames — use Structured " +
        "Streaming sinks (graft.streaming) for those")
    graft.hooks.GraftListeners.fireBeforeWrite(target, df)
    val (_, metrics) = graft.util.SparkUtils.withJobDescription(connection.spark,
      s"DbWriter.run($target) -> ${connection.getClass.getSimpleName}") {
      MetricsRecorder.record(connection.spark) {
        connection.writeDfToTarget(df, target, ifExists, options)
      }
    }
    graft.hooks.GraftListeners.fireAfterWrite(target, metrics)
    metrics
  }
}
