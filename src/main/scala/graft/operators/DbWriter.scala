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
    val attempt = scala.util.Try {
      graft.util.SparkUtils.withJobDescription(connection.spark,
        s"DbWriter.run($target) -> ${connection.getClass.getSimpleName}") {
        MetricsRecorder.record(connection.spark) {
          connection.writeDfToTarget(df, target, ifExists, options)
        }
      }
    }
    attempt match {
      case scala.util.Success((_, metrics)) =>
        graft.hooks.GraftListeners.fireAfterWrite(target, metrics)
        metrics
      case scala.util.Failure(e) =>
        // reference db_writer.py:183-186: a failed write is not a clean
        // no-op — surface that the target may hold partial data
        org.slf4j.LoggerFactory.getLogger(getClass).error(
          s"error writing to $target — target MAY contain partially written data", e)
        throw e
    }
  }
}
