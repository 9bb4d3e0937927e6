package graft.metrics

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Aggregated metrics of Spark commands executed while a recorder was
  * attached. Mirrors the reference's SparkCommandMetrics shape
  * (onetl/_metrics/command.py, input.py, output.py, executor.py). */
final case class SparkCommandMetrics(inputRows: Long, inputBytes: Long,
                                     outputRows: Long, outputBytes: Long,
                                     runTimeMillis: Long, cpuTimeNanos: Long,
                                     diskSpillBytes: Long, memorySpillBytes: Long,
                                     peakExecutionMemory: Long) {
  def isEmpty: Boolean = inputRows == 0 && outputRows == 0 && runTimeMillis == 0
}

/** `SparkListener`-based metrics capture around a read/write command.
  *
  * Reference implements this through a Py4J callback server
  * (onetl/_metrics/recorder.py:15-26, listener/listener.py:19-133); on the
  * JVM it is a plain listener. Usage:
  * {{{
  *   val metrics = MetricsRecorder.record(spark) { df.write.parquet(p) }
  * }}}
  */
final class MetricsRecorder extends SparkListener {
  private val inputRows = new LongAdder; private val inputBytes = new LongAdder
  private val outputRows = new LongAdder; private val outputBytes = new LongAdder
  private val runTime = new LongAdder; private val cpuTime = new LongAdder
  private val diskSpill = new LongAdder; private val memSpill = new LongAdder
  private val peakMem = new AtomicLong(0)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      inputRows.add(m.inputMetrics.recordsRead)
      inputBytes.add(m.inputMetrics.bytesRead)
      outputRows.add(m.outputMetrics.recordsWritten)
      outputBytes.add(m.outputMetrics.bytesWritten)
      runTime.add(m.executorRunTime)
      cpuTime.add(m.executorCpuTime)
      diskSpill.add(m.diskBytesSpilled)
      memSpill.add(m.memoryBytesSpilled)
      peakMem.updateAndGet(p => math.max(p, m.peakExecutionMemory))
    }
  }

  def snapshot: SparkCommandMetrics = SparkCommandMetrics(
    inputRows.sum, inputBytes.sum, outputRows.sum, outputBytes.sum,
    runTime.sum, cpuTime.sum, diskSpill.sum, memSpill.sum, peakMem.get)
}

object MetricsRecorder {
  /** Run `body` with a recorder attached; returns (result, metrics). */
  def record[A](spark: SparkSession)(body: => A): (A, SparkCommandMetrics) = {
    val rec = new MetricsRecorder
    spark.sparkContext.addSparkListener(rec)
    try {
      val result = body
      // Listener bus is async; wait for queued task-end events to drain.
      org.apache.spark.GraftSparkBridge.waitListenerBus(spark.sparkContext, 30000L)
      (result, rec.snapshot)
    } finally spark.sparkContext.removeSparkListener(rec)
  }
}
