package graft.connections

import graft.dialects.{Dialect, GenericDialect}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Kafka as a BOUNDED batch source/sink — the reference's model
  * (kafka/connection.py:246-335): one topic read between offset windows via
  * `startingOffsets`/`endingOffsets` JSON, never Structured Streaming
  * (streaming is an explicit reference non-goal; our graft.streaming module
  * adds it as an extension).
  *
  * The spark-sql-kafka package is not shipped in this environment, so
  * `load()` would fail at runtime; all planning logic (offset JSON, column
  * contract, fixed schema) is pure and unit-tested.
  */
object KafkaPlanner {
  /** Fixed read schema (reference kafka/connection.py:334). */
  val readSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType, nullable = false),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Columns a Kafka write may carry (reference kafka/connection.py:297-311). */
  val writableColumns: Set[String] =
    Set("key", "value", "topic", "partition", "headers")

  /** Per-partition offset window JSON:
    * `{"topic":{"0":123,"1":456}}`. Partitions present in `stop` but
    * absent in `start` default to offset 0
    * (reference kafka/connection.py:272-276). */
  def offsetsJson(topic: String, offsets: Map[Int, Long],
                  fillFrom: Set[Int] = Set.empty): String = {
    val all = offsets ++ (fillFrom -- offsets.keySet).map(_ -> 0L)
    val inner = all.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p": $o""" }.mkString(", ")
    s"""{"$topic": {$inner}}"""
  }

  def readOptions(topic: String,
                  startOffsets: Option[Map[Int, Long]],
                  endOffsets: Option[Map[Int, Long]]): Map[String, String] = {
    val partitions =
      startOffsets.map(_.keySet).getOrElse(Set.empty) ++
        endOffsets.map(_.keySet).getOrElse(Set.empty)
    Map("subscribe" -> topic,
      "startingOffsets" -> startOffsets.map(o => offsetsJson(topic, o, partitions))
        .getOrElse("earliest"),
      "endingOffsets" -> endOffsets.map(o => offsetsJson(topic, o, partitions))
        .getOrElse("latest"))
  }

  /** Clamp an HWM window into the topic's live offset range, one entry
    * per partition (reference kafka/connection.py:498-553): the probe
    * returns `beginningOffsets`/`endOffsets` for every partition, then
    * per partition min = max(window_start, beginning) and
    * max = min(window_stop, end). A window side that doesn't mention a
    * partition falls back to the live bound, so retention-expired stored
    * offsets snap forward to `beginning` instead of under-reading. */
  def clampWindow(beginning: Map[Int, Long], end: Map[Int, Long],
                  windowStart: Option[Map[Int, Long]],
                  windowStop: Option[Map[Int, Long]])
    : (Map[Int, Long], Map[Int, Long]) = {
    val partitions = beginning.keySet ++ end.keySet
    val mins = partitions.iterator.map { p =>
      val b = beginning.getOrElse(p, 0L)
      p -> windowStart.filter(_.nonEmpty)
        .map(w => math.max(w.getOrElse(p, b), b)).getOrElse(b)
    }.toMap
    val maxs = partitions.iterator.map { p =>
      val e = end.getOrElse(p, 0L)
      p -> windowStop.filter(_.nonEmpty)
        .map(w => math.min(w.getOrElse(p, e), e)).getOrElse(e)
    }.toMap
    (mins, maxs)
  }

  /** Consumer-admin min/max probe (reference kafka/connection.py:498-553):
    * the reference asks the consumer admin API for `beginning_offsets` /
    * `end_offsets` of every partition, clamps the HWM window into that
    * live range, and reports per-partition (min, max) — the numbers that
    * drive `has_data` (any partition with max > min) and the KeyValueHwm
    * update. Partitions that appear only in the live probe (created since
    * the window was stored) surface with the full live range. This is the
    * pure half of that call; the admin round-trip itself needs
    * kafka-clients, absent in this container. */
  def minMaxOffsets(beginning: Map[Int, Long], end: Map[Int, Long],
                    windowStart: Option[Map[Int, Long]] = None,
                    windowStop: Option[Map[Int, Long]] = None)
    : Map[Int, (Long, Long)] = {
    val (mins, maxs) = clampWindow(beginning, end, windowStart, windowStop)
    mins.keySet.map(p => p -> ((mins(p), maxs(p)))).toMap
  }

  /** `has_data` over a probe result (reference db_reader.py:718 analogue
    * for Kafka): true iff any partition's window is non-empty. */
  def hasData(minMax: Map[Int, (Long, Long)]): Boolean =
    minMax.values.exists { case (lo, hi) => hi > lo }

  /** One incremental run at the planner level: given the stored
    * per-partition HWM and the live [beginning, end] offsets from the
    * probe, produce (exact read options, the window max to feed the HWM
    * update). Mirrors the reference's incremental flow — start side is
    * the STORED offsets verbatim (new partitions default to 0 via the
    * fill in [[offsetsJson]], kafka/connection.py:272-276), stop side is
    * the clamped live end; the caller merges the returned maxs into its
    * [[graft.core.KeyValueIntHwm]] on clean exit. */
  def planIncremental(topic: String, stored: Map[Int, Long],
                      beginning: Map[Int, Long], end: Map[Int, Long])
    : (Map[String, String], Map[Int, Long]) = {
    val (_, maxs) =
      clampWindow(beginning, end,
        if (stored.isEmpty) None else Some(stored), None)
    (readOptions(topic, Some(stored), Some(maxs)), maxs)
  }

  def validateWriteColumns(columns: Seq[String],
                           includeHeaders: Boolean = true): Unit = {
    require(columns.contains("value"), "Kafka write requires a 'value' column")
    val extra = columns.filterNot(writableColumns)
    require(extra.isEmpty,
      s"columns not writable to Kafka: ${extra.mkString(", ")} " +
        s"(allowed: ${writableColumns.mkString(", ")})")
    // headers need includeHeaders=true on the sink
    // (reference kafka/connection.py:312-314)
    require(includeHeaders || !columns.contains("headers"),
      "Cannot write a 'headers' column with includeHeaders=false")
  }
}

object KafkaConnection {
  private[connections] val log =
    org.slf4j.LoggerFactory.getLogger(classOf[KafkaConnection])
}

final class KafkaConnection(val spark: SparkSession,
                            bootstrapServers: String,
                            extraOptions: Map[String, String] = Map.empty)
  extends DbConnection {

  val dialect: Dialect = GenericDialect

  private def base = Map("kafka.bootstrap.servers" -> bootstrapServers) ++
    extraOptions

  def check(): this.type = this

  /** `source` is the topic; `where` is unused (Kafka has no predicates —
    * the window IS the offsets). */
  def readSourceAsDf(source: String, columns: Seq[String], where: Seq[String],
                     hint: Option[String], limit: Option[Int],
                     dfSchema: Option[StructType]): DataFrame =
    readTopic(source, None, None, limit)

  def readTopic(topic: String,
                startOffsets: Option[Map[Int, Long]],
                endOffsets: Option[Map[Int, Long]],
                limit: Option[Int] = None): DataFrame = {
    val df = spark.read.format("kafka")
      .options(base ++ KafkaPlanner.readOptions(topic, startOffsets, endOffsets))
      .load()
    limit.fold(df)(df.limit)
  }

  def writeDfToTarget(df: DataFrame, target: String, ifExists: IfExists,
                      options: Map[String, String]): Unit = {
    KafkaPlanner.validateWriteColumns(df.columns.toSeq,
      options.getOrElse("includeHeaders", "false").toBoolean)
    if (df.columns.contains("topic"))
      KafkaConnection.log.warn(
        s"the 'topic' column in the DataFrame will be overridden with '$target'")
    require(ifExists == IfExists.Append || ifExists == IfExists.Error,
      "Kafka supports only append/error modes (reference kafka/connection.py:292-335)")
    df.write.format("kafka").options(base ++ options)
      .option("topic", target).save()
  }

  def getDfSchema(source: String, columns: Seq[String]): StructType =
    KafkaPlanner.readSchema

  /** min/max per-partition offsets come from consumer admin calls in the
    * reference (kafka/connection.py:498-553) — requires the Kafka client
    * library, not available in this environment. */
  def getMinMaxValues(source: String, expression: String,
                      where: Seq[String]): (Option[Any], Option[Any]) =
    throw new UnsupportedOperationException(
      "Kafka offset probing needs the kafka-clients package (not shipped here)")
}
