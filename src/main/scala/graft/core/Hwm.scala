package graft.core

import java.time.{Instant, LocalDate}
import org.apache.spark.sql.types._

/** High-watermark ADT.
  *
  * Mirrors the reference's HWM taxonomy (reference:
  * onetl/hwm/auto_hwm.py:15, hwm_class_registry.py:13-104) re-expressed as a
  * sealed Scala ADT instead of a registry of pydantic classes.
  *
  * An HWM is a named, typed scalar (or small collection) watermark persisted
  * between runs; incremental strategies read it, widen the read window past
  * it, and save the new maximum on success.
  */
sealed trait Hwm {
  def name: String
  def entity: String
  def expression: String
  /** Untyped value for window math; None = never set (first run). */
  def valueOpt: Option[Any]
  def withValue(v: Any): Hwm
}

final case class IntHwm(name: String, entity: String, expression: String,
                        value: Option[Long] = None) extends Hwm {
  def valueOpt: Option[Any] = value
  def withValue(v: Any): Hwm = copy(value = Some(HwmValue.toLong(v)))
}

final case class DecimalHwm(name: String, entity: String, expression: String,
                            value: Option[BigDecimal] = None) extends Hwm {
  def valueOpt: Option[Any] = value
  def withValue(v: Any): Hwm = copy(value = Some(HwmValue.toBigDecimal(v)))
}

final case class DateHwm(name: String, entity: String, expression: String,
                         value: Option[LocalDate] = None) extends Hwm {
  def valueOpt: Option[Any] = value
  def withValue(v: Any): Hwm = copy(value = Some(HwmValue.toLocalDate(v)))
}

final case class DateTimeHwm(name: String, entity: String, expression: String,
                             value: Option[Instant] = None) extends Hwm {
  def valueOpt: Option[Any] = value
  def withValue(v: Any): Hwm = copy(value = Some(HwmValue.toInstant(v)))
}

/** Kafka-style per-partition offsets (reference: kafka/dialect.py:55-59).
  * New partitions default to offset 0 (kafka/connection.py:272-276).
  * Updates MERGE per key keeping the maximum (etl-entities
  * KeyValueIntHWM.update) — an update listing fewer partitions, e.g.
  * after a topic rebalance, must not erase stored offsets, and a stale
  * smaller offset must not move a partition backwards. */
final case class KeyValueIntHwm(name: String, entity: String,
                                expression: String = "offset",
                                value: Map[Int, Long] = Map.empty) extends Hwm {
  def valueOpt: Option[Any] = if (value.isEmpty) None else Some(value)
  def withValue(v: Any): Hwm = {
    val incoming = v.asInstanceOf[Map[Int, Long]]
    copy(value = incoming.foldLeft(value) { case (acc, (k, off)) =>
      acc.updated(k, math.max(acc.getOrElse(k, Long.MinValue), off))
    })
  }
}

/** Set of already-seen file paths (reference: file_downloader.py:14). */
final case class FileListHwm(name: String, entity: String,
                             expression: String = "file_list",
                             value: Set[String] = Set.empty) extends Hwm {
  def valueOpt: Option[Any] = if (value.isEmpty) None else Some(value)
  def withValue(v: Any): Hwm = v match {
    case s: Set[_]      => copy(value = value ++ s.map(_.toString))
    case it: Iterable[_] => copy(value = value ++ it.map(_.toString))
    case p               => copy(value = value + p.toString)
  }
  def covers(path: String): Boolean = value.contains(path)
}

/** Max modification time of already-transferred files
  * (reference: file_downloader.py:236). */
final case class FileMTimeHwm(name: String, entity: String,
                              expression: String = "modified_time",
                              value: Option[Instant] = None) extends Hwm {
  def valueOpt: Option[Any] = value
  def withValue(v: Any): Hwm = {
    val inst = HwmValue.toInstant(v)
    copy(value = Some(value.filter(_.isAfter(inst)).getOrElse(inst)))
  }
  def covers(mtime: Instant): Boolean = value.exists(!_.isBefore(mtime))
}

object HwmValue {
  def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case d: java.math.BigDecimal => d.longValueExact()
    case d: BigDecimal => d.toLongExact
    case s: String => s.toLong
    case other => throw new IllegalArgumentException(s"not an integral HWM value: $other")
  }
  def toBigDecimal(v: Any): BigDecimal = v match {
    case d: BigDecimal => d
    case d: java.math.BigDecimal => BigDecimal(d)
    case d: Double => BigDecimal(d)
    case f: Float => BigDecimal(f.toDouble)
    case l: Long => BigDecimal(l)
    case i: Int => BigDecimal(i)
    case s: String => BigDecimal(s)
    case other => throw new IllegalArgumentException(s"not a decimal HWM value: $other")
  }
  def toLocalDate(v: Any): LocalDate = v match {
    case d: LocalDate => d
    case d: java.sql.Date => d.toLocalDate
    case s: String => LocalDate.parse(s)
    case other => throw new IllegalArgumentException(s"not a date HWM value: $other")
  }
  /** The zone a zoneless wall-clock value (TIMESTAMP_NTZ collects as
    * LocalDateTime) is interpreted in: the active Spark session's
    * `spark.sql.session.timeZone` — the same zone Spark itself used to
    * render the value — falling back to UTC when no session is active
    * (e.g. pure HWM-store manipulation on the driver). Hard-coding UTC
    * here silently shifted every NTZ high-water-mark by the session
    * offset for non-UTC sessions. */
  def sessionZone: java.time.ZoneId =
    org.apache.spark.sql.SparkSession.getActiveSession
      .flatMap(s => s.conf.getOption("spark.sql.session.timeZone"))
      .map(java.time.ZoneId.of)
      .getOrElse(java.time.ZoneOffset.UTC)

  def toInstant(v: Any): Instant = toInstant(v, sessionZone)

  def toInstant(v: Any, zone: java.time.ZoneId): Instant = v match {
    case i: Instant => i
    case t: java.sql.Timestamp => t.toInstant
    case l: java.time.LocalDateTime => l.atZone(zone).toInstant
    case d: java.util.Date => d.toInstant
    case l: Long => Instant.ofEpochMilli(l)
    case s: String => Instant.parse(s)
    case other => throw new IllegalArgumentException(s"not a timestamp HWM value: $other")
  }
}

/** Spark DataType → HWM constructor mapping.
  *
  * Mirrors reference hwm_class_registry.py:51-66: integral AND
  * float/double/decimal all map to integral-ordered HWMs in the reference
  * (Oracle NUMBER quirk); we keep integrals as [[IntHwm]] but give
  * fractional types a lossless [[DecimalHwm]] — strictly more correct, same
  * ordering semantics. Non-orderable types are rejected
  * (reference db_reader.py:678-685).
  */
object SparkTypeToHwm {
  def detect(name: String, entity: String, expression: String,
             dt: DataType): Hwm = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      IntHwm(name, entity, expression)
    case FloatType | DoubleType | _: DecimalType =>
      DecimalHwm(name, entity, expression)
    case DateType => DateHwm(name, entity, expression)
    case TimestampType | TimestampNTZType => DateTimeHwm(name, entity, expression)
    case other =>
      throw new IllegalArgumentException(
        s"HWM over non-orderable type $other is not supported " +
          s"(expression=$expression, entity=$entity)")
  }
}
