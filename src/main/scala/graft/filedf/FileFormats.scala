package graft.filedf

import org.apache.spark.sql.{Column, DataFrameReader, DataFrameWriter, Row}

/** File formats for FileDFReader/FileDFWriter.
  *
  * Mirrors reference onetl/file/format/: each format is a validated bag of
  * Spark options plus its `format(...)` name (file_format.py:29-70), with a
  * prohibited-option guard (file_format.py:17-26) — options that would
  * silently change WHAT is read (path, schema) rather than HOW.
  */
sealed trait FileFormat {
  def name: String
  def options: Map[String, String]
  def canRead: Boolean = true
  def canWrite: Boolean = true

  protected val prohibited: Set[String] = Set("path", "paths")
  require(options.keySet.map(_.toLowerCase).intersect(prohibited).isEmpty,
    s"options ${prohibited.mkString("/")} are prohibited on $name — pass the path to the reader/writer")

  def applyToReader(r: DataFrameReader): DataFrameReader =
    r.format(name).options(options)
  def applyToWriter[T](w: DataFrameWriter[T]): DataFrameWriter[T] = {
    require(canWrite, s"$name is a read-only format")
    w.format(name).options(options)
  }
}

/** reference csv.py:37 */
final case class Csv(options: Map[String, String] = Map.empty) extends FileFormat {
  def name = "csv"
}
object Csv {
  /** header=true + inferSchema, the common interactive shape. */
  def withHeader(extra: (String, String)*): Csv =
    Csv(Map("header" -> "true") ++ extra)
}

/** Multiline JSON documents — read-only, like the reference
  * (json.py:35 ReadOnlyFileFormat): writing one giant JSON array from
  * executors can't parallelize. */
final case class Json(options: Map[String, String] = Map.empty) extends FileFormat {
  def name = "json"
  override def canWrite = false
  override def applyToReader(r: DataFrameReader): DataFrameReader =
    r.format(name).option("multiLine", "true").options(options)
}

/** Newline-delimited JSON (reference jsonline.py:22 — Spark's native
  * "json" format IS json-lines). */
final case class JsonLine(options: Map[String, String] = Map.empty) extends FileFormat {
  def name = "json"
}

final case class Orc(options: Map[String, String] = Map.empty) extends FileFormat {
  def name = "orc"
}

final case class Parquet(options: Map[String, String] = Map.empty) extends FileFormat {
  def name = "parquet"
}

/** reference avro.py:51 — needs the spark-avro package on the classpath
  * (not shipped in this environment; construction is allowed, reading will
  * fail at runtime with Spark's own DATA_SOURCE_NOT_FOUND). */
final case class Avro(options: Map[String, String] = Map.empty) extends FileFormat {
  def name = "avro"
}

/** reference xml.py:34 — Spark 4 ships XML natively. rowTag is required. */
final case class Xml(rowTag: String,
                     options: Map[String, String] = Map.empty) extends FileFormat {
  def name = "xml"
  override def applyToReader(r: DataFrameReader): DataFrameReader =
    r.format(name).option("rowTag", rowTag).options(options)
  override def applyToWriter[T](w: DataFrameWriter[T]): DataFrameWriter[T] =
    w.format(name).option("rowTag", rowTag).options(options)
}

/** Plain text: one row per line, single `value: string` column on read;
  * writes exactly one string column per row. The natural format for raw
  * document corpora (reference has no equivalent; Spark's built-in
  * `text` source). `lineSep` etc. pass through as options. */
final case class Text(options: Map[String, String] = Map.empty) extends FileFormat {
  def name = "text"
}

/** reference excel.py:28 — needs the spark-excel package (not available
  * here); kept for API parity, fails at load time like the reference does
  * without its package. */
final case class Excel(options: Map[String, String] = Map.empty) extends FileFormat {
  def name = "excel"
}

/** Column-level codecs: parse/serialize a string/binary column holding a
  * serialized document (reference csv.py:475-553, json.py:328-404,
  * xml.py:426). All are thin, codegen-friendly wrappers over
  * `org.apache.spark.sql.functions` — no UDFs. */
object ColumnCodecs {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.{DataType, StructType}
  import scala.jdk.CollectionConverters._

  private def j(m: Map[String, String]): java.util.Map[String, String] = m.asJava

  def parseCsvColumn(col: Column, schema: StructType,
                     options: Map[String, String] = Map.empty): Column =
    from_csv(col, schema, options)
  def serializeCsvColumn(col: Column,
                         options: Map[String, String] = Map.empty): Column =
    to_csv(col, j(options))

  def parseJsonColumn(col: Column, schema: DataType,
                      options: Map[String, String] = Map.empty): Column =
    from_json(col, schema, options)
  def serializeJsonColumn(col: Column,
                          options: Map[String, String] = Map.empty): Column =
    to_json(col, options)

  def parseXmlColumn(col: Column, schema: StructType,
                     options: Map[String, String] = Map.empty): Column =
    from_xml(col, schema, j(options))
  def serializeXmlColumn(col: Column,
                         options: Map[String, String] = Map.empty): Column =
    to_xml(col, j(options))
}
