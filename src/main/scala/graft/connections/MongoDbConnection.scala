package graft.connections

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import graft.core.{Edge, Window}
import graft.dialects.{Dialect, GenericDialect}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** MongoDB dialect: predicates are JSON pipeline fragments, not SQL
  * (reference mongodb/dialect.py:125-155). */
object MongoDialect extends Dialect {
  val name = "mongodb"
  override def supportsWhere: Boolean = true
  override def requiresDfSchema: Boolean = true

  /** HWM window edges render as Mongo JSON fragments, not SQL — this is
    * what `Dialect.applyWindow` composes, so DbReader windows flow into
    * `$match` pipelines as valid JSON (reference mongodb/dialect.py:115-160). */
  override def edgeToWhere(expression: String, edge: Edge, isStart: Boolean): Option[String] =
    edgeToJson(expression, edge, isStart)

  /** `{"expr": {"$gt": value}}` window fragments. */
  def edgeToJson(expression: String, edge: Edge, isStart: Boolean): Option[String] =
    edge.value.map { v =>
      val op = (isStart, edge.including) match {
        case (true, true) => "$gte"
        case (true, false) => "$gt"
        case (false, true) => "$lte"
        case (false, false) => "$lt"
      }
      s"""{"$expression": {"$op": ${serializeJsonValue(v)}}}"""
    }

  def serializeJsonValue(v: Any): String = v match {
    case t: Instant => s"""{"$$date": "${DateTimeFormatter.ISO_INSTANT.format(t)}"}"""
    case t: java.sql.Timestamp => serializeJsonValue(t.toInstant)
    case d: LocalDate =>
      serializeJsonValue(d.atStartOfDay(ZoneOffset.UTC).toInstant)
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case other => other.toString
  }

  def matchStage(conjuncts: Seq[String]): Option[String] =
    if (conjuncts.isEmpty) None
    else if (conjuncts.size == 1) Some(s"""{"$$match": ${conjuncts.head}}""")
    else Some(s"""{"$$match": {"$$and": [${conjuncts.mkString(", ")}]}}""")

  /** `$group` min/max pipeline (reference mongodb/connection.py:404-414). */
  def minMaxPipeline(expression: String, conjuncts: Seq[String]): String = {
    val group =
      s"""{"$$group": {"_id": 1, "min": {"$$min": "$$$expression"}, "max": {"$$max": "$$$expression"}}}"""
    "[" + (matchStage(conjuncts).toSeq :+ group).mkString(", ") + "]"
  }
}

/** MongoDB connection (reference mongodb/connection.py). The mongo-spark
  * connector is not shipped in this environment; pipeline planning is pure
  * and unit-tested, `load()` needs the package at runtime. */
final class MongoDbConnection(val spark: SparkSession,
                              connectionUri: String,
                              database: String)
  extends DbConnection {

  val dialect: Dialect = MongoDialect

  private def base = Map(
    "connection.uri" -> connectionUri,
    "database" -> database)

  def check(): this.type = this

  def readSourceAsDf(source: String, columns: Seq[String], where: Seq[String],
                     hint: Option[String], limit: Option[Int],
                     dfSchema: Option[StructType]): DataFrame = {
    require(dfSchema.nonEmpty,
      "MongoDB requires an explicit df_schema (reference dialect_mixins/requires_df_schema.py)")
    var df = pipeline(source,
      "[" + MongoDialect.matchStage(where).getOrElse("") + "]",
      dfSchema)
    if (columns.nonEmpty) df = df.selectExpr(columns: _*)
    limit.fold(df)(df.limit)
  }

  /** Raw aggregation pipeline, distributed
    * (reference mongodb/connection.py:223-360). */
  def pipeline(collection: String, pipelineJson: String,
               schema: Option[StructType] = None): DataFrame = {
    var r = spark.read.format("mongodb")
      .options(base + ("collection" -> collection))
      .option("aggregation.pipeline", pipelineJson)
    schema.foreach(s => r = r.schema(s))
    r.load()
  }

  def writeDfToTarget(df: DataFrame, target: String, ifExists: IfExists,
                      options: Map[String, String]): Unit = {
    val mode = ifExists match {
      case IfExists.Append => "append"
      case IfExists.ReplaceEntireTable => "overwrite"
      case IfExists.Error => "error"
      case IfExists.Ignore => "ignore"
      case other => throw new IllegalArgumentException(s"unsupported mode $other")
    }
    df.write.format("mongodb").options(base ++ options)
      .option("collection", target).mode(mode).save()
  }

  def getDfSchema(source: String, columns: Seq[String]): StructType =
    throw new UnsupportedOperationException(
      "MongoDB schema must be supplied explicitly (requires_df_schema)")

  def getMinMaxValues(source: String, expression: String,
                      where: Seq[String]): (Option[Any], Option[Any]) = {
    val row = pipeline(source, MongoDialect.minMaxPipeline(expression, where)).head()
    (Option(row.getAs[Any]("min")), Option(row.getAs[Any]("max")))
  }
}
