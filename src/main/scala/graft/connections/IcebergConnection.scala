package graft.connections

import graft.dialects.{Dialect, SparkSqlDialect}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Iceberg-catalog connection (reference iceberg/connection.py:351-640).
  *
  * Same catalog shape as Hive but through the V2 writer: `writeTo` gives
  * snapshot-isolated appends and `overwritePartitions()` — the V2 analogue
  * of dynamic partition overwrite. Requires an Iceberg catalog configured
  * on the session (`spark.sql.catalog.<name>`), whose runtime jar is not
  * shipped in this environment; the logic compiles against the stock
  * DataFrameWriterV2 API.
  */
final class IcebergConnection(val spark: SparkSession,
                              catalog: String,
                              database: String)
  extends DbConnection {

  val dialect: Dialect = SparkSqlDialect

  def qualified(table: String): String = s"$catalog.$database.$table"

  def check(): this.type = {
    spark.sql(s"SHOW TABLES IN $catalog.$database").collect()
    this
  }

  override def sql(query: String): DataFrame = spark.sql(query)

  def readSourceAsDf(source: String, columns: Seq[String], where: Seq[String],
                     hint: Option[String], limit: Option[Int],
                     dfSchema: Option[StructType]): DataFrame = {
    val sqlText = dialect.getSqlQuery(qualified(source), columns, where,
      hint, limit)
    spark.sql(sqlText)
  }

  def writeDfToTarget(df: DataFrame, target: String, ifExists: IfExists,
                      options: Map[String, String]): Unit = {
    val name = qualified(target)
    val exists = spark.catalog.tableExists(name)
    val w = df.writeTo(name)
    (exists, ifExists) match {
      case (true, IfExists.Error) =>
        throw new IllegalStateException(s"table $name already exists")
      case (true, IfExists.Ignore) => ()
      case (true, IfExists.Append) => w.append()
      case (true, IfExists.ReplaceOverlappingPartitions) => w.overwritePartitions()
      case (true, IfExists.ReplaceEntireTable) => w.createOrReplace()
      case (false, _) => w.create()
    }
  }

  def getDfSchema(source: String, columns: Seq[String]): StructType = {
    val df = spark.table(qualified(source))
    (if (columns.nonEmpty) df.selectExpr(columns: _*) else df).schema
  }

  def getMinMaxValues(source: String, expression: String,
                      where: Seq[String]): (Option[Any], Option[Any]) = {
    val row = spark.sql(
      dialect.getMinMaxQuery(qualified(source), expression, where)).head()
    (Option(row.get(0)), Option(row.get(1)))
  }
}
