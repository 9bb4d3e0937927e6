package graft.connections

import graft.dialects.{Dialect, SparkSqlDialect}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Pure write-mode planner for the V2 writer — the decision matrix of
  * reference iceberg/connection.py:448-473 and 578-640, extracted so the
  * mapping is machine-checkable without a live Iceberg catalog:
  *
  *  - table missing, ANY mode   → createOrReplace (reference always goes
  *    through `_save_as_table`, connection.py:459-461)
  *  - exists + replace_entire_table → createOrReplace
  *  - exists + error            → reject
  *  - exists + ignore           → no-op
  *  - exists + append           → append (snapshot-isolated)
  *  - exists + replace_overlapping_partitions → overwritePartitions (the
  *    V2 analogue of dynamic partition overwrite)
  */
object IcebergPlanner {
  sealed trait WriteAction
  case object CreateOrReplace extends WriteAction
  case object Append extends WriteAction
  case object OverwritePartitions extends WriteAction
  case object Noop extends WriteAction
  case object Reject extends WriteAction

  def plan(tableExists: Boolean, ifExists: IfExists): WriteAction =
    if (!tableExists || ifExists == IfExists.ReplaceEntireTable) CreateOrReplace
    else ifExists match {
      case IfExists.Error => Reject
      case IfExists.Ignore => Noop
      case IfExists.Append => Append
      case IfExists.ReplaceOverlappingPartitions => OverwritePartitions
      case _ => CreateOrReplace // unreachable: ReplaceEntireTable handled above
    }
}

/** Iceberg-catalog connection (reference iceberg/connection.py:351-640).
  *
  * Same catalog shape as Hive but through the V2 writer: `writeTo` gives
  * snapshot-isolated appends and `overwritePartitions()` — the V2 analogue
  * of dynamic partition overwrite. Requires an Iceberg catalog configured
  * on the session (`spark.sql.catalog.<name>`), whose runtime jar is not
  * shipped in this environment; the logic compiles against the stock
  * DataFrameWriterV2 API and the mode matrix lives in [[IcebergPlanner]].
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
    import IcebergPlanner._
    val name = qualified(target)
    val exists = spark.catalog.tableExists(name)
    // table properties ride as writer options on the create path, like the
    // reference's tableProperty loop (iceberg/connection.py:586-589)
    def w = options.foldLeft(df.writeTo(name).using("iceberg")) {
      case (acc, (k, v)) => acc.option(k, v)
    }
    plan(exists, ifExists) match {
      case Reject =>
        throw new IllegalStateException(s"table $name already exists")
      case Noop => ()
      case Append => w.append()
      case OverwritePartitions => w.overwritePartitions()
      case CreateOrReplace => w.createOrReplace()
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
