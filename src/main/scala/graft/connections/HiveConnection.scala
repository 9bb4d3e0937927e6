package graft.connections

import graft.dialects.{Dialect, SparkSqlDialect}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Options controlling new-table DDL on Hive-catalog writes
  * (reference hive/options.py:97-211). */
final case class HiveWriteOptions(ifExists: IfExists = IfExists.Append,
                                  partitionBy: Seq[String] = Nil,
                                  bucketBy: Option[(Int, Seq[String])] = None,
                                  sortBy: Seq[String] = Nil,
                                  format: String = "parquet",
                                  options: Map[String, String] = Map.empty)

/** Spark-catalog (Hive metastore or in-memory catalog) connection.
  *
  * Re-expresses reference hive/connection.py. The load path keeps two
  * behaviors the reference calls out as data-corruption traps:
  *
  *  1. Existing-table writes realign DataFrame columns to the TABLE's
  *     column order before `insertInto` (hive/connection.py:418-462) —
  *     `insertInto` is positional, so skipping this silently writes values
  *     into wrong columns.
  *  2. `replace_overlapping_partitions` wraps `insertInto(overwrite=true)`
  *     in a temporarily-set `spark.sql.sources.partitionOverwriteMode=
  *     dynamic` (hive/connection.py:487-518), restored afterwards.
  */
final class HiveConnection(val spark: SparkSession) extends DbConnection {
  val dialect: Dialect = SparkSqlDialect

  def check(): this.type = { spark.sql("SELECT 1").collect(); this }

  override def sql(query: String): DataFrame = spark.sql(query)

  /** Run DDL/DML eagerly (reference hive/connection.py `execute`). */
  def execute(statement: String): Unit = { spark.sql(statement).collect(); () }

  def readSourceAsDf(source: String, columns: Seq[String], where: Seq[String],
                     hint: Option[String], limit: Option[Int],
                     dfSchema: Option[StructType]): DataFrame = {
    val sqlText = dialect.getSqlQuery(source, columns, where,
      hint.filter(_ => dialect.supportsHint), limit)
    spark.sql(sqlText)
  }

  def getDfSchema(source: String, columns: Seq[String]): StructType = {
    val df = spark.table(source)
    (if (columns.nonEmpty) df.selectExpr(columns: _*) else df).schema
  }

  def getMinMaxValues(source: String, expression: String,
                      where: Seq[String]): (Option[Any], Option[Any]) = {
    val row = spark.sql(dialect.getMinMaxQuery(source, expression, where)).head()
    (Option(row.get(0)), Option(row.get(1)))
  }

  def writeDfToTarget(df: DataFrame, target: String, ifExists: IfExists,
                      options: Map[String, String]): Unit =
    write(df, target, HiveWriteOptions(ifExists = ifExists, options = options))

  def write(df: DataFrame, target: String, opts: HiveWriteOptions): Unit = {
    val exists = spark.catalog.tableExists(target)
    (exists, opts.ifExists) match {
      case (true, IfExists.Error) =>
        throw new IllegalStateException(s"table $target already exists")
      case (true, IfExists.Ignore) => ()
      case (true, IfExists.Append) =>
        insertInto(df, target, overwrite = false, dynamic = false)
      case (true, IfExists.ReplaceOverlappingPartitions) =>
        insertInto(df, target, overwrite = true, dynamic = true)
      case (true, IfExists.ReplaceEntireTable) =>
        insertInto(df, target, overwrite = true, dynamic = false)
      case (false, _) => saveAsTable(df, target, opts)
    }
  }

  /** Positional insert — realign to the table's column order first
    * (reference hive/connection.py:418-462). */
  private def insertInto(df: DataFrame, target: String, overwrite: Boolean,
                         dynamic: Boolean): Unit = {
    val tableCols = spark.table(target).schema.fieldNames.toSeq
    val dfCols = df.schema.fieldNames.toSet
    val missing = tableCols.filterNot(dfCols)
    require(missing.isEmpty,
      s"DataFrame is missing columns ${missing.mkString(", ")} of table $target")
    val extra = df.schema.fieldNames.filterNot(tableCols.contains(_))
    require(extra.isEmpty,
      s"DataFrame has columns ${extra.mkString(", ")} not present in table $target")
    val aligned = df.select(tableCols.map(df.col): _*)
    val key = "spark.sql.sources.partitionOverwriteMode"
    val mode = if (dynamic) "dynamic" else "static"
    withConf(key, mode) {
      aligned.write.mode(if (overwrite) "overwrite" else "append")
        .insertInto(target)
    }
  }

  private def saveAsTable(df: DataFrame, target: String,
                          opts: HiveWriteOptions): Unit = {
    var w = df.write.format(opts.format).options(opts.options)
      .mode(opts.ifExists match {
        case IfExists.Error => "error"
        case IfExists.Ignore => "ignore"
        case _ => "overwrite"
      })
    if (opts.partitionBy.nonEmpty) w = w.partitionBy(opts.partitionBy: _*)
    opts.bucketBy.foreach { case (n, cols) =>
      w = w.bucketBy(n, cols.head, cols.tail: _*)
      if (opts.sortBy.nonEmpty) w = w.sortBy(opts.sortBy.head, opts.sortBy.tail: _*)
    }
    w.saveAsTable(target)
  }

  /** Temporarily set a Spark conf, restoring the previous value
    * (reference _util/spark.py:84 `inject_spark_param`). */
  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
