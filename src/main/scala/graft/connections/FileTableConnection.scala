package graft.connections

import graft.dialects.{Dialect, SparkSqlDialect}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, max => smax, min => smin}
import org.apache.spark.sql.types.StructType

/** Connector-style connection over a directory of file-backed tables
  * (`<root>/<name>.parquet` or any Spark file format).
  *
  * Architecturally this is the reference's Greenplum/Mongo connector path
  * (greenplum/connection.py:320-352): the source takes no SQL, so
  * projection/filter/limit are applied as DataFrame ops immediately after
  * `load()` — Catalyst then pushes the filters and pruning down into the
  * scan, which `.explain` confirms (`PushedFilters`, `ReadSchema`). At
  * 100 TB this is the difference between scanning one column of one
  * partition and scanning the lake.
  */
class FileTableConnection(val spark: SparkSession,
                                val root: String,
                                val format: String = "parquet")
  extends DbConnection {

  val dialect: Dialect = SparkSqlDialect

  def tablePath(source: String): String = {
    require(!source.contains("/") && !source.contains(".."),
      s"source must be a bare table name, got: $source")
    s"$root/$source.$format"
  }

  def check(): this.type = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create(root), spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(root)), s"root $root does not exist")
    this
  }

  /** Inferred schema per table path, cached for this connection's
    * lifetime: every schema-less `load` pays a footer-read/inference
    * pass (for parquet, a real Spark job even on one file), and a batch
    * strategy constructs one frame per WINDOW through the same
    * connection — 31 windows cost 31 identical inference jobs before
    * this cache (measured on the 90-day batch-union gate). Invalidated
    * by [[writeDfToTarget]] for the written table, so a replace-with-
    * different-schema through THIS connection is seen; out-of-band
    * writes to the same path need a fresh connection (the same contract
    * as any metadata-caching catalog). */
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[String, StructType]

  private def load(source: String, dfSchema: Option[StructType]): DataFrame = {
    val path = tablePath(source)
    dfSchema.orElse(schemaCache.get(path)) match {
      case Some(st) => spark.read.format(format).schema(st).load(path)
      case None =>
        val df = spark.read.format(format).load(path)
        schemaCache.put(path, df.schema)
        df
    }
  }

  def readSourceAsDf(source: String, columns: Seq[String], where: Seq[String],
                     hint: Option[String], limit: Option[Int],
                     dfSchema: Option[StructType]): DataFrame = {
    var df = load(source, dfSchema)
    // filter-first so Catalyst pushes predicates into the scan, then prune
    // columns, then limit — same order as the reference's connector path
    // (greenplum/connection.py:341-348).
    df = where.foldLeft(df)((d, c) => d.filter(expr(c)))
    if (columns.nonEmpty) df = df.selectExpr(columns: _*)
    df = hint.fold(df)(h => df.hint(h))
    limit.fold(df)(df.limit)
  }

  def writeDfToTarget(df: DataFrame, target: String, ifExists: IfExists,
                      options: Map[String, String]): Unit = {
    val path = tablePath(target)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create(root), spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(path))
    val mode = ifExists match {
      case IfExists.Append => "append"
      case IfExists.ReplaceEntireTable | IfExists.ReplaceOverlappingPartitions => "overwrite"
      case IfExists.Error => "error"
      case IfExists.Ignore if exists => return
      case IfExists.Ignore => "append"
    }
    df.write.format(format).options(options).mode(mode).save(path)
    schemaCache.remove(path) // the write may have changed the table's schema
  }

  def getDfSchema(source: String, columns: Seq[String]): StructType = {
    val df = load(source, None)
    (if (columns.nonEmpty) df.selectExpr(columns: _*) else df).schema
  }

  def getMinMaxValues(source: String, expression: String,
                      where: Seq[String]): (Option[Any], Option[Any]) = {
    val df = where.foldLeft(load(source, None))((d, c) => d.filter(expr(c)))
    val row = df.agg(smin(expr(expression)).as("min"),
                     smax(expr(expression)).as("max")).head()
    (Option(row.get(0)), Option(row.get(1)))
  }
}
