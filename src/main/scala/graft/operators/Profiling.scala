package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Table profiling — the "what landed in this snapshot" audit a pipeline
  * runs after every ingest (the reference surfaces per-run row/byte
  * metrics on its readers/writers; a column profile is the natural
  * columnar extension: null density, exact cardinality, and value
  * envelope per column, one frame the orchestrator can diff across
  * runs and alert on).
  */
object Profiling {

  /** One profile row per requested column: (column_name, n_rows,
    * n_nulls, n_distinct, min_str, max_str).
    *
    * Semantics chosen for cross-engine replay: nulls via `count(*) −
    * count(col)` (both BIGINT-exact everywhere), cardinality as EXACT
    * `count(distinct col)` (null-excluding in every engine), and the
    * envelope as min/max computed on the NATIVE type then rendered to a
    * string — integers and varchars render identically in any engine;
    * timestamps are formatted explicitly (`yyyy-MM-dd HH:mm:ss`) because
    * bare casts disagree on sub-second digits. Floating-point columns
    * profile fine but their string rendering is engine-specific — keep
    * them out of bit-compared outputs.
    *
    * Scale shape: ONE aggregate pass over the table (the exact
    * multi-column distinct expands the scan |cols|+1 ways — the standard
    * exact-profile cost; swap in [[Sketch.hllRegisters]] per column when
    * approximate cardinality is acceptable at 100 TB), producing a
    * single row that is collected (one bounded row — a sidecar) and
    * re-shaped driver-side into the |cols|-row frame. */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    val schema = df.schema
    cols.foreach(c => require(schema.fieldNames.contains(c),
      s"column $c not in ${schema.fieldNames.mkString(",")}"))
    def render(c: String) = schema(c).dataType match {
      case TimestampType => (x: org.apache.spark.sql.Column) =>
        date_format(x, "yyyy-MM-dd HH:mm:ss")
      case _ => (x: org.apache.spark.sql.Column) => x.cast("string")
    }
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val r = render(c)
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        r(min(col(c))).as(s"__min_$c"),
        r(max(col(c))).as(s"__max_$c"))
    }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).collect().head
    val n = row.getAs[Long]("__n")
    val out = cols.map { c =>
      (c, n, n - row.getAs[Long](s"__nn_$c"), row.getAs[Long](s"__nd_$c"),
        Option(row.getAs[String](s"__min_$c")).orNull,
        Option(row.getAs[String](s"__max_$c")).orNull)
    }
    val spark = df.sparkSession
    import spark.implicits._
    out.toDF("column_name", "n_rows", "n_nulls", "n_distinct",
      "min_str", "max_str").orderBy(col("column_name"))
  }
}
