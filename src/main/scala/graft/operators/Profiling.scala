package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
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
    // k exact countDistincts in one agg plan as an EXPAND (input ×(k+1)
    // rows through the partial aggregate) — on a narrow scan (one
    // parquet file) that whole expansion runs in ONE task (measured
    // 2.5 s single-task on 5 columns of a 150k-row table while 31 cores
    // idled; guide §2.5 input skew). widen() spreads the scan first and
    // is a no-op once the input already carries ≥ parallelism splits.
    val row: Row = graft.util.SparkUtils.widen(df.select(cols.map(col): _*))
      .agg(aggs.head, aggs.tail: _*).collect().head
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

  /** Benford first-digit audit (Benford 1938; Nigrini's fraud screen):
    * the leading-digit distribution of a naturally-spread positive
    * measure follows log10(1 + 1/d) — fabricated, truncated, or
    * unit-capped values don't. One row per digit 1–9: observed count,
    * observed share, Benford share (both round(6)).
    *
    * The leading digit is floor(x / 10^floor(log10 x)) — pure double
    * ops that every engine evaluates identically (log10/pow are exact
    * on powers of ten, and a one-ulp log10 wobble at a decade boundary
    * cannot move the floor across a digit). Non-positive and NULL
    * values are excluded and reported via the counts. One
    * map-combinable aggregate; the 9-row shape fill + share division
    * happen on a collected 9-row sidecar. */
  def benfordDigits(df: DataFrame, valCol: String): DataFrame = {
    val x = col(valCol).cast("double")
    val counts = df.filter(x.isNotNull && x > 0.0)
      .select(floor(x / pow(lit(10.0), floor(log10(x))))
        .cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val total = counts.values.sum
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + 0.0
    val rows = (1L to 9L).map { d =>
      val n = counts.getOrElse(d, 0L)
      val pObs = if (total == 0L) 0.0 else n.toDouble / total.toDouble
      (d, n, r6(pObs), r6(math.log10(1.0 + 1.0 / d.toDouble)))
    }
    val spark = df.sparkSession
    import spark.implicits._
    rows.toDF("digit", "n", "p_obs", "p_benford").orderBy(col("digit"))
  }

  /** Mutual information between two CATEGORICAL columns, reported as
    * the per-cell decomposition `I(A;B) = Σ_ab p_ab · ln(p_ab/(p_a·p_b))`
    * — the feature-relevance / redundancy check a dataset card wants
    * ("does source predict language?", "is event type independent of
    * weekday?") that correlation can't answer for categoricals. Cells
    * where the joint beats independence contribute positively, cells
    * suppressed below independence negatively; Σ contrib ≥ 0 is the MI
    * in nats.
    *
    * Every count is an exact integer; each cell's contribution is ONE
    * fixed IEEE sequence `(n_ab/N)·ln(n_ab·N/(n_a·n_b))` rounded to 6 dp
    * — no cross-row float accumulation anywhere, the [[chiSquareDrift]]
    * contract, so the frame replays across engines. Rows with a NULL on
    * either side are excluded (they'd need their own category to carry
    * information). Returns one row per OBSERVED (a, b) cell: (a, b,
    * n_ab, n_a, n_b, contrib double round(6)), ordered (a, b).
    *
    * Scale shape: one joint groupBy-count; the two marginals derive
    * from the JOINT frame (|A|·|B| rows, already tiny), not from
    * rescanning the input; N is a driver-bounded scalar. Joins are on
    * the single category keys. */
  def mutualInformation(df: DataFrame, colA: String,
                        colB: String): DataFrame = {
    val joint = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .select(col(colA).cast("string").as("a"),
        col(colB).cast("string").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
    val margA = joint.groupBy(col("a")).agg(sum(col("n_ab")).as("n_a"))
    val margB = joint.groupBy(col("b")).agg(sum(col("n_ab")).as("n_b"))
    val total = joint.agg(coalesce(sum(col("n_ab")), lit(0L)))
      .first.getLong(0)
    require(total > 0, "mutualInformation needs non-null rows")
    joint.join(margA, Seq("a")).join(margB, Seq("b"))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        (round((col("n_ab").cast("double") / lit(total.toDouble)) *
          log(col("n_ab").cast("double") * lit(total.toDouble) /
            (col("n_a").cast("double") * col("n_b").cast("double"))), 6)
          + lit(0.0)).as("contrib"))
      .orderBy(col("a"), col("b"))
  }

  /** Per-source dataset card: the one-row-per-source summary a corpus
    * README carries — volume (docs, chars), mean length, language
    * spread (exact distinct) and the dominant language with its share.
    * Dominant-language ties break (count desc, lang asc) so the card is
    * deterministic. Two word-count-shaped aggregates + one keyed
    * window over the |sources|·|langs| frame. */
  def datasetCardBySource(df: DataFrame, sourceCol: String,
                          textLenCol: String, langCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(col(sourceCol).isNotNull)
    val main = base.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col(textLenCol).cast("long"), lit(0L)))
          .as("total_chars"),
        countDistinct(col(langCol)).as("n_langs"))
      .withColumn("mean_chars",
        round(col("total_chars").cast("double") /
          col("n_docs").cast("double"), 2) + lit(0.0))
    val topLang = base.filter(col(langCol).isNotNull)
      .groupBy(col(sourceCol).as("source"), col(langCol).as("top_lang"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__rn", row_number().over(Window
        .partitionBy(col("source"))
        .orderBy(col("__c").desc, col("top_lang"))))
      .filter(col("__rn") === 1)
      .select(col("source"), col("top_lang"), col("__c").as("top_lang_n"))
    main.join(topLang, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("total_chars"),
        col("mean_chars"), col("n_langs"), col("top_lang"),
        coalesce(col("top_lang_n"), lit(0L)).as("top_lang_n"))
      .orderBy(col("source"))
  }

  /** One FK-orphan check: non-null child keys with no matching parent
    * row. Returns one row (check, n_rows long — non-null child keys,
    * n_bad long, bad_rate double round(6)). The count is a LEFT ANTI
    * join — broadcast or shuffled as the optimizer sees fit, never a
    * row-level verdict frame (at 100 TB only the two counts move). */
  def fkOrphanAudit(child: DataFrame, childKey: String, parent: DataFrame,
                    parentKey: String, check: String): DataFrame = {
    val keys = child.filter(col(childKey).isNotNull)
      .select(col(childKey).as("__k"))
    val n = keys.count()
    val bad = keys
      .join(parent.select(col(parentKey).as("__k")), Seq("__k"), "left_anti")
      .count()
    auditRow(child.sparkSession, check, n, bad)
  }

  /** One PK-uniqueness check: `n_bad` is the duplicate EXCESS
    * (n_rows − distinct keys), so a clean table reports 0 and each extra
    * copy counts once. NULL keys are excluded from both sides. */
  def pkDuplicateAudit(df: DataFrame, key: String,
                       check: String): DataFrame = {
    val keys = df.filter(col(key).isNotNull).select(col(key).as("__k"))
    val n = keys.count()
    val distinct = keys.distinct().count()
    auditRow(df.sparkSession, check, n, n - distinct)
  }

  /** A declarative row-level data constraint — the dbt-test /
    * expectation-suite vocabulary. Each constraint yields a violation
    * PREDICATE; the audit evaluates all of them in ONE pass. */
  sealed trait Constraint {
    def name: String
    /** true where the row VIOLATES the constraint */
    def violated: Column
  }
  /** Column must be non-null. */
  final case class NotNull(c: String) extends Constraint {
    val name = s"not_null($c)"
    def violated: Column = col(c).isNull
  }
  /** Non-null values must be one of `values`. */
  final case class InSet(c: String, values: Seq[String]) extends Constraint {
    val name = s"in_set($c)"
    def violated: Column =
      col(c).isNotNull && !col(c).cast("string").isInCollection(values)
  }
  /** Non-null values must lie in [lo, hi]. */
  final case class InRange(c: String, lo: Double, hi: Double)
      extends Constraint {
    val name = s"in_range($c,$lo,$hi)"
    def violated: Column = col(c).isNotNull &&
      (col(c).cast("double") < lo || col(c).cast("double") > hi)
  }
  /** Non-null values must match the (Java/RE2-common subset) regex. */
  final case class MatchesRegex(c: String, pattern: String)
      extends Constraint {
    val name = s"matches_regex($c)"
    def violated: Column =
      col(c).isNotNull && !col(c).cast("string").rlike(pattern)
  }
  /** Cross-column predicate must hold (violated where it is FALSE;
    * null-valued predicates count as violations — an unknowable check
    * is a failed check). */
  final case class Satisfies(label: String, predicate: Column)
      extends Constraint {
    val name = s"satisfies($label)"
    def violated: Column = !coalesce(predicate, lit(false))
  }

  /** Run a constraint suite over the frame in ONE scan: every
    * constraint becomes a conditional-sum aggregate, so the audit costs
    * one map-combinable pass regardless of how many checks ride it —
    * the shape a nightly 100 TB data-quality job needs (per-check scans
    * would multiply the read N times). Returns one row per constraint:
    * (check_name, n_rows long — all rows, n_bad long, bad_rate double
    * round(6)) ordered by check_name; compose with [[fkOrphanAudit]] /
    * [[pkDuplicateAudit]] (which need joins, not predicates) by union. */
  def constraintAudit(df: DataFrame,
                      constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "empty constraint suite")
    require(constraints.map(_.name).distinct.size == constraints.size,
      "duplicate constraint names")
    val aggs = count(lit(1)).as("__n") +:
      constraints.zipWithIndex.map { case (k, i) =>
        sum(when(k.violated, 1L).otherwise(0L)).as(s"__bad_$i")
      }
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    val n = row.getLong(0)
    val spark = df.sparkSession
    import spark.implicits._
    constraints.zipWithIndex.map { case (k, i) =>
      val bad = if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1)
      val rate =
        if (n == 0L) 0.0
        else BigDecimal(bad.toDouble / n.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      (k.name, n, bad, rate)
    }.sortBy(_._1)
      .toDF("check_name", "n_rows", "n_bad", "bad_rate")
  }

  private def auditRow(spark: org.apache.spark.sql.SparkSession,
                       check: String, n: Long, bad: Long): DataFrame = {
    import spark.implicits._
    val rate =
      if (n == 0L) 0.0
      else BigDecimal(bad.toDouble / n.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    Seq((check, n, bad, rate))
      .toDF("check_name", "n_rows", "n_bad", "bad_rate")
  }
}
