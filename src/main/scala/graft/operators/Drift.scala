package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift monitors between a reference and a current slice
  * of the same column — the check an ingest pipeline runs per snapshot
  * ("did this crawl's value distribution move?") before a drifted batch
  * poisons downstream statistics. Complements the per-key anomaly
  * z-scores (Ranking.groupZScores) and the unigram JS divergence
  * (Corpus.unigramJsDivergence), which watch keys and text rather than a
  * numeric column's shape.
  */
object Drift {

  /** Population Stability Index per reference-decile bucket: cut the
    * reference into `k` equal-count buckets (quantile boundaries from
    * the scale-safe [[Ranking.globalNtile]], total-ordered by (value,
    * id)), place both slices into those buckets, and report each
    * bucket's `(p − q) · ln(p/q)` contribution with the standard +0.5
    * count smoothing so empty buckets stay finite. Σ contrib is the PSI
    * (rule of thumb: < 0.1 stable, > 0.25 drifted).
    *
    * Cross-engine exactness: boundaries are per-tile maxima of a
    * deterministic total order; bucket assignment is "smallest i with
    * v <= b_i" — pure double comparisons on identical values; p, q and
    * the contribution are a fixed double sequence on integer counts,
    * rounded to 6 dp.
    *
    * Returns (bucket 1..k, n_ref long, n_cur long, contrib double) —
    * all k buckets emitted even when empty. NULL values are excluded.
    * Scale shape: one range-partitioned sort of the REFERENCE for the
    * boundaries (k−1 doubles — a driver-bounded sidecar, the
    * globalRunningSum discipline), then one map-combinable bucket count
    * per slice; the k-row shape frame broadcasts. */
  def psiBuckets(ref: DataFrame, cur: DataFrame, valCol: String,
                 idCol: String, k: Int = 10): DataFrame = {
    require(k >= 2, s"need at least 2 buckets, got $k")
    val spark = ref.sparkSession
    val r = ref.filter(col(valCol).isNotNull)
      .select(col(valCol).cast("double").as("__v"), col(idCol).as("__id"))
    val c = cur.filter(col(valCol).isNotNull)
      .select(col(valCol).cast("double").as("__v"))
    val bounds = Ranking.globalNtile(r, k, Seq(col("__v"), col("__id")),
        out = "__tile")
      .filter(col("__tile") < k)
      .groupBy(col("__tile")).agg(max(col("__v")).as("__b"))
      .collect().map(_.getDouble(1)).sorted
    require(bounds.nonEmpty, "psiBuckets needs a non-empty reference slice")
    val bucketOf = bounds.zipWithIndex
      .foldLeft(Option.empty[org.apache.spark.sql.Column]) {
        case (acc, (b, i)) =>
          val w = acc.fold(when(col("__v") <= b, lit(i + 1)))(
            _.when(col("__v") <= b, lit(i + 1)))
          Some(w)
      }.get.otherwise(lit(k))
    def counted(df: DataFrame, as: String) =
      df.select(bucketOf.as("bucket")).groupBy(col("bucket"))
        .agg(count(lit(1)).as(as))
    val nR = r.count().toDouble
    val nC = c.count().toDouble
    import spark.implicits._
    val shape = (1 to k).toDF("bucket")
    val p = (coalesce(col("n_ref"), lit(0L)).cast("double") + lit(0.5)) /
      lit(nR + 0.5 * k)
    val q = (coalesce(col("n_cur"), lit(0L)).cast("double") + lit(0.5)) /
      lit(nC + 0.5 * k)
    broadcast(shape)
      .join(counted(r, "n_ref"), Seq("bucket"), "left")
      .join(counted(c, "n_cur"), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        round((p - q) * log(p / q), 6).as("contrib"))
      .orderBy(col("bucket"))
  }
}
