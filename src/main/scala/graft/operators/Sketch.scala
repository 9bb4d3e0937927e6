package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketching — the HyperLogLog shape (Flajolet
  * et al., AofA 2007) built from an explicit md5-derived hash so the
  * registers (and therefore the estimate) are bit-reproducible in ANY
  * engine, unlike `approx_count_distinct`'s opaque implementation-defined
  * sketch. The register frame is tiny (2^p rows), MERGEABLE by per-bucket
  * max — union two corpora's registers and re-aggregate — and computing it
  * is one map-combinable aggregate over the values: the estimator a
  * 100 TB pipeline can afford to keep per shard/day/source and fold
  * together at read time.
  */
object Sketch {

  /** Register index + rank for one value: a 60-bit hash from the first 15
    * hex chars of md5 (15 so the `conv` result fits a signed long with no
    * unsigned edge cases); top `p` bits pick the bucket, and the rank is
    * the 1-based position of the first set bit in the remaining q = 60−p
    * bits (q+1 when they are all zero) — counted via `lpad(bin(rest))`,
    * which both Spark and DuckDB evaluate identically. */
  private def hashParts(v: Column, p: Int): (Column, Column) = {
    val q = 60 - p
    val h = conv(substring(md5(v.cast("string").cast("binary")), 1, 15),
      16, 10).cast("long")
    val bucket = shiftrightunsigned(h, q)
    val rest = h.bitwiseAND(lit((1L << q) - 1L))
    val rank = when(rest === 0L, lit((q + 1).toLong))
      .otherwise(instr(lpad(bin(rest), q, "0"), "1").cast("long"))
    (bucket, rank)
  }

  /** The 2^p-row register table of a column: (bucket 0..2^p−1, max_rank
    * long — 0 for buckets no value hashed into). NULLs excluded. One
    * word-count aggregate; the empty-bucket fill is a broadcast join
    * against a generated 2^p-row frame. */
  def hllRegisters(df: DataFrame, valCol: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 12, s"p must be in [4,12], got $p")
    val m = 1 << p
    val (bucket, rank) = hashParts(col(valCol), p)
    val regs = df.filter(col(valCol).isNotNull)
      .select(bucket.as("bucket"), rank.as("__r"))
      .groupBy(col("bucket")).agg(max(col("__r")).as("__mr"))
    df.sparkSession.range(m).select(col("id").as("bucket"))
      .join(broadcast(regs), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("__mr"), lit(0L)).as("max_rank"))
      .orderBy(col("bucket"))
  }

  /** Fold register tables from several shards/snapshots into one: the
    * sketch's defining property — `estimate(merge(a, b)) ==
    * estimate(a ∪ b)` exactly, because max commutes with max. */
  def hllMerge(regs: DataFrame*): DataFrame = {
    require(regs.nonEmpty, "hllMerge needs at least one register table")
    regs.reduce(_ unionByName _)
      .groupBy(col("bucket")).agg(max(col("max_rank")).as("max_rank"))
      .orderBy(col("bucket"))
  }

  /** Cardinality estimate from a register table — one row: (estimate
    * double round(4), n_buckets long, v_zero long — empty registers).
    *
    * Cross-engine exactness: the harmonic-mean denominator Σ 2^(−M_j) is
    * computed as the INTEGER Σ 2^(53−M_j) (ranks are ≤ 53 at p ≥ 4, so
    * terms are exact longs and the sum is order-free), and the raw
    * estimate is the fixed double sequence `α_m · m² · 2^53 / S`. The
    * small-range linear-counting correction (`m · ln(m/V)` when the raw
    * estimate ≤ 2.5m and empty registers exist) uses one log — the same
    * double in both engines. */
  def hllEstimate(registers: DataFrame): DataFrame = {
    val rows = registers.select(col("bucket"), col("max_rank")).collect()
    val m = rows.length
    require(m >= 16 && (m & (m - 1)) == 0, s"register count must be 2^p, got $m")
    val maxRank = 53L
    require(rows.forall(_.getLong(1) <= maxRank),
      "register rank exceeds the 60-bit hash's field width")
    val sInt = rows.map(r => 1L << (maxRank - r.getLong(1))).sum
    val vZero = rows.count(_.getLong(1) == 0L).toLong
    val alpha = 0.7213 / (1 + 1.079 / m.toDouble)
    val raw = alpha * (m.toLong * m).toDouble * 9007199254740992.0 /
      sInt.toDouble
    val est =
      if (raw <= 2.5 * m.toDouble && vZero > 0)
        m.toDouble * math.log(m.toDouble / vZero.toDouble)
      else raw
    val spark = registers.sparkSession
    import spark.implicits._
    val r4 = BigDecimal(est)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    Seq((r4, m.toLong, vZero)).toDF("estimate", "n_buckets", "v_zero")
  }
}
