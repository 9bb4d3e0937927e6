package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering — the OPTIMIZE ZORDER class
  * of operation (Morton-order interleaving, as in Delta Lake / Iceberg
  * table layout): co-locate rows that are close in SEVERAL columns at
  * once so file-level min/max statistics prune scans on ANY of the
  * clustered columns. At 100 TB this is the difference between reading
  * one file and reading the table when the filter column is not the
  * partition column.
  *
  * All arithmetic is integral (subtract-scale-divide in BIGINT, then
  * bit interleaving), so a layout decision is bit-reproducible across
  * engines — no floating-point quantization boundaries.
  */
object Layout {

  /** Integer min-max quantization of `c` onto [0, 2^bits): exact BIGINT
    * arithmetic — ((c - min) · (2^bits − 1)) div max(max − min, 1) —
    * so the same row quantizes identically in any engine (a double
    * scale factor would flip floor() at representation boundaries).
    * `mn`/`mx` are columns carrying the global min/max (from a 1-row
    * broadcast aggregate, kept as columns so the plan stays fully
    * declarative — no driver round-trip). */
  def quantizeMinMax(c: Column, mn: Column, mx: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bits in [1,20], got $bits")
    val levels = (1L << bits) - 1
    // floor-of-double-division is exact integer division while the
    // numerator (max-min)·levels stays under 2^53 (exact in double, and
    // then quotient error q·2^-53 <= 2^20·2^-53 is far below the 1/d
    // boundary gap): true for any 40-bit column domain at bits <= 12.
    // Beyond that the layout is still a valid clustering, merely not
    // bit-identical to an integer-division engine at quantile edges.
    // DuckDB's `//` floor-divides the same integers to the same value.
    floor(((c - mn) * lit(levels)).cast("double") /
      greatest(mx - mn, lit(1L))).cast("long")
  }

  /** Morton (Z-order) bit interleave of already-quantized values: bit b
    * of input j lands at position b·n + j. Column j gets the lower
    * lanes of each bit group, so earlier columns sort coarser — callers
    * put the most-queried column first. Pure bitwise Catalyst
    * expressions, codegen'd end to end. */
  def zValue(quantized: Seq[Column], bits: Int): Column = {
    require(quantized.nonEmpty, "zValue needs at least one column")
    require(bits * quantized.size <= 60,
      s"z-value would overflow a long: $bits bits x ${quantized.size} cols")
    val n = quantized.size
    (0 until bits).flatMap { b =>
      quantized.zipWithIndex.map { case (q, j) =>
        shiftleft(shiftright(q, b).bitwiseAND(lit(1L)), b * n + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Z-order the frame on `cols` (all integral): append the z-value as
    * `out`, then range-partition + locally sort on it, so downstream
    * file writes get tight min/max envelopes on every clustered column.
    * Two-phase plan: one map-combinable global min/max aggregate (1 row,
    * broadcast back), then a map-only quantize+interleave, then the
    * range exchange — the only shuffle, and the one any clustering
    * rewrite must pay. */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int = 8,
               numPartitions: Int = 0, out: String = "__z"): DataFrame = {
    require(cols.nonEmpty, "zorderBy needs at least one column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("long").as(s"__mn_$c"),
        max(col(c)).cast("long").as(s"__mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val qs = cols.map(c => quantizeMinMax(
      col(c).cast("long"), col(s"__mn_$c"), col(s"__mx_$c"), bits))
    val withZ = df.crossJoin(broadcast(stats))
      .withColumn(out, zValue(qs, bits))
      .drop(cols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    withZ.repartitionByRange(parts, col(out)).sortWithinPartitions(col(out))
  }

  /** Pruning-statistics audit for a (z-)clustered layout: bucket rows by
    * the top `bucketBits` of `zCol` (a proxy for "file"), and report each
    * bucket's row count and per-column min/max envelope — the numbers a
    * scan planner would prune on. Tight envelopes = effective skipping;
    * compare against the same stats on an unclustered layout to measure
    * the win. */
  def clusterStats(df: DataFrame, zCol: String, zBits: Int,
                   bucketBits: Int, cols: Seq[String]): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= zBits,
      s"bucketBits in [1, $zBits], got $bucketBits")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("long").as(s"min_$c"),
        max(col(c)).cast("long").as(s"max_$c")))
    df.groupBy(shiftright(col(zCol), zBits - bucketBits).as("bucket"))
      .agg(count(lit(1)).as("n"), aggs: _*)
      .orderBy(col("bucket"))
  }

  /** Row count per physical file backing a DataFrame — the small-files
    * audit (thousands of KB-sized parquet files poison scan scheduling
    * and NameNode/list costs long before they poison queries). Built on
    * `input_file_name()`, so it costs one scan + a tiny aggregate keyed
    * by file path; feed its skew (min vs max rows) into a compaction
    * decision the same way [[clusterStats]] feeds clustering. */
  def rowsPerFile(df: DataFrame): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"))

  /** Rendezvous / highest-random-weight shard assignment (Thaler &
    * Ravishankar 1996): each key goes to the shard with the highest
    * per-(key, shard) hash. The property mod-sharding lacks: growing
    * N → N+1 shards moves only the ~1/(N+1) of keys whose new shard
    * wins — no mass reshuffle of a 100 TB layout on a topology change.
    *
    * Cross-engine trick: the per-shard weight is the 56-bit md5 long of
    * `"<key>:<shard>"` ENCODED as `h·16 + shard`, so the winning shard
    * is just `greatest(...) % 16` — a variadic max of longs, identical
    * everywhere (ties impossible: the low 4 bits differ by shard).
    * Supports up to 16 shards; map-only, no shuffle. */
  def rendezvousShard(df: DataFrame, keyCol: String, nShards: Int,
                      out: String = "shard"): DataFrame = {
    require(nShards >= 1 && nShards <= 16,
      s"nShards must be in [1,16], got $nShards")
    val encs = (0 until nShards).map { i =>
      conv(substring(md5(concat(col(keyCol).cast("string"), lit(s":$i"))
        .cast("binary")), 1, 14), 16, 10).cast("long") * 16L + i
    }
    val win =
      if (encs.length == 1) encs.head
      else greatest(encs: _*)
    df.withColumn(out, pmod(win, lit(16L)))
  }
}
