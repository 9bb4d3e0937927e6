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

  /** Hilbert-curve index of two already-quantized coordinates — the
    * stronger locality cousin of [[zValue]]: the Hilbert curve never
    * jumps (consecutive indices are grid neighbors — verified for every
    * point at bits ≤ 8 in the spec suite), so bucket min/max envelopes
    * are tighter than Morton's at the quadrant seams, which is why
    * modern lakehouse OPTIMIZE implementations offer it beside Z-order.
    *
    * Algorithm: the classic per-level rotate-and-reflect walk (Hilbert
    * 1891; iterative xy2d form) from the top bit down:
    * `d += s²·((3·rx) xor ry)`, then for ry = 0 swap x/y, reflecting
    * both via `xor (s−1)` when rx = 1 — the xor only touches bits below
    * s, which are the only bits later levels read, so it equals the
    * textbook `n−1−x` reflection while staying branch-light and
    * SQL-replayable. All-integer, bit-identical in any engine.
    *
    * Returns d in [0, 4^bits). The step columns are materialized per
    * level (not nested into one expression), keeping the Catalyst tree
    * linear in `bits` — and every step is codegen-friendly bitwise
    * arithmetic. */
  def hilbertSteps(df: DataFrame, xq: Column, yq: Column, bits: Int,
                   out: String): DataFrame = {
    require(bits >= 1 && bits <= 15, s"bits in [1,15], got $bits")
    var cur = df.withColumn("__hx", xq).withColumn("__hy", yq)
      .withColumn(out, lit(0L))
    var s = 1L << (bits - 1)
    while (s > 0) {
      val x = col("__hx"); val y = col("__hy")
      cur = cur
        .withColumn("__rx",
          when(x.bitwiseAND(lit(s)) > lit(0L), lit(1L)).otherwise(lit(0L)))
        .withColumn("__ry",
          when(y.bitwiseAND(lit(s)) > lit(0L), lit(1L)).otherwise(lit(0L)))
      cur = cur
        .withColumn(out, col(out) +
          lit(s * s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        .withColumn("__nx",
          when(col("__ry") === 0L,
            when(col("__rx") === 1L, y.bitwiseXOR(lit(s - 1))).otherwise(y))
            .otherwise(x))
        .withColumn("__ny",
          when(col("__ry") === 0L,
            when(col("__rx") === 1L, x.bitwiseXOR(lit(s - 1))).otherwise(x))
            .otherwise(y))
        .drop("__hx", "__hy", "__rx", "__ry")
        .withColumnRenamed("__nx", "__hx")
        .withColumnRenamed("__ny", "__hy")
      s >>= 1
    }
    cur.drop("__hx", "__hy")
  }

  /** Hilbert-cluster the frame on two integral columns: quantize each
    * onto [0, 2^bits) (same 1-row broadcast min/max as [[zorderBy]]),
    * append the Hilbert index as `out`, range-partition + locally sort
    * on it. Same two-phase scale shape as [[zorderBy]] — one tiny
    * aggregate, one map-only index computation, one range exchange. */
  def hilbertBy(df: DataFrame, xCol: String, yCol: String, bits: Int = 8,
                numPartitions: Int = 0, out: String = "__h"): DataFrame = {
    val stats = df.agg(
      min(col(xCol)).cast("long").as("__mn_x"),
      max(col(xCol)).cast("long").as("__mx_x"),
      min(col(yCol)).cast("long").as("__mn_y"),
      max(col(yCol)).cast("long").as("__mx_y"))
    val withStats = df.crossJoin(broadcast(stats))
    val qx = quantizeMinMax(col(xCol).cast("long"),
      col("__mn_x"), col("__mx_x"), bits)
    val qy = quantizeMinMax(col(yCol).cast("long"),
      col("__mn_y"), col("__mx_y"), bits)
    val indexed = hilbertSteps(withStats, qx, qy, bits, out)
      .drop("__mn_x", "__mx_x", "__mn_y", "__mx_y")
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    indexed.repartitionByRange(parts, col(out)).sortWithinPartitions(col(out))
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
