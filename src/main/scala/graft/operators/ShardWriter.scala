package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The pipeline's last mile: a trainer consumes SHARD FILES plus a
  * MANIFEST (per-shard row count, cost total, content checksum, source
  * mix), not a DataFrame. This composes [[Ranking.shardByCostBudget]]
  * (cost-balanced shard ids over the deterministic training order) with
  * a partitioned parquet layout and a manifest that is RE-DERIVABLE from
  * the written shards bit-for-bit — the property that lets any later
  * reader audit a delivery without trusting the writer.
  *
  * Manifest columns, one row per shard:
  *   - n_docs, total_cost        — plain sums
  *   - content_xor               — bit_xor of per-row 60-bit sha256
  *                                 prefixes of `id|V<text>` (`id|N` for
  *                                 NULL text — see rowHash): ORDER-FREE
  *                                 (xor commutes), so any engine reading
  *                                 the shard files in any order derives
  *                                 the identical checksum; one flipped
  *                                 byte in any row flips it
  *   - source_mix                — "source:count" pairs, lexicographically
  *                                 sorted, comma-joined
  *   - min_id, max_id            — the shard's id envelope
  *
  * Scale shape: the shard assignment is the audited two-pass prefix sum;
  * the write is one partitioned parquet write (one directory per shard —
  * size `budget` so a shard is a sane trainer unit, not a tiny file);
  * the manifest is one map-combinable aggregate over the re-read files.
  * Reference shape: the FileDFWriter modes (spark_file_df_connection.py:
  * 103-127) + corpus-card aggregates.
  */
object ShardWriter {

  /** 60-bit integer prefix of sha256(`id|V<text>`), with NULL text
    * hashed as the bare presence tag `N` — the per-row content
    * fingerprint both engines derive identically. The tag exists
    * because the earlier `concat_ws(id, text)` silently SKIPPED a null
    * operand, so `(5, NULL)` hashed like bare `(5)` — colliding a
    * null-text row with string-prefix ids — while a SQL replay's `||`
    * nulls the whole key and its bit_xor then skips the row entirely:
    * delivered and re-derived checksums diverged exactly on corpora
    * with NULL text. Tagged, NULL / empty / every real text hash
    * distinctly and identically in both engines. */
  private def rowHash(idCol: String, textCol: String) =
    conv(substring(sha2(
      concat(col(idCol).cast("string"), lit("|"),
        when(col(textCol).isNull, lit("N"))
          .otherwise(concat(lit("V"), col(textCol)))), 256),
      1, 15), 16, 10).cast("long")

  /** Manifest aggregate over an already-shard-assigned frame. The shard
    * id is pinned to LONG: parquet partition-column inference narrows it
    * to int on re-read, which would silently fork the schema between
    * the delivered and the re-derived manifest. The content hash is
    * derived HERE from (idCol, textCol) — callers hand over any frame
    * with those columns plus `shard`; no hidden column contract. */
  def manifestOf(sharded0: DataFrame, idCol: String, textCol: String,
                 costCol: String, sourceCol: String): DataFrame = {
    val sharded = sharded0.withColumn("shard", col("shard").cast("long"))
      .withColumn("__h", rowHash(idCol, textCol))
    val mix = sharded.groupBy(col("shard"), col(sourceCol))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("shard"))
      .agg(array_join(array_sort(collect_list(
        concat_ws(":", col(sourceCol), col("__n")))), ",")
        .as("source_mix"))
    sharded.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(costCol).cast("long")).as("total_cost"),
        expr(s"bit_xor(__h)").as("content_xor"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
      .join(mix, Seq("shard"))
      .orderBy(col("shard"))
  }

  /** Assign cost-balanced shards, write `outDir/shards/shard=N/` parquet
    * plus `outDir/manifest` parquet, and return the manifest AS DERIVED
    * FROM THE WRITTEN FILES (not from the in-memory frame) — what was
    * landed is what is certified. */
  def writeShardsWithManifest(df: DataFrame, idCol: String,
                              textCol: String, costCol: String,
                              sourceCol: String,
                              sortCols: Seq[org.apache.spark.sql.Column],
                              budget: Long, outDir: String): DataFrame = {
    val spark = df.sparkSession
    val sharded = Ranking.shardByCostBudget(
      df.select(col(idCol), col(sourceCol), col(textCol), col(costCol)),
      sortCols, costCol, budget)
    sharded.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$outDir/shards")
    val manifest = manifestFromShards(spark, outDir, idCol, textCol,
      costCol, sourceCol)
    manifest.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/manifest")
    manifest
  }

  /** Re-derive the manifest from the written shard files — must equal
    * the delivered manifest bit-for-bit (spec-pinned, including the
    * tamper case). */
  def manifestFromShards(spark: SparkSession, outDir: String,
                         idCol: String, textCol: String, costCol: String,
                         sourceCol: String): DataFrame =
    manifestOf(spark.read.parquet(s"$outDir/shards"),
      idCol, textCol, costCol, sourceCol)
}
