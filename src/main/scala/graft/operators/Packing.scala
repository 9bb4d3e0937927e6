package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: lay documents out in a
  * deterministic order within each group and cut the token stream into
  * fixed-size chunks of `chunkTokens`.
  *
  * A document belongs to the chunk where it STARTS:
  * `chunk_id = floor(exclusive_prefix_token_sum / chunkTokens)` — a pure
  * window prefix sum, so assignment is one shuffle on the group key plus a
  * per-group sort, with no sequential driver loop. Greedy bin-closing
  * variants (close the bin when the next doc would overflow) need a
  * running-state scan per group and don't parallelize; the prefix-sum
  * formulation does, and its math is reproducible in any SQL engine, which
  * is what makes the result oracle-checkable.
  *
  * At 100 TB: only (group, order, tokens) ride the shuffle — never the
  * text. Join `chunk_id` back to the payload by id afterwards if the packed
  * bytes are needed.
  */
object Packing {

  /** Adds a `chunk_id` column. `orderCol` must be unique within a group
    * (e.g. a document id) so the layout is deterministic. */
  def packChunks(df: DataFrame, groupCols: Seq[String], orderCol: String,
                 tokensCol: String, chunkTokens: Long): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(groupCols.nonEmpty, "packChunks needs at least one group column")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("chunk_id",
      floor(coalesce(sum(col(tokensCol)).over(w), lit(0L)) / lit(chunkTokens)))
  }

  /** Materialize the packed payloads: one row per (group, chunk) with the
    * documents' text concatenated in `orderCol` order, `separator`-joined —
    * what actually feeds a trainer after [[packChunks]] assigns chunks.
    * Concatenation order is pinned by sorting (order, text) structs inside
    * each chunk, so the bytes are deterministic and an external engine can
    * re-derive them (the gate compares md5 of every chunk).
    *
    * Scale note: this is the ONE dedup/packing stage where text rides a
    * shuffle — unavoidable, the chunk must be assembled somewhere — but
    * each text moves exactly once, to its chunk's reducer. */
  def packText(df: DataFrame, groupCols: Seq[String], orderCol: String,
               textCol: String, tokensCol: String, chunkTokens: Long,
               separator: String = "\n"): DataFrame = {
    val chunked = packChunks(df, groupCols, orderCol, tokensCol, chunkTokens)
    chunked.groupBy((groupCols :+ "chunk_id").map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        concat_ws(separator,
          transform(array_sort(collect_list(struct(col(orderCol), col(textCol)))),
            s => s(textCol))).as("packed"))
  }
}
