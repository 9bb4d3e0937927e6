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

  /** Sliding-window chunk extraction — the context-window chunking a
    * RAG index or a long-document pretraining pipeline runs before
    * embedding/packing: token windows of `window` tokens starting every
    * `stride` tokens (stride < window ⇒ overlapping context). Start
    * positions are 1, 1+stride, … while ≤ the token count, and the tail
    * window is allowed to run short (every token is covered; no token
    * appears in a chunk twice per window). Token-less documents (NULL
    * or whitespace-only text) produce zero chunks.
    *
    * Returns (idCol, start int — 1-based token offset, n_tok long,
    * chunk string).
    *
    * Scale shape: entirely map-side — tokenize once, one
    * transform+posexplode per row, no shuffle, no window function;
    * output rows ≈ n_tokens/stride per doc, the size the downstream
    * embedding pass pays anyway. */
  def slidingWindowChunks(df: DataFrame, idCol: String, textCol: String,
                          window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride (stride > window " +
        "would skip tokens)")
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), toks.as("__t"))
      .filter(size(col("__t")) >= 1)
      .select(col(idCol), explode(expr(
        s"transform(sequence(1, size(__t), $stride), " +
          s"st -> struct(st, slice(__t, st, $window) AS w))")).as("__c"))
      .select(col(idCol), col("__c.st").as("start"),
        size(col("__c.w")).cast("long").as("n_tok"),
        array_join(col("__c.w"), " ").as("chunk"))
  }

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
