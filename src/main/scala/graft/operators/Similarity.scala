package graft.operators

import graft.expressions.{GraftExpressions, HyperplaneSignature64}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - `bruteForceTopK`: broadcast the (small) query set against the full
  *    corpus, one fused cosine per (query, doc), per-query top-k. Exact —
  *    the baseline/oracle. The corpus is streamed, never collected; the
  *    only shuffle is the final per-query top-k, over ≤ |corpus| rows of
  *    (qid, id, cosine) — at 100 TB keep the query batch bounded and this
  *    scales linearly.
  *  - `lshTopK`: random-hyperplane signatures bucket the corpus
  *    (16-bit chunks of a 64-bit signature, like the simhash banding);
  *    only same-bucket candidates get an exact cosine, then per-query
  *    top-k. Approximate, near-linear — the scale path. Recall grows with
  *    `probeChunks` (how many of the 4 chunks must collide: 1 = any).
  */
object Similarity {

  def hyperplaneSig(v: Column, bits: Int = 64, seed: Long = 42L): Column = {
    require(bits == 64, "current implementation emits a 64-bit signature")
    GraftColumnBridge.column(HyperplaneSignature64(GraftColumnBridge.expression(v), seed))
  }

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     queryIdCol: String = null,
                     queryVecCol: String = null): DataFrame = {
    val qid = Option(queryIdCol).getOrElse(idCol)
    val qvec = Option(queryVecCol).getOrElse(vecCol)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val q = queries.select(col(qid).as("query_id"), col(qvec).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        round(GraftExpressions.cosineSimilarity(col("qv"), col("v")), 6).as("cosine"))
    topK(scored, k)
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              seed: Long = 42L): DataFrame = {
    def chunked(df: DataFrame, id: String, v: String) =
      df.select(col(id), col(v),
          hyperplaneSig(col(v), 64, seed).as("sig"))
        .select(col(id), col(v),
          posexplode(transform(sequence(lit(0), lit(3)),
            i => call_function("shiftright", col("sig"), (i * 16).cast("int")).bitwiseAND(lit(0xffffL))))
            .as(Seq("chunk_idx", "chunk")))
    val c = chunked(corpus.select(col(idCol).as("id"), col(vecCol).as("v")), "id", "v")
    val q = chunked(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv")
    val candidates = c.join(q,
        c("chunk_idx") === q("chunk_idx") && c("chunk") === q("chunk") &&
          col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"), col("qv"), col("v"))
      .dropDuplicates("query_id", "id")
      .select(col("query_id"), col("id"),
        round(GraftExpressions.cosineSimilarity(col("qv"), col("v")), 6).as("cosine"))
    topK(candidates, k)
  }

  /** Deterministic per-query top-k: rank on (cosine desc, id asc) so ties
    * are stable across engines. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("cosine"))
  }
}
