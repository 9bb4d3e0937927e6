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
  /** Content-defined chunking (the LBFS/Rabin-fingerprint boundary idea,
    * Muthitacharoen et al. SOSP 2001, applied at token granularity): a
    * chunk boundary falls AFTER every token whose content hash lands in
    * a fixed 1-in-16 residue class (last md5 hex digit '0'), so
    * boundaries are a function of local content, not position. That is
    * the property fixed/sliding windows lack: inserting one token early
    * in a document shifts every fixed-window chunk after it, but changes
    * at most the one content-defined chunk containing the edit (two if
    * the inserted token is itself a boundary) — chunk-level exact dedup
    * stays effective across small edits. Expected chunk length is
    * geometric with mean 16 tokens; P(len > 128) ≈ 2.6e-4, so the
    * uncapped tail is negligible (a hard cap needs a stateful scan —
    * at extreme scale add one via mapPartitions if required).
    *
    * Returns (idCol, start int — 1-based token offset, n_tok long,
    * chunk string); token-less documents produce zero chunks.
    *
    * Scale shape: entirely map-side (tokenize, one md5 per token, array
    * enumeration of the boundary list) — no shuffle, no window. */
  def contentDefinedChunks(df: DataFrame, idCol: String,
                           textCol: String): DataFrame = {
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), toks.as("__t"))
      .filter(size(col("__t")) >= 1)
      // boundary positions, then chunk k spans (bnd[k-1]+1 .. bnd[k])
      // with sentinels 1 and size(__t) at the ends; a boundary on the
      // last token makes the tail pair empty -> filtered
      .withColumn("__b", expr(
        "filter(sequence(1, size(__t)), " +
          "i -> substring(md5(element_at(__t, i)), 32, 1) = '0')"))
      .select(col(idCol), col("__t"), explode(expr(
        "filter(transform(sequence(1, size(__b) + 1), k -> struct(" +
          "if(k = 1, 1, element_at(__b, k - 1) + 1) AS st, " +
          "if(k <= size(__b), element_at(__b, k), size(__t)) AS en)), " +
          "c -> c.st <= c.en)")).as("__c"))
      .select(col(idCol), col("__c.st").as("start"),
        (col("__c.en") - col("__c.st") + 1).cast("long").as("n_tok"),
        array_join(slice(col("__t"), col("__c.st"),
          col("__c.en") - col("__c.st") + 1), " ").as("chunk"))
  }

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

  /** Head+tail truncation to a token budget — the BERT-era recipe for
    * fitting long documents into a fixed context window (Sun et al.
    * 2019 found head+tail beats head-only: openings AND conclusions
    * carry signal, middles pad): keep the first `headTokens` and last
    * `tailTokens` whitespace tokens with a marker between, pass short
    * documents through verbatim. A document is truncated only when it
    * EXCEEDS head+tail tokens (at exactly the budget nothing is cut, no
    * marker appears). Returns (input columns, truncated string,
    * n_tokens_kept long). Entirely row-local array slicing — a
    * scan-stage transform, nothing shuffles. */
  def truncateHeadTail(df: DataFrame, textCol: String,
                       headTokens: Int, tailTokens: Int,
                       marker: String = " ... "): DataFrame = {
    require(headTokens >= 1 && tailTokens >= 0,
      "need headTokens >= 1 and tailTokens >= 0")
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    val n = size(toks)
    val budget = headTokens + tailTokens
    df.withColumn("truncated",
        when(col(textCol).isNull, lit(null).cast("string"))
          .when(n <= budget, array_join(toks, " "))
          .otherwise(
            // tailTokens = 0 would make slice(-0, 0) — an invalid Spark
            // slice start — so the tail clause is built statically
            if (tailTokens > 0)
              concat(array_join(slice(toks, 1, headTokens), " "),
                lit(marker),
                array_join(slice(toks, -tailTokens, tailTokens), " "))
            else
              concat(array_join(slice(toks, 1, headTokens), " "),
                lit(marker))))
      .withColumn("n_tokens_kept",
        when(col(textCol).isNull, lit(0L))
          .otherwise(least(n.cast("long"), lit(budget.toLong))))
  }

  /** Padding-waste accounting for fixed-size training batches: when a
    * batch pads every sequence to its longest member, the waste is
    * Σ_batches (|batch|·max_len − Σ len). Reported for BOTH batch
    * orders — natural (id) and length-sorted — because the gap IS the
    * business case for length-bucketed batching (sorted batches put
    * similar lengths together, so max_len ≈ every len). One row:
    * (n_docs, n_batches, total_len, natural_waste, sorted_waste,
    * natural_ratio, sorted_ratio) with ratio = waste / (total + waste),
    * the padded-compute fraction, round(6).
    *
    * Exact integers end to end; batch assignment is
    * (globalRowNumber − 1) div batchSize off a range exchange — no
    * single-task window; the two 1-row aggregates are collected
    * sidecars. */
  def paddingWasteStats(df: DataFrame, idCol: String, lenCol: String,
                        batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val base = df.select(col(idCol).as("__id"),
        col(lenCol).cast("long").as("__l"))
      .filter(col("__l").isNotNull)
    def waste(order: Seq[org.apache.spark.sql.Column]): (Long, Long, Long, Long) = {
      val r = Ranking.globalRowNumber(base, order, "__r")
        .withColumn("__b", call_function("div", col("__r") - 1L,
          lit(batchSize.toLong)))
        .groupBy(col("__b"))
        .agg(count(lit(1)).as("__n"), max(col("__l")).as("__m"),
          sum(col("__l")).as("__s"))
        .agg(sum(col("__n") * col("__m") - col("__s")).as("w"),
          sum(col("__s")).as("t"), count(lit(1)).as("nb"),
          // doc count folded into the same aggregate: a separate
          // base.count() action re-scanned the caller's pipeline a
          // third time for a number this pass already knows
          sum(col("__n")).as("cnt"))
        .collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val (nw, total, nb, n) = waste(Seq(col("__id")))
    val (sw, _, _, _) = waste(Seq(col("__l"), col("__id")))
    def ratio(w: Long) =
      if (total + w == 0L) 0.0
      else BigDecimal(w.toDouble / (total + w).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n, nb, total, nw, sw, ratio(nw), ratio(sw)))
      .toDF("n_docs", "n_batches", "total_len", "natural_waste",
        "sorted_waste", "natural_ratio", "sorted_ratio")
  }
}
