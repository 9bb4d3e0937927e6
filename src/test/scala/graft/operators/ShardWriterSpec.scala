package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardWriterSpec extends SparkSpec {
  import spark.implicits._

  private def docs() = (0L until 60L).map(i =>
    (i, s"src${i % 3}", s"doc $i body ${"x " * (i % 5).toInt}".trim,
      10L + i % 7)).toDF("doc_id", "source", "text", "cost")

  test("manifest returned == manifest re-derived from the written " +
       "shards; totals and envelope match the input; every shard obeys " +
       "the exclusive-prefix budget") {
    val out = tmpDir("graft_shardw_spec")
    val manifest = ShardWriter.writeShardsWithManifest(docs(), "doc_id",
      "text", "cost", "source",
      Seq(Sampling.knuthHash32(col("doc_id")), col("doc_id")),
      budget = 100L, outDir = out)
    val m = manifest.collect().map(_.toSeq).toSeq
    val re = ShardWriter.manifestFromShards(spark, out, "doc_id", "text",
      "cost", "source").collect().map(_.toSeq).toSeq
    assert(m == re && m.nonEmpty)
    // the persisted manifest parquet carries the same rows
    val persisted = spark.read.parquet(s"$out/manifest")
      .orderBy(col("shard")).collect().map(_.toSeq).toSeq
    assert(persisted == m)
    // totals conserve the corpus
    val rows = manifest.agg(sum(col("n_docs")), sum(col("total_cost")))
      .head()
    assert(rows.getLong(0) == 60L)
    assert(rows.getLong(1) == docs().agg(sum(col("cost"))).head().getLong(0))
    // exclusive-prefix rule: a shard's cost may exceed the budget only
    // by less than its own largest row cost (every row cost <= 16 here)
    manifest.select(col("total_cost")).as[Long].collect()
      .dropRight(1) // the last shard is a remainder
      .foreach(c => assert(c >= 100L - 16L && c < 100L + 16L, s"cost $c"))
  }

  test("manifestOf is a complete public API: a plain (id, source, text, " +
       "cost, shard) frame with NO internal columns manifests, NULL and " +
       "empty text hash distinctly, and NULL text rows stay counted") {
    // the r15 contract bug: manifestOf aggregated a hidden __h column
    // that only manifestFromShards injected — the public path threw an
    // unresolved-column AnalysisException naming an internal
    val plain = Seq(
      (1L, "a", "body one", 5L, 0L),
      (2L, "a", null.asInstanceOf[String], 5L, 0L), // NULL text
      (3L, "b", "", 5L, 0L),                        // empty text
      (4L, "b", "body four", 5L, 1L)
    ).toDF("doc_id", "source", "text", "cost", "shard")
    val m = ShardWriter.manifestOf(plain, "doc_id", "text", "cost", "source")
      .orderBy(col("shard")).collect()
    assert(m.length == 2)
    assert(m(0).getAs[Long]("n_docs") == 3L) // the NULL-text row counts
    // NULL vs empty text must hash differently: swapping row 2's NULL
    // for "" (and vice versa) changes the checksum
    val swapped = Seq(
      (1L, "a", "body one", 5L, 0L),
      (2L, "a", "", 5L, 0L),
      (3L, "b", null.asInstanceOf[String], 5L, 0L),
      (4L, "b", "body four", 5L, 1L)
    ).toDF("doc_id", "source", "text", "cost", "shard")
    val s = ShardWriter.manifestOf(swapped, "doc_id", "text", "cost",
      "source").orderBy(col("shard")).collect()
    assert(m(0).getAs[Long]("content_xor") != s(0).getAs[Long]("content_xor"),
      "NULL text and empty text hashed identically")
    assert(m(1).toSeq == s(1).toSeq, "untouched shard changed")
  }

  test("tampering with one written row flips that shard's checksum and " +
       "only that shard's") {
    val out = tmpDir("graft_shardw_tamper")
    val manifest = ShardWriter.writeShardsWithManifest(docs(), "doc_id",
        "text", "cost", "source",
        Seq(Sampling.knuthHash32(col("doc_id")), col("doc_id")),
        budget = 100L, outDir = out)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    // rewrite shard 0 with one flipped text byte
    val s0 = spark.read.parquet(s"$out/shards/shard=0").localCheckpoint()
    val tampered = s0.withColumn("text",
      when(col("doc_id") === s0.select(min(col("doc_id"))).head().getLong(0),
        concat(col("text"), lit("!"))).otherwise(col("text")))
    tampered.write.mode("overwrite").parquet(s"$out/shards/shard=0")
    val re = ShardWriter.manifestFromShards(spark, out, "doc_id", "text",
        "cost", "source")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(re(0L) != manifest(0L), "tamper went undetected")
    // content_xor is the differing field; counts/costs unchanged
    manifest.keys.filter(_ != 0L).foreach(k => assert(re(k) == manifest(k)))
  }
}
