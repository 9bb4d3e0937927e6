package graft

import graft.expressions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's custom expressions for SQL use:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftSparkExtension
  *   SELECT fingerprint64(text), simhash64(split(text, ' ')) FROM docs
  * }}}
  *
  * This is the `SparkSessionExtensions` injection point SURVEY §7.3 calls
  * out: functions only — no custom Rules/Strategies are needed for parity
  * (the reference performs all rewrites source-side, §4).
  */
class GraftSparkExtension extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftSparkExtension].getName, null, name, usage,
      "", "", "", "", "4.0.0", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("fingerprint64"),
      info("fingerprint64", "fingerprint64(str) - 64-bit FNV-1a of the UTF-8 bytes"),
      (es: Seq[Expression]) => Fingerprint64(es.head)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash of a token array"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(str, n) - word n-gram shingles"),
      (es: Seq[Expression]) => {
        val n = es(1).eval(null).asInstanceOf[Number].intValue()
        WordShingles(es.head, n)
      }))
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two float/double arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("hyperplane_sig64"),
      info("hyperplane_sig64", "hyperplane_sig64(vec) - 64-bit random-hyperplane LSH signature"),
      (es: Seq[Expression]) => HyperplaneSignature64(es.head)))
    ext.injectFunction((FunctionIdentifier("word_shingle_hashes"),
      info("word_shingle_hashes", "word_shingle_hashes(str, n) - xx64 of each word n-gram"),
      (es: Seq[Expression]) => WordShingleHashes(es.head,
        es(1).eval(null).asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(shingles, k) - k-hash MinHash signature"),
      (es: Seq[Expression]) => MinHashSignature(es.head,
        es(1).eval(null).asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("topk_sketch"),
      info("topk_sketch", "topk_sketch(col, k, capacity) - SpaceSaving heavy hitters"),
      (es: Seq[Expression]) => TopKItems(es.head,
        es(1).eval(null).asInstanceOf[Number].intValue(),
        es(2).eval(null).asInstanceOf[Number].intValue()).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("unicode_normalize"),
      info("unicode_normalize", "unicode_normalize(str[, form]) - NFC/NFD/NFKC/NFKD normalization"),
      (es: Seq[Expression]) => UnicodeNormalize(es.head,
        if (es.size > 1) es(1).eval(null).toString else "NFC")))
    ext.injectFunction((FunctionIdentifier("compression_ratio"),
      info("compression_ratio", "compression_ratio(str) - deflate bytes / raw bytes"),
      (es: Seq[Expression]) => CompressionRatio(es.head)))
    ext.injectFunction((FunctionIdentifier("percent_normalize"),
      info("percent_normalize", "percent_normalize(url) - RFC 3986 percent-escape normalization"),
      (es: Seq[Expression]) => PercentNormalize(es.head)))
    ext.injectFunction((FunctionIdentifier("idn_ascii"),
      info("idn_ascii", "idn_ascii(host) - IDN host to punycode ACE form"),
      (es: Seq[Expression]) => IdnAscii(es.head)))
    ext.injectFunction((FunctionIdentifier("random_project"),
      info("random_project", "random_project(vec, outDim) - Rademacher JL projection"),
      (es: Seq[Expression]) => RandomProject(es.head,
        es(1).eval(null).asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("vector_moments"),
      info("vector_moments", "vector_moments(vec) - aggregate: count, component " +
        "sums, upper-triangle product sums (covariance/PCA summary)"),
      (es: Seq[Expression]) => VectorMomentsAgg(es.head).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("int8_quantize"),
      info("int8_quantize", "int8_quantize(vec) - symmetric int8 codes"),
      (es: Seq[Expression]) => Int8Quantize(es.head)))
    ext.injectFunction((FunctionIdentifier("int8_scale"),
      info("int8_scale", "int8_scale(vec) - max|x|/127 dequantization scale"),
      (es: Seq[Expression]) => Int8Scale(es.head)))
  }
}
