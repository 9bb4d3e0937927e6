package graft.operators

import graft.SparkSpec
import graft.expressions.GraftExpressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Int8 embedding quantization: symmetric per-vector scale (max|x|/127),
  * array<tinyint> codes, scale/2 round-trip error bound — the 4× storage
  * cut for vector columns at corpus scale. */
class Int8QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
    (2L, Array(-2.0f, 2.0f, 1.0f, -1.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)),   // zero vector
    (4L, Array(127.0f, -127.0f, 63.5f, 1.0f))
  ).toDF("id", "v")

  test("codes are tinyint, extremes hit ±127, zero vector is all-zero") {
    val q = docs.select($"id", int8Quantize($"v").as("q"), int8Scale($"v").as("s"))
    assert(q.schema("q").dataType === ArrayType(ByteType, containsNull = false))
    val rows = q.as[(Long, Seq[Byte], Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(1L)._1 === Seq[Byte](127, -64, 32, 0))
    assert(rows(1L)._2 === 1.0 / 127.0)
    assert(rows(2L)._1 === Seq[Byte](-127, 127, 64, -64))
    assert(rows(3L)._1 === Seq[Byte](0, 0, 0, 0))
    assert(rows(3L)._2 === 0.0)
    assert(rows(4L)._1.head === 127.toByte && rows(4L)._1(1) === (-127).toByte)
  }

  test("round-trip error is bounded by scale/2 per component, every row") {
    val rnd = new scala.util.Random(29)
    val wide = (0 until 200)
      .map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("id", "v")
    val checked = wide.select($"id", int8Scale($"v").as("s"),
        int8Dequantize(int8Quantize($"v"), int8Scale($"v")).as("d"), $"v")
      .select($"id",
        aggregate(zip_with($"v", $"d", (a, b) => abs(a - b)),
          lit(0.0), (acc, x) => greatest(acc, x.cast("double"))).as("err"),
        $"s")
      .as[(Long, Double, Double)].collect()
    assert(checked.forall { case (_, err, s) => err <= s * 0.50001 },
      s"worst: ${checked.maxBy(r => if (r._3 > 0) r._2 / r._3 else 0.0)}")
    // and the bound is TIGHT-ish: someone actually rounds (err > 0)
    assert(checked.exists(_._2 > 0))
  }

  test("quantization is deterministic and cosine survives within PQ-class error") {
    val rnd = new scala.util.Random(31)
    val vs = (0 until 50)
      .map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("id", "v")
    val a = vs.select($"id", int8Quantize($"v").as("q"))
      .as[(Long, Seq[Byte])].collect().toMap
    val b = vs.select($"id", int8Quantize($"v").as("q"))
      .as[(Long, Seq[Byte])].collect().toMap
    assert(a.keys.forall(k => a(k) == b(k)))
    // dequantized vectors keep cosine ≈ 1 vs the original
    val cos = vs.select($"id",
        cosineSimilarity($"v",
          int8Dequantize(int8Quantize($"v"), int8Scale($"v"))).as("c"))
      .as[(Long, Double)].collect()
    assert(cos.forall(_._2 > 0.999), s"worst ${cos.minBy(_._2)}")
  }
}

/** 1-bit sign quantization + popcount-XOR Hamming ANN: the 32× storage
  * cut and the candidate-generation path that never touches float math. */
class SignBitSpec extends SparkSpec {
  import spark.implicits._

  test("signPack: bit layout hand-checked, multi-word, -0.0 and boundary bits") {
    // 70 dims -> 2 words; dims 0,63,64,69 probe word boundaries
    val v = Array.fill(70)(-1.0f)
    v(0) = 1.0f; v(5) = 0.0f; v(7) = -0.0f; v(63) = 2.0f; v(64) = 3.0f; v(69) = 0.5f
    val got = Seq(Tuple1(v)).toDF("v")
      .select(signPack($"v").as("c")).as[Seq[Long]].head()
    val w0 = (1L << 0) | (1L << 5) | (1L << 7) | (1L << 63) // -0.0 >= 0 sets bit 7
    val w1 = (1L << 0) | (1L << 5)                          // dims 64, 69
    assert(got === Seq(w0, w1), got.map(_.toBinaryString))
  }

  test("hammingDistance: XOR popcount across words, zero for identical codes") {
    val df = Seq(
      (Seq(0L, 0L), Seq(-1L, 0L), 64),       // one word fully flipped
      (Seq(5L, 9L), Seq(5L, 9L), 0),
      (Seq(1L, 1L << 62), Seq(2L, 0L), 3)
    ).toDF("a", "b", "want")
    val got = df.select(hammingDistance($"a", $"b").as("h"), $"want")
      .as[(Int, Int)].collect()
    assert(got.forall { case (h, w) => h == w }, got.toSeq)
  }

  test("signBitTopK: planted near-duplicate ranks 1; full-pool parity with brute") {
    val rnd = new scala.util.Random(47)
    val base = (0 until 120).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
    // id 200: tiny perturbation of id 7 — same signs almost surely, so it
    // survives the Hamming pool and wins the exact re-rank
    val nearDup = (200L, base(7)._2.map(x => x + 0.001f * math.signum(x)))
    val df = (base :+ nearDup).toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" === 7L)
    val top = Similarity.signBitTopK(df, q, "vec_id", "embedding", k = 3, rerank = 20)
      .orderBy($"rank").as[(Long, Int, Long, Int, Double)].collect()
    assert(top.head._3 == 200L && top.head._4 == 0, top.toSeq)
    // rerank = corpus size -> every candidate re-ranked exactly: ids must
    // equal the brute-force answer rank for rank
    val qs = df.filter($"vec_id" < 5L)
    val viaSign = Similarity.signBitTopK(df, qs, "vec_id", "embedding",
        k = 5, rerank = 121)
      .select($"query_id", $"rank", $"id", $"cosine")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val viaBrute = Similarity.bruteForceTopK(df, qs, "vec_id", "embedding", 5)
      .select($"query_id", $"rank", $"id", $"cosine")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(viaSign == viaBrute)
  }

  test("matryoshkaTopK: planted near-dup survives truncation; full-pool " +
       "parity with brute") {
    val rnd = new scala.util.Random(53)
    val base = (0 until 120).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
    // prefix-perturbed copy of id 9: the FIRST 16 dims stay almost
    // identical, so the truncated pass must keep it in the pool and the
    // full-dim re-rank puts it first
    val nearDup = (300L, base(9)._2.map(x => x + 0.001f * math.signum(x)))
    val df = (base :+ nearDup).toDF("vec_id", "embedding")
    val top = Similarity.matryoshkaTopK(df, df.filter($"vec_id" === 9L),
        "vec_id", "embedding", k = 3, dims = 16, rerank = 20)
      .orderBy($"rank").as[(Long, Int, Long, Double, Double)].collect()
    assert(top.head._3 == 300L, top.toSeq)
    val qs = df.filter($"vec_id" < 5L)
    val viaMrl = Similarity.matryoshkaTopK(df, qs, "vec_id", "embedding",
        k = 5, dims = 16, rerank = 121)
      .select($"query_id", $"rank", $"id", $"cosine")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val viaBrute = Similarity.bruteForceTopK(df, qs, "vec_id", "embedding", 5)
      .select($"query_id", $"rank", $"id", $"cosine")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(viaMrl == viaBrute)
  }

  test("asymmetricSignTopK: exact integer scores; magnitude-aware ordering " +
      "where symmetric Hamming would tie; cosine re-rank wins") {
    // q = (1.0, -0.01): signs (+,-). Corpus: 1 sign-identical,
    // 2 and 3 each ONE bit off — Hamming ties them, the asymmetric
    // score splits them by 2e6 (2 disagrees only on the weak dim)
    val corpus = Seq(
      (1L, Array(0.5f, -0.5f)),
      (2L, Array(0.1f, 0.9f)),
      (3L, Array(-0.9f, -0.01f))).toDF("vec_id", "embedding")
    val q = Seq((100L, Array(1.0f, -0.01f))).toDF("vec_id", "embedding")
    val out = Similarity.asymmetricSignTopK(corpus, q, "vec_id",
        "embedding", k = 3, rerank = 3)
      .as[(Long, Int, Long, Long, Double)].collect().toSeq.sortBy(_._2)
    assert(out.map(r => r._3 -> r._4).toMap ==
      Map(1L -> 1010000L, 2L -> 990000L, 3L -> -990000L))
    assert(out.map(_._3) == Seq(1L, 2L, 3L), s"cosine order: $out")
    // symmetric Hamming cannot order 2 vs 3 (both distance 1)
    val ham = corpus.select($"vec_id",
        hammingDistance(signPack($"embedding"),
          signPack(typedlit(Array(1.0f, -0.01f))))
          .as("h"))
      .as[(Long, Long)].collect().toMap
    assert(ham(2L) == ham(3L) && ham(1L) == 0L)
  }
}
