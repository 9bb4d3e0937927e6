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
