package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("hllRegisters: full 2^p shape, duplicate values leave registers unchanged") {
    val df = Seq("a", "b", "c").toDF("v")
    val once = Sketch.hllRegisters(df, "v", p = 4)
      .as[(Long, Long)].collect().toSeq
    assert(once.length == 16 && once.map(_._1) == (0L until 16L))
    // registers are a max — duplicating the input cannot move them
    val dup = Sketch.hllRegisters(df.union(df).union(df), "v", p = 4)
      .as[(Long, Long)].collect().toSeq
    assert(dup == once)
    // at most 3 non-empty registers for 3 values
    assert(once.count(_._2 > 0L) <= 3)
  }

  test("hllMerge == registers of the union; estimate within 5% at 10k distinct") {
    val a = spark.range(10000).select(col("id").cast("string").as("v"))
    val b = spark.range(5000, 15000).select(col("id").cast("string").as("v"))
    val merged = Sketch.hllMerge(
      Sketch.hllRegisters(a, "v"), Sketch.hllRegisters(b, "v"))
      .as[(Long, Long)].collect().toSeq
    val direct = Sketch.hllRegisters(a.union(b), "v")
      .as[(Long, Long)].collect().toSeq
    assert(merged == direct) // max commutes with union — exactly
    val est = Sketch.hllEstimate(Sketch.hllRegisters(a.union(b), "v"))
      .as[(Double, Long, Long)].collect().head
    assert(est._2 == 256L)
    assert(math.abs(est._1 - 15000.0) / 15000.0 < 0.05, est)
  }

  test("hllEstimate: small-range linear counting kicks in; NULLs excluded") {
    val tiny = Seq(Some("x"), Some("y"), None).toDF("v")
    val est = Sketch.hllEstimate(Sketch.hllRegisters(tiny, "v"))
      .as[(Double, Long, Long)].collect().head
    // 2 values -> v_zero >= 254, linear counting ~= 2
    assert(est._3 >= 254L && est._1 > 0.0 && est._1 < 10.0, est)
  }
}
