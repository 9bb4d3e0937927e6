package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profileColumns: nulls, exact distinct, native-order envelope") {
    val df = Seq(
      (Some(10L), Some("b"), Some("2024-03-01 10:20:30")),
      (Some(9L), Some("a"), Some("2024-01-15 00:00:00")),
      (None, Some("a"), None),
      (Some(100L), None, Some("2024-12-31 23:59:59")))
      .toDF("k", "s", "t")
      .withColumn("t", col("t").cast("timestamp"))
    val out = Profiling.profileColumns(df, Seq("k", "s", "t"))
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(out == Seq(
      // min/max on the NATIVE type: 9 < 10 < 100 numerically (a string
      // min would have said "10" < "9")
      ("k", 4L, 1L, 3L, "9", "100"),
      ("s", 4L, 1L, 2L, "a", "b"),
      ("t", 4L, 1L, 3L, "2024-01-15 00:00:00", "2024-12-31 23:59:59")))
  }

  test("profileColumns: all-null column yields null envelope, zero distinct") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("k", "s")
    val out = Profiling.profileColumns(df, Seq("s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().toSeq
    assert(out == Seq(("s", 2L, 2L, 0L, None, None)))
    intercept[IllegalArgumentException] {
      Profiling.profileColumns(df, Seq("missing"))
    }
  }
}
