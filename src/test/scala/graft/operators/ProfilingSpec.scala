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

  test("benfordDigits: leading digits across magnitudes; exclusions; shape") {
    val df = Seq(Some(1.0), Some(23.0), Some(0.5), Some(999.0), Some(100.0),
      Some(0.0012), Some(-5.0), Some(0.0), None).toDF("v")
    val out = Profiling.benfordDigits(df, "v")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out.map(_._1) == (1L to 9L))
    // digits: 1, 2, 5, 9, 1, 1 -> six positive values counted
    assert(out.map(r => r._1 -> r._2).toMap ==
      Map(1L -> 3L, 2L -> 1L, 5L -> 1L, 9L -> 1L) ++
        Seq(3L, 4L, 6L, 7L, 8L).map(_ -> 0L).toMap)
    assert(out.map(_._2).sum == 6L)
    assert(out.head._3 == 0.5)                 // 3/6 observed share
    assert(out.head._4 == 0.30103)             // log10(2)
    assert(out.last._4 == 0.045757)            // log10(10/9)
  }

  test("fkOrphanAudit / pkDuplicateAudit: planted orphan, duplicate excess, NULLs out") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val fk = Profiling.fkOrphanAudit(child, "fk", parent, "pk", "c")
      .as[(String, Long, Long, Double)].collect().head
    assert(fk == (("c", 3L, 1L, 0.333333)))
    val pk = Profiling.pkDuplicateAudit(
        Seq(Some(1L), Some(1L), Some(2L), None).toDF("k"), "k", "p")
      .as[(String, Long, Long, Double)].collect().head
    assert(pk == (("p", 3L, 1L, 0.333333)))
    // clean relation: zero bad, zero rate
    val clean = Profiling.fkOrphanAudit(parent, "pk", parent, "pk", "self")
      .as[(String, Long, Long, Double)].collect().head
    assert(clean == (("self", 3L, 0L, 0.0)))
  }

  test("datasetCardBySource: volumes, dominant-language tiebreak, null langs") {
    val df = Seq(
      ("a", 10L, Some("en")), ("a", 20L, Some("de")), ("a", 30L, Some("en")),
      // source b: en and fr tie at 1 -> lexicographic winner 'en'
      ("b", 5L, Some("fr")), ("b", 7L, Some("en")),
      ("c", 4L, None)) // only null langs: no top_lang, 0 distinct
      .toDF("src", "len", "lang")
    val out = Profiling.datasetCardBySource(df, "src", "len", "lang")
      .as[(String, Long, Long, Double, Long, Option[String], Long)]
      .collect().toSeq
    assert(out == Seq(
      ("a", 3L, 60L, 20.0, 2L, Some("en"), 2L),
      ("b", 2L, 12L, 6.0, 2L, Some("en"), 1L),
      ("c", 1L, 4L, 4.0, 0L, None, 0L)))
  }

  test("constraintAudit: one-pass suite — null/set/range/regex/predicate " +
       "semantics, null-predicate counts as violation, name collisions " +
       "rejected") {
    import Profiling._
    val df = Seq(
      (Some(1L), Some("A"), Some(5.0), Some("ok_1")),
      (Some(2L), Some("X"), Some(99.0), Some("bad!")),   // set + range + regex
      (None, Some("N"), None, None),                     // null key
      (Some(4L), None, Some(-1.0), Some("ok_2")))        // range low
      .toDF("k", "flag", "qty", "tag")
    val out = Profiling.constraintAudit(df, Seq(
        NotNull("k"),
        InSet("flag", Seq("A", "N", "R")),
        InRange("qty", 0.0, 50.0),
        MatchesRegex("tag", "^ok_[0-9]$"),
        Satisfies("qty_vs_key", col("qty") > col("k").cast("double"))))
      .as[(String, Long, Long, Double)].collect().toSeq
    // nulls never violate set/range/regex (only not_null counts them);
    // the Satisfies rows with null operands DO violate (unknowable=fail):
    // row1 5>1 ok; row2 99>2 ok; row3 null fail; row4 -1>4 fail -> 2
    assert(out == Seq(
      ("in_range(qty,0.0,50.0)", 4L, 2L, 0.5),
      ("in_set(flag)", 4L, 1L, 0.25),
      ("matches_regex(tag)", 4L, 1L, 0.25),
      ("not_null(k)", 4L, 1L, 0.25),
      ("satisfies(qty_vs_key)", 4L, 2L, 0.5)))
    intercept[IllegalArgumentException] {
      Profiling.constraintAudit(df, Seq(NotNull("k"), NotNull("k")))
    }
    // empty frame: zero rows, zero violations, rate 0 (not NaN)
    val empty = Profiling.constraintAudit(
        df.filter(col("k") === -99L), Seq(NotNull("k")))
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(empty == Seq(("not_null(k)", 0L, 0L, 0.0)))
  }

  test("mutualInformation: independent columns score 0 per cell, a " +
       "deterministic pairing sums to ln 2, nulls drop, empty fails") {
    import org.apache.spark.sql.functions.col
    // perfectly independent 2x2: every cell contrib is 0.25*ln(1) = 0
    val ind = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v"))
      .toDF("a", "b")
    val indOut = Profiling.mutualInformation(ind, "a", "b")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(indOut.map(_._6).forall(_ == 0.0) && indOut.size == 4)
    // deterministic pairing: each cell 0.5*ln 2, MI = ln 2
    val dep = Seq(("x", "u"), ("x", "u"), ("y", "v"), ("y", "v"))
      .toDF("a", "b")
    val depOut = Profiling.mutualInformation(dep, "a", "b")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    val half = BigDecimal(0.5 * math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(depOut == Seq(("x", "u", 2L, 2L, 2L, half),
      ("y", "v", 2L, 2L, 2L, half)))
    // a suppressed cell contributes NEGATIVELY: 3:1 within-row split
    val mix = Seq(("x", "u"), ("x", "u"), ("x", "u"), ("x", "v"),
      ("y", "v"), ("y", "v"), ("y", "v"), ("y", "u")).toDF("a", "b")
    val mixOut = Profiling.mutualInformation(mix, "a", "b")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._6).toMap
    assert(mixOut(("x", "u")) > 0 && mixOut(("x", "v")) < 0)
    // nulls on either side are excluded from all counts
    val withNull = Seq((Some("x"), Some("u")), (None, Some("u")),
      (Some("x"), None), (Some("x"), Some("u"))).toDF("a", "b")
    val nOut = Profiling.mutualInformation(withNull, "a", "b")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(nOut == Seq(("x", "u", 2L, 2L, 2L, 0.0)))
    intercept[IllegalArgumentException] {
      Profiling.mutualInformation(ind.filter(col("a") === "zz"), "a", "b")
    }
  }
}
