package graft.operators

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymityAudit: combos under k flag, NULL quasi-values form their own class") {
    val df = Seq(
      ("en", "web"), ("en", "web"), ("en", "web"),
      ("en", "book"),
      (null.asInstanceOf[String], "web"), (null.asInstanceOf[String], "web")
    ).toDF("lang", "src")
    val out = Privacy.kAnonymityAudit(df, Seq("lang", "src"), k = 3)
      .collect().map(r => (Option(r.getString(0)), r.getString(1),
        r.getLong(2), r.getBoolean(3))).toSet
    assert(out == Set(
      (Some("en"), "web", 3L, false),
      (Some("en"), "book", 1L, true),
      (None, "web", 2L, true)))
  }

  test("lDiversityAudit: class diversity counts distinct sensitive values, NULLs excluded") {
    val df = Seq(
      ("a", "s1"), ("a", "s2"), ("a", "s2"),
      ("b", "s1"), ("b", "s1"),
      ("c", null.asInstanceOf[String])
    ).toDF("q", "sens")
    val out = Privacy.lDiversityAudit(df, Seq("q"), "sens", l = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(out == Set(
      ("a", 3L, 2L, false),   // two distinct sensitive values
      ("b", 2L, 1L, true),    // homogeneous class leaks by association
      ("c", 1L, 0L, true)))   // all-NULL sensitive: 0 distinct, at risk
  }

  test("plan: both audits are a single grouped aggregate — no window, no join") {
    val df = Seq(("a", "s1", 1L)).toDF("q", "sens", "v")
    val p1 = Privacy.kAnonymityAudit(df, Seq("q"), 2)
      .queryExecution.executedPlan.toString
    val p2 = Privacy.lDiversityAudit(df, Seq("q"), "sens", 2)
      .queryExecution.executedPlan.toString
    for (p <- Seq(p1, p2)) {
      assert(!p.contains("Window"), p)
      assert(!p.contains("Join"), p)
    }
  }
}
