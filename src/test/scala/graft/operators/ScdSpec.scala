package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("scd2Build: collapse, re-change, null-safe attrs; scd2AsOf cuts") {
    val log = Seq(
      // key 1: A, A (collapses), B
      (1L, Some("A"), "2024-01-01"), (1L, Some("A"), "2024-02-01"),
      (1L, Some("B"), "2024-03-01"),
      // key 2: A -> B -> A (the change-BACK opens a third version)
      (2L, Some("A"), "2024-01-01"), (2L, Some("B"), "2024-02-01"),
      (2L, Some("A"), "2024-03-01"),
      // key 3: NULL, NULL (null-safe collapse), C
      (3L, None, "2024-01-01"), (3L, None, "2024-02-01"),
      (3L, Some("C"), "2024-03-01")
    ).toDF("k", "a", "ts").withColumn("ts", col("ts").cast("date"))
    val v = Scd.scd2Build(log, "k", Seq("a"), "ts")
      .orderBy($"k", $"valid_from")
      .as[(Long, Option[String], java.sql.Date, Option[java.sql.Date], Boolean)]
      .collect().toSeq
    assert(v == Seq(
      (1L, Some("A"), d("2024-01-01"), Some(d("2024-03-01")), false),
      (1L, Some("B"), d("2024-03-01"), None, true),
      (2L, Some("A"), d("2024-01-01"), Some(d("2024-02-01")), false),
      (2L, Some("B"), d("2024-02-01"), Some(d("2024-03-01")), false),
      (2L, Some("A"), d("2024-03-01"), None, true),
      (3L, None, d("2024-01-01"), Some(d("2024-03-01")), false),
      (3L, Some("C"), d("2024-03-01"), None, true)))
    // as-of Feb 15: key 1 = A (still), key 2 = B, key 3 = NULL
    val ao = Scd.scd2AsOf(Scd.scd2Build(log, "k", Seq("a"), "ts"),
        lit("2024-02-15").cast("date"))
      .orderBy($"k").as[(Long, Option[String], java.sql.Date,
        Option[java.sql.Date], Boolean)].collect().toSeq
    assert(ao.map(r => (r._1, r._2)) ==
      Seq((1L, Some("A")), (2L, Some("B")), (3L, None)))
    // as-of before history: empty
    assert(Scd.scd2AsOf(Scd.scd2Build(log, "k", Seq("a"), "ts"),
      lit("2023-12-31").cast("date")).count() == 0L)
  }

  test("applyCdc: latest change wins, deletes remove, inserts add, " +
       "untouched rows pass through") {
    val base = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("k", "a")
    val changes = Seq(
      (2L, Some("X"), 1, "U"),   // update, later deleted
      (3L, Option.empty[String], 1, "D"),
      (4L, Some("N"), 1, "U"),   // insert of a new key
      (2L, Option.empty[String], 2, "D")  // the delete wins on ts
    ).toDF("k", "a", "ts", "op")
    val out = Scd.applyCdc(base, changes, "k", Seq("a"), "ts", "op")
      .orderBy($"k").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "A"), (4L, "N")))
    // a re-insert after a delete resurrects the key
    val redo = changes.union(Seq((3L, Some("C2"), 5, "U"))
      .toDF("k", "a", "ts", "op"))
    val out2 = Scd.applyCdc(base, redo, "k", Seq("a"), "ts", "op")
      .orderBy($"k").as[(Long, String)].collect().toSeq
    assert(out2 == Seq((1L, "A"), (3L, "C2"), (4L, "N")))
  }
}
