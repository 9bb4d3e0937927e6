package graft.operators

import graft.SparkSpec
import graft.expressions.GraftExpressions.jaroWinkler
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b"))).as[Double].collect().head

  test("textbook values match the published record-linkage references") {
    assert(jw("martha", "marhta") == 0.9611111111111111)  // Winkler '90
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("abcdef", "abcdef") == 1.0)
  }

  test("corners: empties, no matches, odd transpositions, sub-threshold prefix") {
    assert(jw("", "abc") == 0.0 && jw("abc", "") == 0.0)
    assert(jw("abc", "xyz") == 0.0)
    // window 0 forbids any off-position match
    assert(jw("ab", "ba") == 0.0)
    // 3 mismatched matched-positions -> integer half-transpositions = 1
    assert(jw("abcxxx", "bcaxxx") == 0.9444444444444445)
    // jaro <= 0.7: the common prefix must NOT boost
    assert(jw("abcdef", "abzzzz") == 0.5555555555555555)
    assert(jw("abcdefgh", "abcdzzzz") == 0.6666666666666666)
  }

  test("stays inside whole-stage codegen; NULL-safe") {
    val df = Seq((Some("ab"), Some("ab")), (None, Some("x")))
      .toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b")).as("j"))
    assert(df.as[Option[Double]].collect().toSet == Set(Some(1.0), None))
    // a range-backed frame can't be constant-folded to a LocalTableScan,
    // so the expression's codegen path is actually exercised
    val plan = spark.range(10)
      .select(jaroWinkler(concat(lit("w"), col("id")),
        concat(col("id"), lit("w"))).as("j"))
      .queryExecution.executedPlan.toString
    // the "*(1)" star prefix is WholeStageCodegen's plan marker — absent
    // when an expression falls back to interpreted eval
    assert(plan.contains("*(1) Project"), plan)
  }
}
