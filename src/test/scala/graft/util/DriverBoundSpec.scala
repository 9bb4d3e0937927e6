package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriverBoundSpec extends SparkSpec {
  import spark.implicits._

  test("collectBounded: returns every row under the cap (order " +
       "preserved for sorted frames), fails loudly at cap+1 without " +
       "fetching the full frame") {
    val df = (1 to 20).map(i => (i, s"v$i")).toDF("i", "s")
    val ok = DriverBound.collectBounded(df.orderBy(col("i")), 20, "t")
    assert(ok.map(_.getInt(0)).toSeq == (1 to 20))
    val e = intercept[IllegalArgumentException] {
      DriverBound.collectBounded(df, 19, "categoryCounts(event_type)")
    }
    assert(e.getMessage.contains("categoryCounts(event_type)"))
    assert(e.getMessage.contains("19"))
  }

  test("the operator layer enforces its sidecar bounds: an id-like " +
       "column passed as a categorical fails with the operator's name " +
       "in the message") {
    val ids = (1 to 64).map(i => s"user_$i").toDF("c")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Drift.categoryCounts(ids, "c", maxCategories = 32)
    }
    assert(e.getMessage.contains("categoryCounts(c)"))
    // under the cap the same call is the normal path
    val ok = graft.operators.Drift.categoryCounts(ids, "c",
      maxCategories = 64)
    assert(ok.size == 64 && ok.head._2 == 1L)
  }
}
