package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

/** The point of bucketing is what is ABSENT from the plan: a join of two
  * co-bucketed tables must contain no Exchange (shuffle) on either side.
  * An aggregation on the bucket key must also skip its exchange. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def exchanges(plan: SparkPlan): Seq[Exchange] = {
    val resolved = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    resolved.collect { case e: Exchange => e }
  }

  private lazy val tables: Unit = {
    val facts = (1L to 10000L).map(k => (k % 500, k, k * 2.0))
      .toDF("key", "id", "amount")
    val dims = (0L until 500L).map(k => (k, s"dim_$k"))
      .toDF("key", "name")
    Bucketing.writeBucketed(facts, "graft_bkt_facts", buckets = 8, keys = Seq("key"))
    Bucketing.writeBucketed(dims, "graft_bkt_dims", buckets = 8, keys = Seq("key"))
  }

  test("co-bucketed equi-join plans zero Exchange on either side") {
    tables
    // small data would broadcast; force the sort-merge path the layout
    // is designed for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "graft_bkt_facts",
        "graft_bkt_dims", Seq("key"), Seq("key"))
      assert(joined.count() == 10000L)
      val ex = exchanges(joined.queryExecution.executedPlan)
      assert(ex.isEmpty,
        s"bucketed join must not shuffle, found: ${ex.map(_.nodeName)}")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("aggregation on the bucket key skips its exchange") {
    tables
    val agg = spark.table("graft_bkt_facts")
      .groupBy($"key").agg(sum($"amount").as("total"))
    assert(agg.count() == 500L)
    val ex = exchanges(agg.queryExecution.executedPlan)
    assert(ex.isEmpty,
      s"bucket-key aggregation must not shuffle, found: ${ex.map(_.nodeName)}")
  }

  test("join on a NON-bucket key still shuffles (sanity: the detector works)") {
    tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val l = spark.table("graft_bkt_facts")
      val r = spark.table("graft_bkt_dims").withColumnRenamed("key", "id")
      val joined = l.join(r, "id")
      joined.count()
      assert(exchanges(joined.queryExecution.executedPlan).nonEmpty)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
