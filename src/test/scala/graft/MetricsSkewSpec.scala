package graft

import graft.metrics.SkewAudit
import org.apache.spark.sql.functions._

class MetricsSkewSpec extends SparkSpec {
  import spark.implicits._

  test("SkewAudit flags a hot-key shuffle and clears a uniform one") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // ~99% of rows land on key 0 → one reduce task reads almost everything
      val skewed = spark.range(100000)
        .withColumn("k", when($"id" % 100 === 0, $"id").otherwise(lit(0L)))
      val (_, hotReport) = SkewAudit.audit(spark) {
        skewed.repartition(8, $"k").rdd.count()
      }
      val hot = hotReport.filter(s => s.tasks >= 8 && s.maxShuffleReadBytes > 0)
      assert(hot.nonEmpty, s"no shuffle stage captured: $hotReport")
      assert(hot.exists(_.shuffleSkew > 5.0),
        s"hot key must show shuffle skew: ${hot.map(_.shuffleSkew)}")

      // uniform keys → balanced reads
      val uniform = spark.range(100000).withColumn("k", $"id")
      val (_, evenReport) = SkewAudit.audit(spark) {
        uniform.repartition(8, $"k").rdd.count()
      }
      val even = evenReport.filter(s => s.tasks >= 8 && s.maxShuffleReadBytes > 0)
      assert(even.nonEmpty && even.forall(_.shuffleSkew < 2.0),
        s"uniform keys must stay balanced: ${even.map(_.shuffleSkew)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}
