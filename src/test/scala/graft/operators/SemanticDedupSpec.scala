package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}

/** SemDeDup semantics ([[Dedup.semanticDedup]]): within-cluster-only
  * pruning with the keep-lowest-id rule, and a plan whose pair stage is a
  * genuine equi-join on the cluster id — never an all-pairs product. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // four well-separated direction groups in 8 dims; near-copies are
  // scaled/perturbed so they share a direction (cosine ~1) but not bytes
  private def v(axis: Int, scale: Float, eps: Float): Array[Float] =
    Array.tabulate(8)(i => if (i == axis) scale else eps)
  private val docs = Seq(
    (1L, v(0, 1.0f, 0.00f)),   // group A representative (lowest id)
    (2L, v(0, 1.1f, 0.01f)),   // near-copy of A -> dropped
    (3L, v(0, 0.9f, 0.02f)),   // near-copy of A -> dropped
    (10L, v(1, 1.0f, 0.00f)),  // group B representative
    (11L, v(1, 1.2f, 0.01f)),  // near-copy of B -> dropped
    (20L, v(2, 1.0f, 0.00f)),  // singleton
    (21L, v(3, 1.0f, 0.00f))   // singleton
  ).toDF("doc_id", "embedding")

  private def resolve(plan: SparkPlan): SparkPlan = plan match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case p => p
  }

  test("keeps the lowest id per semantic group, singletons untouched") {
    val kept = Dedup.semanticDedup(docs, "doc_id", "embedding",
      nClusters = 4, threshold = 0.95)
    assert(kept.select($"doc_id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 10L, 20L, 21L))
    // full rows come back, not a projection
    assert(kept.columns.toSeq === Seq("doc_id", "embedding"))
  }

  test("dissimilar rows sharing a cluster are never dropped (no false drop)") {
    // nClusters = 1 forces EVERYTHING into one cluster: the operator may
    // then compare all pairs, but must still only drop above-threshold ones
    val kept = Dedup.semanticDedup(docs, "doc_id", "embedding",
      nClusters = 1, threshold = 0.95)
    assert(kept.select($"doc_id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 10L, 20L, 21L))
  }

  test("keepFarthest keeps the group member farthest from the centroid") {
    // one cluster; a near-dup group spanning 0°..5.7° off e1 plus an e2
    // singleton that pulls the centroid ~21° away — the PURE e1 vector
    // (angle 0, deliberately the HIGHEST id) is farthest from any
    // reasonable centroid of this data, so the two policies must disagree
    def vv(x: Float, y: Float): Array[Float] =
      Array(x, y, 0f, 0f, 0f, 0f, 0f, 0f)
    val group = Seq(
      (1L, vv(1.0f, 0.10f)),  // lowest id, closest to centroid
      (2L, vv(1.0f, 0.05f)),
      (3L, vv(1.0f, 0.00f)),  // farthest from centroid, highest id
      (10L, vv(0.0f, 1.00f))  // singleton
    ).toDF("doc_id", "embedding")
    val byId = Dedup.semanticDedup(group, "doc_id", "embedding",
      nClusters = 1, threshold = 0.95)
    assert(byId.select($"doc_id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 10L))
    val byDist = Dedup.semanticDedup(group, "doc_id", "embedding",
      nClusters = 1, threshold = 0.95, keepFarthest = true)
    assert(byDist.select($"doc_id").as[Long].collect().sorted.toSeq ===
      Seq(3L, 10L))
  }

  test("pair stage is an equi-join on cid: no cartesian/nested-loop product") {
    val kept = Dedup.semanticDedup(docs, "doc_id", "embedding",
      nClusters = 4, threshold = 0.95)
    kept.count()
    val plan = resolve(kept.queryExecution.executedPlan)
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      s"within-cluster pruning must never plan an all-pairs product:\n$plan")
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"within-cluster pruning must never plan a nested-loop join:\n$plan")
    val keyed = plan.collect { case j: BaseJoinExec => j }
      .filter(_.leftKeys.exists(_.references.exists(_.name == "cid")))
    assert(keyed.nonEmpty,
      s"expected the pair join keyed on the cluster id:\n$plan")
  }
}
