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

  test("decontaminateSemantic: planted paraphrase flags; a hub with " +
       "high cosine but no margin stays clean; near-miss below the " +
       "cosine bar stays clean; thresholds are micro-exact") {
    import org.apache.spark.sql.functions.col
    // 8-dim corpus: 4 distinct directions + a dense generic neighborhood
    // around axis 3 (the hub background)
    def u(axis: Int, scale: Float, eps: Float) =
      Array.tabulate(8)(i => if (i == axis) scale else eps)
    val corpus = Seq(
      (101L, u(0, 1.0f, 0.0f)), (102L, u(1, 1.0f, 0.0f)),
      (103L, u(2, 1.0f, 0.0f)),
      // the dense neighborhood: five near-parallel axis-3 vectors
      (104L, u(3, 1.0f, 0.02f)), (105L, u(3, 1.0f, 0.03f)),
      (106L, u(3, 1.0f, 0.04f)), (107L, u(3, 1.0f, 0.05f)),
      (108L, u(3, 1.0f, 0.06f))).toDF("id", "v")
    val eval = Seq(
      // planted paraphrase: near-copy of 101 -> cos ~0.999, background
      // (everything else) near-orthogonal -> huge margin -> FLAGGED
      (1L, u(0, 1.05f, 0.01f)),
      // hub: parallel to the dense axis-3 neighborhood -> top cosine
      // ~0.999 BUT every background neighbor is also ~0.99 -> margin
      // fails -> clean (this is what the margin term exists to catch)
      (2L, u(3, 1.0f, 0.04f)),
      // near-miss: moderately similar to 102 (cos ~0.8) -> below the
      // 0.9 cosine bar -> clean
      (3L, Array.tabulate(8)(i =>
        if (i == 1) 1.0f else if (i == 2) 0.75f else 0.0f))
    ).toDF("id", "v")
    val out = Dedup.decontaminateSemantic(corpus, eval, "id", "v",
        k = 5, minCosine = 0.9, minMargin = 0.2)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) == Seq((1L, 101L)),
      s"only the planted paraphrase must flag: $out")
    assert(out.head._3 >= 0.99 && out.head._5 >= 0.2)
    // determinism: identical inputs -> identical micro-exact rows
    val again = Dedup.decontaminateSemantic(corpus, eval, "id", "v",
        k = 5, minCosine = 0.9, minMargin = 0.2)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(again == out)
    // corpus smaller than k: hard error, not a padded background
    val e = intercept[IllegalArgumentException] {
      Dedup.decontaminateSemantic(corpus.limit(3), eval, "id", "v",
        k = 5, minCosine = 0.9, minMargin = 0.2)
    }
    assert(e.getMessage.contains("k=5"))
    // no-eval and no-flag inputs return empty, not error
    assert(Dedup.decontaminateSemantic(corpus, eval.filter(col("id") === 3L),
      "id", "v", k = 5, minCosine = 0.9, minMargin = 0.2).count() == 0)
  }
}
