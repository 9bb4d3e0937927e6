package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on edge lists. The corpus-curation uses:
  * TextRank keyword scoring over the word-adjacency graph (Mihalcea &
  * Tarau 2004), link-graph authority for URL/domain quality weighting,
  * and centrality over near-duplicate graphs ("which document is the hub
  * of this template family").
  */
object Graph {

  /** PageRank in scaled INTEGER arithmetic (Page et al. 1999, damping
    * 0.85): probabilities are held as `p · scale` longs and every step is
    * integer floor division — `pr' = (15·(scale div N)) div 100 +
    * (85 · Σ_in (pr_u div deg_u)) div 100` — so a run is bit-reproducible
    * across engines, partitionings, and re-runs (float PageRank depends
    * on summation order). The floor-division mass leak is at most a few
    * ulps of `1/scale` per node per iteration — irrelevant for ranking,
    * which is the operator's use.
    *
    * Semantics: edges are taken as DIRECTED and deduplicated; symmetrize
    * upstream for an undirected graph. Nodes are the union of endpoints.
    * Dangling nodes (no out-edges) leak their mass rather than
    * teleporting it — the simplest standard variant, and the leak only
    * lowers everyone uniformly. Self-loops participate like any edge.
    *
    * Returns (node, pr long) with `pr` on the `scale` grid. Scale shape:
    * per iteration, ONE keyed equi-join of the edge list against the
    * (node, pr) frame plus one map-combinable sum by destination — the
    * standard Pregel-style sequence; pr frames are persisted per
    * iteration and the previous one released, so lineage stays flat for
    * any iteration count. Nothing is ever collected to the driver.
    */
  def pageRankIntegers(edges: DataFrame, srcCol: String, dstCol: String,
                       iterations: Int,
                       scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(scale >= 1000000L, s"scale too coarse to rank: $scale")
    import org.apache.spark.storage.StorageLevel
    def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("div", a, b)
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("__s").as("node"))
      .union(e.select(col("__d"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    if (n == 0) { e.unpersist(); nodes.unpersist(); return nodes.withColumn("pr", lit(0L)) }
    val base = scale / n
    val b15 = 15L * base / 100L
    val deg = e.groupBy(col("__s")).agg(count(lit(1)).as("__deg"))
    val contribSrc = e.join(deg, "__s") // (s, d, deg)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var pr = nodes.withColumn("pr", lit(base))
      .persist(StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to iterations) {
      val inflow = contribSrc.join(pr, col("__s") === col("node"))
        .select(col("__d"), idiv(col("pr"), col("__deg")).as("__c"))
        .groupBy(col("__d")).agg(sum(col("__c")).as("__in"))
      val next = nodes.join(inflow, col("node") === col("__d"), "left")
        .select(col("node"),
          (lit(b15) + idiv(lit(85L) * coalesce(col("__in"), lit(0L)), lit(100L)))
            .as("pr"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before releasing the previous frame
      pr.unpersist()
      pr = next
    }
    e.unpersist(); contribSrc.unpersist(); nodes.unpersist()
    pr
  }
}
