package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** PERSONALIZED PageRank in the same scaled-integer arithmetic as
    * [[pageRankIntegers]] (Page et al. 1999 §6; the random-walk-with-
    * restart form): the teleport mass returns to a SEED set instead of
    * the uniform distribution, so scores measure proximity to the seeds
    * — "which near-duplicate cluster members sit closest to the known
    * contaminated documents", "which URLs are most reachable from the
    * trusted domains". Probabilities are `p · scale` longs; every step
    * is integer floor division, so a run is bit-reproducible across
    * engines and partitionings.
    *
    * `seeds` is a one-column frame of node ids; seeds not present in the
    * edge set still teleport (they are added to the node set), and the
    * initial mass is `scale div |seeds|` on each seed, 0 elsewhere.
    * Update: `pr'(v) = [v ∈ S]·(15·(scale div |S|)) div 100 +
    * (85 · Σ_{u→v} (pr_u div deg_u)) div 100`. Edges are DIRECTED and
    * deduplicated (symmetrize upstream for undirected graphs); dangling
    * mass leaks, as in the uniform variant.
    *
    * Returns (node, pr long). Scale shape: identical to
    * [[pageRankIntegers]] — per iteration ONE keyed equi-join of edges
    * against the pr frame + one map-combinable sum, the seed flag rides
    * as a broadcast-joinable column; nothing collects to the driver. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, seedCol: String,
                           iterations: Int,
                           scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(scale >= 1000000L, s"scale too coarse to rank: $scale")
    import org.apache.spark.storage.StorageLevel
    def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("div", a, b)
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val seedSet = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("__seed", lit(1L))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nSeeds = seedSet.count()
    require(nSeeds >= 1, "personalizedPageRank needs at least one seed")
    val nodes = e.select(col("__s").as("node"))
      .union(e.select(col("__d")))
      .union(seedSet.select(col("node"))).distinct()
      .join(seedSet.select(col("node"), col("__seed")), Seq("node"), "left")
      .select(col("node"), coalesce(col("__seed"), lit(0L)).as("__seed"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    nodes.count()
    val base = scale / nSeeds
    val b15 = 15L * base / 100L
    val deg = e.groupBy(col("__s")).agg(count(lit(1)).as("__deg"))
    val contribSrc = e.join(deg, "__s")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // iteration state: persist+count per round (cheap — blocks reused,
    // no extra write), but TRUNCATE lineage via localCheckpoint every
    // 5th round and at the end. Persist alone leaves the full join tree
    // nested k-deep in every later plan (observed: a 650 KB explain at
    // k = 3 — a plan-compile scale hazard at PageRank-style k = 20+),
    // while checkpointing every round doubles the wall cost; the
    // interval buys O(1) final plans at persist-level speed.
    var pr = nodes.select(col("node"), col("__seed"),
        (col("__seed") * lit(base)).as("pr"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    for (i <- 1 to iterations) {
      val inflow = contribSrc.join(pr, col("__s") === col("node"))
        .select(col("__d"), idiv(col("pr"), col("__deg")).as("__c"))
        .groupBy(col("__d")).agg(sum(col("__c")).as("__in"))
      val nextRaw = nodes.join(inflow, col("node") === col("__d"), "left")
        .select(col("node"), col("__seed"),
          (col("__seed") * lit(b15) +
            idiv(lit(85L) * coalesce(col("__in"), lit(0L)), lit(100L)))
            .as("pr"))
      val next =
        if (i % 5 == 0 || i == iterations) nextRaw.localCheckpoint()
        else {
          val p = nextRaw.persist(StorageLevel.MEMORY_AND_DISK)
          p.count()
          p
        }
      pr.unpersist()
      pr = next
    }
    e.unpersist(); contribSrc.unpersist(); nodes.unpersist()
    seedSet.unpersist()
    pr.select(col("node"), col("pr"))
  }

  /** Multi-source BFS hop distances: the minimum number of edges from
    * ANY source node — "how far does contamination spread from the
    * known-bad documents through the near-duplicate graph", "which
    * records sit within 2 fuzzy-match hops of a flagged entity". Pure
    * integer hop counts, so the result is bit-identical in any engine.
    *
    * Frontier-expanded: hop h joins the edge set against only the nodes
    * FIRST REACHED at hop h−1 (not the whole reached set), and stops
    * early when a frontier comes back empty — per round one keyed
    * equi-join of edges against the frontier + one anti-join against
    * the reached set, the textbook distributed BFS shape (Pregel's
    * message step as DataFrame joins). Edges are DIRECTED (symmetrize
    * upstream for undirected reachability). Sources absent from the
    * edge set still report dist 0. Returns (node, dist long 0..maxHops)
    * for REACHED nodes only.
    *
    * Scale shape: cost per hop is O(edges out of the frontier), total
    * O(edges within maxHops of the sources) — never O(nodes²); the
    * reached set is persisted per round and released after. */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
                   sources: DataFrame, sourceCol: String,
                   maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 16,
      s"maxHops must be in [1,16], got $maxHops")
    import org.apache.spark.storage.StorageLevel
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    // per-round state is localCheckpointed (lineage-truncating), not
    // persisted — see personalizedPageRank: persisted lineage nests a
    // copy of every prior round's join tree into each later plan
    var reached = sources.select(col(sourceCol).as("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint()
    var frontier = reached
    var h = 1L
    var done = false
    while (h <= maxHops && !done) {
      val fresh = e.join(frontier.select(col("node")),
          col("__s") === col("node"))
        .select(col("__d").as("node")).distinct()
        .join(reached.select(col("node")), Seq("node"), "left_anti")
        .withColumn("dist", lit(h))
        .localCheckpoint()
      if (fresh.isEmpty) {
        done = true
      } else {
        reached = reached.unionByName(fresh).localCheckpoint()
        frontier = fresh
        h += 1L
      }
    }
    e.unpersist()
    reached.select(col("node"), col("dist"))
  }

  /** Per-SOURCE BFS hop distances — [[bfsDistances]] lifted to the
    * (source, node) key space: every source keeps its OWN distance
    * frontier instead of folding into a min, which is what centrality
    * computations need. Same frontier-expanded shape; per round one
    * keyed equi-join of edges against the frontier + one anti-join
    * against the reached set, cost O(Σ_s edges within maxHops of s).
    * Returns (source, node, dist long 0..maxHops) for reached pairs. */
  def bfsDistancesPerSource(edges: DataFrame, srcCol: String,
                            dstCol: String, sources: DataFrame,
                            sourceCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 16,
      s"maxHops must be in [1,16], got $maxHops")
    import org.apache.spark.storage.StorageLevel
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    var reached = sources.select(col(sourceCol).as("source")).distinct()
      .select(col("source"), col("source").as("node"), lit(0L).as("dist"))
      .localCheckpoint()
    var frontier = reached
    var h = 1L
    var done = false
    while (h <= maxHops && !done) {
      val fresh = e.join(frontier.select(col("source"), col("node")),
          col("__s") === col("node"))
        .select(col("source"), col("__d").as("node")).distinct()
        .join(reached.select(col("source"), col("node")),
          Seq("source", "node"), "left_anti")
        .withColumn("dist", lit(h))
        .localCheckpoint()
      if (fresh.isEmpty) {
        done = true
      } else {
        reached = reached.unionByName(fresh).localCheckpoint()
        frontier = fresh
        h += 1L
      }
    }
    e.unpersist()
    reached.select(col("source"), col("node"), col("dist"))
  }

  /** Harmonic centrality (Boldi & Vigna 2014, "Axioms for Centrality" —
    * the closeness variant that handles disconnection gracefully):
    * `H(v) = Σ_{u ≠ v reaching v} 1/d(u, v)`, here over a SAMPLED
    * source set within `maxHops` — the standard estimator at graph
    * scale, since exact all-pairs is quadratic. Each term is the exact
    * integer `1e6 div d` (micro-units), so sums are order-free and
    * bit-reproducible.
    *
    * Returns (node, n_reached long — sources at dist ≥ 1, h_micro
    * long). Scale shape: one [[bfsDistancesPerSource]] sweep (cost
    * bounded by sources × hop-bounded neighborhoods, NOT nodes²) + one
    * map-combinable grouped sum. */
  def harmonicCentrality(edges: DataFrame, srcCol: String, dstCol: String,
                         sources: DataFrame, sourceCol: String,
                         maxHops: Int): DataFrame =
    bfsDistancesPerSource(edges, srcCol, dstCol, sources, sourceCol,
        maxHops)
      .filter(col("dist") >= 1L)
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_reached"),
        sum(call_function("div", lit(1000000L), col("dist"))).as("h_micro"))

  /** Per-node triangle counts of an UNDIRECTED graph — the local
    * clustering signal over a near-duplicate / fuzzy-match graph: a
    * document in many triangles sits inside a dense template family
    * (candidates for one-per-cluster keep decisions), while a
    * bridge-node duplicate pair is more likely a false positive.
    *
    * Implementation is the degree-ordered orientation (the standard
    * O(m^1.5) enumeration, vs O(Σ deg²) for naive wedge counting): each
    * canonical edge is directed from its (degree, id)-smaller endpoint
    * to the larger, every triangle then has exactly ONE source node with
    * two out-edges, and a wedge (u→v, u→w, rank(v) < rank(w)) closes iff
    * the oriented edge v→w exists — checked with one semi-join. Max
    * out-degree after orientation is O(√m), which is what bounds the
    * wedge frame on a power-law graph where a raw hub would explode.
    *
    * Input edges are symmetrized/deduplicated internally; self-loops
    * dropped. Returns (node, triangles long) for nodes in ≥ 1 triangle,
    * exact integer counts — identical in any engine. All joins are
    * keyed equi-joins; nothing collects to the driver. */
  def triangleCounts(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame = {
    val canon = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    val deg = canon.select(col("a").as("n")).union(canon.select(col("b")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient by (degree, id): src = smaller endpoint in that total order
    val withDeg = canon
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("s"), col("b").as("t"),
          col("da").as("ds"), col("db").as("dt")))
        .otherwise(struct(col("b").as("s"), col("a").as("t"),
          col("db").as("ds"), col("da").as("dt"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"),
        col("e.ds").as("ds"), col("e.dt").as("dt"))
    val o1 = oriented.select(col("s"), col("t").as("v"),
      col("dt").as("dv"))
    val o2 = oriented.select(col("s"), col("t").as("w"),
      col("dt").as("dw"))
    val wedges = o1.join(o2, Seq("s"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    val closing = oriented.select(col("s").as("v"), col("t").as("w"))
    val tris = wedges.join(closing, Seq("v", "w"), "left_semi")
      .select(col("s"), col("v"), col("w"))
    tris.select(explode(array(col("s"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
      .orderBy(col("node"))
  }

  /** Local clustering coefficient per node: `2·T / (d·(d−1))` — how
    * close a node's neighborhood is to a clique, on the same triangle
    * machinery. Returns (node, degree long, triangles long, coeff
    * double round(6)) for every node of the (symmetrized, deduplicated)
    * graph; degree-1 nodes report 0 triangles and coeff 0 (no possible
    * wedge — reported, not dropped, because "no clustering" is signal).
    * Exact integers everywhere, one double division. */
  def clusteringCoefficients(edges: DataFrame, srcCol: String,
                             dstCol: String): DataFrame = {
    val canon = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    val deg = canon.select(col("a").as("node"))
      .union(canon.select(col("b")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    deg.join(triangleCounts(edges, srcCol, dstCol), Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("coeff",
        when(col("degree") >= 2L,
          round(lit(2.0) * col("triangles").cast("double") /
            (col("degree").cast("double") *
              (col("degree") - 1L).cast("double")), 6) + lit(0.0))
          .otherwise(lit(0.0)))
      .orderBy(col("node"))
  }

  /** k-core decomposition (Seidman, Social Networks 1983): the maximal
    * subgraph in which every node has degree ≥ k, found by iterative
    * peeling — drop all nodes of degree < k, recompute degrees on the
    * survivors, repeat to fixpoint. On a near-duplicate / fuzzy-match
    * graph the k-core separates dense template families (which survive)
    * from bridge chains and stray pairs (which peel away) — a sharper
    * cluster-quality cut than a raw degree threshold, because peeling
    * cascades: a node held up only by already-peeled neighbors goes too.
    *
    * Returns (node, degree long) for the members of the k-core with
    * their WITHIN-CORE degree, ordered by node. Exact and engine-
    * replayable: peeling is deterministic (no tie-breaks — all sub-k
    * nodes drop together each round).
    *
    * Scale shape: per round, two semi-joins of the symmetrized edge list
    * against the (shrinking) survivor frame + one map-combinable count —
    * all keyed equi-joins, nothing collected but the per-round survivor
    * count (one long). Each round's frame is persisted and the previous
    * released, so lineage stays flat for any round count; rounds are
    * bounded by `maxRounds` (the peel cascade on real match graphs
    * settles in a handful — the caller gets a hard error, not a silent
    * partial core, if the bound is hit). */
  def kCoreNodes(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
                 maxRounds: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    import org.apache.spark.storage.StorageLevel
    val canon = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    val adj = canon.select(col("a").as("u"), col("b").as("v"))
      .union(canon.select(col("b"), col("a")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // round 0: plain degrees — the first peel needs no restriction
    var live = adj.groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("degree"))
      .filter(col("degree") >= k.toLong)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var n = live.count()
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds && n > 0) {
      val deg = adj
        .join(live.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(live.select(col("node").as("v")), Seq("v"), "left_semi")
        .groupBy(col("u").as("node")).agg(count(lit(1)).as("degree"))
      val next = deg.filter(col("degree") >= k.toLong)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val m = next.count()
      converged = m == n
      // keep the recomputed frame even on convergence: its degrees are
      // the within-core degrees (round 0's were whole-graph degrees)
      live.unpersist()
      live = next
      n = m
      rounds += 1
    }
    require(converged || n == 0,
      s"k-core peeling did not settle within $maxRounds rounds")
    adj.unpersist()
    live.orderBy(col("node"))
  }

  /** Community detection by SYNCHRONOUS label propagation (Raghavan,
    * Albert & Kumara, Phys. Rev. E 2007) with a deterministic tie-break:
    * every node starts labeled with its own id; each round, every node
    * simultaneously adopts the label that is most frequent among its
    * neighbors, ties broken by the SMALLEST label. Synchronous updates +
    * total-order tie-break make the run bit-reproducible in any engine
    * and at any partitioning — the paper's asynchronous random-order
    * variant converges faster but is non-deterministic, which would
    * break replay; a fixed `rounds` bound (labels in a clique-ish
    * community settle in 2-3 rounds) replaces its stopping rule.
    * On a near-duplicate graph the stable labels name template families
    * without the full connected-components fixpoint machinery, and
    * unlike CC they DON'T leak across a single weak bridge edge — the
    * bridge endpoint keeps its denser side's majority label.
    *
    * Edges are symmetrized/deduplicated, self-loops dropped; nodes are
    * endpoints of ≥ 1 edge (isolated nodes have no neighbors to vote).
    * Labels must be orderable numerics (node ids). Returns
    * (node, community) ordered by node.
    *
    * Scale shape: per round, one keyed equi-join of the symmetrized edge
    * list against the (node, label) frame, a map-combinable
    * (node, label) count, then an argmax-by-struct aggregate — two
    * shuffles on node, NO window sort and NO driver collect; frames are
    * persisted per round and the previous released, so lineage stays
    * flat for any round count. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    import org.apache.spark.storage.StorageLevel
    val canon = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    val adj = canon.select(col("a").as("u"), col("b").as("v"))
      .union(canon.select(col("b"), col("a")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var lab = adj.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").cast("long").as("lab"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to rounds) {
      val votes = adj.join(lab, col("v") === col("node"))
        .groupBy(col("u"), col("lab")).agg(count(lit(1)).as("c"))
      // argmax c, then MIN label: max of (c, -lab) picks the largest
      // count and among those the smallest label, in one aggregate
      val next = votes
        .groupBy(col("u").as("node"))
        .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("lab"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before releasing the previous frame
      lab.unpersist()
      lab = next
    }
    adj.unpersist()
    lab.select(col("node"), col("lab").as("community")).orderBy(col("node"))
  }

  /** Adamic–Adar link prediction (Adamic & Adar 2003, "Friends and
    * neighbors on the Web"): score every NON-adjacent pair that shares
    * at least one neighbor by `Σ_z 1/ln(deg z)` over common neighbors z
    * — rare shared neighbors say more than hubs. On a near-dup /
    * entity-match graph this surfaces the pairs the matcher MISSED:
    * two records that share most of a template family but never blocked
    * together.
    *
    * Determinism device: each z's weight quantizes ONCE to micro-units
    * (`floor(1e6 / ln(deg))` — one double ln + divide + floor, the same
    * IEEE sequence per distinct degree in any engine), and pair scores
    * are exact integer SUMS of those micro-weights — order-free, so the
    * (aa_micro desc, node_a, node_b) top-k cut is total-ordered and
    * SQL-replayable. Returns top-`topK` rows (node_a < node_b,
    * common_neighbors long, aa_micro long, score double = aa_micro/1e6
    * exact).
    *
    * Scale shape: edges symmetrize/dedup once and persist; degrees are
    * one map-combinable count. The wedge join (by(z): pairs of z's
    * neighbors) is the [[triangleCounts]] shape — its fan-out is
    * Σ_z deg(z)², which ONE celebrity hub turns into a join bomb, so
    * intermediaries above `maxHubDegree` are EXCLUDED by construction
    * (the [[graft.operators.Dedup.medoidPerCluster]] lesson: guard the
    * quadratic key, don't assume). That is also statistically sound:
    * a 10⁶-degree hub contributes 1/ln(10⁶) ≈ 0.07 to every one of
    * 10¹² pairs — pure noise mass. The existing-edge exclusion is a
    * keyed anti-join AFTER aggregation (candidate-pair-sized, never
    * wedge-sized), and the cut is TakeOrdered, not a global sort. */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
                 topK: Int, maxHubDegree: Int = 10000): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(maxHubDegree >= 2, s"maxHubDegree must be >= 2, got $maxHubDegree")
    val canon = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
      .localCheckpoint() // edges may arrive as an expensive lazy build
    val adj = canon.select(col("a").as("z"), col("b").as("nb"))
      .union(canon.select(col("b"), col("a")))
    val weighted = adj.join(
      adj.groupBy(col("z")).agg(count(lit(1)).as("__deg"))
        // deg >= 2 guards the ln(1)=0 division (a deg-1 z forms no
        // wedge anyway); the upper bound is the join-bomb guard
        .filter(col("__deg") >= 2 && col("__deg") <= maxHubDegree)
        .select(col("z"),
          floor(lit(1e6) / log(col("__deg").cast("double")))
            .cast("long").as("__w")),
      Seq("z"))
    val pairs = weighted.select(col("z"), col("nb").as("u"), col("__w"))
      .join(weighted.select(col("z"), col("nb").as("v")), Seq("z"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(col("__w")).as("aa_micro"))
    pairs
      .join(canon.select(col("a").as("u"), col("b").as("v")),
        Seq("u", "v"), "left_anti")
      .orderBy(col("aa_micro").desc, col("u"), col("v"))
      .limit(topK)
      .select(col("u").as("node_a"), col("v").as("node_b"),
        col("common_neighbors"), col("aa_micro"),
        (col("aa_micro").cast("double") / lit(1e6)).as("score"))
  }

  /** Degree assortativity (Newman, PRL 2002 "Assortative mixing in
    * networks"): the Pearson correlation of REMAINING degrees (deg−1)
    * across edge endpoints — do hubs link to hubs (r > 0, social
    * graphs) or to leaves (r < 0, webby/biological graphs)? On a
    * near-dup graph, strong disassortativity means template families
    * with satellite variants; assortativity means mirrored clusters —
    * different dedup strategies.
    *
    * Exactness: over the SYMMETRIZED directed edge list (M = 2m rows,
    * each canonical edge contributing (j,k) and (k,j)), Pearson
    * collapses to ONE exact rational — `r = (M·Σjk − (Σj)²) /
    * (M·Σj² − (Σj)²)` — computed in DECIMAL(38,0) and floored once to
    * micro units (signed pmod floordiv). A degree-regular graph has a
    * zero denominator: r is undefined and reported NULL, stated
    * plainly rather than coerced.
    *
    * Scale shape: one degree count + one keyed join of degrees onto
    * edges + one 1-row aggregate; nothing quadratic anywhere. */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
                          dstCol: String): DataFrame = {
    val canon = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    val adj = canon.select(col("a").as("u"), col("b").as("v"))
      .union(canon.select(col("b"), col("a")))
    val deg = adj.groupBy(col("u")).agg(count(lit(1)).as("__d"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    adj
      .join(deg.select(col("u"), (col("__d") - 1).as("__j")), Seq("u"))
      .join(deg.select(col("u").as("v"), (col("__d") - 1).as("__k")),
        Seq("v"))
      .agg(count(lit(1)).as("__M"),
        sum(dec(col("__j")) * dec(col("__k"))).as("__sjk"),
        sum(dec(col("__j"))).as("__sj"),
        sum(dec(col("__j")) * dec(col("__j"))).as("__sjj"))
      .select((col("__M") / 2).cast("long").as("m_edges"),
        {
          val num = dec(lit(1000000L)) *
            (dec(col("__M")) * col("__sjk") - col("__sj") * col("__sj"))
          val den = dec(col("__M")) * col("__sjj") -
            col("__sj") * col("__sj")
          when(den =!= 0,
            ((num - pmod(num, den)) / den).cast("long"))
            .otherwise(lit(null).cast("long")).as("r_micro")
        })
      .withColumn("r", col("r_micro").cast("double") / lit(1e6))
  }

  /** Newman modularity of a node partition (Newman & Girvan 2004,
    * PRE 69 "Finding and evaluating community structure in networks"):
    * `Q = Σ_c [e_c/m − (d_c/2m)²]` — how much denser the communities
    * are than a degree-preserving random rewiring. THE number that
    * turns [[labelPropagation]]'s labels from "an assignment" into "a
    * good/bad assignment" (Q ≈ 0: no structure; 0.3+: real communities)
    * — the acceptance gate before a dedup pipeline trusts cluster
    * representatives.
    *
    * Exactness: with integer `m` (canonical undirected edges), `e_c`
    * (intra-community edges) and `d_c` (community degree sums), Q is
    * ONE exact rational — `Q_micro = floordiv(1e6·(4m·Σe_c − Σd_c²),
    * 4m²)` in DECIMAL(38,0) (signed floordiv via pmod; Σd_c² ≤ 4m²
    * keeps 1e6·4m² well inside 38 digits to m ≈ 10¹⁴ edges).
    *
    * Scale shape: symmetrize/dedup once, two keyed label joins onto
    * the edge list, two map-combinable grouped sums, one 1-row
    * aggregate × 1-row m broadcast. Nodes missing from `labels` drop
    * with their edges (stated: Q is OF the labeled subgraph). */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
                 labels: DataFrame, nodeCol: String,
                 labelCol: String): DataFrame = {
    val canon = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
      .localCheckpoint()
    val lab = labels.select(col(nodeCol).as("node"),
      col(labelCol).as("__lab"))
    val labeled = canon
      .join(lab.select(col("node").as("a"), col("__lab").as("__la")),
        Seq("a"))
      .join(lab.select(col("node").as("b"), col("__lab").as("__lb")),
        Seq("b"))
    val mFrame = labeled.agg(count(lit(1)).as("__m"))
    val eC = labeled.filter(col("__la") === col("__lb"))
      .groupBy(col("__la").as("__lab"))
      .agg(count(lit(1)).as("__ec"))
    val dC = labeled.select(col("__la").as("__lab"))
      .union(labeled.select(col("__lb")))
      .groupBy(col("__lab")).agg(count(lit(1)).as("__dc"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val per = dC.join(eC, Seq("__lab"), "left")
      .select(col("__lab"), coalesce(col("__ec"), lit(0L)).as("__ec"),
        col("__dc"))
    per.agg(count(lit(1)).as("n_communities"),
        sum(col("__ec")).as("__se"),
        sum(dec(col("__dc")) * dec(col("__dc"))).as("__sd2"))
      .crossJoin(broadcast(mFrame))
      .select(col("n_communities"), col("__m").as("m_edges"),
        col("__se").as("intra_edges"),
        {
          val m = dec(col("__m"))
          val denom = dec(lit(4L)) * m * m
          val num = dec(lit(1000000L)) *
            (dec(lit(4L)) * m * dec(col("__se")) - dec(col("__sd2")))
          ((num - pmod(num, denom)) / denom).cast("long").as("q_micro")
        })
      .withColumn("q", col("q_micro").cast("double") / lit(1e6))
  }

  /** Sampled bounded-distance betweenness centrality (Brandes, J. Math.
    * Sociology 2001 "A faster algorithm for betweenness centrality",
    * restricted to the sampled-source / k-bounded estimator of Brandes
    * & Pich 2007): how much shortest-path traffic flows THROUGH each
    * node — the broker/bridge detector on an entity-match or citation
    * graph, where harmonic centrality ranks "close to everything" and
    * betweenness ranks "on the way between everything".
    *
    * Per source: a forward per-source BFS that carries σ (shortest-path
    * COUNTS — layer h's σ_v = Σ σ_u over dist-(h−1) predecessors), then
    * Brandes' backward dependency accumulation over the implicit DAG
    * (an edge u→v is a DAG edge iff dist v = dist u + 1, recovered by
    * joining adjacent layers — predecessor lists are never stored).
    *
    * Determinism device: the backward recurrence δ_v = Σ_w σ_v·(1 +
    * δ_w)/σ_w floors EVERY per-edge term to micro units —
    * `floordiv(σ_v·(1e6 + δ_w), σ_w)` — so layer sums are order-free
    * integer SUMS and the whole accumulation replays digit-for-digit in
    * SQL. The micro floor truncates ≤ 1e-6 per DAG edge (one-sided,
    * documented estimator bias); σ·(1e6+δ) must fit a long — hop-bounded
    * path counts keep that true everywhere a 3–4 hop sample is sane.
    *
    * Returns (node, bc_micro long) for every node reached at dist ≥ 1
    * from some source (sources score 0 for their own BFS by
    * construction — Brandes' s ≠ v ≠ t). Scale shape: maxHops forward +
    * maxHops−1 backward rounds, each ONE keyed equi-join + grouped sum
    * on (source, node) frames bounded by the sampled neighborhoods;
    * per-round state localCheckpoints (the bfsDistancesPerSource
    * lineage discipline); nothing collects. */
  def betweennessCentrality(edges: DataFrame, srcCol: String,
                            dstCol: String, sources: DataFrame,
                            sourceCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 2 && maxHops <= 8,
      s"maxHops must be in [2,8], got $maxHops")
    import org.apache.spark.storage.StorageLevel
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    // ---- forward: per-source layers with shortest-path counts σ ----
    var layers = Vector(
      sources.select(col(sourceCol).as("source")).distinct()
        .select(col("source"), col("source").as("node"),
          lit(1L).as("sigma"))
        .localCheckpoint())
    var reached = layers(0).select(col("source"), col("node"))
      .localCheckpoint()
    var h = 1
    var done = false
    while (h <= maxHops && !done) {
      val fresh = e.join(layers(h - 1),
          col("__s") === col("node"))
        .select(col("source"), col("__d").as("node"), col("sigma"))
        .join(reached, Seq("source", "node"), "left_anti")
        .groupBy(col("source"), col("node"))
        .agg(sum(col("sigma")).as("sigma"))
        .localCheckpoint()
      if (fresh.isEmpty) done = true
      else {
        reached = reached
          .unionByName(fresh.select(col("source"), col("node")))
          .localCheckpoint()
        layers = layers :+ fresh
        h += 1
      }
    }
    // ---- backward: dependency accumulation, deepest layer first ----
    val maxL = layers.length - 1
    if (maxL == 0) {
      e.unpersist()
      return layers(0).filter(lit(false))
        .select(col("node"), lit(0L).as("bc_micro"))
    }
    var down = layers(maxL).withColumn("delta", lit(0L))
    var parts = Vector(down.select(col("source"), col("node"),
      col("delta")))
    var i = maxL - 1
    while (i >= 1) {
      val succ = down.select(col("source").as("__wsrc"),
        col("node").as("__w"), col("sigma").as("__ws"),
        col("delta").as("__wd"))
      val contrib = layers(i)
        .join(e, col("__s") === col("node"))
        .join(succ, col("source") === col("__wsrc") &&
          col("__d") === col("__w"))
        .select(col("source"), col("node"), {
          val p = col("sigma") * (lit(1000000L) + col("__wd"))
          (((p - pmod(p, col("__ws"))) / col("__ws")).cast("long"))
            .as("__t")
        })
        .groupBy(col("source"), col("node"))
        .agg(sum(col("__t")).as("delta"))
      down = layers(i)
        .join(contrib, Seq("source", "node"), "left")
        .select(col("source"), col("node"), col("sigma"),
          coalesce(col("delta"), lit(0L)).as("delta"))
        .localCheckpoint()
      parts = parts :+ down.select(col("source"), col("node"),
        col("delta"))
      i -= 1
    }
    e.unpersist()
    parts.reduce(_ unionByName _)
      .groupBy(col("node"))
      .agg(sum(col("delta")).as("bc_micro"))
  }

  /** Neighbor-Jaccard link prediction (Liben-Nowell & Kleinberg, CIKM
    * 2003 "The link prediction problem for social networks"): score
    * every NON-adjacent pair sharing at least one neighbor by
    * `|N(u)∩N(v)| / |N(u)∪N(v)|` — the size-normalized sibling of
    * [[adamicAdar]] (AA rewards RARE shared neighbors; Jaccard rewards
    * pairs whose neighborhoods mostly COINCIDE, so a 3-neighbor node
    * matching all 3 beats a 100-neighbor node matching 5).
    *
    * Exactness device: the score is a single integer floor division —
    * `jac_micro = floor(1e6·common / (deg u + deg v − common))` — over
    * exact counts, so the (jac_micro desc, node_a, node_b) top-k cut is
    * total-ordered and replayable digit-for-digit in any engine.
    *
    * Scale shape: identical to [[adamicAdar]] — the wedge join's
    * fan-out is Σ_z deg(z)², so intermediaries above `maxHubDegree`
    * are excluded by construction (common counts are "common non-hub
    * neighbors"; the DENOMINATOR keeps full degrees, making hub-heavy
    * pairs score conservatively low rather than blowing up the join).
    * Degrees are one map-combinable count broadcast-joined onto the
    * candidate pairs; the existing-edge exclusion is a keyed anti-join
    * AFTER aggregation; the cut is TakeOrdered. */
  def neighborJaccard(edges: DataFrame, srcCol: String, dstCol: String,
                      topK: Int, maxHubDegree: Int = 10000): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(maxHubDegree >= 2, s"maxHubDegree must be >= 2, got $maxHubDegree")
    val canon = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
      .localCheckpoint() // edges may arrive as an expensive lazy build
    val adj = canon.select(col("a").as("z"), col("b").as("nb"))
      .union(canon.select(col("b"), col("a")))
    val deg = adj.groupBy(col("z")).agg(count(lit(1)).as("__deg"))
    // wedge enumeration through non-hub intermediaries only (deg >= 2:
    // a deg-1 z forms no wedge; the upper bound is the join-bomb guard)
    val mid = adj.join(deg.filter(col("__deg") >= 2 &&
        col("__deg") <= maxHubDegree).select(col("z")), Seq("z"))
    val pairs = mid.select(col("z"), col("nb").as("u"))
      .join(mid.select(col("z"), col("nb").as("v")), Seq("z"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common_neighbors"))
    pairs
      .join(canon.select(col("a").as("u"), col("b").as("v")),
        Seq("u", "v"), "left_anti")
      .join(deg.select(col("z").as("u"), col("__deg").as("__du")), Seq("u"))
      .join(deg.select(col("z").as("v"), col("__deg").as("__dv")), Seq("v"))
      .select(col("u"), col("v"), col("common_neighbors"),
        floor(lit(1000000L) * col("common_neighbors") /
          (col("__du") + col("__dv") - col("common_neighbors")))
          .cast("long").as("jac_micro"))
      .orderBy(col("jac_micro").desc, col("u"), col("v"))
      .limit(topK)
      .select(col("u").as("node_a"), col("v").as("node_b"),
        col("common_neighbors"), col("jac_micro"),
        (col("jac_micro").cast("double") / lit(1e6)).as("score"))
  }
}
