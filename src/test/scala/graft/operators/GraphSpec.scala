package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed path graph a-b-c, one iteration, exact integers") {
    // base = 1e12/3 = 333333333333, b15 = (15*base)/100 = 49999999999
    // a: in from b = base/2 -> 49999999999 + (85*166666666666)/100
    // b: in from a + c = 2*base -> 49999999999 + (85*666666666666)/100
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("s", "d")
    val out = Graph.pageRankIntegers(edges, "s", "d", iterations = 1)
      .as[(String, Long)].collect().toMap
    assert(out == Map(
      "a" -> 191666666665L, "b" -> 616666666665L, "c" -> 191666666665L))
  }

  test("symmetric endpoints stay equal over iterations; ranks are partitioning-invariant") {
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")).toDF("s", "d")
    val r3 = Graph.pageRankIntegers(edges, "s", "d", 3)
      .as[(String, Long)].collect().toMap
    assert(r3("a") == r3("c") && r3("b") > r3("a"))
    val r3b = Graph.pageRankIntegers(edges.repartition(5), "s", "d", 3)
      .as[(String, Long)].collect().toMap
    assert(r3b == r3)
  }

  test("dangling node leaks mass instead of poisoning ranks; duplicate edges dedup") {
    // directed a->b only (b dangling): pr1(a) = b15 = 75e9,
    // pr1(b) = 75e9 + (85 * 5e11)/100 = 5e11; total < 1e12 (the leak)
    val edges = Seq(("a", "b"), ("a", "b")).toDF("s", "d")
    val out = Graph.pageRankIntegers(edges, "s", "d", 1)
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 75000000000L, "b" -> 500000000000L))
    assert(out.values.sum < 1000000000000L)
  }

  test("triangleCounts: triangle + pendant; K4; duplicate/reversed edges collapse") {
    // triangle 1-2-3 with pendant 4 hanging off 3
    val t = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (2L, 1L), (1L, 2L))
      .toDF("x", "y")
    val out = Graph.triangleCounts(t, "x", "y")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L)) // 4 in no triangle
    // K4: every node sits in C(3,2) = 3 triangles
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b))
      .toDF("x", "y")
    val ok4 = Graph.triangleCounts(k4, "x", "y")
      .as[(Long, Long)].collect().toMap
    assert(ok4 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // self-loops ignored
    val loops = Seq((1L, 1L), (1L, 2L)).toDF("x", "y")
    assert(Graph.triangleCounts(loops, "x", "y").count() == 0)
  }

  test("clusteringCoefficients: triangle+pendant hand values; degree-1 reports 0") {
    val t = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("x", "y")
    val out = Graph.clusteringCoefficients(t, "x", "y")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // nodes 1,2: degree 2, 1 triangle -> coeff 1; node 3: degree 3,
    // 1 triangle -> 2/(3*2) = 0.333333; pendant 4: degree 1 -> 0
    assert(out == Seq(
      (1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0),
      (3L, 3L, 1L, 0.333333), (4L, 1L, 0L, 0.0)))
  }

  test("kCoreNodes: peel cascade drops chains; within-core degrees; k=1 keeps all") {
    // triangle 1-2-3 with chain 3-4-5: the 2-core is the triangle, and
    // the cascade matters — 5 peels in round 0, which strands 4
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("x", "y")
    val core2 = Graph.kCoreNodes(g, "x", "y", k = 2)
      .as[(Long, Long)].collect().toSeq
    assert(core2 == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // k=3 on the same graph: empty core (triangle degrees are 2)
    assert(Graph.kCoreNodes(g, "x", "y", k = 3).count() == 0)
    // K4 + pendant: the 3-core is K4 with degree 3 each
    val k4 = ((for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)) :+
      ((4L, 9L))).toDF("x", "y")
    val core3 = Graph.kCoreNodes(k4, "x", "y", k = 3)
      .as[(Long, Long)].collect().toSeq
    assert(core3 == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    // k=1 keeps every non-isolated node with its full degree
    val core1 = Graph.kCoreNodes(g, "x", "y", k = 1)
      .as[(Long, Long)].collect().toMap
    assert(core1 == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 1L))
    // duplicate/reversed edges and self-loops collapse before peeling
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L)).toDF("x", "y")
    assert(Graph.kCoreNodes(messy, "x", "y", k = 1)
      .as[(Long, Long)].collect().toSeq == Seq((1L, 1L), (2L, 1L)))
  }

  test("labelPropagation: two cliques joined by one bridge keep distinct " +
       "communities; tie-break is the smallest label; synchronous rounds " +
       "replay by hand") {
    // K4 {1..4} — bridge 4-10 — K4 {10..13}: LPA must NOT merge across
    // the bridge (unlike connected components)
    def k4(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val g = (k4(Seq(1L, 2L, 3L, 4L)) ++ k4(Seq(10L, 11L, 12L, 13L)) :+
      ((4L, 10L))).toDF("x", "y")
    val out = Graph.labelPropagation(g, "x", "y", rounds = 3)
      .as[(Long, Long)].collect().toMap
    // round 1: every clique node sees all-distinct neighbor labels ->
    // min neighbor label wins: {1,2,3}->min other = 1 or 2; replay:
    // node 1 nbrs {2,3,4} -> 2; nodes 2,3,4 see 1 -> 1; 4 also sees 10.
    // By round 3 the left clique is all-1, right clique all-10, and the
    // bridge endpoints keep their own side's majority label
    assert(Seq(1L, 2L, 3L, 4L).map(out).toSet == Set(1L))
    assert(Seq(10L, 11L, 12L, 13L).map(out).toSet == Set(10L))
    // a triangle alone settles to its min id in 2 rounds
    val tri = Seq((7L, 8L), (8L, 9L), (9L, 7L)).toDF("x", "y")
    val t = Graph.labelPropagation(tri, "x", "y", rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(t == Map(7L -> 7L, 8L -> 7L, 9L -> 7L))
    // determinism: same input, same output across runs
    val again = Graph.labelPropagation(g, "x", "y", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(again == out)
  }

  test("adamicAdar: star wedges score floor(1e6/ln deg), adjacent pairs " +
       "are excluded, hub guard silences the star center, duplicates " +
       "and reversed edges collapse") {
    // star 1-{2,3,4} plus edge 2-3; duplicate + reversed noise rows
    val g = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (3L, 2L), (1L, 2L)).toDF("x", "y")
    val out = Graph.adamicAdar(g, "x", "y", topK = 10)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // deg(1)=3, deg(2)=deg(3)=2, deg(4)=1. Wedges through z=1 give
    // (2,3),(2,4),(3,4); through z=2/z=3 give (1,3)/(1,2) — all
    // adjacent except (2,4) and (3,4), each scoring floor(1e6/ln 3)
    val w3 = math.floor(1e6 / math.log(3.0)).toLong
    assert(out == Seq(
      (2L, 4L, 1L, w3, w3 / 1e6),
      (3L, 4L, 1L, w3, w3 / 1e6)))
    // hub guard: maxHubDegree=2 removes z=1, the only wedge center
    assert(Graph.adamicAdar(g, "x", "y", topK = 10, maxHubDegree = 2)
      .collect().isEmpty)
    // two wedge centers accumulate: square 1-2-3-4-1 predicts both
    // diagonals with TWO common neighbors each
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("x", "y")
    val w2 = math.floor(1e6 / math.log(2.0)).toLong
    val d = Graph.adamicAdar(sq, "x", "y", topK = 10)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(d == Seq(
      (1L, 3L, 2L, 2 * w2, 2 * w2 / 1e6),
      (2L, 4L, 2L, 2 * w2, 2 * w2 / 1e6)))
    // the topK cut is total-ordered: topK=1 keeps (1,3)
    assert(Graph.adamicAdar(sq, "x", "y", topK = 1)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq ==
      Seq((1L, 3L, 2L, 2 * w2, 2 * w2 / 1e6)))
  }

  test("degreeAssortativity: star is perfectly disassortative (-1), " +
       "the 4-path lands on the textbook -1/2, regular graphs are NULL") {
    def r(pairs: Seq[(Long, Long)]) =
      Graph.degreeAssortativity(pairs.toDF("x", "y"), "x", "y")
        .as[(Long, Option[Long], Option[Double])].collect().head
    assert(r(Seq((1L, 2L), (1L, 3L), (1L, 4L))) ==
      ((3L, Some(-1000000L), Some(-1.0))))
    assert(r(Seq((1L, 2L), (2L, 3L), (3L, 4L))) ==
      ((3L, Some(-500000L), Some(-0.5))))
    // triangle: all remaining degrees equal -> undefined, NULL
    assert(r(Seq((1L, 2L), (2L, 3L), (1L, 3L))) == ((3L, None, None)))
  }

  test("modularity: two bridged triangles split 5/14 exactly, the " +
       "trivial one-community partition scores 0, singletons go " +
       "negative with a true floor") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("x", "y")
    def part(f: Long => Long) =
      (1L to 6L).map(n => (n, f(n))).toDF("node", "community")
    def q(labels: org.apache.spark.sql.DataFrame) =
      Graph.modularity(g, "x", "y", labels, "node", "community")
        .as[(Long, Long, Long, Long, Double)].collect().head
    // triangles as communities: Q = 2*(3/7 - 1/4) = 5/14
    val good = q(part(n => if (n <= 3) 1L else 2L))
    assert(good == ((2L, 7L, 6L, 357142L, 0.357142)))
    // everything in one community: Q = 1 - 1 = 0
    assert(q(part(_ => 1L)) == ((1L, 7L, 7L, 0L, 0.0)))
    // all singletons: num = -34e6, den = 196 -> floor is -173470,
    // NOT the truncation -173469 (the signed-floordiv device)
    val single = q(part(identity))
    assert(single._1 == 6L && single._4 == -173470L)
  }

  test("betweennessCentrality: path puts all traffic on the middle, " +
       "star on the center; split shortest paths halve σ-weights; " +
       "partitioning-invariant") {
    def sym(pairs: Seq[(Long, Long)]) =
      (pairs ++ pairs.map(_.swap)).toDF("s", "d")
    def all(edges: org.apache.spark.sql.DataFrame) =
      edges.select($"s".as("node")).distinct()
    // path a(1)-b(2)-c(3), all sources: only b carries traffic (a->c)
    val path = sym(Seq((1L, 2L), (2L, 3L)))
    val bc = Graph.betweennessCentrality(path, "s", "d", all(path),
      "node", maxHops = 3).as[(Long, Long)].collect().toMap
    assert(bc == Map(1L -> 0L, 2L -> 2000000L, 3L -> 0L))
    // star 1-{2,3,4}: center carries one unit per ordered leaf pair
    val star = sym(Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    val sc = Graph.betweennessCentrality(star, "s", "d", all(star),
      "node", maxHops = 3).as[(Long, Long)].collect().toMap
    assert(sc == Map(1L -> 6000000L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
    // square 1-2-4-3-1: two shortest 1~4 paths split σ, each inner
    // node gets 1/2 from each far endpoint -> 1e6 everywhere
    val sq = sym(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)))
    val qc = Graph.betweennessCentrality(sq, "s", "d", all(sq),
      "node", maxHops = 3).as[(Long, Long)].collect().toMap
    assert(qc == Map(1L -> 1000000L, 2L -> 1000000L,
      3L -> 1000000L, 4L -> 1000000L))
    val rep = Graph.betweennessCentrality(sq.repartition(7), "s", "d",
      all(sq), "node", maxHops = 3).as[(Long, Long)].collect().toMap
    assert(rep == qc)
    // hop truncation: maxHops=2 on the path sees no a->c pair... the
    // pair IS at dist 2; cut to sources {a} only and maxHops=2 keeps
    // b's half of the traffic from a alone
    val one = Seq(1L).toDF("node")
    val t = Graph.betweennessCentrality(path, "s", "d", one, "node",
      maxHops = 2).as[(Long, Long)].collect().toMap
    assert(t == Map(2L -> 1000000L, 3L -> 0L))
  }

  test("neighborJaccard: star wedges score common/union in micro units, " +
       "adjacent pairs are excluded, hub guard silences the star center, " +
       "full degrees stay in the denominator") {
    // star 1-{2,3,4} plus edge 2-3 (the adamicAdar fixture):
    // deg(1)=3, deg(2)=deg(3)=2, deg(4)=1
    val g = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (3L, 2L), (1L, 2L)).toDF("x", "y")
    val out = Graph.neighborJaccard(g, "x", "y", topK = 10)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // non-adjacent with a shared neighbor: (2,4) and (3,4), both via
    // z=1 only -> J = 1/(2+1-1) = 1/2
    assert(out == Seq(
      (2L, 4L, 1L, 500000L, 0.5),
      (3L, 4L, 1L, 500000L, 0.5)))
    // hub guard: maxHubDegree=2 removes z=1, the only wedge center
    assert(Graph.neighborJaccard(g, "x", "y", topK = 10, maxHubDegree = 2)
      .collect().isEmpty)
    // square 1-2-3-4-1: each diagonal's neighborhoods coincide -> J=1
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("x", "y")
    val d = Graph.neighborJaccard(sq, "x", "y", topK = 10)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(d == Seq(
      (1L, 3L, 2L, 1000000L, 1.0),
      (2L, 4L, 2L, 1000000L, 1.0)))
    // the topK cut is total-ordered: topK=1 keeps (1,3)
    assert(Graph.neighborJaccard(sq, "x", "y", topK = 1)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq ==
      Seq((1L, 3L, 2L, 1000000L, 1.0)))
  }

  test("personalizedPageRank: hand-computed path with one seed; exact integers") {
    // undirected path a-b-c, seed {a}: base = 1e12, b15 = 15e10.
    // p0 = (1e12, 0, 0); deg = (1, 2, 1)
    // p1: a = b15 + 85*(0//2)//100        = 150000000000
    //     b = 0   + 85*(1e12//1)//100     = 850000000000
    //     c = 0
    // p2: a = b15 + 85*(850e9//2)//100    = 511250000000
    //     b = 0   + 85*(150e9//1)//100    = 127500000000
    //     c = 0   + 85*(850e9//2)//100    = 361250000000
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("s", "d")
    val seeds = Seq("a").toDF("node")
    val out = Graph.personalizedPageRank(edges, "s", "d", seeds, "node", 2)
      .as[(String, Long)].collect().toMap
    assert(out == Map(
      "a" -> 511250000000L, "b" -> 127500000000L, "c" -> 361250000000L))
  }

  test("personalizedPageRank: all-seeds degenerates to uniform PageRank; " +
      "partitioning-invariant; isolated seed keeps teleport mass only") {
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
      ("c", "a"), ("a", "c")).toDF("s", "d")
    val allSeeds = Seq("a", "b", "c").toDF("node")
    val ppr = Graph.personalizedPageRank(edges, "s", "d", allSeeds, "node", 3)
      .as[(String, Long)].collect().toMap
    val pr = Graph.pageRankIntegers(edges, "s", "d", 3)
      .as[(String, Long)].collect().toMap
    assert(ppr == pr, "all-node seed set must equal the uniform variant")
    val rep = Graph.personalizedPageRank(
        edges.repartition(7), "s", "d", allSeeds, "node", 3)
      .as[(String, Long)].collect().toMap
    assert(rep == ppr)
    // a seed with no edges teleports but never receives inflow:
    // pr = b15 = (15 * (1e12/2)) / 100 every iteration
    val iso = Graph.personalizedPageRank(edges, "s", "d",
        Seq("a", "z").toDF("node"), "node", 3)
      .as[(String, Long)].collect().toMap
    assert(iso("z") == 75000000000L)
    assert(iso.contains("a") && iso("a") > iso("z"))
  }

  test("harmonicCentrality: hand path graph; per-source distances, not " +
      "the min fold; disconnected pairs contribute nothing") {
    // undirected path a-b-c-d plus isolated z; sources {a, d, z}.
    // Distances TO b: a→1, d→2 ⇒ H(b) = 1e6 + 5e5; TO c symmetric;
    // a: d→3 ⇒ 333333; d: a→3; z reaches nobody, nobody reaches z.
    val und = Seq(("a", "b"), ("b", "c"), ("c", "d"))
    val edges = (und ++ und.map(_.swap)).toDF("s", "d")
    val out = Graph.harmonicCentrality(edges, "s", "d",
        Seq("a", "d", "z").toDF("node"), "node", maxHops = 5)
      .as[(String, Long, Long)].collect()
      .map { case (n, r, h) => n -> ((r, h)) }.toMap
    assert(out == Map(
      "a" -> ((1L, 333333L)), "b" -> ((2L, 1500000L)),
      "c" -> ((2L, 1500000L)), "d" -> ((1L, 333333L))))
    // maxHops=1 keeps only direct neighbors
    val capped = Graph.harmonicCentrality(edges, "s", "d",
        Seq("a", "d").toDF("node"), "node", maxHops = 1)
      .as[(String, Long, Long)].collect()
      .map { case (n, r, h) => n -> ((r, h)) }.toMap
    assert(capped == Map("b" -> ((1L, 1000000L)), "c" -> ((1L, 1000000L))))
  }

  test("bfsDistances: min hops from any source; maxHops caps reach; " +
      "early-stop on an exhausted frontier; isolated seed reports 0") {
    // path a-b-c-d-e (undirected) plus isolated z; sources {a, z}
    val und = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    val edges = (und ++ und.map(_.swap)).toDF("s", "d")
    val out = Graph.bfsDistances(edges, "s", "d",
        Seq("a", "z").toDF("node"), "node", maxHops = 10)
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 0L, "z" -> 0L, "b" -> 1L, "c" -> 2L,
      "d" -> 3L, "e" -> 4L))
    // two sources: distances are the MIN over sources
    val two = Graph.bfsDistances(edges, "s", "d",
        Seq("a", "e").toDF("node"), "node", maxHops = 10)
      .as[(String, Long)].collect().toMap
    assert(two == Map("a" -> 0L, "e" -> 0L, "b" -> 1L, "d" -> 1L,
      "c" -> 2L))
    // maxHops caps the reach: d and e unreported at 2 hops
    val capped = Graph.bfsDistances(edges, "s", "d",
        Seq("a").toDF("node"), "node", maxHops = 2)
      .as[(String, Long)].collect().toMap
    assert(capped == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    // partitioning invariance
    val rep = Graph.bfsDistances(edges.repartition(7), "s", "d",
        Seq("a", "z").toDF("node"), "node", maxHops = 10)
      .as[(String, Long)].collect().toMap
    assert(rep == out)
  }
}
