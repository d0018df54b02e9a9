package graft.operators

import graft.SparkSpec
import scala.util.Random

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find ground truth with min-id canonical labels. */
  private def unionFindLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** fastPath=false forces the distributed star-contraction rounds; true
    * takes the driver union-find cutover — both must agree everywhere. */
  private def ccLabels(edges: Seq[(Long, Long)],
                       fastPath: Boolean): Map[Long, Long] =
    GraphOps.connectedComponents(edges.toDF("src", "dst"),
        driverFastPathEdges = if (fastPath) 1000000L else 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  for (fastPath <- Seq(true, false)) {
    val tag = if (fastPath) "driver fast path" else "distributed stars"

    test(s"[$tag] chain collapses to one component rooted at min") {
      val chain = (1L until 40L).map(i => (i, i + 1))
      assert(ccLabels(chain, fastPath) === (1L to 40L).map(_ -> 1L).toMap)
    }

    test(s"[$tag] cycle, clique, and bridged cliques") {
      val cycle = (10L until 15L).map(i => (i, i + 1)) :+ (15L, 10L)
      val clique = for { a <- 20L to 24L; b <- (a + 1) to 24L } yield (a, b)
      val bridge = Seq((30L, 31L), (31L, 32L), (40L, 41L), (32L, 40L))
      val edges = cycle ++ clique ++ bridge
      assert(ccLabels(edges, fastPath) === unionFindLabels(edges))
    }

    test(s"[$tag] duplicates, reversed edges, and self-loops") {
      val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (5L, 4L))
      val got = ccLabels(edges, fastPath)
      assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 4L))
    }

    test(s"[$tag] random graphs match union-find") {
      val rnd = new Random(42)
      for (trial <- 1 to 3) {
        val n = 200
        val ids = (1 to n).map(_ => rnd.nextLong(1000000).abs)
        val edges = (1 to 300).map { _ =>
          (ids(rnd.nextInt(n)), ids(rnd.nextInt(n)))
        }.filter { case (a, b) => a != b }
        assert(ccLabels(edges, fastPath) === unionFindLabels(edges),
          s"trial $trial")
      }
    }
  }

  test("incrementalComponents equals full-history CC after every batch") {
    val batches = Seq(
      Seq((1L, 2L), (3L, 4L)),
      Seq((2L, 3L)),             // merges {1,2} and {3,4}
      Seq((5L, 5L)),             // singleton arrives
      Seq((4L, 5L), (6L, 7L)))   // extends the big cluster + a new pair
    var labels = spark.emptyDataset[(Long, Long)].toDF("id", "component")
    var history = Seq.empty[(Long, Long)]
    for ((batch, i) <- batches.zipWithIndex) {
      labels = GraphOps.incrementalComponents(labels, batch.toDF("src", "dst"))
        .localCheckpoint()
      history ++= batch
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === unionFindLabels(history), s"after batch $i")
    }
    // final state: {1..5} rooted at 1, {6,7} rooted at 6
    val fin = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fin === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 6L, 7L -> 6L))
  }

  test("keyedPairs emits within-group pairs, prefilters hot keys") {
    val df = Seq(
      (10L, "a"), (11L, "a"), (12L, "a"),    // group of 3 → 3 pairs
      (20L, "b"), (21L, "b"),                // group of 2 → 1 pair
      (30L, "c"),                            // singleton → filtered (minN)
      (11L, "d"), (12L, "d"),                // duplicate pair via 2nd key
      (40L, "hot"), (41L, "hot"), (42L, "hot"), (43L, "hot")) // > maxN
      .toDF("id", "k")
    val got = DedupOps.keyedPairs(df, "k", "id", minN = 2, maxN = 3)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L)))
  }

  for ((label, cutover) <- Seq(("driver fast path", 1000000L),
                               ("distributed rounds", 0L)))
    test(s"pageRank [$label] reproduces the hand-computed integer recurrence") {
      // directed triangle plus a sink: 1→2, 2→3, 3→1, 1→4
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("src", "dst")
      val got = GraphOps.pageRank(edges, iterations = 2, scale = 1000L,
          driverFastPathEdges = cutover)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // replay the recurrence in plain Scala (same trunc-div integer math)
      val out = Map(1L -> Seq(2L, 4L), 2L -> Seq(3L), 3L -> Seq(1L))
      val nodes = Seq(1L, 2L, 3L, 4L)
      val teleport = (15L * 1000L) / (100L * nodes.size)
      var r = nodes.map(_ -> (1000L / nodes.size)).toMap
      for (_ <- 1 to 2)
        r = nodes.map(v => v -> (teleport + out.toSeq.collect {
          case (u, vs) if vs.contains(v) => (85L * r(u)) / (100L * vs.size)
        }.sum)).toMap
      assert(got === r)
    }

  test("pageRank: distributed rounds equal the driver fast path on random graphs") {
    val rnd = new Random(7)
    for (_ <- 1 to 5) {
      val n = 3 + rnd.nextInt(12)
      val edges = Seq.fill(6 + rnd.nextInt(20))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        val fast = GraphOps.pageRank(df, iterations = 3, scale = 1000000L)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val dist = GraphOps.pageRank(df, iterations = 3, scale = 1000000L,
            driverFastPathEdges = 0L)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(dist === fast, s"paths diverged on edges=$edges")
      }
    }
  }

  /** INDEPENDENT oracle for pinned-depth shortest paths: enumerate every
    * path from `source` using ≤ `rounds` edges (bounded DFS — fine at
    * spec scale) and take the min cost per node. Deliberately NOT the
    * relaxation recurrence, so a bug shared by the operator's fast path
    * and a copied twin cannot hide. */
  private def bruteSssp(edges: Seq[(Long, Long, Long)], source: Long,
                        rounds: Int): Map[Long, Long] = {
    val best = scala.collection.mutable.Map[Long, Long](source -> 0L)
    def walk(at: Long, cost: Long, left: Int): Unit = {
      if (left > 0) edges.foreach { case (u, v, w) =>
        if (u == at) {
          val c = cost + w
          if (!best.get(v).exists(_ <= c)) best(v) = c
          walk(v, c, left - 1)
        }
      }
    }
    walk(source, 0L, rounds)
    best.toMap
  }

  test("shortestPaths: hand fixture — relaxation picks the cheaper 2-hop route") {
    // 0→1 w=10 direct, but 0→2→1 costs 3+4=7; node 3 unreachable from 0
    val e = Seq((0L, 1L, 10L), (0L, 2L, 3L), (2L, 1L, 4L), (3L, 0L, 1L))
      .toDF("src", "dst", "w")
    for (fastPath <- Seq(1000000L, 0L)) {
      val got = GraphOps.shortestPaths(e, source = 0L, rounds = 3,
          driverFastPathEdges = fastPath)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === Map(0L -> 0L, 1L -> 7L, 2L -> 3L), s"fastPath=$fastPath")
    }
  }

  test("shortestPaths: pinned rounds bound path length — 1 round keeps the direct edge") {
    val e = Seq((0L, 1L, 10L), (0L, 2L, 3L), (2L, 1L, 4L)).toDF("src", "dst", "w")
    val got = GraphOps.shortestPaths(e, source = 0L, rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(0L -> 0L, 1L -> 10L, 2L -> 3L))
  }

  test("shortestPaths: random weighted graphs match the driver replay, both paths") {
    val rnd = new Random(11)
    for (_ <- 1 to 5) {
      val n = 3 + rnd.nextInt(10)
      val edges = Seq.fill(6 + rnd.nextInt(20))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, (1 + rnd.nextInt(9)).toLong))
        .filter(e => e._1 != e._2)
        .groupBy(e => (e._1, e._2)).map(_._2.minBy(_._3)).toSeq // one w per edge
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst", "w")
        val rounds = 1 + rnd.nextInt(4)
        val want = bruteSssp(edges, source = 0L, rounds)
        val fast = GraphOps.shortestPaths(df, 0L, rounds)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val dist = GraphOps.shortestPaths(df, 0L, rounds,
            driverFastPathEdges = 0L)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(fast === want, s"fast path diverged on edges=$edges rounds=$rounds")
        assert(dist === want, s"distributed diverged on edges=$edges rounds=$rounds")
      }
    }
  }

  /** Driver replay of synchronous LPA: same symmetrized set-semantics
    * graph, same (count desc, label asc) tie-break. */
  private def bruteLpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to rounds)
      lbl = adj.map { case (v, ns) =>
        val counts = ns.map(lbl).groupBy(identity).view.mapValues(_.size)
        v -> counts.toSeq.minBy { case (l, n) => (-n, l) }._1
      }
    lbl
  }

  test("labelPropagation: hand fixture — bridged triangles coalesce per side") {
    // triangle {1,2,3} — bridge 3–4 — triangle {4,5,6}
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("src", "dst")
    val got = GraphOps.labelPropagation(edges, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = bruteLpa(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L)), rounds = 4)
    assert(got === want)
    // the left triangle coalesces onto its minimum label; the bridge
    // node's label (3) propagates into the right triangle under sync
    // updates — communities match the replay, not naive per-side intuition
    assert(got(1L) === 1L && got(2L) === 1L)
    assert(Set(got(4L), got(5L), got(6L)).subsetOf(Set(3L, 4L)))
  }

  test("labelPropagation: random graphs match the driver replay at several depths") {
    val rnd = new Random(11)
    for (_ <- 1 to 5) {
      val n = 4 + rnd.nextInt(10)
      val edges = Seq.fill(6 + rnd.nextInt(20))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      if (edges.nonEmpty) {
        val rounds = 1 + rnd.nextInt(4)
        val got = GraphOps.labelPropagation(edges.toDF("src", "dst"), rounds)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got === bruteLpa(edges, rounds),
          s"diverged on edges=$edges rounds=$rounds")
      }
    }
  }

  for ((label, cutover) <- Seq(("driver fast path", 1000000L),
                               ("distributed rounds", 0L)))
    test(s"personalizedPageRank [$label] reproduces the seeded recurrence") {
      // directed triangle plus a sink, seed = {1}: all teleport mass at 1
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("src", "dst")
      val got = GraphOps.personalizedPageRank(edges, seeds = Seq(1L),
          iterations = 2, scale = 1000L, driverFastPathEdges = cutover)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val out = Map(1L -> Seq(2L, 4L), 2L -> Seq(3L), 3L -> Seq(1L))
      val nodes = Seq(1L, 2L, 3L, 4L)
      val teleport = (15L * 1000L) / 100L
      var r = nodes.map(v => v -> (if (v == 1L) 1000L else 0L)).toMap
      for (_ <- 1 to 2)
        r = nodes.map(v => v -> ((if (v == 1L) teleport else 0L) +
          out.toSeq.collect {
            case (u, vs) if vs.contains(v) => (85L * r(u)) / (100L * vs.size)
          }.sum)).toMap
      assert(got === r)
      // non-seed nodes hold strictly less rank than the seed after 2 rounds
      assert(got(1L) > got(2L) && got(1L) > got(4L))
    }

  /** Driver replay of integer max-normalized HITS. */
  private def bruteHits(edges: Seq[(Long, Long)], iters: Int,
                        scale: Long): Map[Long, (Long, Long)] = {
    val es = edges.distinct
    val ns = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    var h = ns.map(_ -> scale).toMap
    var a = ns.map(_ -> 0L).toMap
    for (_ <- 1 to iters) {
      val ar = ns.map(v => v -> es.filter(_._2 == v).map(e => h(e._1)).sum).toMap
      val amax = ar.values.max
      a = ns.map(v => v -> ar(v) * scale / amax).toMap
      val hr = ns.map(u => u -> es.filter(_._1 == u).map(e => a(e._2)).sum).toMap
      val hmax = hr.values.max
      h = ns.map(u => u -> hr(u) * scale / hmax).toMap
    }
    ns.map(v => v -> (h(v), a(v))).toMap
  }

  for ((label, cutover) <- Seq(("driver fast path", 1000000L),
                               ("distributed rounds", 0L)))
    test(s"hits [$label] reproduces the integer max-normalized recurrence") {
      // two hubs pointing into a shared authority + a chain
      val edges = Seq((1L, 10L), (2L, 10L), (1L, 11L), (3L, 11L), (10L, 12L))
      val got = GraphOps.hits(edges.toDF("src", "dst"), iterations = 3,
          scale = 1000L, driverFastPathEdges = cutover)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(got === bruteHits(edges, 3, 1000L))
      // 1 points at both strong authorities — it must be the top hub
      assert(got(1L)._1 === 1000L)
    }

  test("hits: distributed rounds equal the driver fast path on random graphs") {
    val rnd = new Random(17)
    for (_ <- 1 to 5) {
      val n = 3 + rnd.nextInt(12)
      val edges = Seq.fill(6 + rnd.nextInt(20))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        val fast = GraphOps.hits(df, iterations = 3, scale = 1000000L)
          .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
        val dist = GraphOps.hits(df, iterations = 3, scale = 1000000L,
            driverFastPathEdges = 0L)
          .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
        assert(dist === fast, s"paths diverged on edges=$edges")
      }
    }
  }

  /** Driver replay: all non-adjacent pairs scored by (common neighbors,
    * deg·deg), ranked by the total order. */
  private def bruteLinkPredict(edges: Seq[(Long, Long)],
                               topN: Int): Seq[(Long, Long, Long, Long)] = {
    val e0 = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val nbrs = (e0 ++ e0.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val nodes = nbrs.keys.toSeq.sorted
    val pairs = for {
      u <- nodes; v <- nodes if u < v && !nbrs(u).contains(v)
      cn = (nbrs(u) intersect nbrs(v)).size.toLong if cn > 0
    } yield (u, v, cn, nbrs(u).size.toLong * nbrs(v).size)
    pairs.sortBy { case (u, v, cn, pa) => (-cn, -pa, u, v) }.take(topN)
  }

  test("linkPredict matches the brute-force ranking on random graphs") {
    val rnd = new Random(23)
    for (_ <- 1 to 5) {
      val n = 6 + rnd.nextInt(10)
      val edges = Seq.fill(8 + rnd.nextInt(25))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val got = GraphOps.linkPredict(edges.toDF("src", "dst"), topN = 10)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got === bruteLinkPredict(edges, 10), s"edges=$edges")
    }
  }

  test("linkPredict: maxDegree cap removes wedges centered on hot hubs") {
    // hub 0 touches 1..6; spokes 1-2 and 3-4 form sub-cap centers
    val edges = (1L to 6L).map((0L, _)) ++ Seq((1L, 2L), (3L, 4L))
    val unc = GraphOps.linkPredict(edges.toDF("src", "dst"), topN = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every non-adjacent spoke pair shares hub 0
    assert(unc.contains((1L, 3L)) && unc.contains((5L, 6L)))
    val capped = GraphOps.linkPredict(edges.toDF("src", "dst"), topN = 100,
        maxDegree = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // hub 0 (deg 6) stops generating wedges; only centers 1..4 (deg 2)
    // remain, whose wedges all close onto existing hub edges — pairs whose
    // ONLY witness was the hub disappear, the documented recall trade
    assert(!capped.contains((5L, 6L)))
    assert(capped.subsetOf(unc))
  }

  test("linkPredictAdaptiveCap: percentile cap binds and equals the fixed cap") {
    // hub 0 touches 1..6 (deg 6); centers 1..4 have deg 2, 5..6 deg 1 —
    // degrees sorted: [1,1,2,2,2,2,6]; p25 over 7 values = rank 1.5 →
    // interpolated 1.0 + 0.5*(2-1) = 1.5 → floor = 1: only the two
    // deg-1 leaves remain centers (no wedges through them)
    val edges = (1L to 6L).map((0L, _)) ++ Seq((1L, 2L), (3L, 4L))
    val adaptive = GraphOps.linkPredictAdaptiveCap(
        edges.toDF("src", "dst"), topN = 100, degPercentile = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = GraphOps.linkPredict(edges.toDF("src", "dst"), topN = 100,
        maxDegree = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(adaptive === fixed)
    // a p100 cap keeps every center — equals the uncapped run exactly
    val all = GraphOps.linkPredictAdaptiveCap(
        edges.toDF("src", "dst"), topN = 100, degPercentile = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val unc = GraphOps.linkPredict(edges.toDF("src", "dst"), topN = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(all === unc)
    // empty edge set: falls back to the (empty) uncapped run, no NPE
    assert(GraphOps.linkPredictAdaptiveCap(
      Seq.empty[(Long, Long)].toDF("src", "dst"), topN = 5).count() === 0L)
  }

  test("personalizedPageRank: distributed rounds equal the driver fast path") {
    val rnd = new Random(13)
    for (_ <- 1 to 5) {
      val n = 3 + rnd.nextInt(12)
      val edges = Seq.fill(6 + rnd.nextInt(20))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        val seeds = Seq(edges.head._1, edges.last._2).distinct
        val fast = GraphOps.personalizedPageRank(df, seeds, iterations = 3,
            scale = 1000000L)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val dist = GraphOps.personalizedPageRank(df, seeds, iterations = 3,
            scale = 1000000L, driverFastPathEdges = 0L)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(dist === fast, s"paths diverged on edges=$edges seeds=$seeds")
      }
    }
  }

  /** Driver brute force: distinct canonical edges → adjacency sets →
    * count triples with all three edges present. */
  private def bruteTriangles(edges: Seq[(Long, Long)]): (Long, Long) = {
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = canon.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keys.toSeq.sorted
    // yield the TRIPLE, not a constant: the inner generators are Sets and
    // a constant yield would collapse every triangle into one element
    val tris = (for {
      i <- nodes; j <- adj(i).filter(_ > i); k <- adj(j).filter(_ > j)
      if adj(i).contains(k)
    } yield (i, j, k)).size.toLong
    // wedges as the operator defines them: oriented by (deg, id), pairs
    // of out-neighbors per source, canonical by id
    val deg = canon.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .view.mapValues(_.size).toMap
    def precedes(a: Long, b: Long) =
      deg(a) < deg(b) || (deg(a) == deg(b) && a < b)
    val out = canon.map { case (a, b) =>
      if (precedes(a, b)) (a, b) else (b, a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val wedges = out.values.map(ns => ns.size.toLong * (ns.size - 1) / 2).sum
    (tris, wedges)
  }

  test("triangleCount: fixtures — K4, star, 5-cycle, bridged triangles") {
    def run(edges: Seq[(Long, Long)]): (Long, Long) = {
      val r = GraphOps.triangleCount(edges.toDF("src", "dst")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    // K4: C(4,3)=4 triangles; star: 0; C5: 0
    val k4 = for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)
    assert(run(k4) === bruteTriangles(k4))
    assert(run(k4)._1 === 4L)
    val star = (1L to 6L).map(i => (0L, i))
    assert(run(star) === ((0L, bruteTriangles(star)._2)))
    val c5 = (0L until 5L).map(i => (i, (i + 1) % 5))
    assert(run(c5)._1 === 0L)
    // two triangles sharing a bridge edge + noise: dupes/reversed/self-loops
    val bridged = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 3L), (2L, 1L), (1L, 1L), (3L, 1L))
    assert(run(bridged) === bruteTriangles(bridged))
    assert(run(bridged)._1 === 2L)
  }

  test("triangleCount: random graphs match driver brute force") {
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      val n = 8 + rnd.nextInt(10)
      val edges = Seq.fill(3 * n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val r = GraphOps.triangleCount(edges.toDF("src", "dst")).collect()(0)
      assert((r.getLong(0), r.getLong(1)) === bruteTriangles(edges),
        s"trial $trial")
    }
  }

  /** Driver peeling to FIXPOINT (order-independent, so this is the true
    * k-core whatever order the distributed rounds peel in). */
  private def bruteKCore(edges: Seq[(String, String)], k: Int): Map[String, Int] = {
    var cur = edges.filter(e => e._1 != e._2).distinct.toSet
    var changed = true
    while (changed) {
      val deg = cur.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val nxt = cur.filter(e => deg(e._1) >= k && deg(e._2) >= k)
      changed = nxt != cur; cur = nxt
    }
    cur.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  test("kCore: random graphs reach the union fixpoint; extra rounds are no-ops") {
    val rnd = new Random(11)
    for (trial <- 1 to 4) {
      val n = 10 + rnd.nextInt(8)
      val edges = Seq.fill(4 * n)(
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
      val k = 2 + rnd.nextInt(3)
      val truth = bruteKCore(edges, k)
      // depth n is always enough (each productive round removes ≥1 node)
      val got = GraphOps.kCore(edges.toDF("src", "dst"), k, rounds = n)
        .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
      assert(got === truth, s"trial $trial k=$k")
      // rounds-invariance past convergence
      val more = GraphOps.kCore(edges.toDF("src", "dst"), k, rounds = n + 3)
        .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
      assert(more === truth, s"trial $trial extra rounds changed the core")
    }
  }

  test("kCore: the declared doc-word config converges inside the pinned depth") {
    // the SAME edge builder the declared query uses — the guard can't
    // silently drift from the declared graph
    val e = graft.Queries.docWordEdges(spark, sf())
    val at5 = GraphOps.kCore(e, k = 22, rounds = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val at9 = GraphOps.kCore(e, k = 22, rounds = 9)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(at5 === at9, "pinned depth 5 did not reach the fixpoint")
    // converged ⇒ every survivor really is in the 22-core
    assert(at5.forall(_._2 >= 22))
    assert(at5.nonEmpty)
  }

  /** Driver peel replay at a PINNED round count (the exact function
    * [[GraphOps.kCore]] computes at a given depth — NOT the fixpoint),
    * for both-path equivalence at depths short of convergence. Same
    * directed-distinct set semantics as the operator's input prep. */
  private def bruteKCoreRounds[V](edges: Seq[(V, V)], k: Int,
                                  rounds: Int): Map[V, Long] = {
    var cur = edges.filter(e => e._1 != e._2).distinct
    for (_ <- 1 to rounds) {
      val deg = cur.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      cur = cur.filter(e => deg(e._1) >= k && deg(e._2) >= k)
    }
    cur.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  // Both-path equivalence for the r15 driver fast paths (VERDICT r15 #1:
  // kCore and labelPropagation landed their ≤1M-edge driver cutover
  // WITHOUT the pageRank-pattern cutover-parameterized specs, leaving the
  // distributed rounds — the code that runs at production scale — covered
  // by no test). Mirrors GraphOpsSpec's pageRank template exactly.
  for ((label, cutover) <- Seq(("driver fast path", 1000000L),
                               ("distributed rounds", 0L))) {
    test(s"kCore [$label] reproduces the driver peel, incl. pre-fixpoint depths") {
      // clique {1..4} is the 3-core; pendant chain 4-5-6 peels over two
      // rounds (6 drops when 5's degree falls), so rounds=1 differs from
      // rounds=2 — a depth-off-by-one in either path fails here
      val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
        (3L, 4L), (4L, 5L), (5L, 6L))
      for (rounds <- 1 to 3) {
        val got = GraphOps.kCore(edges.toDF("src", "dst"), k = 3,
            rounds = rounds, driverFastPathEdges = cutover)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === bruteKCoreRounds(edges, 3, rounds),
          s"rounds=$rounds cutover=$cutover")
      }
    }

    test(s"labelPropagation [$label] reproduces the replay on the bridged triangles") {
      val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
        (4L, 5L), (5L, 6L), (4L, 6L))
      val got = GraphOps.labelPropagation(edges.toDF("src", "dst"),
          rounds = 4, driverFastPathEdges = cutover)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === bruteLpa(edges, 4), s"cutover=$cutover")
    }
  }

  test("kCore: distributed rounds equal the fast path on random string-vertex graphs") {
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val n = 8 + rnd.nextInt(8)
      val edges = Seq.fill(3 * n)(
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
      val k = 2 + rnd.nextInt(3)
      val rounds = 1 + rnd.nextInt(4)
      val df = edges.toDF("src", "dst")
      val want = bruteKCoreRounds(edges, k, rounds)
      val fast = GraphOps.kCore(df, k, rounds)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val dist = GraphOps.kCore(df, k, rounds, driverFastPathEdges = 0L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(fast === want, s"trial $trial fast path diverged (k=$k rounds=$rounds)")
      assert(dist === want, s"trial $trial distributed diverged (k=$k rounds=$rounds)")
    }
  }

  test("labelPropagation: distributed rounds equal the fast path on random graphs") {
    val rnd = new Random(19)
    for (trial <- 1 to 5) {
      val n = 4 + rnd.nextInt(10)
      val edges = Seq.fill(6 + rnd.nextInt(20))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      if (edges.nonEmpty) {
        val rounds = 1 + rnd.nextInt(4)
        val want = bruteLpa(edges, rounds)
        val fast = GraphOps.labelPropagation(edges.toDF("src", "dst"), rounds)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val dist = GraphOps.labelPropagation(edges.toDF("src", "dst"), rounds,
            driverFastPathEdges = 0L)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(fast === want, s"trial $trial fast path diverged (rounds=$rounds)")
        assert(dist === want, s"trial $trial distributed diverged (rounds=$rounds)")
      }
    }
  }

  test("labelPropagation: string tie-break is UTF-8 byte order on BOTH paths") {
    // U+FFFF renders as UTF-8 bytes EF BF BF; U+1F600 (a supplementary
    // char) as F0 9F 98 80 — so in Spark's binary collation U+FFFF sorts
    // FIRST, while java.lang.String.compareTo (UTF-16 code units: FFFF vs
    // the D83D surrogate) sorts it LAST. A driver fast path that used
    // String.compareTo would pick the other label here and diverge.
    val hi = "\uFFFF"
    val emoji = new String(Character.toChars(0x1F600))
    // node "z" sees one neighbor labeled hi and one labeled emoji (count
    // tie) — the (count DESC, label ASC) tie-break decides via collation
    val edges = Seq((hi, "z"), (emoji, "z"))
    val fast = GraphOps.labelPropagation(edges.toDF("src", "dst"), rounds = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val dist = GraphOps.labelPropagation(edges.toDF("src", "dst"), rounds = 1,
        driverFastPathEdges = 0L)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(fast === dist, "collation mismatch between driver and Spark paths")
    assert(fast("z") === hi,
      "tie-break picked the UTF-16-min label — driver collation is not binary")
  }

  test("dedupClusters labels every doc; singletons are their own cluster") {
    val docs = (1L to 10L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val got = GraphOps.dedupClusters(docs, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = Set(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 4L, 1L), (5L, 5L, 1L), (6L, 6L, 1L),
      (7L, 7L, 2L), (8L, 8L, 1L), (9L, 7L, 2L), (10L, 10L, 1L))
    assert(got === expect)
  }

  test("labelWithClusters survives an idCol literally named \"id\"") {
    // the labels frame carries its own "id" column — the rename guard must
    // keep the join unambiguous for docs whose id column is also "id"
    val docs = (1L to 5L).toDF("id")
    val labels = Seq((1L, 1L), (2L, 1L)).toDF("id", "component")
    val got = GraphOps.labelWithClusters(docs, "id", labels)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 1L, 2L), (2L, 1L, 2L),
      (3L, 3L, 1L), (4L, 4L, 1L), (5L, 5L, 1L)))
  }
}
