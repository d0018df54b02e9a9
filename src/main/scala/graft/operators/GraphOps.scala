package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed connected components — the transitive-closure step that turns
  * near-dup PAIRS (minhash/simhash/jaccard/embedding candidates) into dedup
  * CLUSTERS with one canonical keeper per cluster. Without it, A~B and B~C
  * keeps both B and C when only A should survive.
  *
  * Algorithm: alternating large-star / small-star contraction (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14) — each
  * round is two hash-shuffles (groupBy + join), converges in O(log n)
  * rounds on any graph (vs O(diameter) for plain label propagation), and
  * never materializes a neighborhood larger than the input degree. This is
  * the shape that survives a 100 TB corpus: per-round cost is linear in
  * |E|, driver work is one 1-row checksum action per round, and lineage is
  * cut with localCheckpoint so plans don't grow across iterations.
  */
object GraphOps {

  /** One large-star round: every node u links its strictly-larger neighbors
    * to m = min(N(u) ∪ {u}). Keeps big components shrinking in parallel. */
  private def largeStar(e: DataFrame): DataFrame = {
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val m = und.groupBy("src")
      .agg(least(min(col("dst")), first(col("src"))).as("m"))
    und.join(m, "src")
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** One small-star round: orient edges toward the smaller endpoint; every
    * node links its smaller neighbors (and itself) to the minimum one. */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = e.select(
        greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst"))
    val m = or.groupBy("src").agg(min(col("dst")).as("m"))
    val fromNbrs = or.join(m, "src")
      .where(col("dst") =!= col("m"))
      .select(col("dst").as("src"), col("m").as("dst"))
    val fromSelf = m.select(col("src"), col("m").as("dst"))
    fromNbrs.union(fromSelf).distinct()
  }

  /** Connected components over an undirected edge list.
    *
    * Adaptive, like AQE's runtime re-planning: the first convergence
    * checksum yields the edge count for free, and a graph whose edges fit
    * comfortably on the driver (≤ `driverFastPathEdges`) is solved with an
    * exact union-find there — identical min-id labels, microseconds instead
    * of O(log n) job rounds. Larger graphs run the distributed star
    * contraction. Dedup graphs are almost always tiny relative to their
    * corpus (edges ≈ duplicates); the cutover keeps the 100 TB path honest
    * while not taxing the common case with scheduler overhead.
    *
    * @param edges frame with two long-castable columns `src`, `dst`
    *              (self-loops and duplicate/reversed edges are fine)
    * @param driverFastPathEdges fast-path cutover; 0 forces distributed
    * @return (id, component) for every node APPEARING IN `edges`, where
    *         component = min node id of the node's component. Isolated
    *         nodes never seen in an edge are the caller's to union in
    *         (they are their own component by definition).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50,
                          driverFastPathEdges: Long = 1000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // cut the RAW edge input once: `nodes` and the initial edge set both
    // derive from it, and without the cut each would re-run the whole
    // upstream candidate-pair pipeline (the dominant cost for dedup
    // graphs). The cut is a CACHE, not a localCheckpoint: checkpoint
    // materialization compiles the pipeline to one monolithic non-adaptive
    // job (no AQE stage re-optimization, no exchange reuse — measured
    // 3.4 s vs 1.2 s on the LSH near-dup pipeline), while the cache fills
    // through the normal adaptive action below. The loop's per-round star
    // frames keep LAZY localCheckpoints — their inputs are already
    // materialized, so each round still costs one job.
    val cleaned = edges
      .select(col("src").cast(LongType).as("src"),
        col("dst").cast(LongType).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the fast-path gate reads only the RAW edge count — one action that
    // also fills the cache; the distinct edge set and its checksum are
    // built only on the distributed path (they cost a shuffle + agg job
    // over the full upstream pipeline, pure waste when the graph is
    // driver-sized). The collected volume stays bounded by the raw count,
    // which is what driver safety actually needs.
    val rawEdges = cleaned.count()

    if (driverFastPathEdges > 0 &&
        rawEdges <= 2L * driverFastPathEdges + 16L) {
      val parent = scala.collection.mutable.Map[Long, Long]()
      // iterative find + path compression: a recursive find would blow the
      // stack on a path-graph at the threshold
      def find(x0: Long): Long = {
        parent.getOrElseUpdate(x0, x0)
        var r = x0
        while (parent(r) != r) r = parent(r)
        var c = x0
        while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      cleaned.collect().foreach { r =>
        val (ra, rb) = (find(r.getLong(0)), find(r.getLong(1)))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val labels = parent.keys.toSeq.map(k => (k, find(k)))
      cleaned.unpersist()
      return labels.toDF("id", "component")
    }

    // nodes are collected BEFORE dropping self-loops so a node appearing
    // only as (x, x) still gets a label
    val nodes = cleaned.select(col("src").as("id"))
      .union(cleaned.select(col("dst").as("id"))).distinct()
    var e = cleaned
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(false)

    // convergence = edge set unchanged; (count, xor of edge hashes) is a
    // 1-row action per round, not a full frame compare. bit_xor is order-
    // independent and can't overflow under ANSI mode; edges are distinct()
    // so xor-cancellation of repeated values can't produce a false match.
    def checksum(f: DataFrame): (Long, Long) = {
      val r = f.agg(
        count(lit(1)),
        coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var prev = checksum(e)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val cs = checksum(next)
      converged = cs == prev
      prev = cs
      val old = e
      e = next
      old.unpersist()
      it += 1
    }

    // at the fixpoint the edge set is a union of stars rooted at each
    // component's minimum id; min() per node is belt-and-braces for the
    // maxIter cutoff on adversarial graphs
    val lbl = e.select(
        greatest(col("src"), col("dst")).as("id"),
        least(col("src"), col("dst")).as("comp"))
      .groupBy("id").agg(min(col("comp")).as("comp"))
    nodes.join(lbl, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("component"))
  }

  /** Incremental connected components: fold a batch of NEW edges into an
    * existing labeling without re-reading edge history. The previous labels
    * ARE a star edge set (id → component) with the same components as the
    * full history, so CC over (stars ∪ newEdges) equals CC over every edge
    * ever seen — the standard incremental trick. Per-batch cost is linear
    * in |labels| + |newEdges| and the stars collapse old components in one
    * round, so this is what a streaming dedup pipeline runs per micro-batch
    * (see StreamingSpec) while the corpus itself stays at rest.
    *
    * @param prevLabels (id, component) from a prior run (empty ok)
    * @param newEdges   (src, dst) new pairs
    * @return updated (id, component) covering all previously-labeled nodes
    *         plus every node in `newEdges`; labels = min id per component.
    */
  def incrementalComponents(prevLabels: DataFrame,
                            newEdges: DataFrame): DataFrame = {
    val stars = prevLabels.select(col("id").as("src"),
      col("component").as("dst"))
    connectedComponents(
      stars.unionByName(newEdges.select(col("src"), col("dst"))))
  }

  /** K-CORE decomposition by synchronous peeling — the web-graph quality
    * signal (a page/document in a high k-core is embedded in a densely
    * self-supporting region; spam and boilerplate peel off early). Each
    * round removes every vertex whose degree dropped below `k`; the
    * k-core is the unique ORDER-INDEPENDENT fixpoint, so any converged
    * run equals it. `rounds` is PINNED (not run-to-fixpoint) so an
    * oracle unrolling the same number of rounds computes the identical
    * function even on inputs where the fixpoint needs fewer or more
    * peels — the declared query's spec asserts convergence at the pinned
    * depth on the fixture. Per round: one degree hash-agg + two
    * broadcast-able semi-joins; edges only ever shrink. Output: the
    * surviving (v, deg) pairs after `rounds` peels — backed by the final
    * round's localCheckpoint'ed blocks, which the CALLER owns once
    * consumed (the [[pageRank]] contract); superseded rounds' blocks are
    * released here. */
  /** Vertex ordering for driver fast paths that must EXACTLY reproduce a
    * Spark-side ordering tie-break (labelPropagation's `lbl ASC`):
    * strings compare as UNSIGNED UTF-8 BYTES — Spark's binary string
    * collation — because java.lang.String.compareTo is UTF-16 code-unit
    * order, which DISAGREES with UTF-8 byte order beyond the BMP;
    * integral types compare numerically. Any other vertex type returns
    * None and the caller keeps the distributed rounds (a silently
    * different driver collation would be a wrong-answer bug, not a perf
    * choice). */
  private[operators] def driverOrdering(dt: DataType): Option[Ordering[Any]] = dt match {
    case StringType => Some(new Ordering[Any] {
      def compare(x: Any, y: Any): Int = {
        val a = x.asInstanceOf[String]
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val b = y.asInstanceOf[String]
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var i = 0
        while (i < a.length && i < b.length) {
          val c = (a(i) & 0xff) - (b(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        a.length - b.length
      }
    })
    case LongType | IntegerType | ShortType | ByteType =>
      Some(Ordering.by((x: Any) => x.asInstanceOf[Number].longValue()))
    case _ => None
  }

  def kCore(edges: DataFrame, k: Int, rounds: Int,
            driverFastPathEdges: Long = 1000000L): DataFrame = {
    def degrees(e: DataFrame): DataFrame =
      e.select(col("src").as("v")).unionAll(e.select(col("dst").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
    var e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint()

    // Adaptive driver fast path (the [[pageRank]] contract, extended r15:
    // each distributed peel round pays ~0.25 s of per-round Catalyst
    // planning alone, so a graph that fits on the driver computes the
    // identical integer function there). Gated to vertex types whose
    // driver-side equality matches Spark's ([[driverOrdering]]).
    val vt = e.schema.fields(0).dataType
    if (driverFastPathEdges > 0 && driverOrdering(vt).isDefined &&
        e.schema.fields(1).dataType == vt && e.count() <= driverFastPathEdges) {
      var es = e.collect().map(r => (r.get(0), r.get(1)))
      for (_ <- 1 to rounds) {
        val deg = scala.collection.mutable.Map[Any, Long]().withDefaultValue(0L)
        es.foreach { case (u, v) => deg(u) += 1; deg(v) += 1 }
        es = es.filter { case (u, v) => deg(u) >= k && deg(v) >= k }
      }
      val deg = scala.collection.mutable.Map[Any, Long]().withDefaultValue(0L)
      es.foreach { case (u, v) => deg(u) += 1; deg(v) += 1 }
      val spark = edges.sparkSession
      e.unpersist()
      import scala.jdk.CollectionConverters._
      return spark.createDataFrame(
        deg.toSeq.map { case (v, d) =>
          org.apache.spark.sql.Row(v, d) }.asJava,
        StructType(Seq(StructField("v", vt), StructField("deg", LongType))))
    }
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("deg") >= k)
        .select("v").localCheckpoint() // two semi-join consumers
      val old = e
      // the eager checkpoint materializes the round, fully consuming
      // keep/old — release their pinned blocks (pageRank/CC round
      // hygiene: at 8 rounds the leak would hold ~17 edge-set copies)
      // (A/B r15: dropping the keep checkpoint in favor of exchange
      // reuse across its two semi-join consumers measured SLOWER —
      // 2.0 s min vs 1.9 — the duplicate degree agg is not deduped)
      e = e.join(keep.withColumnRenamed("v", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("v", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint()
      keep.unpersist()
      old.unpersist()
    }
    degrees(e)
  }

  /** TRIANGLE COUNT via degree orientation — the classic fix for the
    * "curse of the last reducer" (Suri & Vassilvitskii, WWW'11): every
    * undirected edge is oriented from its (degree, id)-smaller endpoint
    * to the larger, so each triangle is counted EXACTLY once from its
    * order-minimal vertex, and the wedge join fans out by the oriented
    * out-degree — O(√m) for ANY graph, so the skewed hub that makes the
    * naive wedge join quadratic has its edges pointed INTO it instead.
    * Input: an edge list (`src`, `dst`), either direction, self-loops and
    * duplicates tolerated. Output: one row (n_triangles, n_wedges) —
    * all-integer, oracle-exact. Cost: two hash-agg passes (canonical
    * edges, degrees) + one self-join bounded by orientation + one
    * closing-edge lookup join. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("src").cast(LongType).as("x"),
        col("dst").cast(LongType).as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
      // three consumers (degrees, orientation, closing lookup)
      .localCheckpoint()
    val deg = e0.select(col("a").as("v"))
      .unionAll(e0.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val keepAB = // total order (d, v): a stays the source iff a ≺ b
      col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = e0
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .select(when(keepAB, col("a")).otherwise(col("b")).as("src"),
        when(keepAB, col("b")).otherwise(col("a")).as("dst"))
      .localCheckpoint() // wedge self-join reads it twice
    // wedges at u: unordered out-neighbor pairs, canonical by id; the
    // closing edge is then exactly a canonical e0 row
    val wedges = oriented.select(col("src"), col("dst").as("v"))
      .join(oriented.select(col("src"), col("dst").as("w")), Seq("src"))
      .filter(col("v") < col("w"))
    wedges
      .join(e0.select(col("a").as("v"), col("b").as("w"),
        lit(1L).as("closed")), Seq("v", "w"), "left")
      .agg(coalesce(sum(coalesce(col("closed"), lit(0L))), lit(0L))
          .cast(LongType).as("n_triangles"), // outer coalesce: 0-wedge graph
        count(lit(1)).as("n_wedges"))
  }

  /** Integer-scaled PageRank over a directed edge list — fixed iteration
    * count, ALL arithmetic in scaled BIGINT (truncating division), so ranks
    * are bit-identical across engines and partition orders: the variant an
    * oracle can replay in ANSI SQL (floating PageRank never hashes equal
    * across engines).
    *
    * rank₀(v) = S/N;  rankₜ₊₁(v) = ⌊0.15·S/N⌋ + Σ_{u→v} ⌊0.85·rankₜ(u)/deg(u)⌋
    *
    * Per iteration: one equi-join of edges onto ranks + one hash agg —
    * linear in |E|, the standard distributed PageRank step. Ranks are
    * localCheckpoint'ed each round so the plan does not grow with the
    * iteration count (the same lineage-cut the CC rounds use). Dangling
    * mass is dropped (not redistributed), the common simplification — every
    * node still receives the teleport term via the right join on nodes.
    *
    * @param edges (src, dst) directed; dedup beforehand if multiplicity
    *              should not weight the walk
    * @param iterations fixed round count (convergence is geometric; 5-10
    *                   rounds ranks stably for analytics use)
    * @param scale S — rank mass per node at scale 1e9 keeps 85·r within
    *              int64 for graphs up to ~10⁸ nodes
    * @param driverFastPathEdges same adaptive cutover as
    *              [[connectedComponents]]: a graph this small pays more in
    *              per-round scheduler overhead than the whole computation
    *              costs on the driver (identical integer recurrence either
    *              way); 0 forces the distributed rounds
    * @return (node, rank) — rank sums to ≤ N·S/N = S modulo truncation loss.
    *   The distributed path returns a frame backed by the final round's
    *   localCheckpoint'ed blocks: the CALLER owns that storage and should
    *   release it once consumed (unpersist via
    *   `sparkContext.getPersistentRDDs`, as Bench does between queries) —
    *   pageRank itself unpersists every superseded round, but the result's
    *   blocks must outlive the call because the checkpoint truncated their
    *   lineage (no recompute path exists).
    */
  def pageRank(edges: DataFrame, iterations: Int = 5,
               scale: Long = 1000000000L,
               driverFastPathEdges: Long = 1000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast(LongType), col("dst").cast(LongType))
      .localCheckpoint()

    if (driverFastPathEdges > 0 && e.count() <= driverFastPathEdges) {
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      val ns = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
      val teleport = (15L * scale) / (100L * ns.length)
      val deg = es.groupBy(_._1).map { case (u, out) => u -> out.length.toLong }
      var r = ns.map(_ -> scale / ns.length).toMap
      for (_ <- 1 to iterations) {
        val rc = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        es.foreach { case (u, v) => rc(v) += (85L * r(u)) / (100L * deg(u)) }
        r = ns.map(v => v -> (teleport + rc(v))).toMap
      }
      e.unpersist()
      return ns.map(v => (v, r(v))).toSeq.toDF("node", "r")
    }

    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val n = nodes.count()
    val teleport = (15L * scale) / (100L * n)
    var rank = nodes.withColumn("r", lit(scale / n))
    for (it <- 1 to iterations) {
      val contrib = e.join(rank, e("src") === rank("node"))
        .join(deg, "src")
        .select(col("dst").as("node"),
          expr("(85 * r) div (100 * deg)").as("c"))
      val next = contrib.groupBy("node").agg(sum("c").as("rc"))
        // right join: sink-less nodes (no in-edges) still hold teleport mass
        .join(nodes, Seq("node"), "right")
        .na.fill(0L, Seq("rc"))
        .select(col("node"), (lit(teleport) + col("rc")).as("r"))
        .localCheckpoint()
      // drop the superseded round's pinned blocks (the CC rounds do the
      // same) — at |V| rows per round the leak would outlive the call
      if (it > 1) rank.unpersist()
      rank = next
    }
    e.unpersist()
    nodes.unpersist()
    rank
  }

  /** HITS hubs & authorities (Kleinberg) over a DIRECTED edge set, with
    * INTEGER max-normalization — the link-analysis dual of [[pageRank]]:
    * hubs point at good authorities, authorities are pointed at by good
    * hubs. Per iteration: aᵣ(v) = Σ_{u→v} h(u), then a(v) = aᵣ(v)·S ÷
    * max aᵣ (truncating); symmetrically for h from a. Sums are integer
    * (associative), max is order-free, division truncates — the whole run
    * is bit-identical across engines and partitionings, so the oracle
    * replays it as unrolled CTEs (float-normalized HITS never would).
    *
    * `scale` must satisfy maxInDeg·scale² < 2⁶³ (the normalize step
    * multiplies a raw sum by scale before dividing): the 1e6 default is
    * safe to ~9e6-node-degree graphs; classic 1e9 PageRank scale would
    * overflow at degree ≥10. Per-round cost: two edge equi-joins + two
    * hash aggs + two 1-row max broadcasts. Same adaptive driver fast
    * path and caller-owns-final-blocks contract as [[pageRank]].
    *
    * @return (node, hub, auth) for every node in `edges`
    */
  def hits(edges: DataFrame, iterations: Int = 5, scale: Long = 1000000L,
           driverFastPathEdges: Long = 1000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast(LongType), col("dst").cast(LongType))
      .distinct().localCheckpoint()

    if (driverFastPathEdges > 0 && e.count() <= driverFastPathEdges) {
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      val ns = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
      var h = ns.map(_ -> scale).toMap
      var a = ns.map(_ -> 0L).toMap
      for (_ <- 1 to iterations) {
        val ar = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        es.foreach { case (u, v) => ar(v) += h(u) }
        val amax = ar.values.max
        a = ns.map(v => v -> ar(v) * scale / amax).toMap
        val hr = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        es.foreach { case (u, v) => hr(u) += a(v) }
        val hmax = hr.values.max
        h = ns.map(v => v -> hr(v) * scale / hmax).toMap
      }
      e.unpersist()
      return ns.map(v => (v, h(v), a(v))).toSeq.toDF("node", "hub", "auth")
    }

    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    def normalize(raw: DataFrame, outCol: String): DataFrame = {
      // raw: (node, r) for nodes with incident edges only; max is a 1-row
      // broadcast (the q_histogram scalar idiom), missing nodes fill 0
      val mx = raw.agg(max(col("r")).as("mx"))
      nodes.join(raw, Seq("node"), "left")
        .na.fill(0L, Seq("r"))
        .crossJoin(broadcast(mx))
        .select(col("node"), expr(s"(r * $scale) div mx").as(outCol))
        .localCheckpoint()
    }
    var hub = nodes.withColumn("hub", lit(scale)).localCheckpoint()
    var auth: DataFrame = null
    for (it <- 1 to iterations) {
      val araw = e.join(hub.select(col("node").as("src"), col("hub")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum("hub").as("r"))
      val nextAuth = normalize(araw, "auth")
      if (auth != null) auth.unpersist()
      auth = nextAuth
      val hraw = e.join(auth.select(col("node").as("dst"), col("auth")), Seq("dst"))
        .groupBy(col("src").as("node")).agg(sum("auth").as("r"))
      val nextHub = normalize(hraw, "hub")
      hub.unpersist()
      hub = nextHub
    }
    val out = hub.join(auth, Seq("node"))
    e.unpersist()
    nodes.unpersist()
    out
  }

  /** Common-neighbor LINK PREDICTION over an undirected graph — "which
    * nodes SHOULD be connected?": for every non-adjacent pair (u,v), score
    * by `cn` = |N(u) ∩ N(v)| (common neighbors) with `pa` = deg(u)·deg(v)
    * (preferential attachment) as the tie-breaking second signal — the two
    * classic integer link-prediction scores (Liben-Nowell & Kleinberg),
    * both exact BIGINT so the global top-N is a total order under
    * (cn DESC, pa DESC, src ASC, dst ASC) and the whole operator sits
    * under the cross-engine hash gate (Adamic–Adar's 1/ln deg would not).
    *
    * Plan shape: wedges enumerate per CENTER w as unordered neighbor
    * pairs — one adjacency self-join on w + one hash agg on (u,v), then an
    * anti-join removes existing edges and a degree join prices pa; the
    * top-N is Spark's distributed TakeOrdered (no global sort
    * materializes). Wedge cost is Σ_w deg(w)² — at corpus scale a single
    * celebrity hub goes quadratic, so `maxDegree` (OPT-IN, default keeps
    * every center — the DedupOps hot-bucket-cap contract) drops wedge
    * CENTERS above the cap before the self-join: capped centers stop
    * GENERATING wedges but still appear as endpoints through their
    * sub-cap neighbors, and any pair whose ONLY common neighbors are
    * capped hubs disappears from the output — set the cap deliberately.
    * The windowed degree count partitions on exactly the self-join key,
    * so its exchange is reused by the join itself.
    *
    * @param edges undirected edge list (src, dst); direction and
    *              duplicates are normalized away
    * @param topN  global result size (total-order ranked)
    * @return (src, dst, cn, pa) — src < dst, non-adjacent pairs only
    */
  def linkPredict(edges: DataFrame, topN: Int = 100,
                  maxDegree: Int = Int.MaxValue,
                  degPercentileCap: Option[Double] = None): DataFrame = {
    require(degPercentileCap.forall(p => p > 0 && p <= 1),
      s"linkPredict: degPercentileCap in (0,1], got $degPercentileCap")
    val e0 = edges.select(col("src").cast(LongType).as("x"),
        col("dst").cast(LongType).as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
      .localCheckpoint() // three consumers: adjacency (×2 sides), anti-join
    val adj = e0.select(col("a").as("w"), col("b").as("u"))
      .unionAll(e0.select(col("b").as("w"), col("a").as("u")))
    val deg = adj.groupBy(col("w").as("v")).agg(count(lit(1)).as("d"))
    // adaptive cap: floored exact percentile of the degree distribution —
    // one 1-row agg over the node-scale deg table (metadata, not data),
    // reusing the checkpointed edge list the main plan reads anyway
    val cap = degPercentileCap.map { p =>
      val r = deg.agg(floor(expr(s"percentile(d, $p)")).as("c")).collect()(0)
      if (r.isNullAt(0)) Int.MaxValue // no edges: nothing to cap
      else math.min(r.getLong(0), Int.MaxValue.toLong).toInt
    }.getOrElse(maxDegree)
    val centers =
      if (cap == Int.MaxValue) adj
      else adj
        .withColumn("_d", count(lit(1)).over(Window.partitionBy("w")))
        .filter(col("_d") <= cap)
        .drop("_d")
    val cApp = centers.localCheckpoint() // self-join reads it twice
    val cn = cApp.join(cApp.withColumnRenamed("u", "v"), Seq("w"))
      .filter(col("u") < col("v"))
      .groupBy(col("u").as("src"), col("v").as("dst"))
      .agg(count(lit(1)).as("cn"))
    cn.join(e0.select(col("a").as("src"), col("b").as("dst")),
        Seq("src", "dst"), "left_anti")
      .join(deg.select(col("v").as("src"), col("d").as("ds")), Seq("src"))
      .join(deg.select(col("v").as("dst"), col("d").as("dd")), Seq("dst"))
      .select(col("src"), col("dst"), col("cn"),
        (col("ds") * col("dd")).as("pa"))
      .orderBy(col("cn").desc, col("pa").desc, col("src"), col("dst"))
      .limit(topN)
  }

  /** [[linkPredict]] with a SCALE-ADAPTIVE center cap: `maxDegree` is the
    * floored exact `degPercentile` of the degree distribution, so the cap
    * binds at every data scale (a fixed constant is a no-op below the SF it
    * was tuned at and degenerate above it). The percentile runs as one
    * 1-row aggregate over the node-scale degree table (metadata-scale
    * collect — the codebook-training pattern, not a data collect), and
    * both Spark's `percentile` and the oracle's `quantile_cont` compute
    * the same rank-(p·(n−1)) linear interpolation over integers with
    * exactly-representable factors, so the cap replays cross-engine
    * bit-for-bit. Σ_w deg(w)² over kept centers is bounded by
    * n·cap² — the declared contract for the dense-graph case where every
    * node is a "celebrity" and an absolute hub cap has nothing to cut.
    * Capped centers still appear as endpoints and `pa` still prices FULL
    * degrees; see [[linkPredict]] for the visibility trade. */
  def linkPredictAdaptiveCap(edges: DataFrame, topN: Int = 100,
                             degPercentile: Double = 0.25): DataFrame =
    linkPredict(edges, topN, degPercentileCap = Some(degPercentile))

  /** Synchronous LABEL PROPAGATION at a PINNED round count — community
    * detection, the topical-grouping signal over a corpus graph (docs
    * sharing vocabulary, pages sharing links). l₀(v) = v; each round every
    * node simultaneously takes the label most frequent among its
    * neighbors, ties broken to the SMALLEST label — a total order, so the
    * whole run is deterministic at any parallelism (async/randomized LPA,
    * the usual formulation, is not). Rounds are PINNED, not run to
    * fixpoint, for the same reason [[kCore]]'s are: an oracle unrolling
    * the identical rounds computes the identical function, and sync LPA
    * on bipartite graphs can oscillate rather than converge — pinning
    * makes the output well-defined regardless.
    *
    * Per round: one equi-join of the symmetrized edge list onto labels +
    * one (node, label) hash-agg + one row_number window on node — linear
    * in |E|, labels localCheckpoint'ed so plans don't grow with rounds
    * (the [[pageRank]] lineage contract; final round's blocks are the
    * caller's to release).
    *
    * @param edges (src, dst), any orderable node type, either direction;
    *              self-loops and duplicates dropped (set semantics)
    * @param rounds pinned synchronous update count
    * @return (node, community) for every node appearing in `edges`
    */
  def labelPropagation(edges: DataFrame, rounds: Int,
                       driverFastPathEdges: Long = 1000000L): DataFrame = {
    val e0 = edges.select(col("src").as("a"), col("dst").as("b"))
      .filter(col("a") =!= col("b"))
    val und = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()

    // Adaptive driver fast path (the [[pageRank]] contract, extended r15):
    // the synchronous update + (count DESC, label ASC) tie-break is a pure
    // function of the undirected edge set, reproduced exactly — label
    // comparison through [[driverOrdering]] so the ASC tie-break matches
    // Spark's binary string collation, else fall through to the rounds.
    val vt = und.schema.fields(0).dataType
    val ordOpt = if (und.schema.fields(1).dataType == vt)
      driverOrdering(vt) else None
    if (driverFastPathEdges > 0 && ordOpt.isDefined &&
        und.count() <= driverFastPathEdges) {
      implicit val ord: Ordering[Any] = ordOpt.get
      val es = und.collect().map(r => (r.get(0), r.get(1)))
      val nbrs = es.groupBy(_._1).map { case (a, ps) => a -> ps.map(_._2) }
      var lbl: Map[Any, Any] = nbrs.keysIterator.map(v => v -> v).toMap
      for (_ <- 1 to rounds) {
        lbl = nbrs.map { case (a, ns) =>
          val counts = scala.collection.mutable.Map[Any, Long]()
            .withDefaultValue(0L)
          ns.foreach(b => counts(lbl(b)) += 1)
          // (n DESC, lbl ASC): max count, smallest label among the tied
          a -> counts.toSeq.minBy { case (l, n) => (-n, l) }._1
        }
      }
      val spark = edges.sparkSession
      und.unpersist()
      import scala.jdk.CollectionConverters._
      return spark.createDataFrame(
        lbl.toSeq.map { case (v, l) =>
          org.apache.spark.sql.Row(v, l) }.asJava,
        StructType(Seq(
          StructField("node", vt), StructField("community", vt))))
    }
    var lbl = und.select(col("a").as("node")).distinct()
      .withColumn("lbl", col("node")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val counts = und.join(lbl.select(col("node").as("b"), col("lbl")), Seq("b"))
        .groupBy(col("a"), col("lbl")).agg(count(lit(1)).as("n"))
      // (a, lbl) is distinct after the agg, so (n desc, lbl asc) is a
      // total order within each node — row_number is deterministic
      val byNode = Window.partitionBy("a").orderBy(col("n").desc, col("lbl").asc)
      val next = counts.withColumn("rn", row_number().over(byNode))
        .filter(col("rn") === 1)
        .select(col("a").as("node"), col("lbl"))
        .localCheckpoint()
      val old = lbl
      lbl = next
      old.unpersist()
    }
    und.unpersist()
    lbl.select(col("node"), col("lbl").as("community"))
  }

  /** PERSONALIZED PageRank — the same integer-scaled recurrence as
    * [[pageRank]] but with ALL teleport mass directed at `seeds`:
    * r₀(v) = S/|seeds| for seeds else 0;
    * rₜ₊₁(v) = [v ∈ seeds]·⌊0.15·S/|seeds|⌋ + Σ_{u→v} ⌊0.85·rₜ(u)/deg(u)⌋.
    * Ranks measure proximity to the seed set — the "related documents /
    * similar items" walk. All arithmetic in truncating BIGINT, so the
    * run is bit-identical across engines and partition orders (the
    * oracle replays it as unrolled CTEs). Same per-round cost, adaptive
    * driver fast path, and caller-owns-final-blocks contract as
    * [[pageRank]]. Seeds absent from the graph contribute nothing
    * (their teleport share is simply lost — the standard restart-vector
    * restriction to the visible graph).
    */
  def personalizedPageRank(edges: DataFrame, seeds: Seq[Long],
                           iterations: Int = 5,
                           scale: Long = 1000000000L,
                           driverFastPathEdges: Long = 1000000L): DataFrame = {
    require(seeds.nonEmpty, "personalizedPageRank needs at least one seed")
    val spark = edges.sparkSession
    import spark.implicits._
    val seedIds = seeds.distinct.sorted
    val r0seed = scale / seedIds.length
    val teleport = (15L * scale) / (100L * seedIds.length)
    val e = edges.select(col("src").cast(LongType), col("dst").cast(LongType))
      .localCheckpoint()

    if (driverFastPathEdges > 0 && e.count() <= driverFastPathEdges) {
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      val ns = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
      val isSeed = seedIds.toSet
      val deg = es.groupBy(_._1).map { case (u, out) => u -> out.length.toLong }
      var r = ns.map(v => v -> (if (isSeed(v)) r0seed else 0L)).toMap
      for (_ <- 1 to iterations) {
        val rc = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        es.foreach { case (u, v) => rc(v) += (85L * r(u)) / (100L * deg(u)) }
        r = ns.map(v => v -> ((if (isSeed(v)) teleport else 0L) + rc(v))).toMap
      }
      e.unpersist()
      return ns.map(v => (v, r(v))).toSeq.toDF("node", "r")
    }

    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val seedTeleport =
      when(col("node").isInCollection(seedIds), lit(teleport)).otherwise(lit(0L))
    var rank = nodes.withColumn("r",
      when(col("node").isInCollection(seedIds), lit(r0seed)).otherwise(lit(0L)))
    for (it <- 1 to iterations) {
      val contrib = e.join(rank, e("src") === rank("node"))
        .join(deg, "src")
        .select(col("dst").as("node"),
          expr("(85 * r) div (100 * deg)").as("c"))
      val next = contrib.groupBy("node").agg(sum("c").as("rc"))
        .join(nodes, Seq("node"), "right")
        .na.fill(0L, Seq("rc"))
        .select(col("node"), (seedTeleport + col("rc")).as("r"))
        .localCheckpoint()
      if (it > 1) rank.unpersist()
      rank = next
    }
    e.unpersist()
    nodes.unpersist()
    rank
  }

  /** Single-source SHORTEST PATHS by pinned-round Bellman–Ford relaxation
    * over non-negative INTEGER edge weights — "how far is every item from
    * this seed?", the proximity measure recommendation and graph-curation
    * pipelines price in hops·cost rather than PageRank mass. Per round,
    * every edge relaxes simultaneously:
    * dₖ₊₁(v) = min(dₖ(v), min_{u→v}(dₖ(u) + w(u,v))) — min is order-free
    * and + exact over BIGINT, so the whole run is bit-identical across
    * engines and partitionings and the oracle replays it as unrolled CTEs
    * (after `rounds` rounds both engines have computed the same
    * well-defined function: cheapest path using ≤ rounds edges — whether
    * or not the fixpoint arrived, the [[kCore]] pinning contract).
    *
    * Per round: one edge equi-join onto the current frontier + one
    * union + one min hash-agg — linear in |E|, lineage cut per round
    * ([[pageRank]]'s localCheckpoint contract; final blocks are the
    * caller's). Same adaptive driver fast path as [[pageRank]].
    *
    * @param edges (src, dst, w) directed weighted edges, w ≥ 0 integer
    * @return (node, dist) for nodes reachable within `rounds` edges;
    *         unreachable nodes are absent (their distance is +∞)
    */
  def shortestPaths(edges: DataFrame, source: Long, rounds: Int,
                    driverFastPathEdges: Long = 1000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast(LongType), col("dst").cast(LongType),
        col("w").cast(LongType))
      .localCheckpoint()

    if (driverFastPathEdges > 0 && e.count() <= driverFastPathEdges) {
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      var d = Map(source -> 0L)
      for (_ <- 1 to rounds) {
        val upd = scala.collection.mutable.Map[Long, Long]() ++ d
        es.foreach { case (u, v, w) =>
          d.get(u).foreach { du =>
            if (!upd.get(v).exists(_ <= du + w)) upd(v) = du + w
          }
        }
        d = upd.toMap
      }
      e.unpersist()
      return d.toSeq.toDF("node", "dist")
    }

    var dist = Seq((source, 0L)).toDF("node", "dist").localCheckpoint()
    for (it <- 1 to rounds) {
      val relaxed = e.join(dist, e("src") === dist("node"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      val next = dist.union(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint()
      dist.unpersist()
      dist = next
    }
    e.unpersist()
    dist
  }

  /** Label every row of `docs` with its cluster from a (id, component)
    * frame: unlabeled rows become singleton clusters of themselves; sizes
    * attached. Shared tail of [[dedupClusters]] and the streaming
    * incremental path. Output: (idCol, cluster_id, cluster_size). */
  def labelWithClusters(docs: DataFrame, idCol: String,
                        componentLabels: DataFrame): DataFrame = {
    // rename label columns before the join so an idCol literally named
    // "id" can't collide
    val labels = componentLabels
      .select(col("id").as("__cc_id"), col("component").as("__cc_comp"))
    val withLbl = docs.select(col(idCol))
      .join(labels, col(idCol) === col("__cc_id"), "left")
      .select(col(idCol),
        coalesce(col("__cc_comp"), col(idCol).cast(LongType)).as("cluster_id"))
    // sizes via one window over cluster_id — a single exchange where the
    // groupBy-then-rejoin shape costs two
    withLbl
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("cluster_id")))
      .select(col(idCol), col("cluster_id"), col("cluster_size"))
  }

  /** Dedup clustering: pairs → transitive clusters over ALL rows of `docs`.
    * Rows never appearing in a pair are singleton clusters of themselves.
    * Output: (idCol, cluster_id = min id in cluster, cluster_size). */
  def dedupClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
                    idA: String = "id_a", idB: String = "id_b"): DataFrame =
    labelWithClusters(docs, idCol, connectedComponents(
      pairs.select(col(idA).as("src"), col(idB).as("dst"))))
}
