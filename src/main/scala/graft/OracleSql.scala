package graft

/** DuckDB oracle SQL for every ANSI-expressible key in [[Queries]].
  *
  * Every statement mirrors its Spark twin exactly: same column aliases, same
  * final ORDER BY (ending on a unique key, NULLS FIRST pinned on nullable
  * sort keys), same DECIMAL(25,6) accumulation for double sums, and
  * `CAST(ts AS TIMESTAMP)` wherever events.ts appears (DuckDB reads the
  * parquet TIMESTAMP(NANOS) natively; the cast truncates to µs exactly like
  * the Spark-side `ts div 1000`).
  */
object OracleSql {

  /** decimal-exact sum rendered to double. */
  private def dsum(x: String) = s"CAST(SUM(CAST($x AS DECIMAL(25,6))) AS DOUBLE)"

  /** Gaps-and-islands sessionization — shared by q_session_window and its
    * streaming twin q_stream_session.
    * <= not <: Spark's session_window MERGES an event arriving exactly
    * gap after the previous one (verified empirically on 4.1.2). */
  private val sessionWindowSql =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
      |s AS (SELECT *, CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE
      |        THEN 0 ELSE 1 END AS is_new
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |g AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS grp FROM s)
      |SELECT MIN(ts) AS session_start, MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      |  user_id, COUNT(*) AS n_events
      |FROM g GROUP BY user_id, grp ORDER BY user_id, session_start""".stripMargin

  /** Exact token heavy hitters (freq > n/200) — shared by
    * q_agg_heavy_hitters and its streaming-maintenance twin. */
  private val heavyHittersSql =
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      |t AS (SELECT COUNT(*) AS n_total FROM w WHERE word <> '')
      |SELECT word, COUNT(*) AS n FROM w, t WHERE word <> ''
      |GROUP BY word, t.n_total HAVING COUNT(*) > t.n_total / 200.0
      |ORDER BY word""".stripMargin

  /** SCD2 validity intervals from per-user event_type changes — shared by
    * q_scd2_history and its streaming-maintenance twin q_stream_scd2. */
  private val scd2Sql =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |             CAST(ts AS TIMESTAMP) AS ts FROM events),
      |c AS (SELECT *, LAG(event_type) OVER w AS prev FROM e
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |ch AS (SELECT user_id, event_id, event_type, ts FROM c
      |       WHERE prev IS DISTINCT FROM event_type),
      |s AS (SELECT user_id, event_id, event_type, ts AS valid_from,
      |        LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |          AS valid_to
      |      FROM ch)
      |SELECT user_id, event_id, event_type, valid_from, valid_to,
      |  valid_to IS NULL AS is_current
      |FROM s ORDER BY user_id, valid_from, event_id""".stripMargin

  /** Unrolled k-core peeling (mirrors [[graft.operators.GraphOps.kCore]]
    * at the declared pinned depth): `rounds` nested degree/keep/filter
    * CTE triplets over the doc↔word bipartite edge set. Both engines run
    * exactly the same number of peels, so the answers agree whether or
    * not the fixpoint arrived early. */
  private def kcoreSql(k: Int, rounds: Int): String = {
    // every CTE MATERIALIZED: each round references the previous one 3×,
    // so default inlining expands e_rounds into 3^rounds copies of the
    // parquet scan ("Too many open files" — observed)
    val head =
      """WITH e0 AS MATERIALIZED (SELECT DISTINCT concat('d', doc_id) AS src,
        |    concat('w', word) AS dst
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text),
        |          '[a-z]+')) AS word FROM documents)
        |  WHERE word <> '')""".stripMargin
    val steps = (0 until rounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT v, COUNT(*) AS deg FROM (
         |    SELECT src AS v FROM e$i UNION ALL SELECT dst AS v FROM e$i)
         |  GROUP BY v),
         |k$i AS MATERIALIZED (SELECT v FROM d$i WHERE deg >= $k),
         |e${i + 1} AS MATERIALIZED (SELECT e.src, e.dst FROM e$i e
         |  JOIN k$i ka ON ka.v = e.src JOIN k$i kb ON kb.v = e.dst)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps
       |SELECT v, COUNT(*) AS deg FROM (
       |  SELECT src AS v FROM e$rounds UNION ALL SELECT dst AS v FROM e$rounds)
       |GROUP BY v ORDER BY v""".stripMargin
  }

  /** Unrolled synchronous label propagation (mirrors
    * [[graft.operators.GraphOps.labelPropagation]] at the declared pinned
    * depth) over the same doc↔word bipartite edge set as [[kcoreSql]]:
    * per round, each node takes the most frequent neighbor label, ties to
    * the smallest — ROW_NUMBER over the identical (n DESC, lbl ASC) total
    * order. MATERIALIZED for the same inlining reason as kcore. */
  private def lpaSql(rounds: Int): String = {
    val head =
      """WITH e0 AS (SELECT DISTINCT concat('d', doc_id) AS src,
        |    concat('w', word) AS dst
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text),
        |          '[a-z]+')) AS word FROM documents)
        |  WHERE word <> ''),
        |und AS MATERIALIZED (SELECT src AS a, dst AS b FROM e0
        |  UNION SELECT dst, src FROM e0),
        |l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lbl FROM und)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""c$i AS (SELECT u.a, l.lbl, COUNT(*) AS n FROM und u
         |  JOIN l${i - 1} l ON u.b = l.node GROUP BY u.a, l.lbl),
         |l$i AS MATERIALIZED (SELECT a AS node, lbl FROM (
         |    SELECT a, lbl, ROW_NUMBER() OVER (PARTITION BY a
         |      ORDER BY n DESC, lbl) AS rn FROM c$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps
       |SELECT node, lbl AS community FROM l$rounds ORDER BY node""".stripMargin
  }

  /** Unrolled personalized PageRank (mirrors
    * [[graft.operators.GraphOps.personalizedPageRank]]): the [[pagerankSql]]
    * graph and recurrence, but r0 and the teleport term go to `seeds`
    * only. */
  private def pprSql(iters: Int, seeds: Seq[Long]): String = {
    val s = seeds.distinct.sorted
    val inSeeds = s"node IN (${s.mkString(", ")})"
    val n = s.length
    val head =
      s"""WITH e0 AS (SELECT DISTINCT l_partkey % 100 AS src,
         |    100 + l_suppkey % 100 AS dst FROM lineitem),
         |e AS (SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
         |nodes AS (SELECT DISTINCT src AS node FROM
         |  (SELECT src FROM e UNION ALL SELECT dst FROM e)),
         |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
         |r0 AS (SELECT node, CAST(CASE WHEN $inSeeds
         |    THEN 1000000000 // $n ELSE 0 END AS BIGINT) AS r FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""c$k AS (SELECT e.dst AS node, SUM((85 * r.r) // (100 * d.deg)) AS rc
         |  FROM e JOIN r${k - 1} r ON e.src = r.node JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst),
         |r$k AS (SELECT nodes.node,
         |    CAST(CASE WHEN nodes.$inSeeds THEN 15000000000 // (100 * $n)
         |      ELSE 0 END + COALESCE(c$k.rc, 0) AS BIGINT) AS r
         |  FROM nodes LEFT JOIN c$k ON c$k.node = nodes.node)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"\nSELECT node, r FROM r$iters ORDER BY node"
  }

  /** Unrolled HITS (mirrors [[graft.operators.GraphOps.hits]]): the
    * DIRECTED part→supplier edge set (pagerankSql's graph before
    * symmetrization), per round aᵣ = Σ incoming h then a = aᵣ·S ÷ max aᵣ
    * (truncating BIGINT — non-negative operands so DuckDB // matches
    * Spark div), symmetrically h from a. */
  private def hitsSql(iters: Int, scale: Long): String = {
    val head =
      s"""WITH e AS (SELECT DISTINCT l_partkey % 100 AS src,
         |    100 + l_suppkey % 100 AS dst FROM lineitem),
         |nodes AS (SELECT DISTINCT src AS node FROM
         |  (SELECT src FROM e UNION ALL SELECT dst AS src FROM e)),
         |h0 AS (SELECT node, CAST($scale AS BIGINT) AS h FROM nodes)""".stripMargin
    // every per-round CTE is referenced twice (join + scalar MAX) —
    // MATERIALIZED or DuckDB's default inlining goes exponential in
    // rounds (the kcoreSql lesson)
    val rounds = (1 to iters).map { k =>
      s"""ar$k AS MATERIALIZED (SELECT e.dst AS node, CAST(SUM(h.h) AS BIGINT) AS r
         |  FROM e JOIN h${k - 1} h ON e.src = h.node GROUP BY e.dst),
         |a$k AS MATERIALIZED (SELECT nodes.node,
         |    CAST((COALESCE(ar$k.r, 0) * $scale) // (SELECT MAX(r) FROM ar$k) AS BIGINT) AS a
         |  FROM nodes LEFT JOIN ar$k ON ar$k.node = nodes.node),
         |hr$k AS MATERIALIZED (SELECT e.src AS node, CAST(SUM(a.a) AS BIGINT) AS r
         |  FROM e JOIN a$k a ON e.dst = a.node GROUP BY e.src),
         |h$k AS MATERIALIZED (SELECT nodes.node,
         |    CAST((COALESCE(hr$k.r, 0) * $scale) // (SELECT MAX(r) FROM hr$k) AS BIGINT) AS h
         |  FROM nodes LEFT JOIN hr$k ON hr$k.node = nodes.node)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"""
         |SELECT h$iters.node, h$iters.h AS hub, a$iters.a AS auth
         |FROM h$iters JOIN a$iters ON a$iters.node = h$iters.node
         |ORDER BY h$iters.node""".stripMargin
  }

  /** Mirrors [[graft.operators.GraphOps.linkPredictAdaptiveCap]]: the cap
    * is the floored exact p25 of the degree distribution (quantile_cont ==
    * Spark percentile: rank p·(n−1) linear interpolation over integers,
    * exactly-representable factors), wedge centers above it generate no
    * wedges, `pa` still prices FULL degrees. */
  private val linkPredictCappedSql =
    """WITH po AS (SELECT DISTINCT l_orderkey AS o, l_partkey % 1000 AS p
      |    FROM lineitem WHERE l_linenumber <= 2),
      |e AS (SELECT DISTINCT x.p AS a, y.p AS b FROM po x JOIN po y
      |    ON x.o = y.o AND x.p < y.p),
      |adj AS (SELECT a AS w, b AS u FROM e
      |    UNION ALL SELECT b AS w, a AS u FROM e),
      |deg AS (SELECT w AS v, COUNT(*) AS d FROM adj GROUP BY w),
      |cap AS (SELECT CAST(FLOOR(quantile_cont(d, 0.25)) AS BIGINT) AS c
      |    FROM deg),
      |cadj AS (SELECT adj.w, adj.u FROM adj
      |    JOIN deg ON deg.v = adj.w, cap WHERE deg.d <= cap.c),
      |cn AS (SELECT x.u AS src, y.u AS dst, COUNT(*) AS cn
      |    FROM cadj x JOIN cadj y ON x.w = y.w AND x.u < y.u GROUP BY 1, 2),
      |ne AS (SELECT cn.src, cn.dst, cn.cn FROM cn LEFT JOIN e
      |    ON e.a = cn.src AND e.b = cn.dst WHERE e.a IS NULL)
      |SELECT ne.src, ne.dst, ne.cn, da.d * db.d AS pa
      |FROM ne JOIN deg da ON da.v = ne.src JOIN deg db ON db.v = ne.dst
      |ORDER BY ne.cn DESC, pa DESC, ne.src, ne.dst
      |LIMIT 50""".stripMargin

  /** Unrolled Bellman–Ford (mirrors
    * [[graft.operators.GraphOps.shortestPaths]] at the declared pinned
    * depth) over the min-quantity-weighted symmetrized part↔supplier
    * graph: per round every edge relaxes simultaneously —
    * dₖ₊₁ = min(dₖ, min over incoming dₖ(u)+w). Integer min/+ only. */
  private def ssspSql(source: Long, rounds: Int): String = {
    val head =
      s"""WITH e0 AS (SELECT l_partkey % 100 AS src,
         |    100 + l_suppkey % 100 AS dst,
         |    CAST(MIN(l_quantity) AS BIGINT) AS w
         |  FROM lineitem GROUP BY 1, 2),
         |e AS MATERIALIZED (SELECT src, dst, MIN(w) AS w FROM
         |  (SELECT src, dst, w FROM e0
         |   UNION ALL SELECT dst, src, w FROM e0) GROUP BY 1, 2),
         |d0(node, dist) AS (VALUES ($source, CAST(0 AS BIGINT)))""".stripMargin
    val steps = (1 to rounds).map { k =>
      s"""d$k AS MATERIALIZED (SELECT node, MIN(dist) AS dist FROM (
         |    SELECT node, dist FROM d${k - 1}
         |    UNION ALL
         |    SELECT e.dst AS node, d.dist + e.w AS dist
         |    FROM e JOIN d${k - 1} d ON e.src = d.node) GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps
       |SELECT node, CAST(dist AS BIGINT) AS dist FROM d$rounds
       |ORDER BY node""".stripMargin
  }

  /** Mirrors [[graft.Queries.qJoinFuzzy]]: the dirty reference list is
    * every distinct p_name with its 3rd character dropped (substr is
    * 1-based in both engines), blocked on the name's 2nd word,
    * levenshtein exact-integer in both engines. */
  private val fuzzyJoinSql =
    """WITH p AS (SELECT p_partkey, p_name,
      |    split_part(p_name, ' ', 2) AS blk FROM part),
      |d AS (SELECT DISTINCT
      |    substr(p_name, 1, 2) || substr(p_name, 4) AS query,
      |    split_part(p_name, ' ', 2) AS blk
      |  FROM (SELECT DISTINCT p_name FROM part))
      |SELECT d.query, p.p_partkey, p.p_name,
      |  levenshtein(d.query, p.p_name) AS dist
      |FROM d JOIN p USING (blk)
      |WHERE levenshtein(d.query, p.p_name) <= 2
      |ORDER BY d.query, p.p_partkey""".stripMargin

  /** The fixed-point dot product as a DuckDB snippet — the SQL twin of
    * [[graft.operators.VectorOps.dotFixed]] (each double product floored
    * onto the 1e-13 grid, summed as BIGINT). */
  private def dotSql(a: String, b: String): String =
    s"""(CAST(list_sum(list_transform(list_zip($a, $b),
       |      p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13)""".stripMargin

  /** Unrolled greedy MMR (mirrors [[graft.operators.VectorOps.mmrRerank]]):
    * pool = top-`pool` per query on the integer 1e6 cosine grid, pick 1 =
    * relevance argmax, each later pick maximizes wRel·rel6 − wDiv·max sim6
    * to the already-selected set — (score DESC, cand ASC) is a total order
    * so both engines replay the identical selection. */
  /** `side` (every vector + fixed-grid norm) and `q` (the vec_id < 5
    * query set) CTEs — ONE definition shared by [[mmrSql]] and
    * [[hybridMmrOracle]], mirroring the engine's shared mmrQueryNorms/
    * withCandNorm (a one-sided edit must be impossible — r18 review). */
  private def mmrNormCtes: String =
    s"""side AS (SELECT vec_id, embedding AS v,
       |    SQRT(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn
       |  FROM side WHERE vec_id < 5)""".stripMargin

  private def mmrSql(pool: Int, k: Int, wRel: Long, wDiv: Long): String =
    s"""WITH $mmrNormCtes,
       |rel0 AS (SELECT q.query_id, s.vec_id AS cand, s.v AS cv, s.nrm AS cn,
       |    CAST(ROUND(${dotSql("q.qv", "s.v")} / (q.qn * s.nrm) * 1000000)
       |      AS BIGINT) AS rel6
       |  FROM q, side s WHERE s.vec_id <> q.query_id),
       |rel AS MATERIALIZED (SELECT query_id, cand, cv, cn, rel6 FROM (
       |    SELECT rel0.*, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY rel6 DESC, cand) AS rn FROM rel0)
       |  WHERE rn <= $pool),
       |${mmrGreedyCtes(k, wRel, wDiv)}
       |${mmrFinalSelect(k)}""".stripMargin

  /** The unrolled greedy rounds over a materialized
    * `rel(query_id, cand, cv, cn, rel6)` CTE — ONE definition shared by
    * [[mmrSql]] (own relevance pool) and the hybrid→MMR composition
    * ([[hybridMmrOracle]]), mirroring the engine's shared
    * `VectorOps.mmrGreedy`. Pairwise sims are named `psims` (the
    * composed oracle's IVF prefix already owns `sims`). */
  private def mmrGreedyCtes(k: Int, wRel: Long, wDiv: Long): String = {
    val head =
      s"""psims AS MATERIALIZED (SELECT x.query_id, x.cand AS c1, y.cand AS c2,
         |    CAST(ROUND(${dotSql("x.cv", "y.cv")} / (x.cn * y.cn) * 1000000)
         |      AS BIGINT) AS sim6
         |  FROM rel x JOIN rel y
         |    ON x.query_id = y.query_id AND x.cand <> y.cand),
         |sel1 AS MATERIALIZED (SELECT query_id, cand, 1 AS pick, rel6 FROM (
         |    SELECT query_id, cand, rel6, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY rel6 DESC, cand) AS rn FROM rel)
         |  WHERE rn = 1)""".stripMargin
    val steps = (2 to k).map { j =>
      s"""m$j AS (SELECT s.query_id, s.c1 AS cand, MAX(s.sim6) AS ms
         |  FROM psims s JOIN sel${j - 1} p
         |    ON p.query_id = s.query_id AND p.cand = s.c2
         |  GROUP BY 1, 2),
         |n$j AS (SELECT query_id, cand, $j AS pick, rel6 FROM (
         |    SELECT rr.query_id, rr.cand, rr.rel6, ROW_NUMBER() OVER (
         |        PARTITION BY rr.query_id
         |        ORDER BY $wRel * rr.rel6 - $wDiv * m.ms DESC, rr.cand) AS rn
         |    FROM rel rr
         |    JOIN m$j m ON m.query_id = rr.query_id AND m.cand = rr.cand
         |    LEFT JOIN sel${j - 1} p
         |      ON p.query_id = rr.query_id AND p.cand = rr.cand
         |    WHERE p.cand IS NULL)
         |  WHERE rn = 1),
         |sel$j AS MATERIALIZED (SELECT * FROM sel${j - 1}
         |  UNION ALL SELECT * FROM n$j)""".stripMargin
    }.mkString(",\n")
    head + ",\n" + steps
  }

  private def mmrFinalSelect(k: Int): String =
    s"""SELECT query_id, cand AS neighbor_id, pick, rel6 FROM sel$k
       |ORDER BY query_id, pick""".stripMargin

  /** Per-group OLS trend: exact integer sufficient statistics (HUGEINT
    * product sums mirror Spark's DECIMAL(38) accumulators), one shared
    * IEEE finishing tree, scale-0 rounds. Shared by q_trend_ols and its
    * streaming twin q_stream_trend (mergeable moments — fold-then-finish
    * equals one-shot by associativity of +). */
  private val trendOlsSql =
    """WITH b AS (SELECT event_type,
      |    (epoch_us(CAST(ts AS TIMESTAMP)) - 1577836800000000) // 1000000 AS xs,
      |    CAST(ROUND(value * 1e6) AS BIGINT) AS ym FROM events),
      |g AS (SELECT event_type, COUNT(*) AS n, SUM(xs) AS sx, SUM(ym) AS sy,
      |    SUM(xs * ym) AS sxy, SUM(xs * xs) AS sxx FROM b GROUP BY 1)
      |SELECT event_type, n,
      |  CAST(ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * 86400.0) AS BIGINT) AS slope_uv_day,
      |  CAST(ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
      |      - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT)
      |    AS intercept_uv
      |FROM g ORDER BY event_type""".stripMargin

  /** Unrolled farthest-first k-center (mirrors
    * [[graft.operators.VectorOps.kCenterSelect]]): seed = MIN(id), each
    * later round takes the candidate whose max similarity to the selected
    * set is smallest — (maxsim ASC, cand ASC) is a total order on the
    * integer grid, so both engines replay the identical traversal. */
  private def kcenterSql(k: Int): String = {
    val head =
      s"""WITH pool AS (SELECT vec_id AS cand, embedding AS cv,
         |    SQRT(${dotSql("embedding", "embedding")}) AS cn
         |  FROM embeddings WHERE vec_id % 8 = 0),
         |sims AS MATERIALIZED (SELECT x.cand AS c1, y.cand AS c2,
         |    CAST(ROUND(${dotSql("x.cv", "y.cv")} / (x.cn * y.cn) * 1000000)
         |      AS BIGINT) AS sim6
         |  FROM pool x JOIN pool y ON x.cand <> y.cand),
         |sel1 AS MATERIALIZED (SELECT MIN(cand) AS cand, 1 AS pick,
         |    CAST(1000000 AS BIGINT) AS maxsim6 FROM pool)""".stripMargin
    val steps = (2 to k).map { j =>
      s"""m$j AS (SELECT s.c1 AS cand, MAX(s.sim6) AS maxsim6 FROM sims s
         |  JOIN sel${j - 1} p ON p.cand = s.c2 GROUP BY 1),
         |n$j AS (SELECT cand, $j AS pick, maxsim6 FROM (
         |    SELECT m.cand, m.maxsim6, ROW_NUMBER() OVER (
         |        ORDER BY m.maxsim6 ASC, m.cand ASC) AS rn
         |    FROM m$j m LEFT JOIN sel${j - 1} p ON p.cand = m.cand
         |    WHERE p.cand IS NULL) WHERE rn = 1),
         |sel$j AS MATERIALIZED (SELECT * FROM sel${j - 1}
         |  UNION ALL SELECT * FROM n$j)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps
       |SELECT cand AS center_id, pick, maxsim6 FROM sel$k ORDER BY pick""".stripMargin
  }

  /** Mirrors [[graft.operators.StatsOps.ksStatistic]] (weekday vs weekend
    * per event_type): integer cross-multiplied ECDFs on the ⌊value·10³⌋
    * grid; isodow (6,7) ⇔ Spark dayofweek (1,7) under the UTC session;
    * non-negative // matches Spark div. */
  private val ksDriftSql =
    """WITH base AS (SELECT event_type,
      |    CAST(FLOOR(value * 1000.0) AS BIGINT) AS v,
      |    CASE WHEN isodow(CAST(ts AS TIMESTAMP)) IN (6, 7)
      |      THEN 1 ELSE 0 END AS s
      |  FROM events),
      |counts AS (SELECT event_type, v,
      |    SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS na,
      |    SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS nb
      |  FROM base GROUP BY 1, 2),
      |cum AS (SELECT event_type, v,
      |    CAST(SUM(na) OVER w AS BIGINT) AS ca,
      |    CAST(SUM(nb) OVER w AS BIGINT) AS cb
      |  FROM counts WINDOW w AS (PARTITION BY event_type ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |tot AS (SELECT event_type, MAX(ca) AS ta, MAX(cb) AS tb
      |  FROM cum GROUP BY 1)
      |SELECT c.event_type, t.ta AS n_a, t.tb AS n_b,
      |  CAST(MAX(ABS(c.ca * t.tb - c.cb * t.ta)) AS BIGINT) AS ks_num,
      |  CASE WHEN t.ta > 0 AND t.tb > 0 THEN
      |    CAST(MAX(ABS((c.ca * 1000000) // t.ta - (c.cb * 1000000) // t.tb))
      |      AS BIGINT)
      |  ELSE CAST(1000000 AS BIGINT) END AS ks_ppm
      |FROM cum c JOIN tot t USING (event_type)
      |GROUP BY c.event_type, t.ta, t.tb
      |ORDER BY c.event_type""".stripMargin

  /** Mirrors [[graft.operators.StatsOps.tvDistance]] (lang mix per source,
    * even vs odd doc_ids): Σ per-category cross-multiplied numerators;
    * ppm floors each probability before the sum, ÷2 at the end. */
  private val tvDriftSql =
    """WITH base AS (SELECT source, lang AS v,
      |    CAST(doc_id % 2 AS BIGINT) AS s FROM documents),
      |counts AS (SELECT source, v,
      |    SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS oa,
      |    SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS ob
      |  FROM base GROUP BY 1, 2),
      |tot AS (SELECT source, CAST(SUM(oa) AS BIGINT) AS ta,
      |    CAST(SUM(ob) AS BIGINT) AS tb FROM counts GROUP BY 1)
      |SELECT c.source, t.ta AS n_a, t.tb AS n_b,
      |  CAST(SUM(ABS(c.oa * t.tb - c.ob * t.ta)) AS BIGINT) AS tv_num,
      |  CASE WHEN t.ta > 0 AND t.tb > 0 THEN
      |    CAST(SUM(ABS((c.oa * 1000000) // t.ta - (c.ob * 1000000) // t.tb))
      |      // 2 AS BIGINT)
      |  ELSE CAST(1000000 AS BIGINT) END AS tv_ppm
      |FROM counts c JOIN tot t USING (source)
      |GROUP BY c.source, t.ta, t.tb
      |ORDER BY c.source""".stripMargin

  /** Generated mixture-epochs replay: the SAME rate literals as
    * [[graft.Queries.mixtureRates]] (the projectionSigns sharing pattern);
    * ROW_NUMBER over (md5, id) within group ≡ the Spark side's two-pass
    * bucket-offset position, and unnest(generate_series) is the lateral
    * explode (k = 0 yields an empty list, matching the filtered
    * sequence()). */
  private def mixtureEpochsSql(rates: Seq[(String, Long, Long)]): String = {
    val vals = rates.map { case (g, n, dn) => s"('$g', $n, $dn)" }
      .mkString(", ")
    s"""WITH r(lang, num, den) AS (VALUES $vals),
       |base AS (SELECT doc_id, lang,
       |    md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
       |pos AS (SELECT doc_id, lang,
       |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) - 1 AS p
       |  FROM base),
       |rep AS (SELECT pos.doc_id, pos.lang,
       |    ((p + 1) * COALESCE(r.num, 1)) // COALESCE(r.den, 1)
       |      - (p * COALESCE(r.num, 1)) // COALESCE(r.den, 1) AS k
       |  FROM pos LEFT JOIN r USING (lang))
       |SELECT doc_id, lang,
       |  CAST(unnest(generate_series(1, CAST(k AS BIGINT))) AS BIGINT)
       |    AS replica
       |FROM rep
       |ORDER BY doc_id, replica""".stripMargin
  }

  /** Generated random-projection replay: the SAME ±1 sign matrix as
    * [[graft.operators.VectorOps.randomProject]] (one fixed-seed PRNG,
    * embedded here as list literals), products on the shared 1e-13
    * fixed-point grid, exact ·0.25 (= 1/√16) scaling. */
  private def randomProjectionSql(outDims: Int, dims: Int): String = {
    val signs = graft.operators.VectorOps.projectionSigns(outDims, dims)
    val invRoot = 1.0 / math.sqrt(outDims.toDouble)
    require(invRoot == 0.25 || outDims * invRoot * invRoot == 1.0,
      "outDims must keep 1/sqrt exact for cross-engine identity")
    val comps = signs.map { row =>
      val lits = row.mkString("[", ", ", "]")
      s"""ROUND(CAST(list_sum(list_transform(list_zip(embedding, $lits),
         |      p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13 * $invRoot, 6)""".stripMargin
    }.mkString(",\n    ")
    s"""WITH v AS (SELECT vec_id, [
       |    $comps] AS y FROM embeddings)
       |SELECT vec_id, gs.i AS out_pos, y[gs.i] AS value
       |FROM v, generate_series(1, $outDims) AS gs(i)
       |ORDER BY vec_id, out_pos""".stripMargin
  }

  /** Generated LSH-recall replay ([[graft.Queries.qVecAnnRecall]]): the
    * SAME fixed-seed hyperplanes as [[graft.operators.VectorOps.planes]]
    * embedded as literals; bucket bits are the sign of the INTEGER
    * fixed-point projection sum (exact in both engines), query-side
    * multiprobe = XOR single-bit flips, candidate ranking the round-6
    * fixed-point cosine with id tie-breaks — the whole approximate
    * retrieval replayed, then intersected with the exact top-k. */
  private def annRecallLshSql(k: Int, nPlanes: Int, dims: Int,
                              tables: Int, probes: Int): String = {
    s"""WITH ${annLshCtes(nPlanes, dims, tables, probes)},
       |edots AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    ROUND((${annLshDot}) / (SQRT(${annLshSelfDot("qv")}) * SQRT(${annLshSelfDot("embedding")})), 6) AS cosine
       |  FROM q, embeddings e WHERE e.vec_id <> q.query_id),
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, neighbor_id) AS rank FROM edots)
       |  WHERE rank <= $k),
       |approx AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, neighbor_id) AS rank FROM adots)
       |  WHERE rank <= $k),
       |hits AS (
       |  SELECT e.query_id, COUNT(*) AS n_hits
       |  FROM exact e JOIN approx a
       |    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
       |  GROUP BY e.query_id)
       |SELECT q.query_id, COALESCE(h.n_hits, 0) AS n_hits, $k AS k
       |FROM (SELECT DISTINCT query_id FROM q) q
       |LEFT JOIN hits h ON h.query_id = q.query_id
       |ORDER BY q.query_id""".stripMargin
  }

  /** The LSH RETRIEVAL LIST itself ([[graft.Queries.qVecAnnLshFixed]],
    * [[graft.operators.VectorOps.cosineTopKLshFixed]]): the same replayed
    * algorithm as [[annRecallLshSql]], but the gated output is the ranked
    * top-k (query_id, neighbor_id, cosine, rank) — the flagship ANN path
    * as a cross-engine-gated fact, not only its recall count. */
  private def annLshTopKSql(k: Int, nPlanes: Int, dims: Int,
                            tables: Int, probes: Int): String =
    s"""WITH ${annLshCtes(nPlanes, dims, tables, probes)}
       |SELECT query_id, neighbor_id, cosine, rank FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS rank FROM adots)
       |WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  private val annLshDot =
    """CAST(list_sum(list_transform(list_zip(qv, embedding),
      |      p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13""".stripMargin
  private def annLshSelfDot(vec: String): String =
    s"""CAST(list_sum(list_transform(list_zip($vec, $vec),
       |      p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13""".stripMargin

  /** Generated MinHash replay ([[graft.Queries.qDedupMinhashFixed]],
    * [[graft.operators.DedupOps.minhashLshNearDupsFixed]]): the WHOLE
    * near-dup algorithm in ANSI SQL — word k-shingles (the
    * q_text_jaccard_neardup replay), 31-bit polynomial code-point shingle
    * hashes, k-min signatures under the SAME fixed-seed affine
    * permutations over GF(2³¹−1) (coefficients embedded as literals — the
    * LSH-planes precedent), literal band buckets, hot-bucket cap,
    * candidate join, exact-Jaccard verify. ASCII gate `[ -~]*` on both
    * engines keeps `ascii`/`unicode` code points identical. */
  /** The FIXED-family MinHash candidate pipeline as a reusable CTE chain
    * (`t` → `sgl` → `sig` → `bnd0` → `bnd` → `cand` → `mh_pairs`) reading
    * (doc_id, text) from `inputRel` — so the standalone near-dup keys and
    * composed pipelines (q_pipeline_pretrain's dedup stage) share ONE
    * generated replay. `mh_pairs` carries the verified (id_a, id_b, jac)
    * at `threshold`. */
  private def minhashFixedCtes(inputRel: String, k: Int, bands: Int,
                               rowsPerBand: Int, threshold: Double,
                               maxBucket: Int): String = {
    val p = graft.operators.DedupOps.MinhashFixedP
    val coeffs = graft.operators.DedupOps.minhashFixedCoeffs(bands * rowsPerBand)
    val sigEntries = coeffs.map { case (a, b) =>
      s"COALESCE(list_min(list_transform(sh, x -> (x * $a + $b) % $p)), -1)"
    }.mkString(",\n    ")
    val bandKeys = (0 until bands).map(b =>
      s"""SELECT doc_id, $b AS band,
         |    array_to_string(sig[${b * rowsPerBand + 1}:${(b + 1) * rowsPerBand}], ',') AS bucket
         |  FROM sig""".stripMargin).mkString("\n  UNION ALL\n  ")
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS w FROM $inputRel),
       |sgl AS (SELECT doc_id, list_sort(list_distinct(list_transform(
       |    list_transform(range(1, greatest(len(w) - $k, 0) + 2),
       |      i -> array_to_string(w[i:i+${k - 1}], ' ')),
       |    g -> CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(range(1, length(g) + 1),
       |          j -> CAST(unicode(g[j]) AS BIGINT))),
       |      (acc, c) -> (acc * 31 + c) % $p) AS BIGINT)))) AS sh
       |  FROM t),
       |sig AS (SELECT doc_id, sh, [
       |    $sigEntries] AS sig FROM sgl),
       |bnd0 AS (
       |  $bandKeys),
       |bnd AS (SELECT doc_id, band, bucket FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS bn FROM bnd0)
       |  WHERE bn <= $maxBucket),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bnd a JOIN bnd b ON a.band = b.band AND a.bucket = b.bucket
       |    AND a.doc_id < b.doc_id),
       |mh_pairs AS (SELECT id_a, id_b, jac FROM (
       |  SELECT c.id_a, c.id_b,
       |    CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |      / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jac
       |  FROM cand c
       |  JOIN sgl sa ON sa.doc_id = c.id_a
       |  JOIN sgl sb ON sb.doc_id = c.id_b)
       |WHERE jac >= $threshold)""".stripMargin
  }

  private def minhashFixedSql(k: Int, bands: Int, rowsPerBand: Int,
                              threshold: Double, maxDocId: Long,
                              maxBucket: Int): String = {
    val input = s"""(SELECT doc_id, text FROM documents
       |  WHERE doc_id < $maxDocId AND regexp_matches(text, '\\A[ -~]*\\z'))""".stripMargin
    s"""WITH ${minhashFixedCtes(input, k, bands, rowsPerBand, threshold, maxBucket)}
       |SELECT id_a, id_b, jac FROM mh_pairs
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Generated SimHash replay ([[graft.Queries.qDedupSimhashFixed]],
    * [[graft.operators.DedupOps.simhashNearDupsFixed]]): distinct
    * space-split tokens → 31-bit polynomial codes → 62 affine-derived bit
    * votes (coefficients embedded as literals) → signature → the SAME
    * 4×16-bit Manku block banding, hot-bucket cap, candidate join and
    * exact bit_count(xor) Hamming verify as the Spark side. ASCII +
    * doc_id slice gates as in [[minhashFixedSql]]. */
  private def simhashFixedSql(maxDist: Int, maxDocId: Long,
                              maxBucket: Int): String = {
    val p = graft.operators.DedupOps.MinhashFixedP
    val bits = graft.operators.DedupOps.SimhashFixedBits
    val (as, bs) = graft.operators.DedupOps.simhashFixedCoeffs()
    val aLits = as.mkString("[", ", ", "]")
    val bLits = bs.mkString("[", ", ", "]")
    // blocks = 4 over the "64-bit" layout: widths 16, offsets 0,16,32,48
    // (simhashBandKeys with blocks=4; the top 2 bits of the 62-bit sig
    // are always zero). maxDist=3 ⇒ bands are the 4 single blocks.
    val bandKeys = (0 until 4).map(b =>
      s"SELECT doc_id, sig, $b AS band, (sig >> ${16 * b}) & 65535 AS bucket FROM sig")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH t AS (SELECT doc_id, text FROM documents
       |  WHERE doc_id < $maxDocId AND regexp_matches(text, '\\A[ -~]*\\z')),
       |cs AS (SELECT doc_id, list_transform(list_distinct(string_split(text, ' ')),
       |    g -> CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(range(1, length(g) + 1),
       |          j -> CAST(unicode(g[j]) AS BIGINT))),
       |      (acc, c) -> (acc * 31 + c) % $p) AS BIGINT)) AS codes
       |  FROM t),
       |sig AS (SELECT doc_id, CAST(list_sum(list_transform(range($bits), b ->
       |    CASE WHEN list_sum(list_transform(codes,
       |        x -> CASE WHEN (x * ($aLits)[b + 1] + ($bLits)[b + 1]) % $p
       |          >= 1073741824 THEN 1 ELSE -1 END)) > 0
       |    THEN 1::BIGINT << b ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
       |  FROM cs),
       |bnd0 AS (
       |  $bandKeys),
       |bnd AS (SELECT doc_id, sig, band, bucket FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS bn FROM bnd0)
       |  WHERE bn <= $maxBucket),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    a.sig AS sig_a, b.sig AS sig_b
       |  FROM bnd a JOIN bnd b ON a.band = b.band AND a.bucket = b.bucket
       |    AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, hamming FROM (
       |  SELECT id_a, id_b,
       |    CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
       |  FROM cand)
       |WHERE hamming <= $maxDist
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Shared CTE body of the generated LSH replays: fixed-seed planes as
    * literals, bucket bits = integer fixed-point projection-sum signs,
    * XOR single-bit multiprobe, candidate (table,bucket) join, round-6
    * fixed-point cosine scoring (`adots`). */
  private def annLshCtes(nPlanes: Int, dims: Int,
                         tables: Int, probes: Int): String = {
    def bucketExpr(vec: String, seed: Long): String =
      lshBucketSql(vec, nPlanes, dims, seed)
    val corpusBuckets = (0 until tables).map(t =>
      s"""SELECT vec_id, $t AS tbl,
         |    ${bucketExpr("embedding", 42L + t)} AS bucket FROM embeddings""".stripMargin)
      .mkString("\n  UNION ALL\n  ")
    val queryBuckets = (0 until tables).map(t =>
      s"""SELECT query_id, qv, $t AS tbl,
         |    ${bucketExpr("qv", 42L + t)} AS bucket FROM q""".stripMargin)
      .mkString("\n  UNION ALL\n  ")
    val probeUnion = (("SELECT query_id, qv, tbl, bucket FROM qb0") +:
      (0 until math.min(probes, nPlanes)).map(i =>
        s"SELECT query_id, qv, tbl, xor(bucket, ${1L << i}) FROM qb0"))
      .mkString("\n  UNION ALL\n  ")
    val dot =
      """CAST(list_sum(list_transform(list_zip(qv, embedding),
        |      p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13""".stripMargin
    def selfDot(vec: String): String =
      s"""CAST(list_sum(list_transform(list_zip($vec, $vec),
         |      p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13""".stripMargin
    s"""q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
       |cb AS (
       |  $corpusBuckets),
       |qb0 AS (
       |  $queryBuckets),
       |qb AS (
       |  $probeUnion),
       |cand AS (
       |  SELECT DISTINCT qb.query_id, qb.qv, cb.vec_id AS neighbor_id
       |  FROM qb JOIN cb ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
       |  WHERE cb.vec_id <> qb.query_id),
       |adots AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    ROUND(($dot) / (SQRT(${selfDot("qv")}) * SQRT(${selfDot("embedding")})), 6) AS cosine
       |  FROM (SELECT query_id, qv, neighbor_id FROM cand) c
       |  JOIN embeddings ON embeddings.vec_id = c.neighbor_id)""".stripMargin
  }

  /** Fixed-grid LSH bucket expression: sign bits of the integer
    * fixed-point projection sums, planes as literals from the shared
    * fixed-seed PRNG — ONE definition for every generated LSH replay,
    * mirroring the single VectorOps.bucketOfFixed on the Spark side (a
    * change to the bucket encoding lands in all replays or none). */
  private def lshBucketSql(vec: String, nPlanes: Int, dims: Int,
                           seed: Long): String =
    graft.operators.VectorOps.planes(nPlanes, dims, seed).zipWithIndex.map {
      case (p, i) =>
        val lits = p.map(_.toDouble.toString).mkString("[", ", ", "]")
        s"""(CASE WHEN list_sum(list_transform(list_zip($vec, $lits),
           |      p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) >= 0 THEN ${1L << i} ELSE 0 END)""".stripMargin
    }.mkString("\n    + ")

  /** Fixed-point dot on the shared 1e-13 grid between two list exprs —
    * the generic two-operand form of [[annLshDot]]. */
  private def fixedDotSql(a: String, b: String): String =
    s"""CAST(list_sum(list_transform(list_zip($a, $b),
       |      p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13""".stripMargin

  /** Round-6 fixed-point cosine between embeddings aliased `ea`/`eb` —
    * the verify/rank expression shared by the LSH self-join replays. */
  private def fixedCosineSql: String =
    s"""ROUND((${fixedDotSql("ea.embedding", "eb.embedding")})
       |      / (SQRT(${fixedDotSql("ea.embedding", "ea.embedding")})
       |         * SQRT(${fixedDotSql("eb.embedding", "eb.embedding")})), 6)""".stripMargin

  /** Corpus-side banded CTEs shared by the LSH SELF-JOIN replays
    * (q_dedup_embedding, q_dedup_embedding_cluster, q_vec_knn_graph_lsh):
    * per-table fixed-grid bucket ids over the full embeddings corpus
    * (planes as literals from the shared fixed-seed PRNG — the
    * [[annLshCtes]] machinery) + the windowed hot-cell cap, mirroring
    * [[graft.operators.VectorOps.cosineNearDupsLshFixed]] /
    * [[graft.operators.VectorOps.knnGraphLshFixed]]. */
  private def lshSelfJoinCtes(nPlanes: Int, dims: Int, tables: Int,
                              maxBucket: Int): String = {
    def bucketExpr(vec: String, seed: Long): String =
      lshBucketSql(vec, nPlanes, dims, seed)
    val corpusBuckets = (0 until tables).map(t =>
      s"""SELECT vec_id, $t AS tbl,
         |    ${bucketExpr("embedding", 42L + t)} AS bucket FROM embeddings""".stripMargin)
      .mkString("\n  UNION ALL\n  ")
    s"""cb0 AS (
       |  $corpusBuckets),
       |cb AS (SELECT vec_id, tbl, bucket FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY tbl, bucket) AS bn FROM cb0)
       |  WHERE bn <= $maxBucket)""".stripMargin
  }

  /** Generated fixed-grid LSH near-dup replay
    * ([[graft.Queries.qDedupEmbedding]],
    * [[graft.operators.VectorOps.cosineNearDupsLshFixed]]): banded corpus
    * buckets, hot-cell cap, distinct `id_a < id_b` candidate pairs from
    * any shared (table, bucket) cell, round-6 fixed-point cosine verify
    * against `threshold` — the whole approximate near-dup algorithm in
    * ANSI SQL. */
  private def dedupEmbeddingLshSql(threshold: Double, nPlanes: Int,
                                   dims: Int, tables: Int,
                                   maxBucket: Int): String =
    s"""WITH ${lshSelfJoinCtes(nPlanes, dims, tables, maxBucket)},
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM cb a JOIN cb b ON a.tbl = b.tbl AND a.bucket = b.bucket
       |    AND a.vec_id < b.vec_id),
       |sc AS (SELECT c.id_a, c.id_b, $fixedCosineSql AS cosine
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.id_a
       |  JOIN embeddings eb ON eb.vec_id = c.id_b)
       |SELECT id_a, id_b, cosine FROM sc WHERE cosine >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  /** Generated fixed-grid LSH near-dup CLUSTER replay
    * ([[graft.Queries.qDedupEmbeddingCluster]]): the
    * [[dedupEmbeddingLshSql]] pair pipeline, then min-id connected
    * components via recursive-CTE transitive closure (the q_er_cluster
    * precedent — labels are algorithm-independent), every corpus row
    * labeled (singletons of themselves), sizes attached. */
  private def dedupEmbeddingClusterSql(threshold: Double, nPlanes: Int,
                                       dims: Int, tables: Int,
                                       maxBucket: Int): String =
    s"""WITH RECURSIVE ${lshSelfJoinCtes(nPlanes, dims, tables, maxBucket)},
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM cb a JOIN cb b ON a.tbl = b.tbl AND a.bucket = b.bucket
       |    AND a.vec_id < b.vec_id),
       |sc AS (SELECT c.id_a, c.id_b, $fixedCosineSql AS cosine
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.id_a
       |  JOIN embeddings eb ON eb.vec_id = c.id_b),
       |p AS (SELECT id_a, id_b FROM sc WHERE cosine >= $threshold),
       |und AS (SELECT id_a AS a, id_b AS b FROM p
       |  UNION ALL SELECT id_b, id_a FROM p),
       |enodes AS (SELECT DISTINCT a AS id FROM und),
       |reach AS (
       |  SELECT id, id AS r FROM enodes
       |  UNION
       |  SELECT und.b AS id, reach.r FROM reach JOIN und ON und.a = reach.id),
       |lbl AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
       |f AS (SELECT e.vec_id, COALESCE(l.comp, e.vec_id) AS cluster_id
       |  FROM embeddings e LEFT JOIN lbl l ON l.id = e.vec_id)
       |SELECT vec_id, cluster_id,
       |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |FROM f ORDER BY vec_id""".stripMargin

  /** Generated fixed-grid LSH A×B SIMILARITY-JOIN replay
    * ([[graft.Queries.qVecSimJoin]],
    * [[graft.operators.VectorOps.cosineSimJoinLshFixed]]): the even-id
    * and odd-id halves banded separately with the SAME plane literals,
    * per-side windowed hot-cell caps, cross-side (table, bucket)
    * candidate join under any-table OR semantics, round-6 fixed-point
    * cosine verify against `threshold`. */
  private def vecSimJoinLshSql(threshold: Double, nPlanes: Int, dims: Int,
                               tables: Int, maxBucket: Int): String = {
    def bucketExpr(vec: String, seed: Long): String =
      lshBucketSql(vec, nPlanes, dims, seed)
    def sideCtes(tag: String, parity: Int): String = {
      val buckets = (0 until tables).map(t =>
        s"""SELECT vec_id, $t AS tbl,
           |    ${bucketExpr("embedding", 42L + t)} AS bucket FROM embeddings
           |    WHERE vec_id % 2 = $parity""".stripMargin)
        .mkString("\n  UNION ALL\n  ")
      s"""${tag}0 AS (
         |  $buckets),
         |$tag AS (SELECT vec_id, tbl, bucket FROM (
         |    SELECT *, COUNT(*) OVER (PARTITION BY tbl, bucket) AS bn FROM ${tag}0)
         |  WHERE bn <= $maxBucket)""".stripMargin
    }
    s"""WITH ${sideCtes("ca", 0)},
       |${sideCtes("cb", 1)},
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM ca a JOIN cb b ON a.tbl = b.tbl AND a.bucket = b.bucket),
       |sc AS (SELECT c.id_a, c.id_b, $fixedCosineSql AS cosine
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.id_a
       |  JOIN embeddings eb ON eb.vec_id = c.id_b)
       |SELECT id_a, id_b, cosine FROM sc WHERE cosine >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Generated fixed-grid LSH k-NN-graph replay
    * ([[graft.Queries.qVecKnnGraphLsh]],
    * [[graft.operators.VectorOps.knnGraphLshFixed]]): banded corpus
    * buckets, hot-cell cap, distinct DIRECTED candidate edges from any
    * shared (table, bucket) cell, per-node top-`k` by round-6 fixed-point
    * cosine with neighbor-id tie-breaks. */
  private def knnGraphLshSql(k: Int, nPlanes: Int, dims: Int, tables: Int,
                             maxBucket: Int): String =
    s"""WITH ${lshSelfJoinCtes(nPlanes, dims, tables, maxBucket)},
       |cand AS (SELECT DISTINCT a.vec_id AS node, b.vec_id AS nbr
       |  FROM cb a JOIN cb b ON a.tbl = b.tbl AND a.bucket = b.bucket
       |    AND a.vec_id <> b.vec_id),
       |sc AS (SELECT c.node, c.nbr, $fixedCosineSql AS cosine
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.node
       |  JOIN embeddings eb ON eb.vec_id = c.nbr)
       |SELECT node, neighbor_id, cosine, rank FROM (
       |  SELECT node, nbr AS neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY node
       |      ORDER BY cosine DESC, nbr) AS rank
       |  FROM sc)
       |WHERE rank <= $k ORDER BY node, rank""".stripMargin

  /** Generated NN-descent refinement replay
    * ([[graft.Queries.qVecKnnRefine]],
    * [[graft.operators.VectorOps.knnGraphRefine]]): the LSH seed graph as
    * a CTE, candidates = current neighbors ∪ neighbors-of-neighbors over
    * forward edges (self-pairs dropped), exact round-6 fixed-point
    * re-score, per-node top-`k` with neighbor-id tie-breaks. */
  private def knnGraphRefineSql(k: Int, nPlanes: Int, dims: Int, tables: Int,
                                maxBucket: Int): String =
    s"""WITH g AS (${knnGraphLshSql(k, nPlanes, dims, tables, maxBucket)}),
       |cands AS (SELECT DISTINCT node, cand FROM (
       |    SELECT node, neighbor_id AS cand FROM g
       |    UNION ALL
       |    SELECT a.node AS node, b.neighbor_id AS cand
       |    FROM g a JOIN g b ON a.neighbor_id = b.node)
       |  WHERE node <> cand),
       |sc AS (SELECT c.node, c.cand AS nbr, $fixedCosineSql AS cosine
       |  FROM cands c
       |  JOIN embeddings ea ON ea.vec_id = c.node
       |  JOIN embeddings eb ON eb.vec_id = c.cand)
       |SELECT node, neighbor_id, cosine, rank FROM (
       |  SELECT node, nbr AS neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY node
       |      ORDER BY cosine DESC, nbr) AS rank
       |  FROM sc)
       |WHERE rank <= $k ORDER BY node, rank""".stripMargin

  /** Sliding 1 h / 30 min window counts — shared by q_window_sliding and
    * its streaming twin q_stream_sliding: each event lands in the two
    * half-hour-aligned windows covering it. */
  private val slidingWindowSql =
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      |w AS (SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS ws, event_type FROM e
      |      UNION ALL
      |      SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, event_type FROM e)
      |SELECT ws AS window_start, ws + INTERVAL 60 MINUTE AS window_end,
      |  event_type, COUNT(*) AS n
      |FROM w GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin

  /** Unrolled integer PageRank (mirrors [[graft.operators.GraphOps.pageRank]]
    * at scale 1e9 / damping 0.85): r0 = S//N, then `iters` rounds of
    * teleport + Σ⌊0.85·r/deg⌋ over the symmetrized part↔supplier graph.
    * DuckDB `//` (floor) == Spark `div` (trunc) on the all-positive ranks. */
  private def pagerankSql(iters: Int): String = {
    val head =
      """WITH e0 AS (SELECT DISTINCT l_partkey % 100 AS src,
        |    100 + l_suppkey % 100 AS dst FROM lineitem),
        |e AS (SELECT DISTINCT src, dst FROM
        |  (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
        |nodes AS (SELECT DISTINCT src AS node FROM
        |  (SELECT src FROM e UNION ALL SELECT dst FROM e)),
        |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
        |p AS (SELECT COUNT(*) AS n FROM nodes),
        |r0 AS (SELECT node, CAST(1000000000 // n AS BIGINT) AS r FROM nodes, p)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""c$k AS (SELECT e.dst AS node, SUM((85 * r.r) // (100 * d.deg)) AS rc
         |  FROM e JOIN r${k - 1} r ON e.src = r.node JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst),
         |r$k AS (SELECT nodes.node,
         |    CAST((15000000000 // (100 * p.n)) + COALESCE(c$k.rc, 0) AS BIGINT) AS r
         |  FROM nodes CROSS JOIN p LEFT JOIN c$k ON c$k.node = nodes.node)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"\nSELECT node, r FROM r$iters ORDER BY node"
  }

  /** Verify-time context for the GENERATED oracles below: set by
    * [[graft.Verify]] before `oracle_sql.json` is serialized, so a
    * data-dependent (but deterministic) training artifact — the IVF Lloyd
    * codebook — can be embedded as literals into the oracle the way the
    * fixed LSH planes / minhash coefficients already are (VERDICT r16 #4).
    * Unset (unit tests, tools) → [[generated]] is empty and the affected
    * keys fall back to their rows-only pins. */
  @volatile private var trainCtx: Option[(org.apache.spark.sql.SparkSession, String)] = None
  def setTrainingContext(spark: org.apache.spark.sql.SparkSession,
                         sfDir: String): Unit =
    trainCtx = Some((spark, sfDir))

  private val generatedCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()

  /** Oracles whose SQL embeds a trained (deterministic, seed-pinned,
    * DECIMAL-exact — [[graft.operators.VectorOps.lloydCentroids]]) artifact
    * from the CURRENT test data: available only under a training context. */
  def generated: Map[String, String] = trainCtx match {
    case None => Map.empty
    case Some((spark, d)) =>
      generatedCache.computeIfAbsent(d, { _ =>
        // one coarse Lloyd training shared by the IVF and IVF-PQ replays:
        // both declared paths train the identical codebook (k=16, 1 iter),
        // so training once both halves the Verify-time Spark jobs and
        // guarantees the two oracles can never embed divergent centroids
        val cents = graft.operators.VectorOps.lloydCentroids(
          graft.Tables.embeddings(spark, d), "vec_id", "embedding",
          k = 16, iters = 1)
        val ivf = ivfOracle(cents)
        val ivfpq = ivfPqOracle(spark, d, cents)
        val hyb = hybridRrfOracle(cents)
        Map("q_vec_ann_ivf" -> ivf,
            // streaming index-maintenance twin: per-batch assignment folds
            // into the standing inverted list, probe stage sees only the
            // final index — batching-invariant, same replay
            "q_stream_vec_ivf" -> ivf,
            // persisted partition-pruned index: materialized assignment ==
            // computed assignment (parquet round-trip is bit-exact), same
            // replay
            "q_vec_ann_ivf_indexed" -> ivf,
            // hybrid fuse: vector side ranks through the same index
            // replay (top-50 cut), lexical side replays the postings
            // ranker (top-50) — see hybridRrfOracle
            "q_hybrid_rrf" -> hyb,
            // maintain-then-serve twin: both folds batching-invariant, the
            // serve sees only final state — same replay (computed once)
            "q_stream_hybrid" -> hyb,
            // RAG serving capstone: hybrid top-20 candidates re-scored +
            // MMR-diversified via the shared greedy CTEs
            "q_hybrid_mmr" -> hybridMmrOracle(cents),
            "q_vec_ann_pq" -> pqOracle(spark, d),
            "q_vec_ann_ivfpq" -> ivfpq,
            // persisted IVF-PQ serving index: materialized codes ==
            // computed encode (identical training params; codes/floats
            // round-trip parquet bit-exactly), so the SAME replay hashes
            // it — trained once above, never twice at Verify time
            "q_vec_ann_ivfpq_indexed" -> ivfpq)
      })
  }

  /** Sequential double left-fold of the elementwise products of two
    * DuckDB lists — bit-identical to the native kernel's
    * `acc += a(i)·b(i)` loop ([[graft.plans.CodebookExpressions.dotAt]],
    * `FloatVectorExpressions` dot): list_reduce folds left, 0.0+x == x
    * exactly for the implicit first-element init, and float→double casts
    * are exact. Plain `list_sum` is NOT used for the replayed dots — its
    * summation order is an engine detail; the fold pins it. */
  private def seqDot(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b),
       |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
       |      (acc, x) -> acc + x)""".stripMargin

  /** The kernel's own csq loop ([[graft.plans.CodebookExpressions]]
    * PqEncodeCodes.csqs: sequential `acc += c(i)·c(i)` over doubles) —
    * computed HERE so the embedded literal is bit-identical to what the
    * engine's encode compares against. One definition shared by the PQ
    * and IVF-PQ replays (a one-sided edit must be impossible). */
  private def csqOf(c: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i).toDouble * c(i).toDouble; i += 1 }
    acc
  }

  /** PQ book entries as a DuckDB VALUES body — shared by the PQ and
    * IVF-PQ replays; Double.toString round-trips, so the literals are the
    * kernels' exact float-promoted values. */
  private def bookValues(
      books: Seq[graft.operators.VectorOps.BookEntry]): String =
    books.map { case (sub, code, cv) =>
      s"($sub, CAST($code AS BIGINT), [${cv.map(f => f.toDouble.toString).mkString(", ")}]::DOUBLE[], ${csqOf(cv).toString})"
    }.mkString(",\n    ")

  /** IVF-PQ funnel replay — [[pqOracle]] composed with [[ivfOracle]]'s
    * coarse stage, closing the last "residual-LUT float terms" question
    * (VERDICT r16 #4): every float term IS replayable because each is
    * either (a) a sequential-double fold ([[seqDot]] — the kernels' loop
    * order), (b) an exact float subtraction (the residual: double-subtract
    * then round-to-float equals IEEE float subtraction, both correctly
    * rounded), or (c) a literal embed of a DECIMAL-exact seed-pinned
    * training artifact (coarse centroids + residual books — xxhash64
    * ids/codes are the only non-SQL-expressible step). The oracle replays
    * coarse assignment (argmax sim, first-wins → ORDER BY sim DESC, cid),
    * float residuals, residual PQ encode (argmin csq−2·dot, code-ascending
    * first-wins), the per-(query, probed-cell) ADC terms qc/csq_c/qdot/
    * cdot, the reconstructed-vector cosine with its 1e-12 floor, and the
    * exact re-rank. The m-term SUMs carry the same hash-agg order freedom
    * as [[pqOracle]] — margin-checked by the gate itself. */
  private def ivfPqOracle(spark: org.apache.spark.sql.SparkSession,
                          d: String,
                          coarse: Seq[graft.operators.VectorOps.Centroid]): String = {
    import org.apache.spark.sql.functions.col
    val nProbe = 4; val m = 8; val ksub = 16
    val dims = 64; val k = 10; val refine = 8
    val dsub = dims / m
    val emb = graft.Tables.embeddings(spark, d)
    val assigned = emb.select(col("vec_id").as("id"),
        graft.plans.CodebookExpressions
          .assignResidual(col("embedding"), coarse).as("a"))
      .select(col("id"), col("a.cell").as("cell"), col("a.rv").as("rv"))
    val books = graft.operators.VectorOps.pqBooks(
      assigned, "id", "rv", m = m, ksub = ksub, dims = dims, iters = 1)
    val centVals = coarse.map { case (cid, cv) =>
      s"($cid, [${cv.map(f => f.toDouble.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n    ")
    val bookVals = bookValues(books)
    // float residual: double-subtract then round-to-float == IEEE float
    // subtraction (exact intermediate, correct final rounding)
    def floatResidual(v: String, c: String): String =
      s"""list_transform(list_zip($v, $c),
         |      p -> CAST(CAST(p[1] AS DOUBLE) - p[2] AS FLOAT))""".stripMargin
    val rvSlice = s"a.rv[b.sub * $dsub + 1 : b.sub * $dsub + $dsub]"
    val qrSlice = s"qc.qr[b.sub * $dsub + 1 : b.sub * $dsub + $dsub]"
    val ccvSlice = s"qc.ccv[b.sub * $dsub + 1 : b.sub * $dsub + $dsub]"
    s"""WITH cents AS (SELECT * FROM (VALUES
       |    $centVals) AS t(cid, ccv)),
       |books AS (SELECT * FROM (VALUES
       |    $bookVals) AS t(sub, code, bcv, csq)),
       |e AS (SELECT vec_id, embedding,
       |    SQRT(${seqDot("embedding", "embedding")}) AS vnrm
       |  FROM embeddings),
       |sims AS (SELECT e.vec_id, c.cid, c.ccv,
       |    ${seqDot("e.embedding", "c.ccv")}
       |      / (e.vnrm * SQRT(${seqDot("c.ccv", "c.ccv")})) AS sim
       |  FROM e, cents c),
       |asg AS (SELECT s.vec_id, s.cid AS cell,
       |    ${floatResidual("e.embedding", "s.ccv")} AS rv
       |  FROM (SELECT vec_id, cid, ccv,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id
       |        ORDER BY sim DESC, cid) AS r FROM sims) s
       |  JOIN e ON e.vec_id = s.vec_id WHERE s.r = 1),
       |enc0 AS (SELECT a.vec_id, a.cell, b.sub, b.code, b.csq,
       |    b.csq - 2.0 * ${seqDot(rvSlice, "b.bcv")} AS d2
       |  FROM asg a, books b),
       |codes AS (SELECT vec_id, cell, sub, code, csq FROM (
       |    SELECT vec_id, cell, sub, code, csq,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub
       |        ORDER BY d2 ASC, code ASC) AS r
       |    FROM enc0) WHERE r = 1),
       |qv AS (SELECT vec_id AS query_id, embedding AS qe, vnrm AS qnrm
       |       FROM e WHERE vec_id < 5),
       |probes AS (SELECT query_id, cid AS cell, ccv, qnrm FROM (
       |    SELECT q.query_id, c.cid, c.ccv, q.qnrm,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
       |        ${seqDot("q.qe", "c.ccv")}
       |          / (q.qnrm * SQRT(${seqDot("c.ccv", "c.ccv")})) DESC,
       |        c.cid) AS r
       |    FROM qv q, cents c) WHERE r <= $nProbe),
       |qcells AS (SELECT p.query_id, p.cell, p.ccv, p.qnrm,
       |    ${seqDot("p.ccv", "p.ccv")} AS csq_c,
       |    ${seqDot("q.qe", "p.ccv")} AS qc,
       |    ${floatResidual("q.qe", "p.ccv")} AS qr
       |  FROM probes p JOIN qv q ON q.query_id = p.query_id),
       |lut AS (SELECT qc.query_id, qc.cell, b.sub, b.code, qc.qnrm,
       |    qc.qc, qc.csq_c, b.csq,
       |    ${seqDot(qrSlice, "b.bcv")} AS qdot,
       |    ${seqDot(ccvSlice, "b.bcv")} AS cdot
       |  FROM qcells qc, books b),
       |approx AS (SELECT l.query_id, c.vec_id AS neighbor_id,
       |    ANY_VALUE(l.qnrm) AS qnrm,
       |    (ANY_VALUE(l.qc) + SUM(l.qdot))
       |      / (ANY_VALUE(l.qnrm) * SQRT(GREATEST(
       |          ANY_VALUE(l.csq_c) + 2.0 * SUM(l.cdot) + SUM(l.csq),
       |          1e-12))) AS approx
       |  FROM codes c
       |  JOIN lut l ON l.cell = c.cell AND l.sub = c.sub AND l.code = c.code
       |  WHERE c.vec_id <> l.query_id
       |  GROUP BY l.query_id, c.vec_id),
       |cand AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY approx DESC, neighbor_id ASC) AS r
       |    FROM approx) WHERE r <= ${k * refine}),
       |scored AS (SELECT c.query_id, c.neighbor_id,
       |    ROUND(${seqDot("q.qe", "n.embedding")} / (q.qnrm * n.vnrm), 6)
       |      AS cosine
       |  FROM cand c JOIN qv q ON q.query_id = c.query_id
       |  JOIN e n ON n.vec_id = c.neighbor_id),
       |ranked AS (SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, cosine, rank FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** PQ funnel replay (VERDICT r16 #4, the IVF precedent extended to the
    * compressed-domain half): training is DECIMAL-exact and seed-pinned
    * ([[graft.operators.VectorOps.pqBooks]] — lowest-id seeds, xxhash64
    * codes, hence the literal embed), so the oracle replays everything
    * DOWNSTREAM of the books:
    *
    *  1. ENCODE: per (vector, subspace) the kernel's assignment rule
    *     `argmin csq − 2·dot(v_sub, c)` with its strict-< first-wins tie
    *     (book iteration order = code ascending → ORDER BY d2, code); csq
    *     is PRECOMPUTED in Scala by the kernel's own sequential loop and
    *     embedded (Double.toString round-trips), the dot replayed by the
    *     sequential fold above;
    *  2. ADC: per-query LUT dots replayed the same way; adot/vsq are the
    *     m-term sums Spark folds in hash-agg order — double addition over
    *     m=8 terms whose one ulp of order-freedom sits far inside the
    *     candidate cut's margin on this data (the content-hash pin was
    *     already stable across rounds for the same reason);
    *  3. exact re-rank on the true vectors rounded to the shared 6 dp,
    *     rank ≤ k by (cosine DESC, id) — the ivfOracle tail. */
  private def pqOracle(spark: org.apache.spark.sql.SparkSession,
                       d: String): String = {
    val m = 8; val ksub = 16; val dims = 64; val k = 10; val refine = 8
    val dsub = dims / m
    val books = graft.operators.VectorOps.pqBooks(
      graft.Tables.embeddings(spark, d), "vec_id", "embedding",
      m = m, ksub = ksub, dims = dims, iters = 1)
    val values = bookValues(books)
    val subSlice = s"e.embedding[b.sub * $dsub + 1 : b.sub * $dsub + $dsub]"
    val qSlice = s"q.qe[b.sub * $dsub + 1 : b.sub * $dsub + $dsub]"
    s"""WITH books AS (SELECT * FROM (VALUES
       |    $values) AS t(sub, code, cv, csq)),
       |e AS (SELECT vec_id, embedding,
       |    SQRT(${seqDot("embedding", "embedding")}) AS vnrm
       |  FROM embeddings),
       |enc0 AS (SELECT e.vec_id, b.sub, b.code, b.csq,
       |    b.csq - 2.0 * ${seqDot(subSlice, "b.cv")} AS d2
       |  FROM e, books b),
       |codes AS (SELECT vec_id, sub, code, csq FROM (
       |    SELECT vec_id, sub, code, csq,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub
       |        ORDER BY d2 ASC, code ASC) AS r
       |    FROM enc0) WHERE r = 1),
       |qv AS (SELECT vec_id AS query_id, embedding AS qe, vnrm AS qnrm
       |       FROM e WHERE vec_id < 5),
       |lut AS (SELECT q.query_id, q.qnrm, b.sub, b.code,
       |    ${seqDot(qSlice, "b.cv")} AS pdot
       |  FROM qv q, books b),
       |approx AS (SELECT l.query_id, c.vec_id AS neighbor_id,
       |    ANY_VALUE(l.qnrm) AS qnrm,
       |    SUM(l.pdot) / (ANY_VALUE(l.qnrm) * SQRT(SUM(c.csq))) AS approx
       |  FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
       |  WHERE c.vec_id <> l.query_id
       |  GROUP BY l.query_id, c.vec_id),
       |cand AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY approx DESC, neighbor_id ASC) AS r
       |    FROM approx) WHERE r <= ${k * refine}),
       |scored AS (SELECT c.query_id, c.neighbor_id,
       |    ROUND(${seqDot("q.qe", "n.embedding")} / (q.qnrm * n.vnrm), 6)
       |      AS cosine
       |  FROM cand c JOIN qv q ON q.query_id = c.query_id
       |  JOIN e n ON n.vec_id = c.neighbor_id),
       |ranked AS (SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, cosine, rank FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** IVF funnel replay (VERDICT r16 #4): training is DECIMAL-exact and
    * seed-pinned (lowest-id seeds, xxhash64 cent ids — not expressible in
    * DuckDB, hence the literal embed), so the oracle replays everything
    * DOWNSTREAM of the codebook: cosine cell assignment with the kernel's
    * (sim DESC, cid ASC) tie-break, nProbe=6 multi-probe, inverted-list
    * candidate join, exact re-rank rounded to the shared 6 dp. Float→double
    * promotion is exact and `Double.toString` round-trips, so the embedded
    * centroid literals are the kernel's exact values. */
  private def ivfOracle(
      cents: Seq[graft.operators.VectorOps.Centroid]): String =
    s"""WITH ${ivfRankPrefix(cents)},
       |ranked AS (SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, cosine, rank FROM ranked
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Shared WITH-body of the IVF funnel replay, through the exact-rank
    * `scored` stage (query_id, neighbor_id, cosine) — one definition for
    * every generated oracle that ranks through the IVF index
    * ([[ivfOracle]] and the hybrid-RRF vector side), so the coarse
    * assignment/probe/candidate arithmetic can never diverge between
    * them. */
  private def ivfRankPrefix(
      cents: Seq[graft.operators.VectorOps.Centroid]): String = {
    val values = cents.map { case (cid, cv) =>
      s"($cid, [${cv.map(f => f.toDouble.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n    ")
    s"""cents AS (SELECT * FROM (VALUES
       |    $values) AS t(cid, cv)),
       |cn AS (SELECT cid, cv,
       |    SQRT(${seqDot("cv", "cv")}) AS cnrm FROM cents),
       |e AS (SELECT vec_id, embedding,
       |    SQRT(${seqDot("embedding", "embedding")}) AS vnrm
       |  FROM embeddings),
       |sims AS (SELECT e.vec_id, c.cid,
       |    ${seqDot("e.embedding", "c.cv")} / (e.vnrm * c.cnrm) AS sim
       |  FROM e, cn c),
       |asg AS (SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS r
       |    FROM sims) WHERE r = 1),
       |probes AS (SELECT vec_id AS query_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS r
       |    FROM sims WHERE vec_id < 5) WHERE r <= 6),
       |qv AS (SELECT vec_id AS query_id, embedding AS qe, vnrm AS qnrm
       |       FROM e WHERE vec_id < 5),
       |cand AS (SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
       |  FROM probes p JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.query_id),
       |scored AS (SELECT c.query_id, c.neighbor_id,
       |    ROUND(${seqDot("q.qe", "n.embedding")} / (q.qnrm * n.vnrm), 6)
       |      AS cosine
       |  FROM cand c JOIN qv q ON q.query_id = c.query_id
       |  JOIN e n ON n.vec_id = c.neighbor_id)""".stripMargin
  }

  /** Shared WITH-body of the lexical postings ranker through the ranked
    * top-50 cut `lex` — ONE definition for [[hybridFuseCtes]] (the
    * hybrid's lexical side) and [[textPostingsIndexedSql]] (the persisted
    * postings index key, which cuts it to top-10), so the computed replay
    * and the indexed key's oracle can never diverge. Replays
    * `TextOps.docPostings` → `postingsOverlapTopN`: unnest the
    * distinct-token lists, equi-join query postings on token, COUNT =
    * |intersection| (tokens are distinct per doc), rank by
    * (overlap DESC, id). The bucket partitioning of the persisted index
    * is a pure layout artifact — pruning drops only never-matching
    * postings — so the replay is bucket-free by design. */
  private lazy val lexPostingsCtes: String =
    s"""toks AS (SELECT doc_id, list_distinct(list_filter(
       |    string_split(text, ' '), t -> t <> '')) AS toks FROM documents),
       |post AS (SELECT doc_id, unnest(toks) AS tok FROM toks),
       |qp AS (SELECT doc_id AS query_id, tok FROM post WHERE doc_id < 5),
       |ov AS (SELECT qp.query_id, p.doc_id AS neighbor_id,
       |    COUNT(*) AS overlap
       |  FROM qp JOIN post p ON p.tok = qp.tok AND p.doc_id <> qp.query_id
       |  GROUP BY qp.query_id, p.doc_id),
       |lex AS (SELECT query_id, neighbor_id, lex_rank FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY overlap DESC, neighbor_id) AS lex_rank FROM ov)
       |  WHERE lex_rank <= 50)""".stripMargin

  /** q_text_postings_indexed: the persisted postings serving index ≡ the
    * computed postings ranker — same kernel over the same (bucket-pruned,
    * never-matching-only dropped) rows, so the computed replay hashes the
    * indexed path (the q_vec_ann_ivf_indexed ruling on the lexical side). */
  private lazy val textPostingsIndexedSql: String =
    s"""WITH $lexPostingsCtes
       |SELECT query_id, neighbor_id, lex_rank AS rank FROM lex
       |WHERE lex_rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Hybrid-RRF replay over the INDEXED rankers (VERDICT r17 #1): the
    * vector top-20 ranks through the shared IVF CTEs ([[ivfRankPrefix]] —
    * materialized index ≡ computed assignment, the q_vec_ann_ivf_indexed
    * ruling), the lexical top-50 replays the postings ranker (unnest the
    * distinct-token lists, equi-join query postings on token, COUNT =
    * |intersection|), and the union-RRF fuse is a FULL JOIN with
    * missing-list credit 0 — integers end to end, so the whole truncated
    * fusion sits under the exact hash gate. */
  private def hybridRrfOracle(
      cents: Seq[graft.operators.VectorOps.Centroid]): String =
    s"""WITH ${hybridFuseCtes(cents)}
       |SELECT query_id, neighbor_id, lex_rank, vec_rank, rrf_micro, rank
       |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Shared WITH-body of the hybrid union-RRF fuse, through the full
    * fused ranking `r` — one definition for [[hybridRrfOracle]] (top-10
    * cut) and the RAG composition [[hybridMmrOracle]] (top-20 candidate
    * cut feeding the MMR greedy). */
  private def hybridFuseCtes(
      cents: Seq[graft.operators.VectorOps.Centroid]): String =
    s"""${ivfRankPrefix(cents)},
       |vec AS (SELECT query_id, neighbor_id, vec_rank FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, neighbor_id) AS vec_rank FROM scored)
       |  WHERE vec_rank <= 50),
       |$lexPostingsCtes,
       |f AS (SELECT COALESCE(l.query_id, v.query_id) AS query_id,
       |    COALESCE(l.neighbor_id, v.neighbor_id) AS neighbor_id,
       |    l.lex_rank, v.vec_rank,
       |    COALESCE(1000000000 // (60 + l.lex_rank), 0)
       |      + COALESCE(1000000000 // (60 + v.vec_rank), 0) AS rrf_micro
       |  FROM lex l FULL JOIN vec v
       |    ON v.query_id = l.query_id AND v.neighbor_id = l.neighbor_id),
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY rrf_micro DESC, neighbor_id) AS rank FROM f)""".stripMargin

  /** RAG serving replay: the hybrid fuse's top-20 candidates
    * ([[hybridFuseCtes]]) re-scored on the dotFixed cosine grid and run
    * through the shared unrolled MMR greedy ([[mmrGreedyCtes]]) —
    * retrieve broadly, re-rank precisely, diversify; the whole serving
    * stack under ONE hash. Mirrors `Queries.qHybridMmr` /
    * `VectorOps.mmrRerankOver` exactly: relevance is the re-ranker's own
    * cosine (retrieval credit is rank-scale, not similarity-scale). */
  private def hybridMmrOracle(
      cents: Seq[graft.operators.VectorOps.Centroid]): String =
    s"""WITH ${hybridFuseCtes(cents)},
       |hyb AS (SELECT query_id, neighbor_id FROM r WHERE rank <= 20),
       |$mmrNormCtes,
       |rel AS MATERIALIZED (SELECT h.query_id, s.vec_id AS cand,
       |    s.v AS cv, s.nrm AS cn,
       |    CAST(ROUND(${dotSql("q.qv", "s.v")} / (q.qn * s.nrm) * 1000000)
       |      AS BIGINT) AS rel6
       |  FROM hyb h JOIN side s ON s.vec_id = h.neighbor_id
       |  JOIN q ON q.query_id = h.query_id),
       |${mmrGreedyCtes(k = 5, wRel = 7L, wDiv = 3L)}
       |${mmrFinalSelect(5)}""".stripMargin

  /** Four-stage end-to-end pipeline replay (quality gate → exact dedup →
    * minhash near-dup removal via the shared [[minhashFixedCtes]] body →
    * chunking) — ONE definition shared by the batch key and its streaming
    * composition twin (both are the same function of the corpus; the
    * stream is batching-invariant by construction). */
  private lazy val pipelinePretrainSql: String =
    s"""WITH d0 AS (SELECT doc_id, n_chars, text FROM documents
       |  WHERE doc_id < 600 AND regexp_matches(text, '\\A[ -~]*\\z')),
       |qual AS (SELECT doc_id, text FROM (
       |    SELECT doc_id, text, string_split(text, ' ') AS w FROM d0)
       |  WHERE len(w) >= 5
       |    AND CAST(len(list_distinct(w)) AS DOUBLE) / len(w) >= 0.3),
       |keep AS (SELECT MIN(doc_id) AS doc_id FROM qual GROUP BY md5(text)),
       |sv AS (SELECT qual.doc_id, qual.text FROM qual JOIN keep USING (doc_id)),
       |${minhashFixedCtes("sv", k = 3, bands = 8, rowsPerBand = 4,
            threshold = 0.5, maxBucket = 1000)},
       |dropped AS (SELECT DISTINCT id_b AS doc_id FROM mh_pairs),
       |ded AS (SELECT sv.doc_id, sv.text FROM sv ANTI JOIN dropped USING (doc_id)),
       |tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM ded),
       |st AS (SELECT doc_id, w, unnest(range(0, len(w), 48)) AS start_tok FROM tw)
       |SELECT doc_id, CAST(start_tok // 48 AS BIGINT) AS chunk_idx,
       |  CAST(start_tok AS BIGINT) AS start_tok,
       |  CAST(len(w[start_tok+1:start_tok+64]) AS BIGINT) AS chunk_len,
       |  md5(array_to_string(w[start_tok+1:start_tok+64], ' ')) AS chunk_md5
       |FROM st ORDER BY doc_id, chunk_idx""".stripMargin

  /** Shared byte→pixel→gray replay for the dHash family: `b` = the
    * encodePng byte/dims rule over non-empty documents, `g` = the 9×8
    * NN-sampled integer grayscale grid (gv, 72 values row-major) — ONE
    * definition for every oracle that re-derives the perceptual hash
    * (q_multimodal_dhash and q_multimodal_decontaminate). */
  private val mmDhashGrayCtes: String =
    """b AS (SELECT doc_id, length(text) AS n,
      |    list_transform(range(1, length(text) + 1),
      |      j -> ord(substr(text, CAST(j AS INT), 1))) AS bs,
      |    8 + (length(text) % 17) AS w,
      |    8 + ((length(text) // 17) % 13) AS h
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      |g AS (SELECT doc_id,
      |    list_transform(range(0, 72), p ->
      |      (bs[CAST((3 * (((p // 9) * h // 8) * w + ((p % 9) * w // 9))) % n AS INT) + 1]
      |       + bs[CAST((3 * (((p // 9) * h // 8) * w + ((p % 9) * w // 9)) + 1) % n AS INT) + 1]
      |       + bs[CAST((3 * (((p // 9) * h // 8) * w + ((p % 9) * w // 9)) + 2) % n AS INT) + 1]) // 3) AS gv
      |  FROM b)""".stripMargin

  /** VALUES literal of the declared grant matrix — generated from the
    * SAME Seq the Spark query builds its table from
    * ([[graft.operators.Permissions.demoGrants]]), so the gate's two
    * sides can never diverge. */
  private def permissionsGateSql: String = {
    val values = graft.operators.Permissions.demoGrants.map {
      case (u, t, r, c, w) => s"('$u', '$t', $r, $c, $w)"
    }.mkString(",\n    ")
    s"""WITH perms(user_id, type_id, can_read, can_create, can_write) AS (
       |  VALUES
       |    $values)
       |SELECT p.user_id, d.source, COUNT(*) AS n_docs,
       |  CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
       |FROM documents d JOIN perms p
       |  ON p.type_id = d.source AND p.can_read
       |GROUP BY p.user_id, d.source
       |ORDER BY p.user_id, d.source""".stripMargin
  }

  /** The [[graft.operators.TextOps.normalizeText]] replay — DuckDB's
    * `nfc_normalize` (utf8proc) and the engine's JDK kernel both implement
    * UAX #15 canonical composition; lower + the explicit `[ \t\n\r]+`
    * collapse + trim mirror the Column pipeline term for term. ONE
    * definition for both normalization oracles. */
  private def normSql(e: String): String =
    s"trim(regexp_replace(lower(nfc_normalize($e)), '[ \\t\\n\\r]+', ' ', 'g'))"

  /** q_text_normalize: planted composed/decomposed twins from the SAME
    * Scala constants the Spark query plants (TextOps.Plant*), interpolated
    * as literals — a one-sided plant edit breaks the hash. */
  private def textNormalizeSql: String = {
    val comp = graft.operators.TextOps.PlantComposed
    val dec = graft.operators.TextOps.PlantDecomposed
    s"""WITH p AS (SELECT doc_id,
       |    text || CASE CAST(doc_id % 3 AS INT)
       |      WHEN 0 THEN '$comp' WHEN 1 THEN '$dec' ELSE '' END AS t
       |  FROM documents WHERE text IS NOT NULL)
       |SELECT doc_id, ${normSql("t")} AS norm
       |FROM p ORDER BY doc_id""".stripMargin
  }

  /** q_dedup_exact_normalized: raw vs normalized digest keepers — the
    * cross-spelling duplicate class only the normalized digest collapses. */
  private def dedupExactNormalizedSql: String = {
    val comp = graft.operators.TextOps.PlantComposed
    val dec = graft.operators.TextOps.PlantDecomposed
    s"""WITH docs AS (SELECT doc_id,
       |    CASE CAST(doc_id % 50 AS INT)
       |      WHEN 0 THEN '$comp' WHEN 1 THEN '$dec' ELSE text END AS t
       |  FROM documents WHERE text IS NOT NULL),
       |dg AS (SELECT doc_id, md5(t) AS digest_raw,
       |    md5(${normSql("t")}) AS digest_norm
       |  FROM docs),
       |k AS (SELECT doc_id,
       |    MIN(doc_id) OVER (PARTITION BY digest_raw) AS keeper_raw,
       |    MIN(doc_id) OVER (PARTITION BY digest_norm) AS keeper_norm
       |  FROM dg)
       |SELECT doc_id, keeper_raw, keeper_norm,
       |  keeper_raw <> keeper_norm AS caught_by_norm_only
       |FROM k ORDER BY doc_id""".stripMargin
  }

  /** Write-side 403 replay (q_permissions_write_gate): the same generated
    * grant VALUES, the existing-type set as a generated IN literal, and
    * the [[graft.operators.Permissions.writeDecision]] CASE — existing ⇒
    * can_write, type-creating ⇒ can_create, error codes on deny. */
  private def permissionsWriteGateSql: String = {
    val values = graft.operators.Permissions.demoGrants.map {
      case (u, t, r, c, w) => s"('$u', '$t', $r, $c, $w)"
    }.mkString(",\n    ")
    val existing = graft.operators.Permissions.demoExistingTypes
      .map(t => s"'$t'").mkString(", ")
    s"""WITH perms0(user_id, type_id, can_read, can_create, can_write) AS (
       |  VALUES
       |    $values),
       |perms AS (SELECT user_id, type_id,
       |    BOOL_OR(COALESCE(can_create, FALSE)) AS can_create,
       |    BOOL_OR(COALESCE(can_write, FALSE)) AS can_write
       |  FROM perms0 GROUP BY 1, 2),
       |writes AS (SELECT
       |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'alice'
       |         WHEN 1 THEN 'bob' ELSE 'carol' END AS user_id,
       |    source AS type_id
       |  FROM documents),
       |cls AS (SELECT w.user_id, w.type_id,
       |    CASE
       |      WHEN w.type_id IN ($existing) AND COALESCE(p.can_write, FALSE)
       |        THEN 'ALLOWED'
       |      WHEN w.type_id NOT IN ($existing) AND COALESCE(p.can_create, FALSE)
       |        THEN 'ALLOWED'
       |      WHEN w.type_id IN ($existing) THEN 'WriteForbidden'
       |      ELSE 'CreateForbidden' END AS decision
       |  FROM writes w LEFT JOIN perms p
       |    ON p.user_id = w.user_id AND p.type_id = w.type_id)
       |SELECT user_id, type_id, decision, COUNT(*) AS n
       |FROM cls GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  val sql: Map[String, String] = Map(
    // --- CRUD / engine semantics -----------------------------------
    "q_point_lookup" ->
      "SELECT * FROM customer WHERE c_custkey = 42",

    "q_scan_list" ->
      "SELECT * FROM region ORDER BY r_regionkey",

    "q_count" ->
      "SELECT COUNT(*) AS n FROM lineitem",

    "q_delete_anti" ->
      """SELECT o.* FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c
        |  WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_upsert_lww" ->
      """SELECT user_id, event_id, ts, value FROM (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_snapshot_diff" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |             event_type, value FROM events),
        |lb AS (SELECT user_id, event_id, ts, event_type, value FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM e WHERE event_id <= 7000) WHERE rn = 1),
        |la AS (SELECT user_id, event_id, ts, event_type, value FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM e WHERE event_id > 3000) WHERE rn = 1),
        |d AS (SELECT COALESCE(lb.user_id, la.user_id) AS user_id,
        |  CASE WHEN lb.user_id IS NULL THEN 'insert'
        |       WHEN la.user_id IS NULL THEN 'delete'
        |       WHEN lb.event_id IS DISTINCT FROM la.event_id
        |         OR lb.ts IS DISTINCT FROM la.ts
        |         OR lb.event_type IS DISTINCT FROM la.event_type
        |         OR lb.value IS DISTINCT FROM la.value THEN 'update'
        |  END AS change,
        |  lb.event_id AS event_id_before, la.event_id AS event_id_after,
        |  lb.ts AS ts_before, la.ts AS ts_after,
        |  lb.event_type AS event_type_before, la.event_type AS event_type_after,
        |  lb.value AS value_before, la.value AS value_after
        |FROM lb FULL JOIN la ON lb.user_id = la.user_id)
        |SELECT * FROM d WHERE change IS NOT NULL ORDER BY user_id""".stripMargin,

    "q_patch_merge" ->
      """WITH p AS (SELECT o_custkey AS c_custkey, 0.0 AS c_acctbal
        |           FROM orders GROUP BY o_custkey HAVING COUNT(*) > 3)
        |SELECT COALESCE(b.c_custkey, p.c_custkey) AS c_custkey,
        |       COALESCE(p.c_acctbal, b.c_acctbal) AS c_acctbal,
        |       b.c_name AS c_name
        |FROM customer b FULL OUTER JOIN p ON b.c_custkey = p.c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q_flatten_props" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS props__k
        |FROM events ORDER BY event_id""".stripMargin,

    // serving-direction unflatten: the oracle builds the identical JSON
    // string (sorted keys, nulls stripped, whole `user` object absent
    // when both its leaves are null) straight from the base columns
    "q_unflatten_json" ->
      """WITH b AS (SELECT event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |    event_type,
        |    CASE WHEN event_type <> 'error' THEN user_id END AS id,
        |    CASE WHEN value >= 100 THEN CAST(FLOOR(value) AS BIGINT) END AS score
        |  FROM events)
        |SELECT event_id,
        |  '{"k":' || k || ',"type":"' || event_type || '"' ||
        |  CASE WHEN id IS NULL AND score IS NULL THEN ''
        |    ELSE ',"user":{' ||
        |      CASE WHEN id IS NOT NULL THEN '"id":' || id ELSE '' END ||
        |      CASE WHEN id IS NOT NULL AND score IS NOT NULL THEN ',' ELSE '' END ||
        |      CASE WHEN score IS NOT NULL THEN '"score":' || score ELSE '' END ||
        |      '}'
        |  END || '}' AS object
        |FROM b ORDER BY event_id""".stripMargin,

    "q_required_filter" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE user_id IS NOT NULL ORDER BY event_id""".stripMargin,

    // S24 read-permission gate: grant matrix as a VALUES literal generated
    // from the same Seq the Spark query uses; can_read=false and missing
    // rows both deny (the 403 contract)
    "q_permissions_gate" -> permissionsGateSql,
    "q_permissions_write_gate" -> permissionsWriteGateSql,

    "q_null_strip" ->
      """SELECT event_id, v FROM (
        |  SELECT event_id, CASE WHEN value < 100.0 THEN NULL ELSE value END AS v
        |  FROM events) WHERE v IS NOT NULL ORDER BY event_id""".stripMargin,

    "q_cast_coerce" ->
      """SELECT event_id, CAST(user_id AS VARCHAR) AS user_str,
        |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value_2dp,
        |  CAST(event_id AS DOUBLE) AS id_double
        |FROM events ORDER BY event_id""".stripMargin,

    "q_engine_ingest" ->
      """SELECT event_id, user_id, value,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(ts AS TIMESTAMP) AS ts
        |FROM events WHERE event_type = 'signup' ORDER BY event_id""".stripMargin,

    // compaction must not change the serving answer — same oracle as ingest
    "q_engine_compact" ->
      """SELECT event_id, user_id, value,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(ts AS TIMESTAMP) AS ts
        |FROM events WHERE event_type = 'signup' AND event_id <= 2000
        |ORDER BY event_id""".stripMargin,

    // vacuum at the post-gen-2 horizon: gens 1-2 collapse to their LWW
    // winners (one surviving version), gen 3 (ids <= 500) survives
    // verbatim ON TOP of the collapsed winner (two versions); the served
    // value/ts are the overall LWW regardless
    "q_engine_vacuum" ->
      """WITH b AS (SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'signup' AND event_id <= 2000)
        |SELECT event_id, user_id,
        |  CASE WHEN event_id <= 500 THEN value + 2000
        |       WHEN event_id <= 1000 THEN value + 500 ELSE value END AS value,
        |  CASE WHEN event_id <= 500 THEN ts + INTERVAL 2 HOUR
        |       WHEN event_id <= 1000 THEN ts + INTERVAL 1 HOUR ELSE ts END AS ts,
        |  CAST(CASE WHEN event_id <= 500 THEN 2 ELSE 1 END AS BIGINT) AS n_versions
        |FROM b ORDER BY event_id""".stripMargin,

    // LWW across the two physical zones: overwritten ids (odd, ≤750)
    // serve the L0 micro-append's version (value+1000, ts+1 day), the
    // rest serve the compacted bucketed generation
    "q_engine_l0_lww" ->
      """WITH b AS (SELECT event_id, user_id, value,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |    CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'signup' AND event_id <= 1500)
        |SELECT event_id, user_id,
        |  CASE WHEN event_id <= 750 AND event_id % 2 = 1
        |    THEN value + 1000 ELSE value END AS value,
        |  k,
        |  CASE WHEN event_id <= 750 AND event_id % 2 = 1
        |    THEN ts + INTERVAL 1 DAY ELSE ts END AS ts
        |FROM b ORDER BY event_id""".stripMargin,

    // the pinned snapshot must serve the ORIGINAL values — the second
    // generation (value+1000, ts+1 day) is invisible at the as-of epoch
    "q_engine_timetravel" ->
      """SELECT event_id, user_id, value,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(ts AS TIMESTAMP) AS ts
        |FROM events WHERE event_type = 'signup' AND event_id <= 1000
        |ORDER BY event_id""".stripMargin,

    // full audit log: version 1 = the insert, version 2 = the overwrite
    // (value+1000, ts+1 day) — LWW-ascending ordinals per id
    "q_engine_history" ->
      """WITH b AS (SELECT event_id, user_id, value,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |    CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'signup' AND event_id <= 600)
        |SELECT event_id, 1 AS version, user_id, value, k, ts FROM b
        |UNION ALL
        |SELECT event_id, 2 AS version, user_id, value + 1000 AS value, k,
        |  ts + INTERVAL 1 DAY AS ts FROM b
        |ORDER BY event_id, version""".stripMargin,

    // the classified CDC delta between the two pins: every 3rd id updates
    // value -> value+1000 (a null value folds to null = no change, hence
    // the IS NOT NULL guard matching the null-safe-equality diff), every
    // 5th id re-inserts under a key-shifted id; unchanged ids are absent
    "q_engine_changes" ->
      """WITH b AS (SELECT event_id, value FROM events
        |  WHERE event_type = 'signup' AND event_id <= 1200)
        |SELECT event_id, 'update' AS change,
        |  value AS value_before, value + 1000 AS value_after
        |FROM b WHERE event_id % 3 = 0 AND value IS NOT NULL
        |UNION ALL
        |SELECT event_id + 1000000 AS event_id, 'insert' AS change,
        |  CAST(NULL AS DOUBLE) AS value_before, value AS value_after
        |FROM b WHERE event_id % 5 = 0
        |ORDER BY event_id""".stripMargin,

    // delete tombstones across all three read surfaces: cdc = deletes
    // (every 3rd id, true before-image) + resurrect-updates (every 6th,
    // value+5000, null values fold to no-change like q_engine_changes);
    // served = post-compact state with deleted ids ABSENT even after a
    // late old-timestamp append (tombstones retained through compaction);
    // history (ids <= 120) = audit log with flagged tombstone versions,
    // late rows (value+9000, original ts) LWW-ordered below them
    "q_engine_delete" ->
      """WITH b AS (SELECT event_id, value FROM events
        |  WHERE event_type = 'signup' AND event_id <= 1200)
        |SELECT event_id, 'cdc' AS phase, 'update' AS change,
        |  value AS value_before, value + 5000 AS value,
        |  CAST(NULL AS BOOLEAN) AS is_deleted, CAST(NULL AS INT) AS version
        |FROM b WHERE event_id % 6 = 0 AND value IS NOT NULL
        |UNION ALL
        |SELECT event_id, 'cdc', 'delete', value, CAST(NULL AS DOUBLE),
        |  CAST(NULL AS BOOLEAN), CAST(NULL AS INT)
        |FROM b WHERE event_id % 3 = 0 AND event_id % 6 <> 0
        |UNION ALL
        |SELECT event_id, 'served', CAST(NULL AS VARCHAR),
        |  CAST(NULL AS DOUBLE),
        |  CASE WHEN event_id % 6 = 0 THEN value + 5000 ELSE value END,
        |  CAST(NULL AS BOOLEAN), CAST(NULL AS INT)
        |FROM b WHERE NOT (event_id % 3 = 0 AND event_id % 6 <> 0)
        |UNION ALL
        |SELECT event_id, 'history', CAST(NULL AS VARCHAR),
        |  CAST(NULL AS DOUBLE),
        |  CASE WHEN event_id % 6 = 0 THEN value + 5000
        |       WHEN event_id % 15 = 0 THEN value + 9000
        |       WHEN event_id % 3 = 0 THEN CAST(NULL AS DOUBLE)
        |       ELSE value END,
        |  event_id % 3 = 0 AND event_id % 6 <> 0 AND event_id % 15 <> 0,
        |  CAST(1 AS INT)
        |FROM b WHERE event_id <= 120
        |UNION ALL
        |SELECT event_id, 'history', CAST(NULL AS VARCHAR),
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), TRUE, CAST(2 AS INT)
        |FROM b WHERE event_id <= 120
        |  AND event_id % 15 = 0 AND event_id % 6 <> 0
        |ORDER BY phase, event_id, version NULLS FIRST""".stripMargin,

    "q_retention_cohort" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |c AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        |      FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week FROM e)
        |SELECT cohort_week, activity_week, COUNT(DISTINCT a.user_id) AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_merge_into" ->
      """WITH s0 AS (SELECT o_custkey AS c_custkey,
        |        CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS c_acctbal,
        |        COUNT(*) AS n
        |      FROM orders GROUP BY o_custkey),
        |s AS (SELECT * FROM s0
        |      UNION ALL
        |      SELECT c_custkey + 3000000, c_acctbal, n FROM s0 WHERE n > 12),
        |m AS (SELECT t.c_custkey AS tk, s.c_custkey AS sk, t.c_name AS c_name,
        |             t.c_acctbal AS t_bal, s.c_acctbal AS s_bal, s.n AS n
        |      FROM customer t FULL OUTER JOIN s ON t.c_custkey = s.c_custkey)
        |SELECT COALESCE(tk, sk) AS c_custkey, c_name,
        |       CASE WHEN sk IS NOT NULL THEN s_bal ELSE t_bal END AS c_acctbal
        |FROM m
        |WHERE NOT (tk IS NOT NULL AND sk IS NOT NULL AND n > 15)
        |ORDER BY c_custkey""".stripMargin,

    "q_engine_point_lookup" ->
      """WITH sl AS (SELECT event_id, user_id, value FROM events
        |            WHERE event_type = 'signup' AND event_id <= 500)
        |SELECT event_id, user_id, value FROM sl
        |WHERE event_id = (SELECT MIN(event_id) FROM sl)
        |ORDER BY event_id""".stripMargin,

    "q_schema_union_evolve" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       NULL AS l_extendedprice, 'a' AS src FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, NULL, l_extendedprice, 'b' FROM lineitem
        |ORDER BY src, l_orderkey, l_linenumber,
        |  l_quantity NULLS FIRST, l_extendedprice NULLS FIRST""".stripMargin,

    // --- Projection / filter ---------------------------------------
    "q_project_filter" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_quantity > 30.0 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin,

    "q_pred_range_time" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
        |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-12 00:00:00'
        |ORDER BY event_id""".stripMargin,

    "q_sink_roundtrip" ->
      """SELECT e.event_id, e.user_id, e.event_type, e.value, f.fmt
        |FROM events e CROSS JOIN (VALUES ('csv'), ('json'), ('orc')) AS f(fmt)
        |WHERE e.event_id <= 2000
        |ORDER BY fmt, event_id""".stripMargin,

    // --- Joins ------------------------------------------------------
    "q_join_inner_broadcast" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_sortmerge" ->
      """SELECT l_orderkey, l_linenumber, o_orderdate, l_quantity
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber, o_orderdate, l_quantity""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,

    "q_join_bucketed" ->
      s"""SELECT c_custkey, c_name, COUNT(*) AS n_orders,
         |  ${dsum("o_totalprice")} AS total_spend
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    // replicates the cogroup's integer-grid arithmetic: ROUND(p*1e6) is
    // half-up for positives in BOTH java's math.round and DuckDB's ROUND
    "q_cogroup_stats" ->
      """SELECT c_custkey, c_name, COUNT(o_custkey) AS n_orders,
        |  COALESCE(MAX(o_totalprice), 0.0) AS max_price,
        |  COALESCE(SUM(CAST(ROUND(o_totalprice * 1e6, 0) AS BIGINT)), 0) / 1e6
        |    AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "q_join_full_outer" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM (SELECT * FROM customer WHERE c_custkey % 3 <> 0) c
        |FULL JOIN (SELECT * FROM orders WHERE o_orderkey % 2 = 0) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin,

    "q_join_semi" ->
      """SELECT c.* FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_bloom_semi" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem l
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderkey = l.l_orderkey)
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,

    "q_zorder_scan" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
        |FROM lineitem
        |WHERE l_partkey BETWEEN 10 AND 150 AND l_suppkey BETWEEN 1 AND 7
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity""".stripMargin,

    "q_join_anti" ->
      """SELECT c.* FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_orderstatus = 'P' AND o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_theta_range" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id FROM events)
        |SELECT a.event_id AS event_id, COUNT(b.event_id) AS n_prior
        |FROM e a LEFT JOIN e b ON a.user_id = b.user_id
        |  AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts < a.ts
        |GROUP BY a.event_id ORDER BY event_id""".stripMargin,

    "q_join_asof" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_type FROM events),
        |l AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
        |r0 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |         ORDER BY event_id DESC) AS rn
        |       FROM e WHERE event_type = 'signup'),
        |r AS (SELECT user_id, ts, event_id AS signup_event_id, value AS signup_value
        |      FROM r0 WHERE rn = 1)
        |SELECT l.event_id, l.user_id, r.signup_event_id, r.signup_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts
        |ORDER BY l.event_id""".stripMargin,

    // point-in-time: each purchase joined to the SCD2 version whose
    // [valid_from, valid_to) interval contains its ts — exactly one match
    "q_join_point_in_time" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |             CAST(ts AS TIMESTAMP) AS ts FROM events),
        |c AS (SELECT *, LAG(event_type) OVER w AS prev FROM e
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |ch AS (SELECT user_id, event_id, event_type, ts FROM c
        |       WHERE prev IS DISTINCT FROM event_type),
        |v AS (SELECT user_id, event_id AS dim_event_id,
        |        event_type AS state, ts AS valid_from,
        |        LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |          AS valid_to
        |      FROM ch),
        |f AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase')
        |SELECT f.event_id, f.user_id, v.state, v.dim_event_id, v.valid_from
        |FROM f JOIN v ON f.user_id = v.user_id AND f.ts >= v.valid_from
        |  AND (v.valid_to IS NULL OR f.ts < v.valid_to)
        |ORDER BY f.event_id""".stripMargin,

    "q_join_interval_overlap" ->
      // <= matches Spark's inclusive session merge at the exact gap
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
        |st AS (SELECT *, CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE
        |        THEN 0 ELSE 1 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS grp FROM st),
        |s AS (SELECT user_id, MIN(ts) AS s0, MAX(ts) + INTERVAL 30 MINUTE AS s1
        |      FROM g GROUP BY user_id, grp HAVING COUNT(*) >= 2)
        |SELECT a.user_id AS user_a, a.s0 AS start_a,
        |       b.user_id AS user_b, b.s0 AS start_b
        |FROM s a JOIN s b ON a.user_id < b.user_id
        |  AND a.s0 < b.s1 AND b.s0 < a.s1
        |ORDER BY user_a, start_a, user_b, start_b""".stripMargin,

    "q_resample_ffill" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |b AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS h0,
        |             date_trunc('hour', MAX(ts)) AS h1 FROM e GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS ts FROM b),
        |r0 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |         ORDER BY event_id DESC) AS rn FROM e),
        |r AS (SELECT user_id, ts, value AS value_ffill FROM r0 WHERE rn = 1)
        |SELECT g.user_id, g.ts, r.value_ffill
        |FROM grid g ASOF LEFT JOIN r ON g.user_id = r.user_id AND r.ts <= g.ts
        |ORDER BY g.user_id, g.ts""".stripMargin,

    // linear interpolation between the enclosing LWW series points; DuckDB
    // finds the neighbors with two native ASOF joins (at-or-before /
    // strictly-after) against the SAME deduped series the Spark windows
    // read — identical IEEE expression tree, so the values hash-match
    "q_resample_interp" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    value FROM events),
        |b AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS h0,
        |             date_trunc('hour', MAX(ts)) AS h1 FROM e GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS ts FROM b),
        |r0 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |         ORDER BY event_id DESC) AS rn FROM e),
        |r AS (SELECT user_id, ts, value FROM r0 WHERE rn = 1),
        |p AS (SELECT g.user_id, g.ts, r.ts AS t0, r.value AS v0
        |      FROM grid g ASOF LEFT JOIN r
        |        ON g.user_id = r.user_id AND r.ts <= g.ts),
        |n AS (SELECT g.user_id, g.ts, r.ts AS t1, r.value AS v1
        |      FROM grid g ASOF LEFT JOIN r
        |        ON g.user_id = r.user_id AND r.ts > g.ts)
        |SELECT p.user_id, p.ts,
        |  CASE WHEN p.t0 IS NOT NULL AND n.t1 IS NOT NULL THEN
        |    ROUND(p.v0 + (n.v1 - p.v0) *
        |      (CAST(epoch_us(p.ts) - epoch_us(p.t0) AS DOUBLE)
        |       / CAST(epoch_us(n.t1) - epoch_us(p.t0) AS DOUBLE)), 6)
        |  WHEN p.t0 IS NOT NULL THEN ROUND(p.v0, 6)
        |  ELSE ROUND(n.v1, 6) END AS value_interp
        |FROM p JOIN n ON n.user_id = p.user_id AND n.ts = p.ts
        |ORDER BY p.user_id, p.ts""".stripMargin,

    // per-group OLS trend: exact integer sufficient statistics (HUGEINT
    // product sums mirror Spark's DECIMAL(38) accumulators), identical
    // IEEE finishing tree, scale-0 rounds
    "q_trend_ols" -> trendOlsSql,

    // entity-resolution clusters: vocabulary-scale fuzzy name pairs →
    // recursive-CTE transitive closure → every part labeled; the
    // q_dedup_cluster reachability pattern over the q_join_fuzzy blocking
    "q_er_cluster" ->
      """WITH RECURSIVE
        |n AS (SELECT p_name, MIN(p_partkey) AS nid,
        |    split_part(p_name, ' ', 1) AS blk1,
        |    split_part(p_name, ' ', 2) AS blk2 FROM part GROUP BY p_name),
        |e AS (SELECT DISTINCT src, dst FROM (
        |  SELECT a.nid AS src, b.nid AS dst FROM n a JOIN n b
        |    ON a.blk1 = b.blk1 AND a.nid < b.nid
        |    AND levenshtein(a.p_name, b.p_name) <= 3
        |  UNION ALL
        |  SELECT a.nid AS src, b.nid AS dst FROM n a JOIN n b
        |    ON a.blk2 = b.blk2 AND a.nid < b.nid
        |    AND levenshtein(a.p_name, b.p_name) <= 3)),
        |und AS (SELECT src AS a, dst AS b FROM e UNION ALL SELECT dst, src FROM e),
        |nodes AS (SELECT DISTINCT a AS id FROM und),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT und.b AS id, reach.r FROM reach JOIN und ON und.a = reach.id),
        |lbl AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
        |f AS (SELECT p.p_partkey, p.p_name, COALESCE(l.comp, n.nid) AS cluster_id
        |      FROM part p JOIN n ON n.p_name = p.p_name
        |      LEFT JOIN lbl l ON l.id = n.nid)
        |SELECT p_partkey, p_name, cluster_id,
        |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM f ORDER BY p_partkey""".stripMargin,

    // U-shaped attribution: 40/40 first/last, middles split the 20% with
    // truncating shares, remainder folded into the LAST touch — credits
    // per conversion telescope to exactly 1e6 in both engines
    "q_attribution" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    event_type FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, ts AS pts FROM e
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, ts AS cts FROM e
        |  WHERE event_type = 'click'),
        |t AS (SELECT p.purchase_id, c.click_id, c.cts
        |  FROM p JOIN c USING (user_id)
        |  WHERE c.cts <= p.pts AND c.cts > p.pts - INTERVAL 7 DAY),
        |r AS (SELECT purchase_id, click_id,
        |    ROW_NUMBER() OVER (PARTITION BY purchase_id
        |      ORDER BY cts, click_id) AS touch_rank,
        |    COUNT(*) OVER (PARTITION BY purchase_id) AS n_touches
        |  FROM t)
        |SELECT purchase_id, click_id, touch_rank, n_touches,
        |  CASE WHEN n_touches = 1 THEN 1000000
        |       WHEN n_touches = 2 THEN 500000
        |       WHEN touch_rank = 1 THEN 400000
        |       WHEN touch_rank = n_touches
        |         THEN 400000 + 200000 % (n_touches - 2)
        |       ELSE 200000 // (n_touches - 2) END AS credit_ppm
        |FROM r ORDER BY purchase_id, touch_rank""".stripMargin,

    // --- Aggregation ------------------------------------------------
    "q_agg_hash" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsum("l_quantity")} AS sum_qty,
         |  ${dsum("l_extendedprice")} AS sum_base_price,
         |  ${dsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${dsum("l_quantity")} / COUNT(l_quantity) AS avg_qty,
         |  ${dsum("l_extendedprice")} / COUNT(l_extendedprice) AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_pivot" ->
      """SELECT l_returnflag,
        |  COUNT(*) FILTER (WHERE l_linestatus = 'F') AS "F",
        |  COUNT(*) FILTER (WHERE l_linestatus = 'O') AS "O"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_skew_salted_agg" ->
      """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_skew_salted_join" ->
      """SELECT c_custkey, c_nationkey AS nationkey, n_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin,

    "q_agg_collect_sorted" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "q_win_ntile" ->
      """SELECT o_orderkey, o_totalprice,
        |  NTILE(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
        |  CUME_DIST() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS cd
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_agg_stats" ->
      """WITH m AS (SELECT l_returnflag,
        |  CAST(COUNT(*) AS DOUBLE) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS sxy
        |FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  ROUND((sxx - sx*sx/n)/(n-1.0), 6) AS var_qty,
        |  ROUND(SQRT((sxx - sx*sx/n)/(n-1.0)), 6) AS stddev_qty,
        |  ROUND((sxy - sx*sy/n)/(n-1.0), 4) AS covar_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q_funnel" ->
      """SELECT user_id, first_signup, first_purchase, n_purchases,
        |  (first_signup IS NOT NULL AND first_purchase IS NOT NULL
        |   AND first_purchase > first_signup) AS converted
        |FROM (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END) AS first_signup,
        |    MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS first_purchase,
        |    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases
        |  FROM events GROUP BY user_id)
        |ORDER BY user_id""".stripMargin,

    // equi-depth histogram: decile bounds rounded 6 (the shared-bound
    // winsorize precedent), strict-less bucket rule, raw min/max (pure
    // selection over identical input doubles)
    "q_histogram_equidepth" ->
      """WITH b AS (SELECT list_transform(
        |    quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
        |    x -> ROUND(x, 6)) AS bs FROM events),
        |r AS (SELECT e.value,
        |    len(list_filter(b.bs, x -> x < e.value)) + 1 AS bucket
        |  FROM events e, b)
        |SELECT bucket, COUNT(*) AS n_rows, MIN(value) AS lo, MAX(value) AS hi
        |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        |  ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // both engines clip against the SAME rounded bound, so the raw-double
    // comparisons and least/greatest are IEEE-identical
    "q_winsorize" ->
      """WITH b AS (SELECT l_returnflag,
        |    ROUND(quantile_cont(l_extendedprice, 0.05), 6) AS lo,
        |    ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS hi
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |  LEAST(GREATEST(l_extendedprice, lo), hi) AS clipped,
        |  (l_extendedprice < lo OR l_extendedprice > hi) AS was_clipped
        |FROM lineitem l JOIN b USING (l_returnflag)
        |ORDER BY 1, 2, 3, 4, 5, 6""".stripMargin,

    "q_agg_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_minmax" ->
      """SELECT l_returnflag, MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
        |  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // exact heavy hitters: the Spark side's MG-candidates + exact-count
    // two-pass must equal the straight group-count-having
    "q_agg_heavy_hitters" -> heavyHittersSql,

    // the streaming mergeable-sketch fold + exact finishing pass is
    // constructed to equal batch exact heavy hitters — shared verbatim
    "q_stream_heavy_hitters" -> heavyHittersSql,

    "q_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${dsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${dsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_profile_table" ->
      s"""WITH s AS (SELECT
         |  CAST(COUNT(*) AS DOUBLE) AS n_rows,
         |  CAST(COUNT(value) AS DOUBLE) AS value_non_null,
         |  CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS user_id_distinct,
         |  CAST(COUNT(DISTINCT event_type) AS DOUBLE) AS event_type_distinct,
         |  MIN(value) AS value_min, MAX(value) AS value_max,
         |  ${dsum("value")} AS value_sum,
         |  CAST(MIN(event_id) AS DOUBLE) AS event_id_min,
         |  CAST(MAX(event_id) AS DOUBLE) AS event_id_max
         |  FROM events)
         |SELECT 'n_rows' AS metric, n_rows AS value FROM s
         |UNION ALL SELECT 'value_non_null', value_non_null FROM s
         |UNION ALL SELECT 'user_id_distinct', user_id_distinct FROM s
         |UNION ALL SELECT 'event_type_distinct', event_type_distinct FROM s
         |UNION ALL SELECT 'value_min', value_min FROM s
         |UNION ALL SELECT 'value_max', value_max FROM s
         |UNION ALL SELECT 'value_sum', value_sum FROM s
         |UNION ALL SELECT 'event_id_min', event_id_min FROM s
         |UNION ALL SELECT 'event_id_max', event_id_max FROM s
         |ORDER BY metric""".stripMargin,

    "q_outliers_zscore" ->
      """WITH st AS (SELECT event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS mean,
        |    SQRT((CAST(SUM(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE)
        |      - CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
        |        * CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
        |        / CAST(COUNT(*) AS DOUBLE))
        |      / (CAST(COUNT(*) AS DOUBLE) - 1.0)) AS sd
        |  FROM events GROUP BY event_type)
        |SELECT event_id, e.event_type, value,
        |  ROUND((value - mean) / sd, 6) AS z
        |FROM events e JOIN st ON e.event_type = st.event_type
        |WHERE ABS(value - mean) > 3.0 * sd
        |ORDER BY event_id""".stripMargin,

    "q_agg_argmax" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |  lpad(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), 12, '0')
        |    || lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS rnk
        |  FROM orders)
        |SELECT o_custkey, arg_max(o_orderkey, rnk) AS top_orderkey,
        |  MAX(o_totalprice) AS top_price,
        |  arg_min(o_orderkey, rnk) AS bottom_orderkey
        |FROM o GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_histogram" ->
      // CASE hi=lo guard mirrors the Spark side: constant-valued data would
      // otherwise make the bin NaN (DuckDB errors on CAST(NaN AS BIGINT))
      s"""WITH s AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
         |SELECT CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
         |  ELSE LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / 20)) AS BIGINT), 19) END AS bin,
         |  COUNT(*) AS n, ${dsum("value")} AS sum_value
         |FROM events, s GROUP BY 1 ORDER BY bin""".stripMargin,

    // --- Window functions -------------------------------------------
    "q_win_rank_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,

    "q_topk_udaf" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,

    "q_win_lag_delta" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
        |SELECT event_id, user_id,
        |  value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
        |FROM e ORDER BY event_id""".stripMargin,

    "q_win_range_frame" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
        |SELECT event_id, user_id, ts, value,
        |  CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER (PARTITION BY user_id
        |    ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS sum_1h
        |FROM e ORDER BY user_id, ts, event_id""".stripMargin,

    "q_win_distribution" ->
      """SELECT event_id, event_type, value,
        |  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
        |  FIRST_VALUE(value) OVER w AS first_value,
        |  NTH_VALUE(value, 3) OVER w AS third_value
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_type, value, event_id""".stripMargin,

    "q_win_frame_running_sum" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
        |SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
        |FROM e ORDER BY event_id""".stripMargin,

    // --- Sort / limit / set ops -------------------------------------
    "q_topk_orderby_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "q_union_all" ->
      """SELECT o_orderkey, 'status_f' AS src FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, 'urgent' FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY src, o_orderkey""".stripMargin,

    "q_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q_except" ->
      """SELECT n_nationkey AS nationkey FROM nation
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    // --- Scalar functions -------------------------------------------
    "q_str_funcs" ->
      """SELECT p_partkey, UPPER(p_name) AS uname, SUBSTR(p_name, 1, 5) AS prefix5,
        |  LENGTH(p_name) AS name_len, CONCAT(p_brand, '#', p_type) AS brand_type,
        |  REPLACE(p_type, ' ', '_') AS type_snake
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_date_trunc_bucket" ->
      s"""SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, COUNT(*) AS n,
         |  ${dsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber, ABS(l_discount - 0.05) AS abs_disc,
        |  CAST(CEIL(l_extendedprice) AS BIGINT) AS ceil_price,
        |  CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_price,
        |  SQRT(l_quantity) AS sqrt_qty, l_quantity % 7.0 AS qty_mod7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, ceil_price, abs_disc,
        |  sqrt_qty, qty_mod7, floor_price""".stripMargin,

    "q_array_funcs" ->
      """SELECT vec_id, len(embedding) AS n_dims,
        |  CAST(embedding[1] AS DOUBLE) AS e0,
        |  CAST(list_max(embedding) AS DOUBLE) AS e_max,
        |  CAST(list_min(embedding) AS DOUBLE) AS e_min
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_hof_funcs" ->
      """SELECT vec_id,
        |  CAST(COALESCE(list_sum(list_transform(
        |    list_filter(embedding, x -> x IS NOT NULL),
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e6) AS BIGINT))), 0) AS DOUBLE) / 1e6 AS sum_fixed,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |  len(list_filter(embedding, x -> x > CAST(0.4 AS FLOAT))) > 0 AS any_big,
        |  ROUND(CAST(embedding[1] AS DOUBLE) * 2.0, 6) AS e0_doubled
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_explode_lateral" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS sp
        |  FROM documents WHERE doc_id < 100),
        |u AS (SELECT doc_id, unnest(sp) AS word,
        |    CAST(generate_subscripts(sp, 1) - 1 AS INT) AS word_pos FROM t)
        |SELECT doc_id, word_pos, word FROM u
        |WHERE length(word) > 0
        |ORDER BY doc_id, word_pos""".stripMargin,

    "q_date_cond_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT) AS days_to_end,
        |  CASE WHEN o_orderstatus = 'F' THEN 'final'
        |       WHEN o_orderstatus = 'O' THEN 'open'
        |       ELSE 'partial' END AS status_label,
        |  COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'unspecified') AS priority_or_default,
        |  GREATEST(o_totalprice, 100000.0) AS price_floor
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_map_funcs" ->
      """SELECT event_id,
        |  array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
        |  json_extract_string(props, '$.k') IS NOT NULL AS has_k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_json_get" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    // --- Streaming-equivalent event-time windows --------------------
    "q_window_tumbling" ->
      s"""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events)
         |SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
         |  time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
         |  event_type, COUNT(*) AS n, ${dsum("value")} AS sum_value
         |FROM e GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin,

    "q_session_islands" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |b AS (SELECT event_id, user_id, ts,
        |    CASE WHEN us - LAG(us) OVER w > 1800000000
        |           OR LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS boundary
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id, ts,
        |  CAST(SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |FROM b ORDER BY user_id, ts, event_id""".stripMargin,

    // Streaming declared queries: outputs are micro-batch-invariant, so the
    // oracles are the equivalent one-shot batch SQL.
    "q_stream_tumbling" ->
      s"""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events)
         |SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
         |  time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
         |  event_type, COUNT(*) AS n, ${dsum("value")} AS sum_value
         |FROM e GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin,

    "q_stream_engine_ingest" ->
      """SELECT event_id, user_id, value,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(ts AS TIMESTAMP) AS ts
        |FROM events WHERE event_type = 'signup' AND event_id <= 1500
        |ORDER BY event_id""".stripMargin,

    // mid-stream compaction maintenance must never change the serving
    // answer, only the file layout — same oracle shape, smaller slice
    "q_stream_compact" ->
      """SELECT event_id, user_id, value,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(ts AS TIMESTAMP) AS ts
        |FROM events WHERE event_type = 'signup' AND event_id <= 1000
        |ORDER BY event_id""".stripMargin,

    "q_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    // watermarked variant: horizon spans the fixture, so bounded-state
    // execution must still produce exactly the distinct key set
    "q_stream_dedup_watermark" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    // the Spark side streams events PLUS a planted late marker row (user
    // −99, ts below the watermark horizon) that must be dropped; the oracle
    // covers the real events only — the implicit anti-filter IS the gate
    "q_stream_late_drop" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    // stateless stream-static broadcast join: append output trivially
    // equals the batch join
    "q_stream_static_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |p AS (SELECT user_id, MIN(ts) AS first_ts, COUNT(*) AS n_events
        |      FROM e GROUP BY user_id)
        |SELECT e.event_id, e.user_id, e.ts, p.first_ts, p.n_events,
        |  e.ts = p.first_ts AS is_first
        |FROM e JOIN p USING (user_id)
        |ORDER BY event_id""".stripMargin,

    // append-mode stream-stream inner join emits each matched pair exactly
    // once, so the one-shot batch interval join hashes the streaming run
    "q_stream_stream_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |            CAST(ts AS TIMESTAMP) AS ts FROM events),
        |c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
        |      FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS buy_id, ts AS buy_ts
        |      FROM e WHERE event_type = 'purchase')
        |SELECT c.user_id, c.click_id, c.click_ts, p.buy_id, p.buy_ts
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.buy_ts >= c.click_ts
        |  AND p.buy_ts <= c.click_ts + INTERVAL 24 HOUR
        |ORDER BY c.user_id, click_id, buy_id""".stripMargin,

    // the left-outer variant: null-extended rows come from the streaming
    // join's state-eviction path; the batch LEFT interval join hashes it
    "q_stream_stream_join_outer" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |            CAST(ts AS TIMESTAMP) AS ts FROM events),
        |c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
        |      FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS buy_id, ts AS buy_ts
        |      FROM e WHERE event_type = 'purchase')
        |SELECT c.user_id, c.click_id, c.click_ts, p.buy_id, p.buy_ts
        |FROM c LEFT JOIN p ON c.user_id = p.user_id
        |  AND p.buy_ts >= c.click_ts
        |  AND p.buy_ts <= c.click_ts + INTERVAL 24 HOUR
        |ORDER BY c.user_id, click_id, buy_id""".stripMargin,

    "q_stream_stream_join_full" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |            CAST(ts AS TIMESTAMP) AS ts FROM events),
        |c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
        |      FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS buy_id, ts AS buy_ts
        |      FROM e WHERE event_type = 'purchase')
        |SELECT COALESCE(c.user_id, p.user_id) AS user_id,
        |  c.click_id, c.click_ts, p.buy_id, p.buy_ts
        |FROM c FULL JOIN p ON c.user_id = p.user_id
        |  AND p.buy_ts >= c.click_ts
        |  AND p.buy_ts <= c.click_ts + INTERVAL 24 HOUR
        |ORDER BY user_id, click_id, buy_id""".stripMargin,

    "q_stream_lww" ->
      """SELECT user_id, event_id, ts, event_type, value FROM (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // the streaming change LOG over the per-(user, day) LWW state:
    // batch 0 = the state over the pre-cut half, all inserts; batch 1 =
    // null-safe diff of that state against the state over everything.
    // The cut replays Scala's noon-of-midpoint-day exactly (integer µs
    // arithmetic in both engines); unchanged keys must be ABSENT
    "q_stream_changes" ->
      """WITH e AS (SELECT user_id,
        |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS d, event_id, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu FROM events),
        |c AS (SELECT ((MIN(tsu) + MAX(tsu)) // 2 // 86400000000)
        |        * 86400000000 + 43200000000 AS cut FROM e),
        |st0 AS (SELECT user_id, d, value FROM (
        |    SELECT user_id, d, value, ROW_NUMBER() OVER (
        |      PARTITION BY user_id, d ORDER BY tsu DESC, event_id DESC) AS rn
        |    FROM e, c WHERE tsu < cut) WHERE rn = 1),
        |st1 AS (SELECT user_id, d, value FROM (
        |    SELECT user_id, d, value, ROW_NUMBER() OVER (
        |      PARTITION BY user_id, d ORDER BY tsu DESC, event_id DESC) AS rn
        |    FROM e) WHERE rn = 1),
        |d1 AS (SELECT * FROM (
        |    SELECT COALESCE(b.user_id, a.user_id) AS user_id,
        |      COALESCE(b.d, a.d) AS d, 1 AS batch,
        |      CASE WHEN b.user_id IS NULL THEN 'insert'
        |           WHEN a.user_id IS NULL THEN 'delete'
        |           WHEN b.value IS DISTINCT FROM a.value THEN 'update'
        |      END AS change,
        |      b.value AS value_before, a.value AS value_after
        |    FROM st0 b FULL OUTER JOIN st1 a
        |      ON b.user_id = a.user_id AND b.d = a.d)
        |  WHERE change IS NOT NULL)
        |SELECT user_id, d, batch, change, value_before, value_after FROM (
        |  SELECT user_id, d, 0 AS batch, 'insert' AS change,
        |    CAST(NULL AS DOUBLE) AS value_before, value AS value_after
        |  FROM st0
        |  UNION ALL SELECT * FROM d1)
        |ORDER BY batch, user_id, d""".stripMargin,

    // poison messages dead-letter and the stream continues: serving is
    // exactly the clean corpus — a leaked poison id (999991/999992) or a
    // crashed batch's missing rows breaks the row count/hash
    "q_stream_dead_letter" ->
      """SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts
        |FROM events WHERE event_type = 'signup' AND event_id <= 1200
        |ORDER BY event_id""".stripMargin,

    // reject-don't-widen: %4==0 overwrites are uncastable and quarantine
    // (serving keeps the ORIGINAL row, original timestamp); %4==1
    // overwrites coerce from numeric strings and land (+1000, +1 day)
    "q_stream_quarantine" ->
      """SELECT event_id, user_id,
        |  CASE WHEN event_id % 4 = 1 THEN value + 1000 ELSE value END AS value,
        |  CASE WHEN event_id % 4 = 1
        |    THEN CAST(ts AS TIMESTAMP) + INTERVAL 1 DAY
        |    ELSE CAST(ts AS TIMESTAMP) END AS ts
        |FROM events WHERE event_type = 'signup' AND event_id <= 1000
        |ORDER BY event_id""".stripMargin,

    // mid-stream evolution: `extra` exists only for batch-1 ids (> 700) —
    // a batch-0 row backfilled with a value, or a batch-1 value lost,
    // breaks the hash
    "q_stream_evolve" ->
      """SELECT event_id, user_id, value,
        |  CASE WHEN event_id > 700 THEN event_id * 7 END AS extra,
        |  CAST(ts AS TIMESTAMP) AS ts
        |FROM events WHERE event_type = 'signup' AND event_id <= 1400
        |ORDER BY event_id""".stripMargin,

    // the RECOVERED run must produce the exact same log the uninterrupted
    // pipeline would — same CDC construction as q_stream_changes, over
    // the signup slice the restart key streams
    "q_stream_changes_restart" ->
      """WITH e AS (SELECT user_id,
        |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS d, event_id, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu FROM events
        |  WHERE event_type = 'signup'),
        |c AS (SELECT ((MIN(tsu) + MAX(tsu)) // 2 // 86400000000)
        |        * 86400000000 + 43200000000 AS cut FROM e),
        |st0 AS (SELECT user_id, d, value FROM (
        |    SELECT user_id, d, value, ROW_NUMBER() OVER (
        |      PARTITION BY user_id, d ORDER BY tsu DESC, event_id DESC) AS rn
        |    FROM e, c WHERE tsu < cut) WHERE rn = 1),
        |st1 AS (SELECT user_id, d, value FROM (
        |    SELECT user_id, d, value, ROW_NUMBER() OVER (
        |      PARTITION BY user_id, d ORDER BY tsu DESC, event_id DESC) AS rn
        |    FROM e) WHERE rn = 1),
        |d1 AS (SELECT * FROM (
        |    SELECT COALESCE(b.user_id, a.user_id) AS user_id,
        |      COALESCE(b.d, a.d) AS d, 1 AS batch,
        |      CASE WHEN b.user_id IS NULL THEN 'insert'
        |           WHEN a.user_id IS NULL THEN 'delete'
        |           WHEN b.value IS DISTINCT FROM a.value THEN 'update'
        |      END AS change,
        |      b.value AS value_before, a.value AS value_after
        |    FROM st0 b FULL OUTER JOIN st1 a
        |      ON b.user_id = a.user_id AND b.d = a.d)
        |  WHERE change IS NOT NULL)
        |SELECT user_id, d, batch, change, value_before, value_after FROM (
        |  SELECT user_id, d, 0 AS batch, 'insert' AS change,
        |    CAST(NULL AS DOUBLE) AS value_before, value AS value_after
        |  FROM st0
        |  UNION ALL SELECT * FROM d1)
        |ORDER BY batch, user_id, d""".stripMargin,

    "q_window_sliding" -> slidingWindowSql,

    // the streaming run (stateful append-mode windowed agg, watermark-
    // flushed by sentinels) is constructed to equal the batch sliding
    // aggregate exactly, so it shares the oracle verbatim
    "q_stream_sliding" -> slidingWindowSql,

    "q_session_window" -> sessionWindowSql,

    // streaming sessionization is constructed to equal batch session_window
    // exactly (Declared.sessionWindows), so it shares the oracle verbatim
    "q_stream_session" -> sessionWindowSql,

    "q_scd2_history" -> scd2Sql,

    // the incremental fold is constructed to equal batch scd2 after every
    // micro-batch, so the streaming run shares the oracle verbatim
    "q_stream_scd2" -> scd2Sql,

    "q_dedup_exact" ->
      """SELECT md5(text) AS digest, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY digest""".stripMargin,

    "q_dedup_exact_normalized" -> dedupExactNormalizedSql,

    // --- Text analysis ----------------------------------------------
    "q_text_normalize_unicode" -> textNormalizeSql,
    "q_text_postings_indexed" -> textPostingsIndexedSql,
    "q_text_wordcount" ->
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word ORDER BY n DESC, word LIMIT 100""".stripMargin,

    "q_text_quality" ->
      """WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct_words,
        |  CAST(n_chars AS DOUBLE) / len(w) AS avg_word_len,
        |  CAST(len(list_filter(w, x -> list_contains(
        |    ['the','a','an','of','and','or','to','in','is','it'], x))) AS DOUBLE)
        |    / len(w) AS stopword_ratio,
        |  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dedup_ratio
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_text_token_count" ->
      """SELECT doc_id, len(regexp_split_to_array(text, '\s+')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_bpeish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_fingerprint" ->
      """SELECT doc_id, md5(array_to_string(
        |  list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_sample_hash" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 1) IN ('0', '1')
        |ORDER BY event_id""".stripMargin,

    "q_shuffle_deterministic" ->
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
        |FROM documents ORDER BY shuffle_key, doc_id LIMIT 200""".stripMargin,

    "q_text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm,
        |  CAST(length(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS BIGINT) AS n_chars_norm
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_sample_stratified" ->
      """SELECT lang, doc_id, rn FROM (
        |  SELECT lang, doc_id, ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) WHERE rn <= 20 ORDER BY lang, rn""".stripMargin,

    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |    len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_tok,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard
        |  FROM documents)
        |SELECT shard, doc_id, n_tok,
        |  CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) - n_tok) / 4096.0) AS BIGINT) AS bin
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_quality_filter" ->
      """WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents),
        |m AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dedup_ratio,
        |  CAST(len(list_filter(w, x -> list_contains(
        |    ['the','a','an','of','and','or','to','in','is','it'], x))) AS DOUBLE)
        |    / len(w) AS stopword_ratio
        |FROM t)
        |SELECT doc_id, n_words, dedup_ratio, stopword_ratio FROM m
        |WHERE n_words >= 10 AND dedup_ratio >= 0.3 AND stopword_ratio <= 0.5
        |ORDER BY doc_id""".stripMargin,

    "q_text_jaccard_neardup" ->
      """WITH t AS (SELECT doc_id, lang, source, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, lang, source,
        |        list_distinct(list_transform(range(1, greatest(len(w) - 3, 0) + 2),
        |          i -> array_to_string(w[i:i+2], ' '))) AS sh
        |      FROM t)
        |SELECT id_a, id_b, jac FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.sh, b.sh))) AS jac
        |  FROM s a JOIN s b ON a.lang = b.lang AND a.source = b.source
        |    AND a.doc_id < b.doc_id)
        |WHERE jac >= 0.03 ORDER BY id_a, id_b""".stripMargin,

    "q_text_pii_scrub" ->
      """WITH planted AS (SELECT doc_id,
        |  text || ' user' || CAST(doc_id AS VARCHAR) || '@example.com' ||
        |  ' +1-555-' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-' ||
        |  CAST(doc_id % 9000 + 1000 AS VARCHAR) ||
        |  ' 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' ||
        |  CAST(doc_id % 100 AS VARCHAR) AS text
        |FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text,
        |    '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(text,
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
        |    '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |FROM planted ORDER BY doc_id""".stripMargin,

    "q_sample_weighted" ->
      """WITH t AS (SELECT doc_id, n_chars AS weight,
        |    md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |c AS (SELECT doc_id, weight,
        |    CAST(SUM(weight) OVER (ORDER BY h, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM t)
        |SELECT doc_id, weight, cum FROM c
        |WHERE cum // 5000 > (cum - weight) // 5000
        |ORDER BY doc_id""".stripMargin,

    "q_corpus_report" ->
      """WITH t AS (SELECT source, lang, string_split(text, ' ') AS w,
        |    len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_tok
        |  FROM documents),
        |m AS (SELECT source, lang, n_tok, len(w) AS n_words,
        |    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dedup_ratio,
        |    CAST(len(list_filter(w, x -> list_contains(
        |      ['the','a','an','of','and','or','to','in','is','it'], x))) AS DOUBLE)
        |      / len(w) AS stopword_ratio
        |  FROM t)
        |SELECT source, lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
        |  CAST(SUM(CASE WHEN n_words >= 10 AND dedup_ratio >= 0.3
        |    AND stopword_ratio <= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        |FROM m GROUP BY ROLLUP(source, lang)
        |ORDER BY source NULLS FIRST, lang NULLS FIRST""".stripMargin,

    "q_unpivot" ->
      """WITH s AS (SELECT l_orderkey, l_linenumber, l_quantity,
        |    l_extendedprice, l_discount FROM lineitem WHERE l_orderkey <= 1000)
        |SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
        |  CAST(l_quantity AS DOUBLE) AS value FROM s
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice',
        |  l_extendedprice FROM s
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount',
        |  l_discount FROM s
        |ORDER BY l_orderkey, l_linenumber, measure, value""".stripMargin,

    "q_langid_eval" ->
      """WITH t AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS w
        |           FROM documents),
        |sc AS (SELECT doc_id, lang, unnest([
        |    {'cand': 'de', 'score': len(list_intersect(w, ['der','die','und','das','ist']))},
        |    {'cand': 'en', 'score': len(list_intersect(w, ['the','and','of','to','in']))},
        |    {'cand': 'es', 'score': len(list_intersect(w, ['el','la','de','que','y']))},
        |    {'cand': 'fr', 'score': len(list_intersect(w, ['le','la','les','et','des']))},
        |    {'cand': 'zh', 'score': len(list_intersect(w, ['的','是','了','在','我']))}
        |  ]) AS s FROM t),
        |r AS (SELECT doc_id, lang, s.cand AS pred_lang,
        |        ROW_NUMBER() OVER (PARTITION BY doc_id
        |          ORDER BY s.score DESC, s.cand ASC) AS rn
        |      FROM sc)
        |SELECT lang, pred_lang, COUNT(*) AS n FROM r WHERE rn = 1
        |GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin,

    "q_text_ngrams" ->
      """WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
        |n AS (SELECT unnest(list_transform(range(1, greatest(len(w) - 2, 0) + 2),
        |    i -> array_to_string(w[i:i+1], ' '))) AS ngram FROM t)
        |SELECT ngram, COUNT(*) AS n FROM n GROUP BY ngram
        |ORDER BY n DESC, ngram LIMIT 100""".stripMargin,

    "q_inverted_index" ->
      """WITH t AS (SELECT DISTINCT doc_id AS doc,
        |    unnest(list_distinct(string_split(text, ' '))) AS term
        |  FROM documents)
        |SELECT term, COUNT(*) AS df_docs,
        |  array_to_string((list(doc ORDER BY doc))[1:100], ',') AS postings
        |FROM t WHERE term <> '' GROUP BY term ORDER BY term""".stripMargin,

    // streaming index-maintenance twin: per-batch df-add + first-cap
    // posting re-truncation is associative (min-k summary), so the same
    // replay hashes the streaming run
    "q_stream_text_index" ->
      """WITH t AS (SELECT DISTINCT doc_id AS doc,
        |    unnest(list_distinct(string_split(text, ' '))) AS term
        |  FROM documents)
        |SELECT term, COUNT(*) AS df_docs,
        |  array_to_string((list(doc ORDER BY doc))[1:100], ',') AS postings
        |FROM t WHERE term <> '' GROUP BY term ORDER BY term""".stripMargin,

    "q_chunk_tokens" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, w, unnest(range(0, len(w), 48)) AS start_tok FROM t)
        |SELECT doc_id, CAST(start_tok // 48 AS BIGINT) AS chunk_idx,
        |  CAST(start_tok AS BIGINT) AS start_tok,
        |  CAST(len(w[start_tok+1:start_tok+64]) AS BIGINT) AS chunk_len,
        |  md5(array_to_string(w[start_tok+1:start_tok+64], ' ')) AS chunk_md5
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_pii_redact" ->
      """SELECT c_custkey,
        |  regexp_replace(regexp_replace(c_name,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{7,}', '<NUM>', 'g') AS red_name,
        |  CAST(len(regexp_extract_all(c_name,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(c_name, '[0-9]{7,}')) AS BIGINT) AS n_longnums
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_text_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |            FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
        |       WHERE term <> '' GROUP BY doc_id, term),
        |dfd AS (SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY term),
        |sc AS (SELECT tf.doc_id, tf.term, tf.tf, dfd.df_docs,
        |         tf.tf * 1000000 // dfd.df_docs AS score_ppm
        |       FROM tf JOIN dfd USING (term)),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |        ORDER BY score_ppm DESC, term) AS rn FROM sc)
        |SELECT doc_id, rn, term, tf, df_docs, score_ppm FROM r
        |WHERE rn <= 5 ORDER BY doc_id, rn""".stripMargin,

    "q_union_distinct" ->
      """SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0
        |UNION
        |SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,

    "q_text_editdist" ->
      """WITH p AS (SELECT doc_id, lang, LOWER(SUBSTRING(text, 1, 40)) AS pfx
        |  FROM documents),
        |l AS (SELECT doc_id, lang, pfx,
        |    LAG(pfx) OVER (PARTITION BY lang ORDER BY doc_id) AS prev_pfx FROM p)
        |SELECT doc_id, lang, CAST(levenshtein(pfx, prev_pfx) AS INT) AS edit_dist
        |FROM l WHERE prev_pfx IS NOT NULL ORDER BY doc_id""".stripMargin,

    "q_graph_pagerank" -> pagerankSql(5),

    "q_graph_kcore" -> kcoreSql(22, 5),

    "q_graph_label_prop" -> lpaSql(4),

    "q_graph_hits" -> hitsSql(5, 1000000L),

    "q_graph_link_predict_capped" -> linkPredictCappedSql,

    "q_drift_ks" -> ksDriftSql,

    "q_drift_tv" -> tvDriftSql,

    // streaming fold-then-finish equals one-shot KS (mergeable counts)
    "q_stream_drift" -> ksDriftSql,

    // streaming fold-then-finish equals one-shot OLS (mergeable moments)
    "q_stream_trend" -> trendOlsSql,

    "q_graph_ppr" -> pprSql(5, Seq(0L, 7L)),

    "q_graph_sssp" -> ssspSql(0L, 4),

    "q_vec_mmr" -> mmrSql(20, 5, 7L, 3L),

    "q_vec_kcenter" -> kcenterSql(8),

    "q_join_fuzzy" -> fuzzyJoinSql,

    // degree-oriented triangle count: all-integer, each triangle counted
    // once from its (deg, id)-minimal vertex; wedges canonical by id
    "q_graph_triangles" ->
      """WITH po AS (SELECT DISTINCT l_orderkey AS o, l_partkey % 100 AS p
        |            FROM lineitem),
        |e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
        |       FROM po x JOIN po y ON x.o = y.o AND x.p < y.p),
        |deg AS (SELECT v, COUNT(*) AS d FROM (
        |          SELECT a AS v FROM e0 UNION ALL SELECT b AS v FROM e0)
        |        GROUP BY v),
        |o AS (SELECT
        |    CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
        |         THEN a ELSE b END AS src,
        |    CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
        |         THEN b ELSE a END AS dst
        |  FROM e0 JOIN deg da ON da.v = e0.a JOIN deg db ON db.v = e0.b),
        |wg AS (SELECT o1.dst AS v, o2.dst AS w
        |       FROM o o1 JOIN o o2 ON o1.src = o2.src AND o1.dst < o2.dst)
        |SELECT CAST(COALESCE(SUM(CASE WHEN e0.a IS NULL THEN 0 ELSE 1 END), 0)
        |         AS BIGINT) AS n_triangles,
        |  COUNT(*) AS n_wedges
        |FROM wg LEFT JOIN e0 ON e0.a = wg.v AND e0.b = wg.w""".stripMargin,

    "q_sql_native_funcs" ->
      """SELECT vec_id,
        |  ROUND(list_sum(list_transform(list_zip(embedding, embedding),
        |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 6) AS self_dot,
        |  ROUND(SQRT(list_sum(list_transform(list_zip(embedding, embedding),
        |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))), 6) AS norm,
        |  LEAST(vec_id % 8, 4) + 1 AS isect
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_dedup_embedding_exact" ->
      """WITH side AS (
        |  SELECT vec_id AS id, embedding AS v,
        |    SQRT(CAST(list_sum(list_transform(list_zip(embedding, embedding),
        |      p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13) AS nrm
        |  FROM embeddings WHERE vec_id % 16 = 0),
        |scored AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    ROUND((CAST(list_sum(list_transform(list_zip(a.v, b.v),
        |      p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13)
        |      / (a.nrm * b.nrm), 6) AS cosine
        |  FROM side a, side b WHERE a.id < b.id)
        |SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.25
        |ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_cluster" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 8, 0) + 2),
        |      i -> array_to_string(w[i:i+7], ' '))) AS s FROM t)),
        |ok AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 10),
        |e AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
        |      FROM sh a JOIN ok USING (s) JOIN sh b USING (s)
        |      WHERE a.doc_id < b.doc_id),
        |und AS (SELECT src AS a, dst AS b FROM e UNION ALL SELECT dst, src FROM e),
        |nodes AS (SELECT DISTINCT a AS id FROM und),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT und.b AS id, reach.r FROM reach JOIN und ON und.a = reach.id),
        |lbl AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
        |fl AS (SELECT d.doc_id, COALESCE(l.comp, d.doc_id) AS cluster_id
        |       FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id)
        |SELECT doc_id, cluster_id,
        |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM fl ORDER BY doc_id""".stripMargin,

    // streaming incremental-CC twin: same edge definition, same labeling —
    // the streaming fold is batching-invariant so one oracle serves both
    "q_stream_dedup_cluster" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 8, 0) + 2),
        |      i -> array_to_string(w[i:i+7], ' '))) AS s FROM t)),
        |ok AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 10),
        |e AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
        |      FROM sh a JOIN ok USING (s) JOIN sh b USING (s)
        |      WHERE a.doc_id < b.doc_id),
        |und AS (SELECT src AS a, dst AS b FROM e UNION ALL SELECT dst, src FROM e),
        |nodes AS (SELECT DISTINCT a AS id FROM und),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT und.b AS id, reach.r FROM reach JOIN und ON und.a = reach.id),
        |lbl AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
        |fl AS (SELECT d.doc_id, COALESCE(l.comp, d.doc_id) AS cluster_id
        |       FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id)
        |SELECT doc_id, cluster_id,
        |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM fl ORDER BY doc_id""".stripMargin,

    "q_text_langid" ->
      """WITH t AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS w
        |           FROM documents),
        |sc AS (SELECT doc_id, lang, unnest([
        |    {'cand': 'de', 'score': len(list_intersect(w, ['der','die','und','das','ist']))},
        |    {'cand': 'en', 'score': len(list_intersect(w, ['the','and','of','to','in']))},
        |    {'cand': 'es', 'score': len(list_intersect(w, ['el','la','de','que','y']))},
        |    {'cand': 'fr', 'score': len(list_intersect(w, ['le','la','les','et','des']))},
        |    {'cand': 'zh', 'score': len(list_intersect(w, ['的','是','了','在','我']))}
        |  ]) AS s FROM t),
        |r AS (SELECT doc_id, lang, s.cand AS pred_lang,
        |        ROW_NUMBER() OVER (PARTITION BY doc_id
        |          ORDER BY s.score DESC, s.cand ASC) AS rn
        |      FROM sc)
        |SELECT doc_id, lang, pred_lang FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 8, 0) + 2),
        |    i -> array_to_string(w[i:i+7], ' ')))) AS gram FROM t),
        |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
        |ov AS (SELECT g.doc_id, COUNT(*) AS n_overlap
        |       FROM g JOIN ev USING (gram)
        |       WHERE g.doc_id % 20 <> 0 GROUP BY g.doc_id)
        |SELECT t.doc_id, CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
        |  COALESCE(ov.n_overlap, 0) > 0 AS contaminated
        |FROM t LEFT JOIN ov USING (doc_id)
        |WHERE t.doc_id % 20 <> 0 ORDER BY doc_id""".stripMargin,

    "q_contamination_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 8, 0) + 2),
        |    i -> array_to_string(w[i:i+7], ' ')))) AS gram FROM t),
        |ev AS (SELECT doc_id AS eval_id, gram FROM g WHERE doc_id % 5 = 0),
        |tr AS (SELECT doc_id AS train_id, gram FROM g WHERE doc_id % 5 <> 0),
        |tot AS (SELECT eval_id, COUNT(*) AS eval_grams FROM ev GROUP BY eval_id),
        |p AS (SELECT eval_id, train_id, COUNT(*) AS shared_grams
        |      FROM ev JOIN tr USING (gram) GROUP BY eval_id, train_id)
        |SELECT p.eval_id, p.train_id, p.shared_grams, tot.eval_grams,
        |  ROUND(p.shared_grams / CAST(tot.eval_grams AS DOUBLE), 6) AS containment
        |FROM p JOIN tot USING (eval_id)
        |ORDER BY eval_id, train_id""".stripMargin,

    "q_dedup_span" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, unnest(range(0, (len(w) - 1) // 10 + 1)) AS i, w FROM t),
        |sp AS (SELECT doc_id, CAST(i AS BIGINT) AS span_idx,
        |    array_to_string(w[i*10+1:i*10+10], ' ') AS span FROM s),
        |r AS (SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY span ORDER BY doc_id, span_idx) AS rn FROM sp)
        |SELECT doc_id, COUNT(*) AS n_spans,
        |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  COALESCE(string_agg(CASE WHEN rn = 1 THEN span END, ' '
        |    ORDER BY span_idx), '') AS text_dedup
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_gopher_quality" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT) AS word_chars,
        |    list_transform(range(1, greatest(len(w) - 2, 0) + 2),
        |      i -> array_to_string(w[i:i+1], ' ')) AS g2 FROM t),
        |b AS (SELECT doc_id, n_words, word_chars,
        |    CAST(len(g2) AS BIGINT) AS n2,
        |    CAST(len(list_distinct(g2)) AS BIGINT) AS d2 FROM g),
        |u AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top1 FROM (
        |    SELECT doc_id, COUNT(*) AS c FROM
        |      (SELECT doc_id, unnest(w) AS wd FROM t) GROUP BY doc_id, wd)
        |  GROUP BY doc_id),
        |m AS (SELECT b.doc_id, n_words,
        |    word_chars * 1000000 // n_words AS mwl_ppm,
        |    (n2 - d2) * 1000000 // n2 AS dup2_ppm,
        |    top1 * 1000000 // n_words AS top1_ppm
        |  FROM b JOIN u ON b.doc_id = u.doc_id)
        |SELECT doc_id, n_words, mwl_ppm, dup2_ppm, top1_ppm,
        |  n_words BETWEEN 25 AND 1000 AS pass_len,
        |  mwl_ppm BETWEEN 4000000 AND 5000000 AS pass_mwl,
        |  dup2_ppm <= 50000 AS pass_rep2,
        |  top1_ppm <= 120000 AS pass_top1,
        |  (n_words BETWEEN 25 AND 1000) AND (mwl_ppm BETWEEN 4000000 AND 5000000)
        |    AND dup2_ppm <= 50000 AND top1_ppm <= 120000 AS pass_all
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_mixture_epochs" -> mixtureEpochsSql(graft.Queries.mixtureRates),

    "q_sample_temperature" ->
      """WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        |           FROM documents GROUP BY lang),
        |w AS (SELECT lang, n, CAST(floor(sqrt(n) * 1000) AS BIGINT) AS wt FROM c),
        |t AS (SELECT CAST(SUM(wt) AS BIGINT) AS wsum,
        |             CAST(SUM(n) AS BIGINT) AS total FROM w),
        |thr AS (SELECT lang, n AS n_group,
        |    CAST(least(16777216, ((total * 1 // 2) * wt * 16777216) // (wsum * n))
        |      AS BIGINT) AS thr
        |  FROM w, t)
        |SELECT d.doc_id, d.lang, thr.n_group, thr.thr
        |FROM documents d JOIN thr USING (lang)
        |WHERE thr.thr >= 16777216
        |   OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6)
        |      < lpad(lower(to_hex(thr.thr)), 6, '0')
        |ORDER BY doc_id""".stripMargin,

    "q_text_classifier" ->
      """WITH wt(wd, weight) AS (VALUES
        |    ('fast', 3), ('slow', -3), ('big', 2), ('small', -2),
        |    ('query', 1), ('table', -1), ('vector', 2), ('stream', 1),
        |    ('filter', -1), ('merge', 1)),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
        |        FROM documents),
        |sc AS (SELECT doc_id, CAST(SUM(weight) AS BIGINT) AS wsum
        |       FROM tok JOIN wt USING (wd) GROUP BY doc_id)
        |SELECT d.doc_id, CAST(COALESCE(sc.wsum, 0) - 1 AS BIGINT) AS score,
        |  COALESCE(sc.wsum, 0) - 1 > 0 AS label
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_multimodal_dedup" ->
      """WITH p AS (SELECT doc_id, md5(text) AS digest FROM documents)
        |SELECT doc_id, digest,
        |  MIN(doc_id) OVER (PARTITION BY digest) AS keeper_id,
        |  COUNT(*) OVER (PARTITION BY digest) AS n_copies
        |FROM p ORDER BY doc_id""".stripMargin,

    // The REAL PNG round trip: the Spark side writes an actual PNG per doc
    // (ImageIO) and reads it back for width/height + per-channel pixel
    // sums; the oracle re-derives those sums from the SHARED byte→pixel
    // rule (pixel i channels = source bytes (3i)%n,(3i+1)%n,(3i+2)%n;
    // dims w=8+n%17, h=8+(n/17)%13 — MultimodalOps.imageDims) — document
    // text is pure ASCII, so ord(substr()) IS the byte. PNG is lossless,
    // so matching sums prove the decode genuinely read the raster back
    // out of the compressed payload.
    "q_multimodal_decode" ->
      """WITH b AS (SELECT doc_id, length(text) AS n,
        |    list_transform(range(1, length(text) + 1),
        |      j -> ord(substr(text, CAST(j AS INT), 1))) AS bs,
        |    8 + (length(text) % 17) AS w,
        |    8 + ((length(text) // 17) % 13) AS h
        |  FROM documents WHERE text IS NOT NULL AND length(text) > 0)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(list_sum(list_transform(range(0, w * h),
        |    i -> bs[CAST((3 * i) % n AS INT) + 1])) AS BIGINT) AS sum_r,
        |  CAST(list_sum(list_transform(range(0, w * h),
        |    i -> bs[CAST((3 * i + 1) % n AS INT) + 1])) AS BIGINT) AS sum_g,
        |  CAST(list_sum(list_transform(range(0, w * h),
        |    i -> bs[CAST((3 * i + 2) % n AS INT) + 1])) AS BIGINT) AS sum_b
        |FROM b ORDER BY doc_id""".stripMargin,

    // WAV replay: sample i = (byte[(2i)%n] - 128) * 256 over
    // 200 + n%300 samples at 8 kHz; energy/zero-crossings/peak in exact
    // integer arithmetic — only a genuine RIFF header + PCM parse matches
    "q_multimodal_audio" ->
      """WITH b AS (SELECT doc_id, length(text) AS n,
        |    list_transform(range(1, length(text) + 1),
        |      j -> ord(substr(text, CAST(j AS INT), 1))) AS bs,
        |    200 + (length(text) % 300) AS ns
        |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
        |s AS (SELECT doc_id, ns,
        |    list_transform(range(0, ns),
        |      i -> (bs[CAST((2 * i) % n AS INT) + 1] - 128) * 256) AS sm
        |  FROM b)
        |SELECT doc_id,
        |  8000 AS sample_rate,
        |  CAST(ns AS INT) AS n_samples,
        |  CAST(list_sum(list_transform(sm, x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS energy,
        |  CAST(list_sum(list_transform(range(1, ns),
        |    i -> CASE WHEN CAST(sm[CAST(i AS INT)] AS BIGINT) * sm[CAST(i AS INT) + 1] < 0
        |      THEN 1 ELSE 0 END)) AS BIGINT) AS zero_crossings,
        |  CAST(list_max(list_transform(sm, x -> abs(x))) AS BIGINT) AS peak
        |FROM s ORDER BY doc_id""".stripMargin,

    // dHash replay: the 9x8 NN-downsample grid's gray values from the
    // byte->pixel rule ((r+g+b) // 3 at source pixel (x*w//9, y*h//8)),
    // bit j = gray(x,y) > gray(x+1,y), packed MSB-first into hex nibbles;
    // dedup groups by the hash under a min-id keeper
    "q_multimodal_dhash" ->
      s"""WITH $mmDhashGrayCtes,
        |hx AS (SELECT doc_id,
        |    array_to_string(list_transform(range(0, 16), k ->
        |      substr('0123456789abcdef', CAST(1
        |        + 8 * (CASE WHEN gv[CAST(((4*k)   // 8) * 9 + (4*k)   % 8 AS INT) + 1] > gv[CAST(((4*k)   // 8) * 9 + (4*k)   % 8 AS INT) + 2] THEN 1 ELSE 0 END)
        |        + 4 * (CASE WHEN gv[CAST(((4*k+1) // 8) * 9 + (4*k+1) % 8 AS INT) + 1] > gv[CAST(((4*k+1) // 8) * 9 + (4*k+1) % 8 AS INT) + 2] THEN 1 ELSE 0 END)
        |        + 2 * (CASE WHEN gv[CAST(((4*k+2) // 8) * 9 + (4*k+2) % 8 AS INT) + 1] > gv[CAST(((4*k+2) // 8) * 9 + (4*k+2) % 8 AS INT) + 2] THEN 1 ELSE 0 END)
        |        +     (CASE WHEN gv[CAST(((4*k+3) // 8) * 9 + (4*k+3) % 8 AS INT) + 1] > gv[CAST(((4*k+3) // 8) * 9 + (4*k+3) % 8 AS INT) + 2] THEN 1 ELSE 0 END)
        |      AS INT), 1)), '') AS dhash
        |  FROM g)
        |SELECT doc_id, dhash,
        |  MIN(doc_id) OVER (PARTITION BY dhash) AS keeper_id,
        |  COUNT(*) OVER (PARTITION BY dhash) AS n_copies
        |FROM hx ORDER BY doc_id""".stripMargin,

    // image-modality cross-split decontamination: dHash re-derived from
    // the shared gray grid as 4 x 16-bit MSB-first blocks, leaked-eval
    // plant (every 10th doc under id+1e6), Manku band join with the
    // hot-bucket cap, per-block bit_count(xor) Hamming verify <= 3
    "q_multimodal_decontaminate" ->
      s"""WITH $mmDhashGrayCtes,
        |blk AS (SELECT doc_id, list_transform(range(0, 4), k ->
        |    CAST(list_sum(list_transform(range(0, 16), j ->
        |      CASE WHEN gv[CAST(((16*k+j) // 8) * 9 + (16*k+j) % 8 AS INT) + 1]
        |              > gv[CAST(((16*k+j) // 8) * 9 + (16*k+j) % 8 AS INT) + 2]
        |           THEN (1::BIGINT << CAST(15 - j AS INT))
        |           ELSE 0::BIGINT END)) AS BIGINT)) AS blocks
        |  FROM g),
        |tr AS (SELECT doc_id AS id, blocks, 't' AS side FROM blk),
        |ev AS (SELECT doc_id + 1000000 AS id, blocks, 'e' AS side FROM blk
        |       WHERE doc_id % 10 = 0),
        |u AS (SELECT * FROM tr UNION ALL SELECT * FROM ev),
        |bnd0 AS (SELECT id, side, blocks, gs.k AS band,
        |    blocks[gs.k + 1] AS bucket
        |  FROM u, generate_series(0, 3) AS gs(k)),
        |bnd AS (SELECT id, side, blocks, band, bucket FROM (
        |    SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS bn
        |    FROM bnd0) WHERE bn <= 1000),
        |cand AS (SELECT DISTINCT a.id AS eval_id, t2.id AS train_id,
        |    a.blocks AS eb, t2.blocks AS tb
        |  FROM bnd a JOIN bnd t2 ON a.band = t2.band AND a.bucket = t2.bucket
        |    AND a.side = 'e' AND t2.side = 't')
        |SELECT eval_id, train_id, hamming FROM (
        |  SELECT eval_id, train_id, CAST(
        |      bit_count(xor(eb[1], tb[1])) + bit_count(xor(eb[2], tb[2]))
        |    + bit_count(xor(eb[3], tb[3])) + bit_count(xor(eb[4], tb[4]))
        |    AS INTEGER) AS hamming
        |  FROM cand)
        |WHERE hamming <= 3
        |ORDER BY eval_id, train_id""".stripMargin,

    // nearest-neighbor resize to 12x10 replayed as pure index arithmetic:
    // target pixel p=(y*12+x) samples source pixel (x*w//12, y*h//10),
    // whose channels come from the shared byte->pixel rule
    "q_multimodal_resize" ->
      """WITH b AS (SELECT doc_id, length(text) AS n,
        |    list_transform(range(1, length(text) + 1),
        |      j -> ord(substr(text, CAST(j AS INT), 1))) AS bs,
        |    8 + (length(text) % 17) AS w,
        |    8 + ((length(text) // 17) % 13) AS h
        |  FROM documents WHERE text IS NOT NULL AND length(text) > 0)
        |SELECT doc_id, 12 AS width, 10 AS height,
        |  CAST(list_sum(list_transform(range(0, 120),
        |    p -> bs[CAST((3 * (((p // 12) * h // 10) * w + ((p % 12) * w // 12))) % n AS INT) + 1])) AS BIGINT) AS sum_r,
        |  CAST(list_sum(list_transform(range(0, 120),
        |    p -> bs[CAST((3 * (((p // 12) * h // 10) * w + ((p % 12) * w // 12)) + 1) % n AS INT) + 1])) AS BIGINT) AS sum_g,
        |  CAST(list_sum(list_transform(range(0, 120),
        |    p -> bs[CAST((3 * (((p // 12) * h // 10) * w + ((p % 12) * w // 12)) + 2) % n AS INT) + 1])) AS BIGINT) AS sum_b
        |FROM b ORDER BY doc_id""".stripMargin,

    // the multi-frame GIF path: nf = 2 + n%5 frames, every 2nd sampled;
    // frame f's sum replays pixel i = byte (i + 7f) mod n — frame
    // iteration and per-frame decode can only match by really reading
    // the GIF image sequence back
    "q_multimodal_gif" ->
      """WITH b AS (SELECT doc_id, length(text) AS n,
        |    list_transform(range(1, length(text) + 1),
        |      j -> ord(substr(text, CAST(j AS INT), 1))) AS bs,
        |    8 + (length(text) % 17) AS w,
        |    8 + ((length(text) // 17) % 13) AS h,
        |    2 + (length(text) % 5) AS nf
        |  FROM documents
        |  WHERE doc_id < 2000 AND text IS NOT NULL AND length(text) > 0)
        |, x AS (SELECT doc_id, n, bs, w, h, nf,
        |    unnest(range(0, nf, 2)) AS f FROM b)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(nf AS INT) AS n_frames,
        |  CAST(f // 2 AS INT) AS sample_idx,
        |  CAST(list_sum(list_transform(range(0, w * h),
        |    i -> bs[CAST((i + 7 * f) % n AS INT) + 1])) AS BIGINT) AS frame_sum
        |FROM x ORDER BY doc_id, sample_idx""".stripMargin,

    // Y4M video: replay the byte→plane rule for the sampled LUMA planes
    // (plane p=0, frame f, pixel i = byte (i + 13f) mod n) — the decode
    // side can only match by genuinely parsing header + FRAME markers +
    // plane extents back out of the container bytes
    "q_multimodal_frames" ->
      """WITH b AS (SELECT doc_id, length(text) AS n,
        |    list_transform(range(1, length(text) + 1),
        |      j -> ord(substr(text, CAST(j AS INT), 1))) AS bs,
        |    8 + (length(text) % 17) AS w,
        |    8 + ((length(text) // 17) % 13) AS h,
        |    2 + (length(text) % 7) AS nf
        |  FROM documents
        |  WHERE doc_id < 2000 AND text IS NOT NULL AND length(text) > 0)
        |, x AS (SELECT doc_id, n, bs, w, h, nf,
        |    unnest(range(0, nf, 2)) AS f FROM b)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(nf AS INT) AS n_frames,
        |  CAST(f // 2 AS INT) AS sample_idx,
        |  CAST(list_sum(list_transform(range(0, w * h),
        |    i -> bs[CAST((i + 13 * f) % n AS INT) + 1])) AS BIGINT) AS frame_luma
        |FROM x ORDER BY doc_id, sample_idx""".stripMargin,

    // --- Similarity search ------------------------------------------
    "q_vec_normalize" ->
      """WITH n AS (SELECT vec_id, embedding,
        |    SQRT(CAST(list_sum(list_transform(list_zip(embedding, embedding),
        |      p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13) AS nrm
        |  FROM embeddings)
        |SELECT vec_id, gs.i AS pos,
        |  ROUND(CAST(embedding[gs.i] AS DOUBLE) / nrm, 6) AS e_norm
        |FROM n, generate_series(1, 64) AS gs(i)
        |ORDER BY vec_id, pos""".stripMargin,

    // int8 quantization: max is order-free, scale one IEEE divide,
    // trunc-toward-zero == Spark's double->int cast — exact both engines
    "q_vec_quantize_int8" ->
      """WITH s AS (SELECT vec_id, embedding,
        |    CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
        |      / 127.0 AS scale
        |  FROM embeddings)
        |SELECT vec_id, gs.i AS pos,
        |  CASE WHEN scale = 0 THEN 0
        |       ELSE CAST(trunc(CAST(embedding[gs.i] AS DOUBLE) / scale)
        |              AS INTEGER) END AS q,
        |  scale
        |FROM s, generate_series(1, 64) AS gs(i)
        |ORDER BY vec_id, pos""".stripMargin,

    "q_vec_centroids" ->
      """WITH a AS (SELECT label, gs.i AS pos,
        |    SUM(CAST(FLOOR(CAST(embedding[gs.i] AS DOUBLE) * 1e6) AS BIGINT)) AS s,
        |    COUNT(*) AS n
        |  FROM embeddings, generate_series(1, 64) AS gs(i)
        |  GROUP BY label, gs.i)
        |SELECT label, pos,
        |  CAST((s - ((s % n) + n) % n) / n AS BIGINT) / 1e6 AS centroid
        |FROM a ORDER BY label, pos""".stripMargin,

    "q_vec_random_projection" -> randomProjectionSql(16, 64),
    "q_vec_ann_recall" -> annRecallLshSql(k = 10, nPlanes = 4, dims = 64,
      tables = 4, probes = 4),
    "q_vec_ann_lsh_fixed" -> annLshTopKSql(k = 10, nPlanes = 4, dims = 64,
      tables = 4, probes = 4),
    "q_dedup_minhash_fixed" -> minhashFixedSql(k = 3, bands = 8,
      rowsPerBand = 4, threshold = 0.5, maxDocId = 600L, maxBucket = 1000),
    // end-to-end pipeline: quality gate -> exact dedup -> minhash near-dup
    // removal (the shared generated CTE body over the survivors) -> chunk;
    // one CTE chain so the stage INTERACTIONS sit under the hash
    "q_pipeline_pretrain" -> pipelinePretrainSql,
    // streaming composition twin: per-batch quality+digest+signature folds,
    // end-of-stream keepers/pairs/chunking over the state at rest —
    // batching-invariant, so the same four-stage replay hashes the stream
    "q_stream_pipeline_pretrain" -> pipelinePretrainSql,
    // streaming index-maintenance twin: signatures fold per micro-batch,
    // the candidate stage sees only the final index — batching-invariant,
    // so the same generated replay hashes the streaming run
    "q_stream_dedup_minhash" -> minhashFixedSql(k = 3, bands = 8,
      rowsPerBand = 4, threshold = 0.5, maxDocId = 600L, maxBucket = 1000),
    "q_dedup_simhash_fixed" -> simhashFixedSql(maxDist = 3, maxDocId = 600L,
      maxBucket = 1000),
    "q_dedup_embedding" -> dedupEmbeddingLshSql(threshold = 0.3,
      nPlanes = 4, dims = 64, tables = 4, maxBucket = 1000),
    "q_dedup_embedding_cluster" -> dedupEmbeddingClusterSql(threshold = 0.38,
      nPlanes = 4, dims = 64, tables = 4, maxBucket = 1000),
    "q_vec_knn_graph_lsh" -> knnGraphLshSql(k = 5, nPlanes = 3, dims = 64,
      tables = 6, maxBucket = 1000),
    "q_vec_knn_refine" -> knnGraphRefineSql(k = 5, nPlanes = 3, dims = 64,
      tables = 6, maxBucket = 1000),
    "q_vec_sim_join" -> vecSimJoinLshSql(threshold = 0.38, nPlanes = 3,
      dims = 64, tables = 4, maxBucket = 1000),

    // exact k-NN graph on the 1/8 sample: all-pairs fixed-point cosine
    // (identical grid to q_dedup_embedding_exact), top-5 per node by
    // (rounded cosine desc, neighbor id asc)
    "q_vec_knn_graph" ->
      """WITH side AS (
        |  SELECT vec_id AS id, embedding AS v,
        |    SQRT(CAST(list_sum(list_transform(list_zip(embedding, embedding),
        |      p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13) AS nrm
        |  FROM embeddings WHERE vec_id % 8 = 0),
        |pairs AS (
        |  SELECT a.id AS node, b.id AS nbr,
        |    ROUND((CAST(list_sum(list_transform(list_zip(a.v, b.v),
        |      p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13)
        |      / (a.nrm * b.nrm), 6) AS cosine
        |  FROM side a, side b WHERE a.id <> b.id),
        |ranked AS (
        |  SELECT node, nbr, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY node
        |      ORDER BY cosine DESC, nbr) AS rank
        |  FROM pairs)
        |SELECT node, nbr AS neighbor_id, cosine, rank FROM ranked
        |WHERE rank <= 5 ORDER BY node, rank""".stripMargin,

    // matryoshka funnel replay: stage 1 ranks on the 32-dim prefix
    // (fixed-point grid), keeps prank <= 80, stage 2 re-ranks survivors at
    // full width — the identical two-phase computation as the Spark side
    "q_vec_ann_prefix" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
        |    embedding[1:32] AS qp FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS nv,
        |    embedding[1:32] AS np FROM embeddings),
        |s1 AS (
        |  SELECT q.query_id, c.neighbor_id, q.qv, c.nv,
        |    ROUND((CAST(list_sum(list_transform(list_zip(q.qp, c.np),
        |      p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13)
        |      / (SQRT(CAST(list_sum(list_transform(list_zip(q.qp, q.qp),
        |          p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13)
        |       * SQRT(CAST(list_sum(list_transform(list_zip(c.np, c.np),
        |          p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13)), 6) AS pcos
        |  FROM q, c WHERE c.neighbor_id <> q.query_id),
        |cand AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY pcos DESC, neighbor_id) AS prank FROM s1),
        |s2 AS (
        |  SELECT query_id, neighbor_id,
        |    ROUND((CAST(list_sum(list_transform(list_zip(qv, nv),
        |      p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13)
        |      / (SQRT(CAST(list_sum(list_transform(list_zip(qv, qv),
        |          p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13)
        |       * SQRT(CAST(list_sum(list_transform(list_zip(nv, nv),
        |          p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13)), 6) AS cosine
        |  FROM cand WHERE prank <= 80),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM s2)
        |SELECT query_id, neighbor_id, cosine, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // int8 funnel replay (VERDICT r16 #4): the whole path is deterministic
    // — trunc codes are exact (q_vec_quantize_int8's proven rule), the
    // integer dot is exact, and the approx key's sqrt/divide are
    // correctly-rounded IEEE ops on exactly-representable integers, so
    // ranking matches bit-for-bit; stage 2 re-ranks the top k*5 with the
    // sequential-double seqDot fold (DuckDB list_reduce left-fold ==
    // FloatDotProduct's sequential-double loop, term order identical)
    "q_vec_ann_int8" ->
      s"""WITH enc AS (SELECT vec_id, embedding,
        |    CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
        |      / 127.0 AS scale
        |  FROM embeddings),
        |codes AS (SELECT vec_id, embedding,
        |    CASE WHEN scale = 0 THEN list_transform(embedding, x -> 0)
        |         ELSE list_transform(embedding,
        |           x -> CAST(trunc(CAST(x AS DOUBLE) / scale) AS INT)) END AS c
        |  FROM enc),
        |q AS (SELECT vec_id AS query_id, embedding AS qv, c AS qc
        |      FROM codes WHERE vec_id < 5),
        |s1 AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id, q.qv, c.embedding AS nv,
        |    CAST(list_sum(list_transform(list_zip(q.qc, c.c),
        |      p -> CAST(p[1] AS BIGINT) * p[2])) AS DOUBLE)
        |    / SQRT(greatest(CAST(list_sum(list_transform(c.c,
        |        x -> CAST(x AS BIGINT) * x)) AS DOUBLE), 1.0)) AS approx
        |  FROM q, codes c WHERE c.vec_id <> q.query_id),
        |cand AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY approx DESC, neighbor_id) AS arank FROM s1),
        |s2 AS (
        |  SELECT query_id, neighbor_id,
        |    ROUND(${seqDot("qv", "nv")}
        |      / (SQRT(${seqDot("qv", "qv")})
        |       * SQRT(${seqDot("nv", "nv")})), 6) AS cosine
        |  FROM cand WHERE arank <= 50),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM s2)
        |SELECT query_id, neighbor_id, cosine, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q_vec_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |dots AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(list_zip(q.qv, e.embedding),
        |      p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13 AS dot,
        |    CAST(list_sum(list_transform(list_zip(q.qv, q.qv),
        |      p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13 AS qq,
        |    CAST(list_sum(list_transform(list_zip(e.embedding, e.embedding),
        |      p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e13) AS BIGINT))) AS DOUBLE) / 1e13 AS nn
        |  FROM q, embeddings e WHERE e.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |    ROUND(dot / (SQRT(qq) * SQRT(nn)), 6) AS cosine,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY ROUND(dot / (SQRT(qq) * SQRT(nn)), 6) DESC, neighbor_id) AS rank
        |  FROM dots)
        |SELECT query_id, neighbor_id, cosine, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  )
}
