package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Exec
import graft.ext.{Dedup, Multimodal, Similarity, Text}
import graft.functions.{charShingles, fingerprintMd5, tokens}
import graft.io.{Load, Unload}
import graft.schema.Infer
import graft.streaming.Stream

/** Registry part 2/4: remaining stats batteries, IO façade queries
  * (load/unload/insert/stage), dedup, similarity, text families. */
trait SparkEntryMid extends SparkEntryBase {
  private[graft] val statsBfSql: String =
    """WITH li AS (SELECT l_returnflag AS flag, l_quantity AS q FROM lineitem),
      |vc AS (SELECT flag, q, CAST(count(*) AS BIGINT) AS cnt
      |       FROM li GROUP BY 1, 2),
      |cum AS (SELECT flag, q, cnt,
      |          CAST(sum(cnt) OVER (PARTITION BY flag ORDER BY q) AS BIGINT)
      |            AS cumEnd
      |        FROM vc),
      |c2 AS (SELECT flag, q, cumEnd - cnt AS cumStart, cumEnd FROM cum),
      |tot AS (SELECT flag, CAST(count(*) AS BIGINT) AS ng FROM li GROUP BY 1),
      |med AS (SELECT flag,
      |          (min(CASE WHEN cumStart < p1 AND p1 <= cumEnd THEN q END) +
      |           min(CASE WHEN cumStart < p2 AND p2 <= cumEnd THEN q END)) / 2.0
      |            AS med
      |        FROM (SELECT c2.*, (ng + 1) // 2 AS p1, (ng + 2) // 2 AS p2
      |              FROM c2 JOIN tot USING (flag))
      |        GROUP BY flag),
      |z AS (SELECT li.flag, abs(q - med) AS z FROM li JOIN med USING (flag)),
      |a AS (SELECT
      |        sum(CASE WHEN flag='A' THEN 1.0 ELSE 0.0 END) AS na,
      |        sum(CASE WHEN flag='N' THEN 1.0 ELSE 0.0 END) AS nn,
      |        sum(CASE WHEN flag='R' THEN 1.0 ELSE 0.0 END) AS nr,
      |        sum(CASE WHEN flag='A' THEN z ELSE 0.0 END) AS sa,
      |        sum(CASE WHEN flag='N' THEN z ELSE 0.0 END) AS sn,
      |        sum(CASE WHEN flag='R' THEN z ELSE 0.0 END) AS sr,
      |        sum(CASE WHEN flag='A' THEN z*z ELSE 0.0 END) AS qa,
      |        sum(CASE WHEN flag='N' THEN z*z ELSE 0.0 END) AS qn,
      |        sum(CASE WHEN flag='R' THEN z*z ELSE 0.0 END) AS qr
      |      FROM z),
      |b AS (SELECT na + nn + nr AS n,
      |        sa*sa/na + sn*sn/nn + sr*sr/nr AS tsum,
      |        sa + sn + sr AS s, qa + qn + qr AS qq
      |      FROM a),
      |mw AS (SELECT
      |         min(CASE WHEN flag='A' THEN med END) AS med_a,
      |         min(CASE WHEN flag='N' THEN med END) AS med_n,
      |         min(CASE WHEN flag='R' THEN med END) AS med_r
      |       FROM med)
      |SELECT med_a, med_n, med_r, CAST(n AS BIGINT) AS n,
      |       round(tsum - s*s/n, 6) AS ss_between,
      |       round(qq - tsum, 6) AS ss_within,
      |       round(((tsum - s*s/n) / 2.0) / ((qq - tsum) / (n - 3.0)), 6)
      |         AS f_stat
      |FROM b CROSS JOIN mw""".stripMargin

  /** Approximate heavy hitters FROM the count-min sketch: every key in
    * the (domain-bounded) candidate set probed against the broadcast
    * parameter-sized sketch, ranked by estimate through the bounded
    * heap — the "top-k without exact per-key state" pattern; exact
    * counts ride along to expose the CMS overcount. Deterministic
    * (md5-derived cells), so the oracle replays the estimates
    * exactly. */
  private[graft] def sketchCmsTopk(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val cells = graft.ext.Sketch.countMinBuild(ev, "user_id")
    val cand = ev.select("user_id").distinct()
    val est = graft.ext.Sketch.countMinEstimate(cells, cand, "user_id")
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
    est
      .agg(graft.functions.fx.topKByScore(col("cms_est").cast("double"),
        col("user_id"), 20).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "t")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("user_id"), col("t.score").cast("long").as("cms_est"))
      .join(exact, Seq("user_id"))
      .select("rank", "user_id", "cms_est", "exact_cnt")
      .orderBy("rank")
  }

  private[graft] val sketchCmsTopkSql: String =
    """WITH h(i) AS (VALUES (0), (1), (2), (3)),
      |cells AS (
      |  SELECT i, ('0x' || substr(md5(i || ':' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 512 AS pos,
      |         count(*) AS n
      |  FROM events CROSS JOIN h GROUP BY 1, 2),
      |cand AS (SELECT DISTINCT user_id FROM events),
      |ppos AS (
      |  SELECT user_id, i,
      |         ('0x' || substr(md5(i || ':' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 512 AS pos
      |  FROM cand CROSS JOIN h),
      |est AS (SELECT user_id, min(coalesce(n, 0)) AS cms_est
      |        FROM ppos LEFT JOIN cells USING (i, pos) GROUP BY 1),
      |exact AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
      |          FROM events GROUP BY 1),
      |rk AS (SELECT user_id, cms_est,
      |         row_number() OVER (ORDER BY cms_est DESC, user_id) AS rank
      |       FROM est)
      |SELECT CAST(rank AS BIGINT) AS rank, user_id,
      |       CAST(cms_est AS BIGINT) AS cms_est, exact_cnt
      |FROM rk JOIN exact USING (user_id) WHERE rank <= 20
      |ORDER BY rank""".stripMargin

  /** Per-node degree profile ([[graft.ext.Graph.degrees]]) of the
    * pagerank edge multiset — the first question any graph pipeline
    * asks (skew detection, hot-key planning, sanity bounds before an
    * iterative job). Exact keyed aggregations + one full outer join. */
  private[graft] def graphDegrees(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val fwd = li.filter(col("l_returnflag") =!= "R")
      .select(col("l_partkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
    val rev = li.filter(col("l_returnflag") === "R")
      .select((col("l_suppkey") + 1000000L).as("src"), col("l_partkey").as("dst"))
    graft.ext.Graph.degrees(fwd.union(rev)).orderBy("id")
  }

  /** The shared co-occurrence graph for [[graphTriangles]] /
    * [[graphKcore]]: parts are connected iff they appear in the same
    * order ("bought together"), restricted to the first 3 line
    * numbers so per-order fan-out is ≤ C(3,2) — the guard that keeps
    * a co-occurrence build linear in the fact table at any scale
    * (without it a k-line order emits k² pairs). Measured (sf0.1):
    * 20k nodes, 221k edges, median degree 22 — sparse; the supplier
    * co-supply alternative saturates to a complete graph on this
    * fixture (52M wedges) and is exactly the degenerate case the
    * line-number cap exists to avoid. */
  private[graft] def coOccurrenceEdges(s: SparkSession, dir: String): DataFrame = {
    val ps = t(s, dir, "lineitem").filter(col("l_linenumber") <= 3)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    ps.as("x").join(ps.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("src"), col("y.p").as("dst"))
  }

  /** Exact triangle counts ([[graft.ext.Graph.triangleCounts]]) over
    * the part co-occurrence graph ([[coOccurrenceEdges]] — a real
    * unified-id-space graph; the bipartite pagerank edges are
    * triangle-free by construction). Degree-ordered orientation keeps
    * the wedge join arboricity-bounded (measured 1.27M wedges for
    * 221k edges at sf0.1); fully exact, hash-oracled by relational
    * replay. */
  private[graft] def graphTriangles(s: SparkSession, dir: String): DataFrame =
    graft.ext.Graph.triangleCounts(coOccurrenceEdges(s, dir)).orderBy("id")

  /** Adamic–Adar link prediction ([[graft.ext.Graph.adamicAdar]])
    * over the part co-occurrence graph: top-50 NON-adjacent part
    * pairs by Σ 1/ln(deg) over common neighbors, hub pivots above
    * deg 64 dropped by the maxDeg guard. Scores round to 6 dp before
    * ranking on both engines (deterministic replayable top-k). */
  private[graft] def graphAdamicAdar(s: SparkSession, dir: String): DataFrame =
    graft.ext.Graph.adamicAdar(coOccurrenceEdges(s, dir), maxDeg = 64, topK = 50)

  /** Neighbor-set Jaccard link prediction ([[graft.ext.Graph
    * .jaccardLinks]]) over the same graph — [[graphAdamicAdar]]'s
    * sibling scorer: i′/(deg(x)+deg(y)−i′) with the identical hub
    * guard, replayed exactly by the oracle (one int division →
    * round 6 → rank). */
  private[graft] def graphJaccard(s: SparkSession, dir: String): DataFrame =
    graft.ext.Graph.jaccardLinks(coOccurrenceEdges(s, dir), maxDeg = 64, topK = 50)

  /** k-core ([[graft.ext.Graph.kCore]], k=4) of the same
    * co-occurrence graph: the standard subgraph-density filter
    * (community seeds, spam-cluster mining). Measured: peeling
    * converges in ≤ 2 rounds on every fixture, so the fixed
    * [[kcoreRounds]]-round unroll — idempotent after convergence —
    * IS the true 4-core with a 2-round margin, and the oracle
    * replays the identical unroll (each round is a degree agg + two
    * semi-joins = 3 keyed shuffles, so the unroll length is the
    * query's whole cost — don't pad it). */
  private[graft] def graphKcore(s: SparkSession, dir: String): DataFrame =
    graft.ext.Graph.kCore(coOccurrenceEdges(s, dir), k = 4,
      rounds = kcoreRounds).orderBy("id")

  final val lpaRounds = 4

  /** Multi-source BFS ([[graft.ext.Graph.shortestHops]], 4 rounds)
    * from parts {1, 2, 3, 4} over the part co-occurrence graph —
    * hop distance to the nearest seed for every node within 4 hops.
    * The min-plus unroll is exact once settled, so the oracle replays
    * the identical 4 rounds. */
  private[graft] def graphBfs(s: SparkSession, dir: String): DataFrame =
    graft.ext.Graph.shortestHops(coOccurrenceEdges(s, dir),
        seeds = Seq(1L, 2L, 3L, 4L), rounds = 4).orderBy("id")

  private[graft] val graphBfsSql: String = {
    val rounds = (1 to 4).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT id, min(dist) AS dist FROM (
         |    SELECT id, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT e.dst AS id, p.dist + 1 FROM ed e
         |    JOIN d${i - 1} p ON p.id = e.src) GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
       |            FROM lineitem WHERE l_linenumber <= 3),
       |e0 AS MATERIALIZED (SELECT DISTINCT x.p AS u, y.p AS v
       |       FROM ps x JOIN ps y ON x.o = y.o AND x.p < y.p),
       |ed AS MATERIALIZED (SELECT u AS src, v AS dst FROM e0
       |       UNION SELECT v, u FROM e0),
       |d0 AS (SELECT DISTINCT src AS id, CAST(0 AS BIGINT) AS dist FROM ed
       |       WHERE src IN (1, 2, 3, 4)),
       |$rounds
       |SELECT CAST(id AS BIGINT) AS id, CAST(dist AS BIGINT) AS dist
       |FROM d4 ORDER BY id""".stripMargin
  }

  /** Truncated harmonic closeness ([[graft.ext.Graph
    * .harmonicCloseness]], radius 4) of parts {1,2,3,4} on the part
    * co-occurrence graph — Σ 1/dist over the 4-hop neighborhood. All
    * four BFS waves share each round's single (seed, id)-keyed
    * join+agg; the oracle replays the identical keyed min-plus
    * unroll. */
  private[graft] def graphCloseness(s: SparkSession, dir: String): DataFrame =
    graft.ext.Graph.harmonicCloseness(coOccurrenceEdges(s, dir),
        seeds = Seq(1L, 2L, 3L, 4L), rounds = 4).orderBy("seed")

  private[graft] val graphClosenessSql: String = {
    val rounds = (1 to 4).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT seed, id, min(dist) AS dist FROM (
         |    SELECT seed, id, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT p.seed, e.dst AS id, p.dist + 1 FROM ed e
         |    JOIN d${i - 1} p ON p.id = e.src) GROUP BY seed, id)""".stripMargin
    }.mkString(",\n")
    s"""WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
       |            FROM lineitem WHERE l_linenumber <= 3),
       |e0 AS MATERIALIZED (SELECT DISTINCT x.p AS u, y.p AS v
       |       FROM ps x JOIN ps y ON x.o = y.o AND x.p < y.p),
       |ed AS MATERIALIZED (SELECT u AS src, v AS dst FROM e0
       |       UNION SELECT v, u FROM e0),
       |d0 AS (SELECT src AS seed, src AS id, CAST(0 AS BIGINT) AS dist
       |       FROM (SELECT DISTINCT src FROM ed) WHERE src IN (1, 2, 3, 4)),
       |$rounds
       |SELECT CAST(seed AS BIGINT) AS seed,
       |       CAST(count(*) AS BIGINT) AS n_reached,
       |       round(sum(1.0 / dist), 6) AS harmonic
       |FROM d4 WHERE dist > 0 GROUP BY seed ORDER BY seed""".stripMargin
  }

  /** Greedy k-center coreset selection ([[Similarity.kCenterSelect]],
    * k=8 from vector 0) over the embeddings — farthest-first traversal
    * on 1 − rounded-cosine. The oracle unrolls the full greedy trace:
    * per round an argmax CTE ((d desc, id) order) and a `least`
    * distance-update CTE, MATERIALIZED (each feeds two consumers). */
  private[graft] def sampleKcenter(s: SparkSession, dir: String): DataFrame =
    Similarity.kCenterSelect(t(s, dir, "embeddings"), k = 8, seedId = 0L)
      .orderBy("sel_rank")

  private[graft] val sampleKcenterSql: String = {
    def excl(r: Int): String =
      (Seq("id <> 0") ++ (2 until r).map(j => s"id <> (SELECT id FROM s$j)"))
        .mkString(" AND ")
    val rounds = (2 to 8).map { r =>
      val upd =
        if (r < 8)
          s""",
             |d$r AS MATERIALIZED (
             |  SELECT c.id, least(d${r - 1}.d,
             |    1.0 - round(list_cosine_similarity(c.v,
             |      (SELECT v FROM c WHERE id = (SELECT id FROM s$r))), 6)) AS d
             |  FROM c JOIN d${r - 1} ON d${r - 1}.id = c.id)""".stripMargin
        else ""
      s"""s$r AS MATERIALIZED (
         |  SELECT id, d FROM d${r - 1} WHERE ${excl(r)}
         |  ORDER BY d DESC, id LIMIT 1)$upd""".stripMargin
    }.mkString(",\n")
    val out = (2 to 8).map { r =>
      s"""UNION ALL SELECT CAST($r AS BIGINT), (SELECT CAST(id AS BIGINT) FROM s$r),
         |  round((SELECT d FROM s$r), 6)""".stripMargin
    }.mkString("\n")
    s"""WITH c AS MATERIALIZED (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |d1 AS MATERIALIZED (
       |  SELECT id, 1.0 - round(list_cosine_similarity(v,
       |    (SELECT v FROM c WHERE id = 0)), 6) AS d FROM c),
       |$rounds
       |SELECT CAST(1 AS BIGINT) AS sel_rank, CAST(0 AS BIGINT) AS vec_id,
       |       0.0 AS dist_at_selection
       |$out
       |ORDER BY sel_rank""".stripMargin
  }

  /** Label-propagation community detection
    * ([[graft.ext.Graph.labelPropagation]], [[lpaRounds]] synchronous
    * rounds, ties to the smallest label) over the part co-occurrence
    * graph — the lightweight community/cluster assignment next to the
    * structural [[graphKcore]]/[[graphTriangles]] family. The fixed
    * synchronous unroll is a pure function of the edge set, so the
    * oracle replays each round as one count aggregation + one
    * row_number argmax. */
  private[graft] def graphLpa(s: SparkSession, dir: String): DataFrame =
    graft.ext.Graph.labelPropagation(coOccurrenceEdges(s, dir),
      rounds = lpaRounds).orderBy("id")

  /** Newman modularity ([[graft.ext.Graph.modularity]]) of the LPA
    * communities over the co-occurrence graph — the quality score for
    * [[graphLpa]]'s assignment, oracled on the shared LPA replay. */
  private[graft] def graphModularity(s: SparkSession, dir: String): DataFrame = {
    // materialize the co-occurrence self-join ONCE (r18): LPA's
    // undirected expansion and modularity's canonical edge set both
    // derive from it — unmaterialized, the lineitem distinct+self-join
    // subtree re-executed per consumer (4+ times across the two
    // operators' branches)
    val edges = coOccurrenceEdges(s, dir).localCheckpoint()
    val labels = graft.ext.Graph.labelPropagation(edges, rounds = lpaRounds)
    graft.ext.Graph.modularity(edges, labels)
  }

  /** LPA training rounds as a WITH-body fragment (ps, e0, ed, l0,
    * l1..l4) — shared by the graph_lpa oracle and graph_modularity,
    * which scores the SAME community assignment. */
  private[graft] val graphLpaCtes: String = {
    val rounds = (1 to lpaRounds).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT id, label FROM (
         |    SELECT e.dst AS id, l.label, count(*) AS n,
         |           row_number() OVER (PARTITION BY e.dst
         |             ORDER BY count(*) DESC, l.label) AS rn
         |    FROM ed e JOIN l${i - 1} l ON l.id = e.src
         |    GROUP BY e.dst, l.label) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
       |            FROM lineitem WHERE l_linenumber <= 3),
       |e0 AS MATERIALIZED (SELECT DISTINCT x.p AS u, y.p AS v
       |       FROM ps x JOIN ps y ON x.o = y.o AND x.p < y.p),
       |ed AS MATERIALIZED (SELECT u AS src, v AS dst FROM e0
       |       UNION SELECT v, u FROM e0),
       |l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS label FROM ed),
       |$rounds""".stripMargin
  }

  private[graft] val graphLpaSql: String =
    s"""WITH $graphLpaCtes
       |SELECT CAST(id AS BIGINT) AS id, CAST(label AS BIGINT) AS label
       |FROM l$lpaRounds ORDER BY id""".stripMargin

  /** DuckDB oracle for graph_modularity: the shared LPA rounds produce
    * the community assignment; Newman Q folds exact-int per-community
    * terms, summed and rounded to 6 dp exactly like the engine. */
  private[graft] val graphModularitySql: String =
    s"""WITH $graphLpaCtes,
       |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e0),
       |deg AS (SELECT id, count(*) AS d FROM (
       |         SELECT u AS id FROM e0 UNION ALL SELECT v FROM e0) GROUP BY 1),
       |wl AS (SELECT lu.label AS lu, lv.label AS lv
       |       FROM e0 JOIN l$lpaRounds lu ON lu.id = e0.u
       |       JOIN l$lpaRounds lv ON lv.id = e0.v),
       |intra AS (SELECT lu AS c, CAST(count(*) AS BIGINT) AS lc
       |          FROM wl WHERE lu = lv GROUP BY 1),
       |dsum AS (SELECT l.label AS c, CAST(sum(deg.d) AS BIGINT) AS dc
       |         FROM deg JOIN l$lpaRounds l ON l.id = deg.id GROUP BY 1),
       |terms AS (SELECT
       |    CAST(coalesce(i.lc, 0) AS DOUBLE) / mm.m -
       |      (CAST(d.dc AS DOUBLE) / (2.0 * mm.m)) *
       |      (CAST(d.dc AS DOUBLE) / (2.0 * mm.m)) AS term, mm.m
       |  FROM dsum d LEFT JOIN intra i ON i.c = d.c CROSS JOIN mm)
       |SELECT CAST(count(*) AS BIGINT) AS n_communities,
       |       max(m) AS m_edges, round(sum(term), 6) AS modularity
       |FROM terms""".stripMargin

  /** Market-basket association rules: co-purchased part pairs per
    * order with support / confidence / lift (the a-priori 2-itemset
    * pass every recommender bootstraps from). Per-order pair
    * expansion is bounded by basket size (≤ 7 lines/order on TPC-H
    * shapes), so the self-join fans out O(n·k²/2), never corpus²;
    * counts are keyed aggregations, the order total is a single-row
    * broadcast, and the top-50 is TakeOrderedAndProject. All counts
    * are exact integers; confidence/lift are single divisions of
    * exact (< 2⁵³) products, bit-identical cross-engine, rounded to
    * 6 dp for display only. */
  private[graft] def basketRules(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("i"))
      .distinct()
    val nOrders = items.agg(countDistinct("o").as("n_orders"))
    val freq = items.groupBy("i").agg(count(lit(1)).as("n_i"))
    val pairs = items.as("x").join(items.as("y"),
        col("x.o") === col("y.o") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("a"), col("y.i").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 3)
    pairs
      .join(freq.select(col("i").as("a"), col("n_i").as("n_a")), "a")
      .join(freq.select(col("i").as("b"), col("n_i").as("n_b")), "b")
      .crossJoin(broadcast(nOrders))
      .select(col("a"), col("b"), col("n_ab"),
        round(col("n_ab").cast("double") / col("n_a"), 6).as("confidence"),
        round(col("n_ab").cast("double") * col("n_orders") /
          (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy(col("n_ab").desc, col("a"), col("b"))
      .limit(50)
  }

  private[graft] val basketRulesSql: String =
    s"""WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
       |               FROM lineitem),
       |n AS (SELECT count(DISTINCT o) AS n_orders FROM items),
       |f AS (SELECT i, count(*) AS n_i FROM items GROUP BY 1),
       |p AS (SELECT x.i AS a, y.i AS b, count(*) AS n_ab
       |      FROM items x JOIN items y ON x.o = y.o AND x.i < y.i
       |      GROUP BY 1, 2 HAVING count(*) >= 3)
       |SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       |       CAST(n_ab AS BIGINT) AS n_ab,
       |       round(CAST(n_ab AS DOUBLE) / fa.n_i, 6) AS confidence,
       |       round(CAST(n_ab AS DOUBLE) * n.n_orders / (fa.n_i * fb.n_i), 6)
       |         AS lift
       |FROM p JOIN f fa ON fa.i = p.a JOIN f fb ON fb.i = p.b CROSS JOIN n
       |ORDER BY n_ab DESC, a, b LIMIT 50""".stripMargin

  /** Entity resolution / fuzzy canonicalization over the DISTINCT
    * part-name space: block on the last name token, score candidate
    * pairs with exact integer Levenshtein distance (built-in on both
    * engines), and pick each name's best fuzzy match as a single
    * min-struct argmin (distance, then lexicographic tie). The scale
    * design IS the distinct-first shape: fuzzy matching runs on the
    * deduplicated entity space (groupBy name — orders of magnitude
    * smaller than the row count at 100 TB), with row frequencies
    * carried along from the same aggregation; blocking bounds the
    * within-block self-join exactly like the dedup band joins. */
  /** Blocked fuzzy ER best-match per name through
    * [[graft.ext.Dedup.erPairs]] (candidate pairs with the maxBlock
    * hot-block guard — oversized blocks are dropped before the
    * within-block self-join on BOTH engines). */
  private[graft] def erFuzzy(s: SparkSession, dir: String): DataFrame =
    graft.ext.Dedup.erPairs(t(s, dir, "part"), "p_name",
        maxDist = 4, maxBlock = 500)
      .groupBy(col("name"))
      .agg(max(col("n_rows")).as("n_rows"),
        min(struct(col("dist").as("d"), col("cand").as("m"))).as("best"))
      .select(col("name"), col("n_rows"),
        col("best.m").as("best_match"), col("best.d").as("dist"))
      .orderBy("name")

  private[graft] val erFuzzySql: String =
    s"""WITH names AS (SELECT p_name AS name, count(*) AS n_rows
       |               FROM part GROUP BY 1),
       |b AS (SELECT name, n_rows,
       |        list_extract(string_split(name, ' '),
       |          len(string_split(name, ' '))) AS blk FROM names),
       |small AS (SELECT blk FROM b GROUP BY blk HAVING count(*) <= 500),
       |bk AS (SELECT b.* FROM b SEMI JOIN small USING (blk)),
       |cand AS (SELECT l.name AS name, l.n_rows, r.name AS m,
       |           levenshtein(l.name, r.name) AS d
       |         FROM bk l JOIN bk r ON l.blk = r.blk AND l.name <> r.name
       |         WHERE levenshtein(l.name, r.name) <= 4)
       |SELECT name, n_rows, m AS best_match, CAST(d AS INT) AS dist
       |FROM cand
       |QUALIFY row_number() OVER (PARTITION BY name ORDER BY d, m) = 1
       |ORDER BY name""".stripMargin

  /** Golden-record construction — the full ER pipeline composed:
    * [[graft.ext.Dedup.erPairs]] at dist ≤ 2 (blocked, bounded
    * levenshtein) → ids via min part key per name → [[graft.ext.Dedup
    * .clusterIds]] connected components → per-cluster canonical name
    * (max row count, ties to the lexicographically-first name) via one
    * min-struct aggregation. Every stage is exact
    * (ints/strings/levenshtein), so the whole match→cluster→survive
    * pipeline hash-oracles against a recursive-closure replay. */
  private[graft] def erGolden(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part")
    val names = part.groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_rows"), min(col("p_partkey")).cast("long").as("nid"))
    val idOf = names.select(col("name"), col("nid"))
    val pid = graft.ext.Dedup.erPairs(part, "p_name", maxDist = 2, maxBlock = 500)
      .join(idOf, Seq("name"))
      .join(idOf.select(col("name").as("cand"), col("nid").as("__nb")), Seq("cand"))
      .select(col("nid").as("id_a"), col("__nb").as("id_b"))
      .filter(col("id_a") < col("id_b")).distinct()
    val cc = graft.ext.Dedup.clusterIds(
      names.select(col("nid").as("doc_id")), pid, "doc_id")
    val clustered = names.join(
      cc.select(col("doc_id").as("nid"), col("cluster_id")), Seq("nid"))
    val canon = clustered.groupBy("cluster_id")
      .agg(min(struct((-col("n_rows")).as("neg"), col("name").as("nm"))).as("c"))
      .select(col("cluster_id"), col("c.nm").as("canonical"))
    clustered.join(canon, Seq("cluster_id"))
      .select(col("name"), col("cluster_id"), col("canonical"), col("n_rows"))
      .orderBy("name")
  }

  private[graft] val erGoldenSql: String =
    """WITH RECURSIVE names AS (
      |  SELECT p_name AS name, count(*) AS n_rows,
      |         CAST(min(p_partkey) AS BIGINT) AS nid
      |  FROM part GROUP BY 1),
      |b AS (SELECT name, nid,
      |        list_extract(string_split(name, ' '),
      |          len(string_split(name, ' '))) AS blk FROM names),
      |small AS (SELECT blk FROM b GROUP BY blk HAVING count(*) <= 500),
      |bk AS (SELECT b.* FROM b SEMI JOIN small USING (blk)),
      |pr AS (SELECT l.nid AS id_a, r.nid AS id_b
      |       FROM bk l JOIN bk r ON l.blk = r.blk AND l.name <> r.name
      |       WHERE levenshtein(l.name, r.name) <= 2 AND l.nid < r.nid),
      |edges AS (SELECT id_a AS s, id_b AS d FROM pr
      |          UNION SELECT id_b, id_a FROM pr),
      |reach(id, r) AS (
      |  SELECT nid, nid FROM names
      |  UNION
      |  SELECT reach.id, e.d FROM reach JOIN edges e ON reach.r = e.s),
      |cl AS (SELECT id AS nid, min(r) AS cluster_id FROM reach GROUP BY id),
      |j AS (SELECT n.name, n.n_rows, cl.cluster_id
      |      FROM names n JOIN cl USING (nid)),
      |canon AS (SELECT cluster_id, name AS canonical FROM (
      |    SELECT cluster_id, name,
      |           row_number() OVER (PARTITION BY cluster_id
      |             ORDER BY n_rows DESC, name) AS rn FROM j) WHERE rn = 1)
      |SELECT j.name, j.cluster_id, c.canonical, j.n_rows
      |FROM j JOIN canon c USING (cluster_id) ORDER BY j.name""".stripMargin

  /** Shared decimal literals for the Poisson(1) inverse CDF: the SAME
    * strings are parsed by scalac (Spark side) and DuckDB (oracle
    * side), so both engines compare u against bit-identical doubles.
    * P(X ≤ k) for k = 0..8; the tail (u ≥ last) maps to 9. */
  private[graft] val poissonCdf: Seq[String] = Seq(
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238463", "0.9963401531726563", "0.9994058151824183",
    "0.999916758850712", "0.9999897508033253", "0.999998874797402")

  /** Poisson bootstrap confidence intervals for mean(value) per
    * event_type — the ONE-PASS distributed bootstrap (Chamandy et al.
    * 2012): instead of resampling n rows with replacement B times
    * (B shuffles of the corpus), every row draws B independent
    * Poisson(1) multiplicities — here deterministically, from an md5
    * uniform through the shared inverse-CDF ladder — so all B = 32
    * replicate means come out of ONE explode + ONE keyed aggregation.
    * Replicate means round sums before the ratio (oracle-exactness
    * rule); the CI is the 2nd-smallest / 2nd-largest replicate mean
    * (a rank statistic — no cross-engine quantile interpolation to
    * match). Scale shape: map-side explode ×32, one agg keyed on
    * (type, replicate), one tiny per-type fold — no window, no
    * driver loop. */
  private[graft] def statsBootstrap(s: SparkSession, dir: String): DataFrame = {
    val B = 32
    val ev = t(s, dir, "events")
      .select(col("event_type"), col("event_id"),
        col("value").cast("double").as("x"))
    val u = conv(substring(md5(concat(lit("bs"),
        col("event_id").cast("string"), lit(":"), col("b").cast("string"))),
        1, 8), 16, 10).cast("double") / 4294967296.0
    val w = poissonCdf.zipWithIndex.foldRight(lit(9): Column) {
      case ((c, k), acc) => when(col("u") < lit(c.toDouble), lit(k)).otherwise(acc)
    }
    val repMeans = ev
      .select(col("event_type"), col("event_id"), col("x"),
        explode(sequence(lit(0), lit(B - 1))).as("b"))
      .withColumn("u", u)
      .withColumn("w", w)
      .groupBy("event_type", "b")
      .agg((round(sum(col("w") * col("x")), 4) /
        sum(col("w")).cast("double")).as("m0"))
      .select(col("event_type"), col("b"), round(col("m0"), 6).as("m"))
    val ci = repMeans.groupBy("event_type")
      .agg(sort_array(collect_list(col("m"))).as("ms"))
      .select(col("event_type"), element_at(col("ms"), 2).as("ci_lo"),
        element_at(col("ms"), B - 1).as("ci_hi"))
    val pt = ev.groupBy("event_type")
      .agg(round(round(sum("x"), 4) / count(lit(1)), 6).as("point"))
    pt.join(ci, "event_type")
      .select("event_type", "point", "ci_lo", "ci_hi")
      .orderBy("event_type")
  }

  private[graft] val statsBootstrapSql: String = {
    val cases = poissonCdf.zipWithIndex
      .map { case (c, k) => s"WHEN u < $c THEN $k" }.mkString(" ")
    s"""WITH r AS (SELECT event_type, value AS x, event_id,
       |             unnest(generate_series(0, 31)) AS b FROM events),
       |uu AS (SELECT event_type, x, b,
       |         ('0x' || substr(md5('bs' || CAST(event_id AS VARCHAR) || ':'
       |            || CAST(b AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u
       |       FROM r),
       |w AS (SELECT event_type, x, b, CASE $cases ELSE 9 END AS w FROM uu),
       |m AS (SELECT event_type, b,
       |        round(round(sum(w * x), 4) / CAST(sum(w) AS DOUBLE), 6) AS m
       |      FROM w GROUP BY 1, 2),
       |ci AS (SELECT event_type, list_sort(list(m)) AS ms FROM m GROUP BY 1),
       |pt AS (SELECT event_type, round(round(sum(value), 4) / count(*), 6)
       |         AS point FROM events GROUP BY 1)
       |SELECT pt.event_type, point, ms[2] AS ci_lo, ms[31] AS ci_hi
       |FROM pt JOIN ci USING (event_type) ORDER BY event_type""".stripMargin
  }

  /** Exact heavy hitters with frequency share — the hot-key detector
    * run before choosing salting/bucketing strategies (the diagnosis
    * step behind [[graft.operators.SaltedJoin]]). One keyed count +
    * the bounded-heap top-k aggregate (never a global sort) + a
    * single-row total broadcast. */
  private[graft] def q54HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "lineitem")
      .groupBy("l_partkey").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").as("tot"))
    counts
      .agg(graft.functions.fx.topKByScore(col("n").cast("double"),
        col("l_partkey"), 20).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "t")))
      .crossJoin(broadcast(tot))
      .select((col("pos") + 1).as("rank"), col("t.id").as("l_partkey"),
        col("t.score").cast("long").as("n"),
        round(col("t.score") / col("tot").cast("double"), 6).as("share"))
      .orderBy("rank")
  }

  /** Per-group top-k WITHOUT a rank window: top-3 parts per supplier
    * by revenue through the bounded-heap aggregate ([[graft.functions
    * .fx.topKByScore]]) — at 100 TB a `row_number() OVER (PARTITION BY
    * supplier)` materializes and sorts every group in full; the heap
    * aggregate carries at most k entries per group through a map-side-
    * combinable shuffle. Revenue rounds to 4 dp BEFORE ranking (the
    * rounded-ranking rule) with part-id ties, so the heap order and
    * the oracle's window replay agree exactly. */
  private[graft] def q56TopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .groupBy(col("l_suppkey").cast("long").as("suppkey"),
        col("l_partkey").cast("long").as("partkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"))
    rev.groupBy("suppkey")
      .agg(graft.functions.fx.topKByScore(col("revenue"), col("partkey"), 3)
        .as("top"))
      .select(col("suppkey"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("suppkey"), (col("pos") + 1).as("rank"),
        col("t.id").as("partkey"), col("t.score").as("revenue"))
      .orderBy("suppkey", "rank")
  }

  private[graft] val q56TopkPerGroupSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey AS suppkey, l_partkey AS partkey,
      |         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT CAST(suppkey AS BIGINT) AS suppkey, CAST(rn AS INT) AS rank,
      |       CAST(partkey AS BIGINT) AS partkey, revenue
      |FROM (SELECT suppkey, partkey, revenue,
      |        row_number() OVER (PARTITION BY suppkey
      |          ORDER BY revenue DESC, partkey) AS rn FROM rev)
      |WHERE rn <= 3 ORDER BY suppkey, rank""".stripMargin

  /** 2-D Pareto frontier (skyline: minimize price AND size) of the
    * part catalog via the sort-scan method: deduplicate to distinct
    * (price, size) pairs, sort, and a pair is dominated iff the
    * running min of size over STRICTLY preceding pairs is ≤ its size
    * (every preceding pair has smaller price, or equal price and
    * smaller size — either way domination is strict somewhere). The
    * window is global but runs over the DEDUPLICATED value-pair
    * space — bounded by the attribute domain, the same
    * corpus-independent class as vocab/quantizer state, never the
    * row count. */
  /** Pareto frontier over deduped (price, size) pairs through the
    * partition-wise skyline ([[graft.ext.Skyline.front2d]]): local
    * skylines on range slices merged by prefix minima — identical
    * result to the single-window running-min the oracle keeps, with
    * no single-partition exchange in the plan (PlanSpec pins it). */
  private[graft] def paretoFront(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "part")
      .groupBy(col("p_retailprice").cast("double").as("price"),
        col("p_size").cast("long").as("size"))
      .agg(count(lit(1)).as("n_parts"))
    graft.ext.Skyline.front2d(pairs, "price", "size")
      .orderBy("price", "size")
  }

  private[graft] val paretoFrontSql: String =
    """WITH pairs AS (
      |  SELECT CAST(p_retailprice AS DOUBLE) AS price,
      |         CAST(p_size AS BIGINT) AS size, count(*) AS n_parts
      |  FROM part GROUP BY 1, 2),
      |m AS (SELECT price, size, n_parts,
      |        min(size) OVER (ORDER BY price, size
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |      FROM pairs)
      |SELECT price, size, n_parts FROM m
      |WHERE pm IS NULL OR pm > size ORDER BY price, size""".stripMargin

  /** Inverted-index build (the IR-side sibling of [[textBm25]]):
    * per-term document frequency, total term frequency, and the
    * SORTED posting list (md5 of the ordered doc-id string — the
    * repo's list-compare idiom). Two keyed aggregations — (term, doc)
    * tf, then per-term fold — both map-side-combinable; the posting
    * order comes from sort_array inside the aggregate, never a global
    * sort. */
  private[graft] def textPostings(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("tf_total"),
        md5(concat_ws(",", transform(sort_array(collect_list(col("doc_id"))),
          _.cast("string")))).as("postings_md5"))
      .orderBy("term")

  private[graft] lazy val textPostingsSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest($duckToks) AS term FROM documents),
       |td AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2)
       |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total,
       |       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
       |         AS postings_md5
       |FROM td GROUP BY term ORDER BY term""".stripMargin

  /** Zipf-fit oracle: identical vocab window + OLS staging (sums
    * round 6 dp; rounded slope feeds the intercept). */
  private[graft] lazy val textZipfSql: String =
    s"""WITH tok AS (SELECT unnest($duckToks) AS term FROM documents),
       |tf AS (SELECT term, count(*) AS n FROM tok GROUP BY 1 HAVING count(*) >= 5),
       |rk AS (SELECT n, row_number() OVER (ORDER BY n DESC, term) AS r FROM tf),
       |pts AS (SELECT ln(r) AS x, ln(n) AS y FROM rk WHERE r <= 1000),
       |sums AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
       |                round(sum(x), 6) AS sx, round(sum(y), 6) AS sy,
       |                round(sum(x * x), 6) AS sxx, round(sum(x * y), 6) AS sxy
       |         FROM pts),
       |sl AS (SELECT *, round((n_terms * sxy - sx * sy) /
       |                       (n_terms * sxx - sx * sx), 6) AS slope FROM sums)
       |SELECT n_terms, slope,
       |       round((sy - slope * sx) / n_terms, 6) AS intercept
       |FROM sl""".stripMargin

  /** Grouped OLS regression from sufficient statistics: slope /
    * intercept of each event_type's daily value total against the
    * epoch day, computed closed-form from (n, Σx, Σx², Σy, Σxy) — ONE
    * keyed aggregation over the daily table, no iterative solver, the
    * shape that regresses a billion groups in one pass. x-sums are
    * exact int64 (day ≈ 2·10⁴, Σx² ≈ 10¹⁰ per 30-day group); y-sums
    * round before the closed form; the slope ROUNDS to 6 dp before
    * the intercept uses it, so both engines feed identical inputs
    * into every stage. */
  private[graft] def statsRegression(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"),
        (unix_timestamp(date_trunc("day", col("ts"))) / 86400L).cast("long")
          .as("day"))
      .agg(round(sum("value"), 4).as("y"))
    val suff = daily.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum("day").as("sx"),
      sum(col("day") * col("day")).as("sxx"),
      round(sum("y"), 4).as("sy"),
      round(sum(col("day") * col("y")), 2).as("sxy"))
    val slope = round(
      (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
    suff
      .withColumn("slope", slope)
      .withColumn("intercept",
        round((col("sy") - col("slope") * col("sx")) / col("n"), 6))
      .select("event_type", "n", "slope", "intercept")
      .orderBy("event_type")
  }

  private[graft] val statsRegressionSql: String =
    s"""WITH daily AS (
       |  SELECT event_type,
       |         CAST(epoch(date_trunc('day', ts)) // 86400 AS BIGINT) AS day,
       |         round(sum(value), 4) AS y
       |  FROM events GROUP BY 1, 2),
       |suff AS (
       |  SELECT event_type, count(*) AS n,
       |         CAST(sum(day) AS BIGINT) AS sx,
       |         CAST(sum(day * day) AS BIGINT) AS sxx,
       |         round(sum(y), 4) AS sy,
       |         round(sum(day * y), 2) AS sxy
       |  FROM daily GROUP BY 1),
       |sl AS (
       |  SELECT event_type, n, sx, sy,
       |         round((n * sxy - sx * sy) /
       |           CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope
       |  FROM suff)
       |SELECT event_type, n, slope,
       |       round((sy - slope * sx) / n, 6) AS intercept
       |FROM sl ORDER BY event_type""".stripMargin

  /** Pearson correlation per group, from sufficient statistics over
    * PRE-SCALED columns: quantity/100 and extendedprice/100000 —
    * correlation is scale-invariant, and the scaling keeps every sum
    * small enough (≲10⁴ at gate SF) that round(6) cleanly collapses
    * the cross-engine last-ulp band (unscaled, Σprice² ≈ 10¹⁴ has an
    * absolute ulp near 0.03 and no safe rounding). Per-row divisions
    * are bit-identical IEEE on both engines; one keyed aggregation
    * total. */
  private[graft] def statsCorr(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_returnflag"),
      (col("l_quantity") / 100.0).as("x"),
      (col("l_extendedprice") / 100000.0).as("y"))
    val suff = li.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      round(sum("x"), 6).as("sx"), round(sum("y"), 6).as("sy"),
      round(sum(col("x") * col("x")), 6).as("sxx"),
      round(sum(col("y") * col("y")), 6).as("syy"),
      round(sum(col("x") * col("y")), 6).as("sxy"))
    suff.select(col("l_returnflag"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6)
          .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  private[graft] val statsCorrSql: String =
    s"""WITH li AS (SELECT l_returnflag,
       |              l_quantity / 100.0 AS x,
       |              l_extendedprice / 100000.0 AS y FROM lineitem),
       |suff AS (
       |  SELECT l_returnflag, count(*) AS n,
       |         round(sum(x), 6) AS sx, round(sum(y), 6) AS sy,
       |         round(sum(x * x), 6) AS sxx, round(sum(y * y), 6) AS syy,
       |         round(sum(x * y), 6) AS sxy
       |  FROM li GROUP BY 1)
       |SELECT l_returnflag, n,
       |       round((n * sxy - sx * sy) /
       |         sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
       |         AS corr_qty_price
       |FROM suff ORDER BY l_returnflag""".stripMargin

  /** Schema drift detection ([[graft.ext.Profile.schemaDiff]]): orders
    * vs a deliberately evolved projection (one column dropped, one
    * added, one type-widened). Analysis-only — the plans never
    * execute — so the oracle is the expected literal diff. */
  private[graft] def schemaDiff(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
    val evolved = base
      .drop("o_orderstatus")
      .withColumn("o_priority_rank", lit(1))
      .withColumn("o_orderkey", col("o_orderkey").cast("string"))
    graft.ext.Profile.schemaDiff(base, evolved).orderBy("column")
  }

  private[graft] val schemaDiffSql: String =
    """SELECT * FROM (VALUES
      |  ('o_orderkey', 'bigint', 'string', 'type_changed'),
      |  ('o_orderstatus', 'string', NULL, 'removed'),
      |  ('o_priority_rank', NULL, 'int', 'added'))
      |  AS t("column", old_type, new_type, status)
      |ORDER BY "column"""".stripMargin

  /** Robust (median/MAD) anomaly counts per event_type — the
    * outlier-resistant sibling of q48's mean/stddev z-score. Median
    * and MAD round to 6 dp BEFORE the threshold compare on both
    * engines (the rounded-ranking rule), so the outlier count is
    * deterministic; 4.4478 = 3 / 0.6745 (the 3-sigma-equivalent MAD
    * multiplier), written as the same literal in both engines. */
  private[graft] def q55Mad(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_type"), col("value").cast("double").as("x"))
    val med = ev.groupBy("event_type")
      .agg(round(expr("percentile(x, 0.5)"), 6).as("med"))
    val dev = ev.join(med, "event_type")
      .withColumn("adev", abs(col("x") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(round(expr("percentile(adev, 0.5)"), 6).as("mad"))
    dev.join(mad, "event_type")
      .groupBy("event_type")
      .agg(first("med").as("med"), first("mad").as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("adev") > lit(4.4478) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy("event_type")
  }

  /** Adjacent-bigram PMI collocations ([[graft.ext.Text.pmi]],
    * min count 5) — phrase mining over the corpus. */
  private[graft] def textPmi(s: SparkSession, dir: String): DataFrame =
    graft.ext.Text.pmi(t(s, dir, "documents"), minCount = 5L)
      .orderBy("w1", "w2")

  /** As-of (point-in-time) join: each event picks up the latest order
    * date of its user at-or-before the event time ([[graft.operators
    * .AsOfJoin]] — union + running-last window, ONE shuffle, no join
    * node). Oracled against DuckDB's native ASOF LEFT JOIN; the output
    * value (the order DATE itself) is tie-invariant when a user has
    * several orders on their latest date. */
  private[graft] def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select("user_id", "ts")
    val ord = t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderdate").cast("timestamp").as("o_ts"), col("o_orderdate"))
    graft.operators.AsOfJoin.asOf(ev, ord,
        leftKey = "user_id", leftTime = "ts",
        rightKey = "o_custkey", rightTime = "o_ts", rightVals = Seq("o_orderdate"))
      .select(col("user_id"), col("ts"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("last_order_date"))
      .orderBy("user_id", "ts")
  }

  /** [[asofJoin]] with a 30-day staleness bound ([[graft.operators
    * .AsOfJoin.asOfTolerance]]): the attached order date nulls out
    * when older than the tolerance — pandas `merge_asof(tolerance)`
    * semantics, same single-shuffle window plan. Oracle: DuckDB ASOF
    * join + an epoch-gap CASE (match-then-null-out is exact because
    * the as-of match IS the most recent candidate). */
  private[graft] def asofTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select("user_id", "ts")
    val ord = t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderdate").cast("timestamp").as("o_ts"),
      col("o_orderdate"))
    graft.operators.AsOfJoin.asOfTolerance(ev, ord,
        leftKey = "user_id", leftTime = "ts",
        rightKey = "o_custkey", rightTime = "o_ts",
        rightVals = Seq("o_orderdate"), toleranceSeconds = 2592000L)
      .select(col("user_id"), col("ts"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("last_order_date"))
      .orderBy("user_id", "ts")
  }

  private[graft] val asofToleranceSql: String =
    """SELECT e.user_id, e.ts,
      |       CASE WHEN o.o_orderdate IS NOT NULL
      |              AND epoch_us(e.ts) -
      |                  epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
      |                  <= CAST(2592000 AS BIGINT) * 1000000
      |            THEN strftime(o.o_orderdate, '%Y-%m-%d') END
      |         AS last_order_date
      |FROM events e
      |ASOF LEFT JOIN orders o
      |  ON e.user_id = o.o_custkey AND e.ts >= CAST(o.o_orderdate AS TIMESTAMP)
      |ORDER BY user_id, ts""".stripMargin

  /** Bounded-round weighted SSSP ([[graft.ext.Graph.weightedSssp]],
    * Bellman–Ford min-plus, 4 rounds) from parts {1,2,3,4} on the
    * bipartite graph weighted by the cheapest quantity on each edge —
    * all-integer distances, keyed relaxation join+agg per round,
    * oracle replays the identical unroll. */
  private[graft] def graphSssp(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val fwd = li.filter(col("l_returnflag") =!= "R")
      .select(col("l_partkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"),
        col("l_quantity").cast("long").as("w"))
    val rev = li.filter(col("l_returnflag") === "R")
      .select((col("l_suppkey") + 1000000L).as("src"), col("l_partkey").as("dst"),
        col("l_quantity").cast("long").as("w"))
    graft.ext.Graph.weightedSssp(fwd.union(rev), seeds = Seq(1L, 2L, 3L, 4L),
        rounds = 4)
      .orderBy("id")
  }

  private[graft] val graphSsspSql: String = {
    val rounds = (1 to 4).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT id, min(dist) AS dist FROM (
         |    SELECT id, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT e.dst AS id, p.dist + e.w FROM e
         |    JOIN d${i - 1} p ON p.id = e.src) GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""WITH raw AS (
       |  SELECT l_partkey AS src, 1000000 + l_suppkey AS dst,
       |         CAST(l_quantity AS BIGINT) AS w
       |  FROM lineitem WHERE l_returnflag <> 'R'
       |  UNION ALL
       |  SELECT 1000000 + l_suppkey, l_partkey, CAST(l_quantity AS BIGINT)
       |  FROM lineitem WHERE l_returnflag = 'R'),
       |e AS MATERIALIZED (
       |  SELECT src, dst, CAST(min(w) AS BIGINT) AS w FROM raw
       |  WHERE src <> dst GROUP BY src, dst),
       |d0 AS (SELECT DISTINCT src AS id, CAST(0 AS BIGINT) AS dist FROM e
       |       WHERE src IN (1, 2, 3, 4)),
       |$rounds
       |SELECT CAST(id AS BIGINT) AS id, CAST(dist AS BIGINT) AS dist
       |FROM d4 ORDER BY id""".stripMargin
  }

  /** Bivariate OLS — `price ~ quantity + 100·discount` — by NORMAL
    * EQUATIONS through Cramer's rule: ONE aggregation produces the
    * full moment matrix (x-moments exact int64 — discount is
    * 2-dp-decimal so ×100 is an exact integer; y-moments round 4),
    * then the 3×3 solve is an explicit scalar chain with forced
    * association, cast-to-double at the top (products overflow int64
    * at scale; the cast is the same deterministic op both engines).
    * The multi-feature sibling of the grouped [[statsRegression]]. */
  private[graft] def statsRegression2(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(
      col("l_quantity").cast("long").as("x"),
      round(col("l_discount") * 100.0, 0).cast("long").as("z"),
      // y pre-scales by 1e-6 (the stats_corr discipline): raw sum(x*y)
      // reaches ~1e12 where a 4-dp round sits inside the shuffle-order
      // ulp band; scaled sums stay ~1e4-1e5 and round(6) is safe.
      // Coefficients come out in 1e-6-price units.
      (col("l_extendedprice") / 1000000.0).as("y"))
    val a = li.agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("z").as("sz"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("z")).as("sxz"),
      sum(col("z") * col("z")).as("szz"),
      round(sum("y"), 6).as("sy"),
      round(sum(col("x") * col("y")), 6).as("sxy"),
      round(sum(col("z") * col("y")), 6).as("szy"))
    def d(c: Column): Column = c.cast("double")
    val (n, sx, sz) = (d(col("n")), d(col("sx")), d(col("sz")))
    val (sxx, sxz, szz) = (d(col("sxx")), d(col("sxz")), d(col("szz")))
    val (sy, sxy, szy) = (col("sy"), col("sxy"), col("szy"))
    val det = n * (sxx * szz - sxz * sxz) - sx * (sx * szz - sxz * sz) +
      sz * (sx * sxz - sxx * sz)
    val detB0 = sy * (sxx * szz - sxz * sxz) - sx * (sxy * szz - sxz * szy) +
      sz * (sxy * sxz - sxx * szy)
    val detB1 = n * (sxy * szz - sxz * szy) - sy * (sx * szz - sxz * sz) +
      sz * (sx * szy - sxy * sz)
    val detB2 = n * (sxx * szy - sxy * sxz) - sx * (sx * szy - sxy * sz) +
      sy * (sx * sxz - sxx * sz)
    a.select(col("n"),
      round(detB0 / det, 6).as("intercept"),
      round(detB1 / det, 6).as("beta_qty"),
      round(detB2 / det, 6).as("beta_disc100"))
  }

  private[graft] val statsRegression2Sql: String =
    """WITH a AS (SELECT
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
      |    CAST(sum(CAST(round(l_discount * 100.0, 0) AS BIGINT)) AS BIGINT) AS sz,
      |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
      |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(round(l_discount * 100.0, 0) AS BIGINT)) AS BIGINT) AS sxz,
      |    CAST(sum(CAST(round(l_discount * 100.0, 0) AS BIGINT) * CAST(round(l_discount * 100.0, 0) AS BIGINT)) AS BIGINT) AS szz,
      |    round(sum(l_extendedprice / 1000000.0), 6) AS sy,
      |    round(sum(CAST(l_quantity AS BIGINT) * (l_extendedprice / 1000000.0)), 6) AS sxy,
      |    round(sum(CAST(round(l_discount * 100.0, 0) AS BIGINT) * (l_extendedprice / 1000000.0)), 6) AS szy
      |  FROM lineitem),
      |b AS (SELECT n, sy, sxy, szy,
      |        CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
      |        CAST(sz AS DOUBLE) AS szd, CAST(sxx AS DOUBLE) AS sxxd,
      |        CAST(sxz AS DOUBLE) AS sxzd, CAST(szz AS DOUBLE) AS szzd
      |      FROM a)
      |SELECT n,
      |       round((sy * (sxxd * szzd - sxzd * sxzd)
      |              - sxd * (sxy * szzd - sxzd * szy)
      |              + szd * (sxy * sxzd - sxxd * szy)) /
      |             (nd * (sxxd * szzd - sxzd * sxzd)
      |              - sxd * (sxd * szzd - sxzd * szd)
      |              + szd * (sxd * sxzd - sxxd * szd)), 6) AS intercept,
      |       round((nd * (sxy * szzd - sxzd * szy)
      |              - sy * (sxd * szzd - sxzd * szd)
      |              + szd * (sxd * szy - sxy * szd)) /
      |             (nd * (sxxd * szzd - sxzd * sxzd)
      |              - sxd * (sxd * szzd - sxzd * szd)
      |              + szd * (sxd * sxzd - sxxd * szd)), 6) AS beta_qty,
      |       round((nd * (sxxd * szy - sxy * sxzd)
      |              - sxd * (sxd * szy - sxy * szd)
      |              + sy * (sxd * sxzd - sxxd * szd)) /
      |             (nd * (sxxd * szzd - sxzd * sxzd)
      |              - sxd * (sxd * szzd - sxzd * szd)
      |              + szd * (sxd * sxzd - sxxd * szd)), 6) AS beta_disc100
      |FROM b""".stripMargin

  /** Skew-salted join ([[graft.operators.SaltedJoin]]): lineitem ⋈
    * supplier with the fact side split across 8 deterministic salts —
    * output must equal the plain equi-join (the oracle runs the
    * unsalted SQL), proving salting is a pure physical rewrite. */
  private[graft] def saltedJoin(s: SparkSession, dir: String): DataFrame =
    graft.operators.SaltedJoin.saltedInner(
        t(s, dir, "lineitem"), t(s, dir, "supplier"),
        "l_suppkey", "s_suppkey", salts = 8,
        saltBy = struct(col("l_orderkey"), col("l_linenumber")))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy("s_nationkey")

  /** Bloom-prefiltered join ([[graft.operators.BloomJoin]]): orders ⋈
    * high-balance customers, with the fact side pruned by a Bloom
    * filter of the dim keys BEFORE its shuffle (semi-join reduction).
    * Output must equal the plain inner join — the oracle runs the
    * unreduced SQL — proving the Bloom stage is a pure physical
    * optimization (false positives die in the exact join). */
  private[graft] def bloomJoin(s: SparkSession, dir: String): DataFrame =
    graft.operators.BloomJoin.bloomInner(
        t(s, dir, "orders"),
        t(s, dir, "customer").filter(col("c_acctbal") > 9000)
          .select("c_custkey", "c_mktsegment"),
        "o_custkey", "c_custkey",
        expectedItems = 100000L, numBits = 1048576L)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("c_mktsegment")

  /** Range (interval-containment) join ([[graft.operators.RangeJoin]]):
    * count the orders dated inside each of ~50 promo windows (5-day
    * half-open intervals anchored at the lowest-keyed orders) with NO
    * equi key between the sides. The bin-bucketed rewrite turns what
    * Spark would plan as a nested-loop/cartesian into a plain shuffled
    * equi join on 7-day bin labels (PlanSpec-asserted); the oracle runs
    * the naive inequality join in DuckDB. Dates become exact epoch-day
    * longs on both sides — no timestamp/timezone arithmetic in the
    * join. */
  private[graft] def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val days = datediff(col("o_orderdate"), lit("1970-01-01").cast("date")).cast("long")
    val points = t(s, dir, "orders").select(days.as("d"))
    val intervals = t(s, dir, "orders").filter(col("o_orderkey") <= 200)
      .select(col("o_orderkey").as("win_id"),
        days.as("w_start"), (days + 5).as("w_end"))
    graft.operators.RangeJoin.pointInInterval(points, "d",
        intervals, "w_start", "w_end", binWidth = 7L)
      .groupBy("win_id").agg(count(lit(1)).as("n_orders"))
      .orderBy("win_id")
  }

  /** JSON source roundtrip: parquet → JSON lines → spark.read.json
    * (schema inferred) — the reference's Snowflake JSON file-format
    * path (locopy/snowflake.py:60-69). */
  private[graft] def loadJsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("region_json")
    t(s, dir, "region").coalesce(1).write.json(out)
    Load.read(s, out, "json")
      .select(col("r_regionkey").cast("long").as("r_regionkey"), col("r_name"))
      .orderBy("r_regionkey")
  }

  /** ORC source/sink roundtrip — engine-native columnar format beyond
    * the reference's csv/json/parquet whitelists (kept off the
    * [[graft.io.Options]] translate maps, which mirror the reference's
    * OptionError surface exactly). The ORC hop must be lossless: the
    * oracle reads the original parquet. */
  private[graft] def loadOrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("supplier_orc")
    t(s, dir, "supplier").write.orc(out)
    s.read.orc(out)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("s_acctbal"))
      .orderBy("s_suppkey")
  }

  /** Avro source/sink roundtrip — the row-oriented interchange format
    * Spark 4 ships natively (spark-sql bundles the avro connector).
    * Beyond the reference's csv/json/parquet whitelists, like ORC; the
    * hop must be lossless, so the oracle reads the original parquet.
    * Timestamps stay out of the projection: the events table's nanos
    * column is the one type avro would coarsen (micros logical type). */
  private[graft] def loadAvroRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("customer_avro")
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"))
      .write.format("org.apache.spark.sql.avro.AvroFileFormat").save(out)
    s.read.format("org.apache.spark.sql.avro.AvroFileFormat")
      .load(out).orderBy("c_custkey")
  }

  /** Schema-evolution read (mergeSchema): half the table written under
    * a v1 schema (2 columns), half under a widened v2 (+1 column), read
    * back through parquet schema merging — the add-a-column migration
    * every long-lived lake table goes through. v1 rows surface the new
    * column as NULL; the oracle replays the widening rule from the
    * source table. */
  private[graft] def loadEvolutionRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("orders_evolve")
    val o = t(s, dir, "orders")
    o.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_totalprice")
      .write.parquet(out + "/v1")
    o.filter(col("o_orderkey") % 2 =!= 0)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      .write.parquet(out + "/v2")
    s.read.option("mergeSchema", "true").parquet(out + "/v1", out + "/v2")
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      .orderBy("o_orderkey")
  }

  /** Z-order clustered export ([[graft.io.Layout.zorderWrite]]):
    * lineitem keys written as 8 files range-clustered on the
    * (l_partkey, l_suppkey) Morton interleave, read back with the
    * z-value recomputed into the order-independent checksum — gating
    * both content preservation and the interleave arithmetic (the
    * oracle rebuilds the 32-term shift/mask sum in SQL). File-level
    * two-column min/max locality is asserted in IoSpec. */
  private[graft] def zorderRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("lineitem_zorder")
    graft.io.Layout.zorderWrite(
      t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      "l_partkey", "l_suppkey", out, numFiles = 8)
    val back = s.read.parquet(out)
      .withColumn("zval",
        graft.functions.zInterleave2(col("l_partkey"), col("l_suppkey")))
    graft.ext.Profile.tableChecksum(back,
      Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "zval"))
  }

  /** Keyed table diff ([[graft.ext.Profile.diffByKey]]): orders vs a
    * deterministically mutated second version — every 97th key
    * deleted, every 89th repriced (+1), every 101st re-added under a
    * shifted key — classified added/deleted/changed through one keyed
    * full outer join of row hashes. The oracle rebuilds the same
    * mutation and classifies by VALUE comparison, so the row-hash
    * equality contract (hash equal ⇔ rendered values equal) is what
    * the gate proves. */
  private[graft] def tableDiff(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    val newV = o.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 89 === 0, round(col("o_totalprice") + lit(1.0), 2))
          .otherwise(col("o_totalprice")))
      .unionByName(o.filter(col("o_orderkey") % 101 === 0)
        .select((col("o_orderkey") + lit(10000000L)).as("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice")))
    graft.ext.Profile.diffByKey(o, newV,
        Seq("o_orderkey"), Seq("o_orderstatus", "o_totalprice"))
      .select(col("o_orderkey").cast("long").as("o_orderkey"), col("change_type"))
      .orderBy("o_orderkey")
  }

  /** Partitioned UNLOAD (reference `UNLOAD ... PARTITION BY`, hive-style
    * key=value dirs): documents partitioned by lang to parquet, read
    * back through the partition discovery path. The partition column
    * round-trips as a string; every value must survive the hop — the
    * oracle reads the unpartitioned truth. */
  private[graft] def unloadPartitioned(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir)
    val out = tmpDir("documents_part")
    Unload.unload(s, "SELECT doc_id, lang, n_chars FROM documents", out,
      fileType = "parquet", partitionBy = Seq("lang"))
    s.read.parquet(out)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Small-file compaction roundtrip ([[graft.io.Compact]]): documents
    * written deliberately fragmented (32 files), compacted back to a
    * handful, gated by the order-independent table checksum (the
    * integrity_checksum contract — content-identical, layout-free; a
    * row-order compare would pin an ordering parquet does not
    * promise) against the SOURCE table in DuckDB. */
  private[graft] def compactRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val frag = tmpDir("documents_frag")
    val compacted = tmpDir("documents_compact")
    t(s, dir, "documents").select("doc_id", "lang", "n_chars")
      .repartition(32).write.mode("overwrite").parquet(frag)
    val stats = graft.io.Compact.compactParquet(s, frag, compacted,
      targetFileBytes = 1L << 30)
    require(stats.filesOut < stats.filesIn,
      s"compaction must reduce the file count, got $stats")
    graft.ext.Profile.tableChecksum(s.read.parquet(compacted),
      Seq("doc_id", "lang", "n_chars"))
  }

  /** Range-partitioned sorted export ([[Unload.sortedUnload]]): orders
    * written as 8 range-clustered parquet files sorted on o_orderdate —
    * disjoint footer min/max per file, so date-range scans prune whole
    * files (IoSpec asserts the disjointness; PlanSpec the
    * rangepartitioning exchange). The oracled check is the exact
    * content roundtrip; which file a row lands in depends on sampled
    * range boundaries and is deliberately not part of the contract. */
  private[graft] def unloadSorted(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("orders_sorted")
    Unload.sortedUnload(s, t(s, dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice"),
      out, "o_orderdate", numFiles = 8)
    s.read.parquet(out)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** Approximate distinct (HLL) — the 100 TB path for q10. The raw
    * estimate has no exact oracle (approximate by construction), so
    * the query emits a QUANTIFIED gate instead: per event_type, the
    * exact distinct count plus `within_tol` = |approx−exact|/exact ≤
    * 0.05. The DuckDB oracle replays the exact count with a TRUE
    * literal, so the row hash greens iff every group's HLL estimate
    * sits inside the documented tolerance — a real correctness gate,
    * not a rows-only check. (ExtSpec additionally gates the estimates
    * at sf0.1.) rsd is pinned at 0.02 rather than the 0.05 default:
    * one standard deviation is not a bound (the default missed 0.05 on
    * a fixture group at 1.3σ), and the tighter sketch is still a few
    * KB per group — the right precision/memory trade at 100 TB, where
    * a group's register array is constant-size either way. The exact
    * count here doubles as the comparison target; the production path
    * at 100 TB is the HLL side alone. */
  private[graft] def q20ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * 0.05).as("within_tol"))
      .orderBy("event_type")

  // ======================================================================
  // Load / Unload / Insert façade (SURVEY §2.1 — the reference's native op
  // surface, exercised end-to-end through temp files)
  // ======================================================================

  /** Per-JVM fixture namespace. Two engine processes on one host (the
    * driver runs Bench and Verify against the same testdata; a user
    * runs two sessions) must never share fixture directories — r15's
    * driver artifact lost exactly the fixture-WRITING query family
    * while every pure-read query stayed green, the signature of a
    * concurrent process clobbering `/tmp/graft_verify/<name>` and the
    * shared warehouse dir mid-query. The pid suffix makes every
    * fixture root hermetic per process; within a JVM it is constant,
    * so two-phase queries (checkpoint restarts) still resume. */
  private[graft] val jvmFixtureToken: String =
    "p" + ProcessHandle.current().pid()

  private[graft] def tmpDir(name: String): String = {
    val p = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_verify_$jvmFixtureToken", name)
    org.apache.hadoop.fs.FileUtil.fullyDelete(p.toFile)
    p.toString
  }

  /** split→gzip→stage→COPY parity: parquet → pipe-delimited gzip CSV →
    * Load.read with schema inference → typed rows. */
  private[graft] def loadCsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("nation_csv")
    t(s, dir, "nation").coalesce(1).write
      .option("sep", "|").option("header", "true").option("compression", "gzip")
      .csv(out)
    Load.read(s, out, "csv",
        options = Map("delimiter" -> "|", "compression" -> "gzip"),
        header = true)
      .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"),
        col("n_regionkey").cast("long").as("n_regionkey"))
      .orderBy("n_nationkey")
  }

  /** Quoted/escaped CSV dialect roundtrip: a column that CONTAINS the
    * delimiter and the quote char is written as quoted CSV and read
    * back through [[Load.read]] with the reference's Snowflake option
    * vocabulary (`field_optionally_enclosed_by` + `escape`, the COPY
    * quoting options locopy whitelists, locopy/snowflake.py:314-317).
    * The oracle recomputes the tricky column straight from `part` —
    * any mis-handled quote or escape shows up as a row/hash
    * mismatch. */
  private[graft] def loadCsvQuotedRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("part_quoted_csv")
    t(s, dir, "part").select(col("p_partkey"),
        concat(lit("a,\"b\" "), col("p_name")).as("tricky"),
        col("p_retailprice"))
      .coalesce(1).write
      .option("header", "true").option("escape", "\"")
      .csv(out)
    Load.read(s, out, "csv",
        options = Map("field_optionally_enclosed_by" -> "\"", "escape" -> "\""),
        header = true)
      .select(col("p_partkey").cast("long").as("p_partkey"), col("tricky"),
        col("p_retailprice").cast("double").as("p_retailprice"))
      .orderBy("p_partkey")
  }

  /** COPY parity for ENCLOSED MULTILINE fields: a column carrying an
    * embedded record delimiter round-trips through quoted CSV —
    * Snowflake enclosure semantics allow newlines inside
    * FIELD_OPTIONALLY_ENCLOSED_BY fields, which
    * [[graft.io.Options.translateRead]] now maps to Spark's multiLine
    * (the read stays correct at the cost of file splittability — paid
    * only when enclosure is requested). Oracle recomputes the column
    * from part directly with chr(10). */
  private[graft] def loadCsvMultilineRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("part_multiline_csv")
    t(s, dir, "part").select(col("p_partkey"),
        concat(lit("line1\nline2 "), col("p_name")).as("wrapped"),
        col("p_retailprice"))
      .coalesce(1).write
      .option("header", "true").option("escape", "\"")
      .csv(out)
    Load.read(s, out, "csv",
        options = Map("field_optionally_enclosed_by" -> "\"", "escape" -> "\""),
        header = true)
      .select(col("p_partkey").cast("long").as("p_partkey"), col("wrapped"),
        col("p_retailprice").cast("double").as("p_retailprice"))
      .orderBy("p_partkey")
  }

  private[graft] val loadCsvMultilineSql: String =
    """SELECT p_partkey, 'line1' || chr(10) || 'line2 ' || p_name AS wrapped,
      |       p_retailprice
      |FROM part ORDER BY p_partkey""".stripMargin

  /** UNLOAD parity: query → single-file CSV export with header
    * (PARALLEL OFF + header concat, locopy/redshift.py:349-441) →
    * read the exported artifact back. */
  private[graft] def unloadExportRoundtrip(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir)
    val raw = tmpDir("supplier_unload")
    val exportPath = tmpDir("supplier_export") + "/supplier.csv"
    Unload.unloadAndCopy(s,
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
      raw, Some(exportPath), delimiter = "|")
    Load.read(s, exportPath, "csv", options = Map("delimiter" -> "|"), header = true)
      .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"),
        col("s_nationkey").cast("long").as("s_nationkey"),
        col("s_acctbal").cast("double").as("s_acctbal"))
      .orderBy("s_suppkey")
  }

  /** insert_dataframe_to_table parity: all-string rows → inferred schema
    * (§1.2 lattice: int/float/date detection) → CREATE TABLE → read
    * back typed (locopy/redshift.py:532-666). */
  private[graft] def insertInferRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val strings = t(s, dir, "orders").select(
      col("o_orderkey").cast("string").as("o_orderkey"),
      col("o_totalprice").cast("string").as("o_totalprice"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
      col("o_orderstatus").as("o_orderstatus"))
    val schema = Infer.inferSchema(strings)
    val typed = Infer.applySchema(strings, schema)
    Load.dropManaged(s, "graft_insert_roundtrip")
    typed.write.mode("overwrite").saveAsTable("graft_insert_roundtrip")
    // dates serialize as ISO strings for the cross-engine compare (the
    // table itself holds the inferred DateType)
    s.table("graft_insert_roundtrip")
      .withColumn("o_orderdate", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .orderBy("o_orderkey")
  }

  /** CTAS/DDL roundtrip through the SQL surface (the reference's
    * integration shape: CREATE TABLE AS + SELECT back + DROP,
    * tests/test_integration.py:166,229). DROP runs up front (a fresh
    * CTAS each call — the returned plan must still read the table). */
  private[graft] def ctasRoundtrip(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir)
    val ex = new Exec(s)
    Load.dropManaged(s, "graft_ctas")
    ex.execute(
      """CREATE TABLE graft_ctas AS
        |SELECT n_nationkey, n_name, n_regionkey FROM nation""".stripMargin)
    ex.execute("SELECT n_nationkey, n_name, n_regionkey FROM graft_ctas ORDER BY n_nationkey")
  }

  /** executeMany roundtrip: nation rows re-inserted one parameterized
    * INSERT per row (the reference's executemany bulk-DML path,
    * locopy/database.py:150-166), read back ordered. The 25-row
    * driver-side collect is the POINT of the API (row-at-a-time DML);
    * distributed loads go through Load/Insert. */
  private[graft] def execmanyRoundtrip(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir)
    val ex = new Exec(s)
    Load.dropManaged(s, "graft_many")
    ex.execute("CREATE TABLE graft_many (nk BIGINT, nname STRING)")
    val rows = t(s, dir, "nation").select("n_nationkey", "n_name")
      .collect().toSeq.map(r =>
        Map[String, Any]("nk" -> r.getAs[Number](0).longValue(), "nname" -> r.getString(1)))
    ex.executeMany("INSERT INTO graft_many VALUES (:nk, :nname)", rows)
    ex.execute("SELECT nk, nname FROM graft_many ORDER BY nk")
  }

  /** Spark-4 VariantType path access (SURVEY §1.1 maps the reference's
    * Snowflake VARIANT `v:location:city` to `parse_json`/`variant_get`;
    * q14 is the get_json_object twin). The variant is cast to a plain
    * BIGINT inside the query so the result is engine-portable. */
  private[graft] def q14Variant(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", expr("variant_get(parse_json(props), '$.k', 'bigint')"))
      .groupBy("event_type")
      .agg(sum("k").cast("long").as("sum_k"), count(lit(1)).as("n"))
      .orderBy("event_type")

  // ======================================================================
  // Dedup (north-star)
  // ======================================================================

  /** Exact dedup via content fingerprint groupBy. */
  private[graft] def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(s, dir, "documents")).select("doc_id", "n_dupes").orderBy("doc_id")

  /** Char-5-shingle Jaccard near-dup pairs (threshold 0.8), banded
    * candidate generation + exact verify: precision 1, and at the
    * fixture's pair-J distribution (every qualifying pair ≥ 0.92;
    * miss probability (1−J⁴)¹⁶ ≈ 2·10⁻⁹ per pair) the output is
    * identical to the prefix-filter exact path, severalfold cheaper —
    * dense char-shingle sets make the df+prefix-sort machinery the
    * dominant cost. The recall-1 prefix path stays exercised by
    * dedup_wordgram and the ExtSpec parity spec. */
  private[graft] def dedupNgram(s: SparkSession, dir: String): DataFrame =
    Dedup.shingleJaccardPairs(t(s, dir, "documents"), 0.8, shingle = 5,
        lshK = 64, lshBands = 16)
      .orderBy("id_a", "id_b")

  /** Exact substring-window dedup pairs ([[Dedup.substringPairs]]):
    * docs sharing a verbatim 40-char normalized window, boilerplate
    * guard maxDf=50. Exact by construction → hash-oracled. */
  private[graft] def dedupSubstring(s: SparkSession, dir: String): DataFrame =
    Dedup.substringPairs(t(s, dir, "documents"), w = 40, maxDf = 50)
      .orderBy("id_a", "id_b")

  /** MinHash-LSH candidates + exact verify — converges to the same
    * answer as dedupNgram (same oracle) while only ever scoring LSH
    * candidate pairs.
    *
    * Oracle-gate caveat: precision is 1 by construction (exact verify),
    * but LSH recall is probabilistic — at J ≈ 0.8 with 16 bands of 4
    * rows the per-pair miss probability is (1 − 0.8⁴)¹⁶ ≈ 2·10⁻⁴, so
    * the hash-equality with the exact oracle is fixture-empirical (the
    * signatures are deterministic, so it holds on every rerun of this
    * data), not a mathematical guarantee for arbitrary corpora. */
  private[graft] def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDupes(t(s, dir, "documents"), 0.8, k = 64, bands = 16, shingle = 5)
      .orderBy("id_a", "id_b")

  /** Word-3-gram Jaccard near-dup pairs (threshold 0.8) — the same
    * PPJoin pipeline as dedupNgram under a word-shingle tokenizer
    * (n-gram granularity is a first-class knob; word n-grams are the
    * standard choice for long-document dedup where char shingles
    * over-match). */
  private[graft] def dedupWordngram(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(t(s, dir, "documents"), 0.8,
        shingler = graft.functions.wordNgrams(_, 3))
      .orderBy("id_a", "id_b")

  /** SimHash near-dup pairs at Hamming ≤ 8, fully hash-oracled: the
    * per-shingle hash is the cross-engine-portable
    * [[graft.functions.md5Hash60]] (60-bit md5 prefix), so the DuckDB
    * oracle recomputes the ENTIRE scheme from scratch — shingles,
    * ±1 bit votes, 60-bit signatures, and the exact Hamming-≤-8 pair
    * set via xor + bit_count. Banding recall is exact by pigeonhole
    * (9 bands for maxHamming 8), so the Spark pair set must equal the
    * oracle's O(n²) brute-force pair set — any banding/verify
    * regression breaks the hash match. The xxhash64 default stays the
    * fast path and keeps its ExtSpec recall property tests. */
  private[graft] def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDupes(t(s, dir, "documents"), maxHamming = 8,
        shingler = charShingles(_, 5),
        nbits = 60, hashFn = graft.functions.md5Hash60(_))
      .orderBy("id_a", "id_b")

  /** Pair→cluster dedup with survivor selection: connected components
    * over the word-3-gram near-dup pair graph ([[Dedup.clusterIds]] —
    * join-based min-label propagation + pointer jumping, localCheckpoint
    * per round, no GraphX / no driver graph state), every document
    * labeled with its component's min doc id (singletons label
    * themselves). Oracled against a DuckDB WITH RECURSIVE transitive
    * closure over the same exact pair set — graph algorithms disagree
    * loudly, so a hash match here pins both the pair set and the
    * clustering. */
  private[graft] def dedupCluster(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, 0.8,
      shingler = graft.functions.wordNgrams(_, 3))
    Dedup.clusterIds(docs, pairs).orderBy("doc_id")
  }

  /** Cluster-size histogram of the near-dup components — see
    * [[dedupClusterStatsSql]]. */
  private[graft] def dedupClusterStats(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, 0.8,
      shingler = graft.functions.wordNgrams(_, 3))
    Dedup.clusterIds(docs, pairs)
      .groupBy("cluster_id").agg(count(lit(1)).as("size"))
      .groupBy("size").agg(count(lit(1)).as("n_clusters"))
      .orderBy("size")
  }

  /** Incremental fuzzy dedup ([[Dedup.minhashIncrementPairs]]): even
    * doc ids play the standing corpus, odd ids the incoming batch;
    * near-dup (batch, corpus) pairs at Jaccard ≥ 0.8 via two-sided
    * MinHash banding + exact verify — the daily-ingest fuzzy
    * counterpart of dedup_incremental. Same fixture-empirical recall
    * argument as dedup_minhash (identical signatures/banding). */
  private[graft] def dedupMinhashIncr(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.minhashIncrementPairs(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1))
      .orderBy("batch_id", "corpus_id")
  }

  /** Containment near-dup pairs ([[Dedup.containmentPairs]], t = 0.6):
    * the asymmetric |A∩B| / min(|A|,|B|) measure that catches a
    * document embedded in a larger one — at this threshold the pair
    * set is ~30× the Jaccard-0.8 set on this fixture, exactly the
    * subset-style duplication Jaccard dilutes away. */
  private[graft] def dedupContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(t(s, dir, "documents"), 0.6, shingle = 5, maxDf = 100)
      .orderBy("id_a", "id_b")

  /** Quality-ranked survivor selection ([[Dedup.survivorsBy]]): per
    * near-dup cluster (word-3-gram Jaccard ≥ 0.8, same graph as
    * [[dedupCluster]]), keep the LONGEST member (n_chars, ties to the
    * lowest doc id) instead of the min-id rule. */
  private[graft] def dedupSurvivor(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, 0.8,
      shingler = graft.functions.wordNgrams(_, 3))
    Dedup.survivorsBy(docs, pairs, "n_chars")
      .select(col("cluster_id"), col("doc_id"), col("n_chars"))
      .orderBy("cluster_id")
  }

  /** Embedding cosine near-dup pairs (exact pairwise ≥ 0.45). */
  private[graft] def dedupEmbCos(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDupes(t(s, dir, "embeddings"), 0.45)
      .orderBy("id_a", "id_b")

  /** SemDeDup cluster-then-dedup ([[graft.ext.Dedup.semanticDedup]]):
    * 16 first-N cells, within-cell cosine ≥ 0.42 removes the higher
    * id. The n²/k scale mechanism for embedding dedup — candidates are
    * cell-keyed, never all-pairs. Hash-oracled end-to-end: cell
    * argmin scores and pair cosines round to 6 dp before every
    * decision, so DuckDB replays assignment + removal exactly
    * (threshold 0.42 is fixture-calibrated to remove 4/6/91 rows at
    * sf0.001/0.01/0.1 — non-trivial at every gate scale). */
  private[graft] def dedupSemantic(s: SparkSession, dir: String): DataFrame =
    Dedup.semanticDedup(t(s, dir, "embeddings"), ncells = 16, threshold = 0.42)
      .select(col("id").as("vec_id"), col("cell"), col("kept"), col("dup_of"))
      .orderBy("vec_id")

  /** Embedding near-dup pairs via the SRP-LSH SCALE path (banded
    * candidates + exact verify, no cartesian — the plan that replaces
    * dedupEmbCos's Θ(n²) at corpus scale), gated on the same exact
    * DuckDB pair-set oracle at threshold 0.5.
    *
    * Threshold rationale (fixture-measured): 0.45 has no recall margin
    * (qualifying pairs at cos 0.4516 against mass at 0.4494 — LSH
    * recall there was 3/14 even at 16 bands, the Θ(n²) degeneracy
    * documented in [[Dedup.embeddingNearDupes]]); at 0.5 the
    * qualifying set is separated (gate-scale pair at 0.5128 vs mass
    * ≤ 0.4928).
    *
    * Parameters (round 7, measured — full curve in BENCHNOTES.md):
    * round 6 ran (nbits=192, bandBits=4), whose 16-bucket bands at
    * n=2000 emitted 6.22M candidate rows ≈ 3n² — the scale path cost
    * MORE than its exact twin. (nbits=384, bandBits=8) drops that to
    * 446K rows (385K distinct pairs, 14×) while every qualifying pair
    * still collides: min colliding bands 5/48 at sf0.01, 1/48 at
    * sf0.1 — thin but DETERMINISTIC margin (md5-derived hyperplanes,
    * [[Similarity.srpSign]]); expected collisions per qualifying pair
    * at cos 0.51 are B·p^w ≈ 2, so a min of 1 is the regime, not bad
    * luck. maxBucket=64 is the hot-bucket guard: ~2× the largest
    * fixture bucket (33 at sf0.1, 14 at sf0.01), so it never fires on
    * the oracle fixtures (recall unchanged) but bounds the k² blow-up
    * a degenerate bucket would cause at 100 TB. Like dedup_minhash,
    * oracle equality is fixture-empirical (precision 1 is structural;
    * recall 1 is measured, not a theorem). bandBits grows ~log₂(n) at
    * scale — see [[Similarity.lshNearDupes]]. */
  private[graft] def dedupEmbLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.lshNearDupes(t(s, dir, "embeddings"), 0.5, nbits = 384, bandBits = 8,
        maxBucket = 64)
      .orderBy("id_a", "id_b")

  // ======================================================================
  // Similarity search (north-star)
  // ======================================================================

  /** Brute-force cosine top-10 for query vectors vec_id < 8 (broadcast
    * queries — corpus never shuffles). */
  private[graft] def simsearchTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8), 10)
      .orderBy("query_id", "rank")
  }

  /** Hard-negative mining ([[graft.ext.Similarity.hardNegatives]]):
    * top-10 most-similar OTHER-label vectors per query — the
    * contrastive-training negative sampler. Same broadcast-queries /
    * bounded-heap shape as simsearch_topk with the label-mismatch
    * predicate pruning inside the scan; exact replay oracle. */
  private[graft] def sampleHardneg(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 8), 10)
      .orderBy("query_id", "rank")
  }

  /** k-NN graph over the whole embeddings table via SRP-LSH banding
    * ([[Similarity.knnJoinLsh]]): every vector's top-10 neighbors
    * among its band-collision candidates, exact dot-product scores.
    * Hash-oracled by full candidate replay: the md5-derived planes
    * ([[Similarity.srpSign]]) are computable in DuckDB SQL, so the
    * oracle rebuilds signatures → bands → (capped) buckets →
    * symmetric candidate pairs → exact cosine → per-query top-k with
    * the identical (cosine DESC, nbr_id) tie chain. Unlike the
    * simsearch oracles this does NOT assume recall 1 — the replay IS
    * the semantics, so the gate holds at any recall. Same (384, 8,
    * cap 64) parameterization as dedup_emblsh (BENCHNOTES curve). */
  private[graft] def knnJoin(s: SparkSession, dir: String): DataFrame =
    Similarity.knnJoinLsh(t(s, dir, "embeddings"), 10, nbits = 384, bandBits = 8,
        maxBucket = 64)
      .orderBy("query_id", "rank")

  /** ANN quality scorecard for the LSH path: per-query recall@10 of
    * [[knnJoin]]'s band-collision candidates against the brute-force
    * top-10 — the quantified gate that the banded index is good
    * enough to serve (rank_ndcg's sibling for the LSH route; unlike
    * the recall-1-assumed dedup oracles this measures recall
    * directly). The oracle composes the full SRP replay with the
    * exact ranking — both deterministic — so even the recall LOSSES
    * hash-match. */
  private[graft] def simsearchRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    // Query-side sample: the scorecard measures the SERVING path (the
    // full LSH join below still indexes every vector); its brute-force
    // ground truth only needs a statistically meaningful query panel,
    // so the Θ(n·q) exact side samples ~1/32 of queries by the repo's
    // md5-uniform rule (deterministic, partition-invariant, replayed
    // verbatim by the oracle) instead of ranking all n — the suite's
    // former top cost, and the term that would grow n² with the corpus.
    val isSampled =
      conv(substring(md5(concat(lit("recall"), col("query_id").cast("string"))),
        1, 8), 16, 10).cast("long") % 32L === 0L
    val lsh = Similarity.knnJoinLsh(emb, 10, nbits = 384, bandBits = 8,
      maxBucket = 64).select("query_id", "nbr_id").filter(isSampled)
    val qSample = emb.filter(
      conv(substring(md5(concat(lit("recall"), col("vec_id").cast("string"))),
        1, 8), 16, 10).cast("long") % 32L === 0L)
    val bf = Similarity.bruteForceTopK(emb, qSample, 10)
      .select("query_id", "nbr_id")
    val nHits = bf.join(lsh, Seq("query_id", "nbr_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    val nLsh = lsh.groupBy("query_id").agg(count(lit(1)).as("n_lsh"))
    bf.groupBy("query_id").agg(count(lit(1)).as("n_bf"))
      .join(nLsh, Seq("query_id"), "left")
      .join(nHits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_bf"),
        coalesce(col("n_lsh"), lit(0L)).as("n_lsh"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") / 10.0, 6)
          .as("recall"))
      .orderBy("query_id")
  }

  private[graft] lazy val simsearchRecallSql: String =
    s"""WITH lshr AS (
       |  SELECT query_id, nbr_id FROM ($knnJoinSql)
       |  WHERE ('0x' || substr(md5('recall' || CAST(query_id AS VARCHAR)), 1, 8))::BIGINT % 32 = 0),
       |bfr AS (
       |  SELECT query_id, nbr_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY round(list_cosine_similarity(
       |               CAST(c.embedding AS DOUBLE[]),
       |               CAST(q.embedding AS DOUBLE[])), 6) DESC, c.vec_id) AS rank
       |    FROM embeddings c JOIN embeddings q ON q.vec_id <> c.vec_id
       |    WHERE ('0x' || substr(md5('recall' || CAST(q.vec_id AS VARCHAR)), 1, 8))::BIGINT % 32 = 0)
       |  WHERE rank <= 10),
       |nh AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits
       |       FROM bfr JOIN lshr USING (query_id, nbr_id)
       |       GROUP BY 1),
       |nl AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_lsh
       |       FROM lshr GROUP BY 1),
       |nb AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_bf
       |       FROM bfr GROUP BY 1)
       |SELECT nb.query_id, nb.n_bf, coalesce(nl.n_lsh, 0) AS n_lsh,
       |       coalesce(nh.n_hits, 0) AS n_hits,
       |       round(CAST(coalesce(nh.n_hits, 0) AS DOUBLE) / 10.0, 6) AS recall
       |FROM nb LEFT JOIN nl USING (query_id) LEFT JOIN nh USING (query_id)
       |ORDER BY nb.query_id""".stripMargin

  /** MMR diversity selection ([[Similarity.mmrSelect]]): top-8 of
    * query vector 5's 64-neighbor pool, relevance traded against
    * redundancy at (0.7, 0.3) — the post-ANN rerank. Hash-oracled by
    * replaying the full greedy trace: pool ranking, pairwise sims,
    * and 8 unrolled argmax steps, all on 6-dp-rounded scores with
    * (score DESC, id) ties. */
  private[graft] def simsearchMmr(s: SparkSession, dir: String): DataFrame =
    Similarity.mmrSelect(t(s, dir, "embeddings"), queryId = 5L,
        k = 8, poolSize = 64)
      .orderBy("rank")

  /** IVF-pruned ANN (nprobe=4 of 16 cells — the production query
    * path). Hash-oracled: centroid scores round to 6 dp BEFORE the
    * cell argmin and probe ranking on both engines (ties to the
    * lowest centroid id), so DuckDB replays cell assignment, the
    * 4-cell probe selection, and the pruned top-k exactly. Recall vs
    * brute force stays property-tested in ExtSpec. */
  private[graft] def simsearchIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8), 10, ncells = 16, nprobe = 4)
      .orderBy("query_id", "rank")
  }

  /** Streaming ANN: the IVF corpus arrives in TWO micro-batches (even
    * ids, then odd) through the real engine into a persisted
    * cell-partitioned [[graft.streaming.AnnIndex]] (ManifestTable
    * appends, batch-id replay tags), then the SAME pruned-probe top-k
    * as [[simsearchIvf]] runs against the accumulated index reading
    * only probed `cell=` partition dirs. Cell assignment is per-row
    * and the quantizer is frozen, so batching never changes the
    * result — the query therefore shares simsearch_ivf's exact
    * pruned-probe replay oracle (hash match, not just recall), which
    * gates ingest, replay-guarded commit, partition-pruned read, and
    * ranking end-to-end. */
  private[graft] def streamAnnIngest(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = Similarity.firstNCentroids(emb, 16)
    graft.streaming.AnnIndex.foreachBatchIngest(s, emb,
      batch2Pred = pmod(col("vec_id"), lit(2)) === 1, cents)
    graft.streaming.AnnIndex.topK(s, "graft_stream_ann",
        emb.filter(col("vec_id") < 8), k = 10, cents, nprobe = 4)
      .orderBy("query_id", "rank")
  }

  /** The ANN index through the engine's SQL face: the same two-batch
    * cell-partitioned [[graft.streaming.AnnIndex]] ingest, then the
    * index ROOT is read as a registered `graft.manifest` relation —
    * the `cell=` hive layout surfaces as a real column and the
    * `WHERE cell < 8` predicate reaches the file index as a pushed
    * partition filter, opening only those cells' dirs (PlanSpec pins
    * the pruning; this query pins the VALUES). Oracle: the frozen
    * first-16 quantizer's 6-dp argmin cell assignment replayed in
    * DuckDB, rolled up per cell. */
  private[graft] def annSql(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = Similarity.firstNCentroids(emb, 16)
    val table = "graft_ann_sql"
    graft.streaming.AnnIndex.drop(s, table)
    graft.streaming.AnnIndex.ingest(s, table,
      emb.filter(pmod(col("vec_id"), lit(2)) === 0), cents, batchId = 0)
    graft.streaming.AnnIndex.ingest(s, table,
      emb.filter(pmod(col("vec_id"), lit(2)) === 1), cents, batchId = 1)
    s.read.format("graft.manifest")
      .load(graft.streaming.AnnIndex.annRoot(s, table))
      .createOrReplaceTempView("ann_sql_idx")
    s.sql("""
      SELECT CAST(cell AS BIGINT) AS cell, count(1) AS n,
             min(id) AS min_id, max(id) AS max_id
      FROM ann_sql_idx
      WHERE cell < 8
      GROUP BY cell
      ORDER BY cell""")
  }

  /** Merge-on-read DELETE from the streaming ANN index
    * ([[graft.streaming.AnnIndex.delete]]): ingest the corpus in two
    * micro-batches, then delete every vec_id ≡ 0 (mod 3) — an O(ids)
    * tombstone append that leaves every data segment byte-identical —
    * and run the same pruned-probe top-k. Deleted rows must vanish
    * from results at the next manifest version (the
    * right-to-be-forgotten contract: forget now, reclaim at
    * compact()). Oracle: the pruned-probe IVF replay with the deleted
    * ids filtered from the corpus side only — the quantizer is frozen
    * so cell assignment and probe selection are unchanged. */
  private[graft] def streamAnnDelete(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = Similarity.firstNCentroids(emb, 16)
    val table = "graft_stream_ann_del"
    graft.streaming.AnnIndex.foreachBatchIngest(s, emb,
      batch2Pred = pmod(col("vec_id"), lit(2)) === 1, cents, table = table)
    graft.streaming.AnnIndex.delete(s, table,
      emb.filter(pmod(col("vec_id"), lit(3)) === 0).select("vec_id"))
    graft.streaming.AnnIndex.topK(s, table,
        emb.filter(col("vec_id") < 8), k = 10, cents, nprobe = 4)
      .orderBy("query_id", "rank")
  }

  /** Streaming SemDeDup ([[graft.streaming.AnnIndex.semanticIngest]]):
    * embeddings stream in two micro-batches (even ids, then odd); each
    * batch dedups within itself (same-cell cosine ≥ 0.42, lower id
    * wins — the batch [[graft.ext.Dedup.semanticDedup]] removal rule)
    * and its survivors against the accumulated ACCEPTED corpus (read
    * pruned to the batch's own `cell=` partitions, batch broadcast),
    * before appending one cell-partitioned manifest segment — the
    * embedding-space twin of stream_dedup_neardup. Output is the final
    * accepted corpus (vec_id, cell). Oracle: exact replay — the frozen
    * first-16 quantizer's 6-dp argmin fixes every cell, and both
    * accept steps compare the 6-dp-rounded cosine, so the accepted set
    * is a pure function of the id-ordered batch split. */
  private[graft] def streamDedupSemantic(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = Similarity.firstNCentroids(emb, 16)
    graft.streaming.AnnIndex.foreachBatchSemanticDedup(s, emb,
        batch2Pred = pmod(col("vec_id"), lit(2)) === 1, cents, threshold = 0.42)
      .select(col("id").as("vec_id"), col("cell"))
      .orderBy("vec_id")
  }

  /** IVF with EVERY cell probed (nprobe = ncells): probing all cells
    * makes IVF ≡ brute force by the exhaustive-probe identity, so the
    * whole IVF code path — quantizer build, per-row cell argmin, probe
    * explode, cell-equi-join, bounded-heap top-k — is gated on the
    * exact simsearch_topk DuckDB oracle (hash match, not just recall).
    * The nprobe < ncells pruning behavior stays property-tested
    * (ExtSpec recall ≥ 0.5 vs brute force). */
  private[graft] def simsearchIvfFull(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8), 10, ncells = 16, nprobe = 16)
      .orderBy("query_id", "rank")
  }

  /** IVF under a k-means-TRAINED quantizer ([[Similarity
    * .kmeansCentroids]], 3 Lloyd rounds), exhaustive probe: the result
    * is still ≡ brute force (probing every cell makes the quantizer
    * quality irrelevant to the output), so the exact oracle gates the
    * whole train→assign→probe→rank pipeline end-to-end — determinism of
    * training included (a nondeterministic quantizer would reshuffle
    * cell contents run-to-run; the hash only stays stable because
    * training is reproducible). Quantizer QUALITY (the nprobe < ncells
    * trade) is property-tested in ExtSpec (objective non-worsening,
    * recall vs brute). */
  private[graft] def simsearchIvfKmeans(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val trained = Similarity.kmeansCentroids(emb, k = 16, iters = 3)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8), 10,
        ncells = 16, nprobe = 16, centroids = Some(trained))
      .orderBy("query_id", "rank")
  }

  /** Per-group embedding centroids ([[Similarity.centroidsByDim]] —
    * the k-means-update / cluster-prototype aggregate) over 8
    * deterministic groups (vec_id mod 8), long form (grp, dim, mean)
    * so the cross-engine compare sees scalars, not arrays. Aggregate
    * sums accumulate in different orders across engines → round(6)
    * on both sides (the repo's float discipline). */
  private[graft] def embCentroids(s: SparkSession, dir: String): DataFrame =
    Similarity.centroidsByDim(t(s, dir, "embeddings"), pmod(col("vec_id"), lit(8)))
      .select(col("grp").cast("long").as("grp"), col("dim"),
        round(col("mean"), 6).as("mean"))
      .orderBy("grp", "dim")

  // ======================================================================
  // Text analysis (north-star)
  // ======================================================================

  private[graft] def textQuality(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val feats = Text.qualityFeatures(col("text")).toMap
    d.select(
      col("doc_id"),
      feats("n_words").as("n_words"),
      feats("punct_ratio").as("punct_ratio"),
      feats("stopword_ratio").as("stopword_ratio"),
      feats("mean_word_len").as("mean_word_len"),
      Text.qualityScore(col("text")).as("quality_score"))
      .orderBy("doc_id")
  }

  private[graft] def textLangid(s: SparkSession, dir: String): DataFrame =
    Text.langIdDf(t(s, dir, "documents"))
      .select("doc_id", "lang_pred")
      .orderBy("doc_id")

  /** Language-ID quality scorecard: the confusion grid between the
    * n-gram heuristic's prediction ([[Text.langIdDf]]) and the labeled
    * language — the accuracy readout that gates whether the cheap
    * classifier is good enough to route documents (ml_eval's sibling
    * for the heuristic path). One keyed join + one agg over the
    * (label, prediction) grid; the oracle nests the full langid replay
    * as a subquery. */
  private[graft] def textLangidEval(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Text.langIdDf(docs).join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "lang_pred")
  }

  private[graft] def textLangidEvalSql: String =
    s"""SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n
       |FROM documents d JOIN ($langidSql) p USING (doc_id)
       |GROUP BY 1, 2 ORDER BY lang, lang_pred""".stripMargin

  private[graft] def textTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(30)

  private[graft] def textFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), fingerprintMd5(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  /** PII redaction ([[Text.redact]]): every document gets a
    * deterministic synthetic email + phone appended (the fixture text
    * has none, and a redactor that never fires is untested), then the
    * scrubbed text is md5-summarized. The DuckDB oracle appends the
    * same contacts and runs the SAME RE2-safe regexes — a hash match
    * proves both engines redact every occurrence identically. */
  private[graft] def textRedact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        concat(col("text"), lit(" contact: user"), col("doc_id").cast("string"),
          lit("@example.com or +1 555-010"),
          pmod(col("doc_id"), lit(10)).cast("string")).as("txt"))
      .select(col("doc_id"), md5(Text.redact(col("txt"))).as("redacted_md5"))
      .orderBy("doc_id")

  /** Numeric data-quality profile ([[graft.ext.Profile.describe]]):
    * row/null counts exact; min/max are raw parquet values (bit-exact
    * across engines); mean/stddev are aggregate accumulations → rounded
    * on both sides per the repo float rule. */
  private[graft] def profileLineitem(s: SparkSession, dir: String): DataFrame =
    graft.ext.Profile.describe(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
      .select(col("column"), col("n"), col("n_nulls"), col("min"), col("max"),
        round(col("mean"), 6).as("mean"), round(col("stddev"), 6).as("stddev"))
      .orderBy("column")

  /** Incremental exact dedup ([[Dedup.exactIncrement]] — the
    * daily-ingest shape): even doc_ids play the already-deduped corpus,
    * odd ids the incoming batch; survivors are batch docs whose
    * fingerprint is unseen in the corpus, first-id-per-fingerprint
    * within the batch. */
  private[graft] def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.exactIncrement(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1))
      .select(col("doc_id"), fingerprintMd5(col("text")).as("fingerprint"))
      .orderBy("doc_id")
  }

  /** Bloom-accelerated incremental dedup ([[Dedup
    * .exactIncrementBloom]]): same corpus/batch split and SAME oracle
    * as dedup_incremental — the Bloom pre-filter has no false
    * negatives, so the two-tier path must be row-identical to the
    * plain anti-join, and the shared oracle gates exactly that. */
  private[graft] def dedupBloomIncr(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.exactIncrementBloom(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1))
      .select(col("doc_id"), fingerprintMd5(col("text")).as("fingerprint"))
      .orderBy("doc_id")
  }

  // ======================================================================
  // Sampling / packing / curation (north-star): the corpus-mixing and
  // shard-emission steps downstream of dedup + filtering
  // ======================================================================

  /** Stratified sampling ([[graft.ext.Sample.stratified]]): rebalance
    * languages with deterministic per-id hash decisions — en at 50 %,
    * fr at 30 %, everything else at 10 %. A pure per-row filter (no
    * shuffle); the oracle replays the identical md5-threshold rule, so
    * a hash match proves decision-for-decision reproducibility. */
  private[graft] def sampleStratified(s: SparkSession, dir: String): DataFrame =
    graft.ext.Sample.stratified(t(s, dir, "documents"), "lang",
        Map("en" -> 0.5, "fr" -> 0.3), "doc_id", defaultRate = 0.1)
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  /** Per-domain quota ([[graft.ext.Sample.capPerKey]]): at most 10
    * documents per source, chosen in deterministic hash order — the
    * "no domain dominates the corpus" cap. One keyed shuffle. */
  private[graft] def sampleDomainCap(s: SparkSession, dir: String): DataFrame =
    graft.ext.Sample.capPerKey(t(s, dir, "documents"), "source", 10, "doc_id")
      .select("doc_id", "source")
      .orderBy("doc_id")

  /** Token-budget shard packing ([[graft.ext.Pack.packShards]]): docs
    * in id order fill 2000-token shards via the distributed two-phase
    * prefix sum (bucketWidth 64 ⇒ ~8 buckets on the fixture, so the
    * bucket-offset + within-bucket composition is genuinely exercised).
    * The oracle computes the SAME cumulative sums with one global
    * window — legal in DuckDB's single-node world, exactly what the
    * Spark side must avoid (PlanSpec pins the corpus window as
    * bucket-partitioned). */
  private[graft] def packShardsQ(s: SparkSession, dir: String): DataFrame =
    graft.ext.Pack.packShards(
        t(s, dir, "documents")
          .select(col("doc_id"), graft.functions.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", budget = 2000L, bucketWidth = 64L)
      .select("doc_id", "n_tokens", "shard_id")
      .orderBy("doc_id")

  /** Length-bucketed inference batching ([[graft.ext.Pack
    * .lengthBatches]]): similar-length docs batch together (8 per
    * batch within 16-token buckets, longest-first) and the per-batch
    * padding waste is reported — all exact integers, keyed window
    * only (never a global sort). */
  private[graft] def packBatches(s: SparkSession, dir: String): DataFrame =
    graft.ext.Pack.lengthBatches(
        t(s, dir, "documents")
          .select(col("doc_id"), graft.functions.tokenCount(col("text")).cast("long").as("n_toks")),
        "n_toks", "doc_id", bucketWidth = 16L, batchSize = 8)
      .orderBy("bucket", "batch")

  /** Repetition signals ([[Text.repetitionDf]]): top-token share and
    * type-token ratio per document — the Gopher repetition-filter
    * inputs. Ratios are double divisions rounded on both sides per the
    * repo float rule. */
  private[graft] def textRepetition(s: SparkSession, dir: String): DataFrame =
    Text.repetitionDf(t(s, dir, "documents"))
      .orderBy("doc_id")

  /** Unigram LM scoring ([[Text.lmScoreDf]]): mean corpus-unigram
    * log-probability per document — the cheap fluency/quality proxy.
    * DuckDB recomputes the same two-pass unigram table and mean. */
  private[graft] def textLmScore(s: SparkSession, dir: String): DataFrame =
    Text.lmScoreDf(t(s, dir, "documents"))
      .orderBy("doc_id")

  /** Multinomial Naive Bayes ([[Text.naiveBayes]]) trained on the
    * lang labels and applied to the same corpus (resubstitution) —
    * train AND predict hash-oracled: priors/likelihoods are 1-2-op
    * IEEE chains over exact counts (unrounded), per-doc score sums
    * round to 4 dp before the (score DESC, label) argmax. */
  private[graft] def textNbayes(s: SparkSession, dir: String): DataFrame =
    Text.naiveBayes(t(s, dir, "documents"), "lang")
      .orderBy("doc_id")

  /** Per-class classifier scorecard (precision/recall/F1 + confusion
    * counts) over [[textNbayes]]'s predictions — the evaluation step
    * that closes the train→predict→measure loop. Exact integer
    * confusion counts; single-division metrics round(6); F1 is a
    * 3-op chain on the already-rounded p/r (bit-identical), so the
    * whole scorecard replays on the shared NB oracle body. */
  private[graft] def mlEval(s: SparkSession, dir: String): DataFrame = {
    val pred = Text.naiveBayes(t(s, dir, "documents"), "lang")
    val classes = t(s, dir, "documents").select(col("lang").as("cls")).distinct()
    val cm = pred.crossJoin(broadcast(classes))
      .groupBy("cls")
      .agg(
        sum(when(col("lang") === col("cls") && col("predicted") === col("cls"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("predicted") === col("cls") && col("lang") =!= col("cls"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("lang") === col("cls") && col("predicted") =!= col("cls"), 1L)
          .otherwise(0L)).as("fn"))
    val p = round(col("tp").cast("double") / greatest(col("tp") + col("fp"), lit(1L)), 6)
    val r = round(col("tp").cast("double") / greatest(col("tp") + col("fn"), lit(1L)), 6)
    cm.select(col("cls"),
        (col("tp") + col("fn")).as("n_true"),
        (col("tp") + col("fp")).as("n_pred"), col("tp"),
        p.as("precision"), r.as("recall"),
        round(lit(2) * p * r / greatest(p + r, lit(1e-12)), 6).as("f1"))
      .orderBy("cls")
  }

  /** TF-IDF top-term extraction ([[Text.topTermDf]]): the most
    * characteristic term per document, ranked by the exact integer key
    * (tf desc, df asc, term asc) with the float tf·idf reported as an
    * informational column (see the scaladoc for why the RANKING must
    * not be float). */
  private[graft] def textTfidf(s: SparkSession, dir: String): DataFrame =
    Text.topTermDf(t(s, dir, "documents"))
      .orderBy("doc_id")

  /** Exact-mixture rebalancing ([[graft.ext.Sample.balancedTo]]):
    * sample the corpus down to a 50 % en / 30 % de / 20 % fr mixture —
    * the largest feasible subset with those proportions (es/zh
    * dropped: share 0). Quota arithmetic (count/share division, global
    * min, share×T product, floor) is bit-identical IEEE in both
    * engines, so the survivor set hash-matches. */
  private[graft] def sampleBalanced(s: SparkSession, dir: String): DataFrame =
    graft.ext.Sample.balancedTo(t(s, dir, "documents"), "lang",
        Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2), "doc_id")
      .select("doc_id", "lang")
      .orderBy("doc_id")

  /** Per-vector SQ8 embedding quantization
    * ([[graft.functions.quantize8]]): 64-dim float32 vectors to 8-bit
    * codes (4× storage cut, the standard pre-ANN compression). Codes
    * are md5'd and summed for the gate — integer-exact both engines;
    * reconstruction quality is property-tested in ExtSpec. */
  private[graft] def embQuantize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), graft.functions.quantize8(col("embedding")).as("q"))
      .select(col("vec_id"),
        md5(concat_ws(",", transform(col("q"), c => c.cast("string")))).as("q_md5"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"))
      .orderBy("vec_id")

  /** Benchmark decontamination ([[Dedup.decontaminate]]): every 50th
    * document plays the eval set; corpus docs sharing any word 3-gram
    * with it are dropped (n = 3 on this 31-word-vocabulary fixture
    * contaminates ≈half the corpus — a strong oracle signal; real
    * pipelines run n = 8..13). Survivors are fingerprinted. */
  private[graft] def textDecontam(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.decontaminate(
        docs.filter(pmod(col("doc_id"), lit(50)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(50)) === 0),
        n = 3)
      .select(col("doc_id"), fingerprintMd5(col("text")).as("fingerprint"))
      .orderBy("doc_id")
  }

  /** Ingest normalization ([[Text.clean]]): deterministic dirt —
    * tab/C0/DEL controls and double spaces — is injected around every
    * document (the fixture is clean, and a cleaner that never fires is
    * untested), then cleaned; the oracle injects identical dirt with
    * chr() and runs the SAME regex pair. md5 + length gate the result
    * exactly. */
  private[graft] def textClean(s: SparkSession, dir: String): DataFrame = {
    val dirty = concat(expr("chr(9)"), lit(" "), col("text"), lit("  x"),
      expr("chr(1)"), expr("chr(127)"), lit(" "))
    t(s, dir, "documents")
      .select(col("doc_id"), Text.clean(dirty).as("cleaned"))
      .select(col("doc_id"), md5(col("cleaned")).as("clean_md5"),
        length(col("cleaned")).cast("long").as("n_chars"))
      .orderBy("doc_id")
  }

  /** Corpus quality filter ([[Text.qualityFilter]]): C4/Gopher-style
    * cheap rules — word count in [60, 10000] AND English-stopword
    * density ≥ 5 % (both criteria bite on this fixture: 500 → ~230 →
    * ~180 survivors). The ratio test is a single cross-engine-exact
    * IEEE product, so the survivor set hash-matches. */
  private[graft] def textFilter(s: SparkSession, dir: String): DataFrame =
    Text.qualityFilter(t(s, dir, "documents"),
        minWords = 60, maxWords = 10000, minStopRatio = 0.05)
      .select(col("doc_id"), fingerprintMd5(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  /** Context-window chunking ([[Text.chunk]]): 64-token chunks with
    * 8-token overlap (step 56); ~700 chunks from 500 docs, tails as
    * short as 9 tokens — the multi-chunk + ragged-tail shapes are both
    * exercised. Chunk text is md5-summarized for the gate. */
  private[graft] def textChunk(s: SparkSession, dir: String): DataFrame =
    Text.chunk(t(s, dir, "documents"), chunkTokens = 64, overlap = 8)
      .select(col("doc_id"), col("chunk_idx"),
        graft.functions.tokenCount(col("chunk_text")).cast("long").as("n_chunk_tokens"),
        md5(col("chunk_text")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  /** Product-quantization encode ([[Similarity.pqEncode]]) under a
    * TRAINED codebook ([[Similarity.pqTrainCodebooks]], 2 per-subspace
    * Lloyd rounds from the first-16 seed): 64-dim vectors → 8 codebook
    * ids (8-dim subspaces, k=16). Squared-L2 distances are fixed-order
    * IEEE chains and each round's centroid means are round(·,6) on
    * BOTH engines, so training AND assignment are hash-gated with no
    * output rounding — the oracle replays the full 2-round Lloyd loop
    * in SQL. */
  private[graft] def embPq(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cb = Similarity.pqTrainCodebooks(emb, m = 8, k = 16, iters = 2)
    Similarity.pqEncode(emb, codebook = Some(cb))
      .select(col("vec_id"),
        md5(concat_ws(",", transform(col("codes"), _.cast("string")))).as("codes_md5"),
        aggregate(col("codes"), lit(0L), (a, x) => a + x).as("codes_sum"))
      .orderBy("vec_id")
  }

  /** ADC top-k over PQ codes ([[Similarity.pqAdcTopK]]) under the same
    * trained codebook as [[embPq]]: the 10 nearest coded vectors to
    * vec_id 42's embedding by asymmetric squared-L2 — the query path
    * of the PQ index that [[embPq]] builds. Scores round to 6 dp
    * before ranking (the oracle replays the per-subspace table sum as
    * an aggregate, so the two engines' 8-term addition orders may
    * differ in the last ulp), ties by id. */
  private[graft] def simsearchPqAdc(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cb = Similarity.pqTrainCodebooks(emb, m = 8, k = 16, iters = 2)
    Similarity.pqAdcTopK(emb, queryId = 42L, topK = 10, codebookOpt = Some(cb))
  }

  /** DuckDB oracle for [[simsearchPqAdc]]: replay the trained
    * codebook + codes ([[pqTrainedCteSql]]), build the query→codebook
    * distance table per subspace against the TRAINED entries, join
    * codes to table entries, sum, round, rank. */
  private[graft] val simsearchPqAdcSql: String = {
    val dsub = 8
    val qdist = (1 to dsub).map { j =>
      val t = s"(CAST(q.qv[c.s*$dsub+$j] AS DOUBLE) - c.sub[$j])"
      s"$t * $t"
    }.mkString(" + ")
    s"""WITH $pqTrainedCteSql,
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 42),
       |tbl AS (SELECT c.cid, c.s, $qdist AS td
       |        FROM cb2 c CROSS JOIN q),
       |sc AS (SELECT r.vec_id, round(sum(t.td), 6) AS adc
       |       FROM aF r JOIN tbl t ON t.s = r.s AND t.cid = r.cid
       |       WHERE r.rn = 1 GROUP BY r.vec_id)
       |SELECT vec_id, adc FROM sc ORDER BY adc, vec_id LIMIT 10""".stripMargin
  }

  /** IVF + PQ ADC ([[Similarity.ivfPqTopK]]): the composed production
    * ANN path — firstN IVF quantizer prunes to 4 of 16 cells, trained
    * PQ codebooks ([[Similarity.pqTrainCodebooks]], same training the
    * emb_pq oracle replays) ADC-score only the surviving rows. The
    * oracle composes the two existing replays: IVF cell/probe CTEs
    * (rounded-cosine argmin) + trained-codebook ADC scoring, so the
    * PRUNED result — recall loss included — matches by hash. */
  private[graft] def simsearchIvfPq(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cb = Similarity.pqTrainCodebooks(emb, m = 8, k = 16, iters = 2)
    Similarity.ivfPqTopK(emb, queryId = 42L, topK = 10, ncells = 16,
      nprobe = 4, codebookOpt = Some(cb))
  }

  private[graft] val simsearchIvfPqSql: String = {
    val dsub = 8
    val qdist = (1 to dsub).map { j =>
      val t = s"(CAST(q.qv[c.s*$dsub+$j] AS DOUBLE) - c.sub[$j])"
      s"$t * $t"
    }.mkString(" + ")
    s"""WITH $pqTrainedCteSql,
       |cents AS (SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 16),
       |sa AS (SELECT e.vec_id, c.cid,
       |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                      CAST(c.embedding AS DOUBLE[])), 6) AS s
       |       FROM embeddings e CROSS JOIN cents c),
       |cells AS (SELECT vec_id, cid AS cell FROM (
       |         SELECT vec_id, cid,
       |                row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
       |         FROM sa) WHERE rn = 1),
       |probes AS (SELECT cid AS cell FROM (
       |         SELECT cid, row_number() OVER (ORDER BY s DESC, cid) AS rn
       |         FROM sa WHERE vec_id = 42) WHERE rn <= 4),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 42),
       |tbl AS (SELECT c.cid, c.s, $qdist AS td
       |        FROM cb2 c CROSS JOIN q),
       |sc AS (SELECT r.vec_id, round(sum(t.td), 6) AS adc
       |       FROM aF r JOIN tbl t ON t.s = r.s AND t.cid = r.cid
       |       JOIN cells a ON a.vec_id = r.vec_id
       |       JOIN probes p ON p.cell = a.cell
       |       WHERE r.rn = 1 AND r.vec_id <> 42 GROUP BY r.vec_id)
       |SELECT vec_id, adc FROM sc ORDER BY adc, vec_id LIMIT 10""".stripMargin
  }

  /** Classical additive seasonal decomposition ([[graft.ext
    * .TimeSeries.decompose]], period 7) of each event_type's daily
    * value total: trend (centered 7-day MA, gap-aware), weekday
    * seasonal effects (centered to sum 0), residual. Every aggregate
    * rounds to 6 dp before feeding the next stage (the repo's float
    * ladder), so the whole decomposition replays in SQL. */
  /** Deterministic minority oversampling ([[graft.ext.Sample
    * .oversampleTo]]): every language stratum replicated up to the
    * largest stratum's size — floor-parity copies plus hash-chosen
    * extras, the imbalanced-training upsampler (balancedTo's twin).
    * Per-stratum summary with an md5 over the exact (id, copies)
    * multiset gates the full selection. */
  private[graft] def sampleOversample(s: SparkSession, dir: String): DataFrame = {
    val out = graft.ext.Sample.oversampleTo(t(s, dir, "documents"),
      "lang", "doc_id", seed = "os")
    out.groupBy("lang")
      .agg(count(lit(1)).as("n_orig"), sum("copies").as("n_out"),
        sort_array(collect_list(struct(col("doc_id"), col("copies")))).as("lst"))
      .select(col("lang"), col("n_orig"), col("n_out"),
        md5(concat_ws(",", expr(
          "transform(lst, x -> concat(cast(x.doc_id as string), ':', cast(x.copies as string)))")))
          .as("copies_md5"))
      .orderBy("lang")
  }

  private[graft] val sampleOversampleSql: String =
    """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
      |           FROM documents GROUP BY 1),
      |t AS (SELECT max(n) AS target FROM c),
      |r AS (SELECT d.doc_id, d.lang, n, target,
      |        row_number() OVER (PARTITION BY d.lang
      |          ORDER BY substr(md5('os' || CAST(doc_id AS VARCHAR)), 1, 8),
      |                   doc_id) AS rn
      |      FROM documents d JOIN c USING (lang) CROSS JOIN t),
      |cp AS (SELECT doc_id, lang,
      |         (target // n) +
      |           CASE WHEN rn <= target - (target // n) * n THEN 1 ELSE 0 END
      |           AS copies
      |       FROM r)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_orig,
      |       CAST(sum(copies) AS BIGINT) AS n_out,
      |       md5(string_agg(CAST(doc_id AS VARCHAR) || ':'
      |             || CAST(copies AS VARCHAR), ',' ORDER BY doc_id))
      |         AS copies_md5
      |FROM cp GROUP BY lang ORDER BY lang""".stripMargin

  /** Dynamic partition overwrite round-trip: the orders table lands
    * partitioned by priority, then ONE partition is rewritten with a
    * filtered slice under `partitionOverwriteMode=dynamic` — the other
    * partitions must survive untouched (static mode would truncate
    * them; this is the idempotent per-partition backfill primitive of
    * a partitioned lake). The oracle recomputes the expected
    * post-overwrite state from the source table. */
  private[graft] def ioPartitionOverwrite(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("orders_dynpart")
    val o = t(s, dir, "orders").withColumn("p", col("o_orderpriority"))
    o.write.partitionBy("p").parquet(out)
    val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try o.filter(col("p") === "1-URGENT" && pmod(col("o_orderkey"), lit(2)) === 0)
      .write.mode("overwrite").partitionBy("p").parquet(out)
    finally prev match {
      case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    s.read.parquet(out).groupBy("p")
      .agg(count(lit(1)).as("n_rows"), sum("o_orderkey").as("key_sum"))
      .orderBy("p")
  }

  private[graft] val ioPartitionOverwriteSql: String =
    """SELECT o_orderpriority AS p, CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders
      |WHERE o_orderpriority <> '1-URGENT' OR o_orderkey % 2 = 0
      |GROUP BY 1 ORDER BY p""".stripMargin

  /** Seasonal/trend STRENGTH metrics (Hyndman FPP3 §4.3) over the
    * [[tsDecompose]] components: `F_trend = max(0, 1 −
    * Var(R)/Var(T+R))`, `F_seasonal = max(0, 1 − Var(R)/Var(S+R))` —
    * the two numbers a forecasting pipeline reads before choosing
    * between [[tsHolt]] and [[tsHoltwinters]]. Variances come from
    * rounded sufficient sums over the decomposed rows (full-window
    * rows only); the oracle nests the decompose replay as a
    * subquery. */
  private[graft] def tsStrength(s: SparkSession, dir: String): DataFrame = {
    val d = graft.ext.TimeSeries.decompose(t(s, dir, "events"),
        "event_type", "ts", sum(col("value")), period = 7)
      .filter(col("trend").isNotNull && col("seasonal").isNotNull)
      .select(col("event_type"), col("resid").as("r"),
        (col("value") - col("seasonal")).as("tr"),
        (col("value") - col("trend")).as("sr"))
    def stats(c: String) = Seq(
      round(sum(col(c)), 4).as(s"s_$c"),
      round(sum(col(c) * col(c)), 4).as(s"q_$c"))
    val a = d.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        stats("r") ++ stats("tr") ++ stats("sr"): _*)
    def variance(c: String): Column =
      (col(s"q_$c") - col(s"s_$c") * col(s"s_$c") / col("n").cast("double")) /
        (col("n") - 1L).cast("double")
    a.select(col("event_type"), col("n"),
        round(greatest(lit(0.0), lit(1.0) - variance("r") / variance("tr")), 6)
          .as("f_trend"),
        round(greatest(lit(0.0), lit(1.0) - variance("r") / variance("sr")), 6)
          .as("f_seasonal"))
      .orderBy("event_type")
  }

  private[graft] lazy val tsStrengthSql: String =
    s"""WITH dec AS (SELECT * FROM ($tsDecomposeSql)),
       |d AS (SELECT event_type, resid AS r,
       |        value - seasonal AS tr, value - trend AS sr
       |      FROM dec WHERE trend IS NOT NULL AND seasonal IS NOT NULL),
       |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |        round(sum(r), 4) AS s_r, round(sum(r*r), 4) AS q_r,
       |        round(sum(tr), 4) AS s_tr, round(sum(tr*tr), 4) AS q_tr,
       |        round(sum(sr), 4) AS s_sr, round(sum(sr*sr), 4) AS q_sr
       |      FROM d GROUP BY 1)
       |SELECT event_type, n,
       |       round(greatest(0.0, 1.0 -
       |         ((q_r - s_r * s_r / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) /
       |         ((q_tr - s_tr * s_tr / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))), 6)
       |         AS f_trend,
       |       round(greatest(0.0, 1.0 -
       |         ((q_r - s_r * s_r / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) /
       |         ((q_sr - s_sr * s_sr / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))), 6)
       |         AS f_seasonal
       |FROM a ORDER BY event_type""".stripMargin

  /** Lagged cross-correlation (CCF, lags 0–3 days) between the click
    * and purchase daily series — "does one metric lead the other"
    * (the cross-series sibling of [[graft.ext.TimeSeries.acf]], same
    * rounding discipline: means round before deviations, sums round
    * before the ratio; denominators are the full-series dev-energies
    * so every lag shares one normalization). The lag fan-out is a
    * 4-literal explode on the purchase side joined back on the day
    * key. */
  private[graft] def tsCcf(s: SparkSession, dir: String): DataFrame = {
    def daily(et: String) = t(s, dir, "events")
      .filter(col("event_type") === et)
      .groupBy((unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
        .cast("long").as("day"))
      .agg(round(sum("value"), 4).as("x"))
    val a = daily("click"); val b = daily("purchase")
    val ma = a.agg(round(avg("x"), 6).as("ma"))
    val mb = b.agg(round(avg("x"), 6).as("mb"))
    val da = a.crossJoin(broadcast(ma)).select(col("day"), (col("x") - col("ma")).as("da"))
    val db = b.crossJoin(broadcast(mb)).select(col("day"), (col("x") - col("mb")).as("db"))
    val sa = da.agg(round(sum(col("da") * col("da")), 6).as("sa"))
    val sb = db.agg(round(sum(col("db") * col("db")), 6).as("sb"))
    val bl = db.select(explode(sequence(lit(0), lit(3))).as("lag"),
      (col("day") + col("lag")).as("day"), col("db"))
    da.join(bl, "day")
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"), round(sum(col("da") * col("db")), 6).as("num"))
      .crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .select(col("lag").cast("long").as("lag"), col("n_pairs"),
        round(col("num") / sqrt(col("sa") * col("sb")), 6).as("ccf"))
      .orderBy("lag")
  }

  private[graft] val tsCcfSql: String =
    """WITH a AS (SELECT CAST(epoch(date_trunc('day', ts)) // 86400 AS BIGINT)
      |             AS day, round(sum(value), 4) AS x
      |           FROM events WHERE event_type = 'click' GROUP BY 1),
      |b AS (SELECT CAST(epoch(date_trunc('day', ts)) // 86400 AS BIGINT) AS day,
      |        round(sum(value), 4) AS x
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |ma AS (SELECT round(avg(x), 6) AS ma FROM a),
      |mb AS (SELECT round(avg(x), 6) AS mb FROM b),
      |da AS (SELECT day, x - ma AS da FROM a CROSS JOIN ma),
      |db AS (SELECT day, x - mb AS db FROM b CROSS JOIN mb),
      |sa AS (SELECT round(sum(da * da), 6) AS sa FROM da),
      |sb AS (SELECT round(sum(db * db), 6) AS sb FROM db),
      |bl AS (SELECT l.lag, day + l.lag AS day, db
      |       FROM db CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS lag) l),
      |j AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
      |        round(sum(da * db), 6) AS num
      |      FROM da JOIN bl USING (day) GROUP BY 1)
      |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
      |       round(num / sqrt(sa * sb), 6) AS ccf
      |FROM j CROSS JOIN sa CROSS JOIN sb ORDER BY lag""".stripMargin

  private[graft] def tsDecompose(s: SparkSession, dir: String): DataFrame =
    graft.ext.TimeSeries.decompose(t(s, dir, "events"),
        "event_type", "ts", sum(col("value")), period = 7)
      .orderBy("event_type", "day")

  private[graft] val tsDecomposeSql: String =
    s"""WITH daily AS (
       |  SELECT event_type,
       |         CAST(epoch(date_trunc('day', ts)) // 86400 AS BIGINT) AS day,
       |         round(sum(value), 4) AS value
       |  FROM events GROUP BY 1, 2),
       |tr AS (
       |  SELECT event_type, day, value,
       |         CASE WHEN count(*) OVER w = 7
       |                AND max(day) OVER w - min(day) OVER w = 6
       |              THEN round(avg(value) OVER w, 6) END AS trend,
       |         day % 7 AS slot
       |  FROM daily
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day
       |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       |sm AS (
       |  SELECT event_type, slot, round(avg(value - trend), 6) AS raw_eff
       |  FROM tr WHERE trend IS NOT NULL GROUP BY 1, 2),
       |ce AS (
       |  SELECT event_type, slot,
       |         round(raw_eff - round(avg(raw_eff)
       |           OVER (PARTITION BY event_type), 6), 6) AS seasonal
       |  FROM sm)
       |SELECT t.event_type, t.day, CAST(t.slot AS BIGINT) AS slot, t.value,
       |       t.trend, c.seasonal,
       |       round(t.value - t.trend - c.seasonal, 6) AS resid
       |FROM tr t LEFT JOIN ce c ON c.event_type = t.event_type
       |                        AND c.slot = t.slot
       |ORDER BY t.event_type, t.day""".stripMargin

  /** CDC apply ([[graft.io.Cdc.applyChanges]]): a deterministic I/U/D
    * change feed derived from orders — keys ≡ 0 (mod 7) deleted, keys
    * ≡ 1 updated TWICE (seq 1: ×1.05, seq 2: ×1.10 — latest must
    * win), keys ≡ 2 spawning inserts at key+10M — merged into the
    * base with delete-tombstone MERGE semantics. The oracle replays
    * feed construction and the argmax-then-full-outer apply. */
  /** The deterministic CDC fixture shared by [[cdcApply]] and
    * [[streamCdc]]: the orders base plus an I/U/D feed with a
    * `second` flag routing each op to micro-batch 2 of the streaming
    * variant (batch 1: first update + deletes; batch 2: superseding
    * update + inserts). */
  private[graft] def cdcBaseAndFeed(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = t(s, dir, "orders").select(
      col("o_orderkey").cast("long").as("okey"),
      col("o_totalprice").cast("double").as("price"),
      col("o_orderstatus").as("status"))
    def upd(seq: Long, f: Double, second: Boolean) = base
      .filter(pmod(col("okey"), lit(7)) === 1)
      .select(col("okey"), lit(seq).as("seq"), lit("U").as("op"),
        (col("price") * f).as("price"), col("status"),
        lit(second).as("second"))
    val dels = base.filter(pmod(col("okey"), lit(7)) === 0)
      .select(col("okey"), lit(1L).as("seq"), lit("D").as("op"),
        lit(null).cast("double").as("price"),
        lit(null).cast("string").as("status"), lit(false).as("second"))
    val ins = base.filter(pmod(col("okey"), lit(7)) === 2)
      .select((col("okey") + 10000000L).as("okey"), lit(1L).as("seq"),
        lit("I").as("op"), (col("price") * 0.5).as("price"),
        lit("N").as("status"), lit(true).as("second"))
    (base, upd(1L, 1.05, second = false).union(dels)
      .union(upd(2L, 1.10, second = true)).union(ins))
  }
}
