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

/** Registry part 4/4: the DuckDB oracle map — independent SQL
  * formulations (validated on duckdb 1.0.0) for every query key. */
trait SparkEntryOracle extends SparkEntryTail {
  // ----------------------------------------------------------------------
  // DuckDB oracle SQL (validated on duckdb 1.0.0). Every query has an
  // oracle — including q20_approx_distinct since round 9 (its HLL
  // estimate is approximate by construction, so its oracle checks a
  // quantified tolerance bound instead of the raw estimate) and the
  // pruned-probe simsearch_ivf since round 6.
  // ----------------------------------------------------------------------


  /** Shared DuckDB fragment: distinct char-5 shingles of normalized
    * text (norm + sh CTEs only — the simhash oracle reuses these
    * without the quadratic `inter` self-join). `textExpr`
    * parameterizes the text source: the batch dedup queries shingle
    * `text` as-is, while the STREAMING accept oracle mirrors the
    * engine's ingest rule `coalesce(text, '')` (mergeNearDupBatch
    * keeps a NULL-text doc as an empty-string doc rather than silently
    * rejecting it), so engine and oracle agree on datasets with NULL
    * text instead of diverging latently. */
  private[graft] def duckShingleBaseOn(textExpr: String): String =
    s"""WITH norm AS (
      |  SELECT doc_id, regexp_replace(lower(trim($textExpr)), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g') AS t0 FROM documents
      |), sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, greatest(length(t0) - 4, 1)),
      |    i -> substr(t0, CAST(i AS INT), 5)))) AS s
      |  FROM norm
      |)""".stripMargin

  private[graft] val duckShingleBase = duckShingleBaseOn("text")

  /** Shared DuckDB fragment: char-5-shingle sizes + pair intersections. */
  private[graft] def duckShingleCteOn(textExpr: String): String =
    s"""${duckShingleBaseOn(textExpr)}, sizes AS (
      |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)""".stripMargin

  private[graft] val duckShingleCte = duckShingleCteOn("text")

  /** Shared DuckDB fragment: distinct word-3-gram shingles. */
  private[graft] val duckWord3Cte =
    s"""WITH toks AS (
       |  SELECT doc_id, $duckToks AS ts FROM documents
       |), sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, greatest(len(ts) - 2, 0)),
       |    i -> ts[CAST(i AS INT)] || ' ' || ts[CAST(i+1 AS INT)] || ' ' || ts[CAST(i+2 AS INT)]))) AS s
       |  FROM toks
       |), sizes AS (
       |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
       |), inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)""".stripMargin

  private[graft] def jaccardTail(cte: String) =
    cte +
      """
        |SELECT id_a, id_b,
        |       round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin

  private[graft] val jaccardPairsSql = jaccardTail(duckShingleCte)
  private[graft] val wordngramPairsSql = jaccardTail(duckWord3Cte)

  /** dedup_simhash oracle: recompute the full SimHash scheme in DuckDB
    * over the same distinct char-5 shingles — 60-bit md5-prefix hash
    * per shingle (portable: matches Spark's conv(substr(md5,1,15)) —
    * see [[graft.functions.md5Hash60]]), ±1 votes per bit, signature
    * assembly, then the EXACT Hamming ≤ 8 pair set by brute-force
    * xor + bit_count (n² over ≤2000 docs is trivial for the oracle;
    * Spark's banded plan must produce the identical set — pigeonhole
    * recall). */
  private[graft] val dedupSimhashSql =
    s"""$duckShingleBase,
       |hb AS (
       |  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh
       |), votes AS (
       |  SELECT doc_id, i, sum(CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END) AS sv
       |  FROM hb, generate_series(0, 59) g(i)
       |  GROUP BY doc_id, i
       |), sig AS (
       |  SELECT doc_id,
       |         sum(CASE WHEN sv > 0 THEN (1::BIGINT << CAST(i AS INT)) ELSE 0 END) AS sg
       |  FROM votes GROUP BY doc_id
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(bit_count(xor(a.sg, b.sg)) AS INT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sg, b.sg)) <= 8
       |ORDER BY id_a, id_b""".stripMargin

  /** dedup_cluster oracle: the word-3-gram pair set (same CTEs as
    * dedup_wordngram) closed transitively with WITH RECURSIVE; each
    * document's cluster id = min reachable doc id (its own id when it
    * appears in no pair). DuckDB allows non-recursive CTEs inside a
    * WITH RECURSIVE list, so the shingle CTE chain is reused verbatim. */
  /** Shared recursive-closure prefix: word-3-gram Jaccard ≥ 0.8 pairs
    * → symmetric edges → transitive reach — feeds both the cluster-id
    * oracle (min label) and the quality-survivor oracle (argmax per
    * cluster). */
  private[graft] val dedupClusterCte =
    s"""${duckWord3Cte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
       |pairs AS (
       |  SELECT id_a, id_b
       |  FROM inter
       |  JOIN sizes sa ON sa.doc_id = id_a
       |  JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8
       |), edges AS (
       |  SELECT id_a AS s, id_b AS d FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs
       |), reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT reach.id, e.d FROM reach JOIN edges e ON reach.r = e.s
       |)""".stripMargin

  private[graft] val dedupClusterSql =
    s"""$dedupClusterCte
       |SELECT id AS doc_id, min(r) AS cluster_id
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  /** Cluster-size histogram over [[dedupCluster]]'s components — the
    * dedup observability readout (how much mass sits in big near-dup
    * families vs singletons) every curation run reports before
    * committing to a survivor policy. Two keyed aggs on top of the
    * shared component assignment; the oracle reuses the recursive-
    * closure replay. */
  private[graft] lazy val dedupClusterStatsSql: String =
    s"""$dedupClusterCte,
       |cl AS (SELECT id AS doc_id, min(r) AS cluster_id
       |       FROM reach GROUP BY id),
       |cz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS size
       |       FROM cl GROUP BY 1)
       |SELECT size, CAST(count(*) AS BIGINT) AS n_clusters
       |FROM cz GROUP BY size ORDER BY size""".stripMargin

  private[graft] val dedupSurvivorSql =
    s"""$dedupClusterCte,
       |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
       |j AS (SELECT cl.cluster_id, cl.doc_id, d.n_chars,
       |        row_number() OVER (PARTITION BY cl.cluster_id
       |          ORDER BY d.n_chars DESC, cl.doc_id) AS rn
       |      FROM cl JOIN documents d USING (doc_id))
       |SELECT cluster_id, doc_id, n_chars FROM j WHERE rn = 1
       |ORDER BY cluster_id""".stripMargin

  /** Session gaps-and-islands oracle — shared by stream_sessions
    * (built-in session_window) and stream_sessions_stateful (the
    * flatMapGroupsWithState sessionizer): a new session starts when the
    * gap is ≥ 30 minutes, matching Spark's half-open [start, last+gap)
    * sessions. */
  private[graft] val streamSessionsSql =
    """WITH m AS (
      |  SELECT user_id, ts, value,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), g AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM m)
      |SELECT min(ts) AS session_start,
      |       max(ts) + INTERVAL 30 MINUTE AS session_end,
      |       user_id, count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM g GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Brute-force cosine top-10 oracle — shared by simsearch_topk and
    * simsearch_ivf_full (exhaustive-probe identity). */
  private[graft] val simsearchTopkSql =
    """WITH scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
      |         round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
      |                                      CAST(q.embedding AS DOUBLE[])), 6) AS cosine
      |  FROM embeddings c JOIN embeddings q
      |    ON q.vec_id < 8 AND q.vec_id <> c.vec_id
      |), ranked AS (
      |  SELECT query_id, nbr_id, cosine,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY cosine DESC, nbr_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, CAST(rank AS INT) AS rank, nbr_id, cosine
      |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Pruned-probe IVF replay (first-16 quantizer, nprobe 4, k 10):
    * centroid scores round to 6 dp BEFORE the argmin / probe ranking
    * on both engines, ties to lowest centroid id — shared by
    * simsearch_ivf (batch) and stream_ann_ingest (the persisted
    * streaming index accumulating the same corpus under the same
    * frozen quantizer). */
  private[graft] val simsearchIvfPrunedSql =
    """WITH cents AS (SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 16),
      |sa AS (SELECT e.vec_id, c.cid,
      |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |                                      CAST(c.embedding AS DOUBLE[])), 6) AS s
      |       FROM embeddings e CROSS JOIN cents c),
      |cells AS (SELECT vec_id, cid AS cell FROM (
      |         SELECT vec_id, cid,
      |                row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
      |         FROM sa) WHERE rn = 1),
      |probes AS (SELECT vec_id AS query_id, cid AS cell FROM (
      |         SELECT vec_id, cid,
      |                row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
      |         FROM sa WHERE vec_id < 8) WHERE rn <= 4),
      |scored AS (SELECT p.query_id, a.vec_id AS nbr_id,
      |         round(list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
      |                                      CAST(en.embedding AS DOUBLE[])), 6) AS cosine
      |       FROM probes p JOIN cells a ON a.cell = p.cell AND a.vec_id <> p.query_id
      |       JOIN embeddings eq ON eq.vec_id = p.query_id
      |       JOIN embeddings en ON en.vec_id = a.vec_id),
      |ranked AS (SELECT query_id, nbr_id, cosine,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY cosine DESC, nbr_id) AS rank FROM scored)
      |SELECT query_id, CAST(rank AS INT) AS rank, nbr_id, cosine
      |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** The MemoryStream and checkpointed-file-source near-dup paths both
    * ingest the even-id half as batch 1 and the odd half as batch 2;
    * the accepted corpus is a pure function of that split, so one
    * exact-Jaccard accept-rule replay serves both queries. */
  private lazy val streamNeardupAcceptSql: String =
    s"""${duckShingleCteOn("coalesce(text, '')")}, pairs AS (
       |  SELECT id_a, id_b FROM inter
       |  JOIN sizes sa ON sa.doc_id = id_a
       |  JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8),
       |b1 AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0),
       |b2 AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 1),
       |acc1 AS (
       |  SELECT doc_id FROM b1 WHERE doc_id NOT IN (
       |    SELECT p.id_b FROM pairs p
       |    JOIN b1 x ON p.id_a = x.doc_id JOIN b1 y ON p.id_b = y.doc_id)),
       |s2 AS (
       |  SELECT doc_id FROM b2 WHERE doc_id NOT IN (
       |    SELECT p.id_b FROM pairs p
       |    JOIN b2 x ON p.id_a = x.doc_id JOIN b2 y ON p.id_b = y.doc_id)),
       |acc2 AS (
       |  SELECT doc_id FROM s2 WHERE doc_id NOT IN (
       |    SELECT s2.doc_id FROM pairs p
       |    JOIN s2 ON p.id_a = s2.doc_id JOIN acc1 ON p.id_b = acc1.doc_id
       |    UNION
       |    SELECT s2.doc_id FROM pairs p
       |    JOIN s2 ON p.id_b = s2.doc_id JOIN acc1 ON p.id_a = acc1.doc_id)),
       |acc AS (SELECT doc_id FROM acc1 UNION ALL SELECT doc_id FROM acc2)
       |SELECT d.doc_id,
       |       md5(regexp_replace(lower(trim(coalesce(d.text, ''))), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS fingerprint
       |FROM documents d JOIN acc USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_project_filter" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1 - l_discount) AS revenue
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_join_agg" ->
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q04_window_rownum" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |         row_number() OVER (PARTITION BY l_suppkey
        |           ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) WHERE rn <= 3
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q05_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q06_union" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin,
    "q07_except" ->
      """SELECT o_custkey AS custkey FROM orders
        |EXCEPT SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,
    "q08_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q09_anti_join" ->
      """SELECT c_nationkey, count(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q10_count_distinct" ->
      """SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |       count(*) AS n_rows FROM lineitem""".stripMargin,
    "q11_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q12_cube" ->
      """SELECT l_returnflag, yr, count(*) AS n FROM (
        |  SELECT l_returnflag, CAST(year(l_shipdate) AS BIGINT) AS yr FROM lineitem)
        |GROUP BY CUBE (l_returnflag, yr)
        |ORDER BY l_returnflag ASC NULLS FIRST, yr ASC NULLS FIRST""".stripMargin,
    "q13_scalar" ->
      """SELECT o_orderkey, upper(o_orderpriority) AS pri_upper,
        |       CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mon,
        |       CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS size_class,
        |       sqrt(o_totalprice) AS sqrt_price,
        |       o_orderstatus || '-' || o_orderpriority AS status_pri
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q14_json" ->
      """SELECT event_type,
        |       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |       count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q15_time_agg" ->
      """SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS n,
        |       round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin,
    "q16_having" ->
      """SELECT l_suppkey, round(avg(l_quantity), 4) AS avg_qty, count(*) AS n
        |FROM lineitem GROUP BY l_suppkey
        |HAVING round(avg(l_quantity), 4) > 25.5 ORDER BY l_suppkey""".stripMargin,
    "q17_subquery" ->
      """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS s
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""".stripMargin,
    "q18_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q19_param" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_quantity > 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // quantified HLL gate: the oracle's TRUE literal hash-matches only
    // if the Spark side's |approx-exact|/exact <= 0.05 held per group
    "q20_approx_distinct" ->
      """SELECT event_type,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |       TRUE AS within_tol
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q21_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |       lag(o_totalprice, 1) OVER w AS prev_price,
        |       lead(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q22_date_arith" ->
      """SELECT o_orderkey,
        |       strftime(DATE '2017-12-31'
        |         + CAST(row_number() OVER (ORDER BY o_orderkey) AS INT),
        |         '%Y-%m-%d') AS dt
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q23_string_funcs" ->
      """SELECT c_custkey,
        |       substr(c_name, 1, 8) AS name8,
        |       upper(c_name) AS name_up,
        |       CAST(length(c_name) AS BIGINT) AS name_len,
        |       replace(c_name, 'Customer', 'C') AS name_short,
        |       lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_pad
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q24_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q25_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin,
    "q26_pivot" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,
    "q27_correlated" ->
      """SELECT c_nationkey, count(*) AS n_above
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                   WHERE c_nationkey = c.c_nationkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q28_rank_funcs" ->
      """SELECT o_orderkey, o_orderpriority,
        |       CAST(dense_rank() OVER w AS BIGINT) AS drank,
        |       percent_rank() OVER w AS prank,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q29_string_agg" ->
      """SELECT c_nationkey, c_mktsegment,
        |       string_agg(c_name, '|' ORDER BY c_name) AS names,
        |       count(*) AS n
        |FROM customer GROUP BY c_nationkey, c_mktsegment
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "q30_percentiles" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_quantity, 0.25), 4) AS p25,
        |       round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |       round(quantile_cont(l_quantity, 0.75), 4) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "asof_join" ->
      """SELECT e.user_id, e.ts, strftime(o.o_orderdate, '%Y-%m-%d') AS last_order_date
        |FROM events e
        |ASOF LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= CAST(o.o_orderdate AS TIMESTAMP)
        |ORDER BY user_id, ts""".stripMargin,
    // the bin-bucketed range join must equal the naive inequality join
    "range_join" ->
      """WITH i AS (
        |  SELECT o_orderkey AS win_id,
        |         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS w_start
        |  FROM orders WHERE o_orderkey <= 200
        |), p AS (
        |  SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS d FROM orders
        |)
        |SELECT win_id, count(*) AS n_orders
        |FROM i JOIN p ON p.d >= i.w_start AND p.d < i.w_start + 5
        |GROUP BY win_id ORDER BY win_id""".stripMargin,
    "salted_join" ->
      """SELECT s_nationkey, count(*) AS n,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    // the Bloom prefilter is a pure physical reduction — the oracle is
    // the unreduced inner join (same contract as salted_join's)
    "bloom_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_acctbal > 9000
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "load_json_roundtrip" ->
      """SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
        |FROM region ORDER BY r_regionkey""".stripMargin,
    // the ORC hop must be lossless — the oracle reads the parquet truth
    "load_orc_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "pack_curriculum" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CAST(len($duckToks) AS BIGINT) AS n_tokens,
         |    len($duckToks) AS nw,
         |    round(CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
         |          / greatest(length(text), 1), 6) AS pr,
         |    round(CAST(len(list_filter($duckToks,
         |            t -> t IN ('the','a','of','and','to','in','is','it','that','was'))) AS DOUBLE)
         |          / greatest(len($duckToks), 1), 6) AS sr
         |  FROM documents),
         |sc AS (
         |  SELECT doc_id, n_tokens,
         |    round(((CASE WHEN nw BETWEEN 5 AND 10000 THEN 1.0 ELSE 0.0 END)
         |         + (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)
         |         + (CASE WHEN sr >= 0.05 THEN 1.0 ELSE 0.5 END)) / 3.0, 6) AS score
         |  FROM f),
         |tq AS (
         |  SELECT doc_id, n_tokens,
         |         6 - CAST(round(score * 6.0, 0) AS BIGINT) AS tier
         |  FROM sc),
         |o AS (SELECT *, tier * 1099511627776 + doc_id AS ord FROM tq),
         |pk AS (
         |  SELECT doc_id, tier, n_tokens,
         |         coalesce(sum(n_tokens) OVER (ORDER BY ord
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
         |  FROM o)
         |SELECT doc_id, tier, n_tokens,
         |       CAST(floor(CAST(pre AS DOUBLE) / 2000.0) AS BIGINT) AS shard_id
         |FROM pk ORDER BY doc_id""".stripMargin,
    "stream_dedup_neardup" -> streamNeardupAcceptSql,
    // the checkpointed file-source runner ingests the same even/odd
    // split (file 1 = even ids, file 2 = odd), so the accepted corpus
    // — a pure function of the batch split — shares the oracle
    "stream_neardup_restart" -> streamNeardupAcceptSql,
    // compaction preserves the corpus exactly — same accept-rule oracle
    "stream_neardup_compact" -> streamNeardupAcceptSql,
    "pipeline_pretrain" ->
      s"""WITH w AS (
         |  SELECT doc_id, text, CAST(len($duckToks) AS BIGINT) AS n_tokens
         |  FROM documents),
         |qf AS (
         |  SELECT doc_id, len($duckToks) AS nw,
         |         len(list_filter($duckToks,
         |           t -> t IN ('the','a','of','and','to','in','is','it','that','was'))) AS ns
         |  FROM documents),
         |q AS (
         |  SELECT w.* FROM w JOIN qf USING (doc_id)
         |  WHERE nw BETWEEN 60 AND 10000
         |    AND CAST(ns AS DOUBLE) >= 0.05 * CAST(nw AS DOUBLE)),
         |lp AS (SELECT doc_id FROM ($langidSql) WHERE lang_pred = 'en'),
         |l AS (SELECT q.* FROM q JOIN lp USING (doc_id)),
         |dd AS (SELECT min(doc_id) AS doc_id FROM l GROUP BY md5(text)),
         |d AS (SELECT l.* FROM l JOIN dd USING (doc_id)),
         |t3 AS (SELECT doc_id, $duckToks AS ts FROM documents),
         |g AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    generate_series(1, greatest(len(ts) - 2, 0)),
         |    i -> ts[CAST(i AS INT)] || ' ' || ts[CAST(i+1 AS INT)] || ' ' || ts[CAST(i+2 AS INT)]))) AS s3
         |  FROM t3),
         |ev AS (SELECT DISTINCT s3 FROM g WHERE doc_id % 50 = 0),
         |corpus AS (SELECT * FROM d WHERE doc_id % 50 <> 0),
         |bad AS (SELECT DISTINCT g.doc_id
         |        FROM g JOIN ev USING (s3) JOIN corpus USING (doc_id)),
         |dec AS (SELECT * FROM corpus
         |        WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
         |pk AS (
         |  SELECT n_tokens,
         |         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
         |  FROM dec),
         |sh AS (SELECT n_tokens,
         |         CAST(floor(CAST(pre AS DOUBLE) / 2000.0) AS BIGINT) AS shard_id
         |       FROM pk)
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS stage_ord, 'ingest' AS stage,
         |         CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |         CAST(0 AS BIGINT) AS n_shards FROM w
         |  UNION ALL SELECT 2, 'quality', CAST(count(*) AS BIGINT),
         |         CAST(sum(n_tokens) AS BIGINT), 0 FROM q
         |  UNION ALL SELECT 3, 'langid', CAST(count(*) AS BIGINT),
         |         CAST(sum(n_tokens) AS BIGINT), 0 FROM l
         |  UNION ALL SELECT 4, 'dedup', CAST(count(*) AS BIGINT),
         |         CAST(sum(n_tokens) AS BIGINT), 0 FROM d
         |  UNION ALL SELECT 5, 'decontam', CAST(count(*) AS BIGINT),
         |         CAST(sum(n_tokens) AS BIGINT), 0 FROM dec
         |  UNION ALL SELECT 6, 'pack', CAST(count(*) AS BIGINT),
         |         CAST(sum(n_tokens) AS BIGINT),
         |         CAST(max(shard_id) + 1 AS BIGINT) FROM sh)
         |ORDER BY stage_ord""".stripMargin,
    "load_avro_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // the partitioned hop must be lossless too (partition column
    // round-trips through hive-style dirs)
    "unload_partitioned" ->
      """SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id""",
    // exact content roundtrip of the range-clustered sorted export; the
    // per-file disjointness invariant is IoSpec-asserted (boundaries are
    // sampled, so file membership is deliberately outside the contract)
    "unload_sorted" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        |       o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "load_csv_roundtrip" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |       CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "load_csv_quoted" ->
      """SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
        |       'a,"b" ' || p_name AS tricky,
        |       CAST(p_retailprice AS DOUBLE) AS p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin,
    "unload_export_roundtrip" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
        |       CAST(s_nationkey AS BIGINT) AS s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "insert_infer_roundtrip" ->
      """SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |       o_orderstatus
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "ctas_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "execmany_roundtrip" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS nk, n_name AS nname
        |FROM nation ORDER BY nk""".stripMargin,
    "q14_variant" ->
      """SELECT event_type,
        |       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |       count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_dupes FROM documents
        |GROUP BY md5(regexp_replace(lower(trim(text)), '[ \t\n\x0b\f\r]+', ' ', 'g'))
        |ORDER BY doc_id""".stripMargin,
    "dedup_ngram" -> jaccardPairsSql,
    "dedup_minhash" -> jaccardPairsSql,
    "dedup_wordngram" -> wordngramPairsSql,
    "dedup_minhash_incr" ->
      s"""$duckShingleBase, sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS batch_id, b.doc_id AS corpus_id, count(*) AS i
        |  FROM sh a JOIN sh b USING (s)
        |  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0 GROUP BY 1, 2)
        |SELECT batch_id, corpus_id,
        |       round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = batch_id
        |JOIN sizes sb ON sb.doc_id = corpus_id
        |WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8
        |ORDER BY batch_id, corpus_id""".stripMargin,
    "dedup_cluster" -> dedupClusterSql,
    "dedup_survivor" -> dedupSurvivorSql,
    "dedup_containment" ->
      """WITH norm AS (
        |  SELECT doc_id, regexp_replace(lower(trim(text)), '[ \t\n\x0b\f\r]+', ' ', 'g') AS t0 FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(length(t0) - 4, 1)),
        |    i -> substr(t0, CAST(i AS INT), 5)))) AS s
        |  FROM norm
        |), sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |df AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |         FROM sh a JOIN df USING (s) JOIN sh b USING (s)
        |         WHERE a.doc_id < b.doc_id AND df.df <= 100),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |          FROM sh a JOIN sh b USING (s)
        |          WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT c.id_a, c.id_b,
        |       round(CAST(i.i AS DOUBLE) / least(sa.sz, sb.sz), 6) AS containment
        |FROM cand c JOIN inter i USING (id_a, id_b)
        |JOIN sizes sa ON sa.doc_id = c.id_a
        |JOIN sizes sb ON sb.doc_id = c.id_b
        |WHERE round(CAST(i.i AS DOUBLE) / least(sa.sz, sb.sz), 6) >= 0.6
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_substring" ->
      """WITH norm AS (
        |  SELECT doc_id, regexp_replace(lower(trim(text)), '[ \t\n\x0b\f\r]+', ' ', 'g') AS t0 FROM documents
        |), w AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(length(t0) - 39, 1)),
        |    i -> substr(t0, CAST(i AS INT), 40)))) AS win
        |  FROM norm
        |), keep AS (
        |  SELECT win FROM (SELECT win, count(*) AS c FROM w GROUP BY win) WHERE c <= 50
        |), p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM w a JOIN keep USING (win) JOIN w b USING (win)
        |  WHERE a.doc_id < b.doc_id)
        |SELECT DISTINCT id_a, id_b FROM p ORDER BY id_a, id_b""".stripMargin,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_embcos" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin,
    // SemDeDup replay: cell assignment exactly as simsearch_ivf's
    // cells CTE (6-dp-rounded centroid scores, ties to lowest cid),
    // then within-cell lower-id removal on the 6-dp-rounded cosine
    "dedup_semantic" ->
      """WITH cents AS (SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 16),
        |sa AS (SELECT e.vec_id, c.cid,
        |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                      CAST(c.embedding AS DOUBLE[])), 6) AS s
        |       FROM embeddings e CROSS JOIN cents c),
        |cells AS (SELECT vec_id, cid AS cell FROM (
        |         SELECT vec_id, cid,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        |         FROM sa) WHERE rn = 1),
        |pairs AS (SELECT b.vec_id AS vec_id, a.vec_id AS lo
        |       FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |       JOIN embeddings ea ON ea.vec_id = a.vec_id
        |       JOIN embeddings eb ON eb.vec_id = b.vec_id
        |       WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
        |                                          CAST(eb.embedding AS DOUBLE[])), 6) >= 0.42),
        |rem AS (SELECT vec_id, min(lo) AS dup_of FROM pairs GROUP BY 1)
        |SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell,
        |       r.vec_id IS NULL AS kept, r.dup_of
        |FROM cells c LEFT JOIN rem r ON r.vec_id = c.vec_id
        |ORDER BY c.vec_id""".stripMargin,
    "dedup_emblsh" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "simsearch_topk" -> simsearchTopkSql,
    // simsearch_topk's replay + the label-mismatch predicate
    "sample_hardneg" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
        |         round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                      CAST(q.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM embeddings c JOIN embeddings q
        |    ON q.vec_id < 8 AND q.vec_id <> c.vec_id AND q.label <> c.label
        |), ranked AS (
        |  SELECT query_id, nbr_id, cosine,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY cosine DESC, nbr_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, CAST(rank AS INT) AS rank, nbr_id, cosine
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // full SRP replay (NOT a recall-1 assumption): the md5-derived
    // hyperplanes (Similarity.srpSign — sign = first md5 hex nibble of
    // "i:b" in 0-7) are recomputed in SQL, signatures -> 8-bit band
    // chunks -> bucket cap 64 -> symmetric candidate pairs -> exact
    // cosine -> top-10 with the (cosine DESC, nbr_id) tie chain. Bits
    // compare raw proj > 0: cross-engine sum-order noise is ~1e-13 vs
    // a measured 1.15e-6 |proj| floor on the fixtures (BENCHNOTES).
    "knn_join" -> knnJoinSql,
    // exhaustive-probe identity: nprobe = ncells probes every cell, so
    // the exact brute-force oracle applies verbatim to the IVF pipeline
    // (and, for the kmeans variant, to the trained quantizer too)
    "simsearch_ivf_full" -> simsearchTopkSql,
    "simsearch_ivf_kmeans" -> simsearchTopkSql,
    // pruned-probe replay: centroid scores round to 6 dp BEFORE the
    // argmin / probe ranking on both engines (ties to lowest centroid
    // id), so cell assignment, the nprobe selection, and the pruned
    // top-k are all reproduced exactly — list_cosine_similarity(raw)
    // equals dot(normalized) up to the ulp the rounding collapses
    "simsearch_ivf" -> simsearchIvfPrunedSql,
    // the streaming index accumulates the SAME corpus under the SAME
    // frozen quantizer (per-row assignment — batching can't change
    // it), so the batch pruned-probe replay is the exact oracle for
    // ingest + replay-guard + partition-pruned read + ranking
    "stream_ann_ingest" -> simsearchIvfPrunedSql,
    "ann_sql" ->
      """WITH cents AS (SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 16),
        |sa AS (SELECT e.vec_id, c.cid,
        |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                      CAST(c.embedding AS DOUBLE[])), 6) AS s
        |       FROM embeddings e CROSS JOIN cents c),
        |cells AS (SELECT vec_id, cid AS cell FROM (
        |         SELECT vec_id, cid,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        |         FROM sa) WHERE rn = 1)
        |SELECT cell, count(*) AS n, min(vec_id) AS min_id, max(vec_id) AS max_id
        |FROM cells WHERE cell < 8
        |GROUP BY cell ORDER BY cell""".stripMargin,
    // the tombstone delete removes corpus rows ONLY — the frozen
    // quantizer keeps cells and probe selection identical, so the
    // replay is the pruned-probe SQL with the deleted ids filtered
    // from the corpus join side
    "stream_ann_delete" ->
      """WITH cents AS (SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 16),
        |sa AS (SELECT e.vec_id, c.cid,
        |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                      CAST(c.embedding AS DOUBLE[])), 6) AS s
        |       FROM embeddings e CROSS JOIN cents c),
        |cells AS (SELECT vec_id, cid AS cell FROM (
        |         SELECT vec_id, cid,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        |         FROM sa) WHERE rn = 1),
        |probes AS (SELECT vec_id AS query_id, cid AS cell FROM (
        |         SELECT vec_id, cid,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        |         FROM sa WHERE vec_id < 8) WHERE rn <= 4),
        |scored AS (SELECT p.query_id, a.vec_id AS nbr_id,
        |         round(list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
        |                                      CAST(en.embedding AS DOUBLE[])), 6) AS cosine
        |       FROM probes p JOIN cells a ON a.cell = p.cell AND a.vec_id <> p.query_id
        |         AND a.vec_id % 3 <> 0
        |       JOIN embeddings eq ON eq.vec_id = p.query_id
        |       JOIN embeddings en ON en.vec_id = a.vec_id),
        |ranked AS (SELECT query_id, nbr_id, cosine,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY cosine DESC, nbr_id) AS rank FROM scored)
        |SELECT query_id, CAST(rank AS INT) AS rank, nbr_id, cosine
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // streaming SemDeDup replay: cells exactly as dedup_semantic's
    // (6-dp-rounded centroid scores, ties to lowest cid), the
    // same-cell >= 0.42 pair set once, then the two-batch keep-first
    // accept recursion in the stream_dedup_neardup oracle's shape —
    // within-batch lower-id removal, then survivors against batch 1's
    // accepted set in both pair directions
    "stream_dedup_semantic" ->
      """WITH cents AS (SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 16),
        |sa AS (SELECT e.vec_id, c.cid,
        |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                      CAST(c.embedding AS DOUBLE[])), 6) AS s
        |       FROM embeddings e CROSS JOIN cents c),
        |cells AS (SELECT vec_id, cid AS cell FROM (
        |         SELECT vec_id, cid,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        |         FROM sa) WHERE rn = 1),
        |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |       FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |       JOIN embeddings ea ON ea.vec_id = a.vec_id
        |       JOIN embeddings eb ON eb.vec_id = b.vec_id
        |       WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
        |                                          CAST(eb.embedding AS DOUBLE[])), 6) >= 0.42),
        |b1 AS (SELECT vec_id FROM embeddings WHERE vec_id % 2 = 0),
        |b2 AS (SELECT vec_id FROM embeddings WHERE vec_id % 2 = 1),
        |acc1 AS (
        |  SELECT vec_id FROM b1 WHERE vec_id NOT IN (
        |    SELECT p.id_b FROM pairs p
        |    JOIN b1 x ON p.id_a = x.vec_id JOIN b1 y ON p.id_b = y.vec_id)),
        |s2 AS (
        |  SELECT vec_id FROM b2 WHERE vec_id NOT IN (
        |    SELECT p.id_b FROM pairs p
        |    JOIN b2 x ON p.id_a = x.vec_id JOIN b2 y ON p.id_b = y.vec_id)),
        |acc2 AS (
        |  SELECT vec_id FROM s2 WHERE vec_id NOT IN (
        |    SELECT s2.vec_id FROM pairs p
        |    JOIN s2 ON p.id_a = s2.vec_id JOIN acc1 ON p.id_b = acc1.vec_id
        |    UNION
        |    SELECT s2.vec_id FROM pairs p
        |    JOIN s2 ON p.id_b = s2.vec_id JOIN acc1 ON p.id_a = acc1.vec_id)),
        |acc AS (SELECT vec_id FROM acc1 UNION ALL SELECT vec_id FROM acc2)
        |SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell
        |FROM cells c JOIN acc USING (vec_id)
        |ORDER BY c.vec_id""".stripMargin,
    "emb_centroids" ->
      """SELECT CAST(vec_id % 8 AS BIGINT) AS grp, CAST(g.i AS INT) AS dim,
        |       round(avg(CAST(embedding[g.i + 1] AS DOUBLE)), 6) AS mean
        |FROM embeddings, generate_series(0, 63) g(i)
        |GROUP BY 1, 2 ORDER BY grp, dim""".stripMargin,
    "text_quality" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CAST(len($duckToks) AS BIGINT) AS n_words,
         |    round(CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
         |          / greatest(length(text), 1), 6) AS punct_ratio,
         |    round(CAST(len(list_filter($duckToks,
         |            t -> t IN ('the','a','of','and','to','in','is','it','that','was'))) AS DOUBLE)
         |          / greatest(len($duckToks), 1), 6) AS stopword_ratio,
         |    round(CAST(list_aggregate(list_transform($duckToks, t -> length(t)), 'sum') AS DOUBLE)
         |          / greatest(len($duckToks), 1), 6) AS mean_word_len
         |  FROM documents)
         |SELECT doc_id, n_words, punct_ratio, stopword_ratio, mean_word_len,
         |  round(((CASE WHEN n_words BETWEEN 5 AND 10000 THEN 1.0 ELSE 0.0 END)
         |       + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END)
         |       + (CASE WHEN stopword_ratio >= 0.05 THEN 1.0 ELSE 0.5 END)) / 3.0, 6)
         |    AS quality_score
         |FROM f ORDER BY doc_id""".stripMargin,
    "text_langid" -> langidSql,
    "text_tokens" ->
      s"""SELECT tok AS token, count(*) AS freq
         |FROM (SELECT unnest($duckToks) AS tok FROM documents)
         |GROUP BY tok ORDER BY freq DESC, token ASC LIMIT 30""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |       md5(regexp_replace(lower(trim(text)), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_redact" ->
      s"""SELECT doc_id,
         |       md5(regexp_replace(regexp_replace(
         |         text || ' contact: user' || CAST(doc_id AS VARCHAR)
         |              || '@example.com or +1 555-010' || CAST(doc_id % 10 AS VARCHAR),
         |         '${Text.emailPattern}', '<EMAIL>', 'g'),
         |         '${Text.phonePattern}', '<PHONE>', 'g')) AS redacted_md5
         |FROM documents ORDER BY doc_id""".stripMargin,
    "profile_lineitem" ->
      """WITH cols(col_name) AS (VALUES ('l_quantity'), ('l_extendedprice'), ('l_discount'))
        |SELECT c.col_name AS "column",
        |       CASE c.col_name WHEN 'l_quantity' THEN count(l_quantity)
        |         WHEN 'l_extendedprice' THEN count(l_extendedprice)
        |         ELSE count(l_discount) END AS n,
        |       CASE c.col_name WHEN 'l_quantity' THEN count(*) - count(l_quantity)
        |         WHEN 'l_extendedprice' THEN count(*) - count(l_extendedprice)
        |         ELSE count(*) - count(l_discount) END AS n_nulls,
        |       CASE c.col_name WHEN 'l_quantity' THEN CAST(min(l_quantity) AS DOUBLE)
        |         WHEN 'l_extendedprice' THEN CAST(min(l_extendedprice) AS DOUBLE)
        |         ELSE CAST(min(l_discount) AS DOUBLE) END AS min,
        |       CASE c.col_name WHEN 'l_quantity' THEN CAST(max(l_quantity) AS DOUBLE)
        |         WHEN 'l_extendedprice' THEN CAST(max(l_extendedprice) AS DOUBLE)
        |         ELSE CAST(max(l_discount) AS DOUBLE) END AS max,
        |       CASE c.col_name WHEN 'l_quantity' THEN round(avg(l_quantity), 6)
        |         WHEN 'l_extendedprice' THEN round(avg(l_extendedprice), 6)
        |         ELSE round(avg(l_discount), 6) END AS mean,
        |       CASE c.col_name WHEN 'l_quantity' THEN round(stddev_samp(l_quantity), 6)
        |         WHEN 'l_extendedprice' THEN round(stddev_samp(l_extendedprice), 6)
        |         ELSE round(stddev_samp(l_discount), 6) END AS stddev
        |FROM lineitem, cols c
        |GROUP BY c.col_name ORDER BY "column"""".stripMargin,
    "dedup_incremental" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |         md5(regexp_replace(lower(trim(text)), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS fingerprint
        |  FROM documents
        |), corpus AS (
        |  SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 2 = 0
        |), survivors AS (
        |  SELECT min(doc_id) AS doc_id, fingerprint
        |  FROM fp
        |  WHERE doc_id % 2 = 1
        |    AND fingerprint NOT IN (SELECT fingerprint FROM corpus)
        |  GROUP BY fingerprint
        |)
        |SELECT doc_id, fingerprint FROM survivors ORDER BY doc_id""".stripMargin,
    // bloom pre-filter has no false negatives => identical output
    "dedup_bloom_incr" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |         md5(regexp_replace(lower(trim(text)), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS fingerprint
        |  FROM documents
        |), corpus AS (
        |  SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 2 = 0
        |), survivors AS (
        |  SELECT min(doc_id) AS doc_id, fingerprint
        |  FROM fp
        |  WHERE doc_id % 2 = 1
        |    AND fingerprint NOT IN (SELECT fingerprint FROM corpus)
        |  GROUP BY fingerprint
        |)
        |SELECT doc_id, fingerprint FROM survivors ORDER BY doc_id""".stripMargin,
    // integer md5-prefix thresholds (no float literals cross-engine);
    // values interpolate from the SAME Sample.threshold the query uses
    "sample_stratified" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT <
         |  CASE lang WHEN 'en' THEN ${graft.ext.Sample.threshold(0.5)}
         |            WHEN 'fr' THEN ${graft.ext.Sample.threshold(0.3)}
         |            ELSE ${graft.ext.Sample.threshold(0.1)} END
         |ORDER BY doc_id""".stripMargin,
    "sample_domain_cap" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |    ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10 ORDER BY doc_id""".stripMargin,
    // quota arithmetic mirrors balancedTo step for step: per-stratum
    // counts, T = min(count/share), k = floor(share*T), hash-order pick
    "sample_balanced" ->
      """WITH counts AS (
        |  SELECT lang, CAST(count(*) AS DOUBLE) AS n,
        |         CASE lang WHEN 'en' THEN 0.5::DOUBLE WHEN 'de' THEN 0.3::DOUBLE
        |                   WHEN 'fr' THEN 0.2::DOUBLE END AS share
        |  FROM documents GROUP BY lang
        |), t AS (
        |  SELECT min(n / share) AS t FROM counts WHERE share IS NOT NULL
        |), quotas AS (
        |  SELECT lang, CAST(floor(share * (SELECT t FROM t)) AS BIGINT) AS k
        |  FROM counts WHERE share IS NOT NULL
        |), ranked AS (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rn
        |  FROM documents
        |)
        |SELECT doc_id, r.lang FROM ranked r JOIN quotas q ON r.lang = q.lang
        |WHERE rn <= k ORDER BY doc_id""".stripMargin,
    // same truncating-floor SQ8 arithmetic, component for component
    "emb_quantize" ->
      """WITH q AS (
        |  SELECT vec_id,
        |         CASE WHEN list_max(embedding) = list_min(embedding)
        |              THEN list_transform(embedding, x -> 0)
        |              ELSE list_transform(embedding, x ->
        |                CAST(floor((CAST(x AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE)) * 255.0
        |                  / (CAST(list_max(embedding) AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE))) AS INT))
        |         END AS codes
        |  FROM embeddings)
        |SELECT vec_id, md5(array_to_string(codes, ',')) AS q_md5,
        |       CAST(list_aggregate(codes, 'sum') AS BIGINT) AS q_sum
        |FROM q ORDER BY vec_id""".stripMargin,
    // DuckDB may use the single-node global window the Spark side must
    // not (PlanSpec pins the corpus window as bucket-partitioned)
    "pack_batches" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($duckToks) AS BIGINT) AS n FROM documents
         |), r AS (
         |  SELECT doc_id, n, n // 16 AS bkt,
         |         row_number() OVER (PARTITION BY n // 16
         |           ORDER BY n DESC, doc_id) - 1 AS rn
         |  FROM d)
         |SELECT bkt AS bucket, rn // 8 AS batch,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       max(n) AS max_len,
         |       max(n) * count(*) - CAST(sum(n) AS BIGINT) AS pad_waste
         |FROM r GROUP BY 1, 2 ORDER BY bucket, batch""".stripMargin,
    "pack_shards" ->
      s"""WITH w AS (
         |  SELECT doc_id, CAST(len($duckToks) AS BIGINT) AS n_tokens FROM documents
         |), c AS (
         |  SELECT doc_id, n_tokens,
         |         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
         |  FROM w)
         |SELECT doc_id, n_tokens,
         |       CAST(floor(CAST(pre AS DOUBLE) / 2000.0) AS BIGINT) AS shard_id
         |FROM c ORDER BY doc_id""".stripMargin,
    "text_decontam" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $duckToks AS ts FROM documents
         |), g AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    generate_series(1, greatest(len(ts) - 2, 0)),
         |    i -> ts[CAST(i AS INT)] || ' ' || ts[CAST(i+1 AS INT)] || ' ' || ts[CAST(i+2 AS INT)]))) AS s
         |  FROM toks
         |), ev AS (
         |  SELECT DISTINCT s FROM g WHERE doc_id % 50 = 0
         |), bad AS (
         |  SELECT DISTINCT g.doc_id FROM g JOIN ev USING (s) WHERE g.doc_id % 50 <> 0
         |)
         |SELECT doc_id,
         |       md5(regexp_replace(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS fingerprint
         |FROM documents
         |WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
         |ORDER BY doc_id""".stripMargin,
    "text_clean" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         chr(9) || ' ' || text || '  x' || chr(1) || chr(127) || ' ' AS dirty
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(
        |           dirty, '[\x00-\x1F\x7F]', ' ', 'g'), '[ \t\n\x0b\f\r]{2,}', ' ', 'g')) AS cleaned
        |  FROM d)
        |SELECT doc_id, md5(cleaned) AS clean_md5,
        |       CAST(length(cleaned) AS BIGINT) AS n_chars
        |FROM c ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($duckToks) AS tok FROM documents
         |), cnt AS (
         |  SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok
         |)
         |SELECT doc_id,
         |       round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_share,
         |       round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS ttr
         |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_lmscore" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($duckToks) AS tok FROM documents
         |), cnt AS (
         |  SELECT tok, count(*) AS c FROM tok GROUP BY tok
         |), tot AS (
         |  SELECT sum(c) AS total FROM cnt
         |), lp AS (
         |  SELECT tok, ln(CAST(c AS DOUBLE) / total) AS logp FROM cnt, tot
         |)
         |SELECT doc_id, round(avg(logp), 4) AS lm_score,
         |       count(*) AS n_tokens
         |FROM tok JOIN lp USING (tok)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // NB replay: priors/likelihoods are exact-int ratios through ln
    // (bit-identical), doc score sums round(4) before the argmax
    "text_nbayes" -> textNbayesSql,
    // per-class scorecard over the SAME NB prediction replay: exact
    // integer confusion counts, single-division metrics round(6), f1
    // is a 3-op chain on the already-rounded p/r (bit-identical)
    "ml_eval" ->
      s"""WITH pred AS ($textNbayesBodySql),
         |cm AS (
         |  SELECT cls,
         |    CAST(sum(CASE WHEN lang = cls AND predicted = cls THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN predicted = cls AND lang <> cls THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN lang = cls AND predicted <> cls THEN 1 ELSE 0 END) AS BIGINT) AS fn
         |  FROM pred CROSS JOIN (SELECT DISTINCT lang AS cls FROM documents) c
         |  GROUP BY cls)
         |SELECT cls, tp + fn AS n_true, tp + fp AS n_pred, tp,
         |       round(CAST(tp AS DOUBLE) / greatest(tp + fp, 1), 6) AS precision,
         |       round(CAST(tp AS DOUBLE) / greatest(tp + fn, 1), 6) AS recall,
         |       round(2 * round(CAST(tp AS DOUBLE) / greatest(tp + fp, 1), 6)
         |               * round(CAST(tp AS DOUBLE) / greatest(tp + fn, 1), 6)
         |             / greatest(round(CAST(tp AS DOUBLE) / greatest(tp + fp, 1), 6)
         |               + round(CAST(tp AS DOUBLE) / greatest(tp + fn, 1), 6), 1e-12), 6) AS f1
         |FROM cm ORDER BY cls""".stripMargin,
    // ranking key is exact integers (tf desc, df asc, term asc); only the
    // informational tfidf column touches floats (rounded 4)
    "text_tfidf" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($duckToks) AS term FROM documents
         |), tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
         |), dfreq AS (
         |  SELECT term, count(*) AS df FROM tf GROUP BY term
         |), n AS (
         |  SELECT count(*) AS n_docs FROM documents
         |), r AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         |         row_number() OVER (PARTITION BY tf.doc_id
         |           ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC) AS rn
         |  FROM tf JOIN dfreq USING (term)
         |)
         |SELECT doc_id, term AS top_term, tf,
         |       round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
         |FROM r, n WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // stopword list inline (Text.stopwords("en")); the ratio test is the
    // SAME single IEEE product the Spark filter runs
    "text_filter" ->
      s"""WITH f AS (
         |  SELECT doc_id, text, len($duckToks) AS nw,
         |         len(list_filter($duckToks,
         |           t -> t IN ('the','a','of','and','to','in','is','it','that','was'))) AS ns
         |  FROM documents)
         |SELECT doc_id,
         |       md5(regexp_replace(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS fingerprint
         |FROM f
         |WHERE nw BETWEEN 60 AND 10000 AND CAST(ns AS DOUBLE) >= 0.05 * CAST(nw AS DOUBLE)
         |ORDER BY doc_id""".stripMargin,
    "text_chunk" ->
      s"""WITH t AS (
         |  SELECT doc_id, $duckToks AS ts FROM documents
         |), c AS (
         |  SELECT doc_id, ts,
         |         unnest(generate_series(1, greatest(len(ts) - 8, 1), 56)) AS st
         |  FROM t)
         |SELECT doc_id, CAST((st - 1) // 56 AS INT) AS chunk_idx,
         |       CAST(len(ts[CAST(st AS INT):CAST(st + 63 AS INT)]) AS BIGINT) AS n_chunk_tokens,
         |       md5(array_to_string(ts[CAST(st AS INT):CAST(st + 63 AS INT)], ' ')) AS chunk_md5
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "text_bm25" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS ts FROM documents),
         |dl AS (SELECT doc_id, CAST(len(ts) AS DOUBLE) AS dl FROM t),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
         |tok AS (SELECT doc_id, unnest(ts) AS tok FROM t),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf FROM tok
         |       WHERE tok IN ('table', 'spark', 'query') GROUP BY doc_id, tok),
         |df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok)
         |SELECT tf.doc_id,
         |       round(sum(ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
         |         * (tf.tf * (1.2 + 1))
         |         / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl))), 4) AS bm25,
         |       CAST(count(*) AS BIGINT) AS n_terms
         |FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN st
         |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,
    "q31_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS k, count(*) AS n_cust
        |           FROM customer WHERE c_acctbal > 9900 GROUP BY 1),
        |s AS (SELECT s_nationkey AS k, count(*) AS n_supp
        |      FROM supplier WHERE s_acctbal < 500 GROUP BY 1)
        |SELECT CAST(coalesce(c.k, s.k) AS BIGINT) AS nationkey,
        |       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.k = s.k ORDER BY nationkey""".stripMargin,
    "q32_lateral" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS ts FROM documents WHERE doc_id < 30),
         |p AS (SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS p1 FROM t)
         |SELECT doc_id, CAST(p1 - 1 AS INT) AS pos, ts[CAST(p1 AS INT)] AS word
         |FROM p ORDER BY doc_id, pos""".stripMargin,
    "q33_range_frame" ->
      """SELECT event_id, user_id,
        |       round(sum(value) OVER (PARTITION BY user_id
        |         ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4) AS trailing_1h
        |FROM events WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q34_multi_distinct" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_suppkey) AS n_supp,
        |       count(DISTINCT l_partkey) AS n_part,
        |       count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q35_higher_order" ->
      """WITH a AS (
        |  SELECT l_orderkey,
        |         list(CAST(l_quantity AS BIGINT)
        |              ORDER BY l_linenumber, CAST(l_quantity AS BIGINT)) AS arr
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |       CAST(len(arr) AS BIGINT) AS n_items,
        |       CAST(len(list_filter(arr, x -> x > 25)) AS BIGINT) AS n_big,
        |       CAST(list_sum(list_transform(arr, x -> x * 2)) AS BIGINT) AS doubled_sum,
        |       CAST(list_sum(list_transform(generate_series(1, len(arr)),
        |         i -> arr[CAST(i AS INT)] * i)) AS BIGINT) AS pos_weighted
        |FROM a ORDER BY l_orderkey""".stripMargin,
    "q36_recursive_cte" -> q36RecursiveSql,
    "q37_map_agg" ->
      """SELECT user_id,
        |       count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |       count(*) FILTER (WHERE event_type = 'error') AS n_error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q38_cond_agg" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |       count(*) FILTER (WHERE c_acctbal < 0) AS n_debt,
        |       bool_or(c_mktsegment = 'AUTOMOBILE') AS any_auto,
        |       bool_and(c_acctbal > -1000) AS all_above,
        |       round(sum(CASE WHEN c_acctbal < 0 THEN c_acctbal ELSE 0 END), 2) AS debt_sum
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "q39_distribution" ->
      """SELECT c_mktsegment, c_custkey,
        |       round(cume_dist() OVER w, 6) AS cume,
        |       nth_value(c_name, 3) OVER wf AS third_name,
        |       last_value(c_name) OVER wf AS top_name
        |FROM customer WHERE c_custkey <= 500
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_name),
        |       wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_name
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q40_values_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       CAST(sum(w.weight) AS BIGINT) AS weighted
        |FROM orders JOIN (VALUES
        |  ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
        |  ('4-NOT SPECIFIED', 2), ('5-LOW', 1)) AS w(o_orderpriority, weight)
        |USING (o_orderpriority)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // NULL renders as the explicit chr(0)||'null' sentinel on both
    // engines (concat_ws drops null elements outright — without the
    // sentinel null PLACEMENT would not be hash-distinguished)
    "integrity_checksum" ->
      """SELECT count(*) AS n_rows, bit_xor(h) AS xor_hash,
        |       min(h) AS min_hash, max(h) AS max_hash
        |FROM (SELECT ('0x' || substr(md5(concat_ws('|',
        |        coalesce(CAST(o_orderkey AS VARCHAR), chr(0) || 'null'),
        |        coalesce(CAST(o_custkey AS VARCHAR), chr(0) || 'null'),
        |        coalesce(o_orderstatus, chr(0) || 'null'),
        |        coalesce(o_orderpriority, chr(0) || 'null'))), 1, 15))::BIGINT AS h
        |      FROM orders)""".stripMargin,
    "q50_unpivot" ->
      """WITH a AS (
        |  SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        |         round(sum(l_extendedprice), 2) AS sum_price,
        |         round(sum(l_discount), 2) AS sum_disc
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, metric, value
        |FROM a UNPIVOT (value FOR metric IN (sum_qty, sum_price, sum_disc))
        |ORDER BY l_returnflag, metric""".stripMargin,
    "q49_topk_grouped" ->
      """SELECT o_orderpriority, CAST(rn AS INT) AS rank, o_orderkey, o_totalprice
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rank""".stripMargin,
    "sample_split" ->
      """WITH u AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |           / 4294967296.0 AS u
        |  FROM documents)
        |SELECT doc_id,
        |       CASE WHEN u < 0.8 THEN 'train'
        |            WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
        |FROM u ORDER BY doc_id""".stripMargin,
    "sample_weighted" ->
      // A-ES replay: u = (first-8-md5-hex + 1) / 2^32 exactly, key =
      // round(u^(1/w), 9), top-50 by (key DESC, id)
      """WITH keyed AS (
        |  SELECT doc_id, source, n_chars,
        |         round(pow((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |                    + 1.0) / 4294967296.0,
        |                   1.0 / n_chars), 9) AS k
        |  FROM documents)
        |SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |         row_number() OVER (ORDER BY k DESC, doc_id) AS rn FROM keyed)
        |WHERE rn <= 50 ORDER BY doc_id""".stripMargin,
    "q46_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id,
        |              CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
        |cohort AS (SELECT user_id, min(wk) AS cwk FROM ev GROUP BY user_id)
        |SELECT CAST(c.cwk AS TIMESTAMP) AS cohort_week,
        |       CAST(floor(datediff('day', c.cwk, e.wk) / 7) AS INT) AS week_offset,
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM ev e JOIN cohort c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q47_rolling_dau" ->
      """WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS ed FROM events),
        |days AS (SELECT DISTINCT ed AS d FROM e)
        |SELECT CAST(days.d AS TIMESTAMP) AS d,
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS dau_7d
        |FROM e JOIN days ON days.d BETWEEN e.ed AND e.ed + 6
        |GROUP BY days.d ORDER BY days.d""".stripMargin,
    "q48_zscore" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, event_type,
        |         CAST(count(*) AS DOUBLE) AS n
        |  FROM events GROUP BY 1, 2),
        |sc AS (
        |  SELECT d, event_type, n,
        |         avg(n) OVER w AS mu,
        |         stddev_samp(n) OVER w AS sd,
        |         count(*) OVER w AS cnt
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY d
        |               ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))
        |SELECT CAST(d AS TIMESTAMP) AS d, event_type, CAST(n AS BIGINT) AS n,
        |       CASE WHEN cnt >= 3 AND sd > 0 THEN round((n - mu) / sd, 4) END AS z,
        |       (cnt >= 3 AND sd > 0 AND abs((n - mu) / sd) >= 2) AS is_anomaly
        |FROM sc ORDER BY d, event_type""".stripMargin,
    "q44_scd2" ->
      """SELECT user_id, event_id, ts AS valid_from,
        |       lead(ts) OVER w AS valid_to,
        |       (lead(ts) OVER w IS NULL) AS is_current,
        |       round(value, 4) AS value
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, valid_from, event_id""".stripMargin,
    "drift_psi" ->
      """WITH o AS (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS x,
        |                  o_orderkey % 2 = 1 AS is_ref FROM orders),
        |e AS (SELECT min(x) AS lo, max(x) AS hi FROM o WHERE is_ref),
        |b AS (SELECT least(greatest(floor((x - lo) / ((hi - lo) / 10.0)), 0), 9) AS bin,
        |             is_ref
        |      FROM o, e),
        |c AS (SELECT bin,
        |        CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |        CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
        |      FROM b GROUP BY 1),
        |t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
        |             CAST(sum(n_cur) AS BIGINT) AS t_cur FROM c)
        |SELECT CAST(bin AS BIGINT) AS bin, n_ref, n_cur,
        |       round((CAST(n_cur AS DOUBLE) / t_cur - CAST(n_ref AS DOUBLE) / t_ref)
        |         * ln(greatest(CAST(n_cur AS DOUBLE) / t_cur, 1e-6)
        |             / greatest(CAST(n_ref AS DOUBLE) / t_ref, 1e-6)), 6) AS psi
        |FROM c, t ORDER BY bin""".stripMargin,
    "emb_quality" ->
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
        |       round(sqrt(list_aggregate(list_transform(
        |         CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')), 6) AS norm,
        |       CAST(len(list_filter(embedding, x -> x = 0)) AS INT) AS n_zero,
        |       abs(round(sqrt(list_aggregate(list_transform(
        |         CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')), 6) - 1.0) <= 0.01
        |         AS is_unit
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    // full recompute over ALL orders — the gate proves the
    // incremental merge of two partial states equals it exactly
    "agg_increment" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS sum_total,
        |       CAST(max(o_orderdate) AS TIMESTAMP) AS max_date
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "skew_profile" ->
      """SELECT group_size, count(*) AS n_keys
        |FROM (SELECT count(*) AS group_size FROM lineitem GROUP BY l_suppkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "user_growth" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day
        |           FROM events GROUP BY 1),
        |d AS (SELECT day, count(*) AS n_new_users FROM f GROUP BY 1)
        |SELECT CAST(day AS TIMESTAMP) AS day, n_new_users,
        |       CAST(sum(n_new_users) OVER (ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS cum_users
        |FROM d ORDER BY day""".stripMargin,
    "manifest_hll_view" ->
      """SELECT event_type, count(*) AS cnt,
        |       count(DISTINCT user_id) AS n_exact,
        |       TRUE AS within_tol
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stream_lakehouse" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "dq_fk" ->
      """SELECT rule, (SELECT count(*) FROM lineitem) AS n_rows,
        |       n_violations, n_violations = 0 AS pass
        |FROM (
        |  SELECT 'fk_orders' AS rule,
        |         (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_violations
        |  UNION ALL SELECT 'fk_part',
        |         (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |            (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |  UNION ALL SELECT 'fk_supplier',
        |         (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |            (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        |  UNION ALL SELECT 'fk_finished_orders',
        |         (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
        |             AND o.o_orderstatus = 'F'))
        |) ORDER BY rule""".stripMargin,
    "pipeline_lakehouse" ->
      """WITH kept AS (
        |  SELECT * FROM events
        |  WHERE NOT (event_id % 10 = 3 AND event_id % 4 < 3)
        |)
        |SELECT * FROM (
        |  SELECT 'total' AS section, event_type, count(*) AS cnt,
        |         CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |  FROM kept GROUP BY event_type
        |  UNION ALL
        |  SELECT 'window', event_type, count(*),
        |         CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
        |  FROM kept
        |  WHERE ts >= TIMESTAMP '2024-01-11 00:00:00'
        |    AND ts <= TIMESTAMP '2024-01-15 23:59:59.999999'
        |  GROUP BY event_type
        |) ORDER BY section, event_type""".stripMargin,
    "dq_expectations" ->
      """WITH a AS (SELECT count(*) AS n,
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r1,
        |  CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS r2,
        |  CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F') THEN 1 ELSE 0 END) AS BIGINT) AS r3,
        |  CAST(sum(CASE WHEN o_orderdate < DATE '1992-01-01'
        |                  OR o_orderdate > DATE '1998-12-31' THEN 1 ELSE 0 END) AS BIGINT) AS r4,
        |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r5,
        |  count(DISTINCT o_orderkey) AS u1
        |  FROM orders)
        |SELECT * FROM (
        |  SELECT 'orderkey_not_null' AS rule, n AS n_rows, r1 AS n_violations, r1 = 0 AS pass FROM a
        |  UNION ALL SELECT 'totalprice_positive', n, r2, r2 = 0 FROM a
        |  UNION ALL SELECT 'status_in_domain', n, r3, r3 = 0 FROM a
        |  UNION ALL SELECT 'orderdate_in_range', n, r4, r4 = 0 FROM a
        |  UNION ALL SELECT 'priority_not_null', n, r5, r5 = 0 FROM a
        |  UNION ALL SELECT 'o_orderkey_unique', n, n - u1, n - u1 = 0 FROM a)
        |ORDER BY rule""".stripMargin,
    // as-of ≡ SCD2 interval containment: purchases deduped per
    // (user, ts) by max event_id, tiled into [valid_from, valid_to)
    // intervals, views matched by containment (at most one interval)
    "scd2_pit_join" ->
      """WITH p AS (
        |  SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'purchase'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |                             ORDER BY event_id DESC) = 1),
        |iv AS (SELECT user_id, event_id AS p_event_id, value AS p_value0,
        |              ts AS valid_from,
        |              lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
        |       FROM p),
        |v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view')
        |SELECT v.user_id, v.event_id, v.ts, iv.p_event_id,
        |       round(iv.p_value0, 4) AS p_value,
        |       round(CAST(epoch_us(v.ts) - epoch_us(iv.valid_from) AS DOUBLE) / 3.6e9, 4)
        |         AS hours_since
        |FROM v LEFT JOIN iv
        |  ON iv.user_id = v.user_id AND iv.valid_from <= v.ts
        |     AND (iv.valid_to IS NULL OR v.ts < iv.valid_to)
        |ORDER BY v.user_id, v.event_id""".stripMargin,
    "q57_attribution" ->
      """WITH t AS (
        |  SELECT event_type, value, ts,
        |    last_value(CASE WHEN event_type IN ('view','click')
        |                    THEN event_type END IGNORE NULLS) OVER w AS last_ch,
        |    last_value(CASE WHEN event_type IN ('view','click')
        |                    THEN ts END IGNORE NULLS) OVER w AS last_mk_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT CASE WHEN last_mk_ts IS NOT NULL
        |              AND last_mk_ts >= ts - INTERVAL 7 DAY
        |            THEN last_ch ELSE 'none' END AS channel,
        |       count(*) AS n_purchases, round(sum(value), 2) AS revenue
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "stats_winsorize" ->
      """WITH d AS (SELECT event_type, value AS v,
        |             percent_rank() OVER (PARTITION BY event_type ORDER BY value) AS pr
        |           FROM events WHERE value IS NOT NULL),
        |b AS (SELECT event_type, v,
        |        max(CASE WHEN pr <= 0.05 THEN v END)
        |          OVER (PARTITION BY event_type) AS lo,
        |        min(CASE WHEN pr >= 0.95 THEN v END)
        |          OVER (PARTITION BY event_type) AS hi
        |      FROM d)
        |SELECT event_type, count(*) AS n,
        |       round(avg(least(greatest(v, coalesce(lo, v)), coalesce(hi, v))), 4)
        |         AS winsorized_mean,
        |       round(avg(v), 4) AS raw_mean
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q45_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id),
        |f AS (SELECT v.user_id,
        |        CASE WHEN p.p_ts IS NOT NULL
        |               AND p.p_ts <= v.v_ts + INTERVAL 24 HOUR THEN 3
        |             WHEN c.c_ts IS NOT NULL THEN 2 ELSE 1 END AS stage,
        |        CASE WHEN p.p_ts IS NOT NULL
        |               AND p.p_ts <= v.v_ts + INTERVAL 24 HOUR
        |             THEN CAST(epoch_us(p.p_ts) - epoch_us(v.v_ts) AS DOUBLE) / 3.6e9
        |        END AS conv_h
        |      FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id))
        |SELECT stage, count(*) AS n_users,
        |       round(avg(conv_h), 4) AS avg_hours_to_convert
        |FROM f GROUP BY stage ORDER BY stage""".stripMargin,
    "q42_stats" ->
      """SELECT l_returnflag, count(*) AS n,
        |       round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
        |       round(stddev_samp(l_extendedprice), 2) AS sd_price,
        |       round(var_samp(l_quantity), 4) AS var_qty,
        |       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope_pq,
        |       round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept_pq,
        |       round(median(l_extendedprice), 4) AS med_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q43_histogram" ->
      """SELECT least(CAST(floor(CAST(o_totalprice AS DOUBLE) / 50000.0) AS BIGINT), 11) AS bucket,
        |       count(*) AS n,
        |       round(sum(CAST(o_totalprice AS DOUBLE)), 2) AS sum_price,
        |       round(min(CAST(o_totalprice AS DOUBLE)), 2) AS min_price,
        |       round(max(CAST(o_totalprice AS DOUBLE)), 2) AS max_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q41_array_ops" ->
      """WITH a AS (
        |  SELECT c_mktsegment,
        |         list_sort(list(DISTINCT CAST(c_nationkey AS BIGINT))) AS nations
        |  FROM customer GROUP BY c_mktsegment)
        |SELECT c_mktsegment,
        |       CAST(len(nations) AS BIGINT) AS n_nations,
        |       CAST(len(list_filter(nations, x -> x BETWEEN 0 AND 9)) AS BIGINT) AS n_low,
        |       array_to_string(list_transform(nations, x -> CAST(x AS VARCHAR)), ',') AS nation_csv
        |FROM a ORDER BY c_mktsegment""".stripMargin,
    "graph_pagerank" -> graphPagerankSql,
    "graph_pagerank_dangling" -> graphPagerankDanglingSql,
    "graph_degrees" ->
      """WITH e AS (
        |  SELECT l_partkey AS src, 1000000 + l_suppkey AS dst
        |  FROM lineitem WHERE l_returnflag <> 'R'
        |  UNION ALL
        |  SELECT 1000000 + l_suppkey, l_partkey
        |  FROM lineitem WHERE l_returnflag = 'R'),
        |o AS (SELECT src AS id, count(*) AS outdeg, count(DISTINCT dst) AS out_nbrs
        |      FROM e GROUP BY 1),
        |i AS (SELECT dst AS id, count(*) AS indeg, count(DISTINCT src) AS in_nbrs
        |      FROM e GROUP BY 1)
        |SELECT CAST(id AS BIGINT) AS id,
        |       CAST(coalesce(outdeg, 0) AS BIGINT) AS outdeg,
        |       CAST(coalesce(out_nbrs, 0) AS BIGINT) AS out_nbrs,
        |       CAST(coalesce(indeg, 0) AS BIGINT) AS indeg,
        |       CAST(coalesce(in_nbrs, 0) AS BIGINT) AS in_nbrs
        |FROM o FULL OUTER JOIN i USING (id) ORDER BY id""".stripMargin,
    // INDEPENDENT formulation — deliberately NOT the degree-ordered
    // wedge algorithm the Scala side runs (a replayed oracle shares
    // the algorithm's bugs; round 7's triangle-ordering bug survived
    // exactly such an oracle). Naive 3-way self-join on the canonical
    // u < v edge set: a triangle a<b<c appears iff (a,b),(b,c),(a,c)
    // are all edges. Quadratic-ish but trivially affordable at sf0.01.
    "graph_triangles" ->
      """WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_linenumber <= 3),
        |und AS (SELECT DISTINCT x.p AS u, y.p AS v
        |        FROM ps x JOIN ps y ON x.o = y.o AND x.p < y.p),
        |tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
        |        FROM und e1
        |        JOIN und e2 ON e2.u = e1.v
        |        JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT CAST(id AS BIGINT) AS id, count(*) AS n_triangles
        |FROM (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
        |      UNION ALL SELECT z FROM tri)
        |GROUP BY 1 ORDER BY id""".stripMargin,
    // same INDEPENDENT naive triangle formulation as graph_triangles
    // (not the Scala wedge algorithm) + per-node degree;
    // 2·T/(d·(d−1)) is a 2-op IEEE chain on exact ints —
    // bit-identical, unrounded
    "graph_clustcoef" ->
      """WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_linenumber <= 3),
        |und AS (SELECT DISTINCT x.p AS u, y.p AS v
        |        FROM ps x JOIN ps y ON x.o = y.o AND x.p < y.p),
        |deg AS (SELECT id, count(*) AS d FROM (
        |          SELECT u AS id FROM und UNION ALL SELECT v FROM und)
        |        GROUP BY 1),
        |tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
        |        FROM und e1
        |        JOIN und e2 ON e2.u = e1.v
        |        JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
        |nt AS (SELECT id, count(*) AS t FROM (
        |         SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
        |         UNION ALL SELECT z FROM tri) GROUP BY 1)
        |SELECT CAST(deg.id AS BIGINT) AS id, CAST(deg.d AS BIGINT) AS degree,
        |       CAST(coalesce(nt.t, 0) AS BIGINT) AS n_triangles,
        |       CASE WHEN deg.d >= 2
        |            THEN 2.0 * coalesce(nt.t, 0) / (deg.d * (deg.d - 1))
        |            ELSE 0.0 END AS clust_coef
        |FROM deg LEFT JOIN nt ON nt.id = deg.id ORDER BY id""".stripMargin,
    // md5-derived cell positions replay exactly (same '0x'||substr
    // idiom as the SimHash oracle); estimate = min over the 4 rows
    "sketch_cms" ->
      """WITH h(i) AS (VALUES (0), (1), (2), (3)),
        |cells AS (
        |  SELECT i, ('0x' || substr(md5(i || ':' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 512 AS pos,
        |         count(*) AS n
        |  FROM events CROSS JOIN h GROUP BY 1, 2),
        |probes AS (SELECT DISTINCT user_id FROM events WHERE user_id < 15),
        |ppos AS (
        |  SELECT user_id, i,
        |         ('0x' || substr(md5(i || ':' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 512 AS pos
        |  FROM probes CROSS JOIN h),
        |est AS (SELECT user_id, min(coalesce(n, 0)) AS cms_est
        |        FROM ppos LEFT JOIN cells USING (i, pos) GROUP BY 1),
        |exact AS (SELECT user_id, count(*) AS exact_cnt
        |          FROM events WHERE user_id < 15 GROUP BY 1)
        |SELECT user_id, CAST(exact_cnt AS BIGINT) AS exact_cnt,
        |       CAST(cms_est AS BIGINT) AS cms_est,
        |       CAST(cms_est - exact_cnt AS BIGINT) AS overcount
        |FROM est JOIN exact USING (user_id) ORDER BY user_id""".stripMargin,
    // membership = all 4 bit positions set; false positives are
    // md5-deterministic so the summary row hash-matches exactly
    "sketch_bloom" ->
      """WITH h(i) AS (VALUES (0), (1), (2), (3)),
        |seen AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS key FROM orders
        |         WHERE o_orderpriority = '1-URGENT'),
        |bits AS (SELECT DISTINCT
        |           ('0x' || substr(md5(i || ':' || CAST(key AS VARCHAR)), 1, 15))::BIGINT % 4096 AS pos
        |         FROM seen CROSS JOIN h),
        |probes AS (SELECT DISTINCT CAST(c_custkey AS BIGINT) AS key FROM customer),
        |ppos AS (SELECT key,
        |           ('0x' || substr(md5(i || ':' || CAST(key AS VARCHAR)), 1, 15))::BIGINT % 4096 AS pos
        |         FROM probes CROSS JOIN h),
        |hits AS (SELECT key, count(*) AS hits FROM ppos
        |         WHERE pos IN (SELECT pos FROM bits) GROUP BY 1),
        |flags AS (SELECT p.key, coalesce(ht.hits, 0) = 4 AS bloom_member,
        |                 p.key IN (SELECT key FROM seen) AS actual_member
        |          FROM probes p LEFT JOIN hits ht ON ht.key = p.key)
        |SELECT CAST(count(*) AS BIGINT) AS n_probes,
        |       CAST(count(*) FILTER (WHERE actual_member) AS BIGINT) AS n_actual,
        |       CAST(count(*) FILTER (WHERE bloom_member) AS BIGINT) AS n_bloom,
        |       CAST(count(*) FILTER (WHERE bloom_member AND NOT actual_member) AS BIGINT) AS n_false_pos,
        |       count(*) FILTER (WHERE bloom_member AND NOT actual_member)
        |         / (count(*) - count(*) FILTER (WHERE actual_member)) AS fp_rate
        |FROM flags""".stripMargin,
    "stats_mannwhitney" -> statsMannwhitneySql,
    "stats_ks" -> statsKsSql,
    "stats_spearman" -> statsSpearmanSql,
    "stats_anova" -> statsAnovaSql,
    "sketch_kmv" -> sketchKmvSql,
    "dq_kanon" -> dqKanonSql,
    "graph_hits" -> graphHitsSql,
    "feat_target_encode" -> featTargetEncodeSql,
    "priv_dpcount" -> privDpcountSql,
    "simsearch_range" -> simsearchRangeSql,
    "ml_stump" -> mlStumpSql,
    "text_keyphrase" -> textKeyphraseSql,
    "ts_hampel" -> tsHampelSql,
    "graph_closeness" -> graphClosenessSql,
    "sample_kcenter" -> sampleKcenterSql,
    "ts_holtwinters" -> tsHoltwintersSql,
    "emb_whiten" -> embWhitenSql,
    "stats_bf" -> statsBfSql,
    "sketch_cms_topk" -> sketchCmsTopkSql,
    "ts_forecast_eval" -> tsForecastEvalSql,
    "dq_fd" -> dqFdSql,
    "stats_effect" -> statsEffectSql,
    "text_search" -> textSearchSql,
    "stats_kl" -> statsKlSql,
    "emb_pca_power" -> embPcaPowerSql,
    "integrity_merkle" -> integrityMerkleSql,
    "sample_kfold" -> sampleKfoldSql,
    "stats_theilsen" -> statsTheilsenSql,
    "stats_boxplot" -> statsBoxplotSql,
    "text_langid_eval" -> textLangidEvalSql,
    "stats_runs" -> statsRunsSql,
    "load_csv_multiline" -> loadCsvMultilineSql,
    "asof_tolerance" -> asofToleranceSql,
    "graph_sssp" -> graphSsspSql,
    "stats_regression2" -> statsRegression2Sql,
    "simsearch_recall" -> simsearchRecallSql,
    "stream_scd2" -> streamScd2Sql,
    "stats_mi" -> statsMiSql,
    "dedup_cluster_stats" -> dedupClusterStatsSql,
    "emb_pca_project" -> embPcaProjectSql,
    "sample_oversample" -> sampleOversampleSql,
    "io_partition_overwrite" -> ioPartitionOverwriteSql,
    "ts_strength" -> tsStrengthSql,
    "ts_ccf" -> tsCcfSql,
    "multimodal_audio" -> multimodalAudioSql,
    "stats_gini" -> statsGiniSql,
    // sufficient-stat t-test: mean/var round to 6 dp BEFORE the
    // closed form so both engines run identical IEEE chains
    "stats_ttest" ->
      """WITH a AS (
        |  SELECT CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
        |         round(avg(value) FILTER (WHERE event_type = 'click'), 6) AS mean_click,
        |         round(var_samp(value) FILTER (WHERE event_type = 'click'), 6) AS v1,
        |         CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
        |         round(avg(value) FILTER (WHERE event_type = 'purchase'), 6) AS mean_purchase,
        |         round(var_samp(value) FILTER (WHERE event_type = 'purchase'), 6) AS v2
        |  FROM events),
        |b AS (SELECT *, v1 / n_click AS se1, v2 / n_purchase AS se2,
        |             v1 / n_click + v2 / n_purchase AS se FROM a)
        |SELECT n_click, n_purchase, mean_click, mean_purchase,
        |       round((mean_click - mean_purchase) / sqrt(se), 6) AS t_stat,
        |       round((se * se) / (se1 * se1 / (n_click - 1) +
        |                          se2 * se2 / (n_purchase - 1)), 6) AS welch_df
        |FROM b""".stripMargin,
    // contingency table + marginals; expected = exact int product /
    // grand total (one division), only the cell-sum rounds
    "stats_chisq" ->
      """WITH obs AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |                    c_mktsegment AS seg, count(*) AS o
        |             FROM customer GROUP BY 1, 2),
        |rt AS (SELECT nation, CAST(sum(o) AS BIGINT) AS rt FROM obs GROUP BY 1),
        |ct AS (SELECT seg, CAST(sum(o) AS BIGINT) AS ct FROM obs GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS g,
        |               CAST(count(DISTINCT nation) AS BIGINT) AS nr,
        |               CAST(count(DISTINCT seg) AS BIGINT) AS nc FROM obs),
        |cells AS (SELECT o, (rt.rt * ct.ct) / tot.g AS e
        |          FROM obs JOIN rt USING (nation) JOIN ct USING (seg) CROSS JOIN tot)
        |SELECT (SELECT g FROM tot) AS n_rows,
        |       CAST(count(*) AS BIGINT) AS n_cells,
        |       (SELECT (nr - 1) * (nc - 1) FROM tot) AS df,
        |       round(sum((o - e) * (o - e) / e), 6) AS chi2
        |FROM cells""".stripMargin,
    // knn_join's LSH replay (same CTE chain) + the brute-force exact
    // ranking; graded relevance 11 − exact_rank; DCG sums round 6 dp
    "rank_ndcg" ->
      """WITH dims AS (
        |  SELECT vec_id, g.i AS i, CAST(embedding[g.i + 1] AS DOUBLE) AS v
        |  FROM embeddings, generate_series(0, 63) g(i)
        |), signs AS (
        |  SELECT t1.i, t2.b,
        |         CASE WHEN substr(md5(CAST(t1.i AS VARCHAR) || ':' || CAST(t2.b AS VARCHAR)), 1, 1) < '8'
        |              THEN 1.0 ELSE -1.0 END AS s
        |  FROM generate_series(0, 63) t1(i) CROSS JOIN generate_series(0, 383) t2(b)
        |), proj AS (
        |  SELECT d.vec_id, s.b, sum(d.v * s.s) AS p
        |  FROM dims d JOIN signs s ON s.i = d.i GROUP BY 1, 2
        |), bb AS (
        |  SELECT vec_id, b // 8 AS band,
        |         sum(CASE WHEN p > 0 THEN 1 << (b % 8) ELSE 0 END) AS chunk
        |  FROM proj GROUP BY 1, 2
        |), okb AS (
        |  SELECT band, chunk FROM bb GROUP BY band, chunk HAVING count(*) <= 64
        |), kept AS (
        |  SELECT bb.vec_id, bb.band, bb.chunk FROM bb JOIN okb USING (band, chunk)
        |), cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM kept a JOIN kept b USING (band, chunk) WHERE a.vec_id < b.vec_id
        |), sym AS (
        |  SELECT id_a AS query_id, id_b AS nbr_id FROM cand
        |  UNION ALL
        |  SELECT id_b, id_a FROM cand
        |), scored AS (
        |  SELECT s.query_id, s.nbr_id,
        |         round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
        |                                      CAST(eb.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM sym s JOIN embeddings ea ON ea.vec_id = s.query_id
        |  JOIN embeddings eb ON eb.vec_id = s.nbr_id
        |), ranked AS (
        |  SELECT query_id, nbr_id, cosine,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY cosine DESC, nbr_id) AS rank
        |  FROM scored
        |), ann AS (
        |  SELECT query_id, nbr_id, rank FROM ranked
        |  WHERE rank <= 10 AND query_id < 8
        |), bf AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
        |         round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                      CAST(q.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM embeddings c JOIN embeddings q
        |    ON q.vec_id < 8 AND q.vec_id <> c.vec_id
        |), bfr AS (
        |  SELECT query_id, nbr_id,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY cosine DESC, nbr_id) AS erank
        |  FROM bf
        |), exact AS (
        |  SELECT query_id, nbr_id, erank FROM bfr WHERE erank <= 10
        |), ar AS (
        |  SELECT a.query_id, a.rank, coalesce(11 - e.erank, 0) AS rel
        |  FROM ann a LEFT JOIN exact e
        |    ON e.query_id = a.query_id AND e.nbr_id = a.nbr_id
        |), perq AS (
        |  SELECT query_id, round(sum(rel / log2(rank + 1)), 6) AS dcg,
        |         count(*) FILTER (WHERE rel > 0) AS n_hit
        |  FROM ar GROUP BY 1
        |), ideal AS (
        |  SELECT query_id, round(sum((11 - erank) / log2(erank + 1)), 6) AS idcg
        |  FROM exact GROUP BY 1)
        |SELECT p.query_id, CAST(p.n_hit AS BIGINT) AS n_hit,
        |       p.n_hit / 10.0 AS recall, round(p.dcg / i.idcg, 6) AS ndcg
        |FROM perq p JOIN ideal i ON i.query_id = p.query_id
        |ORDER BY p.query_id""".stripMargin,
    // one broadcast stats row (rounded 6 dp) scales every row; the
    // per-row chains are 2-3 IEEE ops — bit-identical, unrounded
    "feat_transform" ->
      """WITH li AS (
        |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |         CAST(l_extendedprice AS DOUBLE) AS price, l_returnflag AS rf
        |  FROM lineitem WHERE l_orderkey % 10 = 0),
        |st AS (SELECT round(avg(price), 6) AS mu,
        |              round(stddev_samp(price), 6) AS sigma,
        |              min(price) AS lo, max(price) AS hi FROM li)
        |SELECT l_orderkey, l_linenumber,
        |       (price - mu) / sigma AS price_z,
        |       (price - lo) / (hi - lo) AS price_minmax,
        |       CAST(least(greatest(floor((price - lo) / ((hi - lo) / 10.0)), 0), 9) AS BIGINT)
        |         AS price_bucket,
        |       CAST(CASE WHEN rf = 'R' THEN 1 ELSE 0 END AS BIGINT) AS rf_r,
        |       CAST(CASE WHEN rf = 'A' THEN 1 ELSE 0 END AS BIGINT) AS rf_a,
        |       CAST(CASE WHEN rf = 'N' THEN 1 ELSE 0 END AS BIGINT) AS rf_n
        |FROM li CROSS JOIN st ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // islands: start > running max(end) over the identical
    // (start, end, ok, ln) tie chain; prefix max/sum are
    // set-functions so the engines agree row for row
    "interval_merge" ->
      """WITH iv AS (
        |  SELECT l_suppkey AS supp, CAST(l_shipdate AS DATE) AS s,
        |         CAST(l_shipdate AS DATE) + CAST(l_quantity AS INT) AS e,
        |         l_orderkey AS ok, CAST(l_linenumber AS BIGINT) AS ln
        |  FROM lineitem),
        |f AS (SELECT *, CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
        |                     THEN 1 ELSE 0 END AS is_new
        |      FROM iv WINDOW w AS (PARTITION BY supp ORDER BY s, e, ok, ln
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |g AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY supp
        |        ORDER BY s, e, ok, ln
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
        |      FROM f)
        |SELECT CAST(supp AS BIGINT) AS supp, island,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(min(s) AS TIMESTAMP) AS span_start,
        |       CAST(max(e) AS TIMESTAMP) AS span_end
        |FROM g GROUP BY 1, 2 ORDER BY supp, island""".stripMargin,
    // full 7-row frames only → the median is the exact middle
    // element; daily revenue rounds to 2 dp before the window
    "ts_rolling_median" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY 1),
        |w AS (SELECT day, rev,
        |        row_number() OVER (ORDER BY day) AS rn,
        |        median(rev) OVER (ORDER BY day
        |          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
        |      FROM daily)
        |SELECT CAST(day AS TIMESTAMP) AS day, rev, med7
        |FROM w WHERE rn >= 7 ORDER BY day""".stripMargin,
    // cumsum − prefix min; windowed sums round 4 dp, the prefix min
    // and subtraction then run on identical rounded inputs
    "ts_cusum" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         round(sum(value), 4) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, round(avg(x), 6) AS mu FROM daily GROUP BY 1),
        |c AS (SELECT d.event_type, d.day, d.x,
        |        round(sum(d.x - m.mu) OVER (PARTITION BY d.event_type
        |          ORDER BY d.day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS s
        |      FROM daily d JOIN m ON m.event_type = d.event_type),
        |k AS (SELECT *, round(s - min(s) OVER (PARTITION BY event_type
        |        ORDER BY day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cusum
        |      FROM c)
        |SELECT event_type, CAST(day AS TIMESTAMP) AS day, x, cusum,
        |       cusum > 50.0 AS is_shift
        |FROM k ORDER BY event_type, day""".stripMargin,
    "text_zipf" -> textZipfSql,
    // deterministic mod-97 corruption rule recomputed from the clean
    // table: quarantined rows parse to NULL, the rest sum exactly
    "csv_permissive" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(*) FILTER (WHERE o_orderkey % 97 = 0) AS BIGINT)
        |         AS n_corrupt,
        |       CAST(count(*) FILTER (WHERE o_orderkey % 97 <> 0) AS BIGINT)
        |         AS n_parsed,
        |       round(sum(o_totalprice) FILTER (WHERE o_orderkey % 97 <> 0), 2)
        |         AS sum_parsed
        |FROM orders""".stripMargin,
    "zonemap_build" ->
      """SELECT CAST(floor(l_orderkey / 6000.0) AS BIGINT) AS zone,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
        |       CAST(min(l_shipdate) AS TIMESTAMP) AS min_ship,
        |       CAST(max(l_shipdate) AS TIMESTAMP) AS max_ship,
        |       min(l_extendedprice) AS min_price,
        |       max(l_extendedprice) AS max_price,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS ndv_supp
        |FROM lineitem GROUP BY 1 ORDER BY zone""".stripMargin,
    // 1000-bin equi-width histogram quantile (right-edge rule) next
    // to the exact interpolated percentile; bin edges from one
    // q20-style quantified gate: the oracle replays group sizes with
    // TRUE, so the hash greens iff every approx_percentile estimate
    // re-ranks within 0.5% of its requested rank
    "quantile_approx" ->
      """SELECT l_returnflag, p.p, CAST(count(*) AS BIGINT) AS n,
        |       TRUE AS within_tol
        |FROM lineitem
        |CROSS JOIN (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS p) p
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // min/max row, per-row chains ≤ 3 IEEE ops
    "quantile_hist" ->
      """WITH x AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem),
        |st AS (SELECT min(x) AS lo, max(x) AS hi,
        |              CAST(count(*) AS BIGINT) AS n FROM x),
        |b AS (SELECT CAST(least(floor((x - lo) / ((hi - lo) / 1000.0)), 999)
        |               AS BIGINT) AS bin
        |      FROM x CROSS JOIN st),
        |hist AS (SELECT bin, count(*) AS c FROM b GROUP BY 1),
        |cum AS (SELECT bin, CAST(sum(c) OVER (ORDER BY bin
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS cum FROM hist),
        |qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
        |est AS (SELECT q, min(bin) AS qbin
        |        FROM qs JOIN cum ON cum >= q * (SELECT n FROM st) GROUP BY q),
        |ex AS (SELECT 0.5 AS q, quantile_cont(x, 0.5) AS exact FROM x
        |       UNION ALL SELECT 0.9, quantile_cont(x, 0.9) FROM x
        |       UNION ALL SELECT 0.99, quantile_cont(x, 0.99) FROM x),
        |joined AS (SELECT e.q, est.qbin,
        |             (SELECT lo FROM st) + (est.qbin + 1) *
        |               (((SELECT hi FROM st) - (SELECT lo FROM st)) / 1000.0)
        |               AS est,
        |             e.exact
        |           FROM est JOIN ex e ON e.q = est.q)
        |SELECT q, qbin, est, exact, round(est - exact, 6) AS err
        |FROM joined ORDER BY q""".stripMargin,
    // exact ranking over the labeled corpus + integer votes; argmax
    // by (votes DESC, label) replays the tie rule
    "knn_classify" ->
      """WITH nn AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
        |         round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                      CAST(q.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM embeddings c JOIN embeddings q
        |    ON q.vec_id < 8 AND c.vec_id >= 8
        |), ranked AS (
        |  SELECT query_id, nbr_id,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY cosine DESC, nbr_id) AS rank
        |  FROM nn
        |), votes AS (
        |  SELECT query_id, nbr_id % 5 AS label, count(*) AS votes
        |  FROM ranked WHERE rank <= 10 GROUP BY 1, 2
        |), best AS (
        |  SELECT query_id, label, votes,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY votes DESC, label) AS rk
        |  FROM votes)
        |SELECT query_id, label AS pred_label, CAST(votes AS BIGINT) AS votes
        |FROM best WHERE rk = 1 ORDER BY query_id""".stripMargin,
    // same und base as graph_triangles; wedge pivots weighted 1/ln(deg)
    // with the deg<=64 hub guard replayed; anti-join drops existing
    // edges; scores round to 6 dp BEFORE the top-50 ranking
    "graph_adamic_adar" ->
      """WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_linenumber <= 3),
        |und AS (SELECT DISTINCT x.p AS u, y.p AS v
        |        FROM ps x JOIN ps y ON x.o = y.o AND x.p < y.p),
        |adj AS (SELECT u AS z, v AS x FROM und
        |        UNION ALL SELECT v, u FROM und),
        |deg AS (SELECT z, count(*) AS d FROM adj GROUP BY 1),
        |piv AS (SELECT z, 1.0 / ln(d) AS w FROM deg WHERE d BETWEEN 2 AND 64),
        |wa AS (SELECT a.z, a.x, p.w FROM adj a JOIN piv p USING (z)),
        |wedge AS (SELECT a.x AS x, b.x AS y, a.w AS w
        |          FROM wa a JOIN wa b ON a.z = b.z AND a.x < b.x),
        |np AS (SELECT wedge.* FROM wedge
        |       ANTI JOIN und ON wedge.x = und.u AND wedge.y = und.v),
        |sc AS (SELECT x, y, round(sum(w), 6) AS score FROM np GROUP BY 1, 2)
        |SELECT CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y, score
        |FROM sc ORDER BY score DESC, x, y LIMIT 50""".stripMargin,
    // adamic-adar's replay with the unweighted pivot count and the
    // full-degree denominator; one int division -> round 6 -> rank
    "graph_jaccard" ->
      """WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_linenumber <= 3),
        |und AS (SELECT DISTINCT x.p AS u, y.p AS v
        |        FROM ps x JOIN ps y ON x.o = y.o AND x.p < y.p),
        |adj AS (SELECT u AS z, v AS x FROM und
        |        UNION ALL SELECT v, u FROM und),
        |deg AS (SELECT z, count(*) AS d FROM adj GROUP BY 1),
        |piv AS (SELECT z FROM deg WHERE d BETWEEN 2 AND 64),
        |pa AS (SELECT a.z, a.x FROM adj a SEMI JOIN piv USING (z)),
        |wedge AS (SELECT a.x AS x, b.x AS y
        |          FROM pa a JOIN pa b ON a.z = b.z AND a.x < b.x),
        |np AS (SELECT wedge.* FROM wedge
        |       ANTI JOIN und ON wedge.x = und.u AND wedge.y = und.v),
        |i AS (SELECT x, y, count(*) AS i FROM np GROUP BY 1, 2),
        |sc AS (SELECT i.x, i.y,
        |         round(CAST(i.i AS DOUBLE) / (dx.d + dy.d - i.i), 6) AS score
        |       FROM i JOIN deg dx ON dx.z = i.x JOIN deg dy ON dy.z = i.y)
        |SELECT CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y, score
        |FROM sc ORDER BY score DESC, x, y LIMIT 50""".stripMargin,
    "ts_anomaly" ->
      """WITH r AS (
        |  SELECT user_id, event_id, value,
        |         count(value) OVER w AS n,
        |         round(avg(value) OVER w, 6) AS mu,
        |         round(stddev_samp(value) OVER w, 6) AS sd
        |  FROM events WHERE user_id < 100
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT user_id, event_id, value,
        |        CASE WHEN n = 20 AND sd > 0
        |             THEN round((value - mu) / sd, 6) END AS z
        |      FROM r)
        |SELECT user_id, event_id, value, z,
        |       coalesce(abs(z) > 3.0, false) AS is_anomaly
        |FROM z ORDER BY user_id, event_id""".stripMargin,
    "graph_kcore" -> graphKcoreSql,
    "graph_lpa" -> graphLpaSql,
    "graph_modularity" -> graphModularitySql,
    "graph_bfs" -> graphBfsSql,
    "graph_ppr" -> graphPprSql,
    "basket_rules" -> basketRulesSql,
    "er_fuzzy" -> erFuzzySql,
    "er_golden" -> erGoldenSql,
    "stats_bootstrap" -> statsBootstrapSql,
    "stats_regression" -> statsRegressionSql,
    "stats_corr" -> statsCorrSql,
    "schema_diff" -> schemaDiffSql,
    "load_evolution_roundtrip" ->
      """SELECT o_orderkey, o_totalprice,
        |       CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_orderstatus END
        |         AS o_orderstatus
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "zorder_roundtrip" -> zorderRoundtripSql,
    "simsearch_mmr" -> simsearchMmrSql,
    "text_bpe" -> textBpeSql,
    "text_bpe_encode" -> textBpeEncodeSql,
    // classification by VALUE comparison — the engine classifies by
    // row-hash equality, so the gate proves hash-equal <=> values-equal
    "table_diff" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |n AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         CASE WHEN o_orderkey % 89 = 0 THEN round(o_totalprice + 1.0, 2)
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM o WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
        |  FROM o WHERE o_orderkey % 101 = 0)
        |SELECT CAST(coalesce(o.o_orderkey, n.o_orderkey) AS BIGINT) AS o_orderkey,
        |       CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |            WHEN n.o_orderkey IS NULL THEN 'deleted'
        |            WHEN o.o_orderstatus <> n.o_orderstatus
        |              OR o.o_totalprice <> n.o_totalprice THEN 'changed' END AS change_type
        |FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
        |WHERE (CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |            WHEN n.o_orderkey IS NULL THEN 'deleted'
        |            WHEN o.o_orderstatus <> n.o_orderstatus
        |              OR o.o_totalprice <> n.o_totalprice THEN 'changed' END) IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
    "q54_heavy_hitters" ->
      """WITH c AS (SELECT CAST(l_partkey AS BIGINT) AS l_partkey, count(*) AS n
        |           FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c),
        |r AS (SELECT l_partkey, n,
        |        row_number() OVER (ORDER BY n DESC, l_partkey) AS rank FROM c)
        |SELECT CAST(rank AS INT) AS rank, l_partkey, n,
        |       round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
        |FROM r, t WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // median and MAD round to 6 dp BEFORE the 4.4478*mad threshold on
    // both engines, so the outlier count compares exact doubles
    "q55_mad" ->
      """WITH e AS (SELECT event_type, CAST(value AS DOUBLE) AS x FROM events),
        |m AS (SELECT event_type, round(quantile_cont(x, 0.5), 6) AS med
        |      FROM e GROUP BY 1),
        |d AS (SELECT e.event_type, m.med, abs(e.x - m.med) AS adev
        |      FROM e JOIN m USING (event_type)),
        |md AS (SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS mad
        |       FROM d GROUP BY 1)
        |SELECT d.event_type, min(d.med) AS med, min(md.mad) AS mad,
        |       count(*) AS n,
        |       CAST(sum(CASE WHEN d.adev > 4.4478 * md.mad THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_outliers
        |FROM d JOIN md USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    // integer-count products feed ln the same exact double on both
    // engines; round 6 for the libm last-ulp (the lmscore convention)
    "text_pmi" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS ts FROM documents),
         |po AS (SELECT doc_id, unnest(generate_series(1, len(ts) - 1)) AS i, ts FROM t),
         |pr AS (SELECT ts[CAST(i AS INT)] AS w1, ts[CAST(i + 1 AS INT)] AS w2 FROM po),
         |pc AS (SELECT w1, w2, count(*) AS n_ab FROM pr GROUP BY 1, 2),
         |na AS (SELECT w1, CAST(sum(n_ab) AS BIGINT) AS n_a FROM pc GROUP BY 1),
         |nb AS (SELECT w2, CAST(sum(n_ab) AS BIGINT) AS n_b FROM pc GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n_total FROM pc)
         |SELECT pc.w1, pc.w2, pc.n_ab,
         |       round(ln((CAST(pc.n_ab AS DOUBLE) * CAST(n_total AS DOUBLE)) /
         |                (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))), 6) AS pmi
         |FROM pc JOIN na USING (w1) JOIN nb USING (w2) CROSS JOIN tot
         |WHERE pc.n_ab >= 5 ORDER BY w1, w2""".stripMargin,
    // per-bucket sums round to 6 dp BEFORE the blend on both engines,
    // so the interpolation arithmetic is an exact per-row replay
    "ts_interp" ->
      """WITH e AS (
        |  SELECT user_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) // 86400 * 86400 AS b, value
        |  FROM events WHERE user_id < 40),
        |a AS (SELECT user_id, b, round(sum(value), 6) AS v FROM e GROUP BY 1, 2),
        |s AS (SELECT user_id, min(b) AS lo, max(b) AS hi FROM a GROUP BY 1),
        |g AS (SELECT user_id, unnest(generate_series(lo, hi, 86400)) AS b FROM s),
        |j AS (SELECT g.user_id, g.b, a.v,
        |        last_value(a.v IGNORE NULLS) OVER wb AS pv,
        |        last_value(CASE WHEN a.v IS NOT NULL THEN g.b END IGNORE NULLS)
        |          OVER wb AS pb,
        |        first_value(a.v IGNORE NULLS) OVER wf AS nv,
        |        first_value(CASE WHEN a.v IS NOT NULL THEN g.b END IGNORE NULLS)
        |          OVER wf AS nb
        |      FROM g LEFT JOIN a USING (user_id, b)
        |      WINDOW wb AS (PARTITION BY g.user_id ORDER BY g.b
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |      wf AS (PARTITION BY g.user_id ORDER BY g.b
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, make_timestamp(b * 1000000) AS bucket_ts,
        |       round(CASE WHEN v IS NOT NULL THEN v
        |                  WHEN pv IS NULL THEN nv
        |                  WHEN nv IS NULL THEN pv
        |                  ELSE pv + (nv - pv) *
        |                    (CAST(b - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE)) END,
        |             6) AS value_interp,
        |       v IS NOT NULL AS is_observed
        |FROM j ORDER BY user_id, b""".stripMargin,
    "ts_ewma" -> tsEwmaSql,
    "ts_holt" -> tsHoltSql,
    "ts_acf" -> tsAcfSql,
    "q51_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
        |f AS (SELECT user_id, event_id, us, value,
        |        CASE WHEN lag(us) OVER w IS NULL
        |               OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS nw
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |g AS (SELECT user_id, us, value,
        |        sum(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |      FROM f)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |       count(*) AS n_events,
        |       make_timestamp(min(us)) AS start_ts,
        |       make_timestamp(max(us)) AS end_ts,
        |       round(sum(value), 4) AS sum_value
        |FROM g GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "q52_transitions" ->
      """WITH s AS (SELECT user_id, event_type AS src,
        |             lead(event_type) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS dst
        |           FROM events),
        |c AS (SELECT src, dst, count(*) AS n FROM s
        |      WHERE dst IS NOT NULL GROUP BY 1, 2)
        |SELECT src, dst, n,
        |       round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE),
        |             6) AS p
        |FROM c ORDER BY src, dst""".stripMargin,
    // chi-square in DOUBLE factor-by-factor, same left-assoc order as
    // the engine: each factor is an exact integer-valued double, and
    // double products round identically cross-engine — int products
    // would overflow int64 at ~55k users/arm. Per-user totals round
    // to 4 dp before avg/var (round-before-use)
    "q53_abtest" ->
      """WITH u AS (SELECT user_id,
        |             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
        |             round(sum(value), 4) AS total
        |           FROM events GROUP BY 1),
        |v AS (SELECT user_id % 2 AS variant, conv, total FROM u),
        |s AS (SELECT variant, count(*) AS n, CAST(sum(conv) AS BIGINT) AS nc,
        |             avg(total) AS mean, var_samp(total) AS var
        |      FROM v GROUP BY 1),
        |a AS (SELECT n AS n_a, nc AS conv_a, mean AS mean_a, var AS var_a
        |      FROM s WHERE variant = 0),
        |b AS (SELECT n AS n_b, nc AS conv_b, mean AS mean_b, var AS var_b
        |      FROM s WHERE variant = 1),
        |f AS (SELECT n_a, conv_a, n_b, conv_b, mean_a, mean_b, var_a, var_b,
        |        CAST(conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a) AS DOUBLE) AS d,
        |        CAST(conv_a + conv_b AS DOUBLE) *
        |          CAST(n_a + n_b - conv_a - conv_b AS DOUBLE) *
        |          CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) AS denom
        |      FROM a, b)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  round(CAST(n_a + n_b AS DOUBLE) * d * d / denom, 6) AS chi2,
        |  round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 6) AS t_welch
        |FROM f""".stripMargin,
    "text_ppl_buckets" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($duckToks) AS tok FROM documents
         |), cnt AS (
         |  SELECT tok, count(*) AS c FROM tok GROUP BY tok
         |), tot AS (
         |  SELECT sum(c) AS total FROM cnt
         |), lp AS (
         |  SELECT tok, ln(CAST(c AS DOUBLE) / total) AS logp FROM cnt, tot
         |), sc AS (
         |  SELECT doc_id, round(avg(logp), 4) AS lm_score
         |  FROM tok JOIN lp USING (tok) GROUP BY doc_id)
         |SELECT d.doc_id, d.lang, s.lm_score,
         |       CAST(ntile(10) OVER (PARTITION BY d.lang
         |         ORDER BY s.lm_score, d.doc_id) AS INT) AS bucket
         |FROM sc s JOIN documents d USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // same order-independent checksum contract as integrity_checksum,
    // computed over the SOURCE table: compaction must be
    // content-preserving whatever the file layout
    "compact_roundtrip" ->
      """SELECT count(*) AS n_rows, bit_xor(h) AS xor_hash,
        |       min(h) AS min_hash, max(h) AS max_hash
        |FROM (SELECT ('0x' || substr(md5(concat_ws('|',
        |        coalesce(CAST(doc_id AS VARCHAR), chr(0) || 'null'),
        |        coalesce(lang, chr(0) || 'null'),
        |        coalesce(CAST(n_chars AS VARCHAR), chr(0) || 'null'))), 1, 15))::BIGINT AS h
        |      FROM documents)""".stripMargin,
    // Manifest-log family: time travel / data skipping / schema
    // evolution / incremental view are all STORAGE mechanisms — each
    // oracle recomputes the same answer from the raw events table, so
    // a hash match proves the mechanism is result-invisible.
    "manifest_timetravel" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM events WHERE event_id % 3 <= 1
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_skipping" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-11 00:00:00'
        |  AND ts <= TIMESTAMP '2024-01-15 23:59:59.999999'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_sql" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-11 00:00:00'
        |  AND ts <= TIMESTAMP '2024-01-15 23:59:59.999999'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_point" ->
      """SELECT event_id, event_type, round(value, 4) AS value_r
        |FROM events
        |WHERE event_id = (SELECT min(event_id) + 100 FROM events)
        |ORDER BY event_id""".stripMargin,
    "manifest_evolution" ->
      """SELECT CASE WHEN event_id % 2 = 1 THEN event_type
        |            ELSE '_pre_evolution' END AS etype,
        |       count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "manifest_incr_agg" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value,
        |       round(min(value), 4) AS min_value,
        |       round(max(value), 4) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_changefeed" ->
      """SELECT * FROM (
        |  SELECT 'insert' AS change_type, event_type AS etype, count(*) AS cnt,
        |         CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |  FROM events WHERE event_id % 4 = 2 GROUP BY event_type
        |  UNION ALL
        |  SELECT 'delete', '_del', count(*), CAST(NULL AS DOUBLE)
        |  FROM events WHERE event_id % 8 = 1
        |) ORDER BY change_type, etype""".stripMargin,
    "manifest_optimize" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value,
        |       (SELECT count(*) FROM events) AS total_rows
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_cluster" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-11 00:00:00'
        |  AND ts <= TIMESTAMP '2024-01-15 23:59:59.999999'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_cf_view" ->
      """SELECT CAST(user_id AS BIGINT) % 100 AS user_bucket, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_sink_manifest" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_stream_source" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_version_asof" ->
      """SELECT * FROM (
        |  SELECT 'head' AS section, event_type, count(*) AS cnt,
        |         CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY event_type
        |  UNION ALL
        |  SELECT 'ts_fence', event_type, count(*),
        |         CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
        |  FROM events WHERE event_id % 3 <= 1 GROUP BY event_type
        |  UNION ALL
        |  SELECT 'v2', event_type, count(*),
        |         CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
        |  FROM events WHERE event_id % 3 <= 1 GROUP BY event_type
        |) ORDER BY section, event_type""".stripMargin,
    "manifest_insert_sql" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_maint_sql" ->
      """SELECT * FROM (
        |  SELECT 'set_retain' AS action, CAST(3 AS BIGINT) AS n
        |  UNION ALL SELECT 'optimize', CAST(4 AS BIGINT)
        |  UNION ALL SELECT 'compact', CAST(2 AS BIGINT)
        |  UNION ALL SELECT 'vacuum', CAST(6 AS BIGINT)
        |  UNION ALL SELECT 'rows',
        |    (SELECT count(*) FROM events WHERE event_id % 16 <> 1)
        |) ORDER BY action""".stripMargin,
    "manifest_dml_sql" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT event_type,
        |         CASE WHEN event_type = 'click' THEN value * 2 ELSE value END AS value
        |  FROM events WHERE event_id % 5 <> 2
        |) GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_drop_sql" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_rename_sql" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(round(sum(CASE WHEN event_type = 'click'
        |                           THEN CAST(value * 2 AS DECIMAL(18,6))
        |                           ELSE CAST(value AS DECIMAL(18,6)) END), 4)
        |            AS DOUBLE) AS sum_amount
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_widen_sql" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(sum(CASE WHEN event_id % 2 = 0
        |                     THEN CAST(floor(value * 100) AS BIGINT)
        |                     ELSE CAST(floor(value * 100) AS BIGINT)
        |                          + 5000000000
        |                END) AS BIGINT) AS sum_cents,
        |       CAST(round(sum(CASE WHEN event_id % 2 = 0
        |                           -- mirror the table's write path: stored
        |                           -- as DECIMAL(10,2), widened losslessly
        |                           THEN CAST(CAST(value AS DECIMAL(10,2))
        |                                     AS DECIMAL(14,4))
        |                           ELSE CAST(value * 1000 AS DECIMAL(14,4))
        |                      END), 4) AS DOUBLE) AS sum_d
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_alter_sql" ->
      """SELECT event_type, count(*) AS cnt,
        |       count(CASE WHEN event_id % 2 = 1 THEN value END) AS with_value,
        |       CAST(round(sum(CASE WHEN event_id % 2 = 1
        |                           THEN CAST(value AS DECIMAL(18,6)) END), 4)
        |            AS DOUBLE) AS sum_value,
        |       count(CASE WHEN event_id % 2 = 1 THEN 'new' END) AS with_note,
        |       count(CASE WHEN event_id % 2 = 1 AND event_id % 4 = 1
        |                  THEN 1 END) AS n_flagged
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_named_sql" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT event_type,
        |         CASE WHEN event_id % 5 <> 2 AND event_id % 3 = 0 THEN value * 3
        |              WHEN event_id % 5 <> 2 AND event_type = 'click' THEN value * 2
        |              ELSE value END AS value
        |  FROM events
        |  WHERE event_id % 5 <> 2 OR event_id % 3 = 0
        |) GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_merge_sql" ->
      """WITH t AS (SELECT event_id, event_type, value FROM events WHERE event_id % 3 = 0),
        |     s AS (SELECT event_id, event_type, value FROM events WHERE event_id % 4 = 0),
        |     merged AS (
        |       SELECT t.event_id, t.event_type,
        |              CASE WHEN s.event_id IS NOT NULL THEN s.value * 2
        |                   ELSE t.value END AS value
        |       FROM t LEFT JOIN s ON t.event_id = s.event_id
        |       WHERE s.event_id IS NULL OR s.event_id % 24 <> 0
        |       UNION ALL
        |       SELECT s.event_id, s.event_type, s.value
        |       FROM s WHERE s.event_id NOT IN (SELECT event_id FROM t)
        |     )
        |SELECT event_type, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM merged GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_changes_sql" ->
      """WITH e AS (SELECT event_id, event_type, value FROM events),
        |     pre AS (SELECT event_id, event_type, value FROM e WHERE event_id % 4 = 0),
        |     post AS (SELECT event_id, event_type,
        |                     CASE WHEN event_id % 8 = 0 THEN value * 2
        |                          ELSE value END AS value
        |              FROM e WHERE event_id % 4 = 0),
        |     feed AS (
        |       SELECT 'delete' AS change_type, event_type, value FROM pre
        |       UNION ALL
        |       SELECT 'insert', event_type, value FROM post
        |       UNION ALL
        |       SELECT 'insert', event_type, value FROM e WHERE event_id % 4 = 2
        |     )
        |SELECT change_type, event_type AS etype, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM feed GROUP BY 1, 2 ORDER BY change_type, etype""".stripMargin,
    "manifest_merge_evolve" ->
      """WITH t AS (SELECT event_id, event_type FROM events WHERE event_id % 3 = 0),
        |     s AS (SELECT event_id, event_type, value FROM events WHERE event_id % 4 = 0),
        |     merged AS (
        |       SELECT t.event_id,
        |              CASE WHEN s.event_id IS NOT NULL THEN s.event_type
        |                   ELSE t.event_type END AS event_type,
        |              s.value AS value
        |       FROM t LEFT JOIN s ON t.event_id = s.event_id
        |       UNION ALL
        |       SELECT s.event_id, s.event_type, s.value
        |       FROM s WHERE s.event_id NOT IN (SELECT event_id FROM t)
        |     )
        |SELECT event_type, count(*) AS cnt, count(value) AS with_value,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM merged GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_nested_update" ->
      """SELECT CASE WHEN event_id % 10 = 0 THEN 'boosted' ELSE event_type END AS kind,
        |       count(*) AS cnt,
        |       CAST(round(sum(CAST(CASE WHEN event_id % 10 = 0 THEN value * 2
        |                                ELSE value END AS DECIMAL(18,6))), 4) AS DOUBLE)
        |         AS sum_amount
        |FROM events WHERE event_id % 5 = 0
        |GROUP BY 1 ORDER BY kind""".stripMargin,
    "manifest_evolve_sql" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT CASE WHEN event_id % 2 = 1 THEN event_type
        |              ELSE 'backfilled' END AS event_type,
        |         value
        |  FROM events
        |) GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_dml_view" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(round(sum(CAST(
        |         CASE WHEN event_type = 'view' THEN value * 2 ELSE value END
        |         AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_v
        |FROM events WHERE event_id % 9 <> 4
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "manifest_history_sql" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'append',  1, 1, 0),
        |  (CAST(2 AS BIGINT), 'append',  2, 1, 0),
        |  (CAST(3 AS BIGINT), 'delete',  3, 1, 0),
        |  (CAST(4 AS BIGINT), 'rewrite', 1, 1, 3),
        |  (CAST(5 AS BIGINT), 'dml',     1, 1, 1)
        |) AS t(version, kind, segments, added, dropped)
        |ORDER BY version""".stripMargin,
    "manifest_nested_part" ->
      """SELECT CAST(event_id % 2 AS INT) AS y,
        |       CAST(EXTRACT(day FROM ts) % 3 AS INT) AS m,
        |       count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "manifest_retract_view" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM events WHERE event_id % 7 <> 3
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "simsearch_pq_adc" -> simsearchPqAdcSql,
    "simsearch_ivfpq" -> simsearchIvfPqSql,
    "ts_decompose" -> tsDecomposeSql,
    "cdc_apply" -> cdcApplySql,
    "stream_cdc" -> cdcApplySql,
    "q56_topk_per_group" -> q56TopkPerGroupSql,
    "pareto_front" -> paretoFrontSql,
    "text_postings" -> textPostingsSql,
    "emb_pq" -> embPqSql,
    "ts_gapfill" ->
      """WITH e AS (
        |  SELECT user_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) // 3600 * 3600 AS b, value
        |  FROM events WHERE event_type = 'purchase' AND user_id < 40),
        |a AS (SELECT user_id, b, sum(value) AS v FROM e GROUP BY 1, 2),
        |s AS (SELECT user_id, min(b) AS lo, max(b) AS hi FROM a GROUP BY 1),
        |g AS (SELECT user_id, unnest(generate_series(lo, hi, 3600)) AS b FROM s),
        |j AS (SELECT g.user_id, g.b, a.v FROM g LEFT JOIN a USING (user_id, b))
        |SELECT user_id, make_timestamp(b * 1000000) AS bucket_ts,
        |       round(last_value(v IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY b), 4) AS value_filled,
        |       v IS NOT NULL AS is_observed
        |FROM j ORDER BY user_id, b""".stripMargin,
    "text_vocab_ids" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS ts FROM documents),
         |tok AS (SELECT doc_id, unnest(ts) AS token FROM t),
         |freq AS (SELECT token, count(*) AS freq FROM tok GROUP BY token),
         |vocab AS (SELECT token,
         |                 row_number() OVER (ORDER BY freq DESC, token ASC) AS id
         |          FROM freq ORDER BY freq DESC, token ASC LIMIT 20),
         |pos AS (SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS p FROM t),
         |ids AS (SELECT x.doc_id, x.p, coalesce(v.id, 0) AS tid
         |        FROM (SELECT doc_id, p, ts[CAST(p AS INT)] AS token FROM pos) x
         |        LEFT JOIN vocab v USING (token))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |       CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |       md5(string_agg(CAST(tid AS VARCHAR), ',' ORDER BY p)) AS ids_md5
         |FROM ids GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_packseq" ->
      // same vocab/ids CTEs as text_vocab_ids, then the concat-and-
      // chunk replay: a global-position window prefix sum, one EOS(-1)
      // row appended per doc, floor-div into 128-id sequences
      s"""WITH t AS (SELECT doc_id, $duckToks AS ts FROM documents),
         |tok AS (SELECT doc_id, unnest(ts) AS token FROM t),
         |freq AS (SELECT token, count(*) AS freq FROM tok GROUP BY token),
         |vocab AS (SELECT token,
         |                 row_number() OVER (ORDER BY freq DESC, token ASC) AS id
         |          FROM freq ORDER BY freq DESC, token ASC LIMIT 20),
         |pos AS (SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS p FROM t),
         |ids AS (SELECT x.doc_id, x.p, coalesce(v.id, 0) AS tid
         |        FROM (SELECT doc_id, p, ts[CAST(p AS INT)] AS token FROM pos) x
         |        LEFT JOIN vocab v USING (token)),
         |-- dl derives from t (len(ts) + 1), NOT from counting ids rows:
         |-- a zero-token doc has no ids rows but still emits its EOS(-1)
         |-- in the packed stream, and dropping it would shift every
         |-- subsequent global offset
         |dl AS (SELECT doc_id, len(ts) + 1 AS len FROM t),
         |off AS (SELECT doc_id, len,
         |          CAST(coalesce(sum(len) OVER (ORDER BY doc_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pre
         |        FROM dl),
         |g AS (SELECT o.pre + i.p - 1 AS gpos, i.tid
         |      FROM ids i JOIN off o USING (doc_id)
         |      UNION ALL
         |      SELECT pre + len - 1, -1 FROM off)
         |SELECT CAST(gpos // 128 AS BIGINT) AS seq_idx, count(*) AS n_tokens,
         |       md5(string_agg(CAST(tid AS VARCHAR), ',' ORDER BY gpos)) AS tokens_md5
         |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_pardedup" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS ts FROM documents),
         |c AS (SELECT doc_id, ts,
         |             unnest(generate_series(1, greatest(len(ts), 1), 16)) AS st
         |      FROM t),
         |s AS (SELECT doc_id, CAST((st - 1) // 16 AS INT) AS idx,
         |             array_to_string(ts[CAST(st AS INT):CAST(st + 15 AS INT)], ' ') AS seg
         |      FROM c),
         |k AS (SELECT doc_id, idx, seg,
         |             row_number() OVER (PARTITION BY seg ORDER BY doc_id, idx) AS rn
         |      FROM s)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
         |       md5(string_agg(seg, ' ' ORDER BY idx)) AS text_md5
         |FROM k WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id AS media_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       CAST(greatest(ceil(octet_length(encode(text)) / 4096.0), 1) AS BIGINT) AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin,
    "multimodal_decode" ->
      """WITH b AS (
        |  SELECT doc_id AS media_id,
        |         octet_length(encode(text)) AS n,
        |         list_aggregate(list_transform(string_split(text, ''),
        |                                       x -> unicode(x)), 'sum') AS s
        |  FROM documents)
        |SELECT media_id,
        |       CAST(64 + n % 512 AS INT) AS width,
        |       CAST(64 + (n // 7) % 512 AS INT) AS height,
        |       CAST(3 AS INT) AS channels,
        |       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 255.0, 6) AS mean_luma
        |FROM b ORDER BY media_id""".stripMargin,
    "multimodal_resize" ->
      """WITH px AS (
        |  SELECT doc_id AS media_id, md5(text) AS hx FROM documents
        |), p AS (
        |  SELECT media_id, g.i % 4 AS x, g.i // 4 AS y,
        |         ('0x' || substr(hx, CAST(g.i * 2 + 1 AS INT), 2))::BIGINT AS v
        |  FROM px, generate_series(0, 15) g(i))
        |SELECT media_id, CAST(y // 2 AS INT) AS by, CAST(x // 2 AS INT) AS bx,
        |       CAST(sum(v) AS DOUBLE) / 4.0 AS pooled
        |FROM p GROUP BY 1, 2, 3 ORDER BY media_id, by, bx""".stripMargin,
    // INDEPENDENT naive pairwise formulation (the Spark side bands);
    // hashes/xors are exact ints so no float discipline needed
    "multimodal_phash" ->
      """WITH px AS (
        |  SELECT doc_id AS media_id, md5(text) AS hx FROM documents
        |), p AS (
        |  SELECT media_id, g.i AS i,
        |         ('0x' || substr(hx, CAST(g.i * 2 + 1 AS INT), 2))::BIGINT AS v
        |  FROM px, generate_series(0, 15) g(i)
        |), m AS (
        |  SELECT media_id, CAST(sum(v) AS DOUBLE) / 16.0 AS mean FROM p GROUP BY 1
        |), h AS (
        |  SELECT p.media_id,
        |         CAST(sum(CASE WHEN v > mean THEN (1::BIGINT << CAST(i AS INT))
        |                       ELSE 0 END) AS BIGINT) AS ph
        |  FROM p JOIN m ON m.media_id = p.media_id GROUP BY 1)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |       CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming
        |FROM h a JOIN h b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.ph, b.ph)) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    "multimodal_decode_real" ->
      """WITH px AS (
        |  SELECT doc_id AS media_id, md5(text) AS hx FROM documents
        |), s AS (
        |  SELECT media_id,
        |         list_aggregate(list_transform(generate_series(0, 15),
        |           i -> ('0x' || substr(hx, CAST(i * 2 + 1 AS INT), 2))::BIGINT),
        |           'sum') AS sum_px
        |  FROM px)
        |SELECT media_id,
        |       CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
        |       CAST(1 AS INT) AS channels,
        |       round(CAST(sum_px AS DOUBLE) / 16 / 255.0, 6) AS mean_luma
        |FROM s ORDER BY media_id""".stripMargin,
    "multimodal_frames" ->
      """WITH b AS (
        |  SELECT doc_id AS media_id, text AS p,
        |         CAST(greatest(ceil(length(text) / 4096.0), 1) AS INT) AS nf
        |  FROM documents
        |), f AS (
        |  SELECT media_id, p,
        |         CAST(unnest(generate_series(0, nf - 1, 10)) AS INT) AS frame_idx
        |  FROM b)
        |SELECT media_id, frame_idx,
        |       CAST(length(substring(p, frame_idx * 4096 + 1, 4096)) AS INT) AS n_frame_bytes,
        |       md5(substring(p, frame_idx * 4096 + 1, 4096)) AS frame_md5
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,
    "stream_window" -> streamWindowSql,
    // same batch-equivalence oracle: complete mode makes the final
    // table a pure function of the union of files, independent of the
    // per-file micro-batch schedule the query actually ran
    "stream_multifile" -> streamWindowSql,
    "stream_restart" -> streamWindowSql,
    "q60_bag_ops" -> q60BagOpsSql,
    "q61_time_range_frame" -> q61TimeRangeFrameSql,
    "stream_sessions" -> streamSessionsSql,
    // the stateful sessionizer implements session_window's exact gap
    // semantics, so it shares the gaps-and-islands oracle verbatim
    "stream_sessions_stateful" -> streamSessionsSql,
    "stream_late" ->
      """WITH e AS (
        |  SELECT ts, value, (epoch_us(ts) % 5 = 0) AS late FROM events
        |), wm1 AS (
        |  SELECT (epoch_us(max(ts)) // 1000 - 3600000) * 1000 AS us
        |  FROM e WHERE NOT late
        |), wm2 AS (
        |  SELECT (epoch_us(max(ts)) // 1000 - 3600000) * 1000 AS us FROM e
        |), keep AS (
        |  SELECT date_trunc('hour', ts) AS window_start, value FROM e
        |  WHERE NOT (late AND
        |    epoch_us(date_trunc('hour', ts) + INTERVAL 1 HOUR) <= (SELECT us FROM wm1))
        |)
        |SELECT window_start, count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM keep
        |WHERE epoch_us(window_start + INTERVAL 1 HOUR) <= (SELECT us FROM wm2)
        |GROUP BY window_start ORDER BY window_start""".stripMargin,
    // streaming dedup emits exactly one row per distinct key — the
    // per-type count equals the batch COUNT(DISTINCT)
    "stream_dedup" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // stream-static join ≡ batch join on a bounded input
    "stream_enrich" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |       count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "stream_join_outer" ->
      // unmatched clicks flush only when the final watermark
      // (min(side maxima) - lateness) passes their 2h join window
      """WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
        |p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
        |              - INTERVAL 2 HOUR AS w),
        |m AS (SELECT c.event_id AS click_id, p.event_id AS purchase_id,
        |             c.user_id, p.value AS purchase_value
        |      FROM c JOIN p ON c.user_id = p.user_id
        |       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR),
        |u AS (SELECT c.event_id, c.user_id, c.ts FROM c
        |      WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = c.user_id
        |             AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR))
        |SELECT click_id, purchase_id, user_id, purchase_value FROM m
        |UNION ALL
        |SELECT u.event_id, NULL, u.user_id, NULL
        |FROM u, wm WHERE u.ts + INTERVAL 2 HOUR < wm.w
        |ORDER BY click_id, purchase_id""".stripMargin,
    "stream_join" ->
      """SELECT a.event_id AS click_id, b.event_id AS purchase_id,
        |       a.user_id, b.value AS purchase_value
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.event_type = 'click' AND b.event_type = 'purchase'
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 2 HOUR
        |ORDER BY click_id, purchase_id""".stripMargin,
    "sample_temperature" ->
      """WITH s AS (SELECT source AS domain, CAST(sum(n_chars) AS DOUBLE) AS size
        |           FROM documents GROUP BY source),
        |t AS (SELECT sum(pow(size, 0.7)) AS tpa, sum(size) AS tn FROM s)
        |SELECT domain, CAST(size AS BIGINT) AS size,
        |       round(pow(size, 0.7) / t.tpa, 6) AS weight,
        |       round((pow(size, 0.7) / t.tpa) / (size / t.tn), 6) AS boost
        |FROM s CROSS JOIN t ORDER BY domain""".stripMargin,
    // DSIR replay: md5-bucketed unigrams, λ(b) = one division of
    // exact-int products through ln (unrounded), doc sums round(6)
    "sample_dsir" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang = 'en' AS tgt, unnest($duckToks) AS term FROM documents
         |), bk AS (
         |  SELECT doc_id, tgt,
         |         ('0x' || substr(md5('dsir' || term), 1, 8))::BIGINT % 64 AS b
         |  FROM toks
         |), raw AS (SELECT b, count(*) AS cr FROM bk GROUP BY 1
         |), tg AS (SELECT b, count(*) AS ct FROM bk WHERE tgt GROUP BY 1
         |), tot AS (
         |  SELECT count(*) AS tot_r,
         |         sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS tot_t FROM bk
         |), lam AS (
         |  SELECT r.b,
         |         ln(CAST((coalesce(t.ct, 0) + 1) * (tot.tot_r + 64) AS DOUBLE) /
         |            CAST((r.cr + 1) * (tot.tot_t + 64) AS DOUBLE)) AS lam
         |  FROM raw r LEFT JOIN tg t ON t.b = r.b CROSS JOIN tot
         |), feats AS (SELECT doc_id, b, count(*) AS f FROM bk GROUP BY 1, 2)
         |SELECT f.doc_id, CAST(sum(f.f) AS BIGINT) AS n_tokens,
         |       round(sum(f.f * l.lam), 6) AS log_weight
         |FROM feats f JOIN lam l ON l.b = f.b
         |GROUP BY 1 ORDER BY f.doc_id""".stripMargin,
    "stream_sliding" ->
      // every event covers two epoch-aligned hourly-slide buckets of
      // the 2-hour window: starts date_trunc(hour, ts) - {0,1} hours
      """WITH x AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |w AS (SELECT date_trunc('hour', x.ts) - INTERVAL 1 HOUR * k.k AS window_start,
        |             event_type, value
        |      FROM x CROSS JOIN (SELECT unnest([0, 1]) AS k) k)
        |SELECT window_start, event_type, count(*) AS n_events,
        |       round(sum(value), 4) AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_dedup_multibatch" ->
      // TTL replay: batch 1 emits every key; wm = max(batch-1 ts) - 1h;
      // a batch-2 row emits iff not late (ts >= wm) and its key's state
      // expired (stored ts + 1h <= wm) or never existed
      """WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |            (ts >= TIMESTAMP '2024-01-16 00:00:00'
        |             OR user_id % 10 = 3) AS b2 FROM events),
        |r1 AS (SELECT user_id, max(ts) AS ts FROM p WHERE NOT b2 GROUP BY user_id),
        |r2 AS (SELECT user_id, min(ts) AS ts FROM p WHERE b2 GROUP BY user_id),
        |wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM r1),
        |e2 AS (SELECT r2.user_id, r2.ts FROM r2, wm
        |       WHERE r2.ts >= wm.w
        |         AND NOT EXISTS (SELECT 1 FROM r1, wm x
        |                         WHERE r1.user_id = r2.user_id
        |                           AND r1.ts + INTERVAL 1 HOUR > x.w))
        |SELECT user_id, ts FROM (SELECT * FROM r1 UNION ALL SELECT * FROM e2)
        |ORDER BY user_id, ts""".stripMargin,
    "stream_upsert_manifest" ->
      """WITH r AS (
        |  SELECT user_id, ts, event_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY ts DESC, event_id DESC, value DESC) AS rn
        |  FROM events)
        |SELECT user_id, ts AS last_ts, event_id AS last_event_id,
        |       value AS last_value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "stream_upsert" ->
      // value joins the ORDER BY so the oracle's tie-break chain is
      // total and matches the engine's max(struct(us, event_id,
      // value)) ordering even if two events ever shared (ts, event_id)
      """WITH r AS (
        |  SELECT user_id, ts, event_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY ts DESC, event_id DESC, value DESC) AS rn,
        |         count(*) OVER (PARTITION BY user_id) AS n_updates
        |  FROM events)
        |SELECT user_id, ts AS last_ts, event_id AS last_event_id,
        |       value AS last_value, n_updates
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin
  )
}
