package graft.ext

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._
import graft.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`ArrayType(FloatType)`).
  *
  * Three tiers:
  *  - bruteForceTopK — exact: query-set × corpus join, per-query top-k
  *    via a bounded-heap aggregate. Baseline + oracle. Corpus side
  *    streams; the (small) query side is broadcast, so NO shuffle of
  *    the corpus at all — at 100 TB this is one scan, and the rank
  *    shuffle moves only partial top-k states.
  *  - ivfTopK — IVF-style: k-means-ish coarse quantizer built from a
  *    deterministic sample of centroids, corpus partitioned by nearest
  *    centroid, queries probe only the `nprobe` nearest cells. The scan
  *    is pruned to nprobe/ncells of the data.
  *  - lshNearDupes — random-hyperplane (SRP) LSH banding for pair
  *    discovery at corpus scale (used by Dedup tier 5's scale path).
  *
  * All vector math is `zip_with`/`aggregate` higher-order expressions
  * (codegen'd, no UDF), in double precision.
  */
object Similarity {

  /** Explode a `topk_by_score` result array into
    * (group, rank, id, score) rows — rank 1 = best. */
  private[graft] def explodeTopK(
      agg: DataFrame, groupCol: String, idName: String, scoreName: String): DataFrame =
    agg
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col(groupCol), (col("pos") + 1).as("rank"),
        col("t.id").as(idName), col("t.score").as(scoreName))

  /** Exact top-k neighbors for each query vector. `queries` and `corpus`
    * both carry (id, vector); every query gets its `k` nearest by cosine
    * (self-matches excluded when ids collide). Deterministic tie-break
    * by neighbor id.
    *
    * Scale shape: the (small) query side is broadcast, so the corpus
    * never shuffles for the match; ranking is a bounded-heap
    * [[graft.functions.TopKByScore]] aggregate whose map-side partial
    * keeps k entries per (partition, query) — the shuffle moves
    * O(queries · k · partitions) rows, never the q×n scored relation
    * (a `row_number` window here would shuffle ALL q×n scores). */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), normalize(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), normalize(col(vecCol)).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"), round(graft.functions.fx.vecDot(col("cv"), col("qv")), 6).as("cosine"))
    explodeTopK(
      scored.groupBy("query_id")
        .agg(graft.functions.fx.topKByScore(col("cosine"), col("nbr_id"), k).as("top")),
      "query_id", "nbr_id", "cosine")
  }

  /** Radius (range) search: every corpus vector within `minCosine` of
    * each query — the retrieval primitive behind near-duplicate
    * lookups and threshold-gated RAG recall. Same scale shape as
    * [[bruteForceTopK]] (queries broadcast, corpus never shuffles) but
    * with a predicate instead of a heap: the filter runs INSIDE the
    * scan projection, so output size is the only data-dependent cost.
    * The threshold compares against the 6-dp-ROUNDED cosine so the
    * boundary replays exactly in SQL. */
  def rangeSearch(
      corpus: DataFrame,
      queries: DataFrame,
      minCosine: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), normalize(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), normalize(col(vecCol)).as("qv"))
    c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        round(graft.functions.fx.vecDot(col("cv"), col("qv")), 6).as("cosine"))
      .filter(col("cosine") >= lit(minCosine))
  }

  /** Greedy k-center selection (farthest-first traversal, Gonzalez
    * 1985) — the coreset/data-pruning picker: starting from `seedId`,
    * repeatedly add the point FARTHEST (1 − cosine) from everything
    * selected so far. Scale shape: the corpus never shuffles — each of
    * the k−1 rounds is one map-only `least(d, dist-to-new-center)`
    * update against a LITERAL center vector plus one single-row
    * argmax; the only driver state is the k selected vectors
    * (parameter-bounded, the MMR/centroid precedent). Distances use
    * the 6-dp-rounded cosine, ties break to the smallest id, so the
    * greedy trace replays exactly as an unrolled relational oracle. */
  def kCenterSelect(
      corpus: DataFrame,
      k: Int,
      seedId: Long,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = corpus.sparkSession
    val c = corpus
      .select(col(idCol).cast("long").as("id"), normalize(col(vecCol)).as("v"))
      .localCheckpoint()
    val nCorpus = c.count()
    require(k <= nCorpus,
      s"k-center k=$k exceeds corpus size $nCorpus - nothing left to pick")
    def vecOf(id: Long): Column = {
      val arr = c.filter(col("id") === id).head().getSeq[Double](1)
      array(arr.map(lit): _*)
    }
    def distTo(center: Column): Column =
      lit(1.0) - round(graft.functions.fx.vecDot(col("v"), center), 6)
    var picked = List((1, seedId, 0.0))
    var minDist = c.withColumn("d", distTo(vecOf(seedId))).localCheckpoint()
    for (r <- 2 to k) {
      val b = minDist.filter(!col("id").isInCollection(picked.map(_._2)))
        .agg(min(struct((-col("d")).as("nd"), col("id").as("id"))).as("b"))
        .select(col("b.id"), (-col("b.nd")).as("d")).head()
      val (nid, nd) = (b.getLong(0), b.getDouble(1))
      picked ::= (r, nid, nd)
      if (r < k) {
        val next = minDist
          .withColumn("d", least(col("d"), distTo(vecOf(nid))))
          .localCheckpoint()
        graft.core.Lineage.release(minDist)
        minDist = next
      }
    }
    graft.core.Lineage.release(c, minDist)
    import spark.implicits._
    picked.reverse.toDF("sel_rank", "vec_id", "dist_at_selection")
      .select(col("sel_rank").cast("long").as("sel_rank"), col("vec_id"),
        round(col("dist_at_selection"), 6).as("dist_at_selection"))
  }

  /** Hard-negative mining for contrastive/retrieval training: for each
    * query, the `k` most-similar corpus vectors with a DIFFERENT label
    * — the highest-loss negatives a dual-encoder trains against
    * (in-batch-negatives' targeted sibling; e.g. DPR/ANCE-style
    * pipelines). Identical scale shape to [[bruteForceTopK]]: the
    * query side broadcasts with its labels, the corpus never shuffles,
    * the label-mismatch predicate prunes INSIDE the scan, and ranking
    * is the bounded-heap aggregate. Cosines round to 6 dp with id
    * tie-breaks, so the mined set hash-replays in SQL. */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"
  ): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), normalize(col(vecCol)).as("cv"),
      col(labelCol).as("__nl"))
    val q = queries.select(col(idCol).as("query_id"), normalize(col(vecCol)).as("qv"),
      col(labelCol).as("__ql"))
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("nbr_id") && col("__nl") =!= col("__ql"))
      .select(col("query_id"), col("nbr_id"),
        round(graft.functions.fx.vecDot(col("cv"), col("qv")), 6).as("cosine"))
    explodeTopK(
      scored.groupBy("query_id")
        .agg(graft.functions.fx.topKByScore(col("cosine"), col("nbr_id"), k).as("top")),
      "query_id", "nbr_id", "cosine")
  }

  /** Eagerly collect the first `n` corpus vectors (by id, normalized)
    * as a deterministic, reproducible quantizer init — n rows, bounded.
    * Shared by [[ivfTopK]]'s default quantizer and [[kmeansCentroids]]
    * as the Lloyd iteration seed. */
  def firstNCentroids(
      corpus: DataFrame,
      n: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Seq[(Long, Seq[Double])] =
    corpus.orderBy(col(idCol)).limit(n)
      .select(col(idCol).cast("long"), normalize(col(vecCol)))
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))

  /** One (−cos, cent_id) struct PER CENTROID, each a codegen'd
    * VecDotProduct against an array literal — unrolled so the whole
    * argmin stays inside whole-stage codegen. (A `transform(centLit,…)`
    * higher-order form evaluates all dots through interpreted lambdas
    * per corpus row — measured 6× slower.) Structs compare
    * lexicographically, so least() = highest cosine with ties to the
    * lowest centroid id.
    *
    * Scores are ROUNDED to 6 dp before the argmin: cross-engine, the
    * unrounded cosines differ in the last ulp (different normalize /
    * dot accumulation orders), which would make cell assignment and
    * probe selection un-replayable — rounding first collapses the ulp
    * band, and the cent_id tie-break resolves the (now more likely)
    * exact 6 dp ties identically on both engines. This is what lets
    * the PRUNED-probe IVF path be hash-oracled, not just recall-
    * tested. */
  private def centScoreStructs(cents: Seq[(Long, Seq[Double])])(vec: Column): Seq[Column] =
    cents.map { case (cid, cv) =>
      struct(
        round(-graft.functions.fx.vecDot(vec, typedlit(cv)), 6).as("negcos"),
        lit(cid).as("cent_id"))
    }

  /** Nearest-centroid id as a pure codegen'd projection (no shuffle).
    * r18: the unrolled least(k structs of d-literal dots) became the
    * fused [[graft.functions.NearestCentroid]] argmin — byte-identical
    * scores/ties (see [[graft.functions.CentroidImpl.nearest]]), but
    * the generated code no longer embeds k·d literals, so plans that
    * retrain centroids per round (k-means) stop paying a Janino
    * recompile per iteration. */
  private def bestCellExpr(cents: Seq[(Long, Seq[Double])])(vec: Column): Column =
    graft.functions.fx.nearestCentroid(vec, cents).getField("cent_id")

  /** Cell assignment under a quantizer: (id, cell, cosine) of every
    * vector to its nearest centroid — a pure codegen'd projection, no
    * shuffle. The materialization step for IVF-partitioned storage and
    * the spherical k-means objective (avg cosine to assigned centroid). */
  def assignCells(
      emb: DataFrame,
      cents: Seq[(Long, Seq[Double])],
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    require(cents.nonEmpty, "assignCells: need at least one centroid")
    val withBest = emb
      .select(col(idCol).as("id"), normalize(col(vecCol)).as("v"))
      .withColumn("b", graft.functions.fx.nearestCentroid(col("v"), cents))
    withBest.select(col("id"), col("b.cent_id").as("cell"),
      round(-col("b.negcos"), 6).as("cosine"))
  }

  /** [[assignCells]] keeping the NORMALIZED vector alongside the cell
    * id — (id, cell, v) — for consumers that score within-cell pairs
    * right after assignment (SemDeDup-style cluster-then-dedup) and
    * would otherwise have to re-join the corpus on id just to get the
    * vector back (an extra corpus-sized shuffle). Same pure codegen'd
    * argmin projection, no shuffle. */
  def assignCellsVec(
      emb: DataFrame,
      cents: Seq[(Long, Seq[Double])],
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    require(cents.nonEmpty, "assignCellsVec: need at least one centroid")
    emb
      .select(col(idCol).as("id"), normalize(col(vecCol)).as("v"))
      .withColumn("cell", bestCellExpr(cents)(col("v")))
      .select(col("id"), col("cell"), col("v"))
  }

  /** Spherical k-means (Lloyd) quantizer training: seed =
    * [[firstNCentroids]], then `iters` rounds of [assign each vector to
    * its nearest centroid via the codegen'd literal argmin — zero
    * shuffle] → [recompute centroids with [[centroidsByDim]] — one
    * map-side-combinable (cell, dim) aggregation] → [L2-normalize the
    * k·d means driver-side — k·d doubles, bounded]. Cells that lose all
    * members keep their previous centroid. Deterministic end-to-end
    * (fixed seed, argmin ties to lowest id), so trained quantizers are
    * reproducible across runs — the property IVF correctness gates rely
    * on. Cost per iteration = one corpus scan + one aggregation; the
    * corpus never shuffles and never reaches the driver. */
  def kmeansCentroids(
      corpus: DataFrame,
      k: Int,
      iters: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Seq[(Long, Seq[Double])] = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    var cents = firstNCentroids(corpus, k, idCol, vecCol)
    require(cents.nonEmpty,
      "kmeansCentroids: corpus is empty — cannot seed a quantizer from zero vectors")
    val c = corpus.select(normalize(col(vecCol)).as("cv"))
    for (_ <- 1 to iters) {
      val assigned = c.withColumn("cell", bestCellExpr(cents)(col("cv")))
      val means = centroidsByDim(assigned, col("cell"), "cv")
        .collect().toSeq
        .groupBy(_.getLong(0))
        .map { case (cell, rows) =>
          val byDim = rows.sortBy(_.getInt(1)).map(_.getDouble(2))
          val n = math.sqrt(byDim.map(x => x * x).sum)
          cell -> (if (n == 0) byDim else byDim.map(_ / n))
        }
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    cents
  }

  /** Each query's `nprobe` nearest cells under the quantizer —
    * (cell, query_id, qv) with qv the NORMALIZED query vector, one row
    * per probe. The same 6-dp-rounded, lowest-cid-tie-broken centroid
    * ranking as [[assignCells]], so probe selection is exactly
    * replayable cross-engine (the property the pruned-probe IVF hash
    * oracle rests on). Pure codegen'd projection over the (small)
    * query side — no shuffle. Shared by [[ivfTopK]] and the persisted
    * streaming index ([[graft.streaming.AnnIndex]]). */
  def probeCells(
      queries: DataFrame,
      cents: Seq[(Long, Seq[Double])],
      nprobe: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    require(cents.nonEmpty, "probeCells: need at least one centroid")
    queries.select(col(idCol).as("query_id"), normalize(col(vecCol)).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(slice(array_sort(array(centScoreStructs(cents)(col("qv")): _*)),
          1, nprobe)).as("pc"))
      .select(col("pc.cent_id").as("cell"), col("query_id"), col("qv"))
  }

  /** IVF top-k: coarse quantizer = `centroids` when given (train one
    * with [[kmeansCentroids]]) else the deterministic first-`ncells`
    * init; corpus assigned to nearest cell once, queries probe
    * `nprobe` cells. Join key = cell id ⇒ the corpus×query match is
    * pruned by the quantizer instead of scanning everything.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      ncells: Int = 16,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      centroids: Option[Seq[(Long, Seq[Double])]] = None
  ): DataFrame = {
    // The quantizer is tiny by definition (ncells centroids), so it is
    // collected once — an EAGER read at DataFrame-construction time
    // (ncells rows, bounded; callers building plans before the corpus
    // exists should construct lazily themselves) — and each centroid is
    // inlined as its own LITERAL array<double>. The per-row
    // nearest-centroid argmin is then a pure projection. (The
    // alternative — joining a centroid DataFrame and ranking with a
    // window — shuffles the ENTIRE corpus by nbr_id just to pick each
    // row's best centroid.)
    val cents: Seq[(Long, Seq[Double])] =
      centroids.getOrElse(firstNCentroids(corpus, ncells, idCol, vecCol))
    require(cents.nonEmpty,
      "ivfTopK: corpus is empty — cannot build an IVF quantizer from zero centroids")
    def bestCell(vec: Column): Column = bestCellExpr(cents)(vec)

    // corpus assignment: zero-shuffle per-row argmin projection
    val c = corpus.select(col(idCol).as("nbr_id"), normalize(col(vecCol)).as("cv"))
    val assigned = c.withColumn("cell", bestCell(col("cv")))

    // queries probe their nprobe nearest cells (query side is small;
    // sort the ncells scores per row and take the prefix — the same
    // codegen'd structs as the corpus argmin)
    val probes = probeCells(queries, cents, nprobe, idCol, vecCol)

    // each corpus row lives in exactly one cell and a query's probed
    // cells are distinct, so a (query, nbr) pair meets at most once —
    // no dedup needed before the top-k aggregate
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"), round(graft.functions.fx.vecDot(col("cv"), col("qv")), 6).as("cosine"))
    explodeTopK(
      scored.groupBy("query_id")
        .agg(graft.functions.fx.topKByScore(col("cosine"), col("nbr_id"), k).as("top")),
      "query_id", "nbr_id", "cosine")
  }

  /** Element-wise mean vector (centroid) per group, in LONG form:
    * (grp, dim, mean) — the quantizer-training / dataset-summarization
    * aggregate (k-means update step, cluster prototypes, embedding
    * drift monitoring). posexplode → per-(group, dim) `avg` is ONE
    * map-side-combinable hash aggregation: the shuffle moves partial
    * (sum, count) pairs per (group, dim), never vectors, and nothing
    * touches the driver — the shape that holds when "group" is a
    * million clusters over 100 TB of embeddings. */
  def centroidsByDim(
      emb: DataFrame,
      groupExpr: Column,
      vecCol: String = "embedding"
  ): DataFrame =
    emb.select(groupExpr.as("grp"), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy("grp", "dim")
      .agg(avg(col("v").cast("double")).as("mean"))

  /** Centroids assembled back into one `array<double>` per group (the
    * API-convenience form of [[centroidsByDim]]; `collect_list` order
    * is nondeterministic, so the dims are re-sorted structurally). */
  def centroids(
      emb: DataFrame,
      groupExpr: Column,
      vecCol: String = "embedding"
  ): DataFrame =
    centroidsByDim(emb, groupExpr, vecCol)
      .groupBy("grp")
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("mean")))),
        s => s.getField("mean")).as("centroid"))

  /** Product-quantization encode: split each `dim`-dimensional vector
    * into `m` contiguous subvectors and replace each with the id of
    * its nearest codebook entry (squared-L2, ties to the lowest id) —
    * the memory-compression step every billion-vector ANN index runs
    * (64 floats → m bytes here; Jégou et al., TPAMI 2011). Codebook:
    * pass [[pqTrainCodebooks]] output for trained PQ, or omit for the
    * deterministic zero-training [[pqSeedCodebook]].
    *
    * 100 TB shape: the codebook is k·dim doubles (bounded, collected
    * once — the same eager-read contract as [[firstNCentroids]]); the
    * encode itself is a pure PROJECTION through the
    * [[graft.functions.PqEncodeCodes]] kernel — one codegen'd static
    * call per row, no shuffle, no join, no lambda, and (unlike the
    * m·k-unrolled expression-tree form it replaced) no 20-second
    * Janino compile of a 64 KB-overflow projection. Encoded codes
    * shuffle-free replace 4·dim bytes/vector with m ints.
    *
    * Cross-engine exactness: each distance is a fixed j-ascending
    * accumulation of (float→double subtract, square, add) —
    * bit-identical IEEE on both engines — so code assignment
    * (including ties, broken by codebook id) is hash-oracle-able with
    * NO rounding. */
  def pqEncode(
      emb: DataFrame,
      m: Int = 8,
      k: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      codebook: Option[Seq[(Long, Seq[Double])]] = None
  ): DataFrame = {
    val cb = codebook.getOrElse(pqSeedCodebook(emb, k, idCol, vecCol))
    require(cb.size == k,
      s"pqEncode: codebook has ${cb.size} entries, expected k=$k")
    val dim = cb.head._2.size
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    emb.select(col(idCol),
      graft.functions.fx.pqEncodeCodes(col(vecCol), cb, m, dim / m).as("codes"))
  }

  /** The untrained PQ codebook: the first `k` corpus vectors by id,
    * double-cast — deterministic, zero training, the seed
    * [[pqTrainCodebooks]] refines. */
  def pqSeedCodebook(
      emb: DataFrame,
      k: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Seq[(Long, Seq[Double])] = {
    val cb: Seq[(Long, Seq[Double])] = emb.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long"),
        transform(col(vecCol), _.cast("double")))
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
    require(cb.size == k,
      s"pqSeedCodebook: corpus has ${cb.size} vectors, need k=$k")
    cb
  }

  /** Per-subspace k-means (Lloyd) PQ codebook training — real PQ
    * (Jégou et al., TPAMI 2011 §II.C) instead of the first-k seed:
    * each of the `m` subspaces independently refines its k entries by
    * [assign every subvector to its nearest entry — one corpus scan
    * through the [[graft.functions.PqImpl]] kernel, zero shuffle] →
    * [per-(subspace, entry, dim) mean — ONE map-side-combinable
    * aggregation of m·k·dsub cells] → [driver merge of the m·k·dsub
    * rounded means, bounded]. Entries that lose all members keep their
    * previous coordinates.
    *
    * Cross-engine determinism (the emb_pq oracle replays this training
    * in DuckDB): seed coordinates are exact float→double casts; each
    * round's means are `round(avg(...), 6)` IN the Spark aggregate —
    * avg sum orders differ across engines only in the last ulp, and
    * rounding to 6 dp collapses that (the emb_centroids oracle pins
    * this round-bitwise-equality property on the same fixture) — so
    * assignment argmins see bit-identical codebooks on both engines.
    *
    * 100 TB shape: per round, the corpus is scanned once (projection)
    * and never shuffles; the aggregation shuffles partial (sum, count)
    * pairs for m·k·dsub cells; driver state is m·k·dsub doubles. */
  def pqTrainCodebooks(
      emb: DataFrame,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Seq[(Long, Seq[Double])] = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    var cb = pqSeedCodebook(emb, k, idCol, vecCol)
    val dim = cb.head._2.size
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    for (_ <- 1 to iters) {
      val assigned = emb.select(col(vecCol).as("v"),
        posexplode(graft.functions.fx.pqEncodeCodes(col(vecCol), cb, m, dsub))
          .as(Seq("s", "cid")))
      val means = assigned
        .select(col("s"), col("cid"),
          posexplode(slice(col("v"), col("s") * dsub + 1, lit(dsub))).as(Seq("j", "x")))
        .groupBy("s", "cid", "j")
        .agg(round(avg(col("x").cast("double")), 6).as("mean"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3)))
        .toMap
      cb = cb.map { case (cid, coords) =>
        val next = coords.indices.map { i =>
          means.getOrElse((i / dsub, cid.toInt, i % dsub), coords(i))
        }
        (cid, next)
      }
    }
    cb
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: score every coded
    * vector against a query by summing, per subspace, the PRECOMPUTED
    * squared-L2 distance from the query's subvector to the codebook
    * entry the code names (Jégou et al., TPAMI 2011 §IV.A) — the
    * query path of a PQ-compressed ANN index. The codebook matches
    * [[pqEncode]]'s (first `k` corpus vectors by id), so
    * `pqAdcTopK(emb, q)` scores exactly what `pqEncode(emb)` stored.
    *
    * 100 TB shape: the m·k lookup table is built on the driver
    * (bounded: 128 doubles at defaults) and embedded as literal MAP
    * expressions, so scoring is a pure per-row projection over the
    * (id, codes) relation — the corpus floats are never read again,
    * nothing shuffles, and the final top-k is a TakeOrderedAndProject
    * (per-partition heads, never a global sort of all scores).
    *
    * Determinism: each table entry is a fixed left-assoc chain of
    * double ops (bit-identical cross-engine); the 8-term ADC sum is
    * also a literal chain, but the ORACLE's replay aggregates per
    * subspace, so the score is rounded to 6 dp BEFORE ranking and
    * ties break by id — selection is identical on both engines. */
  def pqAdcTopK(
      emb: DataFrame,
      queryId: Long,
      topK: Int = 10,
      m: Int = 8,
      k: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      codebookOpt: Option[Seq[(Long, Seq[Double])]] = None
  ): DataFrame = {
    val codebook = codebookOpt.getOrElse(pqSeedCodebook(emb, k, idCol, vecCol))
    val codes = pqEncode(emb, m, k, idCol, vecCol, Some(codebook))
    require(codebook.nonEmpty, "pqAdcTopK: empty corpus")
    val dim = codebook.head._2.size
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val qRows = emb.filter(col(idCol) === queryId)
      .select(transform(col(vecCol), _.cast("double"))).collect()
    require(qRows.nonEmpty, s"pqAdcTopK: query id $queryId not in corpus")
    val q: Seq[Double] = qRows.head.getSeq[Double](0)
    val score = (0 until m).map { s =>
      val entries = codebook.map { case (cid, cv) =>
        val d = (0 until dsub).map { j =>
          val t = q(s * dsub + j) - cv(s * dsub + j); t * t
        }.reduceLeft(_ + _)
        (cid.toInt, d)
      }
      val table = map(entries.flatMap { case (cid, d) => Seq(lit(cid), lit(d)) }: _*)
      element_at(table, element_at(col("codes"), s + 1))
    }.reduceLeft(_ + _)
    codes
      .select(col(idCol), round(score, 6).as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(topK)
  }

  /** IVF + PQ ADC top-k — the production ANN serving shape (Jégou et
    * al., TPAMI 2011 §IV): the IVF quantizer prunes the corpus to the
    * query's `nprobe` cells, and only those rows are ADC-scored from
    * their PQ codes. This is THE architecture that holds at 100 TB of
    * embeddings: the corpus pass is one codegen'd projection computing
    * (cell, codes) per row — no shuffle, no raw-vector movement — the
    * probe set is a broadcast semi-join of `nprobe` cell ids, and the
    * per-row score is `m` map-literal lookups + adds feeding a global
    * bounded top-k. Cell pruning and the distance table reuse the
    * exact-replay machinery of [[ivfTopK]] (6 dp rounded argmin with
    * cent-id ties — probes selected ENGINE-side through the same
    * codegen path as corpus assignment) and [[pqAdcTopK]] (driver-
    * built literal tables over fixed-order IEEE chains), so the whole
    * prune→encode→score→rank pipeline is hash-oracle-able. */
  def ivfPqTopK(
      emb: DataFrame,
      queryId: Long,
      topK: Int = 10,
      ncells: Int = 16,
      nprobe: Int = 4,
      m: Int = 8,
      k: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      centroids: Option[Seq[(Long, Seq[Double])]] = None,
      codebookOpt: Option[Seq[(Long, Seq[Double])]] = None
  ): DataFrame = {
    val cents = centroids.getOrElse(firstNCentroids(emb, ncells, idCol, vecCol))
    require(cents.nonEmpty, "ivfPqTopK: empty quantizer")
    val codebook = codebookOpt.getOrElse(pqSeedCodebook(emb, k, idCol, vecCol))
    require(codebook.nonEmpty, "ivfPqTopK: empty codebook")
    val dim = codebook.head._2.size
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val qRows = emb.filter(col(idCol) === queryId)
      .select(transform(col(vecCol), _.cast("double"))).collect()
    require(qRows.nonEmpty, s"ivfPqTopK: query id $queryId not in corpus")
    val q: Seq[Double] = qRows.head.getSeq[Double](0)
    // the query's nprobe cells, via the SAME rounded-argmin codegen
    // path the corpus assignment uses (1 row, nprobe cell ids)
    val probes = emb.filter(col(idCol) === queryId)
      .select(explode(slice(array_sort(
        array(centScoreStructs(cents)(normalize(col(vecCol))): _*)),
        1, nprobe)).as("pc"))
      .select(col("pc.cent_id").as("cell"))
    // single corpus pass: cell + PQ codes as pure projections
    val corpus = emb.filter(col(idCol) =!= queryId)
      .select(col(idCol),
        bestCellExpr(cents)(normalize(col(vecCol))).as("cell"),
        graft.functions.fx.pqEncodeCodes(col(vecCol), codebook, m, dsub)
          .as("codes"))
    // ADC distance table: m literal maps from the collected query
    val score = (0 until m).map { s =>
      val entries = codebook.map { case (cid, cv) =>
        val d = (0 until dsub).map { j =>
          val t = q(s * dsub + j) - cv(s * dsub + j); t * t
        }.reduceLeft(_ + _)
        (cid.toInt, d)
      }
      val table = map(entries.flatMap { case (cid, d) => Seq(lit(cid), lit(d)) }: _*)
      element_at(table, element_at(col("codes"), s + 1))
    }.reduceLeft(_ + _)
    corpus.join(broadcast(probes), Seq("cell"), "left_semi")
      .select(col(idCol), round(score, 6).as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(topK)
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein,
    * SIGIR'98): greedily pick `k` of the query's `poolSize` nearest
    * neighbors maximizing `lam·rel(d) − mu·max_{s∈selected}
    * sim(d, s)` — the relevance-vs-diversity rerank every retrieval /
    * training-data-curation pipeline runs after ANN.
    *
    * Architecture (the shape that survives 100 TB): the EXPENSIVE
    * stage — scoring the corpus against the query and keeping the
    * top-`poolSize` — is the distributed [[bruteForceTopK]] (corpus
    * never shuffles, bounded-heap rank); the greedy refinement then
    * runs on the driver over the collected pool (poolSize ids +
    * vectors, ≤ ~10³ by contract — the rerank-stage pattern, same
    * bounded-driver-state class as the PQ codebook / IVF centroids).
    * Greedy selection is inherently sequential in k; distributing it
    * would serialize k Spark jobs over a 64-row set.
    *
    * Exactness: `rel` and pairwise sims round to 6 dp (the collapsed-
    * ulp rule), `lam`/`mu` are spelled as the SAME literals in both
    * engines (never `1 − lam`, whose double differs from the `0.3`
    * literal), and the score arithmetic is a 2-product chain — the
    * whole greedy trace replays exactly in SQL, k unrolled steps with
    * (score DESC, id) tie-breaks. */
  def mmrSelect(
      emb: DataFrame,
      queryId: Long,
      k: Int = 8,
      poolSize: Int = 64,
      lam: Double = 0.7,
      mu: Double = 0.3,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    require(k >= 1 && poolSize >= k, s"need 1 <= k <= poolSize, got k=$k pool=$poolSize")
    val spark = emb.sparkSession
    import spark.implicits._
    val pool = bruteForceTopK(emb, emb.filter(col(idCol) === queryId), poolSize,
        idCol, vecCol)
      .select(col("nbr_id").cast("long"), col("cosine"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val ids = pool.map(_._1).toSeq
    val vecs = emb.filter(col(idCol).isin(ids: _*))
      .select(col(idCol).cast("long"), normalize(col(vecCol)))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def sim(a: Long, b: Long): Double = {
      val (va, vb) = (vecs(a), vecs(b))
      var s = 0.0; var i = 0
      while (i < va.length) { s += va(i) * vb(i); i += 1 }
      round6(s)
    }
    val selected = scala.collection.mutable.ArrayBuffer[(Int, Long, Double, Double)]()
    val remaining = scala.collection.mutable.LinkedHashMap(pool.toSeq: _*)
    // the corpus can yield fewer than poolSize (even fewer than k)
    // neighbors — emit only real candidates, never filler rows
    for (r <- 1 to math.min(k, pool.length)) {
      var bestId = -1L; var bestScore = Double.NegativeInfinity; var bestRel = 0.0
      remaining.foreach { case (id, rel) =>
        val ms =
          if (selected.isEmpty) 0.0
          else selected.map(s => sim(id, s._2)).max
        val score = lam * rel - mu * ms
        if (score > bestScore || (score == bestScore && id < bestId)) {
          bestId = id; bestScore = score; bestRel = rel
        }
      }
      selected += ((r, bestId, bestRel, bestScore))
      remaining.remove(bestId)
    }
    selected.toSeq.toDF("rank", "vec_id", "rel", "score")
  }

  /** Deterministic ±1 hyperplane sign for (dim `i`, bit `b`): +1 iff
    * the first hex nibble of `md5("i:b")` is 0–7. PORTABLE by design:
    * any engine with md5 reproduces the planes exactly, so DuckDB
    * oracles can replay the full signature → band → candidate pipeline
    * in SQL (`substr(md5(i || ':' || b), 1, 1) < '8'`) — which is what
    * lets [[knnJoinLsh]] carry a hash oracle despite probabilistic
    * recall. */
  private[graft] def srpSign(i: Int, b: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$b".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if ((d(0) & 0x80) == 0) 1.0 else -1.0
  }

  /** Signed-random-projection LSH signatures as `sig:
    * array<bigint>` (⌈nbits/64⌉ words, bit b at word b/64, offset
    * b%64): `nbits` ±1 hyperplanes from [[srpSign]] (md5-derived, so
    * cross-engine replayable — no stored planes, no RNG). One
    * codegen'd kernel call per row ([[graft.functions.SrpImpl]]) with
    * the sign table as a reference object — a MAP-ONLY projection, no
    * explode, no shuffle, nothing leaves whole-stage codegen. (The
    * previous explode → nbits-wide `sum` aggregate paid a keyed
    * shuffle and fell out of codegen at nbits ≥ 192: 2.7 s vs <0.1 s
    * at sf0.1/384 bits.)
    *
    * Bit stability across engines: a bit is `proj > 0` with NO
    * rounding. Summation order makes `proj` differ across engines
    * only in the last few ulps (~1e-13 at fixture magnitudes); the
    * measured |proj| floor on the fixtures is 1.15e-6 (sf0.01) /
    * 1.07e-5 (sf0.1) — seven orders of magnitude of margin, and
    * deterministic for a fixed fixture. Rounding before the sign test
    * would CREATE instability (half-even boundaries every 1e-6), so
    * the raw comparison is the safer contract. */
  def srpSignatures(
      emb: DataFrame,
      nbits: Int = 128,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    require(nbits > 0, s"nbits must be positive, got $nbits")
    // dim probe: one bounded driver aggregate (the PQ/IVF paths do the
    // same); max() skips null vectors, and an empty/all-null input
    // yields an empty signature frame instead of a head() crash
    val probe = emb.agg(max(size(col(vecCol)))).head()
    val dim = if (probe.isNullAt(0)) 0 else probe.getInt(0)
    if (dim < 1)
      return emb.select(col(idCol).as("id"),
        lit(null).cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)).as("sig")).limit(0)
    val signs = (0 until dim).flatMap(i => (0 until nbits).map(b => srpSign(i, b)))
    emb.select(col(idCol).as("id"),
      graft.functions.fx.srpSignature(col(vecCol), signs, dim, nbits).as("sig"))
  }

  /** Near-dup pairs via SRP banding + exact cosine verify ≥ threshold.
    *
    * Contract: precision 1 always (survivors are exact-verified by dot
    * product, so the output NEVER contains a below-threshold pair);
    * recall is the LSH OR-amplification over `nbits/bandBits` bands —
    * probabilistic in general, rising with more/narrower bands. The
    * theory (Charikar, STOC'02 SRP + the standard banding bound): a
    * pair at angle θ agrees per bit with p = 1 − θ/π, collides per
    * w-bit band with p^w, and is missed by all B bands with
    * (1 − p^w)^B. Candidate volume for near-orthogonal background mass
    * is ≈ B·n²/2^w, so `bandBits` should grow ~log₂(n) at scale (with
    * `nbits` grown to keep B) — the classic n^(1+ρ) curve,
    * ρ = ln(1/p₁)/ln(1/p₂). At small fixture n a small w prunes little
    * (documented at the dedup_emblsh call site); the SHAPE — banded
    * equi-join on (band, chunk), distinct pair ids, shuffle-merge
    * vector fetch, no cartesian, no corpus broadcast — is what holds
    * at 100 TB.
    *
    * Scale notes: the banded self-join moves only (id, band, chunk)
    * longs; vectors are fetched AFTER the candidate distinct via two
    * pinned shuffle-merge joins (the [[Dedup]] verifyJaccard pattern —
    * corpus-sized sides must never broadcast). */
  def lshNearDupes(
      emb: DataFrame,
      threshold: Double,
      nbits: Int = 192,
      bandBits: Int = 4,
      maxBucket: Int = 4096,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    require(bandBits > 0 && bandBits <= 64 && 64 % bandBits == 0,
      s"bandBits must divide 64, got $bandBits")
    require(nbits % bandBits == 0, s"bandBits ($bandBits) must divide nbits ($nbits)")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val cands = srpCandidates(emb, nbits, bandBits, maxBucket, idCol, vecCol)
    val vecs = emb.select(col(idCol).as("id"), normalize(col(vecCol)).as("v"))
    // shuffle_hash, not shuffle_merge: same no-broadcast posture (the
    // corpus-sized vector side must never broadcast), but the ~KB-wide
    // pair rows stream against a per-partition hash build instead of
    // being sorted twice
    cands
      .join(vecs.select(col("id").as("id_a"), col("v").as("va")).hint("shuffle_hash"), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb")).hint("shuffle_hash"), "id_b")
      .withColumn("cosine", round(graft.functions.fx.vecDot(col("va"), col("vb")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** SRP band-bucket candidate pairs (id_a < id_b, distinct): the
    * shared candidate stage of [[lshNearDupes]] and [[knnJoinLsh]] —
    * the shuffle moves only (id, band, chunk) longs; the n² blow-up is
    * confined to within-bucket collisions.
    *
    * `maxBucket` is the hot-bucket guard (the [[Dedup.substringPairs]]
    * maxDf pattern): a band-bucket holding more than `maxBucket` ids —
    * a near-duplicate cluster, a zero vector, boilerplate embeddings —
    * emits k² pairs on ONE join key and stalls the stage at scale, so
    * oversized buckets are dropped BEFORE the self-join (one keyed
    * count, delta-sized). A pair whose every colliding band is
    * degenerate is sacrificed; on the oracle fixtures the cap never
    * triggers (max bucket 33 vs cap 64 at the dedup_emblsh call site),
    * so measured recall is unchanged. */
  private def srpCandidates(
      emb: DataFrame,
      nbits: Int,
      bandBits: Int,
      maxBucket: Int,
      idCol: String,
      vecCol: String
  ): DataFrame = {
    val nbands = nbits / bandBits
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1L
    val chunkExprs = (0 until nbands).map { i =>
      shiftright(element_at(col("sig"), i * bandBits / 64 + 1), i * bandBits % 64)
        .bitwiseAND(mask)
    }
    val banded = srpSignatures(emb, nbits, idCol, vecCol)
      .select(col("id"), posexplode(array(chunkExprs: _*)).as(Seq("band", "chunk")))
    val keep = banded.groupBy("band", "chunk").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucket).select("band", "chunk")
    val kept = banded.join(keep.hint("shuffle_merge"), Seq("band", "chunk"))
    kept.as("a").join(kept.as("b"),
        F.col("a.band") === F.col("b.band") &&
          F.col("a.chunk") === F.col("b.chunk") &&
          F.col("a.id") < F.col("b.id"))
      .select(F.col("a.id").as("id_a"), F.col("b.id").as("id_b"))
      .distinct()
  }

  /** k-NN SELF-join at corpus scale: every vector gets its top-k most
    * similar vectors — the knn-graph builder behind graph-based dedup,
    * diversity sampling, and retrieval-index bootstrap. The shape that
    * survives 100 TB: [[bruteForceTopK]] with queries = corpus would
    * broadcast a corpus-sized relation (its contract is a SMALL query
    * set), so here candidates come from the SRP band-bucket equi-join
    * (symmetrized), scores are exact dot products after pinned
    * shuffle-merge vector fetches, and ranking is the bounded-heap
    * aggregate — no broadcast, no cartesian, no q×n window shuffle.
    * Contract: scores exact; NEIGHBOR RECALL is the LSH
    * OR-amplification (rises with nbits / narrower bands; property-
    * tested vs brute force in ExtSpec). A vector whose candidates all
    * miss yields fewer than k rows (or none) rather than random
    * neighbors. */
  def knnJoinLsh(
      emb: DataFrame,
      k: Int,
      nbits: Int = 192,
      bandBits: Int = 4,
      maxBucket: Int = 4096,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    require(bandBits > 0 && bandBits <= 64 && 64 % bandBits == 0,
      s"bandBits must divide 64, got $bandBits")
    require(nbits % bandBits == 0, s"bandBits ($bandBits) must divide nbits ($nbits)")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val cands = srpCandidates(emb, nbits, bandBits, maxBucket, idCol, vecCol)
    val sym = cands.union(cands.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val vecs = emb.select(col(idCol).as("id"), normalize(col(vecCol)).as("v"))
    // shuffle_hash for the same reason as lshNearDupes: no broadcast,
    // no sort of the wide pair rows
    val scored = sym
      .join(vecs.select(col("id").as("id_a"), col("v").as("va")).hint("shuffle_hash"), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb")).hint("shuffle_hash"), "id_b")
      .select(col("id_a").as("query_id"), col("id_b").as("nbr_id"),
        round(graft.functions.fx.vecDot(col("va"), col("vb")), 6).as("cosine"))
    explodeTopK(
      scored.groupBy("query_id")
        .agg(graft.functions.fx.topKByScore(col("cosine"), col("nbr_id"), k).as("top")),
      "query_id", "nbr_id", "cosine")
  }
}
