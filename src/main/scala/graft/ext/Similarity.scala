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
  private def explodeTopK(
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

  /** IVF top-k: deterministic coarse centroids (the first `ncells`
    * corpus vectors by id — a fixed, reproducible quantizer; real
    * deployments would k-means, the partitioning math is identical),
    * corpus assigned to nearest cell once, queries probe `nprobe`
    * cells. Join key = cell id ⇒ the corpus×query match is pruned by
    * the quantizer instead of scanning everything.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      ncells: Int = 16,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    // The quantizer is tiny by definition (ncells centroids), so it is
    // collected once and inlined as a LITERAL array<struct<id, vec>> —
    // the per-row nearest-centroid argmin is then a pure projection.
    // (The alternative — joining a centroid DataFrame and ranking with
    // a window — shuffles the ENTIRE corpus by nbr_id just to pick each
    // row's best centroid.)
    val cents: Seq[(Long, Seq[Double])] = corpus.orderBy(col(idCol)).limit(ncells)
      .select(col(idCol).cast("long"), normalize(col(vecCol)))
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
    val centLit = typedlit(cents)

    // (−cos, cent_id) structs compare lexicographically, so array_min =
    // highest cosine with ties to the lowest centroid id — the same
    // order the window rank produced.
    def centScores(vec: Column): Column =
      transform(centLit, ct => struct(
        (-graft.functions.fx.vecDot(vec, ct.getField("_2"))).as("negcos"),
        ct.getField("_1").as("cent_id")))

    // corpus assignment: zero-shuffle per-row argmin projection
    val c = corpus.select(col(idCol).as("nbr_id"), normalize(col(vecCol)).as("cv"))
    val assigned = c.withColumn("cell",
      array_min(centScores(col("cv"))).getField("cent_id"))

    // queries probe their nprobe nearest cells (query side is small;
    // sort the ncells scores per row and take the prefix)
    val q = queries.select(col(idCol).as("query_id"), normalize(col(vecCol)).as("qv"))
    val probes = q
      .select(col("query_id"), col("qv"),
        explode(slice(array_sort(centScores(col("qv"))), 1, nprobe)).as("pc"))
      .select(col("pc.cent_id").as("cell"), col("query_id"), col("qv"))

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

  /** Signed-random-projection LSH signatures as a single long column
    * `sig`: `nbits` pseudo-random ±1 hyperplanes, deterministic per
    * (bit, dim) via a hash mix — no stored planes. Explode-then-
    * aggregate (like Dedup.minhashSignatures): one row per (id, dim),
    * nbits codegen'd `sum` aggregates with map-side combine, folded to
    * a long — the shape that survives 100 TB (and is ~100× faster
    * locally than per-row nested array lambdas). */
  def srpSignatures(
      emb: DataFrame,
      nbits: Int = 32,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val dims = emb.select(col(idCol).as("id"),
      posexplode(col(vecCol)).as(Seq("i", "v")))
    val projs = (0 until nbits).map { b =>
      sum(col("v").cast("double") *
        when(pmod(xxhash64(col("i") * nbits + lit(b)), lit(2)) === 0, 1.0).otherwise(-1.0))
        .as(s"p$b")
    }
    val agg = dims.groupBy("id").agg(projs.head, projs.tail: _*)
    val bits = (0 until nbits).map { b =>
      when(col(s"p$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    agg.select(col("id"), bits.reduce(_.bitwiseOR(_)).as("sig"))
  }

  /** Near-dup pairs via SRP banding + exact cosine verify ≥ threshold. */
  def lshNearDupes(
      emb: DataFrame,
      threshold: Double,
      nbits: Int = 32,
      bandBits: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val nbands = nbits / bandBits
    val sigs = emb.select(col(idCol).as("id"), normalize(col(vecCol)).as("v"))
      .join(srpSignatures(emb, nbits, idCol, vecCol), "id")
    val banded = sigs.select(col("id"), col("v"),
      posexplode(array((0 until nbands).map(i =>
        shiftright(col("sig"), i * bandBits).bitwiseAND((1L << bandBits) - 1)): _*))
        .as(Seq("band", "chunk")))
    banded.as("a").join(banded.as("b"),
        F.col("a.band") === F.col("b.band") &&
          F.col("a.chunk") === F.col("b.chunk") &&
          F.col("a.id") < F.col("b.id"))
      .select(F.col("a.id").as("id_a"), F.col("b.id").as("id_b"),
        F.col("a.v").as("va"), F.col("b.v").as("vb"))
      .distinct()
      .withColumn("cosine", round(graft.functions.fx.vecDot(col("va"), col("vb")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
