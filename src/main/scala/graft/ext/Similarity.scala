package graft.ext

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`ArrayType(FloatType)`).
  *
  * Three tiers:
  *  - bruteForceTopK — exact: query-set × corpus join, per-query top-k
  *    via window rank. Baseline + oracle. Corpus side streams; the
  *    (small) query side is broadcast, so NO shuffle of the corpus at
  *    all — at 100 TB this is one scan.
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

  /** Exact top-k neighbors for each query vector. `queries` and `corpus`
    * both carry (id, vector); every query gets its `k` nearest by cosine
    * (self-matches excluded when ids collide). Deterministic tie-break
    * by neighbor id. */
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
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("nbr_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "nbr_id", "cosine")
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
    val cents = corpus.orderBy(col(idCol)).limit(ncells)
      .select(col(idCol).as("cent_id"), normalize(col(vecCol)).as("cent"))
    val c = corpus.select(col(idCol).as("nbr_id"), normalize(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), normalize(col(vecCol)).as("qv"))

    // assign corpus rows to nearest centroid (broadcast the centroids)
    val wC = Window.partitionBy("nbr_id").orderBy(col("cent_cos").desc, col("cent_id").asc)
    val assigned = c.join(broadcast(cents), lit(true))
      .withColumn("cent_cos", graft.functions.fx.vecDot(col("cv"), col("cent")))
      .withColumn("rk", row_number().over(wC))
      .filter(col("rk") === 1)
      .select(col("cent_id").as("cell"), col("nbr_id"), col("cv"))

    // queries probe their nprobe nearest cells
    val wQ = Window.partitionBy("query_id").orderBy(col("cent_cos").desc, col("cent_id").asc)
    val probes = q.join(broadcast(cents), lit(true))
      .withColumn("cent_cos", graft.functions.fx.vecDot(col("qv"), col("cent")))
      .withColumn("rk", row_number().over(wQ))
      .filter(col("rk") <= nprobe)
      .select(col("cent_id").as("cell"), col("query_id"), col("qv"))

    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"), round(graft.functions.fx.vecDot(col("cv"), col("qv")), 6).as("cosine"))
      // same (query, nbr) can meet in several probed cells → dedup first
      .groupBy("query_id", "nbr_id").agg(max("cosine").as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "nbr_id", "cosine")
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
