package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation: stratified
  * rate sampling (language/domain mixing) and per-key caps (domain
  * quotas). Unlike `df.sample()` — whose output depends on partition
  * layout and a per-run seed — every decision here is a pure function
  * of the row's id, so a sample is reproducible across runs, engines,
  * partitionings AND incrementally stable: re-running over a grown
  * corpus keeps every previously-selected id (the property corpus
  * curation actually needs; Bernoulli re-sampling churns the subset).
  *
  * All decisions are codegen'd md5 expressions (no UDF, no rand()):
  * stratified sampling is a pure per-row filter (no shuffle at any
  * scale); capPerKey is one keyed shuffle (window per key).
  *
  * Reference analog: none (locopy never samples) — this is the
  * LLM-pipeline extension surface (SURVEY north-star): corpus
  * mixing/rebalancing is the step right after dedup+filter in any
  * 100 TB data pipeline.
  */
object Sample {

  /** 32-bit deterministic hash of (seed, id) as a non-negative long in
    * [0, 2³²): the first 8 hex chars of md5. Cross-engine portable —
    * DuckDB: `('0x' || substr(md5(seed || id::VARCHAR), 1, 8))::BIGINT`
    * — so sampling decisions are hash-oracle-able in plain SQL.
    * Integer-only (no float thresholds): callers compare against
    * `floor(rate · 2³²)`, avoiding decimal-vs-double literal semantics
    * differing across engines. */
  def hash32(id: Column, seed: String = ""): Column =
    conv(substring(md5(concat(lit(seed), id.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** The integer threshold for a sampling rate: keep iff
    * `hash32(id) < threshold(rate)`. */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    (rate * 4294967296L).toLong
  }

  /** Stratified sample: keep each row with its stratum's rate
    * (`defaultRate` for strata not in the map), decided by the
    * deterministic per-id hash. A pure per-row filter — pushed into
    * the scan stage, no shuffle, linear at any corpus size; expected
    * (not exact) stratum counts, like any hash/Bernoulli sampler. */
  def stratified(df: DataFrame, strataCol: String, rates: Map[String, Double],
                 idCol: String, seed: String = "",
                 defaultRate: Double = 0.0): DataFrame = {
    val rateThresh = rates.toSeq.sortBy(_._1).foldLeft(lit(threshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(threshold(rate))).otherwise(acc)
    }
    df.filter(hash32(col(idCol), seed) < rateThresh)
  }

  /** Rebalance a corpus to EXACT target mixture proportions — the
    * "train on 50 % en / 30 % de / 20 % fr" knob. Finds the largest
    * feasible total T = min over strata of count_s / share_s, then
    * keeps exactly floor(share_s · T) rows per stratum in
    * deterministic hash order; strata absent from `shares` are
    * dropped. Unlike [[stratified]] (expected counts), the output
    * mixture is exact to ±1 row per stratum.
    *
    * A stratum listed in `shares` but ABSENT from the data (or with
    * zero rows) drives T to 0 and the result is EMPTY: the exact
    * mixture contract cannot be met without that stratum, and an empty
    * sample is the only feasible exact answer. (The share map is
    * left-joined against the observed counts with `coalesce(n, 0)`,
    * so missing strata participate in the global min rather than
    * silently dropping out of it.)
    *
    * Plan: one tiny per-stratum count aggregate → single-row global
    * min → per-stratum quotas broadcast back; the corpus itself pays
    * one keyed window shuffle (the same cost as [[capPerKey]]). No
    * driver-side collect. All arithmetic is per-value IEEE (division,
    * min, product, floor) — bit-identical across engines, so the
    * survivor set is hash-oracle-able. */
  def balancedTo(df: DataFrame, strataCol: String, shares: Map[String, Double],
                 idCol: String, seed: String = ""): DataFrame = {
    require(shares.nonEmpty && shares.values.forall(s => s > 0.0 && s <= 1.0),
      s"shares must be positive fractions, got $shares")
    val reserved = Seq("__rn", "__stratum", "__n", "__share", "__k")
      .filter(df.columns.contains)
    require(reserved.isEmpty,
      s"balancedTo uses reserved working column(s) ${reserved.mkString(", ")} already present in the input")
    // Share map as the LEFT side so a listed-but-absent stratum still
    // contributes n=0 to the global min (empty result, not a silently
    // wrong mixture).
    val shareDf = df.sparkSession
      .createDataFrame(shares.toSeq.sortBy(_._1))
      .toDF("__stratum", "__share")
    val observed = df.groupBy(col(strataCol).cast("string").as("__obs"))
      .agg(count(lit(1)).cast("double").as("__obs_n"))
    val counts = shareDf
      .join(observed, col("__stratum") === col("__obs"), "left")
      .select(col("__stratum"), col("__share"),
        coalesce(col("__obs_n"), lit(0.0)).as("__n"))
    val t = counts.agg(min(col("__n") / col("__share")).as("__t"))
    val quotas = counts.crossJoin(broadcast(t))
      .select(col("__stratum"),
        floor(col("__share") * col("__t")).cast("long").as("__k"))
    val w = Window.partitionBy(strataCol)
      .orderBy(substring(md5(concat(lit(seed), col(idCol).cast("string"))), 1, 8),
        col(idCol))
    df.join(broadcast(quotas), col(strataCol).cast("string") === col("__stratum"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__k"))
      .drop("__stratum", "__k", "__rn")
  }

  /** Per-key quota: keep at most `k` rows per key, chosen in
    * deterministic hash order (a reproducible uniform draw, ties broken
    * by id). One keyed shuffle (window per key); no global ordering.
    * This is the per-domain cap of web-corpus pipelines (bound any one
    * domain's share of the training set). Skew note: a pathologically
    * hot key funnels its rows through one task — for k ≪ rows/key, a
    * pre-thinning `stratified` pass (rate ≈ 10k/rows) bounds that
    * before the exact window. */
  /** Temperature-scaled domain mixing weights — the multi-source
    * sampling schedule of multilingual / multi-domain pre-training
    * (e.g. the α-smoothed sampling of the XLM-R / mT5 recipes):
    * domain d with size `n_d` (Σ `weightCol`) gets sampling weight
    * `w_d = n_d^α / Σ_e n_e^α`. α = 1 reproduces natural proportions;
    * α → 0 approaches uniform; the usual 0 < α < 1 upsamples small
    * domains. Also emits `boost = w_d / natural_d` — the per-domain
    * repetition factor a sampler applies.
    *
    * Output: (domain, size, weight, boost), weights summing to 1.
    *
    * Scale shape: one map-side-combinable aggregation to the domain
    * relation (tiny by contract), one single-row total cross-joined
    * back — the corpus itself is touched once and never shuffled.
    * Cross-engine: pow/sum orders differ in the last ulp → callers
    * round the ratios (both 6 dp here), the repo's float discipline. */
  def temperatureWeights(df: DataFrame, domainCol: String,
                         weightCol: String, alpha: Double): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val sizes = df.groupBy(col(domainCol).as("domain"))
      .agg(sum(col(weightCol).cast("double")).as("size"))
      .withColumn("__pa", pow(col("size"), lit(alpha)))
    val tot = sizes.agg(sum("__pa").as("__tpa"), sum("size").as("__tn"))
    sizes.crossJoin(broadcast(tot))
      .select(col("domain"), col("size").cast("long").as("size"),
        round(col("__pa") / col("__tpa"), 6).as("weight"),
        round((col("__pa") / col("__tpa")) / (col("size") / col("__tn")), 6).as("boost"))
  }

  /** Deterministic train/validation/test split assignment: each row
    * draws the same md5 uniform as [[stratified]] and lands in the
    * first split whose cumulative fraction exceeds it — reproducible
    * across runs, partitionings, and engines, and STABLE under corpus
    * growth (a row's split never changes when other rows are added,
    * the property random shuffling lacks and every dataset-versioning
    * pipeline needs). Pure per-row projection: zero shuffles.
    *
    * `fractions` must be positive and sum to 1 (±1e-9); the last
    * split absorbs the rounding tail. */
  def assignSplits(df: DataFrame, fractions: Seq[(String, Double)],
                   idCol: String, seed: String = ""): DataFrame = {
    require(fractions.nonEmpty, "assignSplits requires at least one split")
    require(fractions.forall(_._2 > 0), s"fractions must be positive: $fractions")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    require(!df.columns.contains("split"),
      "assignSplits writes a 'split' column already present in the input")
    val u = conv(substring(md5(concat(lit(seed), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("double") / 4294967296.0
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val label = fractions.init.zip(cum.init)
      .foldRight(lit(fractions.last._1): Column) { case (((name, _), c), acc) =>
        when(u < lit(c), lit(name)).otherwise(acc)
      }
    df.withColumn("split", label)
  }

  /** Weighted sampling WITHOUT replacement (A-ES, Efraimidis &
    * Spirtes 2006): each row draws a deterministic uniform
    * u ∈ (0, 1] from the md5 of (seed, id) and keys itself with
    * u^(1/w); the k largest keys are the sample — inclusion
    * probability proportional to `weightCol` at every prefix, the
    * one-pass weighted-draw every data-mixing pipeline needs.
    *
    * Deterministic and cross-engine replayable: u is an exact md5-hex
    * arithmetic value, the key rounds to 9 dp before ranking (pow
    * differs across engines only in the last ulp), ties break by id.
    *
    * Scale shape: a pure per-row projection followed by a global
    * top-k — Spark plans `orderBy(...).limit(k)` as
    * TakeOrderedAndProject (per-partition bounded heads, never a full
    * sort); zero shuffles besides the k-row final gather. */
  def weightedSample(df: DataFrame, k: Int, weightCol: String, idCol: String,
                     seed: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!df.columns.contains("__k"),
      "weightedSample uses a reserved working column __k already present in the input")
    val u = (conv(substring(md5(concat(lit(seed), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("double") + 1.0) / 4294967296.0
    // A-ES is only defined for w > 0: w = 0 makes the exponent 1/0 = Inf
    // (key collapses to 0 or 1) and w < 0 inverts the ranking — both
    // SILENT corruptions, so fail the query on the first offending row
    // (distributed check, no driver collect)
    val w = when(col(weightCol).cast("double") > 0, col(weightCol).cast("double"))
      .otherwise(raise_error(concat(
        lit(s"weightedSample requires strictly positive $weightCol; got "),
        coalesce(col(weightCol).cast("string"), lit("null")))))
    df.withColumn("__k", round(pow(u, lit(1.0) / w), 9))
      .orderBy(col("__k").desc, col(idCol))
      .limit(k)
      .drop("__k")
  }

  /** DSIR-style hashed-n-gram importance log-weights (Xie et al.
    * 2023, arXiv:2302.03169): estimate a target-domain and a raw-corpus
    * unigram distribution over `buckets` hashed feature buckets, then
    * weight every document by `Σ_b f_b(d) · ln(p_target(b)/p_raw(b))`
    * — the data-selection score that upweights documents whose token
    * mass looks like the target domain. `isTarget` marks the
    * target-domain rows (both distributions come from the same corpus
    * scan); add-1 smoothing keeps every bucket finite.
    *
    * Scale shape: ONE explode of the token stream, bucketed by a pure
    * md5 projection; the two distributions are one groupBy over the
    * bucket key (B cells, map-side combinable) and the per-doc feature
    * table one (doc, bucket) aggregation; the log-ratio table is
    * B rows — broadcast-joined back. No windows, no driver state
    * beyond the B-row λ table.
    *
    * Determinism: bucket hashing is the portable md5 scheme
    * ([[hash32]]); each λ(b) is ONE division + ln over exact integer
    * products (< 2^53, exact in double → bit-identical cross-engine,
    * unrounded); the per-doc Σ f·λ is an aggregate sum → rounded to
    * 6 dp. The whole weighting replays exactly in SQL. */
  def dsirLogWeights(docs: DataFrame, isTarget: Column, buckets: Int = 64,
                     idCol: String = "doc_id", textCol: String = "text",
                     seed: String = "dsir"): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val toks = docs.select(col(idCol).as("__id"), isTarget.as("__tgt"),
      explode(graft.functions.tokens(col(textCol))).as("term"))
    val bucketed = toks.withColumn("b", pmod(hash32(col("term"), seed), lit(buckets.toLong)))
    val raw = bucketed.groupBy("b").agg(count(lit(1)).as("cr"))
    val tgt = bucketed.filter(col("__tgt")).groupBy("b").agg(count(lit(1)).as("ct"))
    val totals = bucketed.agg(
      count(lit(1)).as("tot_r"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("tot_t"))
    // λ(b) = ln( (ct+1)/(tot_t+B) / ((cr+1)/(tot_r+B)) ) as one
    // division of exact-int products — counts are < 2^26 and totals
    // < 2^27 at any plausible bucket count, so the products stay exact
    val lam = raw.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"), log(
        ((coalesce(col("ct"), lit(0L)) + 1L) * (col("tot_r") + buckets.toLong)).cast("double") /
          ((col("cr") + 1L) * (col("tot_t") + buckets.toLong)).cast("double")).as("lam"))
    val feats = bucketed.groupBy("__id", "b").agg(count(lit(1)).as("f"))
    feats.join(broadcast(lam), Seq("b"))
      .groupBy("__id")
      .agg(round(sum(col("f").cast("double") * col("lam")), 6).as("log_weight"),
        sum("f").as("n_tokens"))
      .select(col("__id").as(idCol), col("n_tokens"), col("log_weight"))
  }

  /** Deterministic minority OVERSAMPLING to per-stratum parity: every
    * stratum is replicated up to the LARGEST stratum's size — each row
    * gets `floor(target/n)` copies and the `target mod n` hash-smallest
    * rows one extra, so the output hits the target EXACTLY and the
    * replica multiset is a pure function of (ids, seed) — growth-stable
    * and shuffle-invariant like every sampler here (the upsampling twin
    * of [[balancedTo]]'s downsampling). Scale shape: one stratum-count
    * agg, a single-row max broadcast, one keyed rank window, a map-side
    * copy computation — replication happens logically via a `copies`
    * column (explode only if the caller materializes). */
  def oversampleTo(df: DataFrame, strataCol: String, idCol: String,
                   seed: String = ""): DataFrame = {
    val reserved = Seq("__rn", "__n", "__target", "__base", "__extra")
      .filter(df.columns.contains)
    require(reserved.isEmpty,
      s"oversampleTo uses reserved working column(s) ${reserved.mkString(", ")}")
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("__n"))
    val target = counts.agg(max("__n").as("__target"))
    val w = Window.partitionBy(strataCol)
      .orderBy(substring(md5(concat(lit(seed), col(idCol).cast("string"))), 1, 8),
        col(idCol))
    df.join(broadcast(counts), Seq(strataCol))
      .crossJoin(broadcast(target))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__base", floor(col("__target") / col("__n")).cast("long"))
      .withColumn("__extra", col("__target") - col("__base") * col("__n"))
      .select(col(idCol), col(strataCol),
        (col("__base") +
          when(col("__rn") <= col("__extra"), 1L).otherwise(0L)).as("copies"))
  }

  def capPerKey(df: DataFrame, keyCol: String, k: Int, idCol: String,
                seed: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!df.columns.contains("__rn"),
      "capPerKey uses a reserved working column __rn already present in the input")
    val w = Window.partitionBy(keyCol)
      .orderBy(substring(md5(concat(lit(seed), col(idCol).cast("string"))), 1, 8),
        col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
