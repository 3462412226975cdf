package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization operators.
  *
  * The reference has no time-series surface (its `events`-shaped work
  * is delegated SQL); these cover what a metrics/feature pipeline runs
  * between raw event ingest and model input: fixed-grid resampling
  * with gap filling. Reference analog: none (SURVEY §2 notes the
  * events table exists only driver-side); pipeline necessity:
  * universal — every feature store materializes regular grids from
  * irregular events.
  */
object TimeSeries {

  /** Resample an irregular event stream onto a fixed `stepSeconds`
    * grid per key and fill gaps by Last-Observation-Carried-Forward:
    * one output row per (key, bucket) for EVERY bucket in the key's
    * observed [min, max] span — buckets with observations carry their
    * aggregate, empty buckets repeat the most recent earlier value
    * (`is_observed` distinguishes the two).
    *
    * `valAgg` is the per-bucket aggregate expression (e.g.
    * `sum(col("value"))`) evaluated over the key+bucket group.
    *
    * 100 TB shape — everything is keyed by the series key, nothing is
    * global: (1) the bucket aggregation is one map-side-combinable
    * keyed shuffle of (key, bucket, partial) triples; (2) each key's
    * span is a tiny two-value aggregate; (3) the grid materializes
    * DISTRIBUTED via per-key `sequence` + explode (no driver loop, no
    * cross join with a global calendar — a key spanning years yields
    * its rows inside its own partition); (4) the LOCF window
    * partitions by key — maximal parallelism, no global sort. Grid
    * rows per key = span/step: bound `stepSeconds` below by the
    * expected span (a year of 1-second grid is 31M rows/key — pick
    * the grid the consumer actually reads).
    *
    * The left join keeps grid rows without observations; `sequence`
    * always includes `lo` (every key has ≥ 1 observation by
    * construction), so `value_filled` is never null — the first grid
    * row of each key is its own first observation. */
  def resampleLocf(events: DataFrame, keyCol: String, tsCol: String,
                   valAgg: Column, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val step = lit(stepSeconds)
    // floor-to-grid in pure long arithmetic (ts - ts mod step): no
    // double round-trip on epoch seconds
    val secs = unix_timestamp(col(tsCol))
    val bucket = (secs - pmod(secs, step)).as("__b")
    val agg = events.groupBy(col(keyCol), bucket).agg(valAgg.as("__v"))
    val span = agg.groupBy(keyCol).agg(min("__b").as("__lo"), max("__b").as("__hi"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"), step)).as("__b"))
    val w = Window.partitionBy(keyCol).orderBy("__b")
    grid.join(agg, Seq(keyCol, "__b"), "left")
      .select(col(keyCol),
        timestamp_seconds(col("__b")).as("bucket_ts"),
        last("__v", ignoreNulls = true).over(w).as("value_filled"),
        col("__v").isNotNull.as("is_observed"))
  }

  /** Bounded-window exponentially-weighted moving average per key:
    * `ewma_t = Σ_{l=0..window-1} (1-α)^l · x_{t-l} / Σ_l (1-α)^l`
    * over the rows PRESENT among the last `window` observations in
    * (tsCol, tieCol) order — the truncated form of the recursive
    * EWMA, which a relational engine can compute as a fixed lag chain
    * instead of a sequential fold. Truncation error vs the infinite
    * recursion is (1-α)^window (≤ 0.1 % at α=0.3, window=20).
    *
    * Exactness: the weights are DOUBLE LITERALS computed once on the
    * driver and spelled into the oracle SQL verbatim, and the
    * numerator/denominator are fixed left-assoc chains of
    * products-of-literals. Even so, the result ROUNDS to 6 dp:
    * measured cross-engine drift is 1 ulp on a handful of rows — a
    * 20-term multiply-add chain invites fused-multiply-add
    * contraction, which is compiler/engine discretion the SQL text
    * cannot pin (unlike the 2-3-op chains the no-rounding rule covers
    * elsewhere in this repo).
    *
    * Scale shape: one keyed window (partition by key, no global
    * sort); the lag chain is `window` codegen'd expressions per row,
    * no self-join, no explode. */
  def ewma(events: DataFrame, keyCol: String, tsCol: String, valCol: String,
           tieCol: String, alpha: Double, window: Int = 20): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(window >= 1, s"window must be >= 1, got $window")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val weights = ewmaWeights(alpha, window)
    val x = col(valCol).cast("double")
    // l = 0 is the row's own value, not lag(x, 0) — offset-0 lag is an
    // engine-specific corner both here and in the oracle SQL
    def at(l: Int): Column = if (l == 0) x else lag(x, l).over(w)
    val num = weights.zipWithIndex.map { case (c, l) =>
        coalesce(at(l) * lit(c), lit(0.0))
      }.reduceLeft(_ + _)
    val den = weights.zipWithIndex.map { case (c, l) =>
        when(at(l).isNotNull, lit(c)).otherwise(lit(0.0))
      }.reduceLeft(_ + _)
    events.select(col(keyCol), col(tsCol), col(tieCol), x.as("value"),
      round(num / den, 6).as("ewma"))
  }

  /** Holt's linear (double-exponential) smoothing over the last
    * `window` observations per key — level + trend state and the
    * 1-step-ahead forecast `l + b`, the classic short-horizon
    * forecaster for metrics/capacity series (Holt 1957).
    *
    * The recursion `l_t = αy_t + (1−α)(l_{t−1}+b_{t−1}); b_t =
    * β(l_t−l_{t−1}) + (1−β)b_{t−1}` with the standard init
    * `l_1 = y_1, b_1 = y_2−y_1` is LINEAR in the observations, so the
    * whole window-`window` filter collapses to two fixed coefficient
    * ladders ([[holtWeights]]) — the same unroll-to-lag-chain trick as
    * [[ewma]], two ladders instead of one. Rows without a full
    * `window`-observation history are unscored by contract (the
    * truncated operator is only the documented fixed-window filter
    * when the window is full — a partial-window Holt re-derives
    * different ladders per length, unlike EWMA's simple
    * renormalization).
    *
    * Scale shape: ONE keyed window, `window` lag frames evaluated in a
    * single pass, no self-joins. Determinism: ladders are exact
    * driver-side doubles shared verbatim with the oracle; the per-row
    * 20-term dot products round to 6 dp (FMA-contraction ulp — the
    * [[ewma]] rule). */
  def holt(events: DataFrame, keyCol: String, tsCol: String, valCol: String,
           tieCol: String, alpha: Double, beta: Double,
           window: Int = 20): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(beta > 0 && beta < 1, s"beta must be in (0,1), got $beta")
    require(window >= 2, s"window must be >= 2, got $window")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val (lc, bc) = holtWeights(alpha, beta, window)
    val x = col(valCol).cast("double")
    def at(l: Int): Column = if (l == 0) x else lag(x, l).over(w)
    def dot(cs: Seq[Double]): Column =
      cs.zipWithIndex.map { case (c, l) => at(l) * lit(c) }.reduceLeft(_ + _)
    events.select(col(keyCol), col(tsCol), col(tieCol), x.as("value"),
        at(window - 1).isNotNull.as("__full"),
        round(dot(lc), 6).as("level"),
        round(dot(bc), 6).as("trend"))
      .filter(col("__full"))
      .select(col(keyCol), col(tsCol), col(tieCol), col("value"),
        col("level"), col("trend"),
        round(col("level") + col("trend"), 6).as("forecast"))
  }

  /** Sample autocorrelation function per key at lags 1..`maxLag` —
    * the seasonality/memory diagnostic run before choosing a
    * forecaster: `r_l = Σ(dev_t · dev_{t−l}) / Σ dev_t²` with
    * deviations from the per-key mean.
    *
    * Determinism: the mean is a shuffle-order sum → rounded to 6 dp
    * BEFORE deviations are formed (deviations and their products are
    * then pure per-row IEEE, bit-identical); numerator and denominator
    * sums round to 6 dp before the ratio, the ratio rounds to 6 dp —
    * the [[rollingZscore]] discipline. One keyed window pass computes
    * every lag column; one keyed aggregation forms all ratios; the
    * long (key, lag, acf) shape comes from exploding a `maxLag`-sized
    * literal array — no per-lag rescans. */
  def acf(events: DataFrame, keyCol: String, tsCol: String, valCol: String,
          tieCol: String, maxLag: Int = 5): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val x = col(valCol).cast("double")
    val keyed = events.select(col(keyCol), col(tsCol), col(tieCol), x.as("__v"))
    val mean = keyed.groupBy(keyCol).agg(round(avg("__v"), 6).as("__m"))
    val dev = keyed.join(mean, Seq(keyCol))
      .withColumn("__d", col("__v") - col("__m"))
    val lagged = (1 to maxLag).foldLeft(dev) { (df, l) =>
      df.withColumn(s"__d$l", lag(col("__d"), l).over(w))
    }
    val aggs =
      round(sum(col("__d") * col("__d")), 6).as("__den") +:
        (1 to maxLag).map(l =>
          round(sum(col("__d") * col(s"__d$l")), 6).as(s"__num$l"))
    val perKey = lagged.groupBy(keyCol).agg(aggs.head, aggs.tail: _*)
    perKey.select(col(keyCol),
        posexplode(array((1 to maxLag).map(l => col(s"__num$l")): _*))
          .as(Seq("__i", "__num")), col("__den"))
      .select(col(keyCol), (col("__i") + 1).as("lag"),
        round(col("__num") / col("__den"), 6).as("acf"))
  }

  /** Coefficient ladders (level, trend) for [[holt]]: run the Holt
    * recursion over symbolic unit inputs for a full `window`-length
    * history, yielding the two exact linear forms `l = Σ lc_k·y_{−k}`,
    * `b = Σ bc_k·y_{−k}` (index k = lag, 0 = newest row). Exact
    * driver-side double arithmetic, shared verbatim with oracle SQL —
    * same contract as [[ewmaWeights]]. */
  def holtWeights(alpha: Double, beta: Double,
                  window: Int): (Seq[Double], Seq[Double]) = {
    val n = window
    // coefficient vectors over observations o_1..o_n (oldest..newest)
    var l = Array.fill(n)(0.0)
    var b = Array.fill(n)(0.0)
    l(0) = 1.0 // l_1 = o_1
    b(0) = -1.0; b(1) = 1.0 // b_1 = o_2 − o_1
    for (t <- 2 to n) {
      val lPrev = l
      val bPrev = b
      l = Array.tabulate(n) { j =>
        (1.0 - alpha) * (lPrev(j) + bPrev(j)) + (if (j == t - 1) alpha else 0.0)
      }
      b = Array.tabulate(n) { j =>
        beta * (l(j) - lPrev(j)) + (1.0 - beta) * bPrev(j)
      }
    }
    // lag order: lag k sees observation o_{n−k}
    ((0 until n).map(k => l(n - 1 - k)), (0 until n).map(k => b(n - 1 - k)))
  }

  /** The (1-α)^l weight ladder as exact driver-side doubles — shared
    * with oracle-SQL generation so both engines consume identical
    * literals (repeated multiplication, NOT pow(), whose last ulp is
    * libm-dependent). */
  def ewmaWeights(alpha: Double, window: Int): Seq[Double] = {
    val b = Seq.newBuilder[Double]
    var c = 1.0
    for (_ <- 0 until window) { b += c; c = c * (1.0 - alpha) }
    b.result()
  }

  /** Fixed-grid resampling with LINEAR INTERPOLATION for interior
    * gaps (LOCF's smooth sibling — sensor/metrics pipelines want
    * interpolation for continuous signals, step-fill for state):
    * observed buckets carry their aggregate; an empty bucket between
    * two observations takes `prev + (next - prev) · (b - b_prev) /
    * (b_next - b_prev)`; leading/trailing gaps clamp to the nearest
    * observation (no extrapolation). The per-bucket aggregate is
    * rounded to 6 dp FIRST (it is a shuffle-order sum) — after that
    * every interpolation input is exact, so the blend arithmetic
    * replays bit-identically in the oracle. A double-valued epoch
    * fraction would not: `frac` divides exact longs, and the final
    * value is rounded to 6 dp on both engines for the last-ulp
    * product difference.
    *
    * Scale shape mirrors [[resampleLocf]]: keyed aggregation, per-key
    * distributed grid via sequence+explode, TWO keyed windows (last
    * non-null looking back, first non-null looking forward) — no
    * global anything. */
  def resampleInterp(events: DataFrame, keyCol: String, tsCol: String,
                     valAgg: Column, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val step = lit(stepSeconds)
    val secs = unix_timestamp(col(tsCol))
    val bucket = (secs - pmod(secs, step)).as("__b")
    val agg = events.groupBy(col(keyCol), bucket)
      .agg(round(valAgg, 6).as("__v"))
    val span = agg.groupBy(keyCol).agg(min("__b").as("__lo"), max("__b").as("__hi"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"), step)).as("__b"))
    val back = Window.partitionBy(keyCol).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keyCol).orderBy("__b")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsB = when(col("__v").isNotNull, col("__b"))
    val joined = grid.join(agg, Seq(keyCol, "__b"), "left")
      .select(col(keyCol), col("__b"), col("__v"),
        last("__v", ignoreNulls = true).over(back).as("__pv"),
        last(obsB, ignoreNulls = true).over(back).as("__pb"),
        first("__v", ignoreNulls = true).over(fwd).as("__nv"),
        first(obsB, ignoreNulls = true).over(fwd).as("__nb"))
    val interp =
      when(col("__v").isNotNull, col("__v"))
        .when(col("__pv").isNull, col("__nv")) // leading gap: clamp
        .when(col("__nv").isNull, col("__pv")) // trailing gap: clamp
        .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
          ((col("__b") - col("__pb")).cast("double") /
            (col("__nb") - col("__pb")).cast("double")))
    joined.select(col(keyCol),
      timestamp_seconds(col("__b")).as("bucket_ts"),
      round(interp, 6).as("value_interp"),
      col("__v").isNotNull.as("is_observed"))
  }

  /** Classical additive seasonal decomposition (the moving-average
    * method, Hyndman & Athanasopoulos FPP3 §3.4) of a per-key DAILY
    * series with odd period `p`: `trend` = centered p-day moving
    * average (null where the window is ragged), `seasonal` = the
    * mean detrended value of the row's weekday slot, centered so the
    * p slot effects sum to zero, `resid` = value − trend − seasonal.
    * The slot index derives from the epoch day (`day mod p`), not a
    * row_number — so it is a pure function of the date and replays
    * without any global ordering.
    *
    * Exactness ladder (every aggregate is a shuffle- or frame-order
    * sum, so each rounds to 6 dp on both engines before it feeds the
    * next stage): daily value → trend (window avg) → slot mean →
    * slot centering → residual subtraction (exact 2-op chain on
    * rounded inputs).
    *
    * Scale shape: one keyed daily aggregation; ONE keyed window
    * (partition by key, ROWS ±k frame — never a global window); slot
    * effects are a (key, slot) aggregation of p·keys rows broadcast
    * back; no self-joins, no driver state. */
  def decompose(events: DataFrame, keyCol: String, tsCol: String,
                agg: Column, period: Int = 7): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period must be odd and >= 3, got $period")
    val half = period / 2
    val daily = events
      .groupBy(col(keyCol), (unix_timestamp(date_trunc("day", col(tsCol)))
        / 86400L).cast("long").as("day"))
      .agg(round(agg, 4).as("value"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(-half, half)
    // centered MA only where the full window exists AND the days are
    // contiguous (ROWS frames count rows, not days — a date gap would
    // silently average non-adjacent days)
    val trended = daily
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__span", max(col("day")).over(w) - min(col("day")).over(w))
      .withColumn("trend",
        when(col("__n") === period && col("__span") === (period - 1),
          round(avg(col("value")).over(w), 6)))
      .withColumn("slot", pmod(col("day"), lit(period)))
    val slotMeans = trended
      .filter(col("trend").isNotNull)
      .groupBy(col(keyCol), col("slot"))
      .agg(round(avg(col("value") - col("trend")), 6).as("raw_eff"))
    val centered = slotMeans
      .withColumn("seasonal",
        round(col("raw_eff") -
          round(avg(col("raw_eff")).over(Window.partitionBy(keyCol)), 6), 6))
      .select(col(keyCol), col("slot"), col("seasonal"))
    trended.join(centered, Seq(keyCol, "slot"), "left")
      .select(col(keyCol), col("day"), col("slot"), col("value"),
        col("trend"),
        col("seasonal"),
        round(col("value") - col("trend") - col("seasonal"), 6).as("resid"))
  }

  /** Rolling z-score anomaly detection: each observation scored
    * against the mean/stddev of the `window` PRECEDING observations
    * in (ts, tie) order within its key — the self-baselining outlier
    * flag (metric spikes, fraud velocity, sensor faults) that needs
    * no trained model. Only rows with a full lookback AND a non-zero
    * rolling stddev are scored (a constant baseline has no scale;
    * z is null there, flagged false).
    *
    * Cross-engine exactness: the rolling mean and stddev round to
    * 6 dp BEFORE the z ratio on both engines (aggregate sums drift in
    * the last ulp, and a ratio amplifies the band near small stddev);
    * z then rounds to 6 dp, and `is_anomaly` compares the ROUNDED z —
    * deterministic and identically replayable in SQL.
    *
    * Scale shape: ONE keyed window (partitioned by the series key,
    * never unpartitioned), three frame aggregates over the same frame
    * — count, avg, stddev — evaluated in a single WindowExec pass. */
  def rollingZscore(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      tieCol: String,
      window: Int = 20,
      threshold: Double = 3.0
  ): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    // refuse, don't overwrite: these working/output columns would
    // silently replace (and partially drop) caller data (the AsOfJoin
    // reserved-column convention)
    val reserved = Seq("__n", "__mu", "__sd", "z", "is_anomaly")
    val hits = reserved.filter(events.columns.contains)
    require(hits.isEmpty,
      s"rollingZscore reserves columns $reserved; rename input columns: $hits")
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
      .rowsBetween(-window, -1)
    val v = col(valCol).cast("double")
    events
      .withColumn("__n", count(v).over(w))
      .withColumn("__mu", round(avg(v).over(w), 6))
      .withColumn("__sd", round(stddev_samp(v).over(w), 6))
      .withColumn("z",
        when(col("__n") === window && col("__sd") > 0.0,
          round((v - col("__mu")) / col("__sd"), 6)))
      .withColumn("is_anomaly",
        col("z").isNotNull && abs(col("z")) > threshold)
      .drop("__n", "__mu", "__sd")
  }
}
