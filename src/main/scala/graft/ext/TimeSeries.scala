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
}
