package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the "don't rescan the corpus"
  * contract of warehouse rollups: a persisted per-key aggregate STATE
  * table absorbs a new batch's partial aggregates by ALGEBRAIC merge
  * (counts and sums add, mins/maxes fold), producing exactly the
  * aggregate a full recompute over all data would — the oracle gate
  * proves that equivalence. Averages and other derived statistics are
  * ratios of maintained sums, so they stay derivable after any number
  * of merges.
  *
  * Scale shape: the state table is keyed (bounded by key cardinality,
  * not history size) and the batch aggregates map-side before the ONE
  * keyed merge shuffle — the whole point at 100 TB: the historical
  * corpus is never rescanned, only |keys| rows move.
  */
object Incremental {

  /** Merge two partial-aggregate tables sharing a schema: `sumCols`
    * add (counts are sums of 1), `minCols`/`maxCols` fold. Keys
    * present in either side survive (full-outer semantics via
    * union + re-aggregate — one keyed shuffle, no join needed: the
    * merge functions are the aggregate functions themselves). */
  def mergePartials(
      state: DataFrame,
      delta: DataFrame,
      keyCols: Seq[String],
      sumCols: Seq[String],
      minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil
  ): DataFrame = {
    require(keyCols.nonEmpty, "mergePartials requires at least one key column")
    require(sumCols.nonEmpty || minCols.nonEmpty || maxCols.nonEmpty,
      "mergePartials requires at least one aggregate column")
    val needed = keyCols ++ sumCols ++ minCols ++ maxCols
    for (side <- Seq(state, delta)) {
      val missing = needed.filterNot(side.columns.contains)
      require(missing.isEmpty, s"columns not in partial table: $missing")
    }
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      minCols.map(c => min(col(c)).as(c)) ++
      maxCols.map(c => max(col(c)).as(c))
    state.select(needed.map(col): _*)
      .unionByName(delta.select(needed.map(col): _*))
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
