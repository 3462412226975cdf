package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) — minimize both dimensions: keep the
  * points no other point beats on x (earlier in (x, y) order) with a
  * y that is not larger. The multi-objective shortlist primitive
  * (price-vs-size, latency-vs-cost, loss-vs-params).
  *
  * Scale shape — partition-wise skyline, then a prefix-minima merge:
  *
  *  1. range-shuffle the points on (x, y) so partition p holds a
  *     contiguous slice of the sort order (ONE shuffle, skew-safe via
  *     the range partitioner's reservoir sampling);
  *  2. per-partition local skyline with a window PARTITIONED by the
  *     slice id — never the unpartitioned `Window.orderBy` that
  *     serializes every point through one task (the naive
  *     formulation's scale-killer);
  *  3. cross-partition domination via each slice's strictly-before
  *     prefix y-minimum: a point also survives globally iff the
  *     minimum y over all EARLIER slices exceeds its y. The minima
  *     table is one row per slice (bounded by construction), folded
  *     with a triangular self-join and broadcast back — no global
  *     sort, no single-partition exchange anywhere in the plan
  *     (PlanSpec pins this).
  *
  * Local + prefix filter together are exactly the running-min
  * definition, so the result is identical to the single-window
  * formulation (the DuckDB oracle keeps that form). Ties: among
  * equal-x points the smallest y survives; an exact duplicate of a
  * frontier point is dominated (strict `>` test). Callers should
  * pre-dedup (x, y) pairs — the pareto_front query groupBys first. */
object Skyline {

  def front2d(
      df: DataFrame,
      xCol: String,
      yCol: String,
      partitions: Int = 32
  ): DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    val cols = df.columns
    val ranged = df.repartitionByRange(partitions, col(xCol), col(yCol))
      .withColumn("__pid", spark_partition_id())
    // local skyline: running strictly-before min-y within the slice
    val w = Window.partitionBy("__pid").orderBy(xCol, yCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn("__pm", min(col(yCol)).over(w))
      .filter(col("__pm").isNull || col("__pm") > col(yCol))
    // strictly-before prefix minima across slices: one row per slice,
    // triangular self-join over the bounded minima table (y keeps its
    // original type — no driver round-trip, no unpartitioned window)
    val mins = ranged.groupBy(col("__pid")).agg(min(col(yCol)).as("__ymin"))
    val prefix = mins.as("a")
      .join(mins.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(min(col("b.__ymin")).as("__prefix_min"))
    local
      .join(broadcast(prefix), Seq("__pid"), "left")
      .filter(col("__prefix_min").isNull || col("__prefix_min") > col(yCol))
      .select(cols.toSeq.map(col): _*)
  }
}
