package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: pair each point row with every
  * interval row whose half-open range `[start, end)` contains it, with
  * NO equi-key between the sides — the "events inside a campaign
  * window", "reads overlapping a gene", "timestamps inside an
  * experiment run" operator.
  *
  * Spark plans a bare `p >= s AND p < e` join condition as
  * BroadcastNestedLoopJoin (or CartesianProduct once the interval side
  * outgrows the broadcast threshold): O(|points| × |intervals|)
  * comparisons, the classic 100 TB cliff. The public fix (used by the
  * Databricks range-join optimization and most spatial engines) is
  * **bin bucketing**, composed here from built-ins per the repo's
  * compose-first rule:
  *
  *   1. pick a bin width `w`; every value `v` lives in the bin
  *      labelled by its lower bound `v - pmod(v, w)` (pure long
  *      arithmetic — Spark's `/` returns DOUBLE, which loses exactness
  *      past 2^53, i.e. for microsecond epochs, so no division ever
  *      happens),
  *   2. explode each interval to the bins it overlaps
  *      (`sequence(bin(s), bin(e - 1), step = w)` — `e` is exclusive),
  *   3. equi-join points to intervals on the bin column — a plain
  *      shuffled hash/merge join Catalyst can size, AQE-skew-split,
  *      and partially prune,
  *   4. re-check the exact predicate `s <= p < e` inside the matched
  *      bin.
  *
  * A point has exactly ONE bin and an interval lists each overlapped
  * bin ONCE, so the output carries no duplicates and needs no
  * `distinct`. Cost is |points| + Σ ceil(len/w) interval replicas
  * shuffled on a key with tunable fan-out: `w` ≈ the median interval
  * length keeps replication ≤ 2× while bounding each bin's cross
  * product to genuinely-close rows.
  *
  * Contracts: point/start/end must be integral (LongType after cast —
  * callers convert timestamps with `unix_timestamp`/`datediff` first,
  * keeping the bin arithmetic exact); empty (`end <= start`) and
  * null-valued intervals match nothing and are dropped up front (a
  * descending `sequence` would otherwise fabricate bins); null points
  * never match (SQL three-valued logic) and are dropped. Column sets
  * must not collide — the caller projects/renames first.
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val collisions = points.columns.toSet.intersect(intervals.columns.toSet)
    require(collisions.isEmpty,
      s"point and interval column names collide: $collisions; rename before joining")
    val reserved = Set("__bin", "__p", "__s", "__e")
    val reservedHits =
      reserved.intersect(points.columns.toSet ++ intervals.columns.toSet)
    require(reservedHits.isEmpty,
      s"pointInInterval reserves working columns $reserved; rename: $reservedHits")

    val w = lit(binWidth)
    // bin label = the bin's lower bound; pmod is non-negative for any
    // sign of c, so this is an exact floor to a multiple of w
    def bin(c: org.apache.spark.sql.Column) = c - pmod(c, w)

    val p = points
      .withColumn("__p", col(pointCol).cast("long"))
      .filter(col("__p").isNotNull)
      .withColumn("__bin", bin(col("__p")))
    val i = intervals
      .withColumn("__s", col(startCol).cast("long"))
      .withColumn("__e", col(endCol).cast("long"))
      .filter(col("__s").isNotNull && col("__e").isNotNull &&
        col("__e") > col("__s"))
      .withColumn("__bin",
        explode(sequence(bin(col("__s")), bin(col("__e") - 1), w)))

    p.join(i, p("__bin") === i("__bin") &&
        col("__p") >= col("__s") && col("__p") < col("__e"))
      .drop("__bin", "__p", "__s", "__e")
  }
}
