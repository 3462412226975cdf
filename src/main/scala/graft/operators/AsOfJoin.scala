package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: attach to each left row the value
  * columns of the most recent right row with the same key and
  * `right.time <= left.time` — the standard feature-attachment /
  * point-in-time-correctness operator of training-data pipelines
  * (join events to the latest prior dimension state without leakage).
  *
  * Spark has no native as-of join, and the preference order for custom
  * operators is compose-first: these semantics ARE expressible with
  * built-ins, as the classic union + running `last(ignoreNulls)`
  * window —
  *
  *   1. union both sides by name (right rows carry the value columns,
  *      left rows carry null there),
  *   2. one window partitioned by key, ordered by (time, side) with
  *      right rows (side 0) before left rows (side 1) at equal
  *      timestamps — so a right row AT the left time is visible
  *      (inclusive semantics, matching DuckDB `ASOF JOIN ... ON l.t >=
  *      r.t`),
  *   3. running `last(value, ignoreNulls = true)` carries the latest
  *      right value forward; keep side-1 rows.
  *
  * Scale shape: ONE shuffle of |left| + |right| rows on the key, no
  * join node at all — no per-key row explosion (a naive inequality
  * join is a per-key cross product before aggregation), no broadcast,
  * skew bounded by the largest single key exactly like any windowed
  * aggregation.
  *
  * Contracts: left/right value-column names must not collide (the
  * union is by name); a null in a right value column is treated as
  * absent (the window skips to the previous non-null); when several
  * right rows share (key, time) the carried value among them is
  * tie-ordering-dependent — pass value columns that are functions of
  * (key, time) (or pre-aggregate) where full determinism matters.
  */
object AsOfJoin {

  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String,
      rightVals: Seq[String]
  ): DataFrame = {
    require(rightVals.nonEmpty, "asOf requires at least one right value column")
    val collisions = rightVals.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"right value columns collide with left columns: $collisions")
    // the working columns below would silently overwrite (and then drop)
    // same-named caller columns — refuse instead of losing data
    val reserved = Set("__k", "__t", "__side")
    val reservedHits = reserved.intersect(left.columns.toSet ++ right.columns.toSet)
    require(reservedHits.isEmpty,
      s"asOf reserves working columns $reserved; rename input columns: $reservedHits")

    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime).cast("timestamp"))
      .withColumn("__side", lit(1))
    // right rows with a null key or null time can never satisfy
    // `l.key = r.key AND l.t >= r.t` (null comparisons are never true),
    // so drop them up front — otherwise the window would group null
    // keys together and sort null times before everything, silently
    // attaching values an as-of join must not attach. Left rows with a
    // null key/time keep flowing and (correctly) pick up nulls.
    val r = right.select(
      (col(rightKey).as("__k") ::
        col(rightTime).cast("timestamp").as("__t") ::
        lit(0).as("__side") ::
        rightVals.map(col).toList): _*)
      .filter(col("__k").isNotNull && col("__t").isNotNull)

    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = rightVals.foldLeft(unioned) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    attached.filter(col("__side") === 1).drop("__k", "__t", "__side")
  }

  /** [[asOf]] with a staleness bound: the carried right row must lie
    * within `toleranceSeconds` of the left time, else the attachment
    * nulls out (pandas `merge_asof(tolerance=...)`). Because the as-of
    * match IS the most recent right row, match-then-null-out is exact:
    * no earlier right row could be within the window if the latest is
    * not. Same single-shuffle window plan plus one carried right-time
    * column. */
  def asOfTolerance(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String,
      rightVals: Seq[String],
      toleranceSeconds: Long
  ): DataFrame = {
    require(toleranceSeconds >= 0, s"tolerance must be >= 0, got $toleranceSeconds")
    require(!right.columns.contains("__rt"),
      "right side already carries the reserved working column __rt")
    val withRt = right.withColumn("__rt", col(rightTime).cast("timestamp"))
    val attached = asOf(left, withRt, leftKey, leftTime, rightKey, rightTime,
      rightVals :+ "__rt")
    // Microsecond epochs: whole-second unix_timestamp would truncate
    // sub-second stamps and misclassify boundary rows by up to ~1s.
    val fresh = col("__rt").isNotNull &&
      unix_micros(col(leftTime).cast("timestamp")) - unix_micros(col("__rt")) <=
        toleranceSeconds * 1000000L
    rightVals.foldLeft(attached) { (d, c) =>
      d.withColumn(c, when(fresh, col(c)))
    }.drop("__rt")
  }
}
