package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency / membership sketches — the fixed-size summaries that
  * answer "how often / have I seen this key" over a corpus too large
  * to hold a per-key table hot (reference analog: the approximate
  * profiling layer next to locopy's `find_column_type` sampling,
  * `/root/reference/locopy/utility.py:323`).
  *
  * Both sketches derive their hash positions from
  * [[graft.functions.md5Hash60]] (first 15 md5 hex chars as int), so
  * any engine with `md5` replays the exact cell/bit layout in plain
  * SQL — build, estimate, and false positives are all
  * hash-oracle-able, no tolerance band needed.
  *
  * Scale shape (the whole point of a sketch): the build is ONE linear
  * scan with a `depth`× row explode into a keyed aggregation whose
  * result is bounded by `depth · width` (CMS) or `bits` (Bloom) —
  * map-side combinable, merge-able across partitions/days by cell-wise
  * `sum` / bit-wise `or`, independent of corpus row count. Probing
  * joins the fixed-size sketch (legitimately `broadcast()`-able — it
  * is parameter-sized, never data-sized) against the probe keys. */
object Sketch {

  private def position(i: Int, key: Column, width: Int): Column =
    pmod(graft.functions.md5Hash60(concat(lit(i.toString), lit(":"), key.cast("string"))),
      lit(width.toLong))

  /** Count–min sketch cells `(i, pos, n)` for `keyCol`: row counts per
    * (hash row `i` < depth, `md5(i ":" key) % width`) cell. */
  def countMinBuild(
      df: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 512
  ): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val rows = (0 until depth).map { i =>
      struct(lit(i).as("i"), position(i, col(keyCol), width).as("pos"))
    }
    df.select(explode(array(rows: _*)).as("c"))
      .groupBy(col("c.i").as("i"), col("c.pos").as("pos"))
      .agg(count(lit(1)).as("n"))
  }

  /** Point estimates for `probes(keyCol)` against CMS `cells`:
    * `min_i cells(i, h_i(key))` — the classic one-sided overestimate
    * (absent cells count 0, though a built sketch always has every
    * probed cell when the key was seen). */
  def countMinEstimate(
      cells: DataFrame,
      probes: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 512
  ): DataFrame = {
    val rows = (0 until depth).map { i =>
      struct(lit(i).as("i"), position(i, col(keyCol), width).as("pos"))
    }
    val probePos = probes.select(col(keyCol), explode(array(rows: _*)).as("c"))
      .select(col(keyCol), col("c.i").as("i"), col("c.pos").as("pos"))
    probePos.join(broadcast(cells), Seq("i", "pos"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_est"))
  }

  /** Bloom filter over the distinct keys of `keyCol`: the DISTINCT
    * set-bit positions for `k` md5-derived hash functions into `bits`
    * bit slots. At most `bits` rows regardless of corpus size. */
  def bloomBuild(
      df: DataFrame,
      keyCol: String,
      k: Int = 4,
      bits: Int = 4096
  ): DataFrame = {
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    require(bits >= 2, s"bits must be >= 2, got $bits")
    val rows = (0 until k).map(i => position(i, col(keyCol), bits).as(s"p$i"))
    df.select(explode(array(rows.map(_.cast("long")): _*)).as("pos")).distinct()
  }

  /** Membership test: key is reported present iff ALL `k` of its bit
    * positions are set. Returns `probes` plus a `bloom_member` flag —
    * no false negatives, deterministic (hence replayable) false
    * positives. The filter side is parameter-sized, so the join
    * broadcasts it explicitly. */
  def bloomContains(
      filter: DataFrame,
      probes: DataFrame,
      keyCol: String,
      k: Int = 4,
      bits: Int = 4096
  ): DataFrame = {
    val rows = (0 until k).map(i => position(i, col(keyCol), bits).as(s"p$i"))
    val probePos = probes.select(col(keyCol), explode(array(rows.map(_.cast("long")): _*)).as("pos"))
    probePos.join(broadcast(filter), Seq("pos"), "left_semi")
      .groupBy(keyCol).agg(count(lit(1)).as("hits"))
      .join(probes, Seq(keyCol), "right")
      .select(col(keyCol), (coalesce(col("hits"), lit(0L)) === k).as("bloom_member"))
  }
}
