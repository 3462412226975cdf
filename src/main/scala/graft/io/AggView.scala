package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** An incrementally-maintained materialized AGGREGATE view over a
  * [[ManifestTable]] log: each ingest appends the batch's PARTIAL
  * aggregate (one tiny segment, O(distinct groups in the batch) rows),
  * and a read merges the partials with the aggregate's combine
  * function. Maintenance IO is O(batch) per ingest — the view never
  * re-reads the base data — and read IO is O(Σ partials), reset to
  * O(groups) by [[compact]]. This is the standard lakehouse pattern
  * for keeping a 100 TB fact stream's rollup queryable in seconds:
  * the raw log and the view share the same manifest commit primitive
  * (atomic publish, replay tags, crash-orphan GC), so view and base
  * stay in step batch-for-batch.
  *
  * Only aggregates with an associative-commutative merge are
  * expressible — count/sum/min/max (avg = sum/count at read time).
  * The stored representation invariant: a view column always holds a
  * PARTIAL in the aggregate's own merge domain (count merges by sum),
  * so compaction output is indistinguishable from a single big
  * partial and further ingests keep merging against it unchanged.
  *
  * Determinism note: floating-point sums are shuffle-order-dependent;
  * callers that need bit-stable results across replans cast the
  * measure to DECIMAL before [[ingest]] (exact, order-free sums) and
  * cast back at the read edge.
  */
object AggView {

  /** One aggregate column: `fn` ∈ count|sum|min|max applied to
    * `input` (ignored for count), surfaced as `as`. */
  final case class Agg(fn: String, input: String, as: String) {
    require(Set("count", "sum", "min", "max")(fn), s"unsupported agg fn: $fn")
    /** Batch-local partial. */
    private[io] def partial: Column = fn match {
      case "count" => count(lit(1)).as(as)
      case "sum"   => sum(col(input)).as(as)
      case "min"   => min(col(input)).as(as)
      case "max"   => max(col(input)).as(as)
    }
    /** Merge of stored partials (count merges by sum). */
    private[io] def merge: Column = fn match {
      case "count" | "sum" => sum(col(as)).as(as)
      case "min"           => min(col(as)).as(as)
      case "max"           => max(col(as)).as(as)
    }
  }

  /** View definition: grouping columns + aggregate columns (builder
    * style: `AggView.spec("k").count("n").sum("v", "s")`). */
  final case class Spec(groupCols: Seq[String], aggs: Seq[Agg]) {
    def count(as: String): Spec = copy(aggs = aggs :+ Agg("count", "", as))
    def sum(input: String, as: String): Spec = copy(aggs = aggs :+ Agg("sum", input, as))
    def min(input: String, as: String): Spec = copy(aggs = aggs :+ Agg("min", input, as))
    def max(input: String, as: String): Spec = copy(aggs = aggs :+ Agg("max", input, as))
    private[io] def checked: Spec = {
      require(aggs.nonEmpty, "a view needs at least one aggregate"); this
    }
  }
  def spec(groupCols: String*): Spec = Spec(groupCols, Seq.empty)

  /** Fold one batch into the view: group the batch, append the partial
    * as one manifest segment. `tag` gives at-least-once replay safety
    * exactly as in [[ManifestTable.append]] — derive it from the
    * micro-batch id and check [[ManifestTable.segments]] first when
    * the caller replays. */
  def ingest(spark: SparkSession, root: String, batch: DataFrame,
      spec0: Spec, tag: Option[String] = None): Unit = {
    val spec = spec0.checked
    val partial = batch.groupBy(spec.groupCols.map(col): _*)
      .agg(spec.aggs.head.partial, spec.aggs.tail.map(_.partial): _*)
    ManifestTable.append(spark, root, partial, tag = tag)
  }

  /** Current view contents: merge every stored partial. The scan is
    * O(Σ partial rows) — independent of base-table size. */
  def read(spark: SparkSession, root: String, spec0: Spec): DataFrame = {
    val spec = spec0.checked
    ManifestTable.read(spark, root)
      .groupBy(spec.groupCols.map(col): _*)
      .agg(spec.aggs.head.merge, spec.aggs.tail.map(_.merge): _*)
  }

  /** Fold all partial segments into one merged segment (the stored
    * form IS a valid partial — see the representation invariant), so
    * per-read merge cost resets to a single-segment scan. */
  def compact(spark: SparkSession, root: String, spec: Spec): Unit = {
    val snap = read(spark, root, spec).localCheckpoint()
    try ManifestTable.replace(spark, root, snap)
    finally graft.core.Lineage.release(snap)
  }
}
