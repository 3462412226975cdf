package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{SortedIntersectCount, TopKByScore, VecDotProduct}

/** Engine extensions: registers the custom Catalyst expressions as SQL
  * functions so `spark.sql` users reach them too:
  *
  *   spark = SparkSession.builder()
  *     .withExtensions(new GraftExtensions).getOrCreate()
  *   spark.sql("SELECT vec_dot(a, b), sorted_intersect_count(x, y) ...")
  *
  * (The reference has no user-extension surface at all — SURVEY §2.3
  * UDF row; this is engine-native extensibility via the public
  * SparkSessionExtensions API.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // full 11-arg constructor (the 5-arg shorthand is deprecated):
  // (className, db, name, usage, arguments, examples, note, group,
  // since, deprecated, source)
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - count of common elements of two sorted, deduped array<bigint>"),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two array<double>"),
      (args: Seq[Expression]) => VecDotProduct(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("topk_by_score"),
      info("topk_by_score",
        "topk_by_score(score, id, k) - aggregate: top k (score, id) pairs per group, best first"),
      (args: Seq[Expression]) => GraftExtensions.buildTopK(args)))
    // HINT-batch placement, not the resolution batch: Spark's own
    // ResolveSQLOnFile recognizes the registered source name and
    // throws UNSUPPORTED_DATASOURCE_FOR_DIRECT_QUERY for any
    // non-FileFormat source before a same-batch custom rule can win —
    // the hint batch runs earlier, so the relation resolves first
    e.injectHintResolutionRule(session => new ResolveManifestRelation(session))
  }
}

/** Analyzer rule resolving the pure-SQL manifest table syntax
  * (extension-registered sessions only — plain sessions use
  * `spark.read.format("graft.manifest")` + a temp view):
  *
  * {{{
  *   SELECT … FROM `graft.manifest`.`/warehouse/events__log`       -- head
  *   SELECT … FROM `graft.manifest`.`/warehouse/events__log@v3`    -- time travel
  * }}}
  *
  * Spark's own direct-query-on-files path only admits FileFormat
  * sources, so a manifest-resolving relation needs this rule — the
  * same extension-rule route the public lakehouse formats take. The
  * resolved relation is [[graft.sources.ManifestSource.relation]]
  * verbatim: committed-segment listing, snapshot pinning, zone-map +
  * Bloom + partition pruning all identical to the reader-API path. */
class ResolveManifestRelation(spark: org.apache.spark.sql.SparkSession)
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation if u.multipartIdentifier.length == 2 &&
        u.multipartIdentifier.head.equalsIgnoreCase("graft.manifest") =>
      val spec = u.multipartIdentifier(1)
      // @v only time-travels when the LITERAL path is not itself a
      // committed table: a table legitimately rooted at …/events@v2
      // must resolve to that table's head, never silently to version
      // 2 of a different table that happens to share the prefix
      val (root, version) = spec.lastIndexOf("@v") match {
        case i if i > 0 && spec.drop(i + 2).nonEmpty &&
            spec.drop(i + 2).forall(_.isDigit) &&
            !graft.io.ManifestTable.exists(spark, spec) =>
          (spec.take(i), Some(spec.drop(i + 2).toLong))
        case _ => (spec, None)
      }
      org.apache.spark.sql.execution.datasources.LogicalRelation(
        graft.sources.ManifestSource.relation(spark, root, version,
          allowTombstones = false),
        isStreaming = false)
  }
}

object GraftExtensions {

  /** SQL builder for the [[TopKByScore]] aggregate: `k` must be an
    * integral literal (the heap is sized at plan time). The score is
    * cast to double exactly like the Column API (`fx.topKByScore`)
    * does, so SQL and Column callers accept the same inputs. The
    * analyzer wraps returned AggregateFunctions in an
    * AggregateExpression itself. */
  private[plans] def buildTopK(args: Seq[Expression]): Expression = {
    require(args.length == 3, s"topk_by_score expects (score, id, k), got ${args.length} args")
    val k = args(2) match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
      case Literal(v: Long, org.apache.spark.sql.types.LongType) => v.toInt
      case other => throw new IllegalArgumentException(
        s"topk_by_score: k must be an integer literal, got $other")
    }
    TopKByScore(
      org.apache.spark.sql.catalyst.expressions.Cast(
        args(0), org.apache.spark.sql.types.DoubleType),
      args(1), k)
  }

  /** Register the same functions on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count", args => SortedIntersectCount(args(0), args(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", args => VecDotProduct(args(0), args(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_by_score", buildTopK, "built-in")
  }
}
