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
  *
  * Also registers the lakehouse SQL face: the `graft.manifest` table
  * syntax (head / `@vN` / standard `VERSION AS OF` / `TIMESTAMP AS
  * OF`), `INSERT INTO` routed onto the log's commit verbs, and the
  * maintenance verbs as table functions (`graft_manifest_vacuum` etc.)
  * — everything-through-SQL, matching the reference's posture
  * (`locopy/database.py:131-190`).
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
    // row-level DML (DELETE/UPDATE/MERGE) over the resolved manifest
    // relation: converts in the resolution fixed point, BEFORE Spark's
    // own only-v2-tables rejection (which lives in the planner)
    e.injectResolutionRule(session => new ResolveManifestDml(session))
    // maintenance verbs as table functions: SELECT * FROM
    // graft_manifest_vacuum('/path', 3) — each returns a
    // LeafRunnableCommand, so the action runs exactly once per query
    // EXECUTION (planning/EXPLAIN never trigger it)
    GraftMaintenance.all.foreach { case (name, usage, builder) =>
      e.injectTableFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
  }
}

/** Analyzer rule resolving the pure-SQL manifest table syntax
  * (extension-registered sessions only — plain sessions use
  * `spark.read.format("graft.manifest")` + a temp view):
  *
  * {{{
  *   SELECT … FROM `graft.manifest`.`/wh/events__log`                -- head
  *   SELECT … FROM `graft.manifest`.`/wh/events__log@v3`             -- time travel (sugar)
  *   SELECT … FROM `graft.manifest`.`/wh/events__log` VERSION AS OF 3
  *   SELECT … FROM `graft.manifest`.`/wh/events__log`
  *     TIMESTAMP AS OF '2026-08-15 12:00:00'                         -- commit-time travel
  *   INSERT INTO `graft.manifest`.`/wh/events__log` SELECT …         -- append commit
  *   INSERT OVERWRITE `graft.manifest`.`/wh/events__log` SELECT …    -- replace commit
  * }}}
  *
  * Spark's own direct-query-on-files path only admits FileFormat
  * sources, so a manifest-resolving relation needs this rule — the
  * same extension-rule route the public lakehouse formats take. The
  * resolved relation is [[graft.sources.ManifestSource.relation]]
  * verbatim: committed-segment listing, snapshot pinning, zone-map +
  * Bloom + partition pruning all identical to the reader-API path.
  * INSERT resolves the target to an InsertableRelation wrapping the
  * log's append/replace commit verbs, so Spark's stock V1 insert path
  * (InsertIntoDataSourceCommand) does the column coercion and the
  * manifest does the atomic publish — never a raw parquet write into
  * the table root. */
class ResolveManifestRelation(spark: org.apache.spark.sql.SparkSession)
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
  import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan}
  import org.apache.spark.sql.execution.datasources.LogicalRelation

  private def isManifest(u: UnresolvedRelation): Boolean =
    u.multipartIdentifier.length == 2 &&
      u.multipartIdentifier.head.equalsIgnoreCase("graft.manifest")

  private def resolved(root: String, version: Option[Long]): LogicalPlan =
    LogicalRelation(
      graft.sources.ManifestSource.relation(spark, root, version,
        allowTombstones = false),
      isStreaming = false)

  /** `@vN` path-suffix sugar: only time-travels when the LITERAL path
    * is not itself a committed table — a table legitimately rooted at
    * `…/events@v2` must resolve to that table's head, never silently
    * to version 2 of a different table sharing the prefix. */
  private def parseSpec(spec: String): (String, Option[Long]) =
    spec.lastIndexOf("@v") match {
      case i if i > 0 && spec.drop(i + 2).nonEmpty &&
          spec.drop(i + 2).forall(_.isDigit) &&
          !graft.io.ManifestTable.exists(spark, spec) =>
        (spec.take(i), Some(spec.drop(i + 2).toLong))
      case _ => (spec, None)
    }

  /** TIMESTAMP AS OF → the newest manifest version whose commit
    * (manifest file) time is at or before the cutoff — O(versions)
    * driver metadata, no data IO. */
  private def versionAsOfTime(root: String, cutoffMs: Long): Long = {
    val vs = graft.io.ManifestTable.versionsWithTimes(spark, root)
    vs.filter(_._2 <= cutoffMs).map(_._1).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"no manifest version of $root committed at or before " +
          s"${java.time.Instant.ofEpochMilli(cutoffMs)} (earliest commit: " +
          vs.headOption.map(v => java.time.Instant.ofEpochMilli(v._2).toString)
            .getOrElse("none") + ")"))
  }

  private def evalCutoffMs(e: org.apache.spark.sql.catalyst.expressions.Expression): Long = {
    val cast = org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.TimestampType,
      Some(spark.sessionState.conf.sessionLocalTimeZone))
    require(cast.foldable,
      s"TIMESTAMP AS OF needs a literal timestamp, got $e")
    val micros = cast.eval(null)
    require(micros != null, s"TIMESTAMP AS OF evaluated to NULL: $e")
    micros.asInstanceOf[Long] / 1000L
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    // standard SQL time travel: VERSION AS OF n / TIMESTAMP AS OF ts
    case RelationTimeTravel(u: UnresolvedRelation, ts, ver) if isManifest(u) =>
      val spec = u.multipartIdentifier(1)
      (ver, ts) match {
        case (Some(vs), None) =>
          require(vs.forall(_.isDigit),
            s"VERSION AS OF on graft.manifest takes a numeric manifest version, got '$vs'")
          resolved(spec, Some(vs.toLong))
        case (None, Some(expr)) =>
          resolved(spec, Some(versionAsOfTime(spec, evalCutoffMs(expr))))
        case _ => throw new IllegalArgumentException(
          "time travel needs exactly one of VERSION AS OF / TIMESTAMP AS OF")
      }
    // INSERT INTO / INSERT OVERWRITE → the log's commit verbs
    case i: InsertIntoStatement =>
      i.table match {
        case u: UnresolvedRelation if isManifest(u) =>
          require(i.partitionSpec.isEmpty,
            "INSERT INTO graft.manifest does not take a PARTITION spec; " +
              "hive-layout segments ride ManifestTable.append(partitionBy=…)")
          val (root, version) = parseSpec(u.multipartIdentifier(1))
          require(version.isEmpty,
            s"cannot INSERT into a pinned version of $root — inserts " +
              "commit a new version at the head")
          i.copy(table = LogicalRelation(
            new graft.sources.ManifestInsertableRelation(spark, root),
            isStreaming = false))
        case _ => i
      }
    case u: UnresolvedRelation if isManifest(u) =>
      val (root, version) = parseSpec(u.multipartIdentifier(1))
      resolved(root, version)
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
