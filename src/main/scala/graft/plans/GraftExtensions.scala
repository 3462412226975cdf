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
