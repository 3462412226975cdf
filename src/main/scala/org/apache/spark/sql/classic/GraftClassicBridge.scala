package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge into `private[classic]` column-node machinery (see
  * [[org.apache.spark.sql.GraftColumnBridge]] — same pattern, no
  * logic): eagerly converts the lazy `ColumnNodeExpression` wrappers
  * the public Column API produces into real Catalyst trees so callers
  * can inspect/transform them. */
private[sql] object GraftClassicBridge {
  def materialize(e: Expression): Expression = e.transformUp {
    case cne: ColumnNodeExpression => ColumnNodeToExpressionConverter(cne.node)
  }
}
