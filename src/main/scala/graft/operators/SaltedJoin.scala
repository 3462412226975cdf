package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A plain shuffle join sends every row of a hot key to ONE reducer;
  * at 100 TB a single pathological key (the empty document, a default
  * user id, a null-like sentinel) turns the stage into one straggler
  * task. Salting splits each hot key across `salts` reducers:
  *
  *   - the (big, skewed) left side gets a DETERMINISTIC salt in
  *     [0, salts) — a hash of caller-chosen columns, so reruns are
  *     stable (no rand(): nondeterministic tasks break retries and
  *     result reproducibility),
  *   - the (smaller) right side is replicated once per salt value,
  *   - the join key becomes (key, salt).
  *
  * Output equals the plain inner equi-join row-for-row (verified by
  * the salted_join oracle); cost is `salts`× replication of the right
  * side — the usual trade when only the left is hot. AQE's runtime
  * skew-split covers sort-merge joins adaptively; explicit salting
  * remains the tool when skew is known up front, survives into
  * aggregations, or the join is bucketed/broadcast where AQE skew
  * handling does not apply.
  */
object SaltedJoin {

  def saltedInner(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      salts: Int,
      saltBy: Column
  ): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    // the working column would silently overwrite (then drop) a caller
    // column of the same name — refuse instead of losing data
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedInner reserves the working column __salt; rename the input column")
    val l = left.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts)).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    // dataframe-qualified key references so leftKey == rightKey (the
    // common equi-join shape) does not hit AMBIGUOUS_REFERENCE
    l.join(r, l("__salt") === r("__salt") && l(leftKey) === r(rightKey))
      .drop("__salt")
  }
}
