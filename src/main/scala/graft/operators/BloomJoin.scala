package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-prefiltered join: semi-join reduction for the "big fact ⋈
  * selective dim" shape where the dim is too large (or the planner too
  * conservative) to broadcast-hash-join outright, but a few hundred KB
  * Bloom filter of its keys IS shippable.
  *
  * Build one Bloom filter over the small side's join keys (a single
  * all-reduce aggregation), then filter the big side with the
  * codegen'd `might_contain` BEFORE its shuffle — rows that cannot
  * match never enter the exchange. At 100 TB this is the difference
  * between shuffling the whole fact table and shuffling only the ~hit
  * fraction; it is exactly the semi-join reduction Spark's own runtime
  * row-group filtering performs, exposed as a deterministic operator
  * the caller controls (and with the filter usable across several
  * joins of the same key).
  *
  * False positives pass the Bloom stage but are eliminated by the
  * exact join that follows — the result is ALWAYS identical to the
  * plain inner join (the equality the oracle checks); fpp only moves
  * the shuffle-reduction ratio.
  *
  * The one driver-side transfer is the filter itself (`numBits`/8
  * bytes, one row) — the same bounded payload a broadcast would ship,
  * NOT a corpus collect.
  */
object BloomJoin {

  /** Bloom filter over a column's xxhash64 values, as driver bytes. */
  private def buildBloom(small: DataFrame, key: String,
                         expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      expression(xxhash64(col(key))),
      expression(lit(expectedItems)),
      expression(lit(numBits))).toAggregateExpression()
    small.select(column(agg).as("bf")).head().getAs[Array[Byte]]("bf")
  }

  /** A reusable `might_contain` predicate for `keyCol` against the
    * small side's key set. */
  def mightContain(small: DataFrame, smallKey: String, keyCol: Column,
                   expectedItems: Long = 1000000L,
                   numBits: Long = 8388608L): Column = {
    val bytes = buildBloom(small, smallKey, expectedItems, numBits)
    column(BloomFilterMightContain(
      Literal(bytes, BinaryType), expression(xxhash64(keyCol))))
  }

  /** Inner join with Bloom semi-join reduction on the big side.
    * Null big-side keys are dropped by the Bloom stage (`might_contain`
    * of null is null) — identical to inner-join semantics. */
  def bloomInner(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 expectedItems: Long = 1000000L,
                 numBits: Long = 8388608L): DataFrame = {
    val pruned = big.filter(
      mightContain(small, smallKey, col(bigKey), expectedItems, numBits))
    pruned.join(small, col(bigKey) === col(smallKey))
  }
}
