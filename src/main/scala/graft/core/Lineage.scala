package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for `localCheckpoint`-based iterative operators.
  *
  * `Dataset.localCheckpoint()` persists its rows in the block manager
  * and TRUNCATES lineage — the blocks are the only copy, and they are
  * never released automatically. An iterative operator that checkpoints
  * per round (connected components, PageRank) therefore leaks one
  * RDD's worth of executor storage per iteration, and a long-lived
  * session running many such operators back-to-back degrades as the
  * block manager fills (measured: dedup_ngram 6.9 s in a fresh session
  * vs 75 s late in a 107-query suite, round 4). Operators must release
  * each round's intermediate once the next round has materialized.
  */
object Lineage {

  /** The persisted RDD backing `df` IFF `df` is exactly a checkpoint
    * result (its analyzed plan is a bare `LogicalRDD` root). Frames
    * merely *derived from* a checkpoint return None on purpose:
    * unpersisting a local checkpoint that someone still reads loses
    * the data unrecoverably (lineage is gone), so only the owner of
    * the checkpoint call may release it. */
  def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => Some(lr.rdd)
      case _              => None
    }

  /** Release the block-manager storage behind checkpointed frames that
    * have no remaining consumers. Safe on non-checkpoint frames
    * (no-op). The released frames must never be read again. */
  def release(dfs: DataFrame*): Unit =
    dfs.foreach(df => checkpointRdd(df).foreach(_.unpersist(blocking = false)))

  /** Drop EVERY persisted RDD and cached query in the session — the
    * between-queries sweep for harnesses (Bench) that run many
    * independent queries in one JVM, so no query is measured under a
    * predecessor's leaked storage. BLOCKING: the sweep runs outside
    * the timed region, so waiting is free — and a non-blocking sweep
    * would let block-manager cleanup from query N overlap query N+1's
    * timed region, the same cross-query pollution (smaller) the sweep
    * exists to eliminate. Never call this while a frame you still
    * need is checkpointed. */
  def sweep(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }
}
