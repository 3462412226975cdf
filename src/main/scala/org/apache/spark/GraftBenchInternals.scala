package org.apache.spark

import java.io.File

/** Bridge into `private[spark]` cleanup/telemetry internals for the
  * [[graft.Bench]] harness. Lives in `org.apache.spark` purely for
  * access (the [[org.apache.spark.sql.GraftColumnBridge]] pattern);
  * contains no engine logic.
  *
  * Why it exists: shuffle files in `spark.local.dir` are normally
  * reaped only when the JVM GC collects the owning `ShuffleDependency`
  * and `ContextCleaner` processes the weak-reference queue. A
  * 160-query × 3-run bench suite in one JVM generates ~500 shuffles
  * whose dependency objects die at unpredictable GC times, so disk
  * debt accumulates across the suite and late queries pay it in
  * filesystem latency (round-6/7 audits measured 7–9× inflation on
  * victim queries vs isolated runs, with the code byte-identical).
  * Driving the cleanup DETERMINISTICALLY between measurements removes
  * the GC lottery from the timings. */
object GraftBenchInternals {

  /** Synchronously unregister and delete every shuffle currently
    * registered with the map-output tracker: map statuses, block
    * manager state, and the on-disk `shuffle_*.{data,index}` files.
    * Exactly what `ContextCleaner` does when a `ShuffleDependency` is
    * GC-collected, minus the wait for GC. Only call between queries:
    * a cleaned shuffle cannot be re-read (fresh DataFrames build
    * fresh shuffles, so inter-query reuse never happens; intra-query
    * reuse — AQE `ReusedExchange` — is within one execution).
    * Returns the number of shuffles cleaned. */
  def cleanAllShuffles(sc: SparkContext): Int = {
    val tracker = SparkEnv.get.mapOutputTracker.asInstanceOf[MapOutputTrackerMaster]
    val ids = tracker.shuffleStatuses.keys.toSeq
    ids.foreach { id =>
      sc.cleaner.foreach(_.doCleanupShuffle(id, blocking = true))
    }
    ids.size
  }

  /** Bytes currently on disk under the block manager's local dirs
    * (shuffle data/index, spills, disk-store blocks) — the per-run
    * disk-debt telemetry the detail JSON records so an inflated
    * timing can be attributed (or cleared) from the artifact alone. */
  def localDirBytes(): Long =
    SparkEnv.get.blockManager.diskBlockManager.localDirs.map(sizeOf).sum

  private def sizeOf(f: File): Long =
    if (f.isFile) f.length
    else Option(f.listFiles).map(_.map(sizeOf).sum).getOrElse(0L)
}
