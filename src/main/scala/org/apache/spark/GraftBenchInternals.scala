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

  // Temp-checkpoint dirs that existed BEFORE the suite started (other
  // processes', or stale) — never touched; only dirs that appear while
  // this JVM runs are this suite's debt and safe to reap.
  private var tmpCheckpointBaseline: Set[String] = _

  /** Streaming-state analogue of [[cleanAllShuffles]]. Round-8
    * telemetry proved the disk debt dead (`localdir_mb_after_clean`=0
    * on every run) while stream_sliding still measured 20.6 s in-suite
    * vs 2.9 s isolated — the residual suite-state debt is HEAP and
    * streaming state: memory-sink result batches pinned by their temp
    * views, `HDFSBackedStateStoreProvider` version maps held by the
    * loaded-providers registry, and temp checkpoint dirs from the
    * dozen streaming queries. Clean all three deterministically
    * between measurements, same rationale as the shuffle reap. */
  def cleanStreamingState(spark: org.apache.spark.sql.SparkSession): Unit = {
    // failure-path net: AvailableNow harnesses terminate themselves
    spark.streams.active.foreach { q =>
      try q.stop() catch { case _: Throwable => () }
    }
    // memory-sink temp views (queryName tables) pin each streaming
    // query's complete-mode result batches on the heap for the rest
    // of the suite; dropping the view unreaches the sink
    spark.catalog.listTables().collect()
      .filter(t => t.isTemporary && t.name.startsWith("graft_stream"))
      .foreach(t => spark.catalog.dropTempView(t.name))
    // executor-side (local-mode: in-process) state store providers —
    // the next streaming query reloads what it needs from checkpoint
    org.apache.spark.sql.GraftColumnBridge.unloadAllStateStores()
    // temp checkpoint dirs: deleted on clean query stop, leaked on
    // failure — reap only dirs created since this JVM started
    val tmp = new File(System.getProperty("java.io.tmpdir"))
    val current = Option(tmp.listFiles).getOrElse(Array.empty[File])
      .filter(f => f.isDirectory && f.getName.startsWith("temporary-"))
    if (tmpCheckpointBaseline == null)
      tmpCheckpointBaseline = current.map(_.getName).toSet
    else current.filterNot(f => tmpCheckpointBaseline.contains(f.getName))
      .foreach(deleteRecursively)
    // streaming near-dup corpora: manifest-table roots (and their
    // banded-index siblings) under the warehouse are NOT catalog
    // tables, so the managed-table sweeps never see them — a suite
    // would otherwise carry every query's accepted corpus on disk (and
    // its temp view on the heap) for the rest of the run
    val wh = new File(java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath)
    Option(wh.listFiles).getOrElse(Array.empty[File])
      .filter(f => f.isDirectory && (f.getName.endsWith("__corpus") ||
        f.getName.endsWith("__corpus__bands") ||
        f.getName.endsWith("__annivf") ||
        f.getName.endsWith("__log")))
      .foreach(deleteRecursively)
  }

  /** Drain the async listener bus so stage metrics accumulated by an
    * attached [[org.apache.spark.scheduler.SparkListener]] are
    * complete before the caller reads them (profiling harness use). */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  private def sizeOf(f: File): Long =
    if (f.isFile) f.length
    else Option(f.listFiles).map(_.map(sizeOf).sum).getOrElse(0L)
}
