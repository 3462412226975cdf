package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal manifest-committed parquet table: the append-capable
  * commit primitive the plain-parquet streaming merges were missing.
  *
  * Layout under `root`:
  * {{{
  *   _manifest.v<N>        one line per committed segment dir; highest N wins
  *   seg-<N>-<uuid>/       parquet data segment, one per committed append/replace
  *   del-<N>-<uuid>/       parquet TOMBSTONE segment (deleted keys; see [[delete]])
  * }}}
  *
  * Commit protocol (single-writer, which is what foreachBatch gives —
  * micro-batches apply serially):
  *   1. write the new segment dir (normal parquet job commit);
  *   2. write the FULL new segment list to `_manifest.v<N+1>.tmp-<uuid>`;
  *   3. atomically `rename` the tmp onto `_manifest.v<N+1>`.
  * A reader always resolves the highest committed manifest version, so
  * a crash at any step leaves either v<N> or v<N+1> visible — never a
  * half-appended table. A segment written but never named by a
  * manifest (crash between 1 and 3) is an invisible orphan, collected
  * by [[compact]]/[[destroy]]; the streaming checkpoint replays its
  * batch, which re-merges against the OLD manifest state and commits a
  * fresh segment.
  *
  * This is deliberately the smallest slice of a lakehouse log that
  * makes per-ingest IO O(batch): an append writes ONLY the new rows
  * plus a manifest of a few hundred bytes, while every previously
  * committed segment's files stay byte-identical (spec-pinned). At
  * 100 TB the same layout holds on any FS with atomic rename (HDFS,
  * local); on S3-class stores the rename step would swap to a
  * conditional PUT, the same escape hatch every manifest-log format
  * uses. Segment count grows one per non-empty ingest — [[compact]]
  * folds them back to one when the reader's per-segment open cost
  * starts to matter (the reader hands Spark an explicit dir list, so
  * scan parallelism is unaffected either way).
  */
object ManifestTable {

  private val ManifestPrefix = "_manifest.v"
  private val DelPrefix = "del-"

  /** The atomic publish step, pluggable per storage class. A strategy
    * must (1) make manifest version `v` visible atomically — readers
    * see the old or the new manifest, never a torn one — and (2)
    * guarantee a SINGLE WINNER when two writers race to publish the
    * same version (the loser throws, its segment becomes an orphan
    * that [[compact]]/GC collects; nothing already committed is ever
    * lost, because a manifest names the full segment list and losers
    * never overwrite it). [[RenameCommit]] implements this with
    * tmp-write + no-overwrite `rename` (HDFS/local semantics); an
    * S3-class store — where rename is copy+delete and not atomic —
    * plugs in a conditional-PUT (If-None-Match) strategy against the
    * same interface. */
  trait CommitStrategy {
    /** Publish `content` as exactly `dst`, atomically, failing (not
      * overwriting) if `dst` already exists. */
    def publish(f: FileSystem, dir: Path, dst: Path, content: String): Unit
  }

  /** Atomic-rename commit: correct on any FS with atomic, no-overwrite
    * rename (HDFS, local, ABFS). */
  object RenameCommit extends CommitStrategy {
    def publish(f: FileSystem, dir: Path, dst: Path, content: String): Unit = {
      val tmp = new Path(dir,
        s"${dst.getName}.tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(content.getBytes("UTF-8"))
      finally out.close()
      if (!f.rename(tmp, dst)) {
        f.delete(tmp, false)
        throw new IllegalStateException(
          s"manifest commit lost the race for $dst")
      }
    }
  }

  /** Process-wide strategy hook; deployments on stores without atomic
    * rename swap this once at startup. */
  @volatile var commitStrategy: CommitStrategy = RenameCommit

  private def fs(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Highest committed manifest version under `root`, if any. */
  private def currentVersion(f: FileSystem, root: Path): Option[Long] =
    if (!f.exists(root)) None
    else {
      val vs = f.listStatus(root).iterator.map(_.getPath.getName)
        .filter(n => n.startsWith(ManifestPrefix) && !n.contains(".tmp-"))
        .map(_.stripPrefix(ManifestPrefix).toLong)
        .toSeq
      if (vs.isEmpty) None else Some(vs.max)
    }

  /** Committed segment dir names, in commit order (empty if no manifest). */
  def segments(spark: SparkSession, root: String): Seq[String] = {
    val (f, p) = fs(spark, root)
    currentVersion(f, p) match {
      case None => Seq.empty
      case Some(v) =>
        val in = f.open(new Path(p, ManifestPrefix + v))
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filter(_.nonEmpty).toList
        finally in.close()
    }
  }

  def exists(spark: SparkSession, root: String): Boolean = {
    val (f, p) = fs(spark, root)
    currentVersion(f, p).isDefined
  }

  /** Committed DATA segments — the manifest list minus tombstone
    * (`del-`) segments. */
  def dataSegments(spark: SparkSession, root: String): Seq[String] =
    segments(spark, root).filterNot(_.startsWith(DelPrefix))

  /** Committed tombstone segments (see [[delete]]). */
  def deleteSegments(spark: SparkSession, root: String): Seq[String] =
    segments(spark, root).filter(_.startsWith(DelPrefix))

  /** Union-read every committed segment. The dir list is explicit, so
    * orphan (uncommitted) segments are invisible to readers. Each
    * segment is read single-rooted and unioned — a multi-path read
    * would reject hive-partitioned segment layouts
    * (CONFLICTING_DIRECTORY_STRUCTURES) and this way partition
    * discovery (and pruning on the partition column) works per
    * segment. Same files either way; scan parallelism is per-file. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val segs = dataSegments(spark, root)
    require(segs.nonEmpty, s"no committed manifest under $root")
    segs.map(s => spark.read.parquet(s"$root/$s")).reduce(_ unionByName _)
  }

  /** The union of all committed tombstone keys (column set = whatever
    * [[delete]] was given), or None when nothing was ever deleted. */
  def tombstones(spark: SparkSession, root: String): Option[DataFrame] = {
    val d = deleteSegments(spark, root)
    if (d.isEmpty) None
    else Some(d.map(s => spark.read.parquet(s"$root/$s"))
      .reduce(_ unionByName _).distinct())
  }

  /** Merge-on-read: [[read]] minus [[tombstones]], anti-joined on the
    * tombstones' own column set. The tombstone side is O(deleted keys)
    * and BROADCAST — a read never shuffles the data side to honor
    * deletes; when the accumulated delete set outgrows broadcast
    * range, [[compact]] applies it physically and clears it. */
  def readMerged(spark: SparkSession, root: String): DataFrame = {
    val data = read(spark, root)
    tombstones(spark, root) match {
      case None => data
      case Some(t) =>
        data.join(org.apache.spark.sql.functions.broadcast(t),
          t.columns.toSeq, "left_anti")
    }
  }

  /** Atomically publish `segs` as manifest version `v` through the
    * configured [[CommitStrategy]] (single winner per version; the
    * loser throws and its segment dir is orphaned, never read). */
  private def commit(f: FileSystem, root: Path, v: Long, segs: Seq[String]): Unit =
    commitStrategy.publish(f, root, new Path(root, ManifestPrefix + v),
      segs.mkString("\n") + "\n")

  private def writeSeg(df: DataFrame, dir: String, partitionBy: Seq[String]): Unit = {
    val w = df.write
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(dir)
  }

  /** Append `df` as one new segment: IO = O(df) + a tiny manifest,
    * regardless of how much data the table already holds.
    *
    * `partitionBy` lays the segment out as hive-style partition dirs
    * (readers that filter on those columns get parquet PARTITION
    * pruning inside every segment — the [[graft.streaming.AnnIndex]]
    * probed-cell read path). `tag`, when given, is folded into the
    * segment name as `seg-<v>-<tag>-<uuid>`: a cheap at-least-once
    * replay guard — a caller that derives the tag from its micro-batch
    * id can detect an already-committed batch from [[segments]] alone
    * (name scan, no data read) and skip the duplicate append. */
  def append(spark: SparkSession, root: String, df: DataFrame,
      partitionBy: Seq[String] = Nil, tag: Option[String] = None): Unit = {
    val (f, p) = fs(spark, root)
    val v = currentVersion(f, p).getOrElse(0L)
    val t = tag.map(_ + "-").getOrElse("")
    val seg = s"seg-${v + 1}-$t${java.util.UUID.randomUUID().toString.take(8)}"
    writeSeg(df, s"$root/$seg", partitionBy)
    commit(f, p, v + 1, segments(spark, root) :+ seg)
  }

  /** Merge-on-read DELETE: append `keys` (deduplicated) as one
    * tombstone segment — IO is O(keys) + a tiny manifest; no data
    * segment is touched (they stay byte-identical, same append
    * contract). Readers going through [[readMerged]] (or any caller
    * anti-joining [[tombstones]]) stop seeing matching rows at the
    * next manifest version; [[compact]] later applies the deletes
    * physically and retires the tombstones. `keys`' column set defines
    * the delete identity (typically the table's id column). `tag`
    * works as in [[append]]. */
  def delete(spark: SparkSession, root: String, keys: DataFrame,
      tag: Option[String] = None): Unit = {
    val (f, p) = fs(spark, root)
    val v = currentVersion(f, p).getOrElse(
      throw new IllegalStateException(s"delete from uncommitted table $root"))
    val t = tag.map(_ + "-").getOrElse("")
    val seg = s"$DelPrefix${v + 1}-$t${java.util.UUID.randomUUID().toString.take(8)}"
    keys.distinct().write.parquet(s"$root/$seg")
    commit(f, p, v + 1, segments(spark, root) :+ seg)
  }

  /** Replace the whole table with `df` (first write, or an explicit
    * compaction rewrite) and garbage-collect every dir the new
    * manifest no longer names — committed predecessors and crash
    * orphans alike. */
  def replace(spark: SparkSession, root: String, df: DataFrame,
      partitionBy: Seq[String] = Nil): Unit = {
    val (f, p) = fs(spark, root)
    val v = currentVersion(f, p).getOrElse(0L)
    val seg = s"seg-${v + 1}-${java.util.UUID.randomUUID().toString.take(8)}"
    writeSeg(df, s"$root/$seg", partitionBy)
    commit(f, p, v + 1, Seq(seg))
    gc(f, p)
  }

  /** Fold all committed segments into one (the staged full rewrite,
    * now an EXPLICIT maintenance action instead of the per-batch tax),
    * applying any accumulated tombstones PHYSICALLY — the new manifest
    * names one data segment and no tombstones, so the per-read
    * anti-join cost resets to zero. Readers see the old manifest until
    * the new one lands. `partitionBy` preserves a partitioned layout
    * through the rewrite (the columns come back as normal columns from
    * [[read]]'s partition discovery, so the fold round-trips them). */
  def compact(spark: SparkSession, root: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val snap = readMerged(spark, root).localCheckpoint()
    try replace(spark, root, snap, partitionBy)
    finally graft.core.Lineage.release(snap)
  }

  /** Delete every dir/file under `root` the current manifest does not
    * name: superseded segments after a [[replace]] and orphans from
    * crashed appends. Stale manifest versions stay (tiny, and the
    * highest-wins reader ignores them). */
  private def gc(f: FileSystem, root: Path): Unit = {
    val live = currentVersion(f, root).map(v =>
      (ManifestPrefix + v) +: {
        val in = f.open(new Path(root, ManifestPrefix + v))
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filter(_.nonEmpty).toList
        finally in.close()
      }).getOrElse(Seq.empty).toSet
    f.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (!live.contains(n) && !n.startsWith(ManifestPrefix))
        f.delete(st.getPath, true)
    }
  }

  /** Remove the table entirely. */
  def destroy(spark: SparkSession, root: String): Unit = {
    val (f, p) = fs(spark, root)
    f.delete(p, true)
    ()
  }
}
