package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, concat, count, datediff, lit,
  max, min, struct, substring_index, unix_micros}
import org.apache.spark.sql.types._

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
  private[io] val DelPrefix = "del-"

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
      * overwriting) if `dst` already exists. A lost version race MUST
      * surface as [[CommitRaceLost]] (and nothing else as it), so
      * retryable callers can distinguish contention from store
      * failures. */
    def publish(f: FileSystem, dir: Path, dst: Path, content: String): Unit
  }

  /** Another writer published this manifest version first. For plain
    * appends this is pure contention (retryable — see
    * [[ManifestTable.append]]'s `retryRaces`); for snapshot-derived
    * commits (rewrites, DML, view partials) it means the input
    * snapshot is stale and the operation must be re-planned. */
  final class CommitRaceLost(msg: String) extends IllegalStateException(msg)

  /** Atomic-rename commit: correct on any FS with atomic, no-overwrite
    * rename (HDFS, ABFS). On `file:` schemes the swap step is a HARD
    * LINK instead: POSIX rename(2) — what Hadoop's local rename calls
    * — silently REPLACES an existing destination, so two racing
    * commits could both "succeed" with the later erasing the earlier
    * winner's manifest (observed under a real multi-writer test);
    * link(2) is atomic AND fails with EEXIST, giving local FS the
    * same single-winner guarantee HDFS's no-overwrite rename has. */
  object RenameCommit extends CommitStrategy {
    def publish(f: FileSystem, dir: Path, dst: Path, content: String): Unit = {
      val tmp = new Path(dir,
        s"${dst.getName}.tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(content.getBytes("UTF-8"))
      finally out.close()
      if (f.getUri.getScheme == "file") {
        try java.nio.file.Files.createLink(
          java.nio.file.Paths.get(f.makeQualified(dst).toUri),
          java.nio.file.Paths.get(f.makeQualified(tmp).toUri))
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            f.delete(tmp, false)
            throw new CommitRaceLost(
              s"manifest commit lost the race for $dst")
          case e: Throwable =>
            // a file: mount without link(2) (some NFS exports, FAT,
            // overlay mounts) — clean the tmp and say what to do;
            // silently falling back to rename would reintroduce the
            // replaced-winner race this path exists to close
            scala.util.Try(f.delete(tmp, false))
            throw new IllegalStateException(
              s"local manifest publish needs hard-link support at $dst " +
                "(atomic create-exclusive); this mount refused link(2) — " +
                "plug a CommitStrategy suited to the store " +
                "(ManifestTable.commitStrategy)", e)
        }
        f.delete(tmp, false)
      } else if (!f.rename(tmp, dst)) {
        f.delete(tmp, false)
        throw new CommitRaceLost(
          s"manifest commit lost the race for $dst")
      }
    }
  }

  /** Conditional-PUT commit for object stores: S3-class stores
    * (If-None-Match PUT), GCS (ifGenerationMatch 0) and strongly
    * consistent FS APIs expose "create exactly this key, fail if it
    * exists" — and an object becomes visible ATOMICALLY on PUT
    * completion, so there is no torn-read window and no rename needed.
    * Through Hadoop's API the same contract is `create(dst,
    * overwrite=false)` (atomic create-exclusive; the loser of a race
    * gets FileAlreadyExistsException → rethrown as the standard
    * lost-race error, its segment orphaned exactly as under
    * [[RenameCommit]]). On plain local/HDFS paths a reader could in
    * principle observe the file mid-write (those FSs make FILES
    * visible at create, not close) — which is why [[RenameCommit]]
    * stays the default there and this strategy is for object-store
    * semantics, where PUT visibility is all-or-nothing.
    *
    * REQUIREMENT on S3A specifically: the filesystem must enforce
    * create-exclusive at PUT time, not just at `create()` time.
    * Plain S3A checks overwrite=false with a HEAD when the stream is
    * opened but only PUTs the object at close(), so two racing
    * writers could both pass the check and the later close() would
    * silently win. Hadoop 3.4.1+ closes that window when conditional
    * creates are enabled (`fs.s3a.create.conditional.enabled`, which
    * maps create(overwrite=false) to an If-None-Match PUT); this
    * strategy is only correct on S3A under that setting (or any
    * store whose create-exclusive is truly atomic at publish). On
    * stores without it, single-winner publication needs an external
    * lock or a DynamoDB-style commit service.
    *
    * Failure semantics: ONLY a create-exclusive conflict
    * (FileAlreadyExistsException) is reported as a lost race; any
    * other IO failure (permissions, quota, transient store errors)
    * propagates unchanged so operators debug the store, not a
    * phantom concurrency bug. If the stream was created but the
    * write/close fails, the possibly-torn `dst` is best-effort
    * deleted before rethrowing — on create-visible FSs that file
    * would otherwise be permanently resolved as the committed head
    * (wedging the table on a torn segment list) and the version
    * could never be retried. */
  object CreateExclusiveCommit extends CommitStrategy {
    def publish(f: FileSystem, dir: Path, dst: Path, content: String): Unit = {
      val out =
        try f.create(dst, false)
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException |
               _: java.nio.file.FileAlreadyExistsException =>
            throw new CommitRaceLost(
              s"manifest commit lost the race for $dst")
        }
      try {
        out.write(content.getBytes("UTF-8"))
        out.close()
      } catch { case e: Throwable =>
        scala.util.Try(out.close())
        scala.util.Try(f.delete(dst, false))
        throw e
      }
    }
  }

  /** Process-wide strategy hook; deployments on stores without atomic
    * rename swap this once at startup. */
  @volatile var commitStrategy: CommitStrategy = RenameCommit

  private[io] def fs(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Highest committed manifest version under `root`, if any. */
  private[io] def currentVersion(f: FileSystem, root: Path): Option[Long] =
    versionsOf(f, root).lastOption

  /** Metadata marker for a commit that only REPACKAGES existing rows
    * (optimize/cluster/compact): `#`-prefixed lines in a manifest are
    * commit metadata, invisible to segment listing. */
  private val RewriteMark = "#rewrite"

  /** Metadata marker for a row-level DML commit ([[ManifestDml]]'s
    * copy-on-write DELETE/UPDATE/MERGE): the commit DROPS the touched
    * segments and adds their rewritten replacement, so — unlike a
    * [[RewriteMark]]ed repackaging — the rows themselves changed. The
    * change feed surfaces such a commit as pre-image DELETES of every
    * dropped segment followed by INSERTS of the replacement
    * ([[readChanges]]; a consumer applies a window's deletes before
    * its inserts), and plain additions-only consumers fail loudly. */
  private[io] val DmlMark = "#dml"

  /** Per-segment metadata embedded IN the manifest commit:
    * `#meta <segment> <one-line json>` with the segment's data-file
    * list (+ sizes), its Spark schema, its zone-map stats and its
    * Bloom-sidecar columns. This is what lets the SQL relation
    * ([[graft.sources.ManifestSource]]) plan from ONE log read —
    * no per-segment `listStatus`, no per-segment `_stats.graft.json`
    * open, no footer-merge job over every file. On a streaming-fed
    * log with thousands of ingests between packs that was the
    * remaining O(segments) driver IO per query; real lakehouse logs
    * carry exactly this in the commit. Sidecars keep being written
    * (the typed API's `segmentStats`/`readRange` path and external
    * tools read them); the manifest line is a COPY taken at commit
    * time, authoritative for the snapshot it names. Tables written
    * before this existed (or by hand) simply lack `#meta` lines and
    * fall back to the per-segment listing/sidecar path, per segment. */
  private val MetaPrefix = "#meta "

  private[io] def manifestLines(f: FileSystem, root: Path, v: Long): Seq[String] = {
    val in = f.open(new Path(root, ManifestPrefix + v))
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  private[io] def readManifest(f: FileSystem, root: Path, v: Long): Seq[String] =
    manifestLines(f, root, v).filterNot(_.startsWith("#"))

  /** `ALTER TABLE … DROP COLUMN` is a SCHEMA PROJECTION, not a data
    * rewrite: the dropping commit records the column in a `#dropcol`
    * line and every later commit carries the accumulated set forward
    * (a manifest is a full snapshot — same contract as its segment
    * list), so readers subtract the set from the merged schema and
    * never request the column from the scan. Physical bytes stay in
    * place until a rewrite-class verb repackages the rows (compact/
    * cluster write through the post-drop projection, which is when the
    * data physically disappears). Time travel is exact: each version's
    * manifest carries its OWN set, so a pre-drop snapshot still reads
    * the column. The line records the PHYSICAL name ([[ColMapPrefix]]
    * — pre-mapping tables wrote logical≡physical lines, still valid);
    * re-ADDing a dropped logical name works immediately because
    * [[addColumns]] mints a FRESH physical name for it, so the old
    * values still sitting in unrewritten segments can never resurface.
    * A FULL rewrite (replace/compact/cluster) writes through the
    * projection and retires the tombstones. */
  private val DropColPrefix = "#dropcol "

  /** Marks a pure schema-change commit in [[history]]. */
  private[io] val AlterMark = "#alter"

  private def dropColLines(lines: Seq[String]): Seq[String] =
    lines.filter(_.startsWith(DropColPrefix)).map(_.stripPrefix(DropColPrefix))

  /** `ALTER TABLE … RENAME COLUMN` (and re-ADD of a DROPped name) ride
    * a COLUMN MAPPING: one `#colmap {"p":…,"l":…}` line per column
    * whose LOGICAL (user-facing) name differs from its PHYSICAL
    * (in-parquet) name, carried forward by every commit like the
    * segment list and the `#dropcol` set.
    *
    * The invariant that makes both verbs metadata-only is PHYSICAL
    * NAME CONSTANCY (the Delta column-mapping design): a rename never
    * touches a byte — the physical name stays what it was at first
    * write, writers keep writing it (every write face translates
    * logical→physical on entry), and readers rename physical→logical
    * as the LAST projection step. Because every segment agrees on the
    * physical name, the SQL face stays ONE homogeneous parquet
    * relation (scanning physical names, with an alias projection on
    * top — filter pushdown and zone-map pruning see physical names
    * end to end), and time travel is exact: each version's manifest
    * carries its own mapping. A re-ADD of a DROPped name mints a FRESH
    * physical name (`<name>__r<version>`), so the old values still
    * sitting in unrewritten segments can never resurface — the
    * column-mapping id that turns the r16 loud-reject into a
    * first-class lifecycle. `#dropcol` tombstones record PHYSICAL
    * names (pre-mapping tables wrote logical≡physical lines, which
    * stay valid). A FULL rewrite (replace/compact/cluster) writes
    * through the logical projection, so physical names converge back
    * to logical and the mapping clears with the drop set. */
  private val ColMapPrefix = "#colmap "

  /** (physical, logical) pairs of manifest `lines` (malformed lines
    * read as absent — same tolerance as `#meta`). */
  private def colMapLines(lines: Seq[String]): Seq[(String, String)] =
    lines.filter(_.startsWith(ColMapPrefix)).flatMap { l =>
      scala.util.Try {
        import org.json4s._
        val j = org.json4s.jackson.JsonMethods.parse(l.stripPrefix(ColMapPrefix))
        ((j \ "p"), (j \ "l")) match {
          case (JString(p), JString(lg)) => Some((p, lg))
          case _ => None
        }
      }.toOption.flatten
    }

  private def colMapLine(p: String, l: String): String =
    ColMapPrefix + "{\"p\":" + jsonString(p) + ",\"l\":" + jsonString(l) + "}"

  /** Column mapping as of version `v` (physical → logical; columns
    * not listed have logical ≡ physical). */
  def columnMappingAt(spark: SparkSession, root: String, v: Long): Seq[(String, String)] = {
    val (f, p) = fs(spark, root)
    colMapLines(manifestLines(f, p, v))
  }

  /** Head-version [[columnMappingAt]]; empty for an uncommitted root. */
  def columnMapping(spark: SparkSession, root: String): Seq[(String, String)] = {
    val (f, p) = fs(spark, root)
    currentVersion(f, p).map(v => colMapLines(manifestLines(f, p, v)))
      .getOrElse(Seq.empty)
  }

  /** Reader-side mapping application: rename physical → logical (a
    * physical name the frame lacks is a no-op, matching `drop`'s
    * tolerance in [[applyDrops]]). The LAST projection step of every
    * read face. */
  private[graft] def applyMapping(df: DataFrame,
      mapping: Seq[(String, String)]): DataFrame =
    mapping.foldLeft(df) { case (d, (p, l)) => d.withColumnRenamed(p, l) }

  /** Writer-side translation: rename logical → physical, so every
    * segment (data, tombstone, marker, DML replacement) carries the
    * CONSTANT physical names whatever the current logical surface
    * says. */
  private[graft] def toPhysical(df: DataFrame,
      mapping: Seq[(String, String)]): DataFrame =
    mapping.foldLeft(df) { case (d, (p, l)) => d.withColumnRenamed(l, p) }

  /** Logical name → physical name (identity when unmapped). */
  private[graft] def physicalNameOf(spark: SparkSession,
      mapping: Seq[(String, String)], name: String): String = {
    val eq = spark.sessionState.conf.resolver
    mapping.collectFirst { case (p, l) if eq(l, name) => p }.getOrElse(name)
  }

  /** Physical name → logical name (identity when unmapped). */
  private[graft] def logicalNameOf(spark: SparkSession,
      mapping: Seq[(String, String)], name: String): String = {
    val eq = spark.sessionState.conf.resolver
    mapping.collectFirst { case (p, l) if eq(p, name) => l }.getOrElse(name)
  }

  /** Column names dropped from the visible schema as of version `v`
    * (accumulated, case preserved; match with the session resolver). */
  def droppedColsAt(spark: SparkSession, root: String, v: Long): Seq[String] = {
    val (f, p) = fs(spark, root)
    dropColLines(manifestLines(f, p, v))
  }

  /** Head-version [[droppedColsAt]]; empty for an uncommitted root. */
  def droppedCols(spark: SparkSession, root: String): Seq[String] = {
    val (f, p) = fs(spark, root)
    currentVersion(f, p).map(v => dropColLines(manifestLines(f, p, v)))
      .getOrElse(Seq.empty)
  }

  /** Subtract the dropped-column projection (case-insensitive on the
    * default resolver; `drop` ignores names the frame lacks). */
  private def applyDrops(df: DataFrame, dropped: Seq[String]): DataFrame =
    if (dropped.isEmpty) df else df.drop(dropped: _*)

  /** (dropped physical names, column mapping) of version `v` — ONE
    * manifest read for both carried schema states. */
  private def schemaActionsAt(spark: SparkSession, root: String,
      v: Long): (Seq[String], Seq[(String, String)]) = {
    val (f, p) = fs(spark, root)
    val lines = manifestLines(f, p, v)
    (dropColLines(lines), colMapLines(lines))
  }

  /** Head-version [[schemaActionsAt]]; empty for an uncommitted root. */
  private def schemaActions(spark: SparkSession,
      root: String): (Seq[String], Seq[(String, String)]) = {
    val (f, p) = fs(spark, root)
    currentVersion(f, p).map(v => schemaActionsAt(spark, root, v))
      .getOrElse((Seq.empty, Seq.empty))
  }

  /** The reader-side schema projection every face applies LAST: drop
    * the tombstoned physical columns, then rename the survivors to
    * their logical names. */
  private def applySchemaActions(df: DataFrame,
      actions: (Seq[String], Seq[(String, String)])): DataFrame =
    applyMapping(applyDrops(df, actions._1), actions._2)

  private[io] def isRewrite(f: FileSystem, root: Path, v: Long): Boolean =
    manifestLines(f, root, v).contains(RewriteMark)

  /** Commit version encoded in a segment dir name
    * (`seg-<v>-…` / `del-<v>-…`). */
  private[io] def segVersion(name: String): Long =
    name.split("-")(1).toLong

  /** Committed segment dir names, in commit order (empty if no manifest). */
  def segments(spark: SparkSession, root: String): Seq[String] = {
    val (f, p) = fs(spark, root)
    currentVersion(f, p) match {
      case None => Seq.empty
      case Some(v) => readManifest(f, p, v)
    }
  }

  /** Every committed manifest version under `root`, ascending. Stale
    * versions survive appends (each manifest is a few hundred bytes),
    * which is what makes [[readAt]] time travel possible; [[replace]]/
    * [[compact]]-class rewrites garbage-collect SEGMENTS past the
    * table's [[retainVersions]] horizon (default 1), so history is
    * readable back to that horizon — and [[vacuum]] is the explicit
    * physical trim, the same logical-rewrite/physical-vacuum split
    * every lakehouse log ships. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val (f, p) = fs(spark, root)
    versionsOf(f, p)
  }

  /** (version, commit time ms) for every committed version, ascending
    * — the `TIMESTAMP AS OF` resolution input. The time is the commit
    * wall-clock EMBEDDED in the manifest content (`#ts` line), so a
    * restore/copy that scrambles file mtimes keeps time travel
    * truthful; manifests from before the stamp existed fall back to
    * the file's mtime. O(versions) driver metadata, no data IO. */
  def versionsWithTimes(spark: SparkSession, root: String): Seq[(Long, Long)] = {
    val (f, p) = fs(spark, root)
    versionsOf(f, p).map(v => (v, commitTimeOf(f, p, v)))
  }

  /** Segment list as of manifest version `v` (time travel). Throws if
    * `v` was never committed; segments named by `v` but since
    * garbage-collected by a [[replace]]/[[compact]] surface as read
    * errors downstream, same as any past-retention lakehouse read. */
  def segmentsAt(spark: SparkSession, root: String, v: Long): Seq[String] = {
    val (f, p) = fs(spark, root)
    require(f.exists(new Path(p, ManifestPrefix + v)),
      s"no committed manifest version $v under $root")
    readManifest(f, p, v)
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

  /** Union a segment list with schema EVOLUTION tolerance: later
    * segments may add columns (earlier rows read NULL there) — the
    * additive-evolution contract every append-only log needs, since a
    * 100 TB table is never rewritten just to add a field. Each segment
    * is read single-rooted and unioned — a multi-path read would
    * reject hive-partitioned segment layouts
    * (CONFLICTING_DIRECTORY_STRUCTURES) and this way partition
    * discovery (and pruning on the partition column) works per
    * segment. Same files either way; scan parallelism is per-file. */
  private[graft] def readSegs(spark: SparkSession, root: String, segs: Seq[String]): DataFrame =
    segs.map(s => spark.read.parquet(s"$root/$s"))
      .reduce(_.unionByName(_, allowMissingColumns = true))

  /** Per-physical-row surrogate identity, derived at READ time from
    * the parquet scan's metadata columns — `(segment-relative file
    * path, row ordinal in file)` as a struct. Segments are immutable,
    * so the id is stable for the life of a physical row copy, costs
    * ZERO stored bytes, and distinguishes equal-VALUED copies living
    * in different segments (or different rows of one segment). The
    * change feed's DML windows use it to upgrade value-identity
    * deletes to ROW-identity deletes: see [[readChanges]]'s `rowId`.
    * DML/maintenance rewrites retire the old copies' ids and mint new
    * ones for the replacements — exactly matching the feed's
    * delete-then-insert shape. */
  val RowIdCol = "_row_id"

  private[graft] def readSegsWithRowId(spark: SparkSession, root: String,
      segs: Seq[String]): DataFrame =
    segs.map { s =>
      // the uuid-bearing segment name makes "/<seg>/" unique in the
      // scan's absolute file path; everything after it is the
      // segment-relative file (hive-partitioned layouts included)
      spark.read.parquet(s"$root/$s").withColumn(RowIdCol, struct(
        concat(lit(s + "/"), substring_index(
          col("_metadata.file_path"), s"/$s/", -1)).as("path"),
        col("_metadata.row_index").as("pos")))
    }.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Head read with the [[RowIdCol]] surrogate stamped on every row —
    * the bootstrap snapshot for a change-feed consumer that applies
    * DML windows by row identity ([[readChanges]] `rowId = true`).
    * Tombstones are applied as in [[readMerged]]. */
  def readWithRowId(spark: SparkSession, root: String): DataFrame = {
    val segs = dataSegments(spark, root)
    require(segs.nonEmpty, s"no committed manifest under $root")
    val data = readSegsWithRowId(spark, root, segs)
    val del = deleteSegments(spark, root)
    val merged =
      if (del.isEmpty) data
      else {
        val keys = readSegs(spark, root, del).distinct()
        data.join(org.apache.spark.sql.functions.broadcast(keys),
          keys.columns.toSeq, "left_anti")
      }
    applySchemaActions(merged, schemaActions(spark, root))
  }

  /** Union-read every committed data segment. The dir list is
    * explicit, so orphan (uncommitted) segments are invisible to
    * readers. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val segs = dataSegments(spark, root)
    require(segs.nonEmpty, s"no committed manifest under $root")
    applySchemaActions(readSegs(spark, root, segs), schemaActions(spark, root))
  }

  /** Time-travel read: the data segments named by manifest version
    * `v`, exactly as a reader at that commit saw them. Reproducible
    * training runs pin a version instead of copying the corpus. */
  def readAt(spark: SparkSession, root: String, v: Long): DataFrame = {
    val segs = segmentsAt(spark, root, v).filterNot(_.startsWith(DelPrefix))
    require(segs.nonEmpty, s"manifest v$v of $root names no data segments")
    applySchemaActions(readSegs(spark, root, segs), schemaActionsAt(spark, root, v))
  }

  private[io] def tombstonesOf(spark: SparkSession, root: String,
      segs: Seq[String]): Option[DataFrame] = {
    val d = segs.filter(_.startsWith(DelPrefix))
    if (d.isEmpty) None
    else Some(d.map(s => spark.read.parquet(s"$root/$s"))
      .reduce(_ unionByName _).distinct())
  }

  /** The union of all committed tombstone keys (column set = whatever
    * [[delete]] was given), or None when nothing was ever deleted.
    * Keys surface under their LOGICAL names (tombstone segments store
    * physical names like every other segment). */
  def tombstones(spark: SparkSession, root: String): Option[DataFrame] =
    tombstonesOf(spark, root, segments(spark, root))
      .map(applyMapping(_, columnMapping(spark, root)))

  private def mergeRead(spark: SparkSession, root: String,
      segs: Seq[String]): DataFrame = {
    val data = readSegs(spark, root, segs.filterNot(_.startsWith(DelPrefix)))
    tombstonesOf(spark, root, segs) match {
      case None => data
      case Some(t) =>
        data.join(org.apache.spark.sql.functions.broadcast(t),
          t.columns.toSeq, "left_anti")
    }
  }

  /** Merge-on-read: [[read]] minus [[tombstones]], anti-joined on the
    * tombstones' own column set. The tombstone side is O(deleted keys)
    * and BROADCAST — a read never shuffles the data side to honor
    * deletes; when the accumulated delete set outgrows broadcast
    * range, [[compact]] applies it physically and clears it. */
  def readMerged(spark: SparkSession, root: String): DataFrame =
    applySchemaActions(mergeRead(spark, root, segments(spark, root)),
      schemaActions(spark, root))

  /** Time-travel [[readMerged]]: state as of manifest version `v` —
    * deletes committed after `v` are invisible, deletes at or before
    * `v` apply. */
  def readMergedAt(spark: SparkSession, root: String, v: Long): DataFrame =
    applySchemaActions(mergeRead(spark, root, segmentsAt(spark, root, v)),
      schemaActionsAt(spark, root, v))

  /** Atomically publish `segs` as manifest version `v` through the
    * configured [[CommitStrategy]] (single winner per version; the
    * loser throws and its segment dir is orphaned, never read).
    * `marks` are `#`-prefixed metadata lines ([[RewriteMark]]);
    * `metas` maps segment names to their embedded-metadata JSON
    * ([[MetaPrefix]] lines — only segments actually named by this
    * commit are emitted, so a carried-forward map can never leak a
    * retired segment's metadata into a newer snapshot). */
  private[io] def commit(f: FileSystem, root: Path, v: Long, segs: Seq[String],
      marks: Seq[String] = Nil, metas: Map[String, String] = Map.empty,
      addDrops: Seq[String] = Nil, clearDrops: Boolean = false,
      addMaps: Seq[(String, String)] = Nil): Unit = {
    val metaLns = segs.flatMap(s => metas.get(s).map(j => s"$MetaPrefix$s $j"))
    // ONE read of the prior manifest serves all carried states: the
    // dropped-column set and the column mapping (table-level schema
    // state every commit carries forward, exactly like the full
    // segment list) and the commit-timestamp monotonicity clamp
    // below. `clearDrops` is the FULL-rewrite escape: replace/compact/
    // cluster write every row through the post-drop LOGICAL
    // projection, so the physical bytes are gone, the name-tombstones
    // can retire, and physical names converge back to logical — the
    // mapping clears with the drop set (partial rewrites — optimize/
    // clusterRange/DML — must keep carrying: untouched segments may
    // still hold the column / the old physical name).
    val prevLines =
      if (v <= 1L) Seq.empty[String]
      else scala.util.Try(manifestLines(f, root, v - 1)).getOrElse(Seq.empty)
    val dropSet =
      ((if (clearDrops) Nil else dropColLines(prevLines)) ++ addDrops).distinct
    val dropLns = dropSet.map(DropColPrefix + _)
    // mapping merge: new entries override the carried entry for the
    // same physical (chained renames keep one line per column);
    // identity entries (p == l, e.g. a rename BACK to the physical
    // name) and entries whose physical is now tombstoned drop out
    val mapLns = {
      val carried =
        if (clearDrops) Nil
        else colMapLines(prevLines)
          .filterNot { case (p, _) => addMaps.exists(_._1 == p) }
      (carried ++ addMaps)
        .filterNot { case (p, l) => p == l || dropSet.contains(p) }
        .map { case (p, l) => colMapLine(p, l) }
    }
    // monotonicity clamp: with multi-writer clock skew, version v could
    // otherwise carry a LATER #ts than v+1, and versionAsOfTime (last
    // version with ts <= cutoff) would resolve TIMESTAMP AS OF to a
    // snapshot that includes later-versioned data — so stamp
    // max(prev commit ts + 1, now), the standard in-commit-timestamp
    // contract. (Pre-#ts legacy manifests fall back to file mtime.)
    val prevTs = prevLines.find(_.startsWith(TsPrefix))
      .flatMap(_.stripPrefix(TsPrefix).trim.toLongOption)
      .orElse(if (v <= 1L) None else scala.util.Try(
        f.getFileStatus(new Path(root, ManifestPrefix + (v - 1)))
          .getModificationTime).toOption)
      .getOrElse(Long.MinValue)
    val stamp = math.max(prevTs + 1, System.currentTimeMillis())
    val ts = s"$TsPrefix$stamp"
    commitStrategy.publish(f, root, new Path(root, ManifestPrefix + v),
      (ts +: (dropLns ++ mapLns ++ marks ++ metaLns ++ segs)).mkString("\n") + "\n")
  }

  /** Commit wall-clock embedded IN the manifest content (`#ts
    * <epochMillis>`): `TIMESTAMP AS OF` resolution and `history` must
    * stay truthful across restores/copies/rsyncs, which scramble file
    * mtimes. Manifests written before this existed lack the line and
    * fall back to the file's modification time, version by version. */
  private val TsPrefix = "#ts "

  /** Commit time of manifest `v`: the embedded `#ts` stamp, else the
    * manifest file's mtime (pre-existing logs). */
  private def commitTimeOf(f: FileSystem, root: Path, v: Long): Long =
    manifestLines(f, root, v)
      .find(_.startsWith(TsPrefix))
      .flatMap(l => l.stripPrefix(TsPrefix).trim.toLongOption)
      .getOrElse(
        f.getFileStatus(new Path(root, ManifestPrefix + v)).getModificationTime)

  /** Raw `#meta` lines of manifest `v`: segment name -> embedded JSON.
    * Tolerant of malformed lines (they read as absent — the embedded
    * metadata is a planning fast path, never a correctness gate). */
  private def metaLinesOf(f: FileSystem, root: Path, v: Long): Map[String, String] =
    manifestLines(f, root, v).iterator
      .filter(_.startsWith(MetaPrefix))
      .flatMap { l =>
        val rest = l.stripPrefix(MetaPrefix)
        val sp = rest.indexOf(' ')
        if (sp <= 0) None else Some((rest.take(sp), rest.drop(sp + 1)))
      }.toMap

  /** The previous version's embedded metadata, carried into the next
    * commit (append/delete name every prior segment unchanged). */
  private[io] def priorMetas(f: FileSystem, root: Path, v: Long): Map[String, String] =
    if (v == 0L) Map.empty
    else scala.util.Try(metaLinesOf(f, root, v)).getOrElse(Map.empty)

  /** Recursive data-file listing of a segment dir: (path relative to
    * the segment, byte length), descending through hive `col=value`
    * partition dirs. Runs ONCE at commit time on the just-written
    * segment — the listing every reader would otherwise redo. */
  private[io] def listDataFilesRec(f: FileSystem, dir: Path,
      prefix: String): Seq[(String, Long)] =
    f.listStatus(dir).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) Nil
      else if (st.isFile) Seq((prefix + n, st.getLen))
      else listDataFilesRec(f, st.getPath, prefix + n + "/")
    }

  /** Build a segment's embedded-metadata JSON at commit time: file
    * list + sizes, read-back Spark schema (including discovered
    * partition columns), zone-map stats (the sidecar JSON, when
    * collected) and Bloom-sidecar column names. O(one segment) —
    * a listing plus one footer read — paid once per commit so NO
    * reader ever pays it again. */
  private[io] def buildMeta(spark: SparkSession, f: FileSystem, root: String,
      seg: String, statsJson: Option[String], bloomCols: Seq[String]): String = {
    val files = listDataFilesRec(f, new Path(s"$root/$seg"), "")
    val schemaJson =
      if (files.isEmpty) "null"
      else spark.read.parquet(s"$root/$seg").schema.json
    val filesJson = files.map { case (pp, l) =>
      s"""{"p":${jsonString(pp)},"l":$l}"""
    }.mkString(",")
    val bloomsJson = bloomCols.map(jsonString).mkString(",")
    s"""{"files":[$filesJson],"schema":$schemaJson,""" +
      s""""stats":${statsJson.getOrElse("null")},"blooms":[$bloomsJson]}"""
  }

  /** A segment's embedded metadata, decoded: data files (segment-
    * relative path, length), read-back schema, zone-map stats, Bloom
    * columns. */
  final case class SegMeta(files: Seq[(String, Long)],
      schema: Option[StructType], stats: Option[SegStats], blooms: Seq[String])

  /** Decode one embedded-metadata JSON (None on any parse failure —
    * the conservative fall-back-to-listing answer). */
  private def decodeMeta(json: String): Option[SegMeta] =
    scala.util.Try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val j = JsonMethods.parse(json)
      val files = (j \ "files") match {
        case JArray(xs) => xs.flatMap { x =>
          ((x \ "p"), (x \ "l")) match {
            case (JString(pp), JInt(l)) => Some((pp, l.toLong))
            case _ => None
          }
        }
        case _ => Seq.empty[(String, Long)]
      }
      val schema = (j \ "schema") match {
        case JNothing | JNull => None
        case s => scala.util.Try(DataType.fromJson(
          JsonMethods.compact(JsonMethods.render(s)))
          .asInstanceOf[StructType]).toOption
      }
      val stats = (j \ "stats") match {
        case JNothing | JNull => None
        case s => Some(statsFromJValue(s))
      }
      val blooms = (j \ "blooms") match {
        case JArray(xs) => xs.collect { case JString(b) => b }
        case _ => Seq.empty[String]
      }
      SegMeta(files, schema, stats, blooms)
    }.toOption

  private[io] def metasFromLines(lines: Seq[String]): Map[String, SegMeta] =
    lines.iterator
      .filter(_.startsWith(MetaPrefix))
      .flatMap { l =>
        val rest = l.stripPrefix(MetaPrefix)
        val sp = rest.indexOf(' ')
        if (sp <= 0) None
        else decodeMeta(rest.drop(sp + 1)).map(m => (rest.take(sp), m))
      }.toMap

  /** Embedded per-segment metadata of manifest `version` (head when
    * None): the one-log-read planning input for the SQL relation.
    * Segments without a (parseable) `#meta` line are simply absent —
    * callers fall back to the per-segment listing/sidecar path for
    * those. */
  def segmentMetas(spark: SparkSession, root: String,
      version: Option[Long] = None): Map[String, SegMeta] = {
    val (f, p) = fs(spark, root)
    version.orElse(currentVersion(f, p)) match {
      case None => Map.empty
      case Some(v) => metasFromLines(manifestLines(f, p, v))
    }
  }

  /** ONE-read snapshot of manifest `v`: (segment list, embedded metas,
    * content fingerprint). The SQL relation's entire planning input —
    * and the fingerprint is its cache key: version numbers can recur
    * across destroy/recreate, but never with identical content (every
    * segment name carries a fresh UUID). */
  private[graft] def manifestSnapshot(spark: SparkSession, root: String,
      v: Long): (Seq[String], Map[String, SegMeta], String, Seq[String],
        Seq[(String, String)]) = {
    val (f, p) = fs(spark, root)
    require(f.exists(new Path(p, ManifestPrefix + v)),
      s"no committed manifest version $v under $root")
    val lines = manifestLines(f, p, v)
    val segs = lines.filterNot(_.startsWith("#"))
    val md = java.security.MessageDigest.getInstance("MD5")
    val hash = md.digest(lines.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (segs, metasFromLines(lines), hash, dropColLines(lines), colMapLines(lines))
  }

  private[io] def writeSeg(df: DataFrame, dir: String, partitionBy: Seq[String]): Unit = {
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
    * (name scan, no data read) and skip the duplicate append.
    * `statsCols` names columns whose per-segment min/max are collected
    * into a `_stats.graft.json` sidecar INSIDE the segment dir (an
    * O(batch) pass over the committed bytes; data readers ignore
    * `_`-prefixed files) — the zone-map input [[readRange]] prunes
    * whole segments with. */
  def append(spark: SparkSession, root: String, df: DataFrame,
      partitionBy: Seq[String] = Nil, tag: Option[String] = None,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil,
      retryRaces: Boolean = false): Unit = {
    rejectReservedTag(tag)
    appendReserved(spark, root, df, partitionBy, tag, statsCols, bloomCols,
      retryRaces)
  }

  /** Tags of the form `mb<digits>` name the streaming sink's
    * micro-batch replay namespace ([[graft.sources.ManifestSink]] /
    * [[graft.streaming.Stream.runLakehouseIngest]] detect an
    * already-committed batch from the segment NAME scan alone). A user
    * batch append tagged `mb3` on the same root would make the sink
    * silently SKIP micro-batch 3 — data loss — so the public write
    * paths reject the namespace loudly, mirroring [[AggView]]'s
    * `b<digits>` cursor guard. */
  private val ReservedTagRe = "mb\\d+".r

  private[graft] def rejectReservedTag(tag: Option[String]): Unit =
    tag.foreach { t =>
      require(!ReservedTagRe.pattern.matcher(t).matches(),
        s"tag '$t' is reserved: mb<digits> names streaming micro-batch " +
          "segments (a colliding tag would make the sink silently skip " +
          "that batch on replay) — pick another tag")
    }

  /** [[append]] without the reserved-tag guard — the streaming ingest
    * paths' entry point (they OWN the `mb<digits>` namespace).
    *
    * `retryRaces = true` makes a lost version race retry against the
    * new head instead of throwing: appends are ADDITIVE (every prior
    * segment is carried unchanged and the new rows do not depend on
    * the snapshot), so concurrent appends serialize in any order —
    * the multi-writer ingest posture every lakehouse log supports.
    * The already-written segment is RENAMED to carry the new commit
    * version (segment names encode it; the change feed's
    * consumed-before-cursor check depends on that), its metadata
    * reused verbatim (file paths are segment-relative). Retry stays
    * OPT-IN because it is only sound for content-independent commits:
    * a snapshot-derived append (e.g. [[AggView]]'s window partials —
    * two racing syncs would double-count) must keep the loud
    * single-winner contract. Appends never GC, so racing appends
    * cannot collect each other's in-flight segments; and a REWRITE-
    * class verb's GC pass (replace/compact/cluster/DML) spares any
    * unnamed dir younger than [[gcGraceMs]], so an append racing a
    * rewrite cannot have its written-but-uncommitted segment collected
    * either — appends are the unlimited-concurrency path against ANY
    * single concurrent verb. Only rewrite-class verbs racing EACH
    * OTHER stay a single-writer-maintenance recommendation: the OCC
    * retry serializes disjoint interleavers, but a loser mid-read of
    * segments the winner just retired fails loudly (never silently)
    * and must re-run. */
  private[graft] def appendReserved(spark: SparkSession, root: String,
      df: DataFrame, partitionBy: Seq[String] = Nil,
      tag: Option[String] = None, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil, retryRaces: Boolean = false,
      addMaps: Seq[(String, String)] = Nil): Unit = {
    val (f, p) = fs(spark, root)
    var v = currentVersion(f, p).getOrElse(0L)
    // physical-name constancy: callers write LOGICAL names; the
    // segment stores PHYSICAL (mapping entries being committed WITH
    // this append — addColumns' re-ADD — translate too). Stats/Bloom
    // sidecars are keyed physical, matching the probe translation in
    // readRange/readPoint and the SQL relation's pushed filters.
    val mapping0 = columnMapping(spark, root)
    val mapping = mapping0.filterNot { case (mp, _) =>
      addMaps.exists(_._1 == mp) } ++ addMaps
    val pdf = toPhysical(df, mapping)
    val pStats = statsCols.map(physicalNameOf(spark, mapping, _))
    val pBlooms = bloomCols.map(physicalNameOf(spark, mapping, _))
    val t = tag.map(_ + "-").getOrElse("")
    val suffix = java.util.UUID.randomUUID().toString.take(8)
    var seg = s"seg-${v + 1}-$t$suffix"
    // flat + stats-bearing: the min/max/count ride the write's scan
    val (frame, obs) =
      if (pStats.nonEmpty && partitionBy.isEmpty) observedStats(pdf, pStats)
      else (pdf, None)
    writeSeg(frame, s"$root/$seg", partitionBy)
    val statsJson =
      if (pStats.isEmpty) None
      else obs match {
        case Some((o, typed)) =>
          Some(publishObservedStats(f, s"$root/$seg", o, typed))
        case None => Some(writeStats(spark, f, s"$root/$seg", pStats))
      }
    if (pBlooms.nonEmpty) writeBlooms(spark, f, s"$root/$seg", pBlooms)
    val meta = buildMeta(spark, f, root, seg, statsJson, pBlooms)
    var attempts = 0
    while (true) {
      try {
        val prior = if (v == 0L) Seq.empty else readManifest(f, p, v)
        commit(f, p, v + 1, prior :+ seg,
          metas = priorMetas(f, p, v) + (seg -> meta), addMaps = addMaps)
        return
      } catch {
        case _: CommitRaceLost if retryRaces && attempts < 50 =>
          attempts += 1
          val nv = currentVersion(f, p).getOrElse(0L)
          val ns = s"seg-${nv + 1}-$t$suffix"
          require(f.rename(new Path(p, seg), new Path(p, ns)),
            s"append retry could not re-version segment $seg -> $ns")
          seg = ns
          v = nv
      }
    }
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
    rejectReservedTag(tag)
    val (f, p) = fs(spark, root)
    val v = currentVersion(f, p).getOrElse(
      throw new IllegalStateException(s"delete from uncommitted table $root"))
    val t = tag.map(_ + "-").getOrElse("")
    val seg = s"$DelPrefix${v + 1}-$t${java.util.UUID.randomUUID().toString.take(8)}"
    // tombstone keys store PHYSICAL names like every segment (the
    // merge-on-read anti-join runs in physical space, pre-projection)
    toPhysical(keys, columnMapping(spark, root)).distinct()
      .write.parquet(s"$root/$seg")
    // tombstones carry embedded metadata too: the streaming source
    // plans change-feed batches from the manifest alone (its recovery
    // contract re-requests committed windows whose segments
    // maintenance may have retired)
    val meta = buildMeta(spark, f, root, seg, None, Nil)
    commit(f, p, v + 1, readManifest(f, p, v) :+ seg,
      metas = priorMetas(f, p, v) + (seg -> meta))
  }

  /** Replace the whole table with `df` (first write, or an explicit
    * compaction rewrite) and garbage-collect every dir the new
    * manifest no longer names — committed predecessors and crash
    * orphans alike. `tag` folds into the segment name exactly as in
    * [[append]] (callers that ride state in tags — e.g. [[AggView]]'s
    * change-feed cursor — keep it across the rewrite). `rewrite=true`
    * marks the commit as a pure repackaging of existing rows (see
    * [[changedSegments]] — caught-up feed consumers skip it). */
  def replace(spark: SparkSession, root: String, df: DataFrame,
      partitionBy: Seq[String] = Nil, tag: Option[String] = None,
      rewrite: Boolean = false, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): Unit = {
    rejectReservedTag(tag)
    val (f, p) = fs(spark, root)
    val v = currentVersion(f, p).getOrElse(0L)
    val t = tag.map(_ + "-").getOrElse("")
    val seg = s"seg-${v + 1}-$t${java.util.UUID.randomUUID().toString.take(8)}"
    // flat + stats-bearing: the min/max/count ride the write's scan
    val (frame, obs) =
      if (statsCols.nonEmpty && partitionBy.isEmpty) observedStats(df, statsCols)
      else (df, None)
    writeSeg(frame, s"$root/$seg", partitionBy)
    val statsJson =
      if (statsCols.isEmpty) None
      else obs match {
        case Some((o, typed)) =>
          Some(publishObservedStats(f, s"$root/$seg", o, typed))
        case None => Some(writeStats(spark, f, s"$root/$seg", statsCols))
      }
    if (bloomCols.nonEmpty) writeBlooms(spark, f, s"$root/$seg", bloomCols)
    val meta = buildMeta(spark, f, root, seg, statsJson, bloomCols)
    // full overwrite: the new content defines the schema — dropped-
    // column tombstones retire (compact routes here too, and writes
    // through the post-drop projection)
    commit(f, p, v + 1, Seq(seg), if (rewrite) Seq(RewriteMark) else Nil,
      metas = Map(seg -> meta), clearDrops = true)
    gc(f, p)
  }

  /** `ALTER TABLE … ADD COLUMN(S)`: additive schema evolution as ONE
    * log commit with ZERO data IO beyond a footer-sized file — the
    * table's schema is the additive merge of its segments' schemas in
    * commit order, so appending an EMPTY segment that carries the
    * evolved schema makes every reader see the new columns (untouched
    * segments surface NULL there, the same contract MERGE WITH SCHEMA
    * EVOLUTION uses). Old snapshots time-travel to the pre-ALTER
    * schema; [[compact]] later folds the marker segment away. New
    * columns are nullable by construction (existing rows have no
    * value for them). Reference posture: warehouse-side `ALTER TABLE`
    * through `execute` (locopy/database.py:131-190). */
  def addColumns(spark: SparkSession, root: String,
      cols: Seq[(String, org.apache.spark.sql.types.DataType)]): Unit = {
    require(cols.nonEmpty, "ADD COLUMNS needs at least one column")
    val (f, p) = fs(spark, root)
    val v = currentVersion(f, p).getOrElse(throw new IllegalStateException(
      s"ALTER TABLE of uncommitted table $root — INSERT first (or declare " +
        "the columns in CREATE TABLE)"))
    val cur = read(spark, root).schema
    val eq = spark.sessionState.conf.resolver
    cols.foreach { case (n, _) =>
      require(!cur.fields.exists(fd => eq(fd.name, n)),
        s"column $n already exists in $root (${cur.simpleString})")
    }
    // dedupe with the SESSION resolver (not unconditional lowercase):
    // under spark.sql.caseSensitive=true, (A INT, a INT) is two columns
    require(cols.size < 2 || !cols.map(_._1).combinations(2).exists {
      case Seq(a, b) => eq(a, b) },
      s"duplicate column in ADD COLUMNS: ${cols.map(_._1)}")
    // re-ADD of a DROPped name (or a name shadowing a live PHYSICAL
    // name of some renamed column): the new column gets a FRESH
    // physical name + a `#colmap` entry committed atomically WITH the
    // schema marker, so old values in unrewritten segments can never
    // resurface — the column-mapping lifecycle (pre-r17 this rejected
    // loudly until a full rewrite retired the tombstone)
    val (dropped, mapping) = schemaActionsAt(spark, root, v)
    val rawPhysical =
      graft.sources.ManifestSource
        .relation(spark, root, None, allowTombstones = true)
        .dataSchema.fieldNames.toSeq
    val taken = scala.collection.mutable.Set.empty[String]
    taken ++= dropped
    taken ++= rawPhysical
    taken ++= mapping.map(_._1)
    val addMaps = cols.flatMap { case (n, _) =>
      if (!taken.exists(eq(_, n))) { taken += n; None }
      else {
        var fresh = s"${n}__r${v + 1}"
        while (taken.exists(eq(_, fresh)))
          fresh += "_" + java.util.UUID.randomUUID().toString.take(4)
        taken += fresh
        Some((fresh, n))
      }
    }
    val evolved = org.apache.spark.sql.types.StructType(
      cur.fields ++ cols.map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n, t, nullable = true) })
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), evolved)
    appendReserved(spark, root, empty, tag = Some("alter"),
      addMaps = addMaps)
  }

  /** `ALTER TABLE … DROP COLUMN(S)`: one schema-projection commit (a
    * `#dropcol` line per column, carried forward by every later
    * commit) — ZERO data IO; segment bytes are untouched and the
    * column physically disappears when a rewrite-class verb next
    * repackages the rows. Pre-drop snapshots time-travel with the
    * column intact. Partition columns and the last remaining column
    * are rejected. See [[DropColPrefix]] for the re-add contract. */
  def dropColumns(spark: SparkSession, root: String,
      cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "DROP COLUMNS needs at least one column")
    val (f, p) = fs(spark, root)
    val v = currentVersion(f, p).getOrElse(throw new IllegalStateException(
      s"ALTER TABLE of uncommitted table $root"))
    val eq = spark.sessionState.conf.resolver
    val rel = graft.sources.ManifestSource
      .relation(spark, root, None, allowTombstones = true)
    // callers name LOGICAL columns; partition columns are never mapped
    // (renames reject them) and the `#dropcol` tombstone records the
    // PHYSICAL name — the reader projection drops physical-first
    val mapping = columnMappingAt(spark, root, v)
    cols.foreach { c =>
      require(!rel.partitionSchema.fieldNames.exists(eq(_, c)),
        s"$c is a hive PARTITION column of $root — the physical layout " +
          "depends on it; re-partition via cluster()/compact() instead")
    }
    val visible = rel.dataSchema.fieldNames
      .map(logicalNameOf(spark, mapping, _))
    cols.foreach { c =>
      require(visible.exists(eq(_, c)),
        s"column $c does not exist in $root (${visible.mkString(", ")})")
    }
    // session-resolver dedupe, same contract as the existence checks
    require(cols.size < 2 || !cols.combinations(2).exists {
      case Seq(a, b) => eq(a, b) },
      s"duplicate column in DROP COLUMNS: $cols")
    require(visible.length + rel.partitionSchema.size > cols.size,
      s"cannot DROP every column of $root")
    commit(f, p, v + 1, readManifest(f, p, v), Seq(AlterMark),
      metas = priorMetas(f, p, v),
      addDrops = cols.map(physicalNameOf(spark, mapping, _)))
  }

  /** `ALTER TABLE … RENAME COLUMN old TO new`: ONE metadata commit (a
    * `#colmap` line binding the column's unchanged PHYSICAL name to
    * its new LOGICAL name) — zero data IO at any scale, because no
    * segment byte ever depended on the logical name: writers keep
    * writing the constant physical name and readers rename in their
    * final projection ([[ColMapPrefix]]). Time travel is exact (each
    * version's manifest carries its own mapping); a FULL rewrite
    * converges physical names back to logical and clears the entry.
    * Hive PARTITION columns are rejected (their name IS the directory
    * layout); the new name must not collide with any visible logical
    * name, any live physical name, or a dropped-column tombstone —
    * all loud. */
  def renameColumn(spark: SparkSession, root: String,
      oldName: String, newName: String): Unit = {
    require(oldName != newName, s"RENAME COLUMN $oldName TO $newName is a no-op")
    val (f, p) = fs(spark, root)
    val v = currentVersion(f, p).getOrElse(throw new IllegalStateException(
      s"ALTER TABLE of uncommitted table $root"))
    val eq = spark.sessionState.conf.resolver
    val rel = graft.sources.ManifestSource
      .relation(spark, root, None, allowTombstones = true)
    require(!rel.partitionSchema.fieldNames.exists(eq(_, oldName)),
      s"$oldName is a hive PARTITION column of $root — its name IS the " +
        "directory layout; re-partition via cluster()/compact() instead")
    val (dropped, mapping) = schemaActionsAt(spark, root, v)
    val rawPhysical = rel.dataSchema.fieldNames.toSeq
    val visibleLogical = rawPhysical.map(logicalNameOf(spark, mapping, _)) ++
      rel.partitionSchema.fieldNames
    require(visibleLogical.exists(eq(_, oldName)),
      s"column $oldName does not exist in $root " +
        s"(${visibleLogical.mkString(", ")})")
    require(!visibleLogical.exists(eq(_, newName)),
      s"column $newName already exists in $root")
    require(!rawPhysical.exists(eq(_, newName)) ||
        eq(physicalNameOf(spark, mapping, oldName), newName),
      s"$newName is the PHYSICAL name of another column of $root " +
        "(renamed earlier); reusing it would make old segment bytes " +
        "ambiguous — pick another name, or compact() first (a full " +
        "rewrite converges physical names back to logical)")
    require(!dropped.exists(eq(_, newName)),
      s"$newName is a DROPped-column tombstone of $root still covering " +
        "unrewritten segments — pick another name, or compact() first")
    val phys = physicalNameOf(spark, mapping, oldName)
    commit(f, p, v + 1, readManifest(f, p, v), Seq(AlterMark),
      metas = priorMetas(f, p, v), addMaps = Seq((phys, newName)))
  }

  /** `ALTER TABLE … ALTER COLUMN col TYPE t`: SAFE TYPE WIDENING as
    * ONE metadata commit — the same empty schema-carrying marker
    * segment [[addColumns]] appends, except the column's type is
    * widened instead of a column added. Readers derive the table
    * schema from the additive merge of segment schemas, widening
    * same-name numeric conflicts ([[graft.sources.ManifestSource]]),
    * and Spark 4's parquet reader upcasts old segments' values at
    * scan time (int32→int64/double, float→double, decimal precision
    * growth — verified on this engine), so NO segment is rewritten:
    * the evolution every long-lived 100 TB table eventually needs at
    * zero data IO. The typed union path widens identically (set-
    * operation type coercion). Old snapshots time-travel to the
    * narrow type. Narrowing or cross-family changes reject loudly. */
  def alterColumnType(spark: SparkSession, root: String,
      colName: String, newType: org.apache.spark.sql.types.DataType): Unit = {
    val (f, p) = fs(spark, root)
    require(currentVersion(f, p).isDefined,
      s"ALTER TABLE of uncommitted table $root")
    val eq = spark.sessionState.conf.resolver
    val rel = graft.sources.ManifestSource
      .relation(spark, root, None, allowTombstones = true)
    require(!rel.partitionSchema.fieldNames.exists(eq(_, colName)),
      s"$colName is a hive PARTITION column of $root — its values are " +
        "directory names typed by discovery; re-partition via " +
        "cluster()/compact() instead")
    val cur = read(spark, root).schema
    val field = cur.fields.find(fd => eq(fd.name, colName)).getOrElse(
      throw new IllegalArgumentException(
        s"column $colName does not exist in $root (${cur.simpleString})"))
    require(field.dataType != newType,
      s"column $colName of $root already has type ${newType.simpleString}")
    require(safeWiden(field.dataType, newType),
      s"ALTER COLUMN TYPE on $root supports SAFE WIDENING only " +
        s"(${field.dataType.simpleString} -> ${newType.simpleString} is " +
        "not one): int->bigint/double, float->double, smaller integrals " +
        "up, decimal(p,s) growing in both precision slack and scale — " +
        "narrowing would corrupt existing segment values at read time")
    val evolved = org.apache.spark.sql.types.StructType(cur.fields.map { fd =>
      if (eq(fd.name, colName)) fd.copy(dataType = newType, nullable = true)
      else fd
    })
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), evolved)
    appendReserved(spark, root, empty, tag = Some("alter"))
  }

  /** Is `from -> to` a widening the scan layer performs losslessly?
    * Mirrors what Spark 4's vectorized parquet reader upcasts (and
    * what union type coercion widens to): integrals up to LongType,
    * {byte,short,int}→double exactly, float→double, decimal growth
    * that loses neither integer digits nor scale. */
  private[graft] def safeWiden(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (ByteType | ShortType | IntegerType, DoubleType) => true
      case (FloatType, DoubleType) => true
      case (a: DecimalType, b: DecimalType) =>
        b.scale >= a.scale && b.precision - b.scale >= a.precision - a.scale &&
          (b.scale > a.scale || b.precision > a.precision)
      case _ => false
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
    try replace(spark, root, snap, partitionBy, rewrite = true)
    finally graft.core.Lineage.release(snap)
  }

  // ------------------------------------------------------------------
  // Physical retention: how many manifest versions' SEGMENTS survive a
  // rewrite. Every real lakehouse separates logical rewrite from
  // physical vacuum — "reproducible training runs pin a version" only
  // holds through nightly maintenance if optimize/cluster/compact keep
  // the data the recent history names. The horizon is a table-level
  // setting persisted under root (`_retain.graft`, default 1 =
  // immediate GC, the pre-retention behavior); [[vacuum]] is the
  // explicit physical GC that [[expireVersions]] (log-side) pairs
  // with.
  // ------------------------------------------------------------------

  private val RetainFile = "_retain.graft"

  /** Set the table's retention horizon: rewrites ([[replace]]/
    * [[optimize]]/[[cluster]]/[[clusterZ]]/[[clusterRange]]/
    * [[compact]]) keep every segment still named by the newest `n`
    * committed manifest versions, so [[readAt]]/[[readMergedAt]]/
    * [[readChanges]] stay serviceable that far back regardless of
    * maintenance cadence. Overwrites any previous setting (it is a
    * knob, not a commit — readers never resolve it for correctness). */
  def setRetainVersions(spark: SparkSession, root: String, n: Int): Unit = {
    require(n >= 1, s"retainVersions must be >= 1, got $n")
    val (f, p) = fs(spark, root)
    if (!f.exists(p)) f.mkdirs(p)
    // tmp-write + OVERWRITE rename: this knob governs physical
    // DELETION, so the marker must never be torn OR absent mid-swap —
    // a delete-then-rename window would let a concurrent rewrite's
    // gc() read "unset" and fall back to horizon 1 (the MOST
    // aggressive deletion setting), collecting history the configured
    // horizon promised to keep. FileContext.rename(OVERWRITE) swaps
    // atomically on HDFS/local/ABFS; retainOf additionally falls back
    // to the newest tmp marker so even a crash between create and
    // rename (or an FS without overwrite rename) never reads as
    // "unset".
    val tmp = new Path(p,
      s"$RetainFile.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, f.getConf)
    fc.rename(fc.makeQualified(tmp), fc.makeQualified(new Path(p, RetainFile)),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The table's retention horizon (default 1: only the current
    * manifest's segments survive a rewrite). */
  def retainVersions(spark: SparkSession, root: String): Int = {
    val (f, p) = fs(spark, root)
    retainOf(f, p)
  }

  private def parseRetain(f: FileSystem, p: Path): Int = {
    val in = f.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    // LOUD on garbage: silently falling back to 1 would let the next
    // rewrite garbage-collect history the configured horizon
    // promised to keep — a corrupt deletion knob must stop the
    // deletion, not shrink it
    scala.util.Try(txt.toInt).toOption.filter(_ >= 1).getOrElse(
      throw new IllegalStateException(
        s"corrupt retention marker $p (content: '$txt'); refusing to " +
          "garbage-collect — setRetainVersions() to repair"))
  }

  private def retainOf(f: FileSystem, root: Path): Int = {
    val p = new Path(root, RetainFile)
    if (f.exists(p)) parseRetain(f, p)
    else {
      // marker absent: before defaulting to 1 (immediate GC), honor
      // any tmp marker a crashed/in-flight setRetainVersions left —
      // an INTENDED horizon must never silently read as "delete
      // everything past head" (newest tmp wins; a torn tmp still
      // fails parseRetain's loud contract)
      val tmps =
        if (!f.exists(root)) Array.empty[org.apache.hadoop.fs.FileStatus]
        else f.listStatus(root).filter(st =>
          st.isFile && st.getPath.getName.startsWith(RetainFile + ".tmp-"))
      if (tmps.isEmpty) 1 // genuinely unset: the pre-retention default
      else parseRetain(f, tmps.maxBy(_.getModificationTime).getPath)
    }
  }

  private def versionsOf(f: FileSystem, root: Path): Seq[Long] =
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).iterator.map(_.getPath.getName)
      .filter(n => n.startsWith(ManifestPrefix) && !n.contains(".tmp-"))
      .map(_.stripPrefix(ManifestPrefix).toLong).toSeq.sorted

  /** Dirs named by any of the newest `horizon` manifest versions still
    * on disk — the physically-live set a GC pass must keep. */
  private def liveDirs(f: FileSystem, root: Path, horizon: Int): Set[String] =
    versionsOf(f, root).takeRight(horizon)
      .flatMap(v => readManifest(f, root, v)).toSet

  /** Grace window (ms) before an UNNAMED dir is collected. A dir named
    * by no manifest on disk is usually a crashed append's orphan — but
    * it can also be a CONCURRENT appender's written-but-not-yet-
    * committed segment (append = writeSeg, then commit names it), and
    * deleting that between its write and its commit would publish a
    * manifest naming a vanished dir. GC therefore collects unnamed
    * dirs only once they are older than this window; dirs named by a
    * manifest on disk carry no such ambiguity (their writer already
    * committed) and are collected as soon as they fall outside the
    * retention horizon. Override via system property
    * `graft.manifest.gc.graceMs`; specs pin small values to observe
    * orphan collection deterministically.
    *
    * CLOCK CONTRACT: dir ages are judged on the STORE's clock, not the
    * driver's — the cutoff base is `min(driver now, newest manifest
    * mtime)` ([[gcKeeping]]). Dir mtimes and manifest mtimes come from
    * the same store clock, so when the store runs BEHIND the driver
    * (where a driver-clock cutoff would silently shrink the effective
    * window and collect a concurrent appender's in-flight segment
    * early) the min picks the store-stamped bound and the window stays
    * exact; a store running AHEAD only lengthens the window (dirs
    * linger — safe). A stale newest-manifest mtime (quiet table) also
    * only lengthens it. */
  private[io] def gcGraceMs: Long =
    sys.props.get("graft.manifest.gc.graceMs").map(_.toLong)
      .getOrElse(60L * 60 * 1000)

  /** Delete every dir/file under `root` that no manifest inside the
    * retention horizon names: superseded segments past retention after
    * a [[replace]]-class rewrite immediately, and orphans from crashed
    * appends (named by NO manifest) once older than [[gcGraceMs]] —
    * the grace spares an in-flight concurrent append's segment dir.
    * Manifest files and the retention marker stay ([[expireVersions]]
    * trims the former). */
  private[io] def gc(f: FileSystem, root: Path): Unit = {
    // every dir the just-published commit retired is named by the
    // PREVIOUS head manifest — ONE read covers the mass-retirement
    // case (compact/cluster retiring thousands of fresh segments),
    // keeping GC O(1) in retired-dir count
    val priorNamed = currentVersion(f, root).filter(_ >= 2)
      .map(v => scala.util.Try(readManifest(f, root, v - 1))
        .getOrElse(Seq.empty).toSet)
      .getOrElse(Set.empty[String])
    gcKeeping(f, root, retainOf(f, root), priorNamed)
  }

  private def gcKeeping(f: FileSystem, root: Path, horizon: Int,
      namedHint: Set[String] = Set.empty): Seq[String] = {
    val live = liveDirs(f, root, horizon)
    val statuses = f.listStatus(root)
    // age on the STORE's clock (see gcGraceMs): the newest manifest
    // mtime is a store-stamped "no later than now" bound — min() with
    // the driver clock so a store running behind the driver never has
    // its in-flight appends' grace window silently shortened, and a
    // store running ahead (or a quiet table's stale mtime) only
    // lengthens it
    val storeNow = statuses.iterator
      .filter(st => st.isFile && st.getPath.getName.startsWith(ManifestPrefix))
      .map(_.getModificationTime)
      .foldLeft(Long.MinValue)(math.max)
    val nowBase =
      if (storeNow == Long.MinValue) System.currentTimeMillis()
      else math.min(System.currentTimeMillis(), storeNow)
    val cutoff = nowBase - gcGraceMs
    // "was this non-live dir ever COMMITTED?" — consulted ONLY for
    // dirs younger than the grace window that the hint (prior head /
    // vacuum's pre-expiry capture) does not name: a committed dir is
    // named first by the manifest whose version its own name encodes
    // (seg-<v>-…; retries re-version the name before committing), so
    // one memoized targeted read answers it. Old dirs delete on age
    // alone; just-retired dirs hit the hint — steady-state GC does
    // O(1) manifest IO regardless of how many dirs a rewrite retired.
    val memo = scala.collection.mutable.Map.empty[Long, Set[String]]
    def committed(n: String): Boolean =
      namedHint.contains(n) ||
        scala.util.Try(segVersion(n)).toOption.exists { v0 =>
          memo.getOrElseUpdate(v0,
            scala.util.Try(readManifest(f, root, v0))
              .getOrElse(Seq.empty).toSet).contains(n)
        }
    val removed = Seq.newBuilder[String]
    statuses.foreach { st =>
      val n = st.getPath.getName
      if (!live.contains(n) && !n.startsWith(ManifestPrefix) &&
          !n.startsWith(RetainFile) &&
          (st.getModificationTime < cutoff || committed(n))) {
        removed += n
        f.delete(st.getPath, true)
      }
    }
    removed.result()
  }

  /** Explicit physical GC, the pair to [[expireVersions]]' log-side
    * trim: expire every manifest older than the newest `keepLast`
    * versions, then delete every segment dir only those expired
    * versions named. LOUD — returns (expired versions, removed dirs),
    * so an operator sees exactly what history just became unreadable;
    * a consumer pinned past the horizon gets a missing-manifest error
    * on its next read, never a silently different answer. Run at
    * whatever cadence bounds disk debt; between runs the table's
    * [[retainVersions]] horizon governs what rewrites keep. */
  def vacuum(spark: SparkSession, root: String,
      keepLast: Int): (Seq[Long], Seq[String]) = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val (f, p) = fs(spark, root)
    // capture what the about-to-expire manifests name BEFORE expiring
    // them: those dirs were committed (no in-flight-append ambiguity)
    // and must be collected NOW regardless of the unnamed-dir grace
    val namedBefore = versionsOf(f, p)
      .flatMap(v => readManifest(f, p, v)).toSet
    val expired = expireVersions(spark, root, keepLast)
    (expired, gcKeeping(f, p, keepLast, namedBefore))
  }

  /** Bound LOG metadata growth: delete every manifest file older than
    * the newest `keepLast` versions. This is the retention horizon for
    * [[readAt]] time travel and [[readChanges]] consumers — a consumer
    * whose pinned version expires gets a loud missing-manifest error
    * and full-refreshes, never a silently different answer. Segment
    * DATA is untouched (liveness is governed by the retention-horizon
    * manifests; see [[vacuum]] for the paired physical trim), so this
    * is purely the log-side VACUUM: a few hundred bytes per expired
    * version, run at whatever cadence bounds the listing. Returns the
    * expired versions. */
  def expireVersions(spark: SparkSession, root: String,
      keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val (f, p) = fs(spark, root)
    val drop = versions(spark, root).dropRight(keepLast)
    drop.foreach(v => f.delete(new Path(p, ManifestPrefix + v), false))
    drop
  }

  /** Remove the table entirely. */
  def destroy(spark: SparkSession, root: String): Unit = {
    val (f, p) = fs(spark, root)
    f.delete(p, true)
    ()
  }

  // ------------------------------------------------------------------
  // Change feed: incremental consumption between manifest versions.
  //
  // Because appends/deletes only ever ADD segment names to the
  // manifest, the delta between two versions IS the set of segments
  // committed in the window — a consumer that remembers the last
  // version it processed reads O(new data) per poll, never the table.
  //
  // Maintenance rewrites ([[compact]]/[[optimize]]/[[cluster]]) only
  // REPACKAGE rows the log already held, so they commit with a
  // #rewrite mark and the feed walks THROUGH them: a rewrite
  // contributes no changed segments, PROVIDED everything it folded was
  // already behind the consumer's cursor (segment names carry their
  // commit version, so this is checkable per consumer). A rewrite that
  // folded unconsumed segments — or any unmarked drop — fails loudly
  // and the consumer full-refreshes, the fallback contract every
  // lakehouse change-data-feed ships with. This is strictly stronger
  // than the usual "compaction breaks CDF" rule: nightly maintenance
  // is invisible to caught-up consumers.
  // ------------------------------------------------------------------

  /** Segment names committed after version `fromV`, up to and
    * including `toV` (`fromV = 0` = bootstrap: the full segment list
    * at `toV`, i.e. current state). Marked rewrites of
    * already-consumed segments are skipped; anything else that drops
    * a segment throws (full refresh required) — including row-level
    * DML commits, which this additions-only view cannot represent
    * (their pre-image deletes ride [[changedSegmentsDml]]/
    * [[readChanges]]). */
  def changedSegments(spark: SparkSession, root: String,
      fromV: Long, toV: Long): Seq[String] =
    walkChanges(spark, root, fromV, toV, dmlAware = false)._1

  /** DML-aware change walk: `(additions, preImages)` for the window
    * `(fromV, toV]`. `additions` is [[changedSegments]]' answer;
    * `preImages` names every segment a [[DmlMark]]ed commit dropped
    * whose rows the consumer HAD seen (committed at or before `fromV`,
    * or the output of an in-window rewrite) — their full rows are the
    * window's value-identity DELETES, to be applied before the
    * window's inserts. A segment added AND dml-dropped inside the same
    * window nets out entirely (never delivered, its survivors ride the
    * replacement segment). Each pre-image carries the embedded
    * metadata the manifest held just before the drop, so planned
    * readers ([[graft.sources.ManifestSource.readSegsPlanned]]) can
    * build the batch without filesystem listings. */
  private[graft] def changedSegmentsDml(spark: SparkSession, root: String,
      fromV: Long, toV: Long): (Seq[String], Seq[(String, Option[SegMeta])]) =
    walkChanges(spark, root, fromV, toV, dmlAware = true)

  private def walkChanges(spark: SparkSession, root: String,
      fromV: Long, toV: Long, dmlAware: Boolean)
      : (Seq[String], Seq[(String, Option[SegMeta])]) = {
    require(fromV <= toV, s"change window [$fromV, $toV] is inverted")
    if (fromV == 0L) return (segmentsAt(spark, root, toV), Nil)
    val (f, p) = fs(spark, root)
    var prev = segmentsAt(spark, root, fromV)
    // outputs of safe rewrites seen in this walk: repackagings of
    // already-consumed rows, so later rewrites may drop them too
    var rewriteOutputs = Set.empty[String]
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    val pre = Seq.newBuilder[(String, Option[SegMeta])]
    (fromV + 1 to toV).foreach { v =>
      val cur = segmentsAt(spark, root, v)
      val prevSet = prev.toSet
      val curSet = cur.toSet
      val dropped = prev.filterNot(curSet)
      if (dropped.isEmpty) out ++= cur.filterNot(prevSet)
      else if (isDml(f, p, v)) {
        require(dmlAware,
          s"v$v of $root is a row-level DML commit (segments rewritten " +
            s"in place: ${dropped.mkString(", ")}); this consumer reads " +
            "additions only — consume through readChanges (pre-image " +
            "deletes + re-inserts) or full-refresh and re-pin")
        // pre-image metadata = what the manifest said just before the
        // drop (the replacement's commit no longer names the segment)
        lazy val prevMetas = metasFromLines(manifestLines(f, p, v - 1))
        dropped.foreach { d =>
          if (out.contains(d)) out -= d // in-window addition: nets out
          else {
            rewriteOutputs -= d
            pre += ((d, prevMetas.get(d)))
          }
        }
        out ++= cur.filterNot(prevSet)
      } else {
        require(isRewrite(f, p, v),
          s"v$v dropped segments without a rewrite mark " +
            s"(${dropped.mkString(", ")}); " +
            "change feed invalid — full refresh and re-pin required")
        val unconsumed = dropped
          .filter(d => segVersion(d) > fromV && !rewriteOutputs(d))
        require(unconsumed.isEmpty,
          s"rewrite v$v folded segments the consumer at v$fromV never " +
            s"read (${unconsumed.mkString(", ")}); " +
            "change feed invalid — full refresh and re-pin required")
        // a safe rewrite's additions are repackaged already-consumed
        // rows: contribute nothing to the feed, but remember them
        rewriteOutputs ++= cur.filterNot(prevSet)
      }
      prev = cur
    }
    (out.toSeq, pre.result())
  }

  private[io] def isDml(f: FileSystem, root: Path, v: Long): Boolean =
    manifestLines(f, root, v).contains(DmlMark)

  /** Bytes of the segments ADDED by commit `v` — the admission-control
    * input for byte-capped streaming triggers ([[graft.sources
    * .ManifestSource]]'s `maxBytesPerTrigger`). Sizes come from the
    * embedded `#meta` file lists (zero data IO); a legacy segment
    * without one pays a recursive listing. [[RewriteMark]]ed commits
    * count ZERO: their additions repackage rows behind a caught-up
    * cursor (the feed batch is empty), so a compact of a huge table
    * must not stall a byte-capped drain. If `v-1` is expired, every
    * segment of `v` counts (conservative overcount). */
  private[graft] def addedBytesOf(spark: SparkSession, root: String,
      v: Long): Long = {
    val (f, p) = fs(spark, root)
    val lines = manifestLines(f, p, v)
    if (lines.contains(RewriteMark)) return 0L
    val cur = lines.filterNot(_.startsWith("#"))
    val prev =
      if (v <= 1) Set.empty[String]
      else scala.util.Try(readManifest(f, p, v - 1).toSet)
        .getOrElse(Set.empty[String])
    val metas = metasFromLines(lines)
    cur.filterNot(prev).map { s =>
      metas.get(s).map(_.files.map(_._2).sum).getOrElse(
        scala.util.Try(
          listDataFilesRec(f, new Path(p, s), "").map(_._2).sum)
          .getOrElse(0L))
    }.sum
  }

  /** One commit's audit row: what kind of commit it was and how the
    * segment list moved. `kind` ∈ append (new data only) | delete
    * (tombstone segment committed) | rewrite (marked repackaging —
    * compact/optimize/cluster) | dml (row-level rewrite) | replace
    * (unmarked drop — first write or destructive replace). */
  final case class CommitInfo(version: Long, timeMs: Long, kind: String,
      segments: Int, added: Int, dropped: Int)

  /** The log's commit history, oldest first — DESCRIBE HISTORY for
    * the manifest log: O(available versions) driver metadata reads,
    * no data IO. After [[expireVersions]] the walk starts at the
    * oldest SURVIVING manifest (its row reads as the net state at
    * that point, `added == segments`). */
  def history(spark: SparkSession, root: String): Seq[CommitInfo] = {
    val (f, p) = fs(spark, root)
    var prev = Set.empty[String]
    versionsWithTimes(spark, root).map { case (v, t) =>
      val lines = manifestLines(f, p, v)
      val segs = lines.filterNot(_.startsWith("#"))
      val cur = segs.toSet
      val added = segs.count(!prev(_))
      val dropped = prev.count(!cur(_))
      val kind =
        if (lines.contains(DmlMark)) "dml"
        else if (lines.contains(AlterMark)) "alter"
        else if (lines.contains(RewriteMark)) "rewrite"
        else if (dropped > 0) "replace"
        else if (segs.exists(s => s.startsWith(DelPrefix) && !prev(s))) "delete"
        else "append"
      prev = cur
      CommitInfo(v, t, kind, segs.size, added, dropped)
    }
  }

  /** Change-data-feed read for the window `(fromV, toV]`: every row
    * appended in the window with `_change_type = 'insert'`, plus every
    * tombstone key committed in the window as `_change_type =
    * 'delete'` (tombstones carry only their key columns — other
    * columns surface NULL, same additive-union contract as schema
    * evolution). A row-level DML commit in the window additionally
    * emits the FULL pre-image rows of every segment it dropped as
    * `delete` rows, with its replacement segment riding the `insert`
    * side — a consumer reconstructs state by applying a window's
    * deletes BEFORE its inserts. Delete application is VALUE identity
    * via anti-join (a delete row kills every equal-valued copy — the
    * tombstone family's contract; the insert side then re-adds the
    * surviving multiset of the TOUCHED segments, so duplicate-valued
    * survivors confined to touched segments round-trip).
    *
    * '''Value-identity caveat (cross-segment duplicates).''' A
    * full-row duplicate that spans a touched and an UNtouched segment
    * does NOT round-trip under the anti-join contract: the pre-image
    * delete kills BOTH copies in the consumer while only the touched
    * segment's survivors ride the insert side — the table keeps the
    * untouched copy, the consumer silently loses it. Tables whose rows
    * carry a unique key (the normal feed posture) are immune; purely
    * value-identified multisets that may duplicate across segments
    * should pass `verifyDeletes = true`, which semi-joins the window's
    * pre-image rows against the untouched segments (null-safe, on the
    * delete frame's column set) and fails loudly with a full-refresh
    * instruction when the hazard is live. The check scans the
    * UNTOUCHED part of the table (that is the set being protected), so
    * it is opt-in rather than the default at 100 TB; [[AggView]] needs
    * neither — it applies multiset retraction, not anti-joins. The
    * FULL-fidelity posture is `rowId = true`: bootstrap the state from
    * [[readWithRowId]] and apply each DML window's deletes by
    * [[RowIdCol]] alone — row identity is per physical copy, so the
    * cross-segment-duplicate hazard cannot arise and verifyDeletes is
    * moot (skipped).
    *
    * Reading pre-images needs the dropped dirs still on
    * disk, i.e. a [[retainVersions]] horizon covering the window. A
    * window holding BOTH tombstones and DML pre-images is rejected
    * loudly: the two delete shapes are indistinguishable in one batch
    * (key-only NULL-padded rows vs full rows) — consume it as two
    * windows split at the DML version. IO is O(changed segments) by
    * construction (plus the untouched scan iff `verifyDeletes`). */
  def readChanges(spark: SparkSession, root: String,
      fromV: Long, toV: Long, verifyDeletes: Boolean = false,
      rowId: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val (chg, pre) = changedSegmentsDml(spark, root, fromV, toV)
    require(chg.nonEmpty || pre.nonEmpty,
      s"no segments committed in ($fromV, $toV] under $root")
    require(chg.forall(!_.startsWith(DelPrefix)) || pre.isEmpty,
      s"window ($fromV, $toV] of $root mixes merge-on-read tombstones " +
        "with row-level DML pre-images; one batch cannot carry both " +
        "delete shapes (key-only rows vs full pre-image rows) — consume " +
        "the window in two reads split at the DML version")
    // rowId = true stamps [[RowIdCol]] on the insert rows AND the DML
    // pre-image delete rows: a consumer that bootstrapped from
    // [[readWithRowId]] applies deletes by ROW identity (anti-join on
    // _row_id alone), which round-trips full-row duplicates spanning
    // touched and untouched segments — the shape value-identity
    // anti-joins cannot (see the caveat above; verifyDeletes becomes
    // unnecessary under rowId). Tombstone deletes stay key-valued
    // (_row_id NULL there — they delete by key, not by row).
    def readIns(segs: Seq[String]) =
      if (rowId) readSegsWithRowId(spark, root, segs)
      else readSegs(spark, root, segs)
    val ins = chg.filterNot(_.startsWith(DelPrefix))
    val del = chg.filter(_.startsWith(DelPrefix))
    val insDf =
      if (ins.isEmpty) None
      else Some(readIns(ins).withColumn("_change_type", lit("insert")))
    val preRows =
      if (pre.isEmpty) None
      // under rowId every pre-image row is already unique — a distinct
      // would only add a shuffle
      else if (rowId) Some(readSegsWithRowId(spark, root, pre.map(_._1)))
      else Some(readSegs(spark, root, pre.map(_._1)).distinct())
    // rowId supersedes the value-identity hazard check: identity
    // deletes cannot cross segments by construction
    if (verifyDeletes && !rowId) preRows.foreach { pr =>
      val droppedSet = pre.map(_._1).toSet
      val untouched = segmentsAt(spark, root, fromV)
        .filterNot(s => droppedSet(s) || s.startsWith(DelPrefix))
      if (untouched.nonEmpty) {
        val raw = readSegs(spark, root, untouched)
        // conform to the delete frame's column set (schema evolution:
        // a column the untouched segments lack reads NULL there, which
        // is exactly what the consumer's full-table read saw)
        val others = raw.select(pr.columns.toSeq.map(c =>
          (if (raw.columns.contains(c))
             org.apache.spark.sql.functions.col(c)
           else lit(null)).as(c)): _*)
        val cond = pr.columns.toSeq.map(c => pr(c) <=> others(c)).reduce(_ && _)
        require(pr.join(others, cond, "left_semi").isEmpty,
          s"window ($fromV, $toV] of $root carries DML pre-image delete " +
            "rows whose full-row value also lives in an UNtouched " +
            "segment — an anti-join consumer would kill the untouched " +
            "copy the table keeps (cross-segment duplicate hazard); " +
            "full-refresh from the head snapshot and re-pin")
      }
    }
    val delSides =
      (if (del.isEmpty) Nil
       else Seq(del.map(s => spark.read.parquet(s"$root/$s"))
         .reduce(_ unionByName _).distinct())) ++
      preRows.toList
    val delDf = delSides.reduceOption(_.unionByName(_, allowMissingColumns = true))
      .map(_.withColumn("_change_type", lit("delete")))
    val out = (insDf, delDf) match {
      case (Some(a), Some(b)) => a.unionByName(b, allowMissingColumns = true)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case _ => throw new IllegalStateException("unreachable: chg or pre nonEmpty")
    }
    // the window's consumers see the schema AS OF its end version
    applySchemaActions(out, schemaActionsAt(spark, root, toV))
  }

  /** Committed data segments with their on-disk byte sizes (driver-
    * side FS metadata listing — no data read). The planning input for
    * [[optimize]]'s small-file threshold. */
  def segmentSizes(spark: SparkSession, root: String): Seq[(String, Long)] = {
    val (f, p) = fs(spark, root)
    dataSegments(spark, root)
      .map(s => s -> f.getContentSummary(new Path(p, s)).getLength)
  }

  /** Bin-packing small-file compaction: fold ONLY the data segments
    * smaller than `smallBytes` into one packed segment, leaving every
    * larger segment (and all tombstones) untouched — byte-identical,
    * spec-pinned. This is the maintenance action a 100 TB log actually
    * runs: streaming ingest accretes thousands of small segments whose
    * per-open cost taxes readers, but rewriting the big ones (the bulk
    * of the bytes) to fix that would be [[compact]]'s full-table
    * price. IO here is O(small segments only). Tombstones are NOT
    * applied (the packed rows keep anti-joining against them, exactly
    * as before — [[compact]] remains the action that retires deletes).
    * Zone-map sidecars are regenerated for the packed segment over the
    * union of stat columns its inputs carried, so data skipping
    * survives packing. Returns the number of segments folded (0 =
    * fewer than two small segments, nothing rewritten, no new manifest
    * version). */
  def optimize(spark: SparkSession, root: String, smallBytes: Long,
      partitionBy: Seq[String] = Nil): Int = {
    val (f, p) = fs(spark, root)
    val v = currentVersion(f, p).getOrElse(
      throw new IllegalStateException(s"optimize of uncommitted table $root"))
    val all = readManifest(f, p, v)
    val small = all.filterNot(_.startsWith(DelPrefix))
      .filter(s => f.getContentSummary(new Path(p, s)).getLength < smallBytes)
    if (small.size < 2) return 0
    val statCols = small
      .flatMap(s => segmentStats(spark, root, s).toSeq.flatMap(_.cols.keys))
      .distinct
    val bCols = small.flatMap(s => bloomColsOf(f, new Path(p, s))).distinct
    val seg = s"seg-${v + 1}-opt-${java.util.UUID.randomUUID().toString.take(8)}"
    // flat + stats-bearing: the min/max/count ride the fold's write scan
    val (frame, obs) =
      if (statCols.nonEmpty && partitionBy.isEmpty)
        observedStats(readSegs(spark, root, small), statCols)
      else (readSegs(spark, root, small), None)
    writeSeg(frame, s"$root/$seg", partitionBy)
    val statsJson =
      if (statCols.isEmpty) None
      else obs match {
        case Some((o, typed)) =>
          Some(publishObservedStats(f, s"$root/$seg", o, typed))
        case None => Some(writeStats(spark, f, s"$root/$seg", statCols))
      }
    if (bCols.nonEmpty) writeBlooms(spark, f, s"$root/$seg", bCols)
    val meta = buildMeta(spark, f, root, seg, statsJson, bCols)
    val smallSet = small.toSet
    commit(f, p, v + 1, all.filterNot(smallSet) :+ seg, Seq(RewriteMark),
      metas = (priorMetas(f, p, v) -- smallSet) + (seg -> meta))
    gc(f, p)
    small.size
  }

  /** Sort-based RE-CLUSTERING: rewrite the table as `nSegments`
    * range-disjoint segments ordered by `byCol`, each with a
    * regenerated zone-map sidecar. Streaming ingest commits segments
    * in ARRIVAL order, so every segment spans the whole key range and
    * zone maps prune nothing; clustering restores the sorted layout
    * that makes [[readRange]] open O(range) segments — the standard
    * lakehouse maintenance pair (bin-pack for write debt, cluster for
    * read locality). One shuffle (range repartition by `byCol`, skew
    * handled by Spark's range sampling) + one write pass; tombstones
    * are applied physically (this is a full rewrite, [[compact]]'s
    * sibling — run it at the cadence a 100 TB deployment can afford,
    * per partition of the log in practice). `statsCols` defaults to
    * `byCol` alone. */
  def cluster(spark: SparkSession, root: String, byCol: String,
      nSegments: Int, statsCols: Seq[String] = Nil): Unit = {
    require(nSegments >= 1, s"nSegments must be >= 1, got $nSegments")
    val (f, p) = fs(spark, root)
    val v = currentVersion(f, p).getOrElse(
      throw new IllegalStateException(s"cluster of uncommitted table $root"))
    val snap = readMerged(spark, root).localCheckpoint()
    try {
      // One ranged shuffle, one write: partition dirs _seg=K of a tmp
      // hive write become the new segment dirs by driver-side rename
      // (the alternative — one filtered write per segment — would
      // re-scan the table nSegments times).
      val tmp = s".cluster-tmp-${java.util.UUID.randomUUID().toString.take(8)}"
      snap.repartitionByRange(nSegments, col(byCol))
        .withColumn("_seg", org.apache.spark.sql.functions.spark_partition_id())
        .write.partitionBy("_seg").parquet(s"$root/$tmp")
      val subdirs = f.listStatus(new Path(p, tmp))
        .filter(_.isDirectory).map(_.getPath)
        .sortBy(d => d.getName.stripPrefix("_seg=").toInt)
      val stats = if (statsCols.nonEmpty) statsCols else Seq(byCol)
      val segNames = subdirs.zipWithIndex.map { case (d, i) =>
        val seg = s"seg-${v + 1}-clu$i-${java.util.UUID.randomUUID().toString.take(8)}"
        require(f.rename(d, new Path(p, seg)),
          s"failed to place clustered segment $seg")
        seg
      }.toSeq
      // ONE grouped stats job + embedded meta for ALL segments (the
      // per-segment writeStats loop scheduled nSegments scan jobs and
      // dominated the wall clock; schema is the write frame's — the
      // _seg split column never reached the data files)
      val metas = sidecarsBatched(spark, root,
        segNames.map(s => (s, stats, Seq.empty[String])),
        StructType(snap.schema.map(_.copy(nullable = true))))
      // full rewrite through the post-drop projection (readMerged):
      // dropped-column tombstones retire with the physical bytes
      commit(f, p, v + 1, segNames, Seq(RewriteMark), metas = metas,
        clearDrops = true)
      f.delete(new Path(p, tmp), true) // our own (now-empty) shell
      gc(f, p) // retires the old segments and tombstones
    } finally graft.core.Lineage.release(snap)
  }

  /** Multi-column Z-ORDER clustering: [[cluster]] with the
    * z-interleave of (`colA`, `colB`) as the layout key ([[graft
    * .functions.zInterleave2]]; Delta/Iceberg's OPTIMIZE ZORDER BY),
    * so each segment covers a rectangle-ish region of the composite
    * key space and the per-segment zone maps — written for BOTH
    * columns — prune range reads on EITHER one. A single-column
    * [[cluster]] only ever helps its own key; this is the layout for
    * two independent access paths on the same 100 TB log. Same cost
    * shape as cluster: one ranged shuffle + one write pass; tombstones
    * applied physically; rewrite-marked for the change feed. */
  def clusterZ(spark: SparkSession, root: String, colA: String, colB: String,
      nSegments: Int, bits: Int = 16): Unit = {
    require(nSegments >= 1, s"nSegments must be >= 1, got $nSegments")
    val (f, p) = fs(spark, root)
    val v = currentVersion(f, p).getOrElse(
      throw new IllegalStateException(s"clusterZ of uncommitted table $root"))
    val snap = readMerged(spark, root).localCheckpoint()
    try {
      require(!snap.columns.contains("__z"),
        "clusterZ uses a reserved working column __z already present in the input")
      val tmp = s".cluster-tmp-${java.util.UUID.randomUUID().toString.take(8)}"
      snap.withColumn("__z",
          graft.functions.zInterleave2(col(colA), col(colB), bits))
        .repartitionByRange(nSegments, col("__z"))
        .withColumn("_seg", org.apache.spark.sql.functions.spark_partition_id())
        .drop("__z")
        .write.partitionBy("_seg").parquet(s"$root/$tmp")
      val subdirs = f.listStatus(new Path(p, tmp))
        .filter(_.isDirectory).map(_.getPath)
        .sortBy(d => d.getName.stripPrefix("_seg=").toInt)
      val segNames = subdirs.zipWithIndex.map { case (d, i) =>
        val seg = s"seg-${v + 1}-clz$i-${java.util.UUID.randomUUID().toString.take(8)}"
        require(f.rename(d, new Path(p, seg)),
          s"failed to place z-clustered segment $seg")
        seg
      }.toSeq
      // one grouped stats job for all segments (see cluster)
      val metas = sidecarsBatched(spark, root,
        segNames.map(s => (s, Seq(colA, colB), Seq.empty[String])),
        StructType(snap.schema.map(_.copy(nullable = true))))
      // full rewrite through the projection: drop tombstones retire
      commit(f, p, v + 1, segNames, Seq(RewriteMark), metas = metas,
        clearDrops = true)
      f.delete(new Path(p, tmp), true) // our own (now-empty) shell
      gc(f, p)
    } finally graft.core.Lineage.release(snap)
  }

  /** INCREMENTAL clustering: [[cluster]] scoped to the segments whose
    * zone maps intersect `[lo, hi]` on `byCol` — the nightly job a
    * 100 TB log actually runs ("cluster yesterday's arrivals"), paying
    * only for the segments the range touches while everything else
    * stays byte-identical. Touched segments are rewritten WHOLE (they
    * may hold rows outside the range — zone maps are segment-granular
    * — and those rows simply travel into the new layout), tombstones
    * are NOT applied (unlike the full [[cluster]]: untouched segments
    * may still hold matching rows, so retirement stays [[compact]]/
    * [[cluster]]'s job), and the commit carries the rewrite mark so
    * caught-up change-feed consumers walk through it. Stats-less
    * segments are conservatively "intersecting" and get clustered
    * (and thereby gain sidecars). Returns the number of segments
    * folded (0 = fewer than two intersect; nothing rewritten). */
  def clusterRange(spark: SparkSession, root: String, byCol: String,
      lo: Option[Any], hi: Option[Any], nSegments: Int,
      statsCols: Seq[String] = Nil): Int = {
    require(nSegments >= 1, s"nSegments must be >= 1, got $nSegments")
    val (f, p) = fs(spark, root)
    val v = currentVersion(f, p).getOrElse(
      throw new IllegalStateException(s"clusterRange of uncommitted table $root"))
    val all = readManifest(f, p, v)
    // this is a PARTIAL rewrite: it reads raw physical frames and
    // writes them back (mapping carried forward untouched), so the
    // caller's LOGICAL column names translate to physical here
    val mapping = columnMappingAt(spark, root, v)
    val byPhys = physicalNameOf(spark, mapping, byCol)
    val touched = prunedDataSegments(spark, root, byPhys, lo, hi)
    if (touched.size < 2) return 0
    val tmp = s".cluster-tmp-${java.util.UUID.randomUUID().toString.take(8)}"
    val frame = readSegs(spark, root, touched)
    frame
      .repartitionByRange(nSegments, col(byPhys))
      .withColumn("_seg", org.apache.spark.sql.functions.spark_partition_id())
      .write.partitionBy("_seg").parquet(s"$root/$tmp")
    val subdirs = f.listStatus(new Path(p, tmp))
      .filter(_.isDirectory).map(_.getPath)
      .sortBy(d => d.getName.stripPrefix("_seg=").toInt)
    val stats = (if (statsCols.nonEmpty) statsCols else Seq(byCol))
      .map(physicalNameOf(spark, mapping, _))
    val segNames = subdirs.zipWithIndex.map { case (d, i) =>
      val seg = s"seg-${v + 1}-clr$i-${java.util.UUID.randomUUID().toString.take(8)}"
      require(f.rename(d, new Path(p, seg)),
        s"failed to place clustered segment $seg")
      seg
    }.toSeq
    // one grouped stats job for all segments (see cluster)
    val newMetas = sidecarsBatched(spark, root,
      segNames.map(s => (s, stats, Seq.empty[String])),
      StructType(frame.schema.map(_.copy(nullable = true))))
    val touchedSet = touched.toSet
    commit(f, p, v + 1, all.filterNot(touchedSet) ++ segNames,
      Seq(RewriteMark),
      metas = (priorMetas(f, p, v) -- touchedSet) ++ newMetas)
    f.delete(new Path(p, tmp), true) // our own (now-empty) shell
    gc(f, p)
    touched.size
  }

  /** Exact row count from zone-map sidecars alone — zero data IO, a
    * driver-side metadata sum. Available (Some) only when every data
    * segment carries a sidecar and no tombstones are outstanding
    * (tombstone matches can't be counted without reading); callers
    * fall back to `read(root).count()` on None. The metadata-only
    * count a 100 TB log answers in milliseconds. */
  def fastRowCount(spark: SparkSession, root: String): Option[Long] = {
    if (deleteSegments(spark, root).nonEmpty) None
    else {
      val st = dataSegments(spark, root).map(s => segmentStats(spark, root, s))
      if (st.isEmpty || st.exists(_.isEmpty)) None
      else Some(st.flatten.map(_.rows).sum)
    }
  }

  // ------------------------------------------------------------------
  // Segment statistics (zone maps) + data-skipping reads.
  //
  // Each stats-enabled segment carries a `_stats.graft.json` sidecar:
  //   {"rows":N,"cols":{"c":{"t":"n|ts|d|s","min":"…","max":"…"}}}
  // min/max are canonical sortable keys — numerics as their decimal
  // string, timestamps as epoch MICROS, dates as epoch DAYS, strings
  // raw. A range read resolves the manifest, opens only the sidecars
  // (a few hundred bytes per segment, driver-side), and hands Spark
  // just the segments whose [min,max] intersects the predicate — the
  // segment-granularity analogue of parquet row-group zone maps, and
  // the reason a time-keyed 100 TB append log answers a point-in-time
  // query by reading one segment instead of all of them. Conservative
  // by construction: a segment without a sidecar (or without stats for
  // the queried column) is always read.
  // ------------------------------------------------------------------

  private val StatsFile = "_stats.graft.json"

  /** Full JSON string escaping — backslash, quote, AND control
    * characters. A string column whose min/max carries a newline or
    * tab must not produce an invalid sidecar: sidecars gate the whole
    * read path, so "weird value" must degrade to "slightly bigger
    * sidecar", never to "every readRange throws". */
  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"'  => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }
  private def jsonString(s: String): String = "\"" + jsonEscape(s) + "\""

  /** Per-column segment statistic: type tag + canonical min/max keys
    * (None = every value in the segment is NULL for that column). */
  final case class ColStat(t: String, min: Option[String], max: Option[String])
  final case class SegStats(rows: Long, cols: Map[String, ColStat])

  private def statType(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | _: DecimalType => Some("n")
    case TimestampType => Some("ts")
    case DateType => Some("d")
    case StringType => Some("s")
    case _ => None
  }

  /** One aggregate pass over the just-committed segment bytes (column-
    * pruned to `cols`), then a tiny JSON write. O(segment) once, at
    * write time — never again on the read path. Returns the sidecar
    * JSON so commit-time callers can embed the same stats in the
    * manifest line ([[buildMeta]]) without re-reading it. */
  /** [[writeStats]]' aggregates attached to the WRITE pass via
    * [[org.apache.spark.sql.Observation]]: a stats-bearing append
    * costs ONE scan of the batch (the segment write), not write +
    * read-back — at ingest scale that halves per-commit data IO.
    * Restricted to FLAT segments: a hive-partitioned read-back can
    * re-type partition columns via directory inference, so that path
    * keeps the read-back ([[writeStats]]). Returns the frame to write
    * (observation attached) plus the observation + typed column list
    * to resolve AFTER the write action completes. */
  private def observedStats(df: DataFrame, cols: Seq[String])
      : (DataFrame,
         Option[(org.apache.spark.sql.Observation, Seq[(String, String)])]) = {
    val typed = cols.flatMap(c => statType(df.schema(c).dataType).map((c, _)))
    if (cols.isEmpty) (df, None)
    else {
      val o = org.apache.spark.sql.Observation()
      val aggs = count(lit(1)).as("rows") +:
        typed.zipWithIndex.flatMap { case ((c, t), i) =>
          val key = t match {
            case "ts" => unix_micros(col(c))
            case "d"  => datediff(col(c), lit("1970-01-01"))
            case _    => col(c)
          }
          Seq(min(key).cast("string").as(s"mn$i"),
            max(key).cast("string").as(s"mx$i"))
        }
      (df.observe(o, aggs.head, aggs.tail: _*), Some((o, typed)))
    }
  }

  /** Publish the observed stats as the segment's sidecar — same JSON
    * as [[writeStats]], zero extra jobs. Call only after the write
    * action completed (Observation.get blocks on it). */
  private def publishObservedStats(f: FileSystem, segDir: String,
      o: org.apache.spark.sql.Observation,
      typed: Seq[(String, String)]): String = {
    val m = o.get
    val colsJson = typed.zipWithIndex.map { case ((c, t), i) =>
      def v(k: String): String =
        m.get(k).flatMap(Option(_)).map(x => jsonString(x.toString))
          .getOrElse("null")
      s""""${jsonEscape(c)}":{"t":"$t","min":${v(s"mn$i")},"max":${v(s"mx$i")}}"""
    }.mkString(",")
    val json = s"""{"rows":${m("rows")},"cols":{$colsJson}}"""
    commitStrategy.publish(f, new Path(segDir), new Path(segDir, StatsFile), json)
    json
  }

  private[io] def writeStats(spark: SparkSession, f: FileSystem,
      segDir: String, cols: Seq[String]): String = {
    val df = spark.read.parquet(segDir)
    val typed = cols.flatMap(c => statType(df.schema(c).dataType).map((c, _)))
    val aggs = typed.flatMap { case (c, t) =>
      val key = t match {
        case "ts" => unix_micros(col(c))
        case "d"  => datediff(col(c), lit("1970-01-01"))
        case _    => col(c)
      }
      Seq(min(key).cast("string"), max(key).cast("string"))
    }
    val row = df.agg(count(lit(1)).as("rows"), aggs: _*).head()
    val colsJson = typed.zipWithIndex.map { case ((c, t), i) =>
      def v(off: Int): String = Option(row.getString(1 + 2 * i + off))
        .map(jsonString).getOrElse("null")
      s""""${jsonEscape(c)}":{"t":"$t","min":${v(0)},"max":${v(1)}}"""
    }.mkString(",")
    val json = s"""{"rows":${row.getLong(0)},"cols":{$colsJson}}"""
    commitStrategy.publish(f, new Path(segDir), new Path(segDir, StatsFile), json)
    json
  }

  /** Batched sidecar + embedded-metadata regeneration for a set of
    * just-written FLAT segments (the broad-DML swap path): instead of
    * one stats job + one count job + one Bloom job + one footer-read
    * per segment — O(touched) tiny driver-scheduled jobs, the
    * scale-killer of a wide rewrite — this runs ONE grouped aggregate
    * over all segments (count + zone-map min/max, grouped by the
    * `input_file_name()`-derived segment tag), at most one
    * `treeAggregate` per Bloom column (per-segment filters built and
    * merged distributively), and embeds the caller-known write schema
    * (nullable-widened, what a footer read-back reports) — zero
    * per-segment footer inference. Each segment's sidecar files carry
    * exactly ITS requested column set; the returned map is the
    * manifest-embedded JSON per segment. */
  private[io] def sidecarsBatched(spark: SparkSession, root: String,
      segCols: Seq[(String, Seq[String], Seq[String])],
      schema: StructType): Map[String, String] = {
    val (f, p) = fs(spark, root)
    val dirs = segCols.map(x => s"$root/${x._1}")
    // flat segment => the file's PARENT dir is the segment name (no
    // dependence on how the reader qualifies the root prefix)
    val segName = org.apache.spark.sql.functions.element_at(
      org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.input_file_name(), "/"), -2)
    val df0 = spark.read.schema(schema).parquet(dirs: _*)

    // ---- one grouped agg: counts + min/max over the stat-col UNION ----
    val statUnion = segCols.flatMap(_._2).distinct
    val typed = statUnion.flatMap(c => statType(schema(c).dataType).map((c, _)))
    val aggs = typed.flatMap { case (c, t) =>
      val key = t match {
        case "ts" => unix_micros(col(c))
        case "d"  => datediff(col(c), lit("1970-01-01"))
        case _    => col(c)
      }
      Seq(min(key).cast("string"), max(key).cast("string"))
    }
    val needBlooms = segCols.exists(_._3.nonEmpty)
    val grouped: Map[String, org.apache.spark.sql.Row] =
      if (statUnion.isEmpty && !needBlooms) Map.empty
      else df0.groupBy(segName.as("_seg"))
        .agg(count(lit(1)).as("rows"), aggs: _*)
        .collect().map(r => r.getString(0) -> r).toMap
    val colIdx = typed.zipWithIndex.toMap
    def statsJsonFor(seg: String, cols: Seq[String]): Option[String] =
      if (cols.isEmpty) None
      else {
        val row = grouped.get(seg)
        val myTyped = typed.filter { case (c, _) => cols.contains(c) }
        val colsJson = myTyped.map { case (c, t) =>
          val i = colIdx((c, t))
          def v(off: Int): String = row.flatMap(r =>
            Option(r.getString(2 + 2 * i + off)))
            .map(jsonString).getOrElse("null")
          s""""${jsonEscape(c)}":{"t":"$t","min":${v(0)},"max":${v(1)}}"""
        }.mkString(",")
        Some(s"""{"rows":${row.map(_.getLong(1)).getOrElse(0L)},"cols":{$colsJson}}""")
      }

    // ---- one treeAggregate per Bloom column ----
    val bloomUnion = segCols.flatMap(_._3).distinct
    bloomUnion.foreach(c => require(bloomable(schema(c).dataType),
      s"bloom sidecars support integral/string columns; '$c' is " +
        s"${schema(c).dataType.simpleString}"))
    bloomUnion.foreach { c =>
      val segsFor = segCols.filter(_._3.contains(c)).map(_._1).toSet
      val est = segCols.map(x =>
        x._1 -> math.max(grouped.get(x._1).map(_.getLong(1)).getOrElse(0L), 1L))
        .toMap
      val pairs = df0
        .select(segName.as("_seg"), col(c).as("_v"))
        .where(col("_v").isNotNull)
        .rdd.map(r => (r.getString(0), r.get(1)))
      import org.apache.spark.util.sketch.BloomFilter
      def put(b: BloomFilter, v: Any): Unit = v match {
        case x: Byte => b.putLong(x.toLong)
        case x: Short => b.putLong(x.toLong)
        case x: Int => b.putLong(x.toLong)
        case x: Long => b.putLong(x)
        case s: String => b.putString(s)
        case other => throw new IllegalStateException(
          s"unbloomable value class ${other.getClass}")
      }
      val built = pairs.treeAggregate(
        scala.collection.mutable.Map.empty[String, BloomFilter])(
        (m, kv) => {
          if (segsFor(kv._1)) {
            put(m.getOrElseUpdate(kv._1,
              BloomFilter.create(est.getOrElse(kv._1, 1L), 1e-6)), kv._2)
          }
          m
        },
        (a, b) => {
          b.foreach { case (s, bf) =>
            a.get(s) match {
              case Some(acc) => acc.mergeInPlace(bf)
              case None => a.update(s, bf)
            }
          }
          a
        })
      segsFor.foreach { seg =>
        val bf = built.getOrElse(seg, BloomFilter.create(1L, 1e-6))
        val out = f.create(new Path(s"$root/$seg", bloomFile(c)), true)
        try bf.writeTo(out) finally out.close()
      }
    }

    // ---- per-segment sidecar publish + embedded meta (no footer IO) ----
    val schemaJson = schema.json
    segCols.map { case (seg, statCols, bCols) =>
      val statsJson = statsJsonFor(seg, statCols)
      statsJson.foreach(json => commitStrategy.publish(
        f, new Path(s"$root/$seg"), new Path(s"$root/$seg", StatsFile), json))
      val files = listDataFilesRec(f, new Path(p, seg), "")
      val filesJson = files.map { case (pp, l) =>
        s"""{"p":${jsonString(pp)},"l":$l}"""
      }.mkString(",")
      val bloomsJson = bCols.map(jsonString).mkString(",")
      seg -> (s"""{"files":[$filesJson],"schema":$schemaJson,""" +
        s""""stats":${statsJson.getOrElse("null")},"blooms":[$bloomsJson]}""")
    }.toMap
  }

  /** Parse a segment's stats sidecar, if it has one. A malformed or
    * unreadable sidecar (partial write, store corruption, a writer
    * from before an escaping fix) degrades to None — the CONSERVATIVE
    * answer: the segment is always read, [[fastRowCount]] returns
    * None, nothing throws. One bad sidecar must never wedge
    * [[readRange]]/[[optimize]] for the whole table. */
  /** Decode the stats JSON shape (shared by the sidecar file and the
    * manifest-embedded copy). */
  private def statsFromJValue(j: org.json4s.JValue): SegStats = {
    import org.json4s._
    val rows = (j \ "rows") match { case JInt(n) => n.toLong; case _ => 0L }
    val cols = (j \ "cols") match {
      case JObject(fields) => fields.map { case (name, cs) =>
        def str(k: String): Option[String] =
          (cs \ k) match { case JString(s) => Some(s); case _ => None }
        name -> ColStat(str("t").getOrElse("s"), str("min"), str("max"))
      }.toMap
      case _ => Map.empty[String, ColStat]
    }
    SegStats(rows, cols)
  }

  def segmentStats(spark: SparkSession, root: String, seg: String): Option[SegStats] = {
    val (f, _) = fs(spark, root)
    val p = new Path(s"$root/$seg", StatsFile)
    if (!f.exists(p)) None
    else scala.util.Try {
      import org.json4s.jackson.JsonMethods
      val in = f.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      statsFromJValue(JsonMethods.parse(txt))
    }.toOption
  }

  /** Canonical comparison key for a caller-supplied bound, matched to
    * the stored stat's type tag. */
  private def boundKey(t: String, v: Any): Any = (t, v) match {
    case ("s", x) => x.toString
    case ("ts", ts: java.sql.Timestamp) =>
      BigDecimal(ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L)
    case ("ts", i: java.time.Instant) =>
      BigDecimal(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case ("ts", s: String) => boundKey("ts", java.sql.Timestamp.valueOf(s))
    case ("d", d: java.sql.Date) => BigDecimal(d.toLocalDate.toEpochDay)
    case ("d", d: java.time.LocalDate) => BigDecimal(d.toEpochDay)
    case ("d", s: String) => BigDecimal(java.time.LocalDate.parse(s).toEpochDay)
    case (_, x) => BigDecimal(x.toString)
  }

  /** String bound comparison by CODE POINT (via UTF-8 bytes), not
    * Java's UTF-16 code-unit `compareTo`: the stored min/max come from
    * Spark's min/max, whose string ordering is binary (code-point).
    * The two orders disagree for supplementary-plane characters vs
    * U+E000–U+FFFF, and a wrong order here wrongly PRUNES a segment
    * that intersects the range — a silent row drop, not a slow read. */
  private def utf8Leq(x: String, y: String): Boolean = {
    val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    a.length <= b.length
  }

  private def leq(t: String, a: Any, b: Any): Boolean = (a, b) match {
    case (x: String, y: String) if t == "s" => utf8Leq(x, y)
    case (x: BigDecimal, y: BigDecimal) => x <= y
    case _ => true // type confusion -> conservative: don't prune
  }

  private def statKey(t: String, s: String): Any =
    if (t == "s") s else scala.util.Try(BigDecimal(s)).getOrElse(s)

  /** Can a segment with sidecar `stats` hold rows satisfying
    * `lo <= colName <= hi`? Conservative: missing/unusable stats →
    * true (always read); a stats-bearing segment whose column is
    * entirely NULL → false (a range predicate matches no NULLs).
    * Shared by [[prunedDataSegments]] and the SQL-face
    * [[graft.sources.ManifestSource]] file index. */
  private[graft] def statsAdmit(stats: Option[SegStats], colName: String,
      lo: Option[Any], hi: Option[Any]): Boolean =
    stats.flatMap(_.cols.get(colName)) match {
      case None => true
      case Some(ColStat(_, None, None)) => false
      case Some(ColStat(t, mn, mx)) =>
        val aboveLo = (lo, mx) match {
          case (Some(l), Some(m)) => leq(t, boundKey(t, l), statKey(t, m))
          case _ => true
        }
        val belowHi = (hi, mn) match {
          case (Some(h), Some(m)) => leq(t, statKey(t, m), boundKey(t, h))
          case _ => true
        }
        aboveLo && belowHi
    }

  /** The data segments a `lo <= colName <= hi` read must open: every
    * segment whose stats intersect the range, plus every segment
    * without usable stats (conservative). A stats-bearing segment
    * whose column is entirely NULL is pruned — a range predicate
    * matches no NULLs. Open bounds via None. */
  def prunedDataSegments(spark: SparkSession, root: String, colName: String,
      lo: Option[Any], hi: Option[Any]): Seq[String] =
    dataSegments(spark, root).filter { seg =>
      statsAdmit(segmentStats(spark, root, seg), colName, lo, hi)
    }

  /** Data-skipping range read: resolve the manifest, keep only
    * segments whose zone map intersects `[lo, hi]`, and apply the
    * residual predicate (zone maps are segment-granular — kept
    * segments can still hold out-of-range rows). Equivalent to
    * `read(...).filter(between)` by construction; the difference is
    * IO — segments outside the range are never opened. */
  def readRange(spark: SparkSession, root: String, colName: String,
      lo: Option[Any], hi: Option[Any]): DataFrame = {
    // the dropped-column projection applies here exactly as in read/
    // readMerged — and a range probe ON a dropped column is loud, the
    // same unresolved-column failure `read(...).filter` would give.
    // The probe column arrives LOGICAL; zone-map sidecars and the raw
    // segment frames are keyed PHYSICAL, so translate first.
    val actions @ (dropped, mapping) = schemaActions(spark, root)
    val eq = spark.sessionState.conf.resolver
    val phys = physicalNameOf(spark, mapping, colName)
    require(!dropped.exists(eq(_, phys)),
      s"column $colName was DROPped from $root; range reads cannot " +
        "probe a dropped column")
    val keep = prunedDataSegments(spark, root, phys, lo, hi)
    val base =
      if (keep.nonEmpty) readSegs(spark, root, keep)
      else read(spark, root).filter(lit(false)) // schema-only; empty plan
    // the empty-plan fallback is already logical (read applies the
    // projection), so filter/relabel per branch
    if (keep.isEmpty) base
    else {
      val c = col(phys)
      val pred = (lo.map(c >= lit(_)) ++ hi.map(c <= lit(_)))
        .reduceOption(_ && _).getOrElse(lit(true))
      applySchemaActions(base.filter(pred), actions)
    }
  }

  // ------------------------------------------------------------------
  // Bloom sidecars + point-lookup data skipping.
  //
  // Zone maps prune RANGE reads, but they are useless for point
  // lookups on an arrival-ordered log: every segment's [min, max]
  // spans most of an id-like key's domain, so `WHERE id = k` opens
  // everything. A per-segment Bloom sidecar (`_bloom.<col>.graft`,
  // Spark's deterministic Murmur3 BloomFilter sketch, fpp 1e-6 ≈
  // 29 bits/key) answers "might this segment hold k?" from a few
  // hundred KB of driver-side metadata — the point-lookup analogue of
  // the zone maps, and the mechanism Delta/Iceberg ship as Bloom
  // filter indexes. Conservative by construction: a segment without a
  // sidecar for the column is always read; a false positive costs one
  // extra segment scan, never a wrong answer (the residual equality
  // filter always runs).
  // ------------------------------------------------------------------

  private def bloomFile(colName: String) = s"_bloom.$colName.graft"

  /** Columns a segment carries Bloom sidecars for (file-name scan —
    * how [[optimize]] knows what to regenerate on the packed output). */
  private[io] def bloomColsOf(f: FileSystem, segDir: Path): Seq[String] =
    if (!f.exists(segDir)) Seq.empty
    else f.listStatus(segDir).iterator.map(_.getPath.getName)
      .filter(n => n.startsWith("_bloom.") && n.endsWith(".graft"))
      .map(_.stripPrefix("_bloom.").stripSuffix(".graft"))
      .toSeq

  /** Column types a Bloom sidecar supports (what Spark's BloomFilter
    * hashes): integral + string. Callers naming other types fail
    * loudly at write time rather than silently skipping. */
  private def bloomable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _ => false
  }

  private[io] def writeBlooms(spark: SparkSession, f: FileSystem,
      segDir: String, cols: Seq[String]): Unit = {
    val df = spark.read.parquet(segDir)
    cols.foreach { c =>
      require(bloomable(df.schema(c).dataType),
        s"bloom sidecars support integral/string columns; '$c' is " +
          s"${df.schema(c).dataType.simpleString}")
    }
    val n = math.max(df.count(), 1L)
    cols.foreach { c =>
      val bf = df.stat.bloomFilter(c, n, 1e-6)
      val out = f.create(new Path(segDir, bloomFile(c)), true)
      try bf.writeTo(out) finally out.close()
    }
  }

  /** Load a segment's Bloom sidecar for `colName`, if present and
    * readable (malformed → None = conservative always-read, the
    * [[segmentStats]] contract). */
  def segmentBloom(spark: SparkSession, root: String, seg: String,
      colName: String): Option[org.apache.spark.util.sketch.BloomFilter] = {
    val (f, _) = fs(spark, root)
    val p = new Path(s"$root/$seg", bloomFile(colName))
    if (!f.exists(p)) None
    else scala.util.Try {
      val in = f.open(p)
      try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
      finally in.close()
    }.toOption
  }

  /** Might a segment with this sidecar hold `value`? None → yes
    * (conservative). Integral values hash as longs (how the filter
    * was built); other types are admitted unconditionally. */
  private[graft] def bloomAdmit(
      bloom: Option[org.apache.spark.util.sketch.BloomFilter],
      value: Any): Boolean = bloom match {
    case None => true
    case Some(b) => value match {
      case x: Byte => b.mightContainLong(x.toLong)
      case x: Short => b.mightContainLong(x.toLong)
      case x: Int => b.mightContainLong(x.toLong)
      case x: Long => b.mightContainLong(x)
      case s: String => b.mightContainString(s)
      case _ => true
    }
  }

  /** The data segments a `colName = value` read must open: every
    * segment whose Bloom sidecar admits the value (or has none). */
  def pointSegments(spark: SparkSession, root: String, colName: String,
      value: Any): Seq[String] =
    dataSegments(spark, root).filter { seg =>
      bloomAdmit(segmentBloom(spark, root, seg, colName), value)
    }

  /** Bloom-pruned point lookup: equivalent to `read(...).filter(col =
    * value)` by construction; segments whose sidecar excludes the key
    * are never opened — `WHERE id = k` on a 100 TB arrival-ordered
    * log reads O(segments holding k), not O(table). */
  def readPoint(spark: SparkSession, root: String, colName: String,
      value: Any): DataFrame = {
    // same dropped-column contract as readRange: loud probe, projected
    // result; Bloom sidecars and raw frames are keyed PHYSICAL
    val actions @ (dropped, mapping) = schemaActions(spark, root)
    val eq = spark.sessionState.conf.resolver
    val phys = physicalNameOf(spark, mapping, colName)
    require(!dropped.exists(eq(_, phys)),
      s"column $colName was DROPped from $root; point reads cannot " +
        "probe a dropped column")
    val keep = pointSegments(spark, root, phys, value)
    val base =
      if (keep.nonEmpty) readSegs(spark, root, keep)
      else read(spark, root).filter(lit(false)) // schema-only; empty plan
    if (keep.isEmpty) base.filter(col(colName) === lit(value))
    else applySchemaActions(base.filter(col(phys) === lit(value)), actions)
  }
}
