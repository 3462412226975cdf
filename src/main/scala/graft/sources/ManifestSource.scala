package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation,
  PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider,
  DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.io.ManifestTable

/** The SQL face of the [[graft.io.ManifestTable]] log: a registered
  * Spark data source, so the manifest family is first-class to the
  * engine's own `execute` surface (the reference's entire interface
  * is SQL passthrough — `locopy/database.py:131-190`):
  *
  * {{{
  *   spark.read.format("graft.manifest").load(root)            // head
  *   spark.read.format("graft.manifest")
  *     .option("version", 3).load(root)                        // time travel
  *   spark.sql(s"SELECT … FROM `graft.manifest`.`$root`")      // pure SQL
  * }}}
  *
  * Architecture: NOT a bespoke reader — the relation is a plain
  * `HadoopFsRelation` over the stock parquet `FileFormat`, so column
  * pruning, parquet filter pushdown (`PushedFilters`), vectorized
  * decode and whole-stage codegen are all inherited unchanged. What
  * the manifest adds is the [[ManifestFileIndex]]: the file listing
  * resolves the COMMITTED segment list (never a directory glob — an
  * orphan from a crashed append is invisible here exactly as in the
  * API reads), pinned at relation-build time (a query plans against
  * one manifest version even while ingest keeps committing — snapshot
  * isolation for free), and prunes whole segments through the
  * `_stats.graft.json` zone maps when the query's `WHERE` carries
  * range predicates on stat-covered columns. Data skipping therefore
  * happens at BOTH granularities: segments here, row groups in
  * parquet below — the two-layer structure every lakehouse reader
  * ships.
  *
  * Contract edges, all loud:
  *  - outstanding merge-on-read tombstones fail the build (a plain
  *    file scan cannot apply the anti-join; `compact()` first, read
  *    through `readMerged`, or pass `allowTombstones=true` to read
  *    raw data segments knowingly);
  *  - hive-partitioned segments (written with `partitionBy`, e.g. the
  *    ANN index's `cell=` layout) are first-class: the partition
  *    column surfaces in the schema and pushed partition predicates
  *    prune `col=value` dirs inside every surviving segment — but the
  *    layout must be consistent (all flat, or all single-level on one
  *    column; anything else fails the build rather than dropping
  *    dirs);
  *  - additive schema evolution is supported: the relation's schema is
  *    the merged footer schema and parquet reads NULL-fill columns a
  *    segment predates.
  */
class ManifestSource extends RelationProvider with CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft.manifest"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.get("path").orElse(parameters.get("root")).getOrElse(
      throw new IllegalArgumentException(
        "graft.manifest needs a table root: .load(root) or .option(\"path\", root)"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val version = parameters.get("version").map(_.toLong)
    val allowTombstones =
      parameters.get("allowtombstones").orElse(parameters.get("allowTombstones"))
        .exists(_.equalsIgnoreCase("true"))
    ManifestSource.relation(spark, root, version, allowTombstones)
  }

  /** Write path — `df.write.format("graft.manifest")` with the
    * standard SaveMode semantics mapped onto the log's commit verbs:
    * Append = one [[ManifestTable.append]]ed segment (atomic manifest
    * commit, O(df) IO); Overwrite = [[ManifestTable.replace]] (a new
    * single-segment version, history retained per [[ManifestTable
    * .retainVersions]]); ErrorIfExists/Ignore follow their contracts
    * against manifest existence. Options: `statsCols` (comma list)
    * collects zone-map sidecars for the new segment, `bloomCols` its
    * point-lookup Bloom sidecars; `tag` rides in the segment name
    * (the at-least-once replay guard). Partitioned
    * (hive-layout) segments stay on the typed API — this surface
    * writes flat segments, matching what the SQL read path scans. */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    def colsOpt(k: String) = parameters.get(k.toLowerCase).orElse(parameters.get(k))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
    val statsCols = colsOpt("statsCols")
    val bloomCols = colsOpt("bloomCols")
    val tag = parameters.get("tag")
    val exists = ManifestTable.exists(spark, root)
    mode match {
      case SaveMode.Append =>
        ManifestTable.append(spark, root, data, statsCols = statsCols,
          bloomCols = bloomCols, tag = tag)
      case SaveMode.Overwrite =>
        ManifestTable.replace(spark, root, data, tag = tag,
          statsCols = statsCols, bloomCols = bloomCols)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"manifest table $root already exists (SaveMode.ErrorIfExists); " +
            "use mode(\"append\") or mode(\"overwrite\")")
        ManifestTable.append(spark, root, data, statsCols = statsCols,
          bloomCols = bloomCols, tag = tag)
      case SaveMode.Ignore =>
        if (!exists)
          ManifestTable.append(spark, root, data, statsCols = statsCols,
            bloomCols = bloomCols, tag = tag)
    }
    // schema-only result: building the full read relation here would
    // re-list every segment and re-read every sidecar/footer after
    // EACH commit (O(table metadata) per write on a streaming-ingest
    // log) for a return value DataFrameWriter never scans — readers
    // construct the real relation through the read path
    val ctx = sqlContext
    new BaseRelation {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = data.schema
    }
  }

  /** Streaming sink — `df.writeStream.format("graft.manifest")
    * .option("path", root)`: each micro-batch commits as ONE
    * manifest-logged segment tagged `mb<batchId>` (the
    * [[graft.streaming.Stream.runLakehouseIngest]] convention), so an
    * at-least-once replay is detected from the manifest NAME SCAN
    * alone and skipped — exactly-once table contents on top of an
    * at-least-once engine, with no idempotent-sink requirement pushed
    * to readers. Append output mode only (the log is append-only by
    * construction; aggregations ride [[graft.io.AggView]], not sink
    * upserts). `statsCols` collects zone-map sidecars per batch
    * segment. */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft.manifest sink supports Append output mode, got $outputMode " +
        "(aggregate maintenance rides AggView over the log, not sink upserts)")
    val root = rootOf(parameters)
    def colsOpt(k: String) = parameters.get(k.toLowerCase).orElse(parameters.get(k))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
    new ManifestSink(sqlContext.sparkSession, root, colsOpt("statsCols"),
      colsOpt("bloomCols"), partitionColumns)
  }
}

/** One manifest commit per micro-batch; replays skip on the batch tag. */
private[sources] class ManifestSink(spark: SparkSession, root: String,
    statsCols: Seq[String], bloomCols: Seq[String], partitionBy: Seq[String])
    extends org.apache.spark.sql.execution.streaming.Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val tag = s"mb$batchId"
    val seen = ManifestTable.exists(spark, root) &&
      ManifestTable.segments(spark, root).exists(_.contains(s"-$tag-"))
    if (seen) return
    // the V1 sink hands a STREAMING-flagged frame (batch writers
    // refuse it) — re-expose the same physical rows as a batch frame,
    // then snapshot once: append evaluates it for the segment write
    // and (when statsCols is set) again for the sidecar aggregate
    val snap = org.apache.spark.sql.GraftColumnBridge.asBatchDataFrame(data)
      .localCheckpoint()
    // empty micro-batches commit NOTHING: beyond being pointless, an
    // empty segment under partitionBy writes zero col=value dirs and
    // would read back as a flat segment in an otherwise-partitioned
    // layout (wedging every subsequent relation build); a replayed
    // empty batch re-skips identically, so exactly-once holds
    try if (!snap.isEmpty)
      ManifestTable.append(spark, root, snap, partitionBy = partitionBy,
        tag = Some(tag), statsCols = statsCols, bloomCols = bloomCols)
    finally graft.core.Lineage.release(snap)
  }
}

object ManifestSource {

  /** Segments the most recent listFiles kept after zone-map pruning —
    * a test observation hook (plan-shape specs assert the segment
    * skipping survives the SQL path), not a production surface. */
  @volatile var lastListedSegments: Seq[String] = Nil

  /** Partition dirs the most recent listFiles kept after partition
    * pruning (= segments for flat layouts) — same test-hook role. */
  @volatile var lastListedPartitions: Int = 0

  private[graft] def relation(spark: SparkSession, root: String,
      version: Option[Long], allowTombstones: Boolean): HadoopFsRelation = {
    val all = version match {
      case Some(v) => ManifestTable.segmentsAt(spark, root, v)
      case None => ManifestTable.segments(spark, root)
    }
    require(all.nonEmpty, s"no committed manifest under $root" +
      version.map(v => s" at version $v").getOrElse(""))
    val dels = all.filter(_.startsWith("del-"))
    if (dels.nonEmpty && !allowTombstones)
      throw new IllegalStateException(
        s"$root has ${dels.size} outstanding tombstone segment(s); a SQL " +
          "file scan cannot apply merge-on-read deletes. compact() the " +
          "table, read through ManifestTable.readMerged, or set " +
          "option(\"allowTombstones\", \"true\") to knowingly scan raw " +
          "data segments.")
    val segs = all.filterNot(_.startsWith("del-"))
    val index = new ManifestFileIndex(spark, root, segs)
    // merged footer schema (additive evolution: later segments may add
    // columns) in ONE footer-merge pass over the index's already-listed
    // leaf files — a per-segment read here would run one planning job
    // per segment on every relation build, dominating short-query
    // latency on a streaming-fed log with hundreds of segments
    val files = index.inputFiles
    val dataSchema =
      if (files.nonEmpty)
        spark.read.option("mergeSchema", "true").parquet(files.toSeq: _*).schema
      else // degenerate: only file-less (empty partitioned) segments
        segs.map(s => spark.read.parquet(s"$root/$s").schema)
          .reduce { (a, b) =>
            StructType(a.fields ++
              b.fields.filterNot(f => a.fieldNames.contains(f.name)))
          }
    val partNames = index.partitionSchema.fieldNames.toSet
    HadoopFsRelation(
      location = index,
      partitionSchema = index.partitionSchema,
      dataSchema = StructType(dataSchema.filterNot(f => partNames.contains(f.name))),
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty)(spark)
  }
}

/** Committed-segment file index with TWO pruning layers above
  * parquet's own: zone-map segment skipping on pushed data filters,
  * and hive-style partition-dir pruning on pushed partition filters
  * (single-level `col=value` layouts, the shape [[ManifestTable
  * .append]]'s `partitionBy` and the ANN index's `cell=` dirs write).
  * Listing state (files, partition values, sidecar stats) is resolved
  * ONCE at construction — driver-side metadata proportional to
  * segment count × partition dirs, the same cost class as the
  * manifest read itself. */
private[sources] class ManifestFileIndex(spark: SparkSession, root: String,
    segs: Seq[String]) extends FileIndex {

  private val rootPath = new Path(root)
  private val fs =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(dir: Path): Array[FileStatus] =
    fs.listStatus(dir).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  private var partCol: Option[String] = None

  /** (segment, raw partition value or None for flat, files). Every
    * segment must agree on the layout — all flat, or all single-level
    * partitioned on the same column (the only shapes our writers
    * produce; anything else fails loudly rather than dropping dirs). */
  private val entries: Seq[(String, Option[String], Array[FileStatus])] =
    segs.flatMap { s =>
      val segDir = new Path(rootPath, s)
      val all = fs.listStatus(segDir)
      val dirs = all.filter(st => st.isDirectory && st.getPath.getName.contains("="))
      if (dirs.isEmpty) Seq((s, None, dataFiles(segDir)))
      else dirs.toSeq.map { d =>
        val Array(c, v) = d.getPath.getName.split("=", 2)
        require(partCol.forall(_ == c),
          s"segment $s of $root is partitioned on '$c' but another segment " +
            s"uses '${partCol.get}'; the graft.manifest relation needs one " +
            "consistent layout — use ManifestTable.read for mixed layouts")
        partCol = Some(c)
        (s, Some(v), dataFiles(d.getPath))
      }
    }
  // force the listing (and with it partCol) at construction
  require(entries.forall(e => (e._2.isEmpty) == partCol.isEmpty),
    s"$root mixes flat and partitioned segments; the graft.manifest " +
      "relation needs one consistent layout — use ManifestTable.read")

  /** Partition value type: smallest of Int/Long that fits every dir
    * value, else String — matching what hive-style discovery infers
    * for the layouts our writers produce. */
  override val partitionSchema: StructType = partCol match {
    case None => StructType(Nil)
    case Some(c) =>
      val vals = entries.flatMap(_._2)
      val dt =
        if (vals.forall(v => scala.util.Try(v.toInt).isSuccess)) IntegerType
        else if (vals.forall(v => scala.util.Try(v.toLong).isSuccess)) LongType
        else StringType
      StructType(Seq(StructField(c, dt, nullable = false)))
  }

  private def partRow(raw: Option[String]): InternalRow = raw match {
    case None => InternalRow.empty
    case Some(v) =>
      val x: Any = partitionSchema.head.dataType match {
        case IntegerType => v.toInt
        case LongType => v.toLong
        case _ => UTF8String.fromString(v)
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array(x))
  }

  private val stats: Map[String, Option[ManifestTable.SegStats]] =
    segs.map(s => s -> ManifestTable.segmentStats(spark, root, s)).toMap

  // Bloom sidecars load lazily (a probe-free query never opens them)
  // and memoize per (segment, column) for the relation's lifetime
  private val bloomCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Option[org.apache.spark.util.sketch.BloomFilter]]
  private def bloomOf(seg: String, colName: String) =
    bloomCache.computeIfAbsent((seg, colName),
      _ => ManifestTable.segmentBloom(spark, root, seg, colName))

  override def rootPaths: Seq[Path] = segs.map(s => new Path(rootPath, s))

  override def sizeInBytes: Long =
    entries.iterator.flatMap(_._3).map(_.getLen).sum

  override def inputFiles: Array[String] =
    entries.flatMap(_._3.map(_.getPath.toString)).toArray

  override def refresh(): Unit = () // snapshot-pinned by design

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val bounds = dataFilters.flatMap(ManifestFileIndex.rangeBounds)
    val eqs = dataFilters.flatMap(ManifestFileIndex.eqProbes)
    // layer 1: zone maps (ranges) + Bloom sidecars (point probes —
    // the pruning an arrival-ordered log needs for `id = k`, where
    // every segment's [min, max] admits everything) drop segments
    val keep = entries.filter { case (s, _, _) =>
      bounds.forall { case (c, lo, hi) =>
        ManifestTable.statsAdmit(stats(s), c, lo, hi)
      } && eqs.forall { case (c, v) =>
        ManifestTable.bloomAdmit(bloomOf(s, c), v)
      }
    }
    // layer 2: partition filters drop col=value dirs inside survivors
    val pred = partitionFilters.reduceOption(And).map { e =>
      val bound = e.transformUp {
        case a: Attribute =>
          org.apache.spark.sql.catalyst.expressions.BoundReference(
            partitionSchema.fieldIndex(a.name),
            partitionSchema(partitionSchema.fieldIndex(a.name)).dataType,
            nullable = false)
      }
      val p = org.apache.spark.sql.catalyst.expressions.Predicate.create(bound)
      p.initialize(0)
      p
    }
    val kept = keep
      .map { case (s, raw, files) => (s, partRow(raw), files) }
      .filter { case (_, row, _) => pred.forall(_.eval(row)) }
    ManifestSource.lastListedSegments = kept.map(_._1).distinct
    ManifestSource.lastListedPartitions = kept.size
    kept.map { case (_, row, files) => PartitionDirectory(row, files) }
  }
}

private[sources] object ManifestFileIndex {

  /** Extract `(column, lo, hi)` zone-map probes from one pushed
    * predicate. Only shapes whose truth REQUIRES the column inside
    * the range contribute (conjuncts of =, <, <=, >, >= against
    * literals); anything else — OR, IS NULL, functions, non-literal
    * comparands — contributes nothing and the segment is read
    * (conservative, same contract as a parquet row-group filter).
    * `>`/`<` relax to their inclusive forms: zone maps are
    * segment-granular, so inclusivity only costs a false keep, never
    * a wrong prune. */
  private[sources] def rangeBounds(
      e: Expression): Seq[(String, Option[Any], Option[Any])] = e match {
    case And(l, r) => rangeBounds(l) ++ rangeBounds(r)
    case EqualTo(a: Attribute, Literal(v, dt)) =>
      bound(a, v, dt).map(b => (a.name, Some(b), Some(b))).toSeq
    case EqualTo(Literal(v, dt), a: Attribute) =>
      bound(a, v, dt).map(b => (a.name, Some(b), Some(b))).toSeq
    case GreaterThan(a: Attribute, Literal(v, dt)) =>
      bound(a, v, dt).map(b => (a.name, Some(b), None)).toSeq
    case GreaterThanOrEqual(a: Attribute, Literal(v, dt)) =>
      bound(a, v, dt).map(b => (a.name, Some(b), None)).toSeq
    case LessThan(a: Attribute, Literal(v, dt)) =>
      bound(a, v, dt).map(b => (a.name, None, Some(b))).toSeq
    case LessThanOrEqual(a: Attribute, Literal(v, dt)) =>
      bound(a, v, dt).map(b => (a.name, None, Some(b))).toSeq
    case GreaterThan(Literal(v, dt), a: Attribute) =>
      bound(a, v, dt).map(b => (a.name, None, Some(b))).toSeq
    case GreaterThanOrEqual(Literal(v, dt), a: Attribute) =>
      bound(a, v, dt).map(b => (a.name, None, Some(b))).toSeq
    case LessThan(Literal(v, dt), a: Attribute) =>
      bound(a, v, dt).map(b => (a.name, Some(b), None)).toSeq
    case LessThanOrEqual(Literal(v, dt), a: Attribute) =>
      bound(a, v, dt).map(b => (a.name, Some(b), None)).toSeq
    case _ => Nil
  }

  /** Extract `(column, value)` Bloom probes from one pushed
    * predicate: And-conjunct equalities against integral/string
    * literals (the types Bloom sidecars hash). Same conservatism as
    * [[rangeBounds]] — anything else contributes nothing. */
  private[sources] def eqProbes(e: Expression): Seq[(String, Any)] = e match {
    case And(l, r) => eqProbes(l) ++ eqProbes(r)
    case EqualTo(a: Attribute, Literal(v, dt)) =>
      probeVal(v, dt).map(a.name -> _).toSeq
    case EqualTo(Literal(v, dt), a: Attribute) =>
      probeVal(v, dt).map(a.name -> _).toSeq
    case _ => Nil
  }

  private def probeVal(v: Any, dt: DataType): Option[Any] =
    if (v == null) None
    else dt match {
      case StringType => Some(v.asInstanceOf[UTF8String].toString)
      case ByteType | ShortType | IntegerType | LongType => Some(v)
      case _ => None
    }

  /** Catalyst internal literal → the external value shape
    * [[ManifestTable.statsAdmit]]'s bound keys understand. Unmappable
    * values (NaN/Inf, exotic types, NULL literals) → None = no probe
    * for this predicate (conservative). */
  private def bound(a: Attribute, v: Any, dt: DataType): Option[Any] =
    if (v == null) None
    else scala.util.Try[Any] {
      dt match {
        case StringType => v.asInstanceOf[UTF8String].toString
        case TimestampType =>
          val us = v.asInstanceOf[Long]
          java.time.Instant.ofEpochSecond(
            Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
        case DateType => java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)
        case ByteType | ShortType | IntegerType | LongType | FloatType |
             DoubleType | _: DecimalType =>
          BigDecimal(v.toString) // throws on NaN/Inf -> conservative None
        case _ => return None
      }
    }.toOption
}
