package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level DML on the [[ManifestTable]] log: copy-on-write
  * DELETE / UPDATE (and MERGE, the three-verb trio every lakehouse
  * table format ships), each ONE atomic manifest commit.
  *
  * The scale shape is pruning-first copy-on-write — the cost model
  * that makes row-level DML viable on a 100 TB log:
  *
  *  1. '''Candidate pruning (metadata only).''' The predicate scan
  *     goes through the SQL relation ([[graft.sources.ManifestSource
  *     .relation]]), so its pushed filters prune whole segments via
  *     the manifest-embedded zone maps / Bloom sidecars / partition
  *     dirs before any data IO. A point DELETE on a clustered column
  *     opens O(admitting segments), not the table.
  *  2. '''Exact touch detection (one scan).''' Surviving candidates
  *     are scanned ONCE with the predicate; matched rows group by
  *     their source segment (`input_file_name()`, map-side — the
  *     aggregate is O(segments) rows), so segments whose zone maps
  *     admitted but whose rows never matched are NOT rewritten.
  *  3. '''Scoped rewrite + atomic swap.''' Only truly-touched
  *     segments are re-read, transformed, and written as one
  *     replacement segment (zone-map/Bloom sidecars regenerated over
  *     the union of what the inputs carried); the commit drops the
  *     touched segments and adds the replacement under a [[ManifestTable
  *     .DmlMark]], so every untouched segment stays byte-identical and
  *     readers see the old or the new snapshot, never a mix.
  *
  * Contract edges, all loud: DML needs a tombstone-free table (a
  * rewrite under outstanding merge-on-read deletes could resurrect a
  * deleted row — `compact()` first, the same precondition as the SQL
  * read face); a table that advanced past the expected version throws
  * (optimistic concurrency — re-run against the head); the change
  * feed surfaces a DML commit as pre-image deletes + re-inserts
  * ([[ManifestTable.readChanges]]) and additions-only consumers fail
  * loudly rather than silently missing the rewrite.
  *
  * Reference posture: locopy's warehouse runs DELETE/UPDATE/MERGE
  * server-side behind `execute` (`locopy/database.py:131-190`); here
  * the verbs are engine-native and reachable both from this typed API
  * and from pure SQL via [[graft.plans.ResolveManifestDml]].
  */
object ManifestDml {

  /** What a DML verb did: how many segments were rewritten (0 = no
    * row matched, no new manifest version) and how many rows the
    * predicate/merge matched. */
  final case class DmlReceipt(segmentsRewritten: Int, rowsMatched: Long)

  /** `DELETE FROM root WHERE cond`: rows where `cond` is TRUE go;
    * rows where it is false or NULL stay (SQL semantics). */
  def deleteWhere(spark: SparkSession, root: String, cond: Column,
      expectVersion: Option[Long] = None): DmlReceipt =
    dmlRewrite(spark, root, cond, expectVersion) { rows =>
      rows.filter(!coalesce(cond, lit(false)))
    }

  /** `UPDATE root SET name = value, … WHERE cond`: matched rows take
    * the assigned values (cast to the column's existing type — an
    * UPDATE never changes the schema), unmatched rows ride through
    * unchanged. Assignments may reference any table column (pre-image
    * values, per standard UPDATE semantics) and may target partition
    * columns — reassigned rows land in their new `col=value` dir in
    * the rewritten segment. */
  def updateWhere(spark: SparkSession, root: String,
      sets: Seq[(String, Column)], cond: Column,
      expectVersion: Option[Long] = None): DmlReceipt = {
    require(sets.nonEmpty, "UPDATE needs at least one assignment")
    dmlRewrite(spark, root, cond, expectVersion) { rows =>
      val eq = spark.sessionState.conf.resolver
      val byTarget = sets.map { case (n, v) =>
        val field = rows.schema.fields.find(fd => eq(fd.name, n)).getOrElse(
          throw new IllegalArgumentException(
            s"UPDATE assigns unknown column '$n' (table has " +
              rows.columns.mkString(", ") + ")"))
        field.name -> when(coalesce(cond, lit(false)),
          v.cast(field.dataType)).otherwise(col(field.name))
      }.toMap
      require(byTarget.size == sets.size,
        "UPDATE assigns the same column more than once")
      rows.select(rows.columns.toSeq.map(c =>
        byTarget.getOrElse(c, col(c)).as(c)): _*)
    }
  }

  /** Shared copy-on-write core: find touched segments through the
    * pruned predicate scan, rewrite them with `rewrite`, swap
    * atomically. `rewrite` receives exactly the touched segments'
    * rows (schema-evolution union) and must keep the column set. */
  private def dmlRewrite(spark: SparkSession, root: String, cond: Column,
      expectVersion: Option[Long])(rewrite: DataFrame => DataFrame): DmlReceipt = {
    val (f, p) = ManifestTable.fs(spark, root)
    val v = ManifestTable.currentVersion(f, p).getOrElse(
      throw new IllegalStateException(s"row-level DML on uncommitted table $root"))
    expectVersion.foreach { ev =>
      require(ev == v,
        s"$root is at manifest v$v but the statement was planned against " +
          s"v$ev (pinned-version target, or a concurrent commit won the " +
          "race) — re-run against the head")
    }
    val all = ManifestTable.readManifest(f, p, v)
    require(!all.exists(_.startsWith(ManifestTable.DelPrefix)),
      s"$root has outstanding merge-on-read tombstones; a copy-on-write " +
        "rewrite under them could resurrect deleted rows — compact() first")

    // ---- phase 1: pruned match scan, grouped by source segment ----
    val rel = graft.sources.ManifestSource.relation(
      spark, root, Some(v), allowTombstones = false)
    val df = spark.baseRelationToDataFrame(rel)
    val qroot = f.makeQualified(p).toString
    // the path component right after the table root IS the segment name
    val segCol = substring_index(
      input_file_name().substr(lit(qroot.length + 2), lit(1 << 30)), "/", 1)
    val matchedBySeg = df.filter(cond)
      .groupBy(segCol.as("_seg")).count().collect()
    if (matchedBySeg.isEmpty) return DmlReceipt(0, 0L)
    val touched = matchedBySeg.map(_.getString(0)).toSeq
    val rowsMatched = matchedBySeg.map(_.getLong(1)).sum
    val allSet = all.toSet
    require(touched.forall(allSet),
      s"internal: matched files attributed outside the manifest " +
        s"(${touched.filterNot(allSet).mkString(", ")}) — root prefix mismatch")

    // ---- phase 2: rewrite ONLY the touched segments ----
    val rows = conformTo(spark, ManifestTable.readSegs(spark, root, touched), rel)
    val kept = rewrite(rows)
    require(kept.columns.toSeq == rows.columns.toSeq,
      "internal: DML rewrite changed the column set")
    swapSegments(spark, root, v, touched, kept,
      rel.partitionSchema.fieldNames.toSeq)
    DmlReceipt(touched.size, rowsMatched)
  }

  /** `MERGE INTO root USING source ON cond …`: the lakehouse upsert
    * verb, same pruning-first copy-on-write shape as DELETE/UPDATE.
    * Two scans, the standard two-phase plan every lakehouse MERGE
    * runs: (1) an inner join finds the segments holding matched
    * target rows — and enforces the single-match cardinality rule
    * whenever a rewrite will happen (a target row matched by two
    * source rows would apply an ambiguous update, or duplicate
    * through the rewrite join); (2) a full-outer join over ONLY the
    * touched segments applies the action chains (first matching
    * WHEN clause wins, SQL CASE order) and the surviving rows swap in
    * as one replacement segment, unmatched-source inserts included.
    * An insert-only merge (no matched / not-matched-by-source
    * actions) never rewrites anything: it anti-joins the source and
    * commits a plain APPEND — feed-friendly, O(new rows) write. A
    * merge with not-matched-by-source actions touches every segment
    * by definition (the rows those actions hit are the ones the
    * source does NOT name, so nothing bounds them).
    *
    * The source is snapshotted ([[org.apache.spark.sql.Dataset
    * .localCheckpoint]]) so both phases see identical rows even for
    * non-deterministic sources. Conditions/values reference the
    * target as `__t.<col>` and the source as `__s.<col>` (the SQL
    * rule rebinds resolved references onto those aliases). */
  def mergeInto(spark: SparkSession, root: String, source: DataFrame,
      cond: Column, matched: Seq[MergeRule], notMatched: Seq[MergeRule],
      notMatchedBySource: Seq[MergeRule],
      expectVersion: Option[Long] = None): DmlReceipt = {
    require((matched ++ notMatchedBySource).forall(!_.isInstanceOf[MergeInsert]),
      "INSERT actions belong to WHEN NOT MATCHED [BY TARGET]")
    require(notMatched.forall(_.isInstanceOf[MergeInsert]),
      "WHEN NOT MATCHED [BY TARGET] supports INSERT actions only")
    val (f, p) = ManifestTable.fs(spark, root)
    val v = ManifestTable.currentVersion(f, p).getOrElse(
      throw new IllegalStateException(s"MERGE into uncommitted table $root"))
    expectVersion.foreach { ev =>
      require(ev == v,
        s"$root is at manifest v$v but the statement was planned against " +
          s"v$ev (pinned-version target, or a concurrent commit won the " +
          "race) — re-run against the head")
    }
    val all = ManifestTable.readManifest(f, p, v)
    require(!all.exists(_.startsWith(ManifestTable.DelPrefix)),
      s"$root has outstanding merge-on-read tombstones; a copy-on-write " +
        "rewrite under them could resurrect deleted rows — compact() first")
    val rel = graft.sources.ManifestSource.relation(
      spark, root, Some(v), allowTombstones = false)
    val tdf = spark.baseRelationToDataFrame(rel)
    val tFields = tdf.schema.fields.toSeq
    val src = source.localCheckpoint()
    try {
      val qroot = f.makeQualified(p).toString
      val segCol = substring_index(
        input_file_name().substr(lit(qroot.length + 2), lit(1 << 30)), "/", 1)

      // ---- phase 1: matched segments + cardinality (one inner join) ----
      // __seg/__tid are projected on the TARGET side before the join
      // (input_file_name must never evaluate post-join)
      val t1 = tdf.withColumn("__seg", segCol)
        .withColumn("__tid", monotonically_increasing_id()).alias("__t")
      val perSeg = t1.join(src.alias("__s"), cond, "inner")
        .groupBy(col("__tid")).agg(count(lit(1)).as("c"), first("__seg").as("s"))
        .groupBy(col("s")).agg(count(lit(1)).as("n"), max("c").as("mx"))
        .collect()
      val rowsMatched = perSeg.map(_.getLong(1)).sum
      val rewriting = matched.nonEmpty || notMatchedBySource.nonEmpty
      if (rewriting && perSeg.nonEmpty) {
        val mx = perSeg.map(_.getLong(2)).max
        require(mx == 1L,
          s"MERGE cardinality violation: a target row of $root matches " +
            s"$mx source rows — the ON clause must identify at most one " +
            "source row per target row when UPDATE/DELETE actions exist")
      }
      val touched: Seq[String] =
        if (notMatchedBySource.nonEmpty)
          all.filterNot(_.startsWith(ManifestTable.DelPrefix))
        else if (matched.nonEmpty) perSeg.map(_.getString(0)).toSeq
        else Nil
      val allSet = all.toSet
      require(touched.forall(allSet),
        s"internal: matched files attributed outside the manifest " +
          s"(${touched.filterNot(allSet).mkString(", ")})")

      def chainVal(rules: Seq[MergeRule], fd: org.apache.spark.sql.types.StructField,
          base: Column, tRef: String => Column): Column =
        rules.foldLeft(Option.empty[Column]) { (acc, r) =>
          val c = r.cond.getOrElse(lit(true))
          val value = r match {
            case MergeUpdate(_, set) => setLookup(set, fd).getOrElse(tRef(fd.name))
            case MergeDelete(_) => tRef(fd.name) // row dropped by keep-chain
            case MergeInsert(_, values) =>
              setLookup(values, fd).getOrElse(lit(null))
          }
          Some(acc.fold(when(c, value))(_.when(c, value)))
        }.fold(base)(_.otherwise(base))

      def chainKeep(rules: Seq[MergeRule], base: Column): Column =
        rules.foldLeft(Option.empty[Column]) { (acc, r) =>
          val c = r.cond.getOrElse(lit(true))
          val keep = lit(!r.isInstanceOf[MergeDelete])
          Some(acc.fold(when(c, keep))(_.when(c, keep)))
        }.fold(base)(_.otherwise(base))

      // ---- phase 2: action chains over the touched rows + inserts ----
      if (touched.nonEmpty) {
        val base = conformTo(spark,
          ManifestTable.readSegs(spark, root, touched), rel)
        val t2 = base.withColumn("__tex", lit(true)).alias("__t")
        val s2 = src.withColumn("__sex", lit(true)).alias("__s")
        val j = t2.join(s2, cond, "full_outer")
        val tex = coalesce(col("__tex"), lit(false))
        val sex = coalesce(col("__sex"), lit(false))
        def tRef(n: String): Column = t2(n)
        val keep =
          when(tex && sex, chainKeep(matched, lit(true)))
            .when(tex, chainKeep(notMatchedBySource, lit(true)))
            .otherwise(chainKeep(notMatched, lit(false)))
        val outCols = tFields.map { fd =>
          when(tex && sex, chainVal(matched, fd, tRef(fd.name), tRef))
            .when(tex, chainVal(notMatchedBySource, fd, tRef(fd.name), tRef))
            .otherwise(chainVal(notMatched, fd, lit(null), tRef))
            .cast(fd.dataType).as(fd.name)
        }
        val kept = j.filter(keep).select(outCols: _*)
        swapSegments(spark, root, v, touched, kept,
          rel.partitionSchema.fieldNames.toSeq)
        DmlReceipt(touched.size, rowsMatched)
      } else {
        // insert-only (or nothing-to-do) merge: plain append commit
        val ins = src.alias("__s").join(tdf.alias("__t"), cond, "left_anti")
        val insCols = tFields.map { fd =>
          chainVal(notMatched, fd, lit(null), n => lit(null))
            .cast(fd.dataType).as(fd.name)
        }
        val rows = ins.filter(chainKeep(notMatched, lit(false)))
          .select(insCols: _*).localCheckpoint()
        try {
          if (!rows.isEmpty)
            ManifestTable.append(spark, root, rows,
              partitionBy = rel.partitionSchema.fieldNames.toSeq)
        } finally graft.core.Lineage.release(rows)
        DmlReceipt(0, rowsMatched)
      }
    } finally graft.core.Lineage.release(src)
  }

  /** One MERGE action: the `cond`-gated UPDATE SET / DELETE /
    * INSERT clauses, applied first-match-wins in declaration order. */
  sealed trait MergeRule { def cond: Option[Column] }
  final case class MergeUpdate(cond: Option[Column],
      set: Seq[(String, Column)]) extends MergeRule
  final case class MergeDelete(cond: Option[Column]) extends MergeRule
  final case class MergeInsert(cond: Option[Column],
      values: Seq[(String, Column)]) extends MergeRule

  private def setLookup(set: Seq[(String, Column)],
      fd: org.apache.spark.sql.types.StructField): Option[Column] =
    set.collectFirst { case (n, v) if n.equalsIgnoreCase(fd.name) => v }

  /** Conform touched-segment rows to the RELATION's merged schema:
    * a pre-evolution segment lacks later-added columns (its reader
    * NULL-fills them), so the rewrite frame must materialize the full
    * additive schema for assignments/action chains to target those
    * columns — the rewritten segment thereby upgrades to the current
    * schema, standard copy-on-write evolution behavior. */
  private def conformTo(spark: SparkSession, df: DataFrame,
      rel: org.apache.spark.sql.execution.datasources.HadoopFsRelation): DataFrame = {
    val eq = spark.sessionState.conf.resolver
    val full = rel.dataSchema.fields ++ rel.partitionSchema.fields
    df.select(full.toSeq.map { fd =>
      df.columns.find(c => eq(c, fd.name))
        .map(c => col(c).as(fd.name))
        .getOrElse(lit(null).cast(fd.dataType).as(fd.name))
    }: _*)
  }

  /** Phases 2b+3 shared by every rewriting DML verb: write `kept` as
    * the replacement segment, regenerate the sidecars the touched
    * inputs carried, commit the swap atomically under [[ManifestTable
    * .DmlMark]], GC per the retention horizon. */
  private def swapSegments(spark: SparkSession, root: String, v: Long,
      touched: Seq[String], kept: DataFrame, partBy: Seq[String]): Unit = {
    val (f, p) = ManifestTable.fs(spark, root)
    val all = ManifestTable.readManifest(f, p, v)
    val seg = s"seg-${v + 1}-dml-${java.util.UUID.randomUUID().toString.take(8)}"
    val segPath = new Path(p, seg)
    ManifestTable.writeSeg(kept, s"$root/$seg", partBy)
    var files = ManifestTable.listDataFilesRec(f, segPath, "")
    val rest = all.filterNot(touched.toSet)
    if (files.isEmpty && rest.isEmpty && partBy.isEmpty) {
      // full clear of a flat table: keep the table alive with its
      // schema — a 0-partition frame takes FileFormatWriter's
      // write-one-empty-file path, so the snapshot stays readable
      f.delete(segPath, true)
      ManifestTable.writeSeg(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        kept.schema), s"$root/$seg", Nil)
      files = ManifestTable.listDataFilesRec(f, segPath, "")
    }
    val addSeg = files.nonEmpty
    val newList = rest ++ (if (addSeg) Seq(seg) else Nil)
    require(newList.nonEmpty,
      s"DML removed every row of hive-partitioned table $root — a " +
        "partitioned layout cannot hold an empty snapshot; destroy() or " +
        "replace() instead")
    val metaEntry =
      if (!addSeg) None
      else {
        val statCols = touched.flatMap(s =>
          ManifestTable.segmentStats(spark, root, s).toSeq
            .flatMap(_.cols.keys)).distinct
        val bCols = touched
          .flatMap(s => ManifestTable.bloomColsOf(f, new Path(p, s))).distinct
        val statsJson =
          if (statCols.nonEmpty)
            Some(ManifestTable.writeStats(spark, f, s"$root/$seg", statCols))
          else None
        if (bCols.nonEmpty) ManifestTable.writeBlooms(spark, f, s"$root/$seg", bCols)
        Some(seg -> ManifestTable.buildMeta(spark, f, root, seg, statsJson, bCols))
      }
    ManifestTable.commit(f, p, v + 1, newList, Seq(ManifestTable.DmlMark),
      metas = (ManifestTable.priorMetas(f, p, v) -- touched) ++ metaEntry)
    ManifestTable.gc(f, p)
  }
}
