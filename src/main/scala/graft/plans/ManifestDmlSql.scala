package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference,
  AttributeSet, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.io.ManifestDml
import graft.io.ManifestDml.{MergeDelete, MergeInsert, MergeRule, MergeUpdate}

/** Row-level SQL DML on the manifest log — the third face of the
  * lakehouse trio after SELECT (+time travel) and INSERT:
  *
  * {{{
  *   DELETE FROM `graft.manifest`.`/wh/events__log` WHERE id = 7
  *   UPDATE `graft.manifest`.`/wh/events__log` SET v = v * 2 WHERE id < 10
  *   MERGE INTO `graft.manifest`.`/wh/events__log` t USING updates s
  *     ON t.id = s.id
  *     WHEN MATCHED AND s.op = 'del' THEN DELETE
  *     WHEN MATCHED THEN UPDATE SET v = s.v
  *     WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
  * }}}
  *
  * Spark parses these into `DeleteFromTable`/`UpdateTable`/
  * `MergeIntoTable` and resolves every reference generically; its OWN
  * execution path then requires a v2 catalog table. This rule runs in
  * the same resolution fixed point: once a statement over a resolved
  * `graft.manifest` relation is fully resolved, it converts to a
  * runnable command backed by [[graft.io.ManifestDml]]'s pruning-first
  * copy-on-write verbs — the identical code path the typed API takes,
  * so plan shape, sidecar regeneration, change-feed marking and
  * optimistic-concurrency behavior are one implementation.
  *
  * Resolution details: resolved references are rebased BY NAME before
  * the statement leaves the analyzer — target attributes onto the
  * `__t` alias and (for MERGE) source attributes onto `__s` — so the
  * executing verb re-resolves them against its own scan of the table
  * head; the relation's pinned version rides along as the OCC
  * expectation (a pinned `@vN` target or a concurrent commit fails
  * loudly instead of applying a stale plan). Commands return a
  * `(action, segments_rewritten, rows_matched)` receipt row, same
  * shape as the maintenance table functions. */
class ResolveManifestDml(spark: SparkSession) extends Rule[LogicalPlan] {

  /** `(root, pinnedVersion, output)` when `plan` is (an alias over)
    * the manifest SQL relation. */
  private def targetOf(plan: LogicalPlan): Option[(String, Long, Seq[Attribute])] =
    plan match {
      case SubqueryAlias(_, child) => targetOf(child)
      // the column-mapping surface: a pure alias Project over the
      // relation (physical→logical renames, no computation) — the DML
      // verbs re-resolve by LOGICAL name against their own reads, so
      // seeing through it is exact
      case p: org.apache.spark.sql.catalyst.plans.logical.Project
          if p.projectList.forall {
            case _: AttributeReference => true
            case a: org.apache.spark.sql.catalyst.expressions.Alias =>
              a.child.isInstanceOf[AttributeReference]
            case _ => false
          } => targetOf(p.child)
      case r: LogicalRelation =>
        (r.relation match {
          case h: HadoopFsRelation => h.location
          case _ => null
        }) match {
          case idx: graft.sources.ManifestFileIndex if idx.pinnedVersion >= 0 =>
            Some((idx.tableRoot, idx.pinnedVersion, r.output))
          case _ => None
        }
      case _ => None
    }

  /** `Expression.transform` does not descend into subquery PLANS, so a
    * correlated subquery's outer references (inside its plan, bound to
    * the statement's discarded exprIds) would survive the rebase and
    * fail re-resolution inside the verb with an opaque internal
    * analysis error — reject them up front with the same clean message
    * top-level foreign attributes get. Uncorrelated subqueries are
    * self-contained plans and ride through fine. */
  private def rejectCorrelated(e: Expression): Expression = {
    e.foreach {
      case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression
          if s.getOuterAttrs.nonEmpty =>
        throw new IllegalArgumentException(
          "correlated subqueries are not supported in manifest DML " +
            "conditions — materialize the correlated row set first and " +
            "MERGE USING it (or join it into the MERGE source)")
      case _ => ()
    }
    e
  }

  /** Rebase a resolved expression onto executor-side aliases by NAME:
    * target attributes → `__t.<name>`, source attributes (MERGE) →
    * `__s.<name>`. The returned Column re-resolves inside the verb's
    * own plan, so the statement survives the analyzer discarding this
    * plan's attribute ids. */
  private def rebase(e: Expression, tSet: AttributeSet,
      sSet: AttributeSet): Column =
    GraftColumnBridge.column(rejectCorrelated(e).transform {
      case a: AttributeReference if tSet.contains(a) =>
        UnresolvedAttribute(Seq("__t", a.name))
      case a: AttributeReference if sSet.contains(a) =>
        UnresolvedAttribute(Seq("__s", a.name))
      case a: AttributeReference =>
        throw new IllegalArgumentException(
          s"reference ${a.name} belongs to neither the MERGE target nor " +
            "its source — correlated outer references are not supported " +
            "in manifest DML")
    })

  /** For single-table DELETE/UPDATE the verbs resolve bare names. */
  private def rebaseBare(e: Expression): Column =
    GraftColumnBridge.column(rejectCorrelated(e).transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  private def assignmentName(key: Expression): String = key match {
    case a: AttributeReference => a.name
    case other => throw new IllegalArgumentException(
      s"manifest DML supports top-level column assignments only, got $other " +
        "(nested-field assignment needs a full-column update)")
  }

  /** Assignment key → (root attribute, nested field path). `SET s.f =
    * v` parses as a GetStructField chain over the root column. */
  private def keyPath(key: Expression)
      : (AttributeReference, Seq[String]) = key match {
    case a: AttributeReference => (a, Nil)
    case g: org.apache.spark.sql.catalyst.expressions.GetStructField =>
      val (r, p) = keyPath(g.child)
      (r, p :+ g.extractFieldName)
    case other => throw new IllegalArgumentException(
      s"manifest DML supports column and nested-struct-field assignments " +
        s"only, got $other")
  }

  /** UPDATE assignments grouped by ROOT column: a nested-field
    * assignment (`SET s.f = v`) composes onto the root's pre-image via
    * `withField` (leaf value cast to the field's declared type — an
    * UPDATE never changes the schema), multiple fields of one struct
    * fold together, and whole-column assignments pass through — so the
    * executing verb only ever sees top-level (column, value) pairs. */
  private def toSets(assignments: Seq[Assignment],
      rootCol: String => Column, mkValue: Expression => Column)
      : Seq[(String, Column)] = {
    val parsed = assignments.map { a =>
      val (r, p) = keyPath(a.key); (r, p, a.value)
    }
    parsed.map(_._1.name).distinct.map { rn =>
      val mine = parsed.filter(_._1.name == rn)
      if (mine.exists(_._2.isEmpty)) {
        require(mine.size == 1,
          s"UPDATE assigns column $rn more than once")
        rn -> mkValue(mine.head._3)
      } else {
        require(mine.map(_._2).distinct.size == mine.size,
          s"UPDATE assigns the same nested field of $rn more than once")
        rn -> mine.foldLeft(rootCol(rn)) { case (acc, (r, p, v)) =>
          val leafType = p.foldLeft(r.dataType) {
            case (st: org.apache.spark.sql.types.StructType, f) => st(f).dataType
            case (dt, f) => throw new IllegalArgumentException(
              s"cannot assign field $f under non-struct type " +
                s"${dt.simpleString} of column $rn")
          }
          acc.withField(p.mkString("."), mkValue(v).cast(leafType))
        }
      }
    }
  }

  /** `evolved` = source-only columns a star action (UPDATE SET * or
    * INSERT *) additionally assigns under WITH SCHEMA EVOLUTION
    * (empty otherwise). */
  private def toRules(actions: Seq[MergeAction], tSet: AttributeSet,
      sSet: AttributeSet, tOut: Seq[Attribute],
      evolved: Seq[Attribute]): Seq[MergeRule] = {
    def evolvedSets: Seq[(String, Column)] =
      evolved.map(a => a.name -> rebase(a, tSet, sSet))
    // star-shaped = resolution of `*` against the pre-evolution target:
    // one bare source reference per target column, by name
    // INSERT * detection is STRUCTURAL: unlike UpdateAction (which
    // carries `fromStar`), the analyzer rewrites InsertStarAction into
    // a plain InsertAction with identity assignments before this rule
    // sees it, so an explicit full-width identity-named INSERT
    // (`INSERT (a, b) VALUES (s.a, s.b)` with the exact target column
    // set) is indistinguishable from `INSERT *`. Consequence, by
    // design: under WITH SCHEMA EVOLUTION both shapes also assign the
    // evolved source-only columns — documented in COVERAGE.md; users
    // who want an evolution-exempt insert list a non-identity shape
    // (e.g. an explicit cast or a different column order is NOT
    // exempt; omit a column instead).
    def starShaped(as: Seq[Assignment]): Boolean =
      as.size == tOut.size && as.forall(a => (a.key, a.value) match {
        case (k: AttributeReference, v: AttributeReference) => k.name == v.name
        case _ => false
      })
    actions.map {
      case u: UpdateAction => MergeUpdate(
        u.condition.map(rebase(_, tSet, sSet)),
        toSets(u.assignments,
          n => GraftColumnBridge.column(UnresolvedAttribute(Seq("__t", n))),
          rebase(_, tSet, sSet)) ++
          (if (u.fromStar) evolvedSets else Nil))
      case d: DeleteAction => MergeDelete(d.condition.map(rebase(_, tSet, sSet)))
      case i: InsertAction => MergeInsert(
        i.condition.map(rebase(_, tSet, sSet)),
        i.assignments.map(a =>
          assignmentName(a.key) -> rebase(a.value, tSet, sSet)) ++
          (if (starShaped(i.assignments)) evolvedSets else Nil))
      case other => throw new IllegalArgumentException(
        s"unsupported MERGE action on a manifest table: $other")
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case d @ DeleteFromTable(t, cond) if d.resolved =>
      targetOf(t).fold(d: LogicalPlan) { case (root, v, _) =>
        ManifestDeleteCommand(root, v, rebaseBare(cond))
      }
    case u @ UpdateTable(t, assignments, cond) if u.resolved =>
      targetOf(t).fold(u: LogicalPlan) { case (root, v, _) =>
        ManifestUpdateCommand(root, v,
          toSets(assignments,
            n => GraftColumnBridge.column(UnresolvedAttribute.quoted(n)),
            rebaseBare),
          cond.map(rebaseBare).getOrElse(GraftColumnBridge.column(Literal(true))))
      }
    case m @ MergeIntoTable(t, s, cond, matched, notMatched, nmbs, evolve)
        if m.resolved =>
      targetOf(t).fold(m: LogicalPlan) { case (root, v, _) =>
        // WITH SCHEMA EVOLUTION: the analyzer resolves star actions
        // against the PRE-evolution target, so the source-only columns
        // are grafted on here — star actions additionally assign them,
        // the verb extends the target schema additively (untouched
        // segments read NULL there, the log's standard evolution)
        val eq = spark.sessionState.conf.resolver
        val evolved: Seq[Attribute] =
          if (!evolve) Nil
          else s.output.filterNot(sa => t.output.exists(ta => eq(ta.name, sa.name)))
        val tSet = t.outputSet
        val sSet = s.outputSet
        ManifestMergeCommand(root, v, s, rebase(cond, tSet, sSet),
          toRules(matched, tSet, sSet, t.output, evolved),
          toRules(notMatched, tSet, sSet, t.output, evolved),
          toRules(nmbs, tSet, sSet, t.output, evolved),
          evolved.map(a => a.name -> a.dataType))
      }
  }
}

private[plans] object ManifestDmlCommands {
  def receiptSchema: Seq[Attribute] = Seq(
    AttributeReference("action", StringType, nullable = false)(),
    AttributeReference("segments_rewritten", IntegerType, nullable = false)(),
    AttributeReference("rows_matched", LongType, nullable = false)())

  /** Session opt-in for DML commit-race retry (SQL face of the typed
    * verbs' `retryRaces` flag): `SET spark.graft.dml.retryRaces=true`
    * makes a lost publish race re-validate against the new head and
    * retry when the interleavers touched disjoint segments (see
    * [[graft.io.ManifestDml]]); default keeps the loud single-winner
    * contract. */
  def retryRaces(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.dml.retryRaces").exists(_.toBoolean)
}

/** `ALTER TABLE t ADD COLUMN(S) (…)` on a manifest table — one
  * additive-evolution commit ([[graft.io.ManifestTable.addColumns]]:
  * an empty schema-carrying segment; untouched segments read NULL).
  * For a catalog-NAMED table the session catalog's stored schema is
  * kept in sync so `DESCRIBE` answers right; a named table with no
  * committed manifest yet evolves the catalog schema alone (its first
  * INSERT commits v1 with the full evolved shape). Top-level columns
  * only — nested-field adds, explicit positions and DEFAULT values
  * are rejected loudly rather than half-honored. */
case class ManifestAlterAddColumnsCommand(root: String,
    cols: Seq[(String, org.apache.spark.sql.types.DataType)],
    ident: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("action", StringType, nullable = false)(),
    AttributeReference("columns_added", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val committed = graft.io.ManifestTable.exists(spark, root)
    if (committed)
      // the log is the source of truth: validates dups against the
      // merged head schema, commits the evolution
      graft.io.ManifestTable.addColumns(spark, root, cols)
    else require(ident.isDefined,
      s"ALTER TABLE of uncommitted table $root — INSERT first (or declare " +
        "the columns in CREATE TABLE)")
    ident.foreach { id =>
      val cat = spark.sessionState.catalog
      val cur = cat.getTableMetadata(id).dataSchema
      val eq = spark.sessionState.conf.resolver
      val dup = cols.filter { case (n, _) =>
        cur.fields.exists(fd => eq(fd.name, n)) }
      // born-empty table: the catalog schema IS the table, dups loud;
      // committed table: the log already validated, any catalog
      // overlap is drift the log-derived read path never consults
      require(committed || dup.isEmpty,
        s"column(s) already exist in $id: ${dup.map(_._1).mkString(", ")}")
      val fresh = cols.filterNot(dup.contains)
      // the log commit above already succeeded; a catalog-sync failure
      // here (metastore hiccup) must not read as "nothing happened" —
      // the log and catalog schemas have drifted (DESCRIBE stale) and
      // the repair is re-running this ALTER (the log side is
      // idempotent-safe: a duplicate column re-ADD fails loudly, so
      // re-run AFTER confirming DESCRIBE is the stale side)
      try cat.alterTableDataSchema(id, org.apache.spark.sql.types.StructType(
        cur.fields ++ fresh.map { case (n, t) =>
          org.apache.spark.sql.types.StructField(n, t, nullable = true) }))
      catch { case e: Exception if committed =>
        throw new IllegalStateException(
          s"ALTER TABLE $id ADD COLUMNS committed to the manifest log " +
            s"at $root but syncing the session catalog schema failed — " +
            "reads through the log are already evolved; DESCRIBE is " +
            "stale until the catalog is repaired (fix the metastore, " +
            "then re-sync the catalog schema)", e)
      }
    }
    Seq(Row("alter", cols.size))
  }
}

/** `ALTER TABLE t DROP COLUMN(S) (…)` on a manifest table — one
  * schema-projection commit ([[graft.io.ManifestTable.dropColumns]]:
  * a carried-forward `#dropcol` set, zero data IO; segment bytes
  * disappear at the next rewrite). Catalog-named tables keep their
  * stored schema in sync; `IF EXISTS` skips missing names. Top-level
  * columns only. */
case class ManifestAlterDropColumnsCommand(root: String,
    cols: Seq[String], ifExists: Boolean,
    ident: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("action", StringType, nullable = false)(),
    AttributeReference("columns_dropped", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    require(graft.io.ManifestTable.exists(spark, root) || ident.isDefined,
      s"ALTER TABLE of uncommitted table $root")
    val eq = spark.sessionState.conf.resolver
    val toDrop =
      if (!ifExists) cols
      else {
        val visible: Seq[String] =
          if (graft.io.ManifestTable.exists(spark, root))
            graft.sources.ManifestSource
              .relation(spark, root, None, allowTombstones = true)
              .schema.fieldNames.toSeq
          else ident.map(id => spark.sessionState.catalog
            .getTableMetadata(id).dataSchema.fieldNames.toSeq)
            .getOrElse(Seq.empty)
        cols.filter(c => visible.exists(eq(_, c)))
      }
    if (toDrop.nonEmpty && graft.io.ManifestTable.exists(spark, root))
      graft.io.ManifestTable.dropColumns(spark, root, toDrop)
    ident.foreach { id =>
      val cat = spark.sessionState.catalog
      val cur = cat.getTableMetadata(id).dataSchema
      if (!graft.io.ManifestTable.exists(spark, root)) {
        // born-empty named table: the catalog schema IS the table
        val missing = toDrop.filterNot(c => cur.fields.exists(fd => eq(fd.name, c)))
        require(missing.isEmpty,
          s"column(s) do not exist in $id: ${missing.mkString(", ")}")
        require(cur.size > toDrop.size, s"cannot DROP every column of $id")
      }
      val kept = cur.fields.filterNot(fd => toDrop.exists(c => eq(fd.name, c)))
      if (kept.length != cur.fields.length) {
        // alterTableDataSchema refuses to drop fields by design; the
        // raw alterTable path sets the narrowed schema (data fields +
        // unchanged partition fields, V1 layout order). Same partial-
        // state contract as ADD: the log projection is already
        // committed, so a catalog hiccup here is drift, not a no-op.
        val meta = cat.getTableMetadata(id)
        try cat.alterTable(meta.copy(schema = org.apache.spark.sql.types
          .StructType(kept ++ meta.partitionSchema.fields)))
        catch { case e: Exception
            if graft.io.ManifestTable.exists(spark, root) =>
          throw new IllegalStateException(
            s"ALTER TABLE $id DROP COLUMNS committed to the manifest " +
              s"log at $root but syncing the session catalog schema " +
              "failed — reads through the log already project the " +
              "column out; DESCRIBE is stale until the catalog is " +
              "repaired", e)
        }
      }
    }
    Seq(Row("alter", toDrop.size))
  }
}

/** `ALTER TABLE t RENAME COLUMN old TO new` on a manifest table — one
  * column-mapping commit ([[graft.io.ManifestTable.renameColumn]]:
  * the physical name never changes, a `#colmap` line binds it to the
  * new logical name; zero data IO). Catalog-named tables keep their
  * stored schema in sync; a born-empty named table renames the
  * catalog schema alone (the schema IS the table until the first
  * INSERT). */
case class ManifestAlterRenameColumnCommand(root: String,
    oldName: String, newName: String,
    ident: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("action", StringType, nullable = false)(),
    AttributeReference("column", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val committed = graft.io.ManifestTable.exists(spark, root)
    require(committed || ident.isDefined,
      s"ALTER TABLE of uncommitted table $root")
    if (committed)
      graft.io.ManifestTable.renameColumn(spark, root, oldName, newName)
    ident.foreach { id =>
      val cat = spark.sessionState.catalog
      val eq = spark.sessionState.conf.resolver
      val meta = cat.getTableMetadata(id)
      val cur = meta.dataSchema
      if (!committed) {
        require(cur.fields.exists(fd => eq(fd.name, oldName)),
          s"column $oldName does not exist in $id (${cur.simpleString})")
        require(!meta.schema.fields.exists(fd => eq(fd.name, newName)),
          s"column $newName already exists in $id")
        require(!meta.partitionSchema.fields.exists(fd => eq(fd.name, oldName)),
          s"$oldName is a partition column of $id")
      }
      val renamed = cur.fields.map(fd =>
        if (eq(fd.name, oldName)) fd.copy(name = newName) else fd)
      if (renamed.map(_.name).toSeq != cur.fields.map(_.name).toSeq) {
        // alterTableDataSchema refuses renames by design; raw alterTable
        // sets the renamed schema (same partial-state contract as DROP)
        try cat.alterTable(meta.copy(schema = org.apache.spark.sql.types
          .StructType(renamed ++ meta.partitionSchema.fields)))
        catch { case e: Exception if committed =>
          throw new IllegalStateException(
            s"ALTER TABLE $id RENAME COLUMN committed to the manifest " +
              s"log at $root but syncing the session catalog schema " +
              "failed — reads through the log already use the new name; " +
              "DESCRIBE is stale until the catalog is repaired", e)
        }
      }
    }
    Seq(Row("alter", s"$oldName->$newName"))
  }
}

/** `ALTER TABLE t ALTER COLUMN c TYPE t2` on a manifest table — safe
  * type WIDENING as one marker-segment commit ([[graft.io
  * .ManifestTable.alterColumnType]]: old segments upcast at scan
  * time, zero data IO; narrowing rejects loudly). Catalog-named
  * tables keep their stored schema in sync; born-empty named tables
  * widen the catalog schema alone (under the same safe-widening
  * contract, for one predictable verb). */
case class ManifestAlterColumnTypeCommand(root: String,
    colName: String, newType: org.apache.spark.sql.types.DataType,
    ident: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("action", StringType, nullable = false)(),
    AttributeReference("column", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val committed = graft.io.ManifestTable.exists(spark, root)
    require(committed || ident.isDefined,
      s"ALTER TABLE of uncommitted table $root")
    if (committed)
      graft.io.ManifestTable.alterColumnType(spark, root, colName, newType)
    ident.foreach { id =>
      val cat = spark.sessionState.catalog
      val eq = spark.sessionState.conf.resolver
      val meta = cat.getTableMetadata(id)
      val cur = meta.dataSchema
      if (!committed) {
        val field = cur.fields.find(fd => eq(fd.name, colName)).getOrElse(
          throw new IllegalArgumentException(
            s"column $colName does not exist in $id (${cur.simpleString})"))
        require(field.dataType != newType,
          s"column $colName of $id already has type ${newType.simpleString}")
        require(graft.io.ManifestTable.safeWiden(field.dataType, newType),
          s"ALTER COLUMN TYPE supports SAFE WIDENING only " +
            s"(${field.dataType.simpleString} -> ${newType.simpleString})")
        require(!meta.partitionSchema.fields.exists(fd => eq(fd.name, colName)),
          s"$colName is a partition column of $id")
      }
      val widened = cur.fields.map(fd =>
        if (eq(fd.name, colName)) fd.copy(dataType = newType, nullable = true)
        else fd)
      try cat.alterTable(meta.copy(schema = org.apache.spark.sql.types
        .StructType(widened ++ meta.partitionSchema.fields)))
      catch { case e: Exception if committed =>
        throw new IllegalStateException(
          s"ALTER TABLE $id ALTER COLUMN TYPE committed to the manifest " +
            s"log at $root but syncing the session catalog schema " +
            "failed — reads through the log are already widened; " +
            "DESCRIBE is stale until the catalog is repaired", e)
      }
    }
    Seq(Row("alter", s"$colName:${newType.simpleString}"))
  }
}

object ManifestAlterColumnTypeCommand {
  /** Parsed ALTER COLUMN specs → (name, new type) pairs; everything
    * but a plain TYPE change is rejected up front. */
  def colSpecs(specs: Seq[org.apache.spark.sql.catalyst.plans.logical.AlterColumnSpec])
      : Seq[(String, org.apache.spark.sql.types.DataType)] =
    specs.map { sp =>
      require(sp.column.name.length == 1,
        s"ALTER COLUMN on a manifest table targets TOP-LEVEL columns " +
          s"only, got nested field ${sp.column.name.mkString(".")}")
      require(sp.newDataType.isDefined,
        "ALTER COLUMN on a manifest table supports TYPE changes only")
      require(sp.newNullability.isEmpty && sp.newComment.isEmpty &&
        sp.newPosition.isEmpty && sp.newDefaultExpression.isEmpty &&
        !sp.dropDefault,
        "ALTER COLUMN on a manifest table supports TYPE changes only " +
          "(no nullability/comment/position/default alterations)")
      sp.column.name.head -> sp.newDataType.get
    }
}

object ManifestAlterDropColumnsCommand {
  def colNames(cols: Seq[org.apache.spark.sql.catalyst.analysis.FieldName])
      : Seq[String] =
    cols.map { c =>
      require(c.name.length == 1,
        s"ALTER TABLE on a manifest table drops TOP-LEVEL columns only, " +
          s"got nested field ${c.name.mkString(".")}")
      c.name.head
    }
}

object ManifestAlterAddColumnsCommand {
  /** Parsed column list → (name, type) pairs; everything the log's
    * additive evolution cannot express is rejected up front. */
  def colSpecs(cols: Seq[QualifiedColType])
      : Seq[(String, org.apache.spark.sql.types.DataType)] =
    cols.map { c =>
      require(c.path.isEmpty,
        s"ALTER TABLE on a manifest table adds TOP-LEVEL columns only, " +
          s"got nested field ${c.name.mkString(".")}")
      require(c.position.isEmpty,
        "ALTER TABLE on a manifest table appends columns at the end — " +
          "FIRST/AFTER positions are not supported")
      require(c.default.isEmpty,
        s"DEFAULT values are not supported on manifest tables — existing " +
          s"rows read NULL for ${c.colName}; backfill with UPDATE")
      c.colName -> c.dataType
    }
}

/** `DELETE FROM graft.manifest.root WHERE cond` — executes
  * [[graft.io.ManifestDml.deleteWhere]] exactly once per query
  * execution (EXPLAIN never fires it). */
case class ManifestDeleteCommand(root: String, atVersion: Long,
    cond: Column) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = ManifestDmlCommands.receiptSchema
  override def run(spark: SparkSession): Seq[Row] = {
    val r = ManifestDml.deleteWhere(spark, root, cond, Some(atVersion),
      retryRaces = ManifestDmlCommands.retryRaces(spark))
    Seq(Row("delete", r.segmentsRewritten, r.rowsMatched))
  }
}

/** `UPDATE graft.manifest.root SET … WHERE cond`. */
case class ManifestUpdateCommand(root: String, atVersion: Long,
    sets: Seq[(String, Column)], cond: Column) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = ManifestDmlCommands.receiptSchema
  override def run(spark: SparkSession): Seq[Row] = {
    val r = ManifestDml.updateWhere(spark, root, sets, cond, Some(atVersion),
      retryRaces = ManifestDmlCommands.retryRaces(spark))
    Seq(Row("update", r.segmentsRewritten, r.rowsMatched))
  }
}

/** `MERGE INTO graft.manifest.root USING source ON cond WHEN …`. The
  * analyzed source plan rides as data (not a child), re-materialized
  * at run time. `evolveCols` = source-only columns a WITH SCHEMA
  * EVOLUTION merge adds to the target schema. */
case class ManifestMergeCommand(root: String, atVersion: Long,
    source: LogicalPlan, cond: Column, matched: Seq[MergeRule],
    notMatched: Seq[MergeRule], notMatchedBySource: Seq[MergeRule],
    evolveCols: Seq[(String, org.apache.spark.sql.types.DataType)] = Nil)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = ManifestDmlCommands.receiptSchema
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftColumnBridge.dataFrame(spark, source)
    val r = ManifestDml.mergeInto(spark, root, src, cond, matched,
      notMatched, notMatchedBySource, Some(atVersion),
      retryRaces = ManifestDmlCommands.retryRaces(spark),
      evolveCols = evolveCols)
    Seq(Row("merge", r.segmentsRewritten, r.rowsMatched))
  }
}
