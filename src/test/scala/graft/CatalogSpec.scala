package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.ManifestTable

/** Catalog-NAMED manifest tables: `CREATE TABLE t USING graft.manifest
  * LOCATION root` makes every later statement address the log by NAME
  * — SELECT, INSERT, DELETE/UPDATE/MERGE, VERSION AS OF — the
  * reference's whole API posture (every locopy verb takes
  * `table_name`, `locopy/redshift.py:193-233`). The resolution lives
  * in [[graft.plans.ResolveManifestRelation]] (hint batch), which must
  * PREEMPT Spark's `FindDataSourceTable`: that path caches the first
  * LogicalRelation per table name (stale snapshots across commits) and
  * its V1 INSERT writes raw parquet into `rootPaths.head` — inside an
  * existing segment dir (corruption). */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def root(name: String): String = {
    val r = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir"), name).toString
    ManifestTable.destroy(spark, r)
    r
  }

  private def withTable(names: String*)(body: => Unit): Unit =
    try body
    finally names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))

  test("named lifecycle: CREATE (declared schema, empty root) → INSERT → SELECT → UPDATE → DELETE → MERGE → DROP") {
    val r = root("cat_lifecycle__log")
    withTable("cat_t") {
      spark.sql(s"CREATE TABLE cat_t (id INT, v DOUBLE) " +
        s"USING `graft.manifest` LOCATION '$r'")
      // born empty: no manifest version yet, reads as 0 rows
      assert(spark.sql("SELECT * FROM cat_t").collect().isEmpty)
      assert(!ManifestTable.exists(spark, r))
      spark.sql("INSERT INTO cat_t VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
      spark.sql("INSERT INTO cat_t VALUES (4, 4.0)")
      assert(ManifestTable.versions(spark, r) == Seq(1L, 2L))
      assert(spark.sql("SELECT count(1) FROM cat_t").head().getLong(0) == 4)
      // row-level DML by name, each one atomic manifest commit
      val upd = spark.sql("UPDATE cat_t SET v = v * 10 WHERE id = 2").collect()
      assert(upd.map(x => (x.getString(0), x.getInt(1), x.getLong(2))).toSeq ==
        Seq(("update", 1, 1L)))
      val del = spark.sql("DELETE FROM cat_t WHERE id = 3").collect()
      assert(del.map(x => (x.getString(0), x.getInt(1), x.getLong(2))).toSeq ==
        Seq(("delete", 1, 1L)))
      Seq((2, 200.0), (5, 5.0)).toDF("id", "v")
        .createOrReplaceTempView("cat_src")
      spark.sql("""MERGE INTO cat_t t USING cat_src s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
      assert(spark.sql("SELECT * FROM cat_t ORDER BY id")
        .collect().map(x => (x.getInt(0), x.getDouble(1))).toSeq ==
        Seq((1, 1.0), (2, 200.0), (4, 4.0), (5, 5.0)))
    }
    // DROP removes the name; the external root keeps its data
    assert(ManifestTable.exists(spark, r))
  }

  test("consecutive DML by name sees each commit fresh — never FindDataSourceTable's cached first snapshot") {
    val r = root("cat_fresh__log")
    withTable("cat_fresh") {
      ManifestTable.append(spark, r, (0 until 10).toDF("id"))
      spark.sql(s"CREATE TABLE cat_fresh USING `graft.manifest` LOCATION '$r'")
      // every statement re-pins the then-current head; a stale cached
      // relation would fail the DML optimistic-concurrency check
      (1 to 3).foreach { k =>
        spark.sql(s"INSERT INTO cat_fresh VALUES (${100 + k})")
        val rc = spark.sql(s"DELETE FROM cat_fresh WHERE id = ${100 + k}")
          .collect()
        assert(rc.head.getLong(2) == 1L, s"round $k: ${rc.toSeq}")
      }
      assert(spark.sql("SELECT count(1) FROM cat_fresh").head().getLong(0) == 10)
    }
  }

  test("INSERT by name commits through the manifest — no raw parquet dropped into segment dirs") {
    val r = root("cat_insert__log")
    withTable("cat_ins") {
      ManifestTable.append(spark, r, Seq((1, "a")).toDF("id", "s"))
      spark.sql(s"CREATE TABLE cat_ins USING `graft.manifest` LOCATION '$r'")
      val segsBefore = ManifestTable.segments(spark, r)
      spark.sql("INSERT INTO cat_ins VALUES (2, 'b')")
      val segsAfter = ManifestTable.segments(spark, r)
      assert(segsAfter.size == segsBefore.size + 1,
        s"INSERT must append one committed segment: $segsBefore -> $segsAfter")
      // the pre-existing segment dir is untouched (no rogue part files)
      val (f, p) = (new org.apache.hadoop.fs.Path(r, segsBefore.head), null)
      val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val files = fs.listStatus(f).filter(_.isFile)
        .map(_.getPath.getName).filter(n => !n.startsWith("_") && !n.startsWith("."))
      assert(files.length == ManifestTable.segmentMetas(spark, r)
        .get(segsBefore.head).map(_.files.size).getOrElse(-1),
        s"segment dir gained files outside the manifest: ${files.toSeq}")
      assert(spark.sql("SELECT count(1) FROM cat_ins").head().getLong(0) == 2)
      // INSERT OVERWRITE = replace commit
      spark.sql("INSERT OVERWRITE cat_ins VALUES (9, 'z')")
      assert(spark.sql("SELECT * FROM cat_ins").collect()
        .map(x => (x.getInt(0), x.getString(1))).toSeq == Seq((9, "z")))
    }
  }

  test("VERSION AS OF / TIMESTAMP AS OF by table name") {
    val r = root("cat_tt__log")
    ManifestTable.setRetainVersions(spark, r, 10)
    withTable("cat_tt") {
      spark.sql(s"CREATE TABLE cat_tt (id INT) USING `graft.manifest` LOCATION '$r'")
      spark.sql("INSERT INTO cat_tt VALUES (1)")
      spark.sql("INSERT INTO cat_tt VALUES (2)")
      assert(spark.sql("SELECT count(1) FROM cat_tt VERSION AS OF 1")
        .head().getLong(0) == 1)
      assert(spark.sql("SELECT count(1) FROM cat_tt").head().getLong(0) == 2)
      val t1 = ManifestTable.history(spark, r).head.timeMs
      assert(spark.sql("SELECT count(1) FROM cat_tt TIMESTAMP AS OF " +
        s"'${new java.sql.Timestamp(t1)}'").head().getLong(0) == 1)
    }
  }

  test("DROP + re-CREATE at the same name serves the NEW root, never a stale snapshot") {
    val rA = root("cat_re_a__log")
    val rB = root("cat_re_b__log")
    ManifestTable.append(spark, rA, Seq(("a", 1)).toDF("tag", "n"))
    ManifestTable.append(spark, rB, Seq(("b", 2)).toDF("tag", "n"))
    withTable("cat_re") {
      spark.sql(s"CREATE TABLE cat_re USING `graft.manifest` LOCATION '$rA'")
      assert(spark.sql("SELECT tag FROM cat_re").head().getString(0) == "a")
      spark.sql("DROP TABLE cat_re")
      spark.sql(s"CREATE TABLE cat_re USING `graft.manifest` LOCATION '$rB'")
      assert(spark.sql("SELECT tag FROM cat_re").head().getString(0) == "b")
      // same name, same root, CONTENT changed after destroy/recreate:
      // the fingerprint-keyed relation cache must re-key
      ManifestTable.destroy(spark, rB)
      ManifestTable.append(spark, rB, Seq(("b2", 3)).toDF("tag", "n"))
      assert(spark.sql("SELECT tag FROM cat_re").head().getString(0) == "b2")
    }
  }

  test("temp view shadows a same-named manifest table (standard precedence)") {
    val r = root("cat_shadow__log")
    ManifestTable.append(spark, r, Seq(1).toDF("id"))
    withTable("cat_sh") {
      spark.sql(s"CREATE TABLE cat_sh USING `graft.manifest` LOCATION '$r'")
      Seq(42).toDF("id").createOrReplaceTempView("cat_sh")
      try assert(spark.sql("SELECT id FROM cat_sh").head().getInt(0) == 42)
      finally spark.catalog.dropTempView("cat_sh")
      assert(spark.sql("SELECT id FROM cat_sh").head().getInt(0) == 1)
    }
  }

  test("CTAS with USING graft.manifest commits v1; declared-schema mismatch on a committed root is loud") {
    val r = root("cat_ctas__log")
    withTable("cat_ctas", "cat_mismatch") {
      spark.sql(s"CREATE TABLE cat_ctas USING `graft.manifest` LOCATION '$r' " +
        "AS SELECT 7 AS id, 'x' AS s")
      assert(ManifestTable.versions(spark, r) == Seq(1L))
      assert(spark.sql("SELECT * FROM cat_ctas").collect()
        .map(x => (x.getInt(0), x.getString(1))).toSeq == Seq((7, "x")))
      val e = intercept[Exception] {
        spark.sql("CREATE TABLE cat_mismatch (wrong STRING) " +
          s"USING `graft.manifest` LOCATION '$r'")
      }
      assert(e.getMessage.contains("does not match committed"),
        s"unexpected: ${e.getMessage}")
    }
  }

  test("INSERT by name into a hive-partitioned manifest table rejects loudly") {
    val r = root("cat_part__log")
    ManifestTable.append(spark, r,
      Seq((1, 0), (2, 1)).toDF("id", "k"), partitionBy = Seq("k"))
    withTable("cat_part") {
      spark.sql(s"CREATE TABLE cat_part USING `graft.manifest` LOCATION '$r'")
      assert(spark.sql("SELECT count(1) FROM cat_part").head().getLong(0) == 2)
      val e = intercept[Exception] {
        spark.sql("INSERT INTO cat_part VALUES (3, 2)")
      }
      assert(e.getMessage.contains("hive-partitioned"),
        s"unexpected: ${e.getMessage}")
    }
  }

  test("batch and streaming read/write surfaces resolve catalog table NAMES through the shared resolver") {
    val r = root("cat_stream__log")
    val down = root("cat_stream_down__log")
    withTable("cat_src_t", "cat_down_t") {
      spark.sql(s"CREATE TABLE cat_src_t (id INT, v INT) " +
        s"USING `graft.manifest` LOCATION '$r'")
      spark.sql("INSERT INTO cat_src_t VALUES (1, 10), (2, 20)")
      // batch read by NAME through the datasource option surface
      assert(spark.read.format("graft.manifest").load("cat_src_t").count() == 2)
      // batch write by NAME: one append commit
      Seq((3, 30)).toDF("id", "v").write.format("graft.manifest")
        .mode("append").save("cat_src_t")
      assert(ManifestTable.versions(spark, r).max == 2L)
      // streaming source by NAME -> sink by NAME (log-to-log by names)
      spark.sql(s"CREATE TABLE cat_down_t (id INT, v INT) " +
        s"USING `graft.manifest` LOCATION '$down'")
      spark.sql(s"INSERT INTO cat_down_t VALUES (0, 0)") // born committed
      val cp = java.nio.file.Files.createTempDirectory("cat_stream_cp").toString
      val q = spark.readStream.format("graft.manifest").load("cat_src_t")
        .writeStream.format("graft.manifest")
        .option("checkpointLocation", cp)
        .option("path", "cat_down_t")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000))
      assert(spark.sql("SELECT count(1) FROM cat_down_t").head().getLong(0) == 4)
      // a name that is not in the catalog is loud on the stream face too
      val e = intercept[Exception] {
        spark.readStream.format("graft.manifest").load("cat_nope_t")
      }
      assert(e.getMessage.contains("neither a path"), e.getMessage)
    }
  }

  test("maintenance/history/changes TVFs resolve catalog table NAMES; unknown or non-manifest names are loud") {
    val r = root("cat_tvf__log")
    withTable("cat_tvf", "cat_plain") {
      spark.sql(s"CREATE TABLE cat_tvf (id INT, v INT) " +
        s"USING `graft.manifest` LOCATION '$r'")
      ManifestTable.setRetainVersions(spark, r, 6)
      spark.sql("INSERT INTO cat_tvf VALUES (1, 10), (2, 20)")
      spark.sql("INSERT INTO cat_tvf VALUES (3, 30)")
      spark.sql("UPDATE cat_tvf SET v = 99 WHERE id = 1")
      // history by NAME: append, append, dml
      val kinds = spark.sql("SELECT kind FROM graft_manifest_history('cat_tvf')")
        .collect().map(_.getString(0)).toSeq
      assert(kinds == Seq("append", "append", "dml"), kinds.toString)
      // change feed by NAME: the DML window's pre-image + re-insert
      val chg = spark.sql(
        "SELECT _change_type, id, v FROM graft_manifest_changes('cat_tvf', 2, 3)")
        .collect().map(x => (x.getString(0), x.getInt(1), x.getInt(2))).toSet
      assert(chg == Set(("delete", 1, 10), ("delete", 2, 20),
        ("insert", 1, 99), ("insert", 2, 20)), chg.toString)
      // rowId=true surfaces the _row_id surrogate on the same window
      val chgId = spark.sql(
        "SELECT * FROM graft_manifest_changes('cat_tvf', 2, 3, true)")
      assert(chgId.columns.contains("_row_id"), chgId.columns.toSeq.toString)
      assert(chgId.filter("_change_type = 'delete' AND _row_id IS NOT NULL")
        .count() == 2)
      // maintenance by NAME
      val c = spark.sql("SELECT * FROM graft_manifest_compact('cat_tvf')").collect()
      assert(c.head.getString(0) == "compact")
      assert(spark.sql("SELECT count(1) FROM cat_tvf").head().getLong(0) == 3)
      // loud edges: unknown name; a non-manifest catalog table
      val e1 = intercept[Exception] {
        spark.sql("SELECT * FROM graft_manifest_history('cat_nope')").collect()
      }
      assert(e1.getMessage.contains("neither a path"), e1.getMessage)
      Seq((1, 2)).toDF("a", "b").write.saveAsTable("cat_plain")
      val e2 = intercept[Exception] {
        spark.sql("SELECT * FROM graft_manifest_history('cat_plain')").collect()
      }
      assert(e2.getMessage.contains("not a graft.manifest table"), e2.getMessage)
    }
  }

  test("ALTER TABLE ADD COLUMN(S): additive-evolution commit, old segments NULL-fill, catalog schema synced, edges loud") {
    val r = root("cat_alter__log")
    withTable("cat_alter") {
      spark.sql(s"CREATE TABLE cat_alter (id INT, v DOUBLE) " +
        s"USING `graft.manifest` LOCATION '$r'")
      spark.sql("INSERT INTO cat_alter VALUES (1, 1.0), (2, 2.0)")
      val v1 = ManifestTable.versions(spark, r).max
      val rc = spark.sql(
        "ALTER TABLE cat_alter ADD COLUMNS (note STRING, n INT)").collect()
      assert(rc.map(x => (x.getString(0), x.getInt(1))).toSeq ==
        Seq(("alter", 2)))
      // ONE new log version, an empty 'alter'-tagged marker segment
      assert(ManifestTable.versions(spark, r).max == v1 + 1)
      assert(ManifestTable.segments(spark, r).exists(_.contains("-alter-")))
      // catalog schema synced: DESCRIBE answers the evolved shape
      assert(spark.table("cat_alter").columns.toSeq ==
        Seq("id", "v", "note", "n"))
      assert(spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("cat_alter"))
        .dataSchema.fieldNames.toSeq == Seq("id", "v", "note", "n"))
      // pre-ALTER rows read NULL; post-ALTER INSERT carries values
      spark.sql("INSERT INTO cat_alter VALUES (3, 3.0, 'x', 7)")
      assert(spark.sql(
        "SELECT id, note, n FROM cat_alter ORDER BY id").collect()
        .map(x => (x.getInt(0), x.getString(1),
          if (x.isNullAt(2)) -1 else x.getInt(2))).toSeq ==
        Seq((1, null, -1), (2, null, -1), (3, "x", 7)))
      // old snapshots time-travel to the pre-ALTER schema
      assert(spark.sql(
        s"SELECT * FROM cat_alter VERSION AS OF $v1").columns.toSeq ==
        Seq("id", "v"))
      // DML works across the mixed-schema segments (backfill)
      spark.sql("UPDATE cat_alter SET note = 'old', n = 0 WHERE id < 3")
      assert(spark.sql("SELECT count(note) FROM cat_alter").head().getLong(0) == 3)
      // duplicate column is loud
      val e1 = intercept[Exception] {
        spark.sql("ALTER TABLE cat_alter ADD COLUMNS (v INT)").collect()
      }
      assert(e1.getMessage.contains("already exists"), e1.getMessage)
      // nested adds / positions / defaults reject loudly
      val e2 = intercept[Exception] {
        spark.sql("ALTER TABLE cat_alter ADD COLUMNS (z INT FIRST)").collect()
      }
      assert(e2.getMessage.contains("appends columns at the end"), e2.getMessage)
      val e3 = intercept[Exception] {
        spark.sql("ALTER TABLE cat_alter ADD COLUMNS (z INT DEFAULT 4)").collect()
      }
      assert(e3.getMessage.contains("DEFAULT values are not supported"),
        e3.getMessage)
      // born-empty named table: catalog-only evolution, first INSERT
      // commits v1 with the evolved shape
      val r2 = root("cat_alter_empty__log")
      withTable("cat_alter_e") {
        spark.sql(s"CREATE TABLE cat_alter_e (id INT) " +
          s"USING `graft.manifest` LOCATION '$r2'")
        spark.sql("ALTER TABLE cat_alter_e ADD COLUMN (tag STRING)")
        assert(!ManifestTable.exists(spark, r2),
          "no log commit for a born-empty table")
        spark.sql("INSERT INTO cat_alter_e VALUES (1, 'a')")
        assert(spark.sql("SELECT id, tag FROM cat_alter_e").collect()
          .map(x => (x.getInt(0), x.getString(1))).toSeq == Seq((1, "a")))
      }
      // the PATH face takes the same verb
      spark.sql(s"ALTER TABLE `graft.manifest`.`$r` ADD COLUMN (flag BOOLEAN)")
      assert(spark.table("cat_alter").columns.contains("flag"))
    }
  }

  test("ALTER TABLE DROP COLUMN(S): schema-projection commit, time travel keeps the column, re-add via column mapping, edges loud") {
    val r = root("cat_drop__log")
    withTable("cat_drop") {
      spark.sql(s"CREATE TABLE cat_drop (id INT, v DOUBLE, note STRING) " +
        s"USING `graft.manifest` LOCATION '$r'")
      spark.sql("INSERT INTO cat_drop VALUES (1, 1.0, 'a'), (2, 2.0, 'b')")
      // keep early segments through the DML/compact rewrites below so
      // the pre-drop time travel stays serviceable end to end
      ManifestTable.setRetainVersions(spark, r, 20)
      val preV = ManifestTable.versions(spark, r).max
      val rc = spark.sql("ALTER TABLE cat_drop DROP COLUMN note").collect()
      assert(rc.map(x => (x.getString(0), x.getInt(1))).toSeq ==
        Seq(("alter", 1)))
      // zero data IO: the drop commit names the SAME segments
      assert(ManifestTable.segments(spark, r) ==
        ManifestTable.segmentsAt(spark, r, preV))
      assert(ManifestTable.history(spark, r).last.kind == "alter")
      // head: column gone on every face (name, typed, SQL path)
      assert(spark.table("cat_drop").columns.toSeq == Seq("id", "v"))
      assert(ManifestTable.read(spark, r).columns.toSeq == Seq("id", "v"))
      assert(spark.sql(s"SELECT * FROM `graft.manifest`.`$r`")
        .columns.toSeq == Seq("id", "v"))
      // catalog schema synced
      assert(spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("cat_drop"))
        .dataSchema.fieldNames.toSeq == Seq("id", "v"))
      // pre-drop snapshot still carries it (typed + SQL)
      assert(ManifestTable.readAt(spark, r, preV).columns.contains("note"))
      assert(spark.sql(s"SELECT note FROM cat_drop VERSION AS OF $preV")
        .collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
      // post-drop INSERT coerces against the narrowed schema
      spark.sql("INSERT INTO cat_drop VALUES (3, 3.0)")
      assert(spark.sql("SELECT count(1) FROM cat_drop").head().getLong(0) == 3)
      // the change feed's window sees the post-drop schema
      val head = ManifestTable.versions(spark, r).max
      assert(!ManifestTable.readChanges(spark, r, preV, head)
        .columns.contains("note"))
      // DML across the projection still lands
      spark.sql("UPDATE cat_drop SET v = v * 10 WHERE id = 1")
      assert(spark.sql("SELECT v FROM cat_drop WHERE id = 1")
        .head().getDouble(0) == 10.0)
      // re-ADD of the dropped name WITHOUT any rewrite (r17 column
      // mapping): the new column mints a FRESH physical name bound to
      // the logical name by a #colmap entry committed atomically with
      // the schema marker — the old bytes still in unrewritten
      // segments can never resurface
      spark.sql("ALTER TABLE cat_drop ADD COLUMN (note STRING)").collect()
      assert(spark.table("cat_drop").columns.contains("note"))
      assert(spark.sql("SELECT count(note) FROM cat_drop").head()
        .getLong(0) == 0, "re-added column starts NULL — never the old values")
      assert(ManifestTable.columnMapping(spark, r).exists(_._2 == "note"),
        "re-add must ride a fresh-physical #colmap entry")
      assert(ManifestTable.droppedCols(spark, r).nonEmpty,
        "the old physical name stays tombstoned until a rewrite")
      // old snapshot still time-travels the ORIGINAL values
      assert(spark.sql(s"SELECT note FROM cat_drop VERSION AS OF $preV")
        .collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
      // writes land under the fresh physical name, reads surface logical
      spark.sql("INSERT INTO cat_drop VALUES (4, 4.0, 'fresh')")
      assert(spark.sql("SELECT note FROM cat_drop WHERE id = 4")
        .head().getString(0) == "fresh")
      assert(spark.sql("SELECT count(note) FROM cat_drop").head()
        .getLong(0) == 1)
      val freshPhys = ManifestTable.columnMapping(spark, r)
        .find(_._2 == "note").get._1
      assert(freshPhys != "note", s"fresh physical name, got $freshPhys")
      assert(ManifestTable.segmentMetas(spark, r).values.exists(
        _.schema.exists(_.fieldNames.contains(freshPhys))),
        "the new segment must physically carry the fresh name")
      // compact converges physical names back to logical: tombstones
      // AND mapping retire, values survive
      ManifestTable.compact(spark, r)
      val metas = ManifestTable.segmentMetas(spark, r)
      val segs = ManifestTable.segments(spark, r)
      assert(segs.forall(s => metas.get(s).flatMap(_.schema)
        .forall(st => st.fieldNames.contains("note") &&
          !st.fieldNames.contains(freshPhys))),
        "a full rewrite must converge the fresh physical name to logical")
      assert(ManifestTable.droppedCols(spark, r).isEmpty,
        "a full rewrite must retire the drop tombstones")
      assert(ManifestTable.columnMapping(spark, r).isEmpty,
        "a full rewrite must clear the column mapping")
      assert(spark.sql("SELECT note FROM cat_drop WHERE id = 4")
        .head().getString(0) == "fresh")
      // edges: unknown column loud; IF EXISTS skips; last column loud
      val e1 = intercept[Exception] {
        spark.sql("ALTER TABLE cat_drop DROP COLUMN nope").collect()
      }
      assert(e1.getMessage.contains("does not exist"), e1.getMessage)
      val rcIf = spark.sql(
        "ALTER TABLE cat_drop DROP COLUMNS IF EXISTS (nope)").collect()
      assert(rcIf.map(x => (x.getString(0), x.getInt(1))).toSeq ==
        Seq(("alter", 0)))
      val e2 = intercept[Exception] {
        spark.sql("ALTER TABLE cat_drop DROP COLUMNS (id, v, note)").collect()
      }
      assert(e2.getMessage.contains("cannot DROP every column"), e2.getMessage)
    }
  }

  test("ALTER TABLE RENAME COLUMN: one mapping commit, physical names constant, both faces, time travel, DML, rewrite convergence") {
    val r = root("cat_ren__log")
    withTable("cat_ren") {
      spark.sql(s"CREATE TABLE cat_ren (id INT, v FLOAT) " +
        s"USING `graft.manifest` LOCATION '$r'")
      spark.sql("INSERT INTO cat_ren VALUES (1, CAST(1.5 AS FLOAT)), " +
        "(2, CAST(2.5 AS FLOAT))")
      val preV = ManifestTable.versions(spark, r).max
      val rc = spark.sql("ALTER TABLE cat_ren RENAME COLUMN v TO score")
        .collect()
      assert(rc.map(x => (x.getString(0), x.getString(1))).toSeq ==
        Seq(("alter", "v->score")))
      // zero data IO: the rename commit names the SAME segments
      assert(ManifestTable.segments(spark, r) ==
        ManifestTable.segmentsAt(spark, r, preV))
      assert(ManifestTable.history(spark, r).last.kind == "alter")
      // every face surfaces the new logical name with the old values
      assert(spark.table("cat_ren").columns.toSeq == Seq("id", "score"))
      assert(ManifestTable.read(spark, r).columns.toSeq == Seq("id", "score"))
      assert(spark.sql(s"SELECT * FROM `graft.manifest`.`$r`")
        .columns.toSeq == Seq("id", "score"))
      assert(spark.sql("SELECT score FROM cat_ren WHERE id = 2")
        .head().getFloat(0) == 2.5f)
      // pushed filter on the renamed column still answers right
      assert(spark.sql("SELECT id FROM cat_ren WHERE score > 2.0")
        .collect().map(_.getInt(0)).toSeq == Seq(2))
      // catalog schema synced
      assert(spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("cat_ren"))
        .dataSchema.fieldNames.toSeq == Seq("id", "score"))
      // pre-rename snapshot time-travels the OLD name
      assert(spark.sql(s"SELECT v FROM cat_ren VERSION AS OF $preV")
        .collect().map(_.getFloat(0)).sorted.toSeq == Seq(1.5f, 2.5f))
      // INSERT speaks the new logical surface; the segment physically
      // stores the CONSTANT old name (that's what keeps the SQL scan
      // homogeneous)
      spark.sql("INSERT INTO cat_ren VALUES (3, CAST(3.5 AS FLOAT))")
      assert(spark.sql("SELECT score FROM cat_ren WHERE id = 3")
        .head().getFloat(0) == 3.5f)
      val newSeg = ManifestTable.segments(spark, r)
        .filterNot(ManifestTable.segmentsAt(spark, r, preV).toSet).head
      assert(ManifestTable.segmentMetas(spark, r)(newSeg)
        .schema.get.fieldNames.toSeq == Seq("id", "v"),
        "post-rename segments keep the constant physical name")
      // DML through the mapping (typed cond speaks logical names)
      val upd = spark.sql(
        "UPDATE cat_ren SET score = score + 10 WHERE id = 1").collect()
      assert(upd.head.getLong(2) == 1L, upd.toSeq.toString)
      assert(spark.sql("SELECT score FROM cat_ren WHERE id = 1")
        .head().getFloat(0) == 11.5f)
      // widening a RENAMED column: the marker rides the physical name
      spark.sql("ALTER TABLE cat_ren ALTER COLUMN score TYPE DOUBLE")
      assert(spark.table("cat_ren").schema("score").dataType ==
        org.apache.spark.sql.types.DoubleType)
      spark.sql("INSERT INTO cat_ren VALUES (4, 4.5)")
      assert(spark.sql(
        "SELECT cast(sum(score) AS double) FROM cat_ren").head().getDouble(0)
        == (11.5 + 2.5 + 3.5 + 4.5))
      // chained rename on the PATH face: still one mapping entry
      spark.sql(s"ALTER TABLE `graft.manifest`.`$r` " +
        "RENAME COLUMN score TO score2")
      assert(spark.sql("SELECT score2 FROM cat_ren WHERE id = 4")
        .head().getDouble(0) == 4.5)
      assert(ManifestTable.columnMapping(spark, r) == Seq(("v", "score2")))
      // edges: unknown / collision / physical-name shadowing all loud
      val e1 = intercept[Exception] {
        spark.sql("ALTER TABLE cat_ren RENAME COLUMN nope TO x").collect() }
      assert(e1.getMessage.contains("does not exist"), e1.getMessage)
      val e2 = intercept[Exception] {
        spark.sql("ALTER TABLE cat_ren RENAME COLUMN id TO score2").collect() }
      assert(e2.getMessage.contains("already exists"), e2.getMessage)
      val e3 = intercept[Exception] {
        spark.sql("ALTER TABLE cat_ren RENAME COLUMN id TO v").collect() }
      assert(e3.getMessage.contains("PHYSICAL"), e3.getMessage)
      // full rewrite converges physical to logical and clears the map
      ManifestTable.compact(spark, r)
      assert(ManifestTable.columnMapping(spark, r).isEmpty)
      assert(ManifestTable.segmentMetas(spark, r).values.forall(
        _.schema.forall(_.fieldNames.toSeq == Seq("id", "score2"))))
      assert(spark.sql("SELECT score2 FROM cat_ren WHERE id = 1")
        .head().getDouble(0) == 11.5)
    }
  }

  test("ALTER TABLE RENAME TO: the catalog name moves, every face follows it, the old name is loud") {
    val r = root("cat_tren__log")
    withTable("cat_tren", "cat_tren2") {
      spark.sql(s"CREATE TABLE cat_tren (id INT, v DOUBLE) " +
        s"USING `graft.manifest` LOCATION '$r'")
      spark.sql("INSERT INTO cat_tren VALUES (1, 1.0), (2, 2.0)")
      spark.sql("ALTER TABLE cat_tren RENAME TO cat_tren2")
      // reads, inserts and row-level DML all follow the new name; the
      // EXTERNAL location (the log root) is untouched
      assert(spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("cat_tren2"))
        .location.toString.endsWith("cat_tren__log"))
      assert(spark.sql("SELECT count(1) FROM cat_tren2").head().getLong(0) == 2)
      spark.sql("INSERT INTO cat_tren2 VALUES (3, 3.0)")
      val upd = spark.sql(
        "UPDATE cat_tren2 SET v = v * 10 WHERE id = 1").collect()
      assert(upd.head.getLong(2) == 1L, upd.toSeq.toString)
      assert(spark.sql("SELECT v FROM cat_tren2 WHERE id = 1")
        .head().getDouble(0) == 10.0)
      // name-addressed TVF surfaces resolve the new name too
      assert(spark.sql("SELECT count(1) FROM graft_manifest_history('cat_tren2')")
        .head().getLong(0) >= 3)
      // the old name is gone, loudly
      val e = intercept[Exception] {
        spark.sql("SELECT * FROM cat_tren").collect() }
      assert(e.getMessage.contains("cat_tren"), e.getMessage)
    }
    // MANAGED manifest table (CTAS, no LOCATION): rename moves the
    // catalog entry AND the managed directory — the manifest log is
    // location-relative (segment-relative paths), so it survives the
    // move intact
    withTable("cat_trenm", "cat_trenm2") {
      spark.sql("DROP TABLE IF EXISTS cat_trenm2")
      graft.io.Load.dropManaged(spark, "cat_trenm")
      graft.io.Load.dropManaged(spark, "cat_trenm2")
      spark.sql("CREATE TABLE cat_trenm USING `graft.manifest` " +
        "AS SELECT 1 AS id, CAST(10.0 AS DOUBLE) AS v")
      spark.sql("ALTER TABLE cat_trenm RENAME TO cat_trenm2")
      assert(spark.sql("SELECT v FROM cat_trenm2 WHERE id = 1")
        .head().getDouble(0) == 10.0)
      spark.sql("INSERT INTO cat_trenm2 VALUES (2, 20.0)")
      assert(spark.sql("SELECT count(1) FROM cat_trenm2").head().getLong(0) == 2)
    }
  }

  test("ALTER COLUMN TYPE: safe widening via marker segment, mixed segments upcast on every face, narrowing loud") {
    val r = root("cat_wide__log")
    withTable("cat_wide") {
      spark.sql(s"CREATE TABLE cat_wide (id INT, n INT, d DECIMAL(10,2)) " +
        s"USING `graft.manifest` LOCATION '$r'")
      spark.sql("INSERT INTO cat_wide VALUES (1, 10, 12.34), (2, 20, 56.78)")
      val preV = ManifestTable.versions(spark, r).max
      val rc = spark.sql("ALTER TABLE cat_wide ALTER COLUMN n TYPE BIGINT")
        .collect()
      assert(rc.map(x => (x.getString(0), x.getString(1))).toSeq ==
        Seq(("alter", "n:bigint")))
      // the data segments are untouched; one empty marker carries the
      // widened schema
      assert(ManifestTable.segmentsAt(spark, r, preV).forall(
        ManifestTable.segments(spark, r).contains))
      // widened on every face
      assert(spark.table("cat_wide").schema("n").dataType ==
        org.apache.spark.sql.types.LongType)
      assert(ManifestTable.read(spark, r).schema("n").dataType ==
        org.apache.spark.sql.types.LongType)
      assert(spark.sql(s"SELECT * FROM `graft.manifest`.`$r`")
        .schema("n").dataType == org.apache.spark.sql.types.LongType)
      // a value only bigint can hold lands next to int32 segments and
      // BOTH read back through one scan (vectorized upcast)
      spark.sql("INSERT INTO cat_wide VALUES (3, 5000000000, 99.99)")
      assert(spark.sql("SELECT sum(n) FROM cat_wide").head().getLong(0) ==
        10L + 20L + 5000000000L)
      assert(ManifestTable.read(spark, r)
        .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0) ==
        5000000030L)
      // decimal precision growth too
      spark.sql("ALTER TABLE cat_wide ALTER COLUMN d TYPE DECIMAL(14,4)")
      spark.sql("INSERT INTO cat_wide VALUES (4, 1, 123456789.1234)")
      assert(spark.sql("SELECT cast(sum(d) AS string) FROM cat_wide")
        .head().getString(0) == "123456958.2334")
      // time travel reads the NARROW type
      assert(spark.sql(s"SELECT * FROM cat_wide VERSION AS OF $preV")
        .schema("n").dataType == org.apache.spark.sql.types.IntegerType)
      // DML across mixed-width segments conforms to the wide schema
      spark.sql("UPDATE cat_wide SET n = n + 1 WHERE id = 1")
      assert(spark.sql("SELECT n FROM cat_wide WHERE id = 1")
        .head().getLong(0) == 11L)
      // narrowing and cross-family changes reject loudly
      val e1 = intercept[Exception] {
        spark.sql("ALTER TABLE cat_wide ALTER COLUMN n TYPE INT").collect() }
      assert(e1.getMessage.contains("SAFE WIDENING"), e1.getMessage)
      val e2 = intercept[Exception] {
        spark.sql("ALTER TABLE cat_wide ALTER COLUMN d TYPE STRING").collect() }
      assert(e2.getMessage.contains("SAFE WIDENING"), e2.getMessage)
    }
  }
}
