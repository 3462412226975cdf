package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.OptionError
import graft.io.{Load, LocalFiles, Options, ProgressPercentage, Stage, Unload}

/** Load/Unload/Stage façade specs — mirrors the reference's unit +
  * golden-file tiers (tests/test_redshift.py, tests/test_utility.py,
  * tests/test_s3.py in /root/reference). */
class IoSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def tmp(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_test", name)
    org.apache.hadoop.fs.FileUtil.fullyDelete(p.toFile)
    Files.createDirectories(p.getParent)
    p.toString
  }

  test("option vocabulary translates; unknown option raises OptionError (reference ValueError parity)") {
    val m = Options.translateRead(Options.Csv, Map("DELIMITER" -> "|", "SKIP_HEADER" -> "1"))
    assert(m("sep") == "|")
    intercept[OptionError] {
      Options.translateRead(Options.Csv, Map("bogus_option" -> "1"))
    }
    intercept[OptionError] { Options.formatOf("avro") }
  }

  test("IGNOREHEADER parsing incl. duplicate error (reference utility.py:511-537)") {
    assert(Options.ignoreHeaderNumber(Seq("IGNOREHEADER 2")) == Some(2))
    assert(Options.ignoreHeaderNumber(Seq("ignoreheader AS 1")) == Some(1))
    assert(Options.ignoreHeaderNumber(Seq("GZIP")) == None)
    intercept[OptionError] {
      Options.ignoreHeaderNumber(Seq("IGNOREHEADER 1", "IGNOREHEADER AS 2"))
    }
  }

  test("csv load with pipe delim + gzip + header + inference roundtrips utf-8") {
    // UTF-8 fixture shaped like the reference's mock_file.txt (iš/liné)
    val dir = tmp("utf8_csv")
    val src = Paths.get(dir + ".src")
    Files.writeString(src, "id|name\n1|iš\n2|liné\n3|lïne\n")
    val gz = LocalFiles.compressFile(src.toString, dir + ".csv.gz", removeOriginal = true)
    val df = Load.read(spark, gz, "csv", Map("delimiter" -> "|"), header = true)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(df.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(rows(0).getString(1) == "iš")
  }

  test("loadAndCopy writes a catalog table (COPY parity)") {
    val out = tmp("nation_csv_dir")
    spark.read.parquet(s"${TestSession.sf}/nation.parquet")
      .write.mode("overwrite").option("sep", "|").option("header", "true").csv(out)
    spark.sql("DROP TABLE IF EXISTS t_nation_loaded")
    val tdf = Load.loadAndCopy(spark, out, "t_nation_loaded",
      options = Map("delimiter" -> "|"), header = true,
      mode = org.apache.spark.sql.SaveMode.Overwrite)
    assert(tdf.count() == 25)
    assert(spark.table("t_nation_loaded").schema("n_nationkey").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("loadAndCopy drift gate: reject raises before writing, evolve widens additively") {
    import spark.implicits._
    val base = tmp("drift_base_csv")
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
      .write.mode("overwrite").option("header", "true").csv(base)
    Load.dropManaged(spark, "t_drift_gate")
    Load.loadAndCopy(spark, base, "t_drift_gate", header = true,
      mode = org.apache.spark.sql.SaveMode.Overwrite)
    // drifted file: column v removed, column extra added
    val drifted = tmp("drift_new_csv")
    Seq((3L, "c", 99L), (4L, "d", 100L)).toDF("k", "s", "extra")
      .write.mode("overwrite").option("header", "true").csv(drifted)
    // (1) reject: raises SchemaDriftError and writes NOTHING
    val e = intercept[graft.core.SchemaDriftError] {
      Load.loadAndCopy(spark, drifted, "t_drift_gate", header = true,
        onDrift = Load.DriftReject)
    }
    assert(e.getMessage.contains("extra") && e.getMessage.contains("v"),
      e.getMessage)
    assert(spark.table("t_drift_gate").count() == 2, "reject must not write")
    // (2) evolve: widens the table with `extra`, fills missing `v` with nulls
    val evolved = Load.loadAndCopy(spark, drifted, "t_drift_gate", header = true,
      onDrift = Load.DriftEvolve)
    assert(evolved.columns.sorted.toSeq == Seq("extra", "k", "s", "v"),
      evolved.columns.mkString(","))
    val rows = evolved.orderBy("k").collect()
    assert(rows.length == 4)
    assert(rows(0).isNullAt(rows(0).fieldIndex("extra")), "old rows: extra is null")
    assert(rows(2).isNullAt(rows(2).fieldIndex("v")), "new rows: v is null")
    assert(rows(2).getAs[Number]("extra").longValue() == 99L)
    // (3) unchanged schema appends clean through the same gate
    Load.loadAndCopy(spark, drifted, "t_drift_gate", header = true,
      onDrift = Load.DriftEvolve)
    assert(spark.table("t_drift_gate").count() == 6)
    Load.dropManaged(spark, "t_drift_gate")
  }

  test("drift evolve preserves an existing table's bucketing and recovers a stranded stage") {
    import spark.implicits._
    val base = tmp("drift_bkt_csv")
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
      .write.mode("overwrite").option("header", "true").csv(base)
    Load.dropManaged(spark, "t_drift_bkt")
    Load.loadAndCopy(spark, base, "t_drift_bkt", header = true,
      mode = org.apache.spark.sql.SaveMode.Overwrite,
      distKey = Some("k"), buckets = 4)
    val drifted = tmp("drift_bkt_new_csv")
    Seq((3L, "c", 30.0, 7L)).toDF("k", "s", "v", "extra")
      .write.mode("overwrite").option("header", "true").csv(drifted)
    // evolve WITHOUT re-specifying the layout: the rewrite must keep
    // the bucketed+sorted spec, not silently flatten it
    Load.loadAndCopy(spark, drifted, "t_drift_bkt", header = true,
      onDrift = Load.DriftEvolve)
    val desc = spark.sql("DESCRIBE EXTENDED t_drift_bkt").collect()
      .map(r => s"${r.getString(0)}: ${Option(r.getString(1)).getOrElse("")}")
      .mkString("\n")
    assert(desc.contains("Num Buckets: 4") && desc.contains("k"), desc)
    assert(spark.table("t_drift_bkt").count() == 3)
    // stranded-stage recovery: simulate a crash between drop and rename
    spark.sql("ALTER TABLE t_drift_bkt RENAME TO t_drift_bkt__evolve_stage")
    val again = tmp("drift_bkt_more_csv")
    Seq((4L, "d", 40.0, 8L)).toDF("k", "s", "v", "extra")
      .write.mode("overwrite").option("header", "true").csv(again)
    Load.loadAndCopy(spark, again, "t_drift_bkt", header = true,
      onDrift = Load.DriftEvolve)
    assert(spark.table("t_drift_bkt").count() == 4,
      "history must be recovered from the stranded stage, not recreated")
    Load.dropManaged(spark, "t_drift_bkt")
    Load.dropManaged(spark, "t_drift_bkt__evolve_stage")
  }

  test("distKey creates a bucketed+sorted catalog table (DISTKEY parity)") {
    val out = tmp("supplier_csv_dir")
    spark.read.parquet(s"${TestSession.sf}/supplier.parquet")
      .write.mode("overwrite").option("sep", "|").option("header", "true").csv(out)
    Load.dropManaged(spark, "t_supplier_bucketed")
    val tdf = Load.loadAndCopy(spark, out, "t_supplier_bucketed",
      options = Map("delimiter" -> "|"), header = true,
      mode = org.apache.spark.sql.SaveMode.Overwrite,
      distKey = Some("s_suppkey"), buckets = 4)
    assert(tdf.count() ==
      spark.read.parquet(s"${TestSession.sf}/supplier.parquet").count())
    val desc = spark.sql("DESCRIBE EXTENDED t_supplier_bucketed").collect()
      .map(r => s"${r.getString(0)}: ${Option(r.getString(1)).getOrElse("")}")
      .mkString("\n")
    assert(desc.contains("Num Buckets: 4"), desc)
    assert(desc.contains("Bucket Columns") && desc.contains("s_suppkey"), desc)
    assert(desc.contains("Sort Columns"), desc)
    Load.dropManaged(spark, "t_supplier_bucketed")
  }

  test("unload writes shards, lists generated files, single-file export has header (UNLOAD parity)") {
    spark.read.parquet(s"${TestSession.sf}/region.parquet").createOrReplaceTempView("region_v")
    val raw = tmp("region_unload")
    val exportPath = tmp("region_export") + "/region.csv"
    val files = Unload.unloadAndCopy(spark,
      "SELECT r_regionkey, r_name FROM region_v ORDER BY r_regionkey",
      raw, Some(exportPath), delimiter = "|")
    assert(files.nonEmpty)
    val lines = Files.readAllLines(Paths.get(exportPath))
    assert(lines.get(0) == "r_regionkey|r_name")
    assert(lines.size() == 6) // header + 5 regions
  }

  test("partitioned unload writes hive-style dirs and lists files recursively") {
    spark.read.parquet(s"${TestSession.sf}/nation.parquet").createOrReplaceTempView("nation_v")
    val out = tmp("nation_part_unload")
    val files = Unload.unload(spark,
      "SELECT n_nationkey, n_name, n_regionkey FROM nation_v",
      out, fileType = "parquet", partitionBy = Seq("n_regionkey"))
    assert(files.nonEmpty)
    // every data file sits under a key=value partition dir
    assert(files.forall(_.contains("n_regionkey=")), files.take(3).mkString(","))
    // the hop is lossless through partition discovery
    val back = spark.read.parquet(out)
    assert(back.count() == 25)
    assert(back.columns.toSet == Set("n_nationkey", "n_name", "n_regionkey"))
  }

  test("sortedUnload produces range-disjoint files covering all rows (data skipping)") {
    import org.apache.spark.sql.functions._
    val out = tmp("orders_sorted_spec")
    val orders = spark.read.parquet(s"${TestSession.sf}/orders.parquet")
      .select("o_orderkey", "o_orderdate")
    val files = Unload.sortedUnload(spark, orders, out, "o_orderdate", numFiles = 4)
    assert(files.size <= 4 && files.nonEmpty)
    // per-file footer-equivalent stats: disjoint min/max ranges on the
    // sort column (equal keys colocate under range partitioning, so
    // consecutive ranges must be STRICTLY separated), counts sum to all
    val stats = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_orderdate").as("lo"), max("o_orderdate").as("hi"),
        count(lit(1)).as("n"))
      .orderBy("lo")
      .collect()
    assert(stats.map(_.getLong(3)).sum == orders.count())
    // o_orderdate reads as TIMESTAMP_NTZ → java.time.LocalDateTime
    stats.sliding(2).foreach {
      case Array(prev, next) =>
        val prevHi = prev.getAs[java.time.LocalDateTime](2)
        val nextLo = next.getAs[java.time.LocalDateTime](1)
        assert(nextLo.isAfter(prevHi), s"file ranges overlap: $prevHi vs $nextLo")
      case _ => ()
    }
  }

  test("columnNames probes schema without executing (WHERE 1=0 parity)") {
    spark.read.parquet(s"${TestSession.sf}/region.parquet").createOrReplaceTempView("region_v")
    assert(Unload.columnNames(spark, "SELECT r_regionkey AS K, r_name FROM region_v") ==
      Seq("k", "r_name"))
  }

  test("split_file round-robins lines and skips header (reference utility.py:123-189)") {
    val in = tmp("split_in.txt")
    Files.writeString(Paths.get(in), "hdr\na\nb\nc\nd\ne\n")
    val parts = LocalFiles.splitFile(in, tmp("split_out"), splits = 2, ignoreHeader = 1)
    assert(parts.size == 2)
    val p0 = Files.readAllLines(Paths.get(parts(0)))
    val p1 = Files.readAllLines(Paths.get(parts(1)))
    assert(p0.toString == "[a, c, e]" && p1.toString == "[b, d]")
  }

  test("compress + concatenate roundtrip (reference cat_*.txt golden test)") {
    val a = tmp("cat_a.txt"); val b = tmp("cat_b.txt")
    Files.writeString(Paths.get(a), "one\n")
    Files.writeString(Paths.get(b), "two\n")
    val out = tmp("cat_out.txt")
    LocalFiles.concatenateFiles(Seq(a, b), out)
    assert(Files.readString(Paths.get(out)) == "one\ntwo\n")
    assert(!Files.exists(Paths.get(a))) // inputs removed as reference does
  }

  test("split -> gzip shards -> concatenate is a valid multi-member gzip of all rows") {
    // the reference's full load path: round-robin split, per-shard
    // gzip, shard concatenation (gzip members concatenate into one
    // valid stream) — the golden asserts the final .gz decompresses
    // to exactly the original rows in round-robin order
    val in = tmp("gzsplit_in.txt")
    Files.writeString(Paths.get(in), "hdr\na\nb\nc\nd\ne\n")
    val parts = LocalFiles.splitFile(in, tmp("gzsplit_out"), splits = 2, ignoreHeader = 1)
    val gzs = LocalFiles.compressFileList(parts)
    assert(gzs.forall(_.endsWith(".gz")) && parts.forall(p => !Files.exists(Paths.get(p))))
    val cat = tmp("gzsplit_cat.gz")
    LocalFiles.concatenateFiles(gzs, cat)
    val inStream = new java.util.zip.GZIPInputStream(
      new java.io.FileInputStream(cat))
    val text = new String(inStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    inStream.close()
    assert(text == "a\nc\ne\nb\nd\n", text)
    // and Spark reads the multi-member gzip transparently (the COPY
    // ingestion contract the reference relies on)
    val rows = spark.read.text(cat).collect().map(_.getString(0)).sorted.toSeq
    assert(rows == Seq("a", "b", "c", "d", "e"), rows.toString)
  }

  test("stage put/list/get/delete on local filesystem (S3/stage parity)") {
    val stage = new Stage(spark)
    val local = tmp("stage_src.txt")
    Files.writeString(Paths.get(local), "payload")
    val stageDir = "file://" + tmp("stage_dir")
    val uploaded = stage.putList(Seq(local), stageDir)
    assert(stage.list(stageDir).size == 1)
    val back = tmp("stage_back.txt")
    stage.get(uploaded.head, back)
    assert(Files.readString(Paths.get(back)) == "payload")
    stage.deleteList(uploaded)
    assert(stage.list(stageDir).isEmpty)
    assert(stage.parseUrl("s3://bucket/key/path.txt") == ("bucket", "key/path.txt"))
  }

  test("zorderWrite: disjoint per-file z-ranges and two-column min/max locality") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"${TestSession.sf}/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val out = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    graft.io.Layout.zorderWrite(li, "l_partkey", "l_suppkey", out, numFiles = 8)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length == 8, files.length.toString)
    def stats(p: String) = spark.read.parquet(p)
      .select(
        min(graft.functions.zInterleave2(col("l_partkey"), col("l_suppkey"))),
        max(graft.functions.zInterleave2(col("l_partkey"), col("l_suppkey"))),
        min("l_partkey"), max("l_partkey")).head()
    val st = files.map(stats)
    // range partitioning on z makes per-file z-intervals disjoint
    val zr = st.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    zr.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 < b._1, s"z ranges overlap: $a vs $b")
    }
    // locality: files cover narrower l_partkey spans than the table
    val globalSpan = li.agg(max("l_partkey").cast("long") - min("l_partkey").cast("long"))
      .head().getLong(0)
    val spans = st.map(r => r.getAs[Number](3).longValue() - r.getAs[Number](2).longValue())
    assert(spans.count(_ < globalSpan / 2) >= 4,
      s"z-clustering should narrow most files' partkey span: $spans vs global $globalSpan")
    // content preserved
    assert(spark.read.parquet(out).count() == li.count())
  }

  test("ProgressPercentage renders the reference transfer bar and reaches 100%") {
    val local = tmp("progress_src.bin")
    Files.write(Paths.get(local), Array.fill[Byte](1 << 17)(7)) // 128 KiB -> 2 chunks
    val bos = new java.io.ByteArrayOutputStream()
    val cb = new ProgressPercentage(local, new java.io.PrintStream(bos, true, "UTF-8"))
    val stage = new Stage(spark)
    val dstDir = "file://" + tmp("progress_dst")
    stage.put(local, dstDir + "/out.bin", progress = Some(cb))
    assert(math.abs(cb.percentage - 100.0) < 1e-9)
    val bar = bos.toString("UTF-8")
    assert(bar.contains("Transfering [##########] 100.00%"), bar) // reference format
    assert(stage.list(dstDir).size == 1)
  }
}
