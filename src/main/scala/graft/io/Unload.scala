package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}
import graft.core.StageError

/** EXTRACT operator: query → files (and optional single-file export).
  *
  * Reference pipeline `unload_and_copy`: warehouse `UNLOAD ('query') TO
  * s3` writes ≤6.2 GB shards → list generated files via stl_unload_log →
  * download → optional single CSV with a header row prepended
  * (reference: locopy/redshift.py:349-441; Snowflake `COPY INTO @stage`
  * locopy/snowflake.py:339-410). Spark equivalents:
  *
  *   - UNLOAD          → `spark.sql(query).write.format(...).save(path)`
  *                       (one shard per task — the warehouse's parallel
  *                       unload is Spark's default behavior)
  *   - PARALLEL OFF    → `coalesce(1)` (reference flag
  *                       locopy/redshift.py:393-395)
  *   - stl_unload_log  → the write's own part-* manifest, enumerated via
  *                       FileSystem.listStatus (locopy/redshift.py:508-530)
  *   - header + concat → `option("header", true)` on the coalesced write
  *                       (locopy/redshift.py:434-437)
  *   - `WHERE 1=0` column probe → `df.schema` — Catalyst analyzes
  *                       without executing (locopy/redshift.py:482-506)
  */
object Unload {

  /** Run `query` and write results to `path`. Returns the produced data
    * files (the stl_unload_log parity). */
  def unload(
      spark: SparkSession,
      query: String,
      path: String,
      fileType: String = "csv",
      delimiter: String = "|",
      header: Boolean = false,
      compression: Option[String] = None,
      parallelOff: Boolean = false,
      partitionBy: Seq[String] = Nil
  ): Seq[String] = {
    val fmt = Options.formatOf(fileType)
    val df0 = spark.sql(query)
    val df = if (parallelOff) df0.coalesce(1) else df0
    var w = df.write.mode("overwrite").format(fmt.spark)
    if (fmt == Options.Csv) w = w.option("sep", delimiter).option("header", header.toString)
    compression.foreach(c => w = w.option("compression", c))
    // UNLOAD ... PARTITION BY parity (redshift supports hive-style
    // key=value output dirs; so does Spark's partitionBy)
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.save(path)
    generatedFiles(spark, path, recursive = partitionBy.nonEmpty)
  }

  /** Enumerate the data files a write produced (reference queries
    * stl_unload_log, locopy/redshift.py:508-530). */
  def generatedFiles(spark: SparkSession, path: String,
                     recursive: Boolean = false): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) throw new StageError(s"unload path does not exist: $path")
    def visible(n: String) = !n.startsWith("_") && !n.startsWith(".")
    def walk(dir: Path): Seq[String] = fs.listStatus(dir).toSeq.flatMap { s =>
      if (s.isFile && visible(s.getPath.getName)) Seq(s.getPath.toString)
      else if (s.isDirectory && recursive && visible(s.getPath.getName)) walk(s.getPath)
      else Nil
    }
    walk(p).sorted
  }

  /** Range-partitioned sorted export — the data-skipping write posture
    * for 100 TB reads: `repartitionByRange(numFiles, sortCol)` +
    * `sortWithinPartitions(sortCol)` gives globally range-clustered
    * files whose parquet footer min/max stats are DISJOINT on the sort
    * column, so a later `WHERE sortCol BETWEEN …` scan prunes whole
    * files instead of reading and filtering them (the SORTKEY analog of
    * the reference's DISTKEY → bucketBy mapping; Redshift `UNLOAD` has
    * no ORDER guarantee, this is strictly better). Range boundaries
    * come from Spark's reservoir sampling — file CONTENTS (which file a
    * row lands in) are not run-deterministic, but the row SET and the
    * per-file disjointness invariant are; verify content by read-back,
    * disjointness by footer stats (IoSpec). */
  def sortedUnload(
      spark: SparkSession,
      df: DataFrame,
      path: String,
      sortCol: String,
      numFiles: Int
  ): Seq[String] = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.repartitionByRange(numFiles, org.apache.spark.sql.functions.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)
    generatedFiles(spark, path)
  }

  /** Column names of an arbitrary query WITHOUT executing it — the
    * reference's `SELECT * FROM (q) WHERE 1=0` trick
    * (locopy/redshift.py:482-506) is exactly Catalyst analysis. */
  def columnNames(spark: SparkSession, query: String): Seq[String] =
    spark.sql(query).schema.fieldNames.toSeq.map(_.toLowerCase)

  /** Full unload_and_copy parity: unload + single-file export with
    * header. The reference downloads shards then byte-concats with a
    * written header row (locopy/redshift.py:434-437); we produce the
    * identical artifact with a deterministic coalesce(1) write + rename
    * (SURVEY §7.4 "single-file export exactness"). */
  def unloadAndCopy(
      spark: SparkSession,
      query: String,
      rawPath: String,
      exportPath: Option[String] = None,
      delimiter: String = "|",
      fileType: String = "csv"
  ): Seq[String] = {
    val files = unload(spark, query, rawPath, fileType, delimiter,
      header = false, parallelOff = false)
    exportPath.foreach { out =>
      val tmp = rawPath.stripSuffix("/") + "__export"
      unload(spark, query, tmp, fileType, delimiter, header = true, parallelOff = true)
      val one = generatedFiles(spark, tmp) match {
        case Seq(f) => f
        case other  => throw new StageError(s"expected 1 export file, got ${other.size}")
      }
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new Path(one).getFileSystem(conf)
      val dst = new Path(out)
      fs.mkdirs(dst.getParent)
      if (fs.exists(dst)) fs.delete(dst, false)
      if (!fs.rename(new Path(one), dst))
        throw new StageError(s"rename $one -> $out failed")
      fs.delete(new Path(tmp), true)
    }
    files
  }
}
