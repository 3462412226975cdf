package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the maintenance operator every long-lived
  * lake table needs: streaming sinks, per-partition appends and
  * over-parallel writers leave directories of KB-sized parquet files
  * whose open/footer overhead dominates scan time at scale (a 100 TB
  * table in 4 MB files is 25M footer reads before the first row).
  *
  * Reference analog: none (SURVEY §2 — locopy delegates storage layout
  * to the warehouse); pipeline necessity: universal.
  */
object Compact {

  /** Result of one compaction pass (file counts + byte totals are the
    * operational telemetry a maintenance job logs). */
  final case class CompactStats(filesIn: Long, bytesIn: Long, filesOut: Long)

  /** Rewrite parquet directory `inDir` into `outDir` as
    * `ceil(bytes/targetFileBytes)` files (≥ 1). Content-preserving by
    * construction — same rows, fewer files; gate equality with an
    * order-independent [[graft.ext.Profile.tableChecksum]], never a
    * row-order compare (row order across files is not part of any
    * parquet contract).
    *
    * Scale shape: the directory listing is one namenode RPC per
    * partition dir (driver-side metadata, no data motion); the rewrite
    * is one distributed scan into a round-robin repartition — a single
    * all-to-all of the data, which is the floor for re-binning files.
    * For selective compaction at 100 TB (only the small-file tail),
    * list first and pass the small files as `pathGlob`-pinned input —
    * the shape here is the full-directory pass. */
  def compactParquet(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetFileBytes: Long
  ): CompactStats = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    val in = new Path(inDir)
    val fs = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(in).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    require(files.nonEmpty, s"no data files under $inDir")
    val bytesIn = files.map(_.getLen).sum
    val filesOut = math.max(1L, (bytesIn + targetFileBytes - 1) / targetFileBytes)
    spark.read.parquet(inDir)
      .repartition(filesOut.toInt)
      .write.mode("overwrite").parquet(outDir)
    CompactStats(files.length.toLong, bytesIn, filesOut)
  }
}
