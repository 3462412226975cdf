package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — Z-order clustering for scan
  * pruning, the write-side half of "fast multi-column point/range
  * queries on a 100 TB table" (Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * Reference analog: none (locopy delegates layout to the warehouse's
  * DISTKEY/SORTKEY, which cluster ONE dimension); pipeline necessity:
  * a sort key helps only its leading column — z-ordering gives every
  * file a rectangle-ish region of the composite key space, so parquet
  * footer min/max pruning cuts the scan on EITHER column.
  */
object Layout {

  /** Write `df` to `outDir` as `numFiles` parquet files clustered on
    * the z-interleave of (`colA`, `colB`) ([[graft.functions
    * .zInterleave2]]): range-partition on the z-value (one skew-aware
    * range shuffle — the same exchange a sorted export pays), sort
    * within each partition, drop the helper column on the way out.
    * Content-preserving by construction; gate with the
    * order-independent checksum, never a row-order compare.
    *
    * Scale note: range boundaries come from Spark's reservoir sample
    * of the z-values, so files are balanced even when the key space
    * is skewed — the property DISTKEY-style hash layouts lose. */
  def zorderWrite(
      df: DataFrame,
      colA: String,
      colB: String,
      outDir: String,
      numFiles: Int,
      bits: Int = 16
  ): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(!df.columns.contains("__z"),
      "zorderWrite uses a reserved working column __z already present in the input")
    df.withColumn("__z", graft.functions.zInterleave2(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }
}
