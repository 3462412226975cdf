package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted banded LSH index for a streaming near-dup corpus — the
  * READ-side scale primitive completing the manifest corpus's
  * append-only write side.
  *
  * The corpus ([[graft.io.ManifestTable]] under `root`) persists each
  * accepted doc's minhash signature, but re-deriving band buckets from
  * those signatures on every ingest scans and re-hashes the whole
  * corpus per micro-batch. This index persists the banding ONCE per
  * segment: for corpus segment `seg-N-x` a sibling dir
  * `<root>__bands/seg-N-x/pb=<p>/…` holds its `(band, bucket, id)`
  * rows, hash-partitioned on `pb = pmod(xxhash64(band, bucket),
  * PartBuckets)` so an ingest reads ONLY the hash partitions its own
  * band buckets can collide with (`pb` is a physical partition dir —
  * parquet partition pruning, not a post-scan filter).
  *
  * Consistency: the index is a pure DERIVATION of the corpus (same
  * [[graft.ext.Dedup.bandedFromSig]] over the same persisted sig
  * arrays — bit-identical to fresh banding), so it needs no second
  * commit protocol. The corpus manifest stays the single source of
  * truth; [[sync]] reconciles the index to it — building band dirs for
  * segments that lack one (first sight of a new segment, or the crash
  * window between a corpus commit and the index write) and deleting
  * dirs whose segment the manifest no longer names (post-[[graft.io
  * .ManifestTable.compact]] orphans). A missing or half-written index
  * dir (no _SUCCESS marker) is rebuilt idempotently from its segment;
  * readers run AFTER sync, so they only ever see complete dirs.
  *
  * Scale: per-segment index rows are `bands` (16) × ~20 bytes per doc —
  * ~2.5% of the signature column they replace, and the per-ingest read
  * is further cut to the colliding `pb` partitions. `PartBuckets` = 64
  * keeps test-scale dirs inspectable; a 100 TB deployment sizes it
  * like any hash-partitioned state layout (e.g. 4096) so one
  * micro-batch's collision set touches a small fraction of partitions. */
object NearDupIndex {

  /** Hash-partition count of the `pb` pruning key. Writer and reader
    * must agree; changing it only requires deleting the index dirs
    * ([[sync]] rebuilds them at the new count). */
  val PartBuckets = 64

  private[graft] def bandsRoot(root: String): String = root + "__bands"

  /** Attach the physical pruning key to a banded relation. */
  private[graft] def withPb(banded: DataFrame): DataFrame =
    banded.withColumn("pb",
      pmod(xxhash64(col("band"), col("bucket")), lit(PartBuckets)).cast("int"))

  private def hadoopFs(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Reconcile the index to the corpus manifest: delete band dirs for
    * segments the manifest no longer names, build band dirs for
    * segments that lack a complete one. O(new segments) work in steady
    * state — an already-indexed segment costs one existence check. */
  def sync(spark: SparkSession, root: String): Unit = {
    val (f, br) = hadoopFs(spark, bandsRoot(root))
    if (!graft.io.ManifestTable.exists(spark, root)) {
      if (f.exists(br)) f.delete(br, true)
      return
    }
    val segs = graft.io.ManifestTable.segments(spark, root)
    val live = segs.toSet
    if (f.exists(br))
      f.listStatus(br).foreach { st =>
        if (!live.contains(st.getPath.getName)) f.delete(st.getPath, true)
      }
    segs.foreach { seg =>
      if (!f.exists(new Path(new Path(br, seg), "_SUCCESS")))
        writeFor(spark, root, seg,
          spark.read.parquet(s"$root/$seg")
            .select(col("doc_id").as("id"), col("sig")))
    }
  }

  /** Write segment `seg`'s band dir from its signature relation.
    * Callers that still hold the just-appended rows in memory pass
    * them directly (the normal ingest path — no re-read of the
    * segment); [[sync]] derives the same relation from disk when
    * healing. The rows are repartitioned BY `pb` before the
    * partitioned write so each pb dir gets exactly one file — without
    * it every task writes into every colliding dir and a 32-thread
    * local session scatters a tiny segment's index across up to
    * 64×32 files, paying seconds of file-commit overhead per ingest
    * (measured; the same write was the round-12 bench regression). */
  private[graft] def writeFor(spark: SparkSession, root: String,
      seg: String, sig: DataFrame): Unit =
    withPb(graft.ext.Dedup.bandedFromSig(sig))
      .repartition(col("pb"))
      .write.mode("overwrite").partitionBy("pb")
      .parquet(s"${bandsRoot(root)}/$seg")

  /** Read the corpus index pruned to the given `pb` partitions (the
    * batch's own collision partitions — a ≤[[PartBuckets]]-element
    * driver list, parameter-bounded). Per-segment reads keep partition
    * discovery single-rooted; the `pb` filter pushes into each scan as
    * partition pruning. Call [[sync]] first. */
  def read(spark: SparkSession, root: String, pbs: Seq[Int]): DataFrame = {
    val segs = graft.io.ManifestTable.segments(spark, root)
    require(segs.nonEmpty, s"no committed corpus under $root")
    segs.map { seg =>
      spark.read.parquet(s"${bandsRoot(root)}/$seg")
        .filter(col("pb").isin(pbs: _*))
        .select("band", "bucket", "id")
    }.reduce(_ unionByName _)
  }

  /** Remove the index entirely (the [[graft.io.ManifestTable.destroy]]
    * sibling for [[graft.streaming.Stream.dropNearDup]]). */
  def destroy(spark: SparkSession, root: String): Unit = {
    val (f, br) = hadoopFs(spark, bandsRoot(root))
    f.delete(br, true)
    ()
  }
}
