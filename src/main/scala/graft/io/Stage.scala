package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession
import graft.core.{FileOpError, StageError}
import java.io.{BufferedInputStream, BufferedOutputStream, FileInputStream, FileOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Stage management: local ↔ stage transfer, listing, deletion, and the
  * local file utilities the reference ships.
  *
  * Reference surface: S3 upload/download/delete (+list variants,
  * locopy/s3.py:183-371), `parse_s3_url` (locopy/s3.py:373-391),
  * Snowflake internal-stage PUT/GET/LIST/REMOVE
  * (locopy/snowflake.py:213-266), and the local utilities split/gzip/
  * concat/write (locopy/utility.py:49-225).
  *
  * A "stage" here is any Hadoop-filesystem URI (file://, hdfs://,
  * s3a://…) — the same code path covers the reference's S3 staging and
  * Snowflake internal stages. Encryption/credentials map to Hadoop
  * `fs.s3a.*` configuration, not per-call parameters (SURVEY §2.1 #15).
  */
final class Stage(spark: SparkSession) {

  private def conf: Configuration = spark.sparkContext.hadoopConfiguration
  private def fsOf(p: Path): FileSystem = p.getFileSystem(conf)

  /** bucket/key split of an s3-style url (reference parse_s3_url,
    * locopy/s3.py:373-391). */
  def parseUrl(url: String): (String, String) = {
    val stripped = url.replaceFirst("^s3a?://", "")
    val idx = stripped.indexOf('/')
    if (idx < 0) (stripped, "") else (stripped.take(idx), stripped.drop(idx + 1))
  }

  /** Upload local file(s) to the stage (reference upload_to_s3 /
    * upload_list_to_s3, locopy/s3.py:183-269; Snowflake PUT
    * locopy/snowflake.py:213-245). An optional [[ProgressPercentage]]
    * receives per-chunk byte counts (the reference's S3Transfer
    * `Callback=ProgressPercentage(...)`, locopy/s3.py:252). */
  def put(local: String, stageUri: String, progress: Option[ProgressPercentage] = None): Unit =
    try {
      val src = new Path(local)
      val dst0 = new Path(stageUri)
      val fs = fsOf(dst0)
      fs.mkdirs(dst0.getParent)
      progress match {
        case None => fs.copyFromLocalFile(false, true, src, dst0)
        case Some(cb) =>
          // match copyFromLocalFile's accepted inputs: an existing
          // directory destination means "copy into it"
          val dst = if (fs.exists(dst0) && fs.getFileStatus(dst0).isDirectory)
            new Path(dst0, src.getName) else dst0
          val in = new BufferedInputStream(new FileInputStream(local))
          try {
            val out = fs.create(dst, true)
            try {
              val buf = new Array[Byte](1 << 16)
              var n = in.read(buf)
              while (n >= 0) { if (n > 0) { out.write(buf, 0, n); cb(n) }; n = in.read(buf) }
            } finally out.close()
          } finally in.close()
      }
    } catch { case e: Throwable => throw new StageError(s"put $local -> $stageUri failed", e) }

  def putList(locals: Seq[String], stageDir: String): Seq[String] =
    locals.map { l =>
      val name = new Path(l).getName
      val dst = s"${stageDir.stripSuffix("/")}/$name"
      put(l, dst); dst
    }

  /** Download stage file(s) to local (reference download_from_s3,
    * locopy/s3.py:271-331; Snowflake GET locopy/snowflake.py:247-266).
    * With a [[ProgressPercentage]] attached the copy chunks manually so
    * the callback sees per-chunk byte counts (the reference passes the
    * same Callback on downloads). NOTE the callback's 100% reference
    * point is its constructor file's size — for a download pass a path
    * whose size equals the remote object (the reference has the same
    * asymmetry: ProgressPercentage sizes from a local filename). */
  def get(stageUri: String, local: String, progress: Option[ProgressPercentage] = None): Unit =
    try {
      val src = new Path(stageUri)
      progress match {
        case None => fsOf(src).copyToLocalFile(false, src, new Path(local), true)
        case Some(cb) =>
          val in = fsOf(src).open(src)
          try {
            val out = new BufferedOutputStream(new FileOutputStream(local))
            try {
              val buf = new Array[Byte](1 << 16)
              var n = in.read(buf)
              while (n >= 0) { if (n > 0) { out.write(buf, 0, n); cb(n) }; n = in.read(buf) }
            } finally out.close()
          } finally in.close()
      }
    } catch { case e: Throwable => throw new StageError(s"get $stageUri -> $local failed", e) }

  def getList(stageUris: Seq[String], localDir: String): Seq[String] =
    stageUris.map { u =>
      val name = new Path(u).getName
      val dst = s"${localDir.stripSuffix("/")}/$name"
      get(u, dst); dst
    }

  /** List stage objects under a prefix (Snowflake LIST,
    * tests/test_integration_sf.py:92-97). */
  def list(stageDir: String): Seq[String] = {
    val p = new Path(stageDir)
    val fs = fsOf(p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isFile).map(_.getPath.toString).sorted.toSeq
  }

  /** Delete object(s) (reference delete_from_s3, locopy/s3.py:333-371;
    * Snowflake REMOVE). */
  def delete(stageUri: String): Unit =
    try { val p = new Path(stageUri); fsOf(p).delete(p, true); () }
    catch { case e: Throwable => throw new StageError(s"delete $stageUri failed", e) }

  def deleteList(uris: Seq[String]): Unit = uris.foreach(delete)
}

/** Transfer-progress callback (reference ProgressPercentage,
  * locopy/utility.py:473-508 — the boto3 S3Transfer `Callback=`): holds
  * the file size, accumulates bytes thread-safely, and renders a
  * `Transfering [####] 42.10%` bar. Wired into [[Stage.put]]/
  * [[Stage.get]] via their optional `progress` argument (the transfers
  * chunk through a manual stream copy when a callback is attached, so
  * the callback sees the same per-chunk byte counts boto3 reports). */
final class ProgressPercentage(filename: String, out: java.io.PrintStream = System.out) {
  private val size: Double = math.max(new java.io.File(filename).length().toDouble, 1.0)
  private var seenSoFar: Long = 0L

  /** Current accumulated percentage in [0, 100]. */
  def percentage: Double = synchronized(seenSoFar / size * 100.0)

  /** The callback: record `bytesAmount` more bytes transferred. */
  def apply(bytesAmount: Long): Unit = synchronized {
    seenSoFar += bytesAmount
    val pct = seenSoFar / size * 100.0
    out.print(f"\rTransfering [${"#" * (pct / 10).toInt}] $pct%.2f%%")
    out.flush()
  }
}

/** Local file utilities — exact ports of locopy/utility.py. These are
  * driver-local by design (the reference uses them to prep files before
  * staging); the distributed equivalents are repartition/compression
  * options on reads/writes (SURVEY §2.1 #7-10).
  */
object LocalFiles {

  /** Round-robin split into N line-balanced shards, skipping
    * `ignoreHeader` rows; cleanup on failure (reference split_file,
    * locopy/utility.py:123-189). */
  def splitFile(input: String, output: String, splits: Int = 1, ignoreHeader: Int = 0): Seq[String] = {
    require(splits > 0, "splits must be > 0")
    if (splits == 1) return Seq(input)
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val outNames = (0 until splits).map(i => s"$output.$i")
    try {
      val writers = outNames.map(n => Files.newBufferedWriter(Paths.get(n)))
      try {
        val lines = Files.lines(Paths.get(input))
        try {
          var i = 0L
          val it = lines.iterator().asScala.drop(ignoreHeader)
          it.foreach { line =>
            val w = writers((i % splits).toInt)
            w.write(line); w.write("\n")
            i += 1
          }
        } finally lines.close()
      } finally writers.foreach(_.close())
      outNames
    } catch {
      case e: Throwable =>
        outNames.foreach(n => new java.io.File(n).delete())
        throw new FileOpError(s"Error splitting the file: $input", e)
    }
  }

  /** Gzip a file, removing the original (reference compress_file +
    * compress_file_list semantics, locopy/utility.py:82-120). */
  def compressFile(input: String, output: String, removeOriginal: Boolean = true): String =
    try {
      val in = new BufferedInputStream(new FileInputStream(input))
      val out = new GZIPOutputStream(new BufferedOutputStream(new FileOutputStream(output)))
      try {
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
      } finally { in.close(); out.close() }
      if (removeOriginal) new java.io.File(input).delete()
      output
    } catch { case e: Throwable => throw new FileOpError(s"Error compressing the file: $input", e) }

  def compressFileList(files: Seq[String]): Seq[String] =
    files.map(f => compressFile(f, f + ".gz"))

  /** Byte-concat files into one, removing inputs (reference
    * concatenate_files, locopy/utility.py:192-225). */
  def concatenateFiles(inputs: Seq[String], output: String, remove: Boolean = true): Unit =
    try {
      val out = new BufferedOutputStream(new FileOutputStream(output))
      try {
        inputs.foreach { f =>
          val in = new BufferedInputStream(new FileInputStream(f))
          try {
            val buf = new Array[Byte](1 << 16)
            var n = in.read(buf)
            while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
          } finally in.close()
          if (remove) new java.io.File(f).delete()
        }
      } finally out.close()
    } catch { case e: Throwable => throw new FileOpError(s"Error concatenating files -> $output", e) }

  /** Write rows as delimited text (reference write_file,
    * locopy/utility.py:49-79). */
  def writeFile(rows: Seq[Seq[Any]], delimiter: String, filepath: String, append: Boolean = false): Unit =
    try {
      val w = new java.io.PrintWriter(new java.io.FileWriter(filepath, append))
      try rows.foreach(r => w.println(r.map(v => if (v == null) "" else v.toString).mkString(delimiter)))
      finally w.close()
    } catch { case e: Throwable => throw new FileOpError(s"Error writing file $filepath", e) }
}
