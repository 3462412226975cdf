package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Measurement tool (guide §1): run named queries once under the Bench
  * session shape with a job listener attached, and print every Spark
  * job's duration plus the DRIVER GAP since the previous job ended.
  * The gap column is the tell for driver-side/filesystem overhead
  * (commit machinery, fs scans, stream bookkeeping) that per-job
  * timings can't see. Not part of the driver contract; local use only:
  *
  *   sbt "runMain graft.JobProbe /root/testdata/sf0.1 q1,q2"
  */
object JobProbe {
  private case class Job(id: Int, desc: String, start: Long, var end: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq.empty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.warehouse.dir", java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        s"graft_wh_probe_${ProcessHandle.current().pid()}").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.blocking", "true")
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
      .config(graft.core.Session.localCheckpointIoConfs.toMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("").replace('\n', ' ')
        jobs.put(e.jobId, Job(e.jobId, desc, e.time, -1L))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      }
    })
    val report = new StringBuilder
    def emit(s: String): Unit = { println(s); report.append(s).append('\n') }
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[probe] unknown query: $name")
        case Some(fn) =>
          // warmup run first (absorbs JIT/codegen like Bench's median-of-3
          // does), then the measured run
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
          catch { case _: Throwable => () }
          core.Lineage.sweep(spark)
          org.apache.spark.GraftBenchInternals.cleanAllShuffles(spark.sparkContext)
          org.apache.spark.GraftBenchInternals.cleanStreamingState(spark)
          System.gc()
          jobs.clear(); order.clear()
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
          catch { case e: Throwable => System.err.println(s"[probe] $name FAILED: $e") }
          val wall = (System.nanoTime() - t0) / 1e9
          // give straggler job-end events a beat to land
          Thread.sleep(300)
          import scala.jdk.CollectionConverters._
          val seq = order.asScala.toSeq.flatMap(id => Option(jobs.get(id)))
            .sortBy(_.start)
          var prevEnd = 0L
          var jobMs = 0L; var gapMs = 0L
          emit(s"== $name  wall=${f"$wall%.2f"}s  jobs=${seq.size}")
          seq.foreach { j =>
            val dur = if (j.end > 0) j.end - j.start else -1L
            val gap = if (prevEnd > 0) j.start - prevEnd else 0L
            if (dur >= 0) jobMs += dur
            gapMs += math.max(0L, gap)
            if (dur >= 100 || gap >= 100)
              emit(f"  job ${j.id}%4d dur=${dur}%6d ms gap=${gap}%6d ms  ${j.desc.take(110)}")
            prevEnd = math.max(prevEnd, j.end)
          }
          emit(f"  [sum] jobs=${jobMs} ms, inter-job driver gaps=${gapMs} ms, wall=${(wall * 1000).toLong} ms")
          core.Lineage.sweep(spark)
          org.apache.spark.GraftBenchInternals.cleanAllShuffles(spark.sparkContext)
          org.apache.spark.GraftBenchInternals.cleanStreamingState(spark)
          System.gc()
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/jobprobe.log"),
      report.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
