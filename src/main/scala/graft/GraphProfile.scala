package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scale-attribution harness for the super-linear bench ratios
  * (round-10 finding: graph_jaccard 13.2× and graph_adamic_adar 10.9×
  * wall-clock for 10× data; hypothesis: shuffle constants, not a plan
  * defect). Runs the named queries against an sf dir with a stage-
  * metrics listener attached and prints one JSON line per query:
  * wall seconds, task count, shuffle read/write MB, spill, executor
  * run/CPU time, GC — the numbers that separate the three candidate
  * causes: per-task fixed overhead (tasks grow, cpu/task flat),
  * shuffle volume (bytes grow super-linearly), or cap behavior (the
  * maxDeg=64 wedge cap changing the work mix as duplicate-groups
  * grow).
  *
  * Usage: `runMain graft.GraphProfile <sfDir> [q1,q2,...]`
  * (default: the two wedge joins, triangles, and pagerank as the
  * linear-scaling control). Between queries the harness sweeps
  * storage/shuffles the same way Bench does, so measurements are
  * isolated. */
object GraphProfile {

  private class StageAgg extends SparkListener {
    var tasks = 0L; var shufReadB = 0L; var shufWriteB = 0L
    var shufReadRec = 0L; var shufWriteRec = 0L
    var execRunMs = 0L; var execCpuNs = 0L; var gcMs = 0L; var spillB = 0L
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      Option(s.stageInfo.taskMetrics).foreach { m =>
        tasks += s.stageInfo.numTasks
        shufReadB += m.shuffleReadMetrics.totalBytesRead
        shufWriteB += m.shuffleWriteMetrics.bytesWritten
        shufReadRec += m.shuffleReadMetrics.recordsRead
        shufWriteRec += m.shuffleWriteMetrics.recordsWritten
        execRunMs += m.executorRunTime
        execCpuNs += m.executorCpuTime
        gcMs += m.jvmGCTime
        spillB += m.diskBytesSpilled
      }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val queries = if (args.length > 1) args(1).split(",").toSeq
      else Seq("graph_jaccard", "graph_adamic_adar", "graph_triangles",
        "graph_pagerank")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.blocking", "true")
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
      .config(graft.core.Session.localCheckpointIoConfs.toMap)
      .getOrCreate()
    // SPARK_GRAFT_NO_BROADCAST=1: disable broadcast joins, so the
    // flip-attribution experiment can compare shuffle records at a
    // small scale under the same join strategies the large scale is
    // forced into (confirming/refuting the plan-flip hypothesis)
    if (sys.env.contains("SPARK_GRAFT_NO_BROADCAST")) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    }
    spark.sparkContext.setLogLevel("WARN")
    queries.foreach { name =>
      val agg = new StageAgg
      spark.sparkContext.addSparkListener(agg)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftBenchInternals.drainListenerBus(spark.sparkContext)
      spark.sparkContext.removeSparkListener(agg)
      println(f"""{"query":"$name","sf":"$sfDir","sec":$sec%.2f,""" +
        f""""tasks":${agg.tasks},"shuffle_read_mb":${agg.shufReadB >> 20},""" +
        f""""shuffle_write_mb":${agg.shufWriteB >> 20},""" +
        f""""shuffle_read_rec":${agg.shufReadRec},"shuffle_write_rec":${agg.shufWriteRec},""" +
        f""""spill_mb":${agg.spillB >> 20},"exec_run_s":${agg.execRunMs / 1e3}%.1f,""" +
        f""""exec_cpu_s":${agg.execCpuNs / 1e9}%.1f,"gc_s":${agg.gcMs / 1e3}%.1f}""")
      core.Lineage.sweep(spark)
      org.apache.spark.GraftBenchInternals.cleanAllShuffles(spark.sparkContext)
      System.gc()
    }
    spark.stop()
  }
}
