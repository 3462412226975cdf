package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch micro-probe for the Lloyd-round cost in kmeansCentroids
  * (guide §1: attribute before changing). Local use only. */
object KmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        s"graft_wh_kmprobe_${ProcessHandle.current().pid()}").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config(graft.core.Session.localCheckpointIoConfs.toMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val dur = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
          println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%3d " +
            f"dur=${dur.getOrElse(-1L)}%5d ms run=${si.taskMetrics.executorRunTime}%5d ms " +
            f"cpu=${si.taskMetrics.executorCpuTime / 1000000}%5d ms deser=${si.taskMetrics.executorDeserializeTime}%4d ms " +
            si.name.take(60))
        }
      })
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[km] $label%-40s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      r
    }
    // bit-identity: old HOF normalize vs fused NormalizeVec (exact
    // double compare element-wise, incl. length and null layout)
    {
      val oldNorm = {
        val n = sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, v) => acc + v.cast("double") * v.cast("double")))
        transform(col("embedding"), v => v.cast("double") / n)
      }
      val bad = emb.select(oldNorm.as("o"),
          graft.functions.normalize(col("embedding")).as("f"))
        .filter(not(col("o") <=> col("f")))
        .count()
      println(s"[km] normalize mismatch rows = $bad (want 0)")
    }
    // bit-identity: old HOF quantize8 vs fused Quantize8Codes
    {
      val mn = array_min(col("embedding")).cast("double")
      val mx = array_max(col("embedding")).cast("double")
      val oldQ = transform(col("embedding"), x =>
        when(mx === mn, lit(0))
          .otherwise(floor((x.cast("double") - mn) * 255.0 / (mx - mn)).cast("int")))
      val bad = emb.select(oldQ.as("o"),
          graft.functions.quantize8(col("embedding")).as("f"))
        .filter(not(col("o") <=> col("f")))
        .count()
      println(s"[km] quantize8 mismatch rows = $bad (want 0)")
    }
    // whole trained pipeline twice
    (1 to 2).foreach { it =>
      time(s"kmeansCentroids full (pass $it)") {
        graft.ext.Similarity.kmeansCentroids(emb, k = 16, iters = 3)
      }
    }
    // per-piece: seed, then each round's assign+agg+collect twice
    val cents0 = time("firstNCentroids") {
      graft.ext.Similarity.firstNCentroids(emb, 16)
    }
    val c = emb.select(graft.functions.normalize(col("embedding")).as("cv"))
    var cents = cents0
    (1 to 3).foreach { round =>
      val assigned = c.withColumn("cell",
        graft.functions.fx.nearestCentroid(col("cv"), cents).getField("cent_id"))
      val agg = graft.ext.Similarity.centroidsByDim(assigned, col("cell"), "cv")
      val rows1 = time(s"round $round collect (fresh plan)") { agg.collect() }
      time(s"round $round collect (same df again)") { agg.collect() }
      val means = rows1.toSeq.groupBy(_.getLong(0)).map { case (cell, rs) =>
        val byDim = rs.sortBy(_.getInt(1)).map(_.getDouble(2))
        val n = math.sqrt(byDim.map(x => x * x).sum)
        cell -> (if (n == 0) byDim.toSeq else byDim.map(_ / n).toSeq)
      }
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    // control: the aggregation WITHOUT the argmin column
    val aggPlain = graft.ext.Similarity.centroidsByDim(
      c.withColumn("cell", lit(0L)), col("cell"), "cv")
    time("control agg lit-cell (fresh)") { aggPlain.collect() }
    time("control agg lit-cell (again)") { aggPlain.collect() }
    // phase split on one more fresh round plan: analysis → optimization
    // → physical planning → execution
    val assigned4 = c.withColumn("cell",
      graft.functions.fx.nearestCentroid(col("cv"), cents).getField("cent_id"))
    val agg4 = graft.ext.Similarity.centroidsByDim(assigned4, col("cell"), "cv")
    val qe = agg4.queryExecution
    time("phase: analyzed") { qe.analyzed }
    time("phase: optimizedPlan") { qe.optimizedPlan }
    time("phase: executedPlan") { qe.executedPlan }
    time("phase: collect") { agg4.collect() }
    time("phase: collect again") { agg4.collect() }
    // knob isolation: fresh plans (perturbed centroids so nothing is
    // accidentally reused) under AQE off / codegen off
    def freshAgg(eps: Double): DataFrame = {
      val pc = cents.map { case (cid, v) => (cid, v.map(_ * (1.0 + eps))) }
      graft.ext.Similarity.centroidsByDim(
        c.withColumn("cell",
          graft.functions.fx.nearestCentroid(col("cv"), pc).getField("cent_id")),
        col("cell"), "cv")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("AQE off: fresh collect") { freshAgg(1e-7).collect() }
    time("AQE off: fresh collect 2") { freshAgg(2e-7).collect() }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("WSCG off: fresh collect") { freshAgg(3e-7).collect() }
    time("WSCG off: fresh collect 2") { freshAgg(4e-7).collect() }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    time("NO_CODEGEN: fresh collect") { freshAgg(5e-7).collect() }
    spark.conf.unset("spark.sql.codegen.factoryMode")
    time("baseline again: fresh collect") { freshAgg(6e-7).collect() }
    spark.stop()
  }
}
