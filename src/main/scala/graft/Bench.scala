package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query against SPARK_GRAFT_SF_DIR,
  * one JSON line to stdout.
  *
  * Protocol (round 4+): each query runs `runs`=3 times back-to-back;
  * the reported per-query number and the total are MEDIANS, with the
  * [min, max] spread emitted alongside — single-shot timings at this
  * scale carry ±6 % run noise (BENCHNOTES.md), which swamped sub-2 s
  * per-query deltas round-over-round. The first run also absorbs JIT /
  * code-cache warmup, which the median then discounts. */
object Bench {
  private val runs = 3
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    // optional second arg: comma-separated query-name filter (local
    // iteration aid; the driver always passes at most the sf dir)
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results: Seq[(String, Seq[Double])] = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        // noop sink: full expression evaluation without result
        // materialization (count() lets Catalyst prune unreferenced
        // projections, under-measuring projection-heavy queries)
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + median(v) }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, v) => "\"" + k + "\":[" + v.min + "," + v.max + "]" }
      .mkString("{", ",", "}")
    val total = results.map { case (_, v) => median(v) }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
