package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway A/B for the pmi restructure — old raw-stream position
  * counts vs cb-derived position counts, same JVM, interleaved reps. */
object ScratchPmi {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)

    def shape(derived: Boolean): DataFrame = {
      val bg = Tables.spread(spark, Tables.documents(spark, sfDir))
        .select(explode(graft.operators.QualityModelOps.bigramsCol).as("bg"))
      val cb = bg.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
      val (cl, cr) =
        if (derived)
          (cb.groupBy(substring_index(col("bg"), " ", 1).as("w1")).agg(sum(col("c12")).as("c1")),
           cb.groupBy(substring_index(col("bg"), " ", -1).as("w2")).agg(sum(col("c12")).as("c2")))
        else
          (bg.groupBy(substring_index(col("bg"), " ", 1).as("w1")).agg(count(lit(1)).as("c1")),
           bg.groupBy(substring_index(col("bg"), " ", -1).as("w2")).agg(count(lit(1)).as("c2")))
      val n = cb.agg(sum(col("c12")).as("n"))
      cb.filter(col("c12") >= 5)
        .withColumn("w1", substring_index(col("bg"), " ", 1))
        .withColumn("w2", substring_index(col("bg"), " ", -1))
        .join(cl, Seq("w1"))
        .join(cr, Seq("w2"))
        .crossJoin(broadcast(n))
        .select(col("bg"), col("c12"), col("c1"), col("c2"),
          (log(col("c12")) + log(col("n")) - log(col("c1")) - log(col("c2")))
            .as("pmi"))
        .orderBy(col("pmi").desc, col("bg").asc)
        .limit(100)
    }
    // warm both
    shape(false).count(); shape(true).count()
    val reps = 5
    val t = Array(0.0, 0.0)
    val mins = Array(Double.MaxValue, Double.MaxValue)
    for (_ <- 1 to reps; d <- Seq(0, 1)) {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      shape(d == 1).count()
      val dt = (System.nanoTime() - t0) / 1e9
      t(d) += dt
      if (dt < mins(d)) mins(d) = dt
    }
    println(f"OLD raw-stream : avg=${t(0) / reps}%.3f min=${mins(0)}%.3f")
    println(f"NEW cb-derived : avg=${t(1) / reps}%.3f min=${mins(1)}%.3f")
    spark.stop()
  }
}
