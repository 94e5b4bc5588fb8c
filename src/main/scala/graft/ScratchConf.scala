package graft

import org.apache.spark.sql.SparkSession

/** Throwaway A/B of AQE coalescing floor on the heavy queries. */
object ScratchConf {
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
    val names = Seq("q_dedup_ngram_jaccard", "q_dedup_containment",
      "q_tfidf_top_terms", "q_token_cms", "q_dup_span_frac", "q_substring_dedup",
      "q_nb_classify", "q_token_rarity", "q_heavy_hitters", "q_chunk_dedup")
    // warm
    names.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    def run(tag: String): Unit = {
      val ts = names.map { n =>
        val fn = SparkEntry.queries(n)
        val reps = (1 to 5).map { _ =>
          spark.catalog.clearCache(); System.gc()
          val t0 = System.nanoTime(); fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        n -> reps(reps.length / 2)
      }
      ts.foreach { case (n, t) => println(f"[$tag] $n%-26s $t%7.3f") }
      println(f"[$tag] TOTAL ${ts.map(_._2).sum}%7.3f")
    }
    run("default-1m")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
    run("floor-64k")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
    run("default-1m-again")
    spark.stop()
  }
}
