package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: pair-stream volume numbers for the r11 pair-miner work. */
object ScratchPairVol {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)
    val grouped = DedupOps.ngramCollapseOf(DedupOps.shingleHashes(spark, sfDir))
    println("reps=" + grouped.count())
    val byShingle = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    val postings = grouped
      .select(col("rep_id").as("doc_id"), size(col("hs")).as("sh_size"), explode(col("hs")).as("h"))
      .withColumn("df", count(lit(1)).over(byShingle))
      .filter(col("df") >= 2 && col("df") <= 1000L)
      .groupBy(col("h"))
      .agg(collect_list(struct(col("doc_id"), col("sh_size"))).as("ds"))
    println("posting lists=" + postings.count())
    val pairRows = postings
      .select(explode(graft.functions.GraftFunctions.postingPairs(col("ds"))).as("p"))
    println("pair rows=" + pairRows.count())
    println("distinct pairs=" + pairRows.select("p.doc_a", "p.doc_b").distinct().count())
    // df histogram
    postings.select(size(col("ds")).as("d")).groupBy("d").count()
      .orderBy(col("d").desc).show(10)
    // prefix-filter candidate volume at t=0.5 (jaccard): index only the
    // first (|s| - ceil(0.5*|s|) + 1) hashes of each sorted set
    val pre = grouped
      .select(col("rep_id").as("doc_id"), size(col("hs")).as("sh_size"),
        explode(slice(col("hs"), lit(1),
          (size(col("hs")) - ceil(size(col("hs")) * 0.5) + 1).cast("int"))).as("h"))
    val prePost = pre
      .withColumn("df", count(lit(1)).over(byShingle))
      .filter(col("df") >= 2 && col("df") <= 1000L)
      .groupBy(col("h"))
      .agg(collect_list(struct(col("doc_id"), col("sh_size"))).as("ds"))
    val prePairs = prePost
      .select(explode(graft.functions.GraftFunctions.postingPairs(col("ds"))).as("p"))
    println("prefix pair rows=" + prePairs.count())
    println("prefix distinct pairs=" + prePairs.select("p.doc_a", "p.doc_b").distinct().count())
    // length-filter selectivity at t=0.5: pair can pass only if min/max >= t
    val lf = pairRows.filter(
      least(col("p.size_a"), col("p.size_b")).cast("double") /
        greatest(col("p.size_a"), col("p.size_b")).cast("double") >= 0.5)
    println("lenfilter pair rows=" + lf.count())
    // combined with prefix
    val lfp = prePairs.filter(
      least(col("p.size_a"), col("p.size_b")).cast("double") /
        greatest(col("p.size_a"), col("p.size_b")).cast("double") >= 0.5)
    println("prefix+lenfilter pair rows=" + lfp.count())
    spark.stop()
  }
}
