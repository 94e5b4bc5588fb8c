package graft.operators

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway A/B for the round-11 pair-miner work: collapse
  * materialization strategy (localCheckpoint vs persist-in-plan) and
  * pair-shuffle width (sizes in the group key vs rejoined after).
  * Times are interleaved count() reps like the bench. */
object ScratchPairs {
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

    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val s = ts.map(_._1).sorted
      println(f"$label%-34s med=${s(s.length / 2)}%7.3f  rows=${ts.head._2}  times=${ts.map(t => f"${t._1}%.2f").mkString(",")}")
    }

    // ---- variant machinery (copies of DedupOps internals) ----
    def collapsePersist(hashSets: DataFrame): DataFrame =
      hashSets
        .groupBy(array_sort(col("hs")).as("hs"))
        .agg(min(col("doc_id")).as("rep_id"),
          sort_array(collect_list(col("doc_id"))).as("members"))
        .select(col("rep_id"), col("hs"), col("members"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def repPairsNarrow(hashSets: DataFrame, threshold: Double,
        maxShingleDf: Long, sizes: DataFrame): DataFrame = {
      val byShingle = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
      hashSets
        .select(col("doc_id"), size(col("hs")).as("sh_size"), explode(col("hs")).as("h"))
        .withColumn("df", count(lit(1)).over(byShingle))
        .filter(col("df") >= 2 && col("df") <= maxShingleDf)
        .groupBy(col("h"))
        .agg(collect_list(struct(col("doc_id"), col("sh_size"))).as("ds"))
        .select(explode(graft.functions.GraftFunctions.postingPairs(col("ds"))).as("p"))
        .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
        .agg(count(lit(1)).as("common"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("sh_size").as("size_a")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("sh_size").as("size_b")), "doc_b")
        .withColumn("jaccard",
          col("common").cast("double") / (col("size_a") + col("size_b") - col("common")))
        .filter(col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    }

    def jaccardVariant(collapse: DataFrame => DataFrame, narrow: Boolean): DataFrame = {
      val hs = DedupOps.shingleHashes(spark, sfDir)
      val grouped = collapse(hs)
      val rs = grouped.select(col("rep_id").as("doc_id"), col("hs"))
      val repPairs =
        if (narrow)
          repPairsNarrow(rs, DedupOps.jaccardThreshold, DedupOps.stopShingleDfCap,
            rs.select(col("doc_id"), size(col("hs")).as("sh_size")))
        else {
          val byShingle = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
          rs.select(col("doc_id"), size(col("hs")).as("sh_size"), explode(col("hs")).as("h"))
            .withColumn("df", count(lit(1)).over(byShingle))
            .filter(col("df") >= 2 && col("df") <= DedupOps.stopShingleDfCap)
            .groupBy(col("h"))
            .agg(collect_list(struct(col("doc_id"), col("sh_size"))).as("ds"))
            .select(explode(graft.functions.GraftFunctions.postingPairs(col("ds"))).as("p"))
            .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
              col("p.size_a").as("size_a"), col("p.size_b").as("size_b"))
            .agg(count(lit(1)).as("common"))
            .withColumn("jaccard",
              col("common").cast("double") / (col("size_a") + col("size_b") - col("common")))
            .filter(col("jaccard") >= DedupOps.jaccardThreshold)
            .select("doc_a", "doc_b", "jaccard")
        }
      val within = grouped
        .filter(size(col("members")) >= 2)
        .select(explode(flatten(transform(col("members"), (a, i) =>
          transform(slice(col("members"), i + 2, size(col("members"))),
            b => struct(a.as("doc_a"), b.as("doc_b")))))).as("p"),
          lit(1.0).as("jaccard"))
        .select(col("p.doc_a"), col("p.doc_b"), col("jaccard"))
      val cross = repPairs
        .join(grouped.select(col("rep_id").as("doc_a"), col("members").as("ma")), "doc_a")
        .join(grouped.select(col("rep_id").as("doc_b"), col("members").as("mb")), "doc_b")
        .select(col("jaccard"),
          explode(flatten(transform(col("ma"), a =>
            transform(col("mb"), b => struct(least(a, b).as("doc_a"),
              greatest(a, b).as("doc_b")))))).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"), col("jaccard"))
      within.unionByName(cross).orderBy("doc_a", "doc_b")
    }

    time("A jaccard ckpt+wide (current)") { DedupOps.ngramJaccard(spark, sfDir).count() }
    time("B jaccard persist+wide") { jaccardVariant(collapsePersist, narrow = false).count() }
    time("C jaccard persist+narrow") { jaccardVariant(collapsePersist, narrow = true).count() }
    time("D jaccard ckpt+narrow") {
      jaccardVariant(hs => hs
        .groupBy(array_sort(col("hs")).as("hs"))
        .agg(min(col("doc_id")).as("rep_id"),
          sort_array(collect_list(col("doc_id"))).as("members"))
        .select(col("rep_id"), col("hs"), col("members"))
        .localCheckpoint(), narrow = true).count()
    }
    time("E containment current") { DedupOps.containmentPairs(spark, sfDir).count() }
    // sanity: identical results
    val a = DedupOps.ngramJaccard(spark, sfDir).collect().map(_.toString).sorted
    val c = jaccardVariant(collapsePersist, narrow = true).collect().map(_.toString).sorted
    println(s"rows A=${a.length} C=${c.length} equal=${a.sameElements(c)}")
    spark.stop()
  }
}
