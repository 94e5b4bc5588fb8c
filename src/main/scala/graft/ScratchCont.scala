package graft.operators

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway decomposition of q_dedup_containment (noop-sink timing). */
object ScratchCont {
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
    
    def time(label: String)(f: => Unit): Unit = {
      val ts = (0 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-30s best=${ts.drop(1).min}%7.3f  times=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    time("shingleHashes scan") {
      DedupOps.shingleHashes(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("collapse (ckpt job incl.)") {
      val g = DedupOps.ngramCollapseOf(DedupOps.shingleHashes(spark, sfDir))
      g.write.format("noop").mode("overwrite").save()
    }
    val grouped = DedupOps.ngramCollapseOf(DedupOps.shingleHashes(spark, sfDir))
    val byShingle = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    val inv = grouped
      .select(col("rep_id").as("doc_id"), size(col("hs")).as("sh_size"),
        explode(col("hs")).as("h"))
    time("explode inv") {
      inv.write.format("noop").mode("overwrite").save()
    }
    val postings = inv
      .withColumn("df", count(lit(1)).over(byShingle))
      .filter(col("df") >= 2 && col("df") <= 1000L)
      .groupBy(col("h"))
      .agg(collect_list(struct(col("doc_id"), col("sh_size"))).as("ds"))
    time("window df + postings") {
      postings.write.format("noop").mode("overwrite").save()
    }
    val pairs = postings
      .withColumn("ds", array_sort(col("ds")))
      .select(flatten(transform(col("ds"), (a, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))),
          b => struct(a.as("a"), b.as("b"))))).as("pairs"))
      .select(explode(col("pairs")).as("p"))
      .groupBy(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
        col("p.a.sh_size").as("size_a"), col("p.b.sh_size").as("size_b"))
      .agg(count(lit(1)).as("common"))
    time("pairs + agg") {
      pairs.write.format("noop").mode("overwrite").save()
    }
    time("full containment .count") {
      DedupOps.containmentPairs(spark, sfDir).count()
    }
    spark.stop()
  }
}
