package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Scratch profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.tune(spark)
    val sig = DedupOps.simhashSignatures(spark, dir).cache()
    println("[scratch] sigs=" + sig.count())
    val bands = sig.select(col("doc_id"),
      posexplode(array((0 until 4).map { j => expr(s"(simhash >> ${16 * j}) & 65535") }: _*))
        .as(Seq("band_id", "band_val")))
    val mult = bands.groupBy("band_id", "band_val").count()
    mult.orderBy(col("count").desc).show(10)
    val pairRows = mult.agg(sum(col("count") * col("count"))).collect()(0)
    println("[scratch] pair_rows_bound=" + pairRows)
    println("[scratch] out_pairs=" + DedupOps.simhashPairs(spark, dir).count())
    spark.stop()
  }
}
