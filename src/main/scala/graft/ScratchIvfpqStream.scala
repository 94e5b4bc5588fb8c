package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Throwaway A/B: ivfpqProbeStream against the un-bucketed vs the
  * cluster-bucketed standing array index (round-11 VERDICT item #9). */
object ScratchIvfpqStream {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.tune(spark)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.AnnOps

    val (cents, cb, encoded) = AnnOps.ivfpqFor(spark, srcDir)
    val plain = AnnOps.ivfpqEncodedArrays(encoded).localCheckpoint()
    val bucketed = AnnOps.ivfpqArraysFor(spark, srcDir)
    val shift = 100000000L
    val vecRows: Seq[(Long, Seq[Float])] = (0 until mult).flatMap { i =>
      Tables.embeddings(spark, srcDir)
        .select(col("vec_id") + lit(i * shift), col("embedding"))
        .as[(Long, Seq[Float])].collect()
    }
    def run(tag: String, enc: DataFrame): Unit = {
      val stream = MemoryStream[(Long, Seq[Float])]
      stream.addData(vecRows)
      val q = graft.streaming.EventStream.ivfpqProbeStream(
          stream.toDF().toDF("vec_id", "embedding"), cents, cb, enc)
        .writeStream.format("noop").outputMode("update").start()
      val t0 = System.nanoTime()
      try q.processAllAvailable() finally q.stop()
      val dt = (System.nanoTime() - t0) / 1e9
      val label = f"ivfpq_probe[$tag]"
      println(f"== $label%-26s ${vecRows.size}%8d vecs  $dt%7.2f s  ${vecRows.size / dt}%9.0f vecs/s")
    }
    // interleave to cancel JIT drift
    run("plain-1", plain); run("bucketed-1", bucketed)
    run("plain-2", plain); run("bucketed-2", bucketed)
    run("plain-3", plain); run("bucketed-3", bucketed)
    spark.stop()
  }
}
