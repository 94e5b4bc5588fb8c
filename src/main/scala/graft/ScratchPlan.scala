package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit authoring aid: print executed-plan text for named
  * queries so Explain expectations are written against real plans,
  * never guessed. Not part of the driver contract. Run:
  *   sbt "runMain graft.ScratchPlan /root/testdata/sf0.01 q_range_join ..."
  */
object ScratchPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.tune(spark)
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      println(s"===== $name")
      println(df.queryExecution.executedPlan.toString.take(20000))
    }
    spark.stop()
  }
}
