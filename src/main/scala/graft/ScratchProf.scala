package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway optimization-round profiler: time sub-stages of a hot
  * query with the noop sink (guide §1.4) and report per-step GC time.
  * Dev harness like ScratchPlan — not part of the driver contract. */
object ScratchProf {
  def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }
  def time(s: SparkSession, label: String)(df: => DataFrame): Unit = {
    s.sparkContext.setJobDescription(label)
    // rep 0 warms codegen, reps 1-2 measure
    val ts = (0 to 2).map { _ =>
      val g0 = gcMs; val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      (dt, gcMs - g0)
    }
    val best = ts.drop(1).map(_._1).min
    println(f"$label%-28s best=${best}%7.3f s  times=${ts.map(t => f"${t._1}%.2f").mkString(",")}  gcMs=${ts.map(_._2).mkString(",")}")
  }

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

    val docs = Tables.spread(spark, Tables.documents(spark, sfDir))
    time(spark, "docs scan+spread")(docs)
    val feats = docs.select(col("source"), col("doc_id"),
      explode(graft.operators.QualityModelOps.featuresCol).as("f"))
    time(spark, "features explode")(feats)
    val fb0 = feats.select(col("source"), col("doc_id"),
      substring(md5(col("f")), 1, 2).as("bucket"))
    time(spark, "features+md5")(fb0)
    val fb = fb0.groupBy(col("doc_id"), col("source"), col("bucket"))
      .agg(count(lit(1)).as("m"))
    time(spark, "fb agg")(fb)
    val cr = fb.groupBy(col("bucket")).agg(sum(col("m")).as("cr"))
    val ct = fb.filter(col("source").isin(graft.operators.QualityModelOps.refSources: _*))
      .groupBy(col("bucket")).agg(sum(col("m")).as("ct"))
    val totals = cr.agg(sum(col("cr")).as("nr"))
      .crossJoin(broadcast(ct.agg(sum(col("ct")).as("nt"))))
    val joined = fb
      .join(broadcast(ct), Seq("bucket"), "left")
      .join(broadcast(cr), Seq("bucket"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("m"),
        coalesce(col("ct"), lit(0L)).as("ct0"), col("cr").as("cr0"),
        col("nt"), col("nr"))
    time(spark, "fb+models joined")(joined)
    val folded = joined
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_features"),
        round(aggregate(
          array_sort(collect_list(struct(
            col("ct0"), col("cr0"), col("m"), col("nt"), col("nr")))),
          lit(0.0),
          (acc, x) => acc + x.getField("m") *
            ((log(x.getField("ct0") + lit(1)) - log(x.getField("nt") + lit(256))) -
              (log(x.getField("cr0") + lit(1)) - log(x.getField("nr") + lit(256))))),
          6).as("log_weight"))
    time(spark, "collect_list+fold")(folded)
    time(spark, "full q_dsir_weights")(
      graft.operators.QualityModelOps.dsirWeights(spark, sfDir))
    time(spark, "full q_pmi_collocations")(
      graft.functions.TextFunctions.pmiCollocations(spark, sfDir))
    time(spark, "full q_corpus_report")(
      graft.operators.PipelineOps.corpusReport(spark, sfDir))
    spark.stop()
  }
}
