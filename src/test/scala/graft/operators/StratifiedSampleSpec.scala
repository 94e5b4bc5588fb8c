package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StratifiedSampleSpec extends SparkSpec {

  test("every stratum keeps exactly round(rate * count) rows") {
    val counts = graft.Tables.documents(spark, sfDir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = PipelineOps.stratifiedSample(spark, sfDir).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    counts.foreach { case (src, n) =>
      val expect = math.round(n * PipelineOps.stratifiedRate)
      assert(kept.getOrElse(src, 0L) == expect, s"source $src: $n docs")
    }
  }

  test("the sample is deterministic under repartitioning") {
    val docs = graft.Tables.documents(spark, sfDir)
    def ids(df: org.apache.spark.sql.DataFrame) =
      PipelineOps.stratifiedSampleOf(df, col("source"),
        PipelineOps.sampleKeyOf(col("source"), col("doc_id")), col("doc_id"), 0.3)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(docs) == ids(docs.repartition(7)))
  }

  test("proportionality: sampled mixture matches the corpus mixture") {
    val total = graft.Tables.documents(spark, sfDir).count().toDouble
    val out = PipelineOps.stratifiedSample(spark, sfDir)
    val sampleTotal = out.count().toDouble
    assert(math.abs(sampleTotal / total - PipelineOps.stratifiedRate) < 0.05)
    val corpusShare = graft.Tables.documents(spark, sfDir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / total).toMap
    out.collect().groupBy(_.getString(1)).foreach { case (src, rs) =>
      assert(math.abs(rs.length / sampleTotal - corpusShare(src)) < 0.1)
    }
  }
}
