package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeedstockPushdownSpec extends SparkSpec {

  private def writtenDir(): String =
    FeedstockFixtures.writtenDir(spark, sfDir, "feedstock-pd")

  test("a nested comparison reaches the scan as a pushed filter, rows exact") {
    val dir = writtenDir()
    val cut = graft.Tables.documents(spark, sfDir)
      .agg(expr("percentile(doc_id, 0.5)")).collect()(0).getDouble(0).toLong
    val q = spark.read.format("graft-feedstock").load(dir)
      .filter(col("record.doc_id") > cut)
      .select(col("record.doc_id").as("doc_id"))
    val desc = q.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(desc.contains("record.doc_id"), desc)
    val expect = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") > cut).select("doc_id")
    assert(q.orderBy("doc_id").collect().map(_.getLong(0)).toSeq ==
      expect.orderBy("doc_id").collect().map(_.getLong(0)).toSeq)
  }

  test("prefix and equality filters push; unsupported ops stay residual and correct") {
    val dir = writtenDir()
    val q = spark.read.format("graft-feedstock").load(dir)
      .filter(col("mdf.source_name").startsWith("src1") &&
        col("record.lang") === "en" &&
        col("record.text").contains("a")) // contains: not pushable
    val plan = q.queryExecution.executedPlan.toString
    val desc = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(desc.contains("StringStartsWith") && desc.contains("EqualTo"), desc)
    assert(!desc.contains("StringContains"), desc)
    // ground truth via the schema-on-read path
    val v1 = FeedstockSource.flatten(FeedstockSource.read(spark, dir))
      .filter(col("source_name").startsWith("src1") &&
        col("lang") === "en" && col("text").contains("a"))
    assert(q.count() == v1.count())
  }

  test("a filter on a column pruned from the projection still applies") {
    val dir = writtenDir()
    val q = spark.read.format("graft-feedstock").load(dir)
      .filter(col("record.lang") === "en")
      .select(col("record.doc_id").as("doc_id"))
    val v1 = FeedstockSource.flatten(FeedstockSource.read(spark, dir))
      .filter(col("lang") === "en").select("doc_id")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq ==
      v1.collect().map(_.getLong(0)).sorted.toSeq)
  }
}
