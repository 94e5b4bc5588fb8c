package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeedstockV2Spec extends SparkSpec {

  private def writtenDir(): String = {
    val docs = graft.Tables.documents(spark, sfDir)
    val tmp = java.nio.file.Files.createTempDirectory("feedstock-v2").toString
    FeedstockSource.write(FeedstockSource.fromDocuments(docs), tmp)
    tmp
  }

  test("DSv2 read matches the schema-on-read path row for row") {
    val dir = writtenDir()
    val v2 = FeedstockSource.flatten(
      spark.read.format("graft-feedstock").load(dir))
    val v1 = FeedstockSource.flatten(FeedstockSource.read(spark, dir))
    assert(v2.count() == v1.count())
    val a = v2.orderBy("doc_id").collect().map(_.toSeq)
    val b = v1.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("column pruning reaches the scan: one-leaf projection ships a one-leaf schema") {
    val dir = writtenDir()
    val q = spark.read.format("graft-feedstock").load(dir)
      .select(col("record.doc_id").as("doc_id"))
    val plan = q.queryExecution.executedPlan.toString
    // the Scan.description embeds the pruned ReadSchema; text/lang and
    // the whole mdf block must not survive pruning
    assert(plan.contains("graft-feedstock"), plan.take(500))
    val desc = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(desc.contains("doc_id"))
    assert(!desc.contains("text") && !desc.contains("source_id"), desc)
    // and the data still comes back
    assert(q.agg(count(lit(1))).collect()(0).getLong(0) ==
      graft.Tables.documents(spark, sfDir).count())
  }

  test("DSv2 write + read round trip through the connector") {
    val docs = graft.Tables.documents(spark, sfDir)
    val feedstock = FeedstockSource.fromDocuments(docs)
    val tmp = java.nio.file.Files.createTempDirectory("feedstock-v2w").toString
    feedstock.write.format("graft-feedstock").mode("append").save(tmp)
    val back = FeedstockSource.flatten(
      spark.read.format("graft-feedstock").load(tmp))
    assert(back.count() == docs.count())
    val a = back.orderBy("doc_id").select("doc_id", "text", "source_id")
      .collect().map(_.toSeq)
    val b = FeedstockSource.flatten(feedstock).orderBy("doc_id")
      .select("doc_id", "text", "source_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }
}
