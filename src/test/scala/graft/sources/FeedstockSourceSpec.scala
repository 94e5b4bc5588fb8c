package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeedstockSourceSpec extends SparkSpec {

  test("feedstock write/read round trip preserves records and partitions by dataset") {
    val docs = graft.Tables.documents(spark, sfDir)
    val feedstock = FeedstockSource.fromDocuments(docs)
    val tmp = java.nio.file.Files.createTempDirectory("feedstock").toString

    FeedstockSource.write(feedstock, tmp)
    // partition dirs named by dataset
    val dirs = new java.io.File(tmp).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("source_name=ds")))

    val back = FeedstockSource.flatten(FeedstockSource.read(spark, tmp))
    assert(back.count() == docs.count())
    // spot-check one record's payload survives the trip
    val one = back.filter(col("doc_id") === 1).collect()(0)
    val orig = docs.filter(col("doc_id") === 1).collect()(0)
    assert(one.getAs[String]("text") == orig.getAs[String]("text"))
    assert(one.getAs[String]("source_id") == "ds1_v2.0")
  }
}
