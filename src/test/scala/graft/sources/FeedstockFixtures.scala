package graft.sources

import org.apache.spark.sql.SparkSession

/** Shared test fixture: a feedstock directory written from the corpus. */
object FeedstockFixtures {
  def writtenDir(spark: SparkSession, sfDir: String, prefix: String): String = {
    val docs = graft.Tables.documents(spark, sfDir)
    val tmp = java.nio.file.Files.createTempDirectory(prefix).toString
    FeedstockSource.write(FeedstockSource.fromDocuments(docs), tmp)
    tmp
  }
}
