package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming ingest from files — the readStream path a production deploy
  * uses (events landing as files in a bucket), with the same
  * physical-encoding adaptation the batch loader does (Tables.eventsStream).
  */
class FileStreamSpec extends SparkSpec {

  test("file-source streaming tumbling counts match batch") {
    val tmp = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      tmp.resolve("events.parquet"))

    val stream = graft.Tables.eventsStream(spark, tmp.toString)

    val q = EventStream.tumblingCounts(stream)
      .writeStream.format("memory").queryName("file_tumbling")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("file_tumbling").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val expected = graft.Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected)
  }
}
