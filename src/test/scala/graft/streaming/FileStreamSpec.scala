package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming ingest from files — the readStream path a production deploy
  * uses (events landing as files in a bucket), including the nanos
  * timestamp handling the batch loader does.
  */
class FileStreamSpec extends SparkSpec {

  test("file-source streaming tumbling counts match batch") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tmp = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      tmp.resolve("events.parquet"))

    val rawSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stream = spark.readStream.schema(rawSchema).parquet(tmp.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

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
