package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The DSv2 connector's streaming read path: micro-batches advance a
  * high-water-mark file offset, recovery replays from the checkpoint,
  * and column pruning + filter pushdown reach the streaming readers
  * exactly as in batch (same reader factory). */
class FeedstockStreamSpec extends SparkSpec {

  private def line(id: Long, text: String, lang: String = "en"): String =
    s"""{"mdf":{"source_id":"ds${id % 4}_v1.0","source_name":"ds${id % 4}",""" +
      s""""version":1,"resource_type":"record"},""" +
      s""""record":{"doc_id":$id,"text":"$text","lang":"$lang"}}"""

  private def writeFile(dir: String, name: String, lines: Seq[String]): Unit =
    Files.writeString(Paths.get(dir, name), lines.mkString("", "\n", "\n"))

  test("micro-batches ingest new files incrementally by the high-water mark") {
    val dir = Files.createTempDirectory("graft-feed-stream").toString
    writeFile(dir, "feed-000.jsonl", (0L to 4L).map(i => line(i, s"alpha $i")))
    writeFile(dir, "feed-001.jsonl", (5L to 7L).map(i => line(i, s"beta $i")))

    val q = spark.readStream.format("graft-feedstock").load(dir)
      .select(col("record.doc_id").as("doc_id"), col("record.text").as("text"))
      .writeStream.format("memory").queryName("feed_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val wave1 = spark.table("feed_stream").collect().map(_.getLong(0)).sorted
      assert(wave1.toSeq == (0L to 7L), wave1.mkString(","))

      // a later-sorting file arrives → exactly its rows land, once
      writeFile(dir, "feed-002.jsonl", (8L to 9L).map(i => line(i, s"gamma $i")))
      q.processAllAvailable()
      val wave2 = spark.table("feed_stream").collect().map(_.getLong(0)).sorted
      assert(wave2.toSeq == (0L to 9L), wave2.mkString(","))
    } finally q.stop()
  }

  test("files under hidden/staging subdirectories are never ingested") {
    val dir = Files.createTempDirectory("graft-feed-hidden").toString
    writeFile(dir, "feed-000.jsonl", (0L to 2L).map(i => line(i, s"alpha $i")))
    // a staging tree whose LEAF names look like data files: the
    // recursive listing must reject them by the hidden path COMPONENT
    Files.createDirectories(Paths.get(dir, "_stage"))
    writeFile(s"$dir/_stage", "part-000.json", Seq(line(99L, "staged")))
    Files.createDirectories(Paths.get(dir, ".tmp", "nested"))
    writeFile(s"$dir/.tmp/nested", "feed-999.jsonl", Seq(line(98L, "tmp")))

    val q = spark.readStream.format("graft-feedstock").load(dir)
      .select(col("record.doc_id").as("doc_id"))
      .writeStream.format("memory").queryName("feed_hidden")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("feed_hidden").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == (0L to 2L), ids.mkString(","))
    } finally q.stop()
  }

  test("restart from the checkpoint ingests only files beyond the committed offset") {
    val dir = Files.createTempDirectory("graft-feed-restart").toString
    val ckpt = Files.createTempDirectory("graft-feed-ckpt").toString
    val out = Files.createTempDirectory("graft-feed-out").toString
    writeFile(dir, "feed-000.jsonl", (0L to 3L).map(i => line(i, s"alpha $i")))

    def run(): Unit = {
      val q = spark.readStream.format("graft-feedstock").load(dir)
        .select(col("record.doc_id").as("doc_id"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }

    run()
    assert(spark.read.parquet(out).count() == 4)

    writeFile(dir, "feed-001.jsonl", (4L to 6L).map(i => line(i, s"beta $i")))
    run()
    // exactly-once across the restart: the committed offset keeps the
    // first file from re-ingesting — no duplicates, just the new rows
    val all = spark.read.parquet(out).collect().map(_.getLong(0)).sorted
    assert(all.toSeq == (0L to 6L), all.mkString(","))
  }

  test("maxFilesPerTrigger paces catch-up into multiple micro-batches") {
    val dir = Files.createTempDirectory("graft-feed-pace").toString
    (0 until 5).foreach { k =>
      writeFile(dir, f"feed-$k%03d.jsonl",
        Seq(line(k.toLong, s"doc $k")))
    }
    val q = spark.readStream.format("graft-feedstock")
      .option("maxFilesPerTrigger", "2").load(dir)
      .select(col("record.doc_id").as("doc_id"))
      .writeStream.format("memory").queryName("feed_paced")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("feed_paced").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == (0L to 4L), got.mkString(","))
      // 5 files at 2 per trigger → at least 3 data batches committed
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 3, q.recentProgress.map(_.numInputRows).mkString(","))
    } finally q.stop()
  }

  test("streaming scan prunes columns and pushes filters like batch") {
    val dir = Files.createTempDirectory("graft-feed-push").toString
    writeFile(dir, "feed-000.jsonl", (0L to 9L).map(i => line(i, s"doc $i")))

    val stream = spark.readStream.format("graft-feedstock").load(dir)
      .select(col("record.doc_id").as("doc_id"))
      .filter(col("doc_id") > 5L)
    val q = stream.writeStream.format("memory").queryName("feed_pushed")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("feed_pushed").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == (6L to 9L), got.mkString(","))
      // the executed plan carries the pruned/pushed scan description
      val desc = q.lastProgress.sources.head.description
      assert(desc.contains("graft-feedstock"), desc)
    } finally q.stop()
  }
}
