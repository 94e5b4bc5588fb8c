package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ShardWriterSpec extends SparkSpec {

  private def shardFiles(dir: String, shard: Int): Seq[java.io.File] =
    new java.io.File(s"$dir/shard=$shard").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).toSeq

  test("one file per shard, hash-balanced, every doc exactly once") {
    val out = Files.createTempDirectory("shards").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val n = docs.count()
    ShardWriter.writeShards(docs, "doc_id", out, nShards = 4)

    (0 until 4).foreach { s =>
      assert(shardFiles(out, s).size == 1, s"shard $s must be one file")
    }
    val back = spark.read.parquet(out)
    assert(back.count() == n)
    assert(back.select("doc_id").distinct().count() == n)
    val sizes = back.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length == 4)
    val avg = n.toDouble / 4
    sizes.foreach(sz => assert(sz > avg / 2 && sz < avg * 2,
      s"shard sizes ${sizes.mkString(",")} not hash-balanced"))
  }

  test("re-runs produce identical shard membership and order") {
    val out1 = Files.createTempDirectory("shards1").toString
    val out2 = Files.createTempDirectory("shards2").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    ShardWriter.writeShards(docs, "doc_id", out1, nShards = 4)
    // second write from a differently-partitioned frame: layout must
    // not depend on the input's incoming partitioning
    ShardWriter.writeShards(docs.repartition(7), "doc_id", out2, nShards = 4)
    (0 until 4).foreach { s =>
      def ids(dir: String) = spark.read
        .parquet(shardFiles(dir, s).head.getPath)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(ids(out1) == ids(out2), s"shard $s differs between runs")
    }
  }

  test("streaming shard sink lands every kept doc once, batch-idempotent, batch-local layout equals the batch writer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("stream-shards").toString
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val (half1, half2) = docs.splitAt(docs.size / 2)

    val stream = MemoryStream[(Long, String)]
    val q = ShardWriter.shardSink(
        stream.toDF().toDF("doc_id", "text"), "doc_id", out, nShards = 4)
      .option("checkpointLocation",
        Files.createTempDirectory("shard-ckpt").toString)
      .start()
    try {
      stream.addData(half1); q.processAllAvailable()
      stream.addData(half2); q.processAllAvailable()
    } finally q.stop()

    // every doc exactly once across batches, shard dirs per batch
    val back = spark.read.parquet(out)
    assert(back.count() == docs.size)
    assert(back.select("doc_id").distinct().count() == docs.size)
    assert(back.select("batch").distinct().count() >= 2)

    // batch-local layout is writeShards verbatim: re-shard batch 0's
    // rows through the batch writer and compare file-order ids per shard
    val b0 = spark.read.parquet(s"$out/batch=0")
    val twin = Files.createTempDirectory("twin").toString
    ShardWriter.writeShards(b0.drop("shard"), "doc_id", twin, nShards = 4)
    (0 until 4).foreach { s =>
      def ids(dir: String) = spark.read
        .parquet(shardFiles(dir, s).head.getPath)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(ids(s"$out/batch=0") == ids(twin), s"shard $s layout differs")
    }

    // idempotency: rewriting the same batch id replaces, never appends
    ShardWriter.writeShards(b0.drop("shard"), "doc_id", s"$out/batch=0", 4)
    assert(spark.read.parquet(out).count() == docs.size)
  }
}
