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
}
