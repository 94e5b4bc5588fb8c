package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.BpeOps

class TokenRateStreamSpec extends SparkSpec {

  test("per-window per-source token throughput matches a batch replay of the encoder") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // spread docs across three 1-hour windows by doc_id
    val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val rows = docs.map { case (id, src, text) =>
      (src, text, new Timestamp(base + (id % 3) * 3600000L))
    }

    val stream = MemoryStream[(String, String, Timestamp)]
    stream.addData(rows.toSeq)
    val q = EventStream.tokenRateStream(
        stream.toDF().toDF("source", "text", "ts"))
      .writeStream.format("memory").queryName("token_rate")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("token_rate").collect()
      .map(r => (r.getAs[Timestamp]("w_start"), r.getAs[String]("source")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap

    val batch = rows.groupBy(r => (new Timestamp(r._3.getTime / 3600000L * 3600000L), r._1))
      .map { case (k, rs) =>
        k -> ((rs.length.toLong,
          rs.map(_._2.split(" ").filter(_.nonEmpty)
            .flatMap(BpeOps.defaultModel.encodeWord).length.toLong).sum))
      }

    assert(streamed.keySet == batch.keySet)
    assert(streamed.nonEmpty && streamed.keys.map(_._1).toSet.size == 3)
    streamed.foreach { case (k, v) => assert(v == batch(k), s"window/source $k") }
  }
}
