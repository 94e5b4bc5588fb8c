package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{DedupOps, PipelineOps}

class ContaminationStreamSpec extends SparkSpec {

  test("streaming bloom decontamination matches the batch gate per doc") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hs = DedupOps.shingleHashes(spark, sfDir)
    val bench = hs.filter(col("doc_id") % 97 === 0)
    val bloom = PipelineOps.evalBloomOf(bench)
    // the static side of the stream-static verify join
    val benchShingles = bench.localCheckpoint()

    val corpusDocs = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("text"))

    val stream = MemoryStream[(Long, String)]
    stream.addData(corpusDocs.as[(Long, String)].collect().toSeq)
    val q = EventStream.contaminationStream(
        stream.toDF().toDF("doc_id", "text"), benchShingles, bloom,
        PipelineOps.contaminationFrac)
      .writeStream.format("memory").queryName("contam_stream")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("contam_stream").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_shingles"),
        r.getAs[Long]("n_overlap"), r.getAs[Boolean]("contaminated"))).toSet
    val batch = PipelineOps.contamination(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(4))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("append mode works: the watermark finalizes earlier batches' windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hs = DedupOps.shingleHashes(spark, sfDir)
    val bench = hs.filter(col("doc_id") % 97 === 0)
    val bloom = PipelineOps.evalBloomOf(bench)
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq

    val stream = MemoryStream[(Long, String)]
    val q = EventStream.contaminationStream(
        stream.toDF().toDF("doc_id", "text"), bench.localCheckpoint(), bloom,
        PipelineOps.contaminationFrac,
        windowDur = "1 second", watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("contam_append")
      .outputMode("append").start()
    try {
      stream.addData(docs)
      q.processAllAvailable()
      val emptyBefore = spark.table("contam_append").count()
      // a later batch's timestamp advances the watermark past batch-1's
      // 1-second window, finalizing it for append
      Thread.sleep(3000)
      stream.addData(Seq((docs.head._1 + 1000000L, "closing batch doc text words")))
      q.processAllAvailable()
      Thread.sleep(3000)
      stream.addData(Seq((docs.head._1 + 1000001L, "one more to advance again")))
      q.processAllAvailable()
      val emitted = spark.table("contam_append")
        .filter(col("doc_id") < 1000000L).count()
      assert(emitted == docs.size,
        s"append must emit batch-1's ${docs.size} finalized rows (before: $emptyBefore, after: $emitted)")
    } finally q.stop()
  }
}
