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
}
