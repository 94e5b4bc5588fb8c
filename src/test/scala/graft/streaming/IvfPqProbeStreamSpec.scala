package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class IvfPqProbeStreamSpec extends SparkSpec {

  private val ops = graft.operators.AnnOps

  test("streaming IVFADC probe matches the batch ADC top-k on the same index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (cents, cb, encoded) = ops.ivfpqFor(spark, sfDir)
    val encArrays = ops.ivfpqEncodedArrays(encoded).localCheckpoint()
    val queries = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < ops.nQueries)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val stream = MemoryStream[(Long, Seq[Float])]
    stream.addData(queries.toSeq)
    val q = EventStream.ivfpqProbeStream(
        stream.toDF().toDF("vec_id", "embedding"), cents, cb, encArrays)
      .writeStream.format("memory").queryName("ivfpqprobe")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("ivfpqprobe").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val batch = ops.annIvfPqAdcTopk(
        ops.embeddingsWithNorm(spark, sfDir).filter(col("vec_id") < ops.nQueries),
        cents, cb, encArrays).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(batch.nonEmpty && got == batch,
      s"stream-only ${got.diff(batch).size}, batch-only ${batch.diff(got).size}")
  }

  test("ADC-only ranking agrees with the reranked IVFADC row above a floor") {
    val (cents, cb, encoded) = ops.ivfpqFor(spark, sfDir)
    val encArrays = ops.ivfpqEncodedArrays(encoded)
    val adc = ops.annIvfPqAdcTopk(
        ops.embeddingsWithNorm(spark, sfDir).filter(col("vec_id") < ops.nQueries),
        cents, cb, encArrays).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val reranked = ops.annIvfPq(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(adc.nonEmpty && reranked.nonEmpty)
    // the reranked row exact-scores a 50-candidate shortlist; ADC-only
    // top-5 ranks by quantized distance, so agreement is partial by
    // design — the floor guards against the fold/grid drifting from
    // the LUT path entirely.
    val agree = (adc intersect reranked).size.toDouble / reranked.size
    assert(agree >= 0.3, s"ADC vs reranked agreement $agree")
  }

  test("array pivot is lossless: codes equal the row-form encoding") {
    val (_, _, encoded) = ops.ivfpqFor(spark, sfDir)
    val arrays = ops.ivfpqEncodedArrays(encoded).collect()
      .map(r => (r.getLong(1), (r.getLong(0), r.getSeq[Int](2)))).toMap
    val rows = encoded.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Int]("subspace"), r.getAs[Int]("code")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (vid, rs) =>
      val (cid, codes) = arrays(vid)
      assert(rs.forall(_._2 == cid))
      rs.foreach { case (_, _, sub, code) =>
        assert(codes(sub) == code, s"vec $vid subspace $sub")
      }
    }
  }
}
