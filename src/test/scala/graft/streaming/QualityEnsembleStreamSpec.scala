package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.QualityModelOps

class QualityEnsembleStreamSpec extends SparkSpec {

  test("streaming ensemble verdicts are row-identical to the batch gate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sfDir)

    // the batch-trained standing artifacts the stream broadcasts
    val (cb, cw) = QualityModelOps.lmModelOf(docs)
    val dsirModel = QualityModelOps.dsirModelOf(docs)
    val pplCuts = QualityModelOps.pplCutsOf(
      QualityModelOps.lmPerplexity(spark, sfDir)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")))

    // split across MICRO-BATCHES: a doc's verdict must not depend on
    // what else shared its batch (all model state is broadcast, the
    // only grouping is per-doc)
    val rows = docs.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().toSeq
    val (h1, h2) = rows.splitAt(rows.size / 3)
    val stream = MemoryStream[(Long, String, String)]
    val q = EventStream.qualityEnsembleStream(
        stream.toDF().toDF("doc_id", "lang", "text"),
        cb, cw, pplCuts, dsirModel)
      .writeStream.format("memory").queryName("quality_ensemble_stream")
      .outputMode("update").start()
    try {
      stream.addData(h1); q.processAllAvailable()
      stream.addData(h2); q.processAllAvailable()
    } finally q.stop()

    def verdicts(rows: Array[org.apache.spark.sql.Row]) =
      rows.map { r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[Boolean]("gopher_keep"),
            Option(r.getAs[java.lang.Boolean]("rep_flag")),
            r.getAs[String]("ppl_bucket"),
            r.getAs[Boolean]("target_like"),
            r.getAs[Boolean]("keep")))
      }.toMap

    val streamed = verdicts(spark.table("quality_ensemble_stream").collect())
    val batch = verdicts(
      QualityModelOps.qualityEnsemble(spark, sfDir).collect())

    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (id, v) =>
      assert(v == batch(id), s"doc $id: stream $v vs batch ${batch(id)}")
    }
    // the gate discriminates on this corpus (not vacuously all-keep)
    assert(streamed.values.exists(_._5) && streamed.values.exists(!_._5))
  }

  test("map-side repetition struct equals the batch aggregation per doc") {
    val docs = graft.Tables.documents(spark, sfDir)
    val mapSide = docs
      .withColumn("r", graft.functions.TextFunctions.repetitionStructCol)
      .select(col("doc_id"), col("r.dup_word_frac").as("dup_word_frac"),
        col("r.top_bigram_frac").as("top_bigram_frac"),
        col("r.flagged").as("flagged"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), Option(r.getAs[java.lang.Double](2)),
          Option(r.getAs[java.lang.Boolean](3))))).toMap
    val batch = graft.functions.TextFunctions.repetitionScore(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), Option(r.getAs[java.lang.Double](2)),
          Option(r.getAs[java.lang.Boolean](3))))).toMap
    assert(mapSide.keySet == batch.keySet)
    mapSide.foreach { case (id, v) =>
      assert(v == batch(id), s"doc $id: map-side $v vs batch ${batch(id)}")
    }
  }
}
