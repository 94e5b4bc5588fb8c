package graft.streaming

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.EnsembleArtifacts
import graft.operators.QualityModelOps

/** The composed ingest pipeline ([[IngestPipeline]]): feedstock
  * micro-batch read → fused quality gate → shard sink. Every stage is
  * pinned on its own; this spec pins the COMPOSITION'S end-to-end
  * exactly-once across a stop/restart — what lands in the shards is
  * exactly the batch gate's keep slice, each doc once, regardless of
  * where the stream was interrupted. */
class GatedIngestSpec extends SparkSpec {

  private def land(dir: String, wave: DataFrame, tag: String): Unit = {
    val stage = Files.createTempDirectory("gi-stage").toString
    graft.sources.FeedstockSource.fromDocuments(wave)
      .coalesce(2).write.mode("overwrite").json(stage)
    new File(stage).listFiles().filter(_.getName.endsWith(".json"))
      .sortBy(_.getName).zipWithIndex.foreach { case (f, i) =>
        f.renameTo(new File(f"$dir/feed-$tag-$i%03d.jsonl"))
      }
  }

  test("gated shards hold exactly the batch gate's keep slice, once, across a restart") {
    val docs = graft.Tables.documents(spark, sfDir)
    val (cb, cw) = QualityModelOps.lmModelOf(docs)
    val dsirModel = QualityModelOps.dsirModelOf(docs)
    val pplCuts = QualityModelOps.pplCutsOf(
      QualityModelOps.lmPerplexity(spark, sfDir)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")))
    val art = EnsembleArtifacts.of(cb, cw, pplCuts, dsirModel)

    val landing = Files.createTempDirectory("gi-landing").toString
    val shards = Files.createTempDirectory("gi-shards").toString + "/out"
    val ckpt = Files.createTempDirectory("gi-ckpt").toString

    // wave 1 → run → STOP (simulated interruption)
    land(landing, docs.filter(col("doc_id") % 3 =!= 0), "a")
    val q1 = IngestPipeline.start(spark, landing, art, shards, ckpt, nShards = 4)
    try q1.processAllAvailable() finally q1.stop()

    // wave 2 lands while the pipeline is down → restart from checkpoint
    land(landing, docs.filter(col("doc_id") % 3 === 0), "b")
    val q2 = IngestPipeline.start(spark, landing, art, shards, ckpt, nShards = 4)
    try q2.processAllAvailable() finally q2.stop()

    // a third restart with nothing new must add nothing
    val q3 = IngestPipeline.start(spark, landing, art, shards, ckpt, nShards = 4)
    try q3.processAllAvailable() finally q3.stop()

    val landed = spark.read.parquet(shards)
    val perDoc = landed.groupBy("doc_id").count().collect()
    perDoc.foreach(r => assert(r.getLong(1) == 1L,
      s"doc ${r.get(0)} landed ${r.getLong(1)} times"))

    val batchKeep = QualityModelOps.qualityEnsemble(spark, sfDir).collect()
      .filter(_.getAs[Boolean]("keep"))
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("ppl_bucket"), r.getAs[Boolean]("target_like")))).toMap
    val streamed = landed.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("ppl_bucket"), r.getAs[Boolean]("target_like")))).toMap
    assert(streamed.keySet == batchKeep.keySet,
      s"missing=${(batchKeep.keySet -- streamed.keySet).take(5)} " +
        s"extra=${(streamed.keySet -- batchKeep.keySet).take(5)}")
    streamed.foreach { case (id, v) => assert(v == batchKeep(id), s"doc $id audit") }
    assert(streamed.nonEmpty && streamed.size < docs.count())

    // shards carry the training payload: byte-fallback id streams,
    // zero OOV, decoding back to the document's own words
    val idRows = landed.select(col("doc_id"), col("token_ids"), col("text"))
      .collect()
    idRows.foreach { r =>
      val ids = r.getSeq[Int](1)
      assert(ids.nonEmpty && !ids.contains(-1), s"doc ${r.getLong(0)} ids")
      val decoded = new String(
        graft.operators.BpeOps.defaultIdMapBytes.decodeBytes(ids),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(decoded == r.getString(2).split(" ").filter(_.nonEmpty).mkString(""),
        s"doc ${r.getLong(0)} id stream does not decode to its text")
    }

    // shard membership is the batch writer's pure id-hash rule
    // (layout identity with writeShards is pinned in ShardWriterSpec);
    // here: every shard value is in range and deterministic
    val byShard = landed
      .select(col("doc_id"), col("shard"),
        pmod(xxhash64(col("doc_id")), lit(4)).cast("int").as("expect"))
      .collect()
    byShard.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"doc ${r.getLong(0)} shard assignment")
    }
  }
}
