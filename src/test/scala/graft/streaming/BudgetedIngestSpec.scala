package graft.streaming

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.EnsembleArtifacts
import graft.operators.{BpeOps, QualityModelOps}

/** The quota-enforcing ingest pipeline ([[IngestPipeline.startBudgeted]]):
  * feedstock read → fused gate → per-source token-budget admission →
  * shard sink. Pins that the landed set equals a host-side replay of
  * the contract — the batch gate's keep slice, admitted per source in
  * Lehmer order while the id-mass quota lasts — each doc once, with a
  * restart on nothing new adding nothing. */
class BudgetedIngestSpec extends SparkSpec {

  private def land(dir: String, wave: DataFrame, tag: String): Unit = {
    val stage = Files.createTempDirectory("bi-stage").toString
    graft.sources.FeedstockSource.fromDocuments(wave)
      .coalesce(2).write.mode("overwrite").json(stage)
    new File(stage).listFiles().filter(_.getName.endsWith(".json"))
      .sortBy(_.getName).zipWithIndex.foreach { case (f, i) =>
        f.renameTo(new File(f"$dir/feed-$tag-$i%03d.jsonl"))
      }
  }

  test("budgeted shards hold exactly the replayed quota slice, once") {
    val docs = graft.Tables.documents(spark, sfDir)
    val (cb, cw) = QualityModelOps.lmModelOf(docs)
    val pplCuts = QualityModelOps.pplCutsOf(
      QualityModelOps.lmPerplexity(spark, sfDir)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")))
    val art = EnsembleArtifacts.of(cb, cw, pplCuts,
      QualityModelOps.dsirModelOf(docs))

    // host-side ground truth: the batch gate's keep slice with each
    // doc's stored-id mass, then per-source Lehmer-order admission
    val keep = QualityModelOps.qualityEnsemble(spark, sfDir).collect()
      .filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("doc_id")).toSet
    val idLen = docs
      .select(col("doc_id"), col("source"),
        size(BpeOps.bpeTokenIds(
          filter(split(col("text"), " "), w => length(w) > 0),
          BpeOps.defaultModel, BpeOps.defaultIdMapBytes)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong))
      .filter(t => keep(t._1))
    val budgets = idLen.groupBy(_._2).map { case (s, rs) =>
      s -> (rs.map(_._3).sum >> 1)
    }
    val expected = idLen.groupBy(_._2).toSeq.flatMap { case (s, rs) =>
      var spent = 0L
      rs.sortBy(t => (BpeOps.lehmerKey(t._1), t._1)).toSeq.flatMap {
        case (id, _, n) =>
          val admit = spent < budgets(s)
          spent += n
          if (admit) Some(id) else None
      }
    }.toSet

    val landing = Files.createTempDirectory("bi-landing").toString
    val shards = Files.createTempDirectory("bi-shards").toString + "/out"
    val ckpt = Files.createTempDirectory("bi-ckpt").toString
    land(landing, docs, "a")
    val q1 = IngestPipeline.startBudgeted(
      spark, landing, art, budgets, shards, ckpt, nShards = 4)
    try q1.processAllAvailable() finally q1.stop()
    // restart with nothing new adds nothing
    val q2 = IngestPipeline.startBudgeted(
      spark, landing, art, budgets, shards, ckpt, nShards = 4)
    try q2.processAllAvailable() finally q2.stop()

    val landed = spark.read.parquet(shards)
    val perDoc = landed.groupBy("doc_id").count().collect()
    perDoc.foreach(r => assert(r.getLong(1) == 1L, s"doc ${r.get(0)} dup"))
    val got = landed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    // the quota bit: landed id mass per source within one doc of budget
    val massBySource = landed
      .select(col("source"), size(col("token_ids")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("mass")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    massBySource.foreach { case (s, m) =>
      val maxDoc = idLen.filter(_._2 == s).map(_._3).max
      assert(m <= budgets(s) + maxDoc, s"$s over quota: $m vs ${budgets(s)}")
    }
    assert(got.nonEmpty && got.size < keep.size) // the quota actually cut
  }
}
