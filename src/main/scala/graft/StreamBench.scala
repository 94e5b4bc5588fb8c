package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, PipelineOps, QualityModelOps, SearchOps}
import graft.streaming.EventStream

/** Streaming-throughput diagnostic: pushes a `MULT`× duplicated
  * document corpus through each trained-model scorer / standing-index
  * probe and reports docs/second end-to-end (model training excluded —
  * the artifacts are built once up front, the deployed lifecycle).
  * Not part of the driver contract; complements `Stress` (batch
  * scale headroom) with the streaming side. Run:
  *   SPARK_GRAFT_MULT=4 sbt "runMain graft.StreamBench /root/testdata/sf0.1"
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.tune(spark)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = Tables.documents(spark, srcDir)
    val shift = 100000000L
    val rows: Seq[(Long, String)] = (0 until mult).flatMap { i =>
      docs.select(col("doc_id") + lit(i * shift), col("text"))
        .as[(Long, String)].collect()
    }

    // ---- standing artifacts, trained once up front
    val dsirModel = QualityModelOps.dsirModelOf(docs).localCheckpoint()
    val (cb, cw) = QualityModelOps.lmModelOf(docs)
    val (cbM, cwM) = (cb.localCheckpoint(), cw.localCheckpoint())
    val (bm25Df, bm25Stats) = SearchOps.bm25ModelOf(docs, "doc_id", "text",
      SearchOps.queryTerms)
    val (bm25DfM, bm25StatsM) = (bm25Df.localCheckpoint(), bm25Stats.localCheckpoint())
    val hs = DedupOps.shingleHashes(spark, srcDir)
    val bench = hs.filter(col("doc_id") % 97 === 0).localCheckpoint()
    val bloom = PipelineOps.evalBloomOf(bench)
    val windowIdx = DedupOps.windowFreqOf(docs, "doc_id", "text",
      DedupOps.substringW).localCheckpoint()

    def run(name: String, mode: String)(f: DataFrame => DataFrame): Unit = {
      val stream = MemoryStream[(Long, String)]
      stream.addData(rows)
      val q = f(stream.toDF().toDF("doc_id", "text"))
        .writeStream.format("noop").outputMode(mode).start()
      val t0 = System.nanoTime()
      try q.processAllAvailable() finally q.stop()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== $name%-22s ${rows.size}%8d docs  $dt%7.2f s  ${rows.size / dt}%9.0f docs/s")
    }

    run("dsir_score", "append")(df => EventStream.dsirScoreStream(df, dsirModel))
    run("dsir_score_join", "update")(df => EventStream.dsirScoreStreamJoin(df, dsirModel))
    run("lm_score", "append")(df => EventStream.lmScoreStream(df, cbM, cwM))
    run("lm_score_join", "update")(df => EventStream.lmScoreStreamJoin(df, cbM, cwM))
    run("bm25_score", "append")(df =>
      EventStream.bm25ScoreStream(df, bm25DfM, bm25StatsM))
    run("contamination", "update")(df =>
      EventStream.contaminationStream(df, bench, bloom, PipelineOps.contaminationFrac))
    run("substring_cut", "update")(df =>
      EventStream.substringCutStream(df, windowIdx, DedupOps.substringW))
    run("heavy_hitters", "update")(df =>
      EventStream.heavyHitterStream(df, 32))

    // ---- ingest token-rate monitor ((source, text, ts) stream; one
    // watermarked (window, source) agg over the native BPE encoder)
    locally {
      val trRows: Seq[(String, String, java.sql.Timestamp)] =
        (0 until mult).flatMap { i =>
          docs.select(col("source"), col("text"))
            .as[(String, String)].collect()
            .map { case (src, text) =>
              (src, text, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
            }
        }
      val stream = MemoryStream[(String, String, java.sql.Timestamp)]
      stream.addData(trRows)
      val q = EventStream.tokenRateStream(
          stream.toDF().toDF("source", "text", "ts"))
        .writeStream.format("noop").outputMode("update").start()
      val t0 = System.nanoTime()
      try q.processAllAvailable() finally q.stop()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== ${"token_rate"}%-22s ${trRows.size}%8d docs  $dt%7.2f s  ${trRows.size / dt}%9.0f docs/s")
    }

    // ---- the full quality-ensemble gate (doc_id, lang, text stream;
    // all four model artifacts broadcast, one stateful rollup)
    locally {
      val pplCuts = QualityModelOps.pplCutsOf(
        QualityModelOps.lmPerplexity(spark, srcDir)
          .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")))
        .localCheckpoint()
      val enRows: Seq[(Long, String, String)] = (0 until mult).flatMap { i =>
        docs.select(col("doc_id") + lit(i * shift), col("lang"), col("text"))
          .as[(Long, String, String)].collect()
      }
      val stream = MemoryStream[(Long, String, String)]
      stream.addData(enRows)
      val q = EventStream.qualityEnsembleStream(
          stream.toDF().toDF("doc_id", "lang", "text"),
          cbM, cwM, pplCuts, dsirModel)
        .writeStream.format("noop").outputMode("update").start()
      val t0 = System.nanoTime()
      try q.processAllAvailable() finally q.stop()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== ${"quality_ensemble"}%-22s ${enRows.size}%8d docs  $dt%7.2f s  ${enRows.size / dt}%9.0f docs/s")

      // the fused native scorer over the identical artifacts/stream
      val art = graft.functions.EnsembleArtifacts.of(cbM, cwM, pplCuts, dsirModel)
      val stream3 = MemoryStream[(Long, String, String)]
      stream3.addData(enRows)
      val q3 = EventStream.qualityEnsembleStreamFused(
          stream3.toDF().toDF("doc_id", "lang", "text"), art)
        .writeStream.format("noop").outputMode("append").start()
      val t3 = System.nanoTime()
      try q3.processAllAvailable() finally q3.stop()
      val dt3 = (System.nanoTime() - t3) / 1e9
      println(f"== ${"quality_ens_fused"}%-22s ${enRows.size}%8d docs  $dt3%7.2f s  ${enRows.size / dt3}%9.0f docs/s")
    }

    // ---- token-budget admission gate ((doc_id, source, text) stream;
    // native-encoder counts map-side, ONE O(sources) keyed state)
    locally {
      val budgets = docs
        .withColumn("n_tokens", size(graft.operators.BpeOps.bpeTokens(
          filter(split(col("text"), " "), w => length(w) > 0))).cast("long"))
        .groupBy("source").agg(sum("n_tokens").as("t")).collect()
        .map(r => r.getString(0) -> (r.getLong(1) >> 1)).toMap
      val bgRows: Seq[(Long, String, String)] = (0 until mult).flatMap { i =>
        docs.select(col("doc_id") + lit(i * shift), col("source"), col("text"))
          .as[(Long, String, String)].collect()
      }
      val stream = MemoryStream[(Long, String, String)]
      stream.addData(bgRows)
      val q = EventStream.tokenBudgetGateStream(
          stream.toDF().toDF("doc_id", "source", "text"), budgets)
        .writeStream.format("noop").outputMode("append").start()
      val t0 = System.nanoTime()
      try q.processAllAvailable() finally q.stop()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== ${"token_budget_gate"}%-22s ${bgRows.size}%8d docs  $dt%7.2f s  ${bgRows.size / dt}%9.0f docs/s")
    }

    // ---- streaming Hamming-sketch ANN probe against the banded sign-
    // sketch index (vectors/s: per query, eight 8-bit bucket joins +
    // one windowed top-k rollup — no floats until the rerank join)
    locally {
      import graft.operators.AnnOps
      val e = AnnOps.embeddingsWithNorm(spark, srcDir).localCheckpoint()
      val bands = AnnOps.sketchBandsOf(e).localCheckpoint()
      val vecRows: Seq[(Long, Seq[Float])] = (0 until mult).flatMap { i =>
        Tables.embeddings(spark, srcDir)
          .select(col("vec_id") + lit(i * shift), col("embedding"))
          .as[(Long, Seq[Float])].collect()
      }
      val stream = MemoryStream[(Long, Seq[Float])]
      stream.addData(vecRows)
      val q = EventStream.hammingProbeStream(
          stream.toDF().toDF("vec_id", "embedding"), bands, e)
        .writeStream.format("noop").outputMode("update").start()
      val t0 = System.nanoTime()
      try q.processAllAvailable() finally q.stop()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== ${"hamming_probe"}%-22s ${vecRows.size}%8d vecs  $dt%7.2f s  ${vecRows.size / dt}%9.0f vecs/s")
    }

    // ---- streaming ANN probe against the plain IVF inverted file
    locally {
      import graft.operators.AnnOps
      val (cents, assigned) = AnnOps.ivfFor(spark, srcDir)
      val (centsM, assignedM) = (cents.localCheckpoint(), assigned.localCheckpoint())
      val vecRows: Seq[(Long, Seq[Float])] = (0 until mult).flatMap { i =>
        Tables.embeddings(spark, srcDir)
          .select(col("vec_id") + lit(i * shift), col("embedding"))
          .as[(Long, Seq[Float])].collect()
      }
      val stream = MemoryStream[(Long, Seq[Float])]
      stream.addData(vecRows)
      val q = EventStream.annProbeStream(
          stream.toDF().toDF("vec_id", "embedding"), centsM, assignedM)
        .writeStream.format("noop").outputMode("update").start()
      val t0 = System.nanoTime()
      try q.processAllAvailable() finally q.stop()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== ${"ann_probe"}%-22s ${vecRows.size}%8d vecs  $dt%7.2f s  ${vecRows.size / dt}%9.0f vecs/s")
    }

    // ---- streaming IVFADC probe against the compressed index
    // (vectors/s: map-side probes + one cluster equi-join + per-query
    // rollup; the corpus side is codes, never floats)
    locally {
      import graft.operators.AnnOps
      val (cents, cb, _) = AnnOps.ivfpqFor(spark, srcDir)
      // the cluster-bucketed standing index (repartitioned on the probe
      // join's key before materialization — the persisted layout), so
      // each micro-batch's stream-static join reads the index side
      // already placed instead of re-exchanging it per batch
      val encArrays = AnnOps.ivfpqArraysFor(spark, srcDir)
      val vecRows: Seq[(Long, Seq[Float])] = (0 until mult).flatMap { i =>
        Tables.embeddings(spark, srcDir)
          .select(col("vec_id") + lit(i * shift), col("embedding"))
          .as[(Long, Seq[Float])].collect()
      }
      val stream = MemoryStream[(Long, Seq[Float])]
      stream.addData(vecRows)
      val q = EventStream.ivfpqProbeStream(
          stream.toDF().toDF("vec_id", "embedding"), cents, cb, encArrays)
        .writeStream.format("noop").outputMode("update").start()
      val t0 = System.nanoTime()
      try q.processAllAvailable() finally q.stop()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== ${"ivfpq_probe"}%-22s ${vecRows.size}%8d vecs  $dt%7.2f s  ${vecRows.size / dt}%9.0f vecs/s")
    }

    // ---- stateful per-user transition feed over the event stream
    // (events/s, not docs/s: the state is one record per user)
    locally {
      val evRows: Seq[EventStream.TEv] = (0 until mult).flatMap { i =>
        Tables.events(spark, srcDir)
          .select(col("user_id") + lit(i * shift), col("event_id") + lit(i * shift),
            col("ts"), col("event_type"))
          .as[(Long, Long, java.sql.Timestamp, String)].collect()
          .map(t => EventStream.TEv(t._1, t._2, t._3, t._4))
      }
      val stream = MemoryStream[EventStream.TEv]
      stream.addData(evRows)
      val q = EventStream.transitionStream(stream.toDS())
        .writeStream.format("noop").outputMode("append").start()
      val t0 = System.nanoTime()
      try q.processAllAvailable() finally q.stop()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== ${"transitions"}%-22s ${evRows.size}%8d evs   $dt%7.2f s  ${evRows.size / dt}%9.0f evs/s")
    }

    // ---- feedstock connector streaming ingest: the corpus written as
    // a flat JSON-lines landing dir (64 files), stream-read end to end
    // with pruning pushed to the per-file readers
    locally {
      val landing = java.nio.file.Files
        .createTempDirectory("graft-sb-feed").toString
      val feed = graft.sources.FeedstockSource.fromDocuments(
        (0 until mult).map(i =>
          docs.withColumn("doc_id", col("doc_id") + lit(i * shift)))
          .reduce(_ union _))
      val n = feed.count()
      feed.repartition(64).write.mode("overwrite").json(s"$landing/_stage")
      // rename spark's part files into the monotonic landing layout
      val stage = new java.io.File(s"$landing/_stage").listFiles()
        .filter(f => f.getName.endsWith(".json"))
      stage.zipWithIndex.foreach { case (f, i) =>
        f.renameTo(new java.io.File(f"$landing/feed-$i%05d.jsonl"))
      }
      val q = spark.readStream.format("graft-feedstock").load(landing)
        .select(col("record.doc_id"), col("record.text"))
        .writeStream.format("noop").outputMode("append").start()
      val t0 = System.nanoTime()
      try q.processAllAvailable() finally q.stop()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== ${"feedstock_ingest"}%-22s $n%8d docs  $dt%7.2f s  ${n / dt}%9.0f docs/s")

      // the COMPOSED pipeline over the same landing dir: feedstock
      // micro-batch read → fused quality gate → shard sink to disk
      val pplCuts = QualityModelOps.pplCutsOf(
        QualityModelOps.lmPerplexity(spark, srcDir)
          .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")))
        .localCheckpoint()
      val art = graft.functions.EnsembleArtifacts.of(cbM, cwM, pplCuts, dsirModel)
      val shardDir = java.nio.file.Files
        .createTempDirectory("graft-sb-shards").toString + "/out"
      val ckptDir = java.nio.file.Files
        .createTempDirectory("graft-sb-ckpt").toString
      val qp = graft.streaming.IngestPipeline.start(
        spark, landing, art, shardDir, ckptDir, nShards = 8)
      val tp = System.nanoTime()
      try qp.processAllAvailable() finally qp.stop()
      val dtp = (System.nanoTime() - tp) / 1e9
      println(f"== ${"ingest_pipeline"}%-22s $n%8d docs  $dtp%7.2f s  ${n / dtp}%9.0f docs/s")

      // the quota-enforcing variant: gate → per-source token budget →
      // shards (budgets = half of each source's corpus token mass)
      val budgets = docs
        .withColumn("n", size(graft.operators.BpeOps.bpeTokenIds(
          filter(split(col("text"), " "), w => length(w) > 0),
          graft.operators.BpeOps.defaultModel,
          graft.operators.BpeOps.defaultIdMapBytes)).cast("long"))
        .groupBy("source").agg(sum("n").as("t")).collect()
        .map(r => r.getString(0) -> (r.getLong(1) >> 1)).toMap
      val shardDirB = java.nio.file.Files
        .createTempDirectory("graft-sb-shards-b").toString + "/out"
      val ckptDirB = java.nio.file.Files
        .createTempDirectory("graft-sb-ckpt-b").toString
      val qb = graft.streaming.IngestPipeline.startBudgeted(
        spark, landing, art, budgets, shardDirB, ckptDirB, nShards = 8)
      val tb = System.nanoTime()
      try qb.processAllAvailable() finally qb.stop()
      val dtb = (System.nanoTime() - tb) / 1e9
      println(f"== ${"ingest_budgeted"}%-22s $n%8d docs  $dtb%7.2f s  ${n / dtb}%9.0f docs/s")
    }
    spark.stop()
  }
}
