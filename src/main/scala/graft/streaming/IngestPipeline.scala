package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, StreamingQuery}

import graft.functions.{EnsembleArtifacts, GraftFunctions}
import graft.sources.ShardWriter

/** The documented ingest-to-training-shards flow, end to end:
  *
  *   feedstock landing dir ──(graft-feedstock MICRO_BATCH_READ:
  *   O(1) high-water-mark offsets, admission control, pruned per-file
  *   readers)──▶ fused quality-ensemble gate (stateless native scorer,
  *   [[EventStream.qualityEnsembleStreamFused]]'s column)──▶
  *   [[graft.sources.ShardWriter.shardSink]] (idempotent
  *   `batch=b/shard=k` directories — exactly-once across failures and
  *   restarts).
  *
  * Every stage is already individually pinned; this object is the
  * COMPOSITION — one call wires the production pipeline, and
  * GatedIngestSpec pins exactly-once across a stop/restart of the
  * whole thing. Scale shape: the only stateful operator anywhere is
  * the sink's foreachBatch bookkeeping — reading, gating and shard
  * assignment are all map-side, so a 1000-executor deployment ingests
  * at aggregate scan speed and the checkpoint holds one file-path
  * offset. */
object IngestPipeline {

  /** The gate as a frame transform: score each document with the
    * broadcast trained artifacts, keep the keep=true rows, carry the
    * audit columns a shard consumer wants (why did this doc pass) AND
    * the byte-fallback BPE id stream — the column a training shard
    * actually exists to store (zero OOV, byte-lossless; the encoder
    * is the same native per-row expression, so attaching ids costs
    * scan speed). `docs` needs (doc_id, lang, text). */
  def gatedDocs(docs: DataFrame, artifacts: EnsembleArtifacts): DataFrame = {
    import graft.operators.BpeOps
    docs
      .withColumn("e",
        GraftFunctions.qualityEnsemble(col("text"), col("lang"), artifacts))
      .filter(col("e.keep"))
      .select(col("doc_id"), col("lang"), col("text"),
        col("e.ppl_bucket").as("ppl_bucket"),
        col("e.target_like").as("target_like"),
        BpeOps.bpeTokenIds(
          filter(split(col("text"), " "), w => length(w) > 0),
          BpeOps.defaultModel, BpeOps.defaultIdMapBytes).as("token_ids"))
  }

  /** Wire and start the full pipeline. Returns the running query;
    * stop/restart with the same `ckptDir` resumes exactly-once. */
  def start(spark: SparkSession, landingDir: String,
      artifacts: EnsembleArtifacts, shardDir: String, ckptDir: String,
      nShards: Int = 8, maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader: DataStreamReader = spark.readStream.format("graft-feedstock")
    val paced = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n.toString))
    val docs = paced.load(landingDir)
      .select(col("record.doc_id").as("doc_id"),
        col("record.lang").as("lang"),
        col("record.text").as("text"))
    ShardWriter.shardSink(gatedDocs(docs, artifacts), "doc_id", shardDir, nShards)
      .option("checkpointLocation", ckptDir)
      .start()
  }

  /** Stand-alone runner: train the gate's artifacts on the reference
    * corpus, then stream a landing directory into training shards.
    *   sbt "runMain graft.streaming.IngestPipeline \
    *     <landingDir> <shardDir> <ckptDir> [sfDir]" */
  def main(args: Array[String]): Unit = {
    val Array(landingDir, shardDir, ckptDir) = args.take(3)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.tune(spark)

    val docs = graft.Tables.documents(spark, sfDir)
    val (cb, cw) = graft.operators.QualityModelOps.lmModelOf(docs)
    val dsirModel = graft.operators.QualityModelOps.dsirModelOf(docs)
    val pplCuts = graft.operators.QualityModelOps.pplCutsOf(
      graft.operators.QualityModelOps.lmPerplexity(spark, sfDir)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")))
    val artifacts = EnsembleArtifacts.of(cb, cw, pplCuts, dsirModel)

    val q = start(spark, landingDir, artifacts, shardDir, ckptDir)
    q.processAllAvailable()
    q.stop()
    val landed = spark.read.parquet(shardDir)
    println(s"== ingest_pipeline landed ${landed.count()} docs into " +
      s"${landed.select("shard").distinct().count()} shards")
    spark.stop()
  }
}
