package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalOpsSpec extends SparkSpec {

  test("batched decode is deterministic and covers every record") {
    val corpus = MultimodalOps.mediaCorpus(spark, sfDir)
    val out = MultimodalOps.multimodalBatch(spark, sfDir)
    assert(out.count() == corpus.count())
    val a = out.collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val b = MultimodalOps.multimodalBatch(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(a == b, "decode checksums must be run-to-run identical")
    // videos carry frame counts, stills exactly one frame
    assert(out.filter(col("media_type") =!= "video" && col("n_frames") =!= 1).count() == 0)
  }

  test("resize stub shrinks payloads and keeps one row per record") {
    val corpus = MultimodalOps.mediaCorpus(spark, sfDir)
    val resized = MultimodalOps.resizeOf(corpus, w = 32, h = 32)
    assert(resized.count() == corpus.count())
    val joined = resized.select(col("doc_id"), octet_length(col("payload")).as("out_len"))
      .join(corpus.select(col("doc_id"), octet_length(col("payload")).as("in_len")), "doc_id")
    assert(joined.filter(col("out_len") > col("in_len")).count() == 0)
    assert(joined.filter(col("out_len") === 0).count() == 0)
  }

  test("frame sampling explodes videos into every stride-th frame") {
    val corpus = MultimodalOps.mediaCorpus(spark, sfDir)
    val stride = 7
    val frames = MultimodalOps.frameSampleOf(corpus, stride)
    // only videos produce frames, with ceil(n_frames / stride) rows each
    val expected = MultimodalOps.multimodalBatch(spark, sfDir)
      .filter(col("media_type") === "video")
      .select(col("doc_id"), ceil(col("n_frames").cast("double") / stride).cast("long").as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(frames.count() == expected)
    assert(frames.filter(col("frame_idx") % stride =!= 0).count() == 0)
  }
}
