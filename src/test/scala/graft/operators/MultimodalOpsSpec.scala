package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalOpsSpec extends SparkSpec {

  test("IHDR parser reads a genuine hand-built PNG header correctly") {
    import spark.implicits._
    // real PNG byte layout: signature, IHDR length (13), "IHDR",
    // width=640, height=480 big-endian, then arbitrary body bytes
    def be(i: Int): Array[Byte] =
      Array(((i >> 24) & 0xff).toByte, ((i >> 16) & 0xff).toByte,
        ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = be(13) ++ "IHDR".getBytes("US-ASCII")
    val png = sig ++ ihdr ++ be(640) ++ be(480) ++ Array.fill(9)(0x42.toByte)
    val notPng = ("GIF89a" + "x" * 30).getBytes("US-ASCII")
    val rows = MultimodalOps.imageMetaOf(
        Seq((1L, png), (2L, notPng)).toDF("doc_id", "payload"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getInt(2), r.getInt(3)))
    assert(rows(0) == ((1L, true, 640, 480)))
    assert(rows(1)._1 == 2L && !rows(1)._2)
  }

  test("RIFF parser reads a genuine hand-built WAV header correctly") {
    import spark.implicits._
    // canonical 44-byte WAV header: 44.1 kHz stereo 16-bit, 1s of data
    def le4(i: Int): Array[Byte] = Array((i & 0xff).toByte, ((i >> 8) & 0xff).toByte,
      ((i >> 16) & 0xff).toByte, ((i >> 24) & 0xff).toByte)
    def le2(i: Int): Array[Byte] = Array((i & 0xff).toByte, ((i >> 8) & 0xff).toByte)
    val dataLen = 44100 * 2 * 2
    val wav = "RIFF".getBytes ++ le4(dataLen + 36) ++ "WAVEfmt ".getBytes ++
      le4(16) ++ le2(1) ++ le2(2) ++ le4(44100) ++ le4(44100 * 4) ++
      le2(4) ++ le2(16) ++ "data".getBytes ++ le4(dataLen) ++
      Array.fill(16)(0.toByte)
    val rows = MultimodalOps.audioMetaOf(Seq((1L, wav)).toDF("doc_id", "payload"))
      .collect()
    val r = rows.head
    assert(r.getBoolean(1))                 // is_wav
    assert(r.getInt(2) == 2)                // channels
    assert(r.getInt(3) == 44100)            // sample_rate
    assert(r.getInt(4) == 16)               // bits_per_sample
    assert(r.getInt(5) == dataLen)          // data_bytes
    assert(r.getLong(6) == 1000000L)        // exactly one second
  }

  test("synthetic PNG corpus round-trips: parsed dims equal the generator's") {
    val metas = MultimodalOps.imageMeta(spark, sfDir).collect()
    assert(metas.nonEmpty)
    metas.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(1) == (id % 9 != 0))
      assert(r.getInt(2) == 16 + (id % 1024).toInt)
      assert(r.getInt(3) == 16 + ((id * 7) % 1024).toInt)
    }
  }

  test("media catalog dispatches on magic bytes, corrupted files surface as unknown") {
    val rows = MultimodalOps.mediaCatalog(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val t = r.getString(1)
      if (id % 3 == 0)
        assert(t == (if (id % 9 == 0) "unknown" else "image/png"))
      else if (id % 3 == 1) assert(t == "audio/wav")
      else assert(t == "video/mp4" && r.getString(7) == "isom")
      // per-type fields are null outside their type
      if (t != "image/png") assert(r.isNullAt(3) && r.isNullAt(4))
      if (t != "audio/wav") assert(r.isNullAt(5) && r.isNullAt(6))
      if (t != "video/mp4") assert(r.isNullAt(7))
    }
  }

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
