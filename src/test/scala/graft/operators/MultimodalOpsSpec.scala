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

  test("JPEG SOF walk reads genuine hand-built headers: baseline, progressive, negatives") {
    import spark.implicits._
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        (((payload.length + 2) >> 8) & 0xff).toByte,
        ((payload.length + 2) & 0xff).toByte) ++ payload
    def sofPayload(w: Int, h: Int): Array[Byte] =
      Array(8.toByte, ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
        ((w >> 8) & 0xff).toByte, (w & 0xff).toByte, 3.toByte,
        1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1).map(_.toByte)
    val soi = Array(0xff.toByte, 0xd8.toByte)
    val app0 = seg(0xe0, "JFIF".getBytes ++ Array.fill(12)(0.toByte))
    // a comment segment BEFORE the SOF exercises the variable-length walk
    val com = seg(0xfe, "hand-built".getBytes)
    val baseline = soi ++ app0 ++ com ++ seg(0xc0, sofPayload(1920, 1080))
    val progressive = soi ++ app0 ++ seg(0xc2, sofPayload(320, 200))
    val noSof = soi ++ app0 ++ Array(0xff.toByte, 0xd9.toByte) // straight to EOI
    val truncated = baseline.take(12)
    // must not collide with ANY recognized magic (GIF is one now)
    val notJpeg = "NOTMEDIA-at-all".getBytes
    val out = MultimodalOps.mediaCatalogOf(
      Seq((1L, baseline), (2L, progressive), (3L, noSof), (4L, truncated),
        (5L, notJpeg)).toDF("doc_id", "payload")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "image/jpeg")
    assert(out(1L).getInt(3) == 1920 && out(1L).getInt(4) == 1080)
    assert(!out(1L).getBoolean(5))
    assert(out(2L).getInt(3) == 320 && out(2L).getInt(4) == 200)
    assert(out(2L).getBoolean(5))
    // undecodable variants still type as jpeg by magic, but with null dims
    assert(out(3L).isNullAt(3) && out(3L).isNullAt(4))
    assert(out(4L).isNullAt(3) && out(4L).isNullAt(4))
    assert(out(5L).isNullAt(3) && out(5L).getString(1) == "unknown")
  }

  test("MP4 box walk reads a genuine hand-built mvhd: v0, v1, and negatives") {
    import spark.implicits._
    def be4(i: Long): Array[Byte] = Array(((i >> 24) & 0xff).toByte,
      ((i >> 16) & 0xff).toByte, ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
    def be8(i: Long): Array[Byte] = be4(i >> 32) ++ be4(i & 0xffffffffL)
    def box(tpe: String, body: Array[Byte]): Array[Byte] =
      be4(body.length + 8L) ++ tpe.getBytes("US-ASCII") ++ body
    val ftyp = box("ftyp", "isom".getBytes ++ be4(0x200L) ++ "mp41".getBytes)
    // v0 mvhd: timescale 90000, duration 90000*7+45000 → 7.5 s
    val mvhd0 = box("mvhd", Array(0, 0, 0, 0).map(_.toByte) ++ be4(0) ++ be4(0) ++
      be4(90000L) ++ be4(90000L * 7 + 45000L) ++ Array.fill(80)(0.toByte))
    // a sibling box before mvhd exercises the child walk
    val free = box("free", Array.fill(11)(0x20.toByte))
    val v0 = ftyp ++ box("moov", free ++ mvhd0)
    // v1 mvhd: 64-bit times, timescale 1000, duration 2500 ms
    val mvhd1 = box("mvhd", Array(1, 0, 0, 0).map(_.toByte) ++ be8(0) ++ be8(0) ++
      be4(1000L) ++ be8(2500L) ++ Array.fill(80)(0.toByte))
    val v1 = ftyp ++ box("moov", mvhd1)
    val noMoov = ftyp ++ box("mdat", "payload".getBytes)
    val truncated = v0.take(ftyp.length + 10)
    // ISO 14496-12 "unknown duration" sentinels: all-ones duration in
    // both mvhd versions must surface as null, not a bogus huge value
    val unk0 = ftyp ++ box("moov", box("mvhd",
      Array(0, 0, 0, 0).map(_.toByte) ++ be4(0) ++ be4(0) ++
        be4(90000L) ++ be4(0xFFFFFFFFL) ++ Array.fill(80)(0.toByte)))
    val unk1 = ftyp ++ box("moov", box("mvhd",
      Array(1, 0, 0, 0).map(_.toByte) ++ be8(0) ++ be8(0) ++
        be4(1000L) ++ be8(-1L) ++ Array.fill(80)(0.toByte)))
    val out = MultimodalOps.mediaCatalogOf(
      Seq((1L, v0), (2L, v1), (3L, noMoov), (4L, truncated),
        (5L, unk0), (6L, unk1))
        .toDF("doc_id", "payload")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "video/mp4" && out(1L).getString(8) == "isom")
    assert(out(1L).getLong(9) == 7500000L)
    assert(out(2L).getLong(9) == 2500000L)
    assert(out(3L).isNullAt(9))
    assert(out(4L).isNullAt(9))
    assert(out(5L).getString(1) == "video/mp4" && out(5L).isNullAt(9))
    assert(out(6L).getString(1) == "video/mp4" && out(6L).isNullAt(9))
  }

  test("media catalog dispatches on magic bytes, corrupted files surface as unknown") {
    val rows = MultimodalOps.mediaCatalog(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val t = r.getString(1)
      if (id % 6 == 0)
        assert(t == (if (id % 9 == 0) "unknown" else "image/png"))
      else if (id % 6 == 1) assert(t == "audio/wav")
      else if (id % 6 == 2) assert(t == "image/jpeg")
      else if (id % 6 == 3) assert(t == "video/mp4" && r.getString(8) == "isom")
      else if (id % 6 == 4) assert(t == "image/gif")
      else assert(t == "image/webp")
      // per-type fields are null outside their type
      if (t == "image/jpeg") {
        assert(r.getInt(3) == 160 + ((id * 11) % 1493).toInt)
        assert(r.getInt(4) == 120 + ((id * 13) % 1987).toInt)
        assert(r.getBoolean(5) == (id % 5 == 0))
      } else assert(r.isNullAt(5))
      if (t == "image/gif") {
        assert(r.getInt(3) == 8 + (id % 512).toInt)
        assert(r.getInt(4) == 8 + ((id * 3) % 512).toInt)
      }
      if (t == "image/webp") {
        // all three chunk variants parse to the same canvas dims
        assert(r.getInt(3) == 4 + (id % 1024).toInt,
          s"webp width, doc $id variant ${(id / 6) % 3}")
        assert(r.getInt(4) == 4 + ((id * 5) % 1024).toInt,
          s"webp height, doc $id variant ${(id / 6) % 3}")
      }
      if (t == "audio/wav" || t == "video/mp4" || t == "unknown")
        assert(r.isNullAt(3) && r.isNullAt(4))
      if (t != "audio/wav") assert(r.isNullAt(6) && r.isNullAt(7))
      if (t != "video/mp4") assert(r.isNullAt(8))
      if (t == "video/mp4")
        assert(r.getLong(9) ==
          (90L + (id * 31) % 100000) * 1000000L / (600L * (1 + id % 5)))
      if (t == "audio/wav") assert(!r.isNullAt(9))
      if (t != "audio/wav" && t != "video/mp4") assert(r.isNullAt(9))
    }
    // all three WebP variants are present in the corpus
    val variants = rows.filter(_.getString(1) == "image/webp")
      .map(r => (r.getLong(0) / 6) % 3).toSet
    assert(variants == Set(0L, 1L, 2L), s"webp variants seen: $variants")
  }

  test("GIF and WebP parse genuine hand-built headers; truncation degrades to null dims") {
    import spark.implicits._
    def le2(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le3(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte)
    def le4(v: Long) = (0 to 3).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    val gif89 = "GIF89a".getBytes("US-ASCII") ++ le2(640) ++ le2(480) ++
      Array.fill(7)(0.toByte)
    val gif87 = "GIF87a".getBytes("US-ASCII") ++ le2(13) ++ le2(11)
    def riff(chunk: Array[Byte]) =
      "RIFF".getBytes("US-ASCII") ++ le4(4L + chunk.length) ++
        "WEBP".getBytes("US-ASCII") ++ chunk
    val vp8x = riff("VP8X".getBytes("US-ASCII") ++ le4(10L) ++
      Array.fill(4)(0.toByte) ++ le3(799) ++ le3(599))
    val vp8 = riff("VP8 ".getBytes("US-ASCII") ++ le4(10L) ++
      Array.fill(3)(0.toByte) ++ Array(0x9d, 0x01, 0x2a).map(_.toByte) ++
      le2(320) ++ le2(240))
    val vp8lBits = (1023 - 1) | ((767 - 1) << 14)
    val vp8l = riff("VP8L".getBytes("US-ASCII") ++ le4(5L) ++
      Array(0x2f.toByte) ++ le4(vp8lBits.toLong))
    val truncatedGif = gif89.take(8)
    val truncatedWebp = vp8x.take(14)
    val out = MultimodalOps.mediaCatalogOf(
      Seq((1L, gif89), (2L, gif87), (3L, vp8x), (4L, vp8), (5L, vp8l),
        (6L, truncatedGif), (7L, truncatedWebp))
        .toDF("doc_id", "payload")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "image/gif" &&
      out(1L).getInt(3) == 640 && out(1L).getInt(4) == 480)
    assert(out(2L).getString(1) == "image/gif" &&
      out(2L).getInt(3) == 13 && out(2L).getInt(4) == 11)
    assert(out(3L).getString(1) == "image/webp" &&
      out(3L).getInt(3) == 800 && out(3L).getInt(4) == 600)
    assert(out(4L).getString(1) == "image/webp" &&
      out(4L).getInt(3) == 320 && out(4L).getInt(4) == 240)
    assert(out(5L).getString(1) == "image/webp" &&
      out(5L).getInt(3) == 1023 && out(5L).getInt(4) == 767)
    // truncation: container detected (or unknown), dims null, no crash
    assert(out(6L).getString(1) == "image/gif" && out(6L).isNullAt(4))
    assert(out(7L).getString(1) == "image/webp" &&
      out(7L).isNullAt(3) && out(7L).isNullAt(4))
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
