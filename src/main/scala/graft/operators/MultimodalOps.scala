package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: media payloads as opaque binary columns
  * with typed metadata, processed in batches.
  *
  * The reference extracts per-file features from opaque scientific files
  * (tests/test_extractors.py: CIF/TDB/images → typed feature records).
  * Here the same shape is Spark-native: a `binary` column + metadata
  * struct; cheap byte-level features stay in codegen'd column expressions
  * (q_binary_features), while "decode" — which in production calls an
  * image/audio library over record batches — runs through a mapPartitions
  * pipeline with explicit micro-batching (q_multimodal_batch). The decode
  * itself is STUBBED deterministically (no media libs in this container);
  * the schema, batching, and partition-preserving plumbing are real.
  */
object MultimodalOps {

  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
      checksum: Long, width: Int, height: Int, n_frames: Int)

  /** Derive a deterministic media corpus from documents: payload = utf-8
    * bytes of the text, media type round-robins image/audio/video. */
  def mediaCorpus(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      encode(col("text"), "utf-8").as("payload"))

  // ----------------------------------------- codegen'd byte features

  def binaryFeatures(s: SparkSession, dir: String): DataFrame =
    mediaCorpus(s, dir).select(
      col("doc_id"), col("media_type"),
      octet_length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("content_md5"),
      lower(hex(substring(col("payload"), 1, 8))).as("header_hex"))
      .orderBy("doc_id")

  val binaryFeaturesSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS media_type,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  md5(text) AS content_md5,
      |  lower(hex(encode(substring(text, 1, 8)))) AS header_hex
      |FROM documents ORDER BY doc_id""".stripMargin

  // ----------------------------------------- real header parsing

  /** Synthetic PNG-framed corpus: every payload carries a REAL PNG
    * byte layout — the 8-byte signature, the IHDR chunk length+type,
    * big-endian width and height — followed by the text bytes as the
    * stand-in body. Every 9th record gets a zeroed signature (a
    * corrupt/foreign file) so the parser's negative path is exercised.
    * Deterministic, so the oracle knows ground truth arithmetically. */
  private def pngPayload: Column = concat(
    when(col("doc_id") % 9 === 0, unhex(lit("0000000000000000")))
      .otherwise(unhex(lit("89504E470D0A1A0A"))), // \x89PNG\r\n\x1a\n
    unhex(lit("0000000D49484452")),               // IHDR length + "IHDR"
    unhex(format_string("%08x", lit(16) + col("doc_id") % 1024)),
    unhex(format_string("%08x", lit(16) + (col("doc_id") * 7) % 1024)),
    encode(col("text"), "utf-8"))

  def pngCorpus(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), pngPayload.as("payload"))

  /** Image metadata extraction from the BYTES alone (no side channel):
    * signature check against the PNG magic, big-endian width/height
    * from the IHDR offsets (hex-slice → base-16 parse), body size.
    * Pure codegen column expressions — a billion thumbnails parse at
    * scan speed with zero shuffles. The oracle recomputes ground truth
    * arithmetically from the generator, so any error in either the
    * byte packing or the parse breaks the hash. */
  def imageMeta(s: SparkSession, dir: String): DataFrame =
    imageMetaOf(Tables.spread(s, pngCorpus(s, dir)))

  /** Generic API: parse PNG signature + IHDR dimensions from any
    * (doc_id, payload: binary) frame — works on real PNG files, not
    * just the synthetic corpus (spec feeds it a hand-built genuine
    * PNG header). */
  def imageMetaOf(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      (hex(substring(col("payload"), 1, 8)) === "89504E470D0A1A0A").as("is_png"),
      conv(hex(substring(col("payload"), 17, 4)), 16, 10).cast("int").as("width"),
      conv(hex(substring(col("payload"), 21, 4)), 16, 10).cast("int").as("height"),
      (octet_length(col("payload")) - 24).as("n_body_bytes"))
      .orderBy("doc_id")

  val imageMetaSql: String =
    """SELECT doc_id,
      |  doc_id % 9 <> 0 AS is_png,
      |  CAST(16 + doc_id % 1024 AS INTEGER) AS width,
      |  CAST(16 + (doc_id * 7) % 1024 AS INTEGER) AS height,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_body_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Little-endian byte helpers: WAV/RIFF stores multi-byte fields
    * least-significant byte first, so packing/parsing reverses the
    * big-endian hex of `format_string`/`conv` byte-pair-wise. */
  private def le4hex(v: Column): Column = {
    val be = format_string("%08x", v)
    concat(substring(be, 7, 2), substring(be, 5, 2),
      substring(be, 3, 2), substring(be, 1, 2))
  }
  private def le2hex(v: Column): Column = {
    val be = format_string("%04x", v)
    concat(substring(be, 3, 2), substring(be, 1, 2))
  }
  private def parseLe4(bytes: Column): Column = {
    val h = hex(bytes)
    conv(concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2)), 16, 10).cast("int")
  }
  private def parseLe2(bytes: Column): Column = {
    val h = hex(bytes)
    conv(concat(substring(h, 3, 2), substring(h, 1, 2)), 16, 10).cast("int")
  }
  private def le3hex(v: Column): Column = {
    val be = format_string("%06x", v)
    concat(substring(be, 5, 2), substring(be, 3, 2), substring(be, 1, 2))
  }
  private def parseLe3(bytes: Column): Column = {
    val h = hex(bytes)
    conv(concat(substring(h, 5, 2), substring(h, 3, 2), substring(h, 1, 2)),
      16, 10).cast("int")
  }

  /** Synthetic WAV-framed corpus: the canonical 44-byte RIFF/WAVE
    * header — "RIFF", chunk size, "WAVE", "fmt ", PCM format, channel
    * count, sample rate, byte rate, block align, bits per sample,
    * "data", data size — all little-endian like a real file, followed
    * by the text bytes as the stand-in sample data. */
  private def wavPayload: Column = {
    val channels = (lit(1) + col("doc_id") % 2).cast("int")
    val rate = (lit(8000) * (lit(1) + col("doc_id") % 5)).cast("int")
    val bits = lit(16)
    val dataLen = octet_length(encode(col("text"), "utf-8"))
    // bytes-per-sample is bits/8 = 2; Column `/` is double division,
    // so keep the arithmetic integral for the %x formatter
    val blockAlign = (channels * lit(2)).cast("int")
    concat(
      encode(lit("RIFF"), "utf-8"), unhex(le4hex(dataLen + 36)),
      encode(lit("WAVEfmt "), "utf-8"), unhex(le4hex(lit(16))),
      unhex(le2hex(lit(1))), unhex(le2hex(channels)),
      unhex(le4hex(rate)), unhex(le4hex(rate * blockAlign)),
      unhex(le2hex(blockAlign)), unhex(le2hex(bits)),
      encode(lit("data"), "utf-8"), unhex(le4hex(dataLen)),
      encode(col("text"), "utf-8"))
  }

  def wavCorpus(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), wavPayload.as("payload"))

  def audioMeta(s: SparkSession, dir: String): DataFrame =
    audioMetaOf(Tables.spread(s, wavCorpus(s, dir)))

  /** Generic API: parse RIFF/WAVE metadata from any (doc_id, payload)
    * frame — container check, channel count, sample rate, bits per
    * sample, data size, duration. Little-endian fields parse by
    * byte-reversing the hex slice; pure codegen columns, zero
    * shuffles, like [[imageMetaOf]]. */
  def audioMetaOf(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      (hex(substring(col("payload"), 1, 4)) === "52494646" &&
        hex(substring(col("payload"), 9, 4)) === "57415645").as("is_wav"),
      parseLe2(substring(col("payload"), 23, 2)).as("channels"),
      parseLe4(substring(col("payload"), 25, 4)).as("sample_rate"),
      parseLe2(substring(col("payload"), 35, 2)).as("bits_per_sample"),
      parseLe4(substring(col("payload"), 41, 4)).as("data_bytes"))
      // integral microseconds (SQL `div` — integer division) — a
      // rounded double seconds value ties at the .5 boundary and
      // round-half behavior differs across engines
      .withColumn("duration_us", expr(
        "CAST(data_bytes AS BIGINT) * 1000000 div " +
          "(CAST(sample_rate AS BIGINT) * channels * 2)"))
      .orderBy("doc_id")

  /** Oracle: ground truth recomputed arithmetically from the
    * generator, so errors in either the little-endian packing or the
    * parse break the hash. */
  val audioMetaSql: String =
    """SELECT doc_id, TRUE AS is_wav,
      |  CAST(1 + doc_id % 2 AS INTEGER) AS channels,
      |  CAST(8000 * (1 + doc_id % 5) AS INTEGER) AS sample_rate,
      |  CAST(16 AS INTEGER) AS bits_per_sample,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS data_bytes,
      |  (CAST(octet_length(encode(text)) AS BIGINT) * 1000000) //
      |    (8000 * (1 + doc_id % 5) * (1 + doc_id % 2) * 2) AS duration_us
      |FROM documents ORDER BY doc_id""".stripMargin

  // ----------------------------------------- mixed-media catalog

  /** Synthetic JPEG-framed corpus entry: a REAL baseline/progressive
    * JPEG header — SOI, a full JFIF APP0 segment, then SOF0 (or SOF2
    * on every 5th doc, pinning the progressive flag) carrying
    * big-endian height and width — followed by the text bytes. The
    * variable-length-segment layout is exactly what makes JPEG
    * unparseable by fixed hex slices and exercises the
    * [[graft.functions.JpegDims]] marker walk. */
  private def jpegPayload: Column = concat(
    unhex(lit("FFD8")),                           // SOI
    unhex(lit("FFE000104A46494600010100004800480000")), // APP0/JFIF, len 16
    when(col("doc_id") % 5 === 0, unhex(lit("FFC2")))   // SOF2: progressive
      .otherwise(unhex(lit("FFC0"))),                   // SOF0: baseline
    unhex(lit("001108")),                         // seg len 17, precision 8
    unhex(format_string("%04x", lit(120) + (col("doc_id") * 13) % 1987)), // height
    unhex(format_string("%04x", lit(160) + (col("doc_id") * 11) % 1493)), // width
    unhex(lit("03012200021101031101")),           // 3 component specs
    encode(col("text"), "utf-8"))

  /** Mixed binary corpus: PNG / WAV / JPEG / MP4 payloads round-robin
    * by doc_id — the "bucket of unlabeled media files" a cataloging
    * pass faces. The MP4 is a real box sequence: ftyp (big-endian
    * size, major brand "isom", compatible brand "mp41") followed by a
    * moov box containing a version-0 mvhd with a deterministic
    * timescale and duration, so the [[graft.functions.Mp4Duration]]
    * box walk has genuine structure to traverse. */
  private def mp4Payload: Column = {
    val timescale = lit(600) * (lit(1) + col("doc_id") % 5)
    val durUnits = lit(90) + (col("doc_id") * 31) % 100000
    concat(
      unhex(format_string("%08x", lit(20))),     // ftyp box size 20 BE
      encode(lit("ftypisom"), "utf-8"),          // type + major brand
      unhex(lit("00000200")),                    // minor version
      encode(lit("mp41"), "utf-8"),              // compatible brand
      unhex(format_string("%08x", lit(116))),    // moov box size 8+108
      encode(lit("moov"), "utf-8"),
      unhex(format_string("%08x", lit(108))),    // mvhd box size
      encode(lit("mvhd"), "utf-8"),
      unhex(lit("00000000")),                    // version 0 + flags
      unhex(lit("0000000000000000")),            // ctime + mtime
      unhex(format_string("%08x", timescale)),
      unhex(format_string("%08x", durUnits)),
      unhex(lit("00010000")),                    // rate 1.0
      unhex(lit("01000000")),                    // volume 1.0 + reserved
      unhex(lit("0000000000000000")),            // reserved[2]
      unhex(lit("00010000000000000000000000000000" +
        "0001000000000000000000000000000040000000")), // unity matrix (36 B)
      unhex(lit("0000000000000000000000000000000000000000" +
        "00000000")),                            // pre_defined[6] (24 B)
      unhex(lit("00000002")),                    // next_track_ID
      encode(col("text"), "utf-8"))
  }

  /** GIF87a/89a: 6-byte signature, then the logical-screen descriptor's
    * LE16 width/height — fixed offsets by spec. */
  private def gifPayload: Column = concat(
    when(col("doc_id") % 11 === 0, encode(lit("GIF87a"), "utf-8"))
      .otherwise(encode(lit("GIF89a"), "utf-8")),
    unhex(le2hex((lit(8) + col("doc_id") % 512).cast("int"))),
    unhex(le2hex((lit(8) + (col("doc_id") * 3) % 512).cast("int"))),
    encode(col("text"), "utf-8"))

  /** WebP: RIFF/WEBP container whose FIRST chunk is one of the three
    * spec formats, cycled per doc — VP8X (extended: LE24 canvas
    * width-1/height-1), VP8 (lossy: 0x9D012A start code then 14-bit
    * LE16 dims), VP8L (lossless: 0x2F then 2×14 dims-1 bit-packed into
    * 4 LE bytes). All dims land at fixed offsets once the chunk
    * fourCC is known. */
  private def webpPayload: Column = {
    val w = (lit(4) + col("doc_id") % 1024).cast("int")
    val h = (lit(4) + (col("doc_id") * 5) % 1024).cast("int")
    val dataLen = octet_length(encode(col("text"), "utf-8"))
    // variant selector must be independent of doc_id % 6 (every
    // doc_id ≡ 5 mod 6 is ≡ 2 mod 3, so a plain % 3 would only ever
    // build one variant inside the mixed corpus)
    val variant = expr("(doc_id div 6) % 3")
    val chunk =
      when(variant === 0, concat(
        encode(lit("VP8X"), "utf-8"), unhex(le4hex(lit(10))),
        unhex(lit("00000000")),                        // flags + reserved
        unhex(le3hex(w - 1)), unhex(le3hex(h - 1))))
      .when(variant === 1, concat(
        encode(lit("VP8 "), "utf-8"), unhex(le4hex(lit(10))),
        unhex(lit("000000")),                          // frame tag
        unhex(lit("9D012A")),                          // start code
        unhex(le2hex(w)), unhex(le2hex(h))))
      .otherwise(concat(
        encode(lit("VP8L"), "utf-8"), unhex(le4hex(lit(5))),
        unhex(lit("2F")),                              // VP8L signature
        unhex(le4hex((w - 1) + (h - 1) * lit(16384)))))
    // RIFF size = file bytes after the 8-byte RIFF header:
    // "WEBP" (4) + the chunk (incl. its own 8-byte header) + body
    concat(
      encode(lit("RIFF"), "utf-8"),
      unhex(le4hex(lit(4) + octet_length(chunk) + dataLen)),
      encode(lit("WEBP"), "utf-8"),
      chunk,
      encode(col("text"), "utf-8"))
  }

  /** One projection over ONE scan: the per-type payload builders are
    * Column expressions, so no self-joins reassemble the mix. */
  def mixedMediaCorpus(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      when(col("doc_id") % 6 === 0, pngPayload)
        .when(col("doc_id") % 6 === 1, wavPayload)
        .when(col("doc_id") % 6 === 2, jpegPayload)
        .when(col("doc_id") % 6 === 3, mp4Payload)
        .when(col("doc_id") % 6 === 4, gifPayload)
        .otherwise(webpPayload).as("payload"))

  /** Media catalog: ONE pass over a mixed binary column detects each
    * payload's container from its magic bytes and extracts the
    * type-appropriate metadata — width/height for images, sample rate/
    * channels for audio, brand for video — as nullable columns. The
    * dispatch and every parse are codegen column expressions, so
    * cataloging a 100 TB object store is a zero-shuffle scan; unknown
    * containers surface as detected_type = 'unknown' instead of
    * failing the job. */
  def mediaCatalog(s: SparkSession, dir: String): DataFrame =
    mediaCatalogOf(Tables.spread(s, mixedMediaCorpus(s, dir)))

  def mediaCatalogOf(media: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions.{jpegDims, mp4DurationUs}
    val head8 = hex(substring(col("payload"), 1, 8))
    val isPng = head8 === "89504E470D0A1A0A"
    val isWav = hex(substring(col("payload"), 1, 4)) === "52494646" &&
      hex(substring(col("payload"), 9, 4)) === "57415645"
    val isJpeg = hex(substring(col("payload"), 1, 2)) === "FFD8"
    val isMp4 = hex(substring(col("payload"), 5, 4)) === "66747970"
    val gifSig = hex(substring(col("payload"), 1, 6))
    val isGif = gifSig === "474946383961" || gifSig === "474946383761"
    val isWebp = hex(substring(col("payload"), 1, 4)) === "52494646" &&
      hex(substring(col("payload"), 9, 4)) === "57454250"
    // WebP dims: dispatch on the first chunk's fourCC — VP8X canvas
    // (LE24 minus-one), VP8 lossy (0x9D012A start code, 14-bit LE16),
    // VP8L lossless (0x2F, 2×14 bits packed LE). A corrupted chunk
    // degrades to null dims, the container type stands.
    val webpCc = hex(substring(col("payload"), 13, 4))
    val vp8lBits = parseLe4(substring(col("payload"), 22, 4))
    val webpW =
      when(webpCc === "56503858", parseLe3(substring(col("payload"), 25, 3)) + 1)
      .when(webpCc === "56503820" &&
          hex(substring(col("payload"), 24, 3)) === "9D012A",
        parseLe2(substring(col("payload"), 27, 2)).bitwiseAND(lit(16383)))
      .when(webpCc === "5650384C" &&
          hex(substring(col("payload"), 21, 1)) === "2F",
        vp8lBits.bitwiseAND(lit(16383)) + 1)
    val webpH =
      when(webpCc === "56503858", parseLe3(substring(col("payload"), 28, 3)) + 1)
      .when(webpCc === "56503820" &&
          hex(substring(col("payload"), 24, 3)) === "9D012A",
        parseLe2(substring(col("payload"), 29, 2)).bitwiseAND(lit(16383)))
      .when(webpCc === "5650384C" &&
          hex(substring(col("payload"), 21, 1)) === "2F",
        shiftright(vp8lBits, 14).bitwiseAND(lit(16383)) + 1)
    // JPEG dims come from the SOF marker walk (variable segment
    // layout); let-bind the array so the walk runs once per row, not
    // once per consuming column
    media
      .withColumn("_jd", when(isJpeg, jpegDims(col("payload"))))
      // let-bind the WAV PCM fields once for the integral duration div
      .withColumn("_wav_db",
        when(isWav, parseLe4(substring(col("payload"), 41, 4)).cast("long")))
      .withColumn("_wav_bps",
        when(isWav, parseLe4(substring(col("payload"), 25, 4)).cast("long") *
          parseLe2(substring(col("payload"), 23, 2)) * lit(2)))
      .select(
        col("doc_id"),
        when(isPng, "image/png").when(isWav, "audio/wav")
          .when(isJpeg, "image/jpeg")
          .when(isMp4, "video/mp4")
          .when(isGif, "image/gif")
          .when(isWebp, "image/webp").otherwise("unknown").as("detected_type"),
        octet_length(col("payload")).as("n_bytes"),
        coalesce(
          when(isPng, conv(hex(substring(col("payload"), 17, 4)), 16, 10).cast("int")),
          element_at(col("_jd"), 1),
          when(isGif, parseLe2(substring(col("payload"), 7, 2))),
          when(isWebp, webpW)).as("width"),
        coalesce(
          when(isPng, conv(hex(substring(col("payload"), 21, 4)), 16, 10).cast("int")),
          element_at(col("_jd"), 2),
          when(isGif, parseLe2(substring(col("payload"), 9, 2))),
          when(isWebp, webpH)).as("height"),
        (element_at(col("_jd"), 3) === 1).as("progressive"),
        when(isWav, parseLe4(substring(col("payload"), 25, 4))).as("sample_rate"),
        when(isWav, parseLe2(substring(col("payload"), 23, 2))).as("channels"),
        when(isMp4, decode(substring(col("payload"), 9, 4), "US-ASCII"))
          .as("brand"),
        // one duration column across time-based media: WAV from the
        // PCM arithmetic, MP4 from the mvhd box walk — both integral
        // microseconds (floor division), never FP
        coalesce(
          expr("_wav_db * 1000000 div _wav_bps"),
          mp4DurationUs(col("payload"))).as("duration_us"))
      .orderBy("doc_id")
  }

  /** Oracle ground truth: recomputed arithmetically from the four
    * generators — the every-9th corrupted-signature PNG must catalog
    * as 'unknown' with NULL dimensions (dispatch is from the bytes,
    * not the generator's intent); JPEG width/height/progressive and
    * the MP4 duration check the marker/box walks end to end. */
  val mediaCatalogSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 6 = 0 THEN
      |         CASE WHEN doc_id % 9 = 0 THEN 'unknown' ELSE 'image/png' END
      |       WHEN doc_id % 6 = 1 THEN 'audio/wav'
      |       WHEN doc_id % 6 = 2 THEN 'image/jpeg'
      |       WHEN doc_id % 6 = 3 THEN 'video/mp4'
      |       WHEN doc_id % 6 = 4 THEN 'image/gif'
      |       ELSE 'image/webp' END AS detected_type,
      |  CAST(CASE WHEN doc_id % 6 = 0 THEN octet_length(encode(text)) + 24
      |            WHEN doc_id % 6 = 1 THEN octet_length(encode(text)) + 44
      |            WHEN doc_id % 6 = 2 THEN octet_length(encode(text)) + 39
      |            WHEN doc_id % 6 = 3 THEN octet_length(encode(text)) + 136
      |            WHEN doc_id % 6 = 4 THEN octet_length(encode(text)) + 10
      |            WHEN (doc_id // 6) % 3 = 2 THEN octet_length(encode(text)) + 25
      |            ELSE octet_length(encode(text)) + 30 END AS INTEGER) AS n_bytes,
      |  CAST(CASE WHEN doc_id % 6 = 0 AND doc_id % 9 <> 0
      |         THEN 16 + doc_id % 1024
      |       WHEN doc_id % 6 = 2 THEN 160 + (doc_id * 11) % 1493
      |       WHEN doc_id % 6 = 4 THEN 8 + doc_id % 512
      |       WHEN doc_id % 6 = 5 THEN 4 + doc_id % 1024
      |       END AS INTEGER) AS width,
      |  CAST(CASE WHEN doc_id % 6 = 0 AND doc_id % 9 <> 0
      |         THEN 16 + (doc_id * 7) % 1024
      |       WHEN doc_id % 6 = 2 THEN 120 + (doc_id * 13) % 1987
      |       WHEN doc_id % 6 = 4 THEN 8 + (doc_id * 3) % 512
      |       WHEN doc_id % 6 = 5 THEN 4 + (doc_id * 5) % 1024
      |       END AS INTEGER) AS height,
      |  CASE WHEN doc_id % 6 = 2 THEN doc_id % 5 = 0 END AS progressive,
      |  CAST(CASE WHEN doc_id % 6 = 1 THEN 8000 * (1 + doc_id % 5) END AS INTEGER)
      |    AS sample_rate,
      |  CAST(CASE WHEN doc_id % 6 = 1 THEN 1 + doc_id % 2 END AS INTEGER)
      |    AS channels,
      |  CASE WHEN doc_id % 6 = 3 THEN 'isom' END AS brand,
      |  CAST(CASE WHEN doc_id % 6 = 1 THEN
      |         (CAST(octet_length(encode(text)) AS BIGINT) * 1000000) //
      |           (8000 * (1 + doc_id % 5) * (1 + doc_id % 2) * 2)
      |       WHEN doc_id % 6 = 3 THEN
      |         (CAST(90 + (doc_id * 31) % 100000 AS BIGINT) * 1000000) //
      |           (600 * (1 + doc_id % 5))
      |       END AS BIGINT) AS duration_us
      |FROM documents ORDER BY doc_id""".stripMargin

  // ----------------------------------------- batched decode pipeline

  /** STUB decode: deterministic fake features standing in for an image/
    * audio decoder. Real deployments swap this body for the library call;
    * everything around it (batching, schema, distribution) is unchanged. */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      var ck = 0L
      var i = 0
      while (i < r.payload.length) { ck = (ck * 131 + (r.payload(i) & 0xff)) % 1000000007L; i += 1 }
      val w = 16 + (ck % 64).toInt
      MediaFeatures(r.doc_id, r.media_type, r.payload.length, ck,
        width = w, height = 16 + ((ck / 64) % 64).toInt,
        n_frames = if (r.media_type == "video") 1 + (ck % 30).toInt else 1)
    }

  val decodeBatchSize = 32

  /** mapPartitions pipeline: drain each partition in fixed-size batches
    * through the decoder — the shape a vectorized/FFI decode needs (one
    * library call per batch, bounded memory, no per-row overhead). */
  def multimodalBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = graft.Tables.spread(s, mediaCorpus(s, dir))
      .as[MediaRecord]
    ds.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(b => decodeBatch(b.toSeq))
    }.toDF().orderBy("doc_id")
  }

  // ----------------------------------------- resize / frame-sample

  final case class ResizedMedia(doc_id: Long, media_type: String,
      width: Int, height: Int, payload: Array[Byte])

  /** STUB resize: byte-stride downsample standing in for a real image
    * scaler — output payload shrinks to ~(w*h)/(W*H) of the input, so
    * memory behaves like the real op. Batched exactly like
    * [[multimodalBatch]]; swap the body for the library call. */
  def resizeStub(batch: Seq[MediaRecord], w: Int, h: Int): Seq[ResizedMedia] =
    batch.map { r =>
      val stride = math.max(1, r.payload.length / math.max(1, w * h / 64))
      val out = r.payload.indices.by(stride).map(r.payload).toArray
      ResizedMedia(r.doc_id, r.media_type, w, h, out)
    }

  /** Resize pipeline over any (doc_id, media_type, payload) frame. */
  def resizeOf(media: DataFrame, w: Int, h: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(b => resizeStub(b.toSeq, w, h))
    }.toDF()
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** STUB frame sampling: every `stride`-th frame of each video becomes
    * its own row (frame bytes = a deterministic slice stand-in). The
    * row-exploding shape is the real contract — downstream per-frame
    * feature extraction distributes over frames, not videos, so one
    * 10-hour video cannot skew a partition. */
  def frameSampleOf(media: DataFrame, stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.as[MediaRecord].filter((r: MediaRecord) => r.media_type == "video")
      .mapPartitions { it =>
        it.grouped(decodeBatchSize).flatMap { batch =>
          decodeBatch(batch.toSeq).zip(batch).flatMap { case (f, r) =>
            (0 until f.n_frames by stride).map { i =>
              val from = math.min(i * 16, math.max(0, r.payload.length - 1))
              Frame(r.doc_id, i, r.payload.slice(from, math.min(from + 16, r.payload.length)))
            }
          }
        }
      }.toDF()
  }

  // ----------------------------------------- frame-signature dedup

  /** Pair gate: share of the smaller video's distinct frames that the
    * other video also contains. */
  val mediaOverlapFrac = 0.5

  /** A frame hash seen in more than this many videos is boilerplate
    * (black frames, intros) and is dropped from pairing — the same
    * viral-key discipline as the shingle DF cap. */
  val frameDfCap = 1000L

  def mediaDedup(s: SparkSession, dir: String): DataFrame =
    mediaDedupOf(frameSampleOf(
      Tables.spread(s, mediaCorpus(s, dir)), stride = 1), mediaOverlapFrac)

  /** Generic API: near-dup video pairs over any (doc_id, frame_idx,
    * frame_bytes) frame table — the media twin of n-gram dedup.
    * Sampled frames hash to 64-bit content signatures; an inverted
    * index on the frame hash pairs ONLY videos sharing a frame (never
    * all-pairs), and the overlap fraction (shared distinct frames /
    * smaller video's distinct frames) gates the pair. Frame frequency
    * is a hash aggregation (map-side partials collapse a boilerplate
    * frame per task) and the df cap keeps one viral frame from a
    * quadratic candidate blowup; the denominators count pre-cap, so
    * the cap only removes candidates, never inflates overlap. */
  /** Frames narrower than the stub's 16-byte width are clamped tail
    * slices (an artifact of the fake decoder, not content) — a 1-byte
    * "frame" shared by chance must not clear the overlap gate. A real
    * decoder emits fixed-size frames and never hits this. */
  val minFrameBytes = 16

  def mediaDedupOf(frames: DataFrame, frac: Double): DataFrame = {
    // materialized once: the distinct (doc_id, fh) signature table is
    // read by THREE consumers below (per-video counts, the df-capped
    // keep filter, and both sides of the pair join); without the cut,
    // join-pushed isnotnull predicates make each consumer's subtree
    // non-canonical, AQE cannot reuse the exchange, and the frame
    // DECODE upstream re-runs per consumer (guide §2.4 — the same
    // re-explode failure measured on q_pmi_collocations)
    val sigs = frames
      .filter(octet_length(col("frame_bytes")) >= minFrameBytes)
      .select(col("doc_id"), xxhash64(col("frame_bytes")).as("fh"))
      .distinct()
      .localCheckpoint()
    val counts = sigs.groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"))
    val kept = sigs.join(
      sigs.groupBy(col("fh")).agg(count(lit(1)).as("dfc"))
        .filter(col("dfc") <= frameDfCap).select("fh"),
      Seq("fh"))
    val a = kept.select(col("doc_id").as("doc_a"), col("fh"))
    val b = kept.select(col("doc_id").as("doc_b"), col("fh"))
    a.join(b, Seq("fh")).filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
      .join(counts.select(col("doc_id").as("doc_a"), col("n_frames").as("na")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n_frames").as("nb")), "doc_b")
      .withColumn("overlap", col("shared").cast("double") / least(col("na"), col("nb")))
      .filter(col("overlap") >= frac)
      .select("doc_a", "doc_b", "shared", "overlap")
      .orderBy("doc_a", "doc_b")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_binary_features"  -> (binaryFeatures _),
    "q_image_meta"       -> (imageMeta _),
    "q_audio_meta"       -> (audioMeta _),
    "q_media_catalog"    -> (mediaCatalog _),
    "q_multimodal_batch" -> (multimodalBatch _),
    "q_media_dedup"      -> (mediaDedup _))

  /** The decode stub is JVM-side logic — rows-only check + spec
    * (q_multimodal_batch, q_media_dedup). */
  def oracles: Map[String, String] = Map(
    "q_binary_features" -> binaryFeaturesSql,
    "q_image_meta"      -> imageMetaSql,
    "q_audio_meta"      -> audioMetaSql,
    "q_media_catalog"   -> mediaCatalogSql)
}
