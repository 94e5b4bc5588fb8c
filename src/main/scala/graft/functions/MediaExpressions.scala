package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** Native media-container header parsers for the catalog tier.
  *
  * PNG (fixed IHDR offset) and RIFF/WAVE (fixed fmt offset) parse as
  * plain hex-slice column chains in MultimodalOps; JPEG and MP4 cannot —
  * both are SEQUENCES of variable-length segments/boxes, so extracting
  * dimensions or duration needs a bounded walk over the byte stream.
  * That walk is exactly what a Catalyst `Expression` with codegen is
  * for: one tight JVM loop per row inside whole-stage codegen, zero
  * shuffles — cataloging a 100 TB object store stays a pure scan. The
  * reference's per-file extractor tier (tests/test_extractors.py:
  * opaque file → typed feature record) is the semantic model; the walk
  * itself follows the public container specs (ITU T.81 §B for JPEG
  * markers, ISO 14496-12 for MP4 boxes).
  *
  * Both parsers are total: any malformed, truncated, or foreign input
  * returns null, never throws — a crawl catalog must survive arbitrary
  * bytes.
  */

/** JPEG dimensions from the SOF segment: returns array(width, height,
  * progressive) — progressive is 1 for SOF2 (and the other progressive
  * variants), 0 for baseline — or null when the payload is not a JPEG
  * or carries no SOF before scan data. */
case class JpegDims(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jpeg_dims needs binary, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    JpegDims.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.JpegDims.compute($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): JpegDims =
    copy(child = newChild)

  override def prettyName: String = "graft_jpeg_dims"
}

object JpegDims {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  /** Walk the marker segments from SOI to the first SOFn (or SOS/EOF).
    * Marker layout per ITU T.81 §B.1: 0xFF <code>, then for non-
    * standalone markers a big-endian length that INCLUDES its own two
    * bytes. Fill bytes (extra 0xFFs before a code) are legal padding. */
  def compute(b: Array[Byte]): ArrayData = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return null
    var i = 2
    while (i + 1 < b.length) {
      if (u8(b, i) != 0xff) return null // desynchronized stream
      // skip fill bytes
      while (i + 1 < b.length && u8(b, i + 1) == 0xff) i += 1
      if (i + 1 >= b.length) return null
      val m = u8(b, i + 1)
      if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        i += 2 // standalone marker, no length field
      } else if (m == 0xd9 || m == 0xda) {
        return null // EOI / start-of-scan before any SOF: no dimensions
      } else {
        if (i + 3 >= b.length) return null
        val segLen = be16(b, i + 2)
        if (segLen < 2) return null
        val isSof = (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          // SOF payload: precision(1) height(2) width(2) ...
          if (i + 9 > b.length || segLen < 7) return null
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          val progressive =
            if (m == 0xc2 || m == 0xc6 || m == 0xca || m == 0xce) 1 else 0
          return ArrayData.toArrayData(Array(w, h, progressive))
        }
        i += 2 + segLen
      }
    }
    null
  }
}

/** MP4/ISO-BMFF presentation duration in integral microseconds from
  * the moov/mvhd box (duration / timescale, floor division — the
  * audioMeta discipline: no FP in a compared value), or null when the
  * payload has no parseable mvhd. */
case class Mp4Duration(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mp4_duration needs binary, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Mp4Duration.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""Long ${ev.value}$$boxed = graft.functions.Mp4Duration.compute($c);
         |${ev.isNull} = ${ev.value}$$boxed == null;
         |${ev.value} = ${ev.isNull} ? -1L : ${ev.value}$$boxed.longValue();"""
        .stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Mp4Duration =
    copy(child = newChild)

  override def prettyName: String = "graft_mp4_duration"
}

object Mp4Duration {
  private def u8(b: Array[Byte], i: Int): Long = (b(i) & 0xff).toLong
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def boxType(b: Array[Byte], i: Int): Int =
    be32(b, i + 4).toInt

  private final val Moov = 0x6d6f6f76 // "moov"
  private final val Mvhd = 0x6d766864 // "mvhd"
  private final val Ftyp = 0x66747970 // "ftyp"

  /** ISO 14496-12 §4.2 box walk: size(4) type(4) [largesize(8) when
    * size==1; size==0 means to-EOF]. The file must lead with ftyp to
    * count as MP4 at all; mvhd is found inside moov. */
  def compute(b: Array[Byte]): java.lang.Long = {
    if (b.length < 12 || boxType(b, 0) != Ftyp) return null
    walk(b, 0, b.length, depth = 0)
  }

  private def walk(b: Array[Byte], from: Int, to: Int, depth: Int): java.lang.Long = {
    var i = from
    while (i + 8 <= to) {
      var size = be32(b, i)
      var hdr = 8
      if (size == 0) size = (to - i).toLong
      else if (size == 1) {
        if (i + 16 > to) return null
        size = be64(b, i + 8)
        hdr = 16
      }
      if (size < hdr || i + size > to) return null
      val t = boxType(b, i)
      if (t == Moov && depth == 0) {
        val r = walk(b, i + hdr, i + size.toInt, depth + 1)
        if (r != null) return r
      } else if (t == Mvhd && depth == 1) {
        return readMvhd(b, i + hdr, i + size.toInt)
      }
      i += size.toInt
    }
    null
  }

  /** mvhd payload: version(1) flags(3), then v0 ctime(4) mtime(4)
    * timescale(4) duration(4) / v1 ctime(8) mtime(8) timescale(4)
    * duration(8). */
  private def readMvhd(b: Array[Byte], from: Int, to: Int): java.lang.Long = {
    if (from + 4 > to) return null
    val version = b(from) & 0xff
    if (version == 0) {
      if (from + 20 > to) return null
      val timescale = be32(b, from + 12)
      val duration = be32(b, from + 16)
      // all-ones duration is ISO 14496-12's "unknown duration" sentinel
      if (timescale <= 0 || duration == 0xFFFFFFFFL) return null
      java.lang.Long.valueOf(duration * 1000000L / timescale)
    } else if (version == 1) {
      if (from + 32 > to) return null
      val timescale = be32(b, from + 20)
      val duration = be64(b, from + 24)
      // duration < 0 covers the v1 all-ones (-1L) unknown sentinel too
      if (timescale <= 0 || duration < 0) return null
      java.lang.Long.valueOf(duration / timescale * 1000000L +
        duration % timescale * 1000000L / timescale)
    } else null
  }
}
