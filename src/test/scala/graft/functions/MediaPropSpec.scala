package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-fuzz for the binary marker/box walks — pure JVM (the
  * compute methods the codegen emits), no Spark session needed.
  *
  * The generators build STRUCTURALLY RANDOM but spec-valid streams —
  * random APPn/COM segment runs and fill bytes before the SOF (ITU
  * T.81 §B.1), random unknown-box interleavings and 64-bit largesize
  * headers around the mvhd (ISO 14496-12 §4.2) — the layouts a real
  * crawl serves that a fixed fixture never covers. Truncating a valid
  * stream at any byte must yield null, never a crash or a wrong
  * answer. */
class MediaPropSpec extends AnyFunSuite {

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)

  // ------------------------------------------------------------ JPEG

  /** One non-SOF variable-length segment: APPn (E0-EF), COM (FE) or
    * DHT (C4 — the SOF-range code the walk must NOT treat as SOF). */
  private val fillerSegGen: Gen[Array[Byte]] = for {
    marker <- Gen.oneOf(Gen.choose(0xe0, 0xef), Gen.const(0xfe), Gen.const(0xc4))
    fills <- Gen.choose(0, 2) // legal 0xFF padding before the marker
    n <- Gen.choose(0, 24)
    body <- Gen.listOfN(n, Gen.choose(0, 255))
  } yield Array.fill(fills)(0xff.toByte) ++
    Array(0xff.toByte, marker.toByte) ++ be16(n + 2) ++ body.map(_.toByte)

  private case class JpegCase(bytes: Array[Byte], w: Int, h: Int, prog: Int)

  private val jpegGen: Gen[JpegCase] = for {
    segs <- Gen.choose(0, 4).flatMap(k => Gen.listOfN(k, fillerSegGen))
    sof <- Gen.oneOf(0xc0, 0xc1, 0xc2, 0xc3, 0xc9, 0xca)
    w <- Gen.choose(1, 65535)
    h <- Gen.choose(1, 65535)
    ncomp <- Gen.choose(1, 3)
    trailing <- Gen.listOfN(8, Gen.choose(0, 255)) // entropy bytes after SOS
  } yield {
    val sofSeg = Array(0xff.toByte, sof.toByte) ++ be16(8 + 3 * ncomp) ++
      Array(8.toByte) ++ be16(h) ++ be16(w) ++ Array(ncomp.toByte) ++
      Array.fill(3 * ncomp)(0x11.toByte)
    val sos = Array(0xff.toByte, 0xda.toByte) ++ be16(2)
    val prog = if (sof == 0xc2 || sof == 0xca) 1 else 0
    JpegCase(Array(0xff.toByte, 0xd8.toByte) ++ segs.flatten ++ sofSeg ++
      sos ++ trailing.map(_.toByte), w, h, prog)
  }

  test("JpegDims walks any spec-valid segment layout to the right SOF") {
    val prop = Prop.forAll(jpegGen) { c =>
      val r = JpegDims.compute(c.bytes)
      r != null && r.toIntArray().toSeq == Seq(c.w, c.h, c.prog)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("JpegDims never crashes and yields null (or stays right) on truncation") {
    val prop = Prop.forAll(jpegGen, Gen.choose(0.0, 1.0)) { (c, f) =>
      val cut = (c.bytes.length * f).toInt
      val r = JpegDims.compute(c.bytes.take(cut))
      // a prefix either still contains the whole SOF (same answer) or
      // must be rejected — never a different answer, never a throw
      r == null || r.toIntArray().toSeq == Seq(c.w, c.h, c.prog)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------------------------------------- MP4

  private def box(tpe: String, payload: Array[Byte], large: Boolean = false): Array[Byte] =
    if (large)
      be32(1) ++ tpe.getBytes("ascii") ++ be64(16L + payload.length) ++ payload
    else
      be32(8L + payload.length) ++ tpe.getBytes("ascii") ++ payload

  private def junkBoxGen: Gen[Array[Byte]] = for {
    tpe <- Gen.oneOf("free", "skip", "wide", "udta")
    n <- Gen.choose(0, 24)
    body <- Gen.listOfN(n, Gen.choose(0, 255))
    large <- Gen.prob(0.2)
  } yield box(tpe, body.map(_.toByte).toArray, large)

  private case class Mp4Case(bytes: Array[Byte], us: Long)

  private val mp4Gen: Gen[Mp4Case] = for {
    v1 <- Gen.prob(0.5)
    timescale <- Gen.choose(1L, 1000000L)
    duration <- Gen.choose(0L, if (v1) 1L << 40 else 0xffffffffL)
    pre <- Gen.choose(0, 2).flatMap(k => Gen.listOfN(k, junkBoxGen))
    mid <- Gen.choose(0, 2).flatMap(k => Gen.listOfN(k, junkBoxGen))
    post <- Gen.choose(0, 1).flatMap(k => Gen.listOfN(k, junkBoxGen))
    largeMoov <- Gen.prob(0.2)
  } yield {
    val mvhdPayload =
      if (v1) Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
        be32(timescale) ++ be64(duration)
      else Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(timescale) ++ be32(duration)
    val moov = box("moov", mid.flatten.toArray ++ box("mvhd", mvhdPayload),
      largeMoov)
    val ftyp = box("ftyp", "isom".getBytes("ascii") ++ be32(0x200) ++
      "mp41".getBytes("ascii"))
    val us = duration / timescale * 1000000L +
      duration % timescale * 1000000L / timescale
    Mp4Case(ftyp ++ pre.flatten.toArray ++ moov ++ post.flatten.toArray, us)
  }

  test("Mp4Duration walks any box interleaving (incl. largesize) to the mvhd") {
    val prop = Prop.forAll(mp4Gen) { c =>
      val r = Mp4Duration.compute(c.bytes)
      r != null && r.longValue() == c.us
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("Mp4Duration never crashes and yields null (or stays right) on truncation") {
    val prop = Prop.forAll(mp4Gen, Gen.choose(0.0, 1.0)) { (c, f) =>
      val cut = (c.bytes.length * f).toInt
      val r = Mp4Duration.compute(c.bytes.take(cut))
      r == null || r.longValue() == c.us
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
