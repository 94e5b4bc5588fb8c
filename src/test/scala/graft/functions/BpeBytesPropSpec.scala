package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.operators.BpeOps

/** The byte-fallback id tier ([[BpeIdMap]] with `byteFallback = true`):
  * GPT-2's zero-OOV guarantee. On ARBITRARY unicode — multibyte,
  * astral (surrogate-pair) code points, characters no training corpus
  * ever saw, even lone surrogates — the id stream must contain no -1,
  * stay inside [0, byteBase + 256), and decode back to the input's
  * exact UTF-8 bytes. */
class BpeBytesPropSpec extends SparkSpec {

  private val wordGen: Gen[String] = Gen.oneOf(
    Gen.stringOfN(5, Gen.alphaLowerChar),
    Gen.stringOfN(4, Gen.oneOf('a', 'b', 'c')),
    Gen.oneOf("émile", "日本語", "naïve", "ΩΩΩ", "😀😀", "a𝄞b", "𝕊𝕡𝕒𝕣𝕜"),
    // lone surrogates: invalid scalar values — both the word's own
    // getBytes and the per-token fallback map them to '?', so the
    // byte-level roundtrip still holds
    Gen.oneOf("x\ud800y", "\udc00", "hi\ud83d"),
    Gen.stringOfN(3, Gen.choose(33.toChar, 0x2fff.toChar)))

  private def encodeToIds(ids: BpeIdMap, model: BpeModel,
      words: Seq[String]): Array[Int] = {
    val toks = words.filter(_.nonEmpty).flatMap(model.encodeWord)
    ids.mapIds(new GenericArrayData(
      toks.map(t => UTF8String.fromString(t)).toArray[Any])).toIntArray()
  }

  test("byte fallback: no OOV id, ids in range, decode == input bytes (property)") {
    val ids = BpeOps.defaultIdMapBytes
    val model = BpeOps.defaultModel
    val prop = Prop.forAll(Gen.listOfN(6, wordGen)) { words =>
      val stream = encodeToIds(ids, model, words)
      val decoded = ids.decodeBytes(stream.toSeq)
      // per-word byte concat, NOT mkString: re-encoding the joined
      // string could fuse a word-final lone high surrogate with the
      // next word's low surrogate, which no space-separated document
      // stream ever does
      val expected = words.filter(_.nonEmpty)
        .flatMap(_.getBytes(StandardCharsets.UTF_8)).toArray
      stream.forall(id => id >= 0 && id < ids.byteBase + 256) &&
        java.util.Arrays.equals(decoded, expected)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), prop)
    assert(res.passed, res.status.toString)
  }

  test("byte fallback under ANY trained model, not just the committed one") {
    val corpusGen = for {
      n <- Gen.choose(1, 10)
      ws <- Gen.listOfN(n, wordGen)
      cs <- Gen.listOfN(n, Gen.choose(1L, 9L))
    } yield ws.zip(cs)
    val prop = Prop.forAll(corpusGen, Gen.listOfN(5, wordGen)) { (corpus, probes) =>
      val model = BpeModel(BpeOps.trainFromCounts(corpus, 8))
      val alphabet = corpus.flatMap(c =>
        BpeModel.codePointTokens(c._1)).distinct.sorted
      val ids = BpeIdMap(BpeOps.vocabOf(model, alphabet), byteFallback = true)
      val words = (corpus.map(_._1) ++ probes).filter(_.nonEmpty)
      val stream = encodeToIds(ids, model, words)
      java.util.Arrays.equals(ids.decodeBytes(stream.toSeq),
        words.flatMap(_.getBytes(StandardCharsets.UTF_8)).toArray) &&
        !stream.contains(-1)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(80), prop)
    assert(res.passed, res.status.toString)
  }

  test("Spark end-to-end: unseen characters ride the byte tier, n_oov == 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "plain ascii words the trainer saw shapes of"),
      (2L, "emoji 😀 and astral 𝄞 clef"),
      (3L, "中文 words こんにちは mixed"),
      (4L, "ünïcödé aberrations £¥€")).toDF("doc_id", "text")
    val out = BpeOps.bpeIdsBytesOf(docs, col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r).toMap
    out.values.foreach { r => assert(r.getAs[Int]("n_oov") == 0) }
    assert(out(2L).getAs[Int]("n_byte_ids") > 0)
    assert(out(3L).getAs[Int]("n_byte_ids") > 0)

    // full-stream decode: the id column is byte-lossless per document
    val idsMap = BpeOps.defaultIdMapBytes
    val full = docs.select(col("doc_id"),
        BpeOps.bpeTokenIds(
          filter(split(col("text"), " "), w => length(w) > 0),
          BpeOps.defaultModel, idsMap).as("ids"),
        concat_ws("", filter(split(col("text"), " "), w => length(w) > 0))
          .as("joined"))
      .collect()
    full.foreach { r =>
      val decoded = idsMap.decodeBytes(r.getSeq[Int](1))
      assert(java.util.Arrays.equals(decoded,
        r.getString(2).getBytes(StandardCharsets.UTF_8)),
        s"doc ${r.getLong(0)} failed byte roundtrip")
    }
  }
}
