package graft.functions

import graft.SparkSpec
import graft.operators.BpeOps
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property checks for the BPE tier on ARBITRARY corpora and probe
  * words — multibyte UTF-8, characters never seen in training,
  * adjacent repeats. Three load-bearing invariants:
  *
  *  1. encoding is lossless (tokens concatenate back to the word) for
  *     ANY model, including on words the trainer never saw;
  *  2. greedy encoding ≡ rank-order replay-to-fixpoint under any
  *     TRAINED model — the equivalence the DuckDB oracle's recursive
  *     CTE rests on (it holds because the trainer's collision skip
  *     keeps produced token strings unique);
  *  3. the trainer is input-order independent (its only input is the
  *     word-frequency map, so permuting the corpus cannot change the
  *     learned merges — the determinism the committed default list
  *     depends on).
  */
class BpePropSpec extends SparkSpec {

  private val wordGen: Gen[String] = Gen.oneOf(
    Gen.stringOfN(4, Gen.oneOf('a', 'b', 'c')), // dense pair collisions
    Gen.stringOfN(6, Gen.alphaLowerChar),
    Gen.oneOf("émile", "日本語", "naïve", "ΩΩΩ", "aaaa", "abab"),
    Gen.stringOfN(3, Gen.oneOf('α', '中', 'q', '9')))

  private val corpusGen: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(1, 12)
    ws <- Gen.listOfN(n, wordGen)
    cs <- Gen.listOfN(n, Gen.choose(1L, 9L))
  } yield ws.zip(cs)

  /** Rank-order replay to fixpoint — the oracle CTE's exact recipe. */
  private def replay(model: BpeModel, word: String): Seq[String] = {
    var toks = BpeModel.codePointTokens(word).toList
    model.merges.foreach { case (a, b) =>
      var changed = true
      while (changed) {
        val out = scala.collection.mutable.ListBuffer[String]()
        var rest = toks
        while (rest.nonEmpty) rest match {
          case x :: y :: t if x == a && y == b => out += (a + b); rest = t
          case x :: t => out += x; rest = t
          case Nil =>
        }
        changed = out.toList != toks
        toks = out.toList
      }
    }
    toks
  }

  test("roundtrip: tokens concatenate back to the word under any trained model") {
    val prop = Prop.forAll(corpusGen, Gen.listOfN(8, wordGen)) { (corpus, probes) =>
      val model = BpeModel(BpeOps.trainFromCounts(corpus, 10))
      (corpus.map(_._1) ++ probes).forall { w =>
        model.encodeWord(w).mkString("") == w
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("greedy encoding == rank-order replay under any trained model") {
    val prop = Prop.forAll(corpusGen, Gen.listOfN(8, wordGen)) { (corpus, probes) =>
      val model = BpeModel(BpeOps.trainFromCounts(corpus, 10))
      (corpus.map(_._1) ++ probes).forall { w =>
        model.encodeWord(w).toSeq == replay(model, w)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("trainer is corpus-order independent") {
    val prop = Prop.forAll(corpusGen, Gen.choose(0L, Long.MaxValue)) { (corpus, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(corpus)
      BpeOps.trainFromCounts(corpus, 10) == BpeOps.trainFromCounts(shuffled, 10)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }
}
