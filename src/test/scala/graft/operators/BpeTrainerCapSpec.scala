package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** The trainer's cap contract: `vocabCap` truncation is a TOTAL order
  * (count desc, word asc), so the trained merge list is a pure
  * function of the corpus multiset — independent of partitioning,
  * input order, and whether the word counts came from a fresh scan, a
  * persisted index, or an incremental index merge. */
class BpeTrainerCapSpec extends SparkSpec {

  test("cap truncation is deterministic under repartitioning, with ties at the boundary") {
    import spark.implicits._
    // words engineered so the cap boundary lands INSIDE a tie group:
    // eight words with count 3 and a cap of 6 — a count-only sort
    // could pick any 4 of the 8; the (cnt desc, w asc) order must pick
    // the lexicographically smallest
    val tied = ('a' to 'h').map(c => s"w$c$c")
    val corpus = (Seq.fill(5)("top top") ++
      tied.flatMap(w => Seq.fill(3)(w)) ++ Seq("rare")).map(Tuple1(_))
    val df = corpus.toDF("text")

    val runs = Seq(1, 3, 7, 32).map { p =>
      BpeOps.topWords(
        BpeOps.wordCountsOf(df.repartition(p), col("text")), 6)
    }
    assert(runs.distinct.size == 1, "cap set varies with partitioning")
    val kept = runs.head.map(_._1)
    assert(kept.head == "top")
    // the tie group at the boundary resolves word-asc
    assert(kept.tail == tied.sorted.take(5),
      s"boundary ties must resolve lexicographically: $kept")
    assert(!kept.contains("rare"))

    // and the trained merges are identical across partitionings too
    val merges = Seq(1, 7, 32).map(p =>
      BpeOps.trainMerges(df.repartition(p), col("text"), 10, vocabCap = 6))
    assert(merges.distinct.size == 1)
  }

  test("cap determinism on random corpora and cap positions (property)") {
    import spark.implicits._
    val wordGen = Gen.oneOf(
      Gen.stringOfN(3, Gen.oneOf('a', 'b')),
      Gen.stringOfN(4, Gen.alphaLowerChar))
    val corpusGen = for {
      n <- Gen.choose(4, 30)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws
    val prop = Prop.forAll(corpusGen, Gen.choose(1, 8),
      Gen.choose(2, 31)) { (ws, cap, parts) =>
      val df = ws.map(Tuple1(_)).toDF("text")
      BpeOps.topWords(BpeOps.wordCountsOf(df, col("text")), cap) ==
        BpeOps.topWords(
          BpeOps.wordCountsOf(df.repartition(parts), col("text")), cap)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("persisted word-count index retrains the identical tokenizer, incl. incrementally") {
    val docs = graft.Tables.documents(spark, sfDir)
    val fresh = BpeOps.trainMerges(docs, col("text"), BpeOps.defaultNumMerges)

    // full index → retrain parity
    val path = Files.createTempDirectory("bpe-wc-idx").toString
    BpeOps.writeWordCounts(BpeOps.wordCountsOf(docs, col("text")), path)
    val fromIndex = BpeOps.trainMergesFromIndex(spark, path,
      BpeOps.defaultNumMerges)
    assert(fromIndex == fresh)

    // incremental: count halves separately, merge the indexes — the
    // grown-corpus retrain never rescans the first half
    val h1 = docs.filter(col("doc_id") % 2 === 0)
    val h2 = docs.filter(col("doc_id") % 2 =!= 0)
    val merged = BpeOps.mergeWordCounts(
      BpeOps.wordCountsOf(h1, col("text")),
      BpeOps.wordCountsOf(h2, col("text")))
    val incPath = Files.createTempDirectory("bpe-wc-inc").toString
    BpeOps.writeWordCounts(merged, incPath)
    assert(BpeOps.trainMergesFromIndex(spark, incPath,
      BpeOps.defaultNumMerges) == fresh)
  }
}
