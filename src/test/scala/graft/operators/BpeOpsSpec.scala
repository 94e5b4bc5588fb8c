package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BpeModel

class BpeOpsSpec extends SparkSpec {

  test("trainer learns the classic merges on a hand-computed fixture") {
    // "low" x5, "lower" x2, "newest" x6, "widest" x3 — the arXiv:1508.07909
    // worked example family. Pair counts, round 1:
    //   (l,o)=7 (o,w)=7 (w,e)=2 (e,r)=2 (n,e)=6 (e,w)=6 (e,s)=9 (s,t)=9
    //   (w,i)=3 (i,d)=3 (d,e)=3
    // max is a 9-way tie between (e,s) and (s,t) → lexicographic: (e,s).
    val counts = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = BpeOps.trainFromCounts(counts, 4)
    // round 2: (es,t)=9 wins; round 3: (l,o)=7,(o,w)=7 tie → (l,o);
    // round 4: (lo,w)=7
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("trainer stops when no pair repeats, and caps at the requested merge count") {
    // every word unique → all pair counts 1 → zero merges
    assert(BpeOps.trainFromCounts(Seq(("abc", 1L), ("def", 1L)), 10).isEmpty)
    // cap respected even with merges left to learn
    assert(BpeOps.trainFromCounts(Seq(("abcd", 5L)), 2).size == 2)
    // produced token strings are unique by construction (the collision
    // skip) — the property the oracle's replay equivalence rests on
    val merges = BpeOps.trainFromCounts(
      Seq(("abab", 4L), ("abc", 3L), ("cab", 2L)), 10)
    val produced = merges.map { case (a, b) => a + b }
    assert(produced.distinct == produced)
  }

  test("the committed default merge list is exactly what the trainer produces on sf0.001") {
    val trained = BpeOps.trainMerges(
      graft.Tables.documents(spark, sfDir), col("text"), BpeOps.defaultNumMerges)
    assert(trained == BpeOps.defaultMerges)
  }

  test("encoder applies merges greedily by rank, left-to-right non-overlapping") {
    val m = BpeModel(Seq(("a", "a"), ("aa", "b")))
    assert(m.encodeWord("aaa").toSeq == Seq("aa", "a"))
    assert(m.encodeWord("aaaa").toSeq == Seq("aa", "aa"))
    assert(m.encodeWord("aab").toSeq == Seq("aab"))
    assert(m.encodeWord("baa").toSeq == Seq("b", "aa"))
    assert(m.encodeWord("x").toSeq == Seq("x"))
    // rank order matters: ("a","b") before ("b","c") vs after
    val m1 = BpeModel(Seq(("a", "b"), ("b", "c")))
    assert(m1.encodeWord("abc").toSeq == Seq("ab", "c"))
    val m2 = BpeModel(Seq(("b", "c"), ("a", "b")))
    assert(m2.encodeWord("abc").toSeq == Seq("a", "bc"))
  }

  test("greedy encoding equals rank-order replay under the default model") {
    // the equivalence the oracle's recursive CTE rests on — checked on
    // every distinct corpus word
    def replay(word: String): Seq[String] = {
      var toks = word.map(_.toString).toList
      BpeOps.defaultMerges.foreach { case (a, b) =>
        var changed = true
        while (changed) {
          val before = toks
          val out = scala.collection.mutable.ListBuffer[String]()
          var rest = toks
          while (rest.nonEmpty) rest match {
            case x :: y :: t if x == a && y == b => out += (a + b); rest = t
            case x :: t => out += x; rest = t
            case Nil =>
          }
          toks = out.toList
          changed = toks != before
        }
      }
      toks
    }
    val words = graft.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(BpeOps.defaultModel.encodeWord(w).toSeq == replay(w),
        s"greedy vs replay diverge on '$w'")
    }
  }

  test("token accounting query: counts are consistent and heads decode to word prefixes") {
    val rows = BpeOps.bpeTokenCounts(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = r.getAs[Int]("n_bpe_tokens")
      val uniq = r.getAs[Int]("n_unique_tokens")
      val head = r.getAs[String]("head_tokens")
      val words = docs(id).split(" ").filter(_.nonEmpty)
      val expected = words.flatMap(BpeOps.defaultModel.encodeWord)
      assert(n == expected.length, s"doc $id token count")
      assert(uniq == expected.distinct.length, s"doc $id distinct count")
      assert(head == expected.take(8).mkString(" "), s"doc $id head")
      // BPE never crosses word boundaries: concatenating the stream
      // reproduces the text with spaces removed
      assert(expected.mkString("") == words.mkString(""))
    }
  }

  test("token-space decontamination replays exactly from the encoder") {
    val out = BpeOps.contaminationBpe(spark, sfDir).collect()
    assert(out.nonEmpty)
    // independent replay: token streams → distinct n-gram shingle sets
    // → bench set = doc_id % 97 == 0 → per-train-doc overlap
    val n = BpeOps.bpeShingleN
    val toks = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map { r =>
        val stream = r.getString(1).split(" ").filter(_.nonEmpty)
          .flatMap(BpeOps.defaultModel.encodeWord)
        r.getLong(0) -> stream.sliding(n).filter(_.length == n)
          .map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty).toMap
    val bench = toks.collect { case (id, sh) if id % 97 == 0 => sh }
      .foldLeft(Set.empty[String])(_ ++ _)
    val expected = toks.collect { case (id, sh) if id % 97 != 0 =>
      id -> ((sh.size, (sh & bench).size))
    }
    assert(out.length == expected.size)
    out.foreach { r =>
      val id = r.getLong(0)
      val (n, ov) = expected(id)
      assert(r.getAs[Int]("n_shingles") == n, s"doc $id n_shingles")
      assert(r.getAs[Long]("n_overlap") == ov, s"doc $id n_overlap")
      assert(r.getAs[Boolean]("contaminated") ==
        (ov.toDouble / n > PipelineOps.contaminationFrac), s"doc $id gate")
    }
    // the fixture must exercise both verdicts or the gate is untested
    assert(out.exists(_.getAs[Boolean]("contaminated")))
    assert(out.exists(!_.getAs[Boolean]("contaminated")))
  }

  test("the committed default alphabet is exactly what the trainer produces on sf0.001") {
    val trained = BpeOps.trainAlphabet(
      graft.Tables.documents(spark, sfDir), col("text"))
    assert(trained == BpeOps.defaultAlphabet)
  }

  test("id streams replay exactly from the encoder + vocab; OOV maps to -1") {
    // vocab layout: alphabet ids 0..A-1 sorted, merge products after
    val vocab = BpeOps.defaultVocab.toMap
    assert(vocab.size == BpeOps.defaultAlphabet.size + BpeOps.defaultMerges.size)
    BpeOps.defaultAlphabet.sorted.zipWithIndex.foreach { case (c, i) =>
      assert(vocab(c) == i)
    }
    // OOV: a character outside the alphabet
    assert(BpeOps.defaultIdMap.idOf("z") == -1)
    assert(BpeOps.defaultIdMap.idOf("er") ==
      BpeOps.defaultAlphabet.size + 0) // first merge product

    val out = BpeOps.bpeIdCounts(spark, sfDir).collect()
    assert(out.nonEmpty)
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val id = r.getLong(0)
      val expected = docs(id).split(" ").filter(_.nonEmpty)
        .flatMap(BpeOps.defaultModel.encodeWord)
        .map(t => vocab.getOrElse(t, -1))
      assert(r.getAs[Int]("n_tokens") == expected.length, s"doc $id n_tokens")
      assert(r.getAs[Int]("n_oov") == expected.count(_ == -1), s"doc $id n_oov")
      assert(r.getAs[String]("head_ids") == expected.take(8).mkString(" "),
        s"doc $id head_ids")
      assert(r.getAs[Long]("id_sum") == expected.map(_.toLong).sum, s"doc $id id_sum")
    }
    // the training corpus itself must be fully in-vocabulary
    assert(out.forall(_.getAs[Int]("n_oov") == 0))
  }

  test("coverage report replays exactly from the encoder") {
    val out = BpeOps.bpeCoverage(spark, sfDir).collect()
    assert(out.nonEmpty)
    val docs = graft.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      val streams = rows.map(_._2.split(" ").filter(_.nonEmpty)
        .flatMap(BpeOps.defaultModel.encodeWord))
      val words = rows.map(_._2.split(" ").count(_.nonEmpty).toLong).sum
      val toks = streams.map(_.length.toLong).sum
      val single = streams.map(_.count(_.length == 1).toLong).sum
      val chars = streams.map(_.map(_.length.toLong).sum).sum
      src -> ((rows.length.toLong, words, toks, single,
        toks * 1000000L / words, chars * 1000000L / toks,
        single * 1000000L / toks))
    }
    assert(out.length == expected.size)
    out.foreach { r =>
      val src = r.getString(0)
      val (nd, nw, nt, ns, tpw, cpt, sf) = expected(src)
      assert(r.getLong(1) == nd, s"$src n_docs")
      assert(r.getLong(2) == nw, s"$src n_words")
      assert(r.getLong(3) == nt, s"$src n_tokens")
      assert(r.getLong(4) == ns, s"$src n_single_char_tokens")
      assert(r.getLong(5) == tpw, s"$src tokens_per_word_ppm")
      assert(r.getLong(6) == cpt, s"$src chars_per_token_ppm")
      assert(r.getLong(7) == sf, s"$src single_frac_ppm")
    }
    // tokenizer sanity on its own training corpus: every source shows
    // real merging (compression above 1 char/token, singletons not
    // the whole stream — the default list's ~60% singleton rate is
    // exactly what this report exists to surface)
    out.foreach { r =>
      assert(r.getLong(6) > 1000000L)
      assert(r.getLong(7) < 1000000L)
    }
  }

  test("BPE-budget packing matches the generic packer fed with real token counts") {
    val out = BpeOps.packSequencesBpe(spark, sfDir).collect()
    assert(out.nonEmpty)
    // per-source running sum replays the window definition
    val bySource = out.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getAs[Long]("pack_id") == cum / PipelineOps.packBudget)
        assert(r.getAs[Long]("pack_offset") == cum % PipelineOps.packBudget)
        cum += r.getAs[Int]("n_tokens")
      }
    }
  }
}
