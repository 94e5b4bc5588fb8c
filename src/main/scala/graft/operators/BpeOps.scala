package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.{BpeEncode, BpeEncodeIds, BpeIdMap, BpeModel}
import org.apache.spark.sql.GraftBridge

/** Real byte-pair-encoding tokenization (Sennrich et al.,
  * arXiv:1508.07909) as a first-class pipeline tier: every
  * token-denominated budget in a training-data pipeline — packing,
  * mixture weights, shard sizing — is denominated in TOKENIZER tokens,
  * not whitespace words, so the engine carries a real trainer and a
  * real encoder instead of a regex proxy.
  *
  * Scale design, in two halves exactly like production:
  *
  *  - TRAINING is one distributed word-count aggregation (the
  *    sufficient statistic — BPE training only ever sees the word
  *    frequency table, which Zipf keeps tiny relative to any corpus)
  *    followed by a driver-side merge loop over that table, capped at
  *    `vocabCap` distinct words. 100 TB of text still reduces to one
  *    shuffle on the word key plus an in-memory loop — this is how
  *    SentencePiece/HF trainers actually work.
  *  - ENCODING is a pure per-row native expression
  *    ([[graft.functions.BpeEncode]]): the merge table rides the task
  *    closure like a broadcast small side; no join, no shuffle, scan
  *    speed, memoized per executor.
  *
  * Determinism contract (what makes the DuckDB oracle exact): merge
  * selection is max-count with lexicographic (left, right) tie-break;
  * candidates whose concatenation collides with an existing token
  * string are skipped, which guarantees unique token strings and makes
  * the greedy encoder provably identical to rank-order merge replay —
  * the form the oracle's recursive CTE executes with delimiter-joined
  * `replace` rounds.
  */
object BpeOps {

  // ------------------------------------------------------ training

  /** Distributed trainer: word-frequency aggregation (one shuffle,
    * capped at `vocabCap` words by count-desc/word-asc — deterministic)
    * then the classic merge loop on the counts. */
  def trainMerges(df: DataFrame, text: Column, numMerges: Int,
      vocabCap: Int = 1 << 16): Seq[(String, String)] =
    trainFromCounts(topWords(wordCountsOf(df, text), vocabCap), numMerges)

  /** The trainer's sufficient statistic as a frame: (w, cnt) word
    * frequencies. One hash aggregation; Zipf keeps the table tiny
    * relative to any corpus. */
  def wordCountsOf(df: DataFrame, text: Column): DataFrame =
    df.select(explode(split(text, " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Deterministic cap: top `vocabCap` words by (count desc, word asc)
    * — the TOTAL order that makes cap truncation independent of
    * partitioning and input order (a count-only sort would tie-break
    * arbitrarily at the cap boundary and train different tokenizers on
    * different cluster layouts; CapDeterminismSpec pins this). */
  def topWords(wc: DataFrame, vocabCap: Int): Seq[(String, Long)] =
    wc.orderBy(col("cnt").desc, col("w").asc)
      .limit(vocabCap)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Persist the word-count table through the artifact store — the
    * half of the trainer that scans the corpus. A tokenizer retrain on
    * a GROWN corpus is then incremental: count only the new batch,
    * [[mergeWordCounts]] with the persisted index, rerun the in-memory
    * merge loop — the 100 TB retrain never rescans old shards. */
  def writeWordCounts(wc: DataFrame, path: String): Unit =
    graft.ArtifactStore.writeTable(wc, path, "bpe_word_counts")

  def loadWordCounts(s: SparkSession, path: String): DataFrame =
    graft.ArtifactStore.loadTable(s, path, "bpe_word_counts")

  /** Sum two word-count frames — counts are additive, so
    * counts(A ∪ B) == merge(counts(A), counts(B)) exactly. */
  def mergeWordCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("w").agg(sum(col("cnt")).as("cnt"))

  /** Retrain from a persisted word-count index (optionally merged with
    * a new batch's counts first): parity with a fresh [[trainMerges]]
    * over the same corpus is exact because the word-count table is the
    * trainer's ONLY input (spec-pinned). */
  def trainMergesFromIndex(s: SparkSession, path: String, numMerges: Int,
      vocabCap: Int = 1 << 16): Seq[(String, String)] =
    trainFromCounts(topWords(loadWordCounts(s, path), vocabCap), numMerges)

  /** The base alphabet (distinct characters across the corpus's
    * words) — the other half of the committed tokenizer artifact: ids
    * 0..|alphabet|-1 belong to the alphabet in sorted order, merge
    * products follow in rank order ([[vocabOf]]). One distributed
    * distinct over exploded chars; like the word-count table, Zipf
    * keeps it tiny at any corpus size. Characters are JVM code units,
    * exactly the units [[graft.functions.BpeModel.encodeWord]] starts
    * from. */
  def trainAlphabet(df: DataFrame, text: Column): Seq[String] =
    df.select(explode(split(text, "")).as("c"))
      .filter(col("c") =!= " " && length(col("c")) > 0)
      .distinct()
      .collect().map(_.getString(0)).toSeq.sorted

  /** The in-memory merge loop over a word-frequency table — classic
    * BPE: count adjacent token pairs weighted by word frequency, merge
    * the most frequent, repeat. Stops early when no pair occurs twice
    * (merging a singleton pair is vocabulary noise). */
  def trainFromCounts(wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    // code-point split, the same base units the encoder starts from
    var vocab: Array[(Array[String], Long)] =
      wordCounts.map { case (w, c) =>
        (graft.functions.BpeModel.codePointTokens(w), c)
      }.toArray
    val tokenStrings = scala.collection.mutable.HashSet[String]()
    vocab.foreach { case (toks, _) => toks.foreach(tokenStrings += _) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var exhausted = false
    while (!exhausted && merges.size < numMerges) {
      val pc = scala.collection.mutable.HashMap[(String, String), Long]()
      vocab.foreach { case (toks, c) =>
        var i = 0
        while (i < toks.length - 1) {
          val p = (toks(i), toks(i + 1))
          pc.update(p, pc.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      val candidates = pc.iterator.filter { case (p, c) =>
        c >= 2 && !tokenStrings.contains(p._1 + p._2)
      }
      if (candidates.isEmpty) exhausted = true
      else {
        // max count; ties break to the lexicographically smallest pair
        val (best, _) = candidates.reduce { (x, y) =>
          if (y._2 > x._2 ||
            (y._2 == x._2 && Ordering[(String, String)].lt(y._1, x._1))) y
          else x
        }
        merges += best
        tokenStrings += best._1 + best._2
        vocab = vocab.map { case (toks, c) => (mergePair(toks, best), c) }
      }
    }
    merges.toSeq
  }

  /** One left-to-right non-overlapping merge pass — the same loop the
    * encoder applies, so training and encoding segment identically. */
  private def mergePair(toks: Array[String], p: (String, String)): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == p._1 && toks(i + 1) == p._2) {
        out += p._1 + p._2; i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toArray
  }

  // ------------------------------------------------------ pinned model

  /** The committed tokenizer artifact: `trainMerges` over the sf0.001
    * `documents` corpus with 40 merges (BpeOpsSpec pins that the
    * trainer reproduces this list byte-for-byte — the artifact is
    * regenerable, not hand-made). Production swaps in its own trained
    * list the same way a pretrained tokenizer ships with a model; the
    * oracle embeds the identical list as literal VALUES, so the
    * encoder is verified merge-by-merge against an independent
    * engine. */
  val defaultNumMerges = 40

  val defaultMerges: Seq[(String, String)] = DefaultBpeMerges.merges

  val defaultModel: BpeModel = BpeModel(defaultMerges)

  val defaultAlphabet: Seq[String] = DefaultBpeMerges.alphabet

  /** Dense vocabulary: alphabet (sorted) gets ids 0..A-1, merge
    * products A..A+M-1 in rank order. Merge products have length ≥ 2,
    * so the two ranges cannot collide; the trainer's collision skip
    * keeps products unique among themselves. */
  def vocabOf(model: BpeModel, alphabet: Seq[String]): Seq[(String, Int)] =
    (alphabet.sorted ++ model.merges.map { case (a, b) => a + b }).zipWithIndex

  val defaultVocab: Seq[(String, Int)] = vocabOf(defaultModel, defaultAlphabet)
  val defaultIdMap: BpeIdMap = BpeIdMap(defaultVocab)

  /** The byte-fallback id map (GPT-2 recipe): ids `vocab.size + b` for
    * the 256 bytes extend the committed layout, OOV tokens decompose
    * into their UTF-8 bytes, and NO token is ever dropped — the id
    * stream a production training shard stores, where out-of-
    * distribution text must lose nothing. */
  val defaultIdMapBytes: BpeIdMap = BpeIdMap(defaultVocab, byteFallback = true)

  // --------------------------------------- model persistence

  /** The merge list as a standing artifact via [[graft.ArtifactStore]]
    * — rank-ordered (rank, left, right) rows, the interchange form
    * every BPE implementation reads. A multi-job pipeline trains the
    * tokenizer once; every later encode/budget/decontam run loads it
    * (parity spec-pinned in ArtifactParitySpec). */
  def writeBpeModel(s: SparkSession, model: BpeModel, path: String): Unit = {
    import s.implicits._
    graft.ArtifactStore.writeTable(
      model.merges.zipWithIndex
        .map { case ((a, b), i) => (i, a, b) }
        .toDF("rank", "left", "right"),
      path, "bpe_merges")
  }

  def loadBpeModel(s: SparkSession, path: String): BpeModel =
    BpeModel(graft.ArtifactStore.loadTable(s, path, "bpe_merges")
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq)

  /** The alphabet is the other half of the tokenizer artifact: ids are
    * a pure function of (alphabet, merges) via [[vocabOf]], so
    * persisting both makes the id space reproducible across jobs. */
  def writeBpeAlphabet(s: SparkSession, alphabet: Seq[String], path: String): Unit = {
    import s.implicits._
    graft.ArtifactStore.writeTable(
      alphabet.sorted.zipWithIndex.map { case (c, i) => (i, c) }.toDF("ord", "ch"),
      path, "bpe_alphabet")
  }

  def loadBpeAlphabet(s: SparkSession, path: String): Seq[String] =
    graft.ArtifactStore.loadTable(s, path, "bpe_alphabet")
      .orderBy("ord").collect().map(_.getAs[String]("ch")).toSeq

  /** Column handle for the encoder under an arbitrary model. */
  def bpeTokens(words: Column, model: BpeModel = defaultModel): Column =
    GraftBridge.column(BpeEncode(GraftBridge.expression(words), model))

  /** Column handle for the id encoder: the int stream a training shard
    * actually stores (ids for the embedding table, not strings). Same
    * zero-shuffle scan shape as [[bpeTokens]]. */
  def bpeTokenIds(words: Column, model: BpeModel = defaultModel,
      ids: BpeIdMap = defaultIdMap): Column =
    GraftBridge.column(BpeEncodeIds(GraftBridge.expression(words), model, ids))

  // ------------------------------------------------------ queries

  /** Generic API: per-document token accounting under real BPE —
    * stream length, distinct tokens, and the head of the stream as an
    * audit column. One native-expression projection, zero shuffles. */
  def bpeTokensOf(df: DataFrame, id: Column, text: Column,
      model: BpeModel = defaultModel): DataFrame =
    df.withColumn("_toks",
        bpeTokens(filter(split(text, " "), w => length(w) > 0), model))
      .select(id,
        size(col("_toks")).as("n_bpe_tokens"),
        size(array_distinct(col("_toks"))).as("n_unique_tokens"),
        array_join(slice(col("_toks"), 1, 8), " ").as("head_tokens"))

  /** Documents with at least one nonempty word — the oracle CTE's
    * `perdoc` drops wordless docs (inner join through the encoded-word
    * table), so the query wrappers match that contract explicitly
    * instead of relying on the driver corpus never containing an
    * empty text. The generic APIs keep all rows (a wordless doc is a
    * legitimate n_tokens=0 record for a caller). */
  private def wordedDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(size(filter(split(col("text"), " "), w => length(w) > 0)) >= 1)

  def bpeTokenCounts(s: SparkSession, dir: String): DataFrame =
    bpeTokensOf(wordedDocs(s, dir), col("doc_id"), col("text"))
      .orderBy("doc_id")

  /** Per-document id-stream accounting: length, OOV count (tokens
    * outside the vocabulary → -1, the char-level stand-in for byte
    * fallback), the head of the stream, and an order-independent
    * integer checksum — the integrity audit a consumer of tokenized
    * shards runs. One native-expression projection, zero shuffles. */
  def bpeIdsOf(df: DataFrame, id: Column, text: Column,
      model: BpeModel = defaultModel,
      ids: BpeIdMap = defaultIdMap): DataFrame =
    df.withColumn("_ids",
        bpeTokenIds(filter(split(text, " "), w => length(w) > 0), model, ids))
      .select(id,
        size(col("_ids")).as("n_tokens"),
        size(filter(col("_ids"), x => x === -1)).as("n_oov"),
        array_join(transform(slice(col("_ids"), 1, 8), _.cast("string")), " ")
          .as("head_ids"),
        aggregate(col("_ids"), lit(0L), (acc, x) => acc + x).as("id_sum"))

  def bpeIdCounts(s: SparkSession, dir: String): DataFrame =
    bpeIdsOf(wordedDocs(s, dir), col("doc_id"), col("text"))
      .orderBy("doc_id")

  /** The byte-fallback id stream — `n_oov` is provably zero (no -1 can
    * be emitted) and `n_byte_ids` audits how much of the stream fell
    * through to the byte tier. Same zero-shuffle scan shape; the
    * stream is byte-lossless ([[graft.functions.BpeIdMap.decodeBytes]],
    * property-pinned on arbitrary unicode in BpeBytesPropSpec). */
  def bpeIdsBytesOf(df: DataFrame, id: Column, text: Column,
      model: BpeModel = defaultModel,
      ids: BpeIdMap = defaultIdMapBytes): DataFrame = {
    val byteBase = ids.byteBase
    df.withColumn("_ids",
        bpeTokenIds(filter(split(text, " "), w => length(w) > 0), model, ids))
      .select(id,
        size(col("_ids")).as("n_ids"),
        size(filter(col("_ids"), x => x === -1)).as("n_oov"),
        size(filter(col("_ids"), x => x >= byteBase)).as("n_byte_ids"),
        array_join(transform(slice(col("_ids"), 1, 8), _.cast("string")), " ")
          .as("head_ids"),
        aggregate(col("_ids"), lit(0L), (acc, x) => acc + x).as("id_sum"))
  }

  /** The OOV plant for the bytes gate: the driver corpus is entirely
    * in-alphabet, so (the piiScrub fixture pattern, mirrored in the
    * oracle) every 7th doc gains a word of out-of-distribution
    * characters covering all four UTF-8 byte-length branches — 1-byte
    * (z/x/9 — outside the a-w,y alphabet), 2-byte (§ Ω), 3-byte (∑),
    * 4-byte astral (𝄞). The hash check then discriminates the whole
    * fallback tier, not just the in-vocab path; the plant-free generic
    * API is [[bpeIdsBytesOf]]. */
  private val oovPlant = "zx9§Ω∑𝄞"

  def bpeIdCountsBytes(s: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(s, dir)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" " + oovPlant)))
          .otherwise(col("text")))
      .filter(size(filter(split(col("text"), " "), w => length(w) > 0)) >= 1)
    bpeIdsBytesOf(planted, col("doc_id"), col("text"))
      .orderBy("doc_id")
  }

  /** BPE-budget sequence packing: [[PipelineOps.packSequencesOf]] with
    * the token column denominated in real tokenizer tokens instead of
    * whitespace words — the form every production packer runs. */
  def packSequencesBpe(s: SparkSession, dir: String): DataFrame =
    PipelineOps.packSequencesOf(
      wordedDocs(s, dir)
        .withColumn("n_tokens",
          size(bpeTokens(filter(split(col("text"), " "), w => length(w) > 0)))),
      col("source"), col("doc_id"), col("n_tokens"), PipelineOps.packBudget)
      .select("doc_id", "source", "n_tokens", "pack_id", "pack_offset")
      .orderBy("doc_id")

  // ---------------------------------------------- token-budget mix

  /** Deterministic pseudo-random order key for budget selection: one
    * Park-Miller/Lehmer step (id * 48271 mod 2^31-1) — pure integer
    * arithmetic both engines compute bit-identically. Contract:
    * NON-NEGATIVE ids up to ~2^44 (the multiply stays inside a long,
    * and DuckDB's % is sign-preserving where Spark's pmod is not — a
    * negative id would diverge); a content hash replaces it if ids can
    * exceed that. */
  private def budgetOrderKey(id: Column): Column =
    pmod(id * lit(48271L), lit(2147483647L))

  /** The same Lehmer step host-side — the streaming admission gate and
    * the specs replay selection order with it, so the constant lives
    * once. */
  def lehmerKey(id: Long): Long = (id * 48271L) % 2147483647L

  /** Token-budget corpus selection: per source, keep documents in a
    * deterministic hash-shuffled order until the source's REAL-BPE
    * token budget is exhausted — the exact-quota form of corpus mixing
    * (a training run is budgeted in tokens, not documents, and an
    * over-represented source must land within one document of its
    * quota, not just in expectation). `budgetOf` maps each source's
    * total token mass to its budget. Output keeps every row with its
    * audit trail (running mass before the doc + the verdict), so the
    * dropped complement is inspectable.
    *
    * Scale: one scan + encoder (the token counts are a native
    * projection), then ONE shuffle for the per-source running-total
    * window. The per-source sort is the price of an exact quota; when
    * sources are few (the universal case — a mix config names tens of
    * sources, not millions) each source's row stream is a single
    * ordered partition and AQE handles the rest. When an exact quota
    * is NOT required, [[PipelineOps.sampleByRateOf]] with
    * rate = budget/total is the stateless map-side form — this
    * operator is for the contract where the quota is hard. */
  def tokenBudgetMixOf(df: DataFrame, id: Column, source: Column,
      nTokens: Column, budgetOf: Column => Column): DataFrame = {
    val base = df.select(id.as("doc_id"), source.as("source"),
      nTokens.cast("long").as("n_tokens"))
    val wOrd = Window.partitionBy(col("source"))
      .orderBy(col("_ord").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("source"))
    base
      .withColumn("_ord", budgetOrderKey(col("doc_id")))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(wOrd), lit(0L)))
      .withColumn("_budget", budgetOf(sum(col("n_tokens")).over(wAll)))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_before"),
        (col("cum_before") < col("_budget")).as("kept"))
  }

  /** The query row: keep half of every source's total BPE token mass
    * (budget = total >> 1 — integer halving, engine-exact). Both
    * verdict classes are populated at every sf because the budget is
    * relative to the source's own mass. */
  def tokenBudgetMix(s: SparkSession, dir: String): DataFrame =
    tokenBudgetMixOf(
      wordedDocs(s, dir).withColumn("n_tokens",
        size(bpeTokens(filter(split(col("text"), " "), w => length(w) > 0)))),
      col("doc_id"), col("source"), col("n_tokens"),
      total => shiftright(total, 1))
      .orderBy("doc_id")

  /** Quota-utilization report over the budget mix — the per-source
    * audit a mix operator reads before a training run (how much of
    * each quota is spent, how many documents the cut dropped): one
    * rollup over [[tokenBudgetMix]]'s verdicts, exact integer ppm so
    * the report hash-checks. The crossing document is counted kept
    * (cum_before < budget admits it), so utilization can exceed 1e6 by
    * at most that one document — the same within-one-doc contract the
    * mix itself carries. */
  def tokenBudgetReport(s: SparkSession, dir: String): DataFrame =
    tokenBudgetMix(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("kept_tokens"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        col("total_tokens"), col("kept_tokens"),
        shiftright(col("total_tokens"), 1).as("budget"),
        // a one-token source has budget 0 — report 0 utilization
        // rather than tripping ANSI division-by-zero
        expr("CASE WHEN total_tokens div 2 = 0 THEN 0L " +
          "ELSE kept_tokens * 1000000 div (total_tokens div 2) END")
          .as("utilization_ppm"))
      .orderBy("source")

  // lazy: composes tokenBudgetMixSql, which is declared further down
  // the object body (object vals initialize in declaration order)
  lazy val tokenBudgetReportSql: String =
    s"""WITH mix AS ($tokenBudgetMixSql)
       |SELECT source,
       |  count(*) AS n_docs,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT)
       |    AS kept_tokens,
       |  CAST(sum(n_tokens) // 2 AS BIGINT) AS budget,
       |  CAST(CASE WHEN sum(n_tokens) // 2 = 0 THEN 0
       |    ELSE sum(CASE WHEN kept THEN n_tokens ELSE 0 END) * 1000000
       |      // (sum(n_tokens) // 2) END AS BIGINT) AS utilization_ppm
       |FROM mix GROUP BY source ORDER BY source""".stripMargin

  /** Generic API: each document's BPE token stream re-joined to a
    * single-space text column, so every downstream word-domain operator
    * (shingling, n-gram dedup, decontamination) runs in TOKEN space by
    * swapping its input frame — tokens never contain spaces (they are
    * merges of characters within space-split words), so the join is a
    * lossless change of domain. One native-expression projection. */
  def bpeTextOf(df: DataFrame, id: Column, text: Column,
      model: BpeModel = defaultModel): DataFrame =
    df.select(id.as("doc_id"),
      array_join(bpeTokens(filter(split(text, " "), w => length(w) > 0)),
        " ").as("bpe_text"))

  /** Token-space benchmark decontamination: the standard n-gram
    * contamination gate ([[PipelineOps.contaminationHashedOf]]) with
    * shingles over the REAL BPE token stream instead of whitespace
    * words — the domain production decontamination actually runs in
    * (eval suites are matched by token n-grams, so a benchmark answer
    * that re-flows whitespace or merges rare words differently still
    * collides exactly where the trained tokenizer says it does).
    * Composition is a frame swap: [[bpeTextOf]] feeds the SAME
    * [[DedupOps.shingleHashesOf]] native shingle expression and the
    * SAME broadcast-probe contamination core, so the scale shape is
    * unchanged — encode at scan speed, benchmark hashes broadcast,
    * one doc_id rollup.
    *
    * Token-space gates run LONGER n-grams than word-space ones
    * (production sits at 10-13 tokens; subword streams are denser, so
    * a 3-token window matches everywhere — measured median 44% overlap
    * on this corpus vs 0% at 13). [[bpeShingleN]]=8 is the calibrated
    * middle for the synthetic corpus's short token streams: both
    * verdict classes stay populated at every test sf (128/494 and
    * 78/494 contaminated at sf0.001/sf0.01). */
  val bpeShingleN = 8

  def contaminationBpe(s: SparkSession, dir: String): DataFrame = {
    val hs = DedupOps.shingleHashesOf(
      bpeTextOf(Tables.spread(s, Tables.documents(s, dir)),
        col("doc_id"), col("text")),
      "doc_id", "bpe_text", bpeShingleN)
    PipelineOps.contaminationHashedOf(
      hs.filter(col("doc_id") % 97 =!= 0),
      hs.filter(col("doc_id") % 97 === 0),
      PipelineOps.contaminationFrac)
      .orderBy("doc_id")
  }

  // ------------------------------------------------------ oracles

  /** The merge list as literal VALUES rows (rank, pattern, replacement)
    * in the chr(1)-delimited string domain the CTE rewrites. Quotes are
    * SQL-escaped like [[vocabValues]];  is the CTE's delimiter,
    * so a token containing it would corrupt the replay — a regenerated
    * merge list from such a corpus must fail loudly, not emit broken
    * SQL. */
  private def mergesValues: String = {
    defaultMerges.foreach { case (a, b) =>
      require(!a.contains('') && !b.contains(''),
        "BPE merge token contains the \\u0001 oracle delimiter")
    }
    def esc(t: String) = t.replace("'", "''")
    defaultMerges.zipWithIndex.map { case ((a, b), i) =>
      s"(${i + 1}, chr(1)||'${esc(a)}'||chr(1)||'${esc(b)}'||chr(1), " +
        s"chr(1)||'${esc(a)}${esc(b)}'||chr(1))"
    }.mkString(",\n      ")
  }

  /** Independent re-execution of the encoder in DuckDB: encode each
    * DISTINCT word once by replaying the merge list in rank order to a
    * fixpoint (a recursive CTE over a chr(1)-delimited char string —
    * `replace` is left-to-right non-overlapping on both engines, and
    * unique token strings make replay ≡ greedy), then join the encoded
    * words back onto the corpus in position order. The distinct-word
    * indirection is also the honest scale shape: Zipf makes the
    * encode-once table tiny relative to any corpus. */
  private def encodedWordsCte: String = encodedWordsCteOver("documents")

  private def encodedWordsCteOver(src: String): String =
    s"""merges(rank, pat, rep) AS (VALUES
       |      $mergesValues),
       |dw AS (
       |  SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM $src),
       |enc AS (
       |  SELECT w, 1 AS rank,
       |    chr(1) || array_to_string(string_split(w, ''), chr(1)) || chr(1) AS s
       |  FROM dw WHERE len(w) > 0
       |  UNION ALL
       |  SELECT e.w,
       |    CASE WHEN position(m.pat IN e.s) > 0 THEN e.rank ELSE e.rank + 1 END,
       |    CASE WHEN position(m.pat IN e.s) > 0 THEN replace(e.s, m.pat, m.rep)
       |         ELSE e.s END
       |  FROM enc e JOIN merges m ON m.rank = e.rank),
       |wtoks AS (
       |  SELECT w, list_filter(string_split(s, chr(1)), x -> x <> '') AS toks
       |  FROM enc WHERE rank = ${defaultMerges.size + 1}),
       |dwords AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
       |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
       |  FROM $src),
       |perdoc AS (
       |  SELECT d.doc_id, flatten(list(t.toks ORDER BY d.pos)) AS toks
       |  FROM dwords d JOIN wtoks t ON d.w = t.w
       |  GROUP BY d.doc_id)""".stripMargin

  val bpeTokenCountsSql: String =
    s"""WITH RECURSIVE
       |$encodedWordsCte
       |SELECT doc_id,
       |  CAST(len(toks) AS INTEGER) AS n_bpe_tokens,
       |  CAST(len(list_distinct(toks)) AS INTEGER) AS n_unique_tokens,
       |  array_to_string(toks[1:8], ' ') AS head_tokens
       |FROM perdoc ORDER BY doc_id""".stripMargin

  val packSequencesBpeSql: String =
    s"""WITH RECURSIVE
       |$encodedWordsCte,
       |counts AS (
       |  SELECT p.doc_id, d.source, CAST(len(p.toks) AS INTEGER) AS n_tokens
       |  FROM perdoc p JOIN documents d ON p.doc_id = d.doc_id),
       |cum AS (
       |  SELECT doc_id, source, n_tokens,
       |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS cum_before
       |  FROM counts)
       |SELECT doc_id, source, n_tokens,
       |  CAST(floor(cum_before / ${PipelineOps.packBudget}.0) AS BIGINT) AS pack_id,
       |  CAST(cum_before % ${PipelineOps.packBudget} AS BIGINT) AS pack_offset
       |FROM cum ORDER BY doc_id""".stripMargin

  /** Budget-mix twin: token counts from the CTE-encoded streams, the
    * same Lehmer order key and integer-halved budget — every compared
    * cell is integer arithmetic, so the verdict rows hash-match. */
  val tokenBudgetMixSql: String =
    s"""WITH RECURSIVE
       |$encodedWordsCte,
       |counts AS (
       |  SELECT p.doc_id, d.source, CAST(len(p.toks) AS BIGINT) AS n_tokens,
       |    (p.doc_id * 48271) % 2147483647 AS ord
       |  FROM perdoc p JOIN documents d ON p.doc_id = d.doc_id),
       |cum AS (
       |  SELECT doc_id, source, n_tokens,
       |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
       |      ORDER BY ord, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS cum_before,
       |    CAST(sum(n_tokens) OVER (PARTITION BY source) // 2 AS BIGINT)
       |      AS budget
       |  FROM counts)
       |SELECT doc_id, source, n_tokens, cum_before, cum_before < budget AS kept
       |FROM cum ORDER BY doc_id""".stripMargin

  /** Tokenizer-health report — the per-source coverage audit run
    * before committing a tokenizer to a training run: compression
    * (chars/token, tokens/word) and the unmerged single-character
    * fraction (a high singleton rate on a source means the merge
    * table was trained on different text and every budget downstream
    * is inflated). Pure map-side accounting over the encoder's
    * output arrays (no explode — `size`/`filter` on the token array
    * per row) + one per-source rollup; ratios are exact integer
    * parts-per-million so the report is hash-checkable and
    * partition-order independent. */
  def bpeCoverage(s: SparkSession, dir: String): DataFrame = {
    val toks = bpeTokens(filter(split(col("text"), " "), w => length(w) > 0))
    val sums = wordedDocs(s, dir)
      .withColumn("_t", toks)
      .select(col("source"),
        size(col("_t")).cast("long").as("n_toks"),
        size(filter(col("_t"), t => length(t) === 1)).cast("long").as("n_single"),
        length(array_join(col("_t"), "")).cast("long").as("n_chars"),
        size(filter(split(col("text"), " "), w => length(w) > 0))
          .cast("long").as("n_words"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("n_single")).as("n_single_char_tokens"),
        sum(col("n_chars")).as("_nc"))
    sums.select(col("source"), col("n_docs"), col("n_words"),
        col("n_tokens"), col("n_single_char_tokens"),
        expr("n_tokens * 1000000 div n_words").as("tokens_per_word_ppm"),
        expr("_nc * 1000000 div n_tokens").as("chars_per_token_ppm"),
        expr("n_single_char_tokens * 1000000 div n_tokens")
          .as("single_frac_ppm"))
      .orderBy("source")
  }

  /** Token-space twin of [[PipelineOps.contaminationSql]]: the SAME
    * shingle/intersect/threshold SQL, but over the CTE-encoded token
    * streams — intersects shingle *strings*, identical to the hashed
    * plan up to 64-bit collisions. */
  val contaminationBpeSql: String =
    s"""WITH RECURSIVE
       |$encodedWordsCte,
       |sh_t AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(len(toks) - ${bpeShingleN - 1}),
       |      i -> array_to_string(toks[i+1:i+$bpeShingleN], ' '))) AS sh
       |  FROM perdoc WHERE len(toks) >= $bpeShingleN),
       |bl AS (
       |  SELECT list(s) AS bl FROM (
       |    SELECT DISTINCT unnest(sh) AS s FROM sh_t WHERE doc_id % 97 = 0))
       |SELECT doc_id,
       |  CAST(len(sh) AS INTEGER) AS n_shingles,
       |  CAST(len(list_intersect(sh, bl)) AS BIGINT) AS n_overlap,
       |  CAST(len(list_intersect(sh, bl)) AS DOUBLE) / len(sh) AS overlap_frac,
       |  (CAST(len(list_intersect(sh, bl)) AS DOUBLE) / len(sh))
       |    > ${PipelineOps.contaminationFrac} AS contaminated
       |FROM sh_t CROSS JOIN bl
       |WHERE doc_id % 97 <> 0
       |ORDER BY doc_id""".stripMargin

  /** Coverage report twin: per-source integer sums over the CTE-encoded
    * streams; ratio columns are the same floor-div ppm on both engines. */
  val bpeCoverageSql: String =
    s"""WITH RECURSIVE
       |$encodedWordsCte,
       |per AS (
       |  SELECT d.source,
       |    CAST(len(list_filter(string_split(d.text, ' '), w -> len(w) > 0))
       |      AS BIGINT) AS n_words,
       |    CAST(len(p.toks) AS BIGINT) AS n_toks,
       |    CAST(len(list_filter(p.toks, t -> len(t) = 1)) AS BIGINT) AS n_single,
       |    CAST(len(array_to_string(p.toks, '')) AS BIGINT) AS n_chars
       |  FROM perdoc p JOIN documents d ON p.doc_id = d.doc_id)
       |SELECT source,
       |  count(*) AS n_docs,
       |  CAST(sum(n_words) AS BIGINT) AS n_words,
       |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       |  CAST(sum(n_single) AS BIGINT) AS n_single_char_tokens,
       |  CAST(sum(n_toks) * 1000000 // sum(n_words) AS BIGINT)
       |    AS tokens_per_word_ppm,
       |  CAST(sum(n_chars) * 1000000 // sum(n_toks) AS BIGINT)
       |    AS chars_per_token_ppm,
       |  CAST(sum(n_single) * 1000000 // sum(n_toks) AS BIGINT)
       |    AS single_frac_ppm
       |FROM per GROUP BY source ORDER BY source""".stripMargin

  /** The vocabulary as literal VALUES rows (token, id) — SQL-escaped
    * like [[mergesValues]]. */
  private def vocabValues: String =
    defaultVocab.map { case (t, i) =>
      s"('${t.replace("'", "''")}', $i)"
    }.mkString(",\n      ")

  /** Id-stream twin: re-encode via the CTE, then map each token
    * through the SAME (token, id) table the engine's id map carries —
    * an independent DuckDB replay of encode+lookup end to end. */
  val bpeIdCountsSql: String =
    s"""WITH RECURSIVE
       |$encodedWordsCte,
       |vocab(token, id) AS (VALUES
       |      $vocabValues),
       |ptoks AS (
       |  SELECT doc_id, unnest(toks) AS tok,
       |    unnest(range(1, len(toks) + 1)) AS pos
       |  FROM perdoc),
       |pids AS (
       |  SELECT p.doc_id, p.pos, coalesce(v.id, -1) AS id
       |  FROM ptoks p LEFT JOIN vocab v ON p.tok = v.token)
       |SELECT doc_id,
       |  CAST(count(*) AS INTEGER) AS n_tokens,
       |  CAST(sum(CASE WHEN id = -1 THEN 1 ELSE 0 END) AS INTEGER) AS n_oov,
       |  array_to_string(list(CAST(id AS VARCHAR) ORDER BY pos)[1:8], ' ')
       |    AS head_ids,
       |  CAST(sum(id) AS BIGINT) AS id_sum
       |FROM pids GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Byte-fallback twin of [[bpeIdCountsSql]]: an OOV token is always
    * a single code point (every multi-char token is a merge product,
    * which is in-vocab by construction), so the oracle expands it to
    * the UTF-8 bytes of `unicode(tok)` with pure integer arithmetic —
    * engine-exact, no byte/blob functions needed. */
  val bpeIdCountsBytesSql: String = {
    val vSize = defaultVocab.size
    // UTF-8 encoding of code point c, each byte offset by the byte base
    val c = "unicode(p.tok)"
    val byteIds =
      s"""CASE
         |      WHEN $c < 128 THEN [$vSize + $c]
         |      WHEN $c < 2048 THEN
         |        [$vSize + 192 + $c // 64, $vSize + 128 + $c % 64]
         |      WHEN $c < 65536 THEN
         |        [$vSize + 224 + $c // 4096, $vSize + 128 + ($c // 64) % 64,
         |         $vSize + 128 + $c % 64]
         |      ELSE
         |        [$vSize + 240 + $c // 262144, $vSize + 128 + ($c // 4096) % 64,
         |         $vSize + 128 + ($c // 64) % 64, $vSize + 128 + $c % 64]
         |    END""".stripMargin
    s"""WITH RECURSIVE
       |docs_b AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 7 = 0 THEN text || ' $oovPlant'
       |         ELSE text END AS text
       |  FROM documents),
       |${encodedWordsCteOver("docs_b")},
       |vocab(token, id) AS (VALUES
       |      $vocabValues),
       |ptoks AS (
       |  SELECT doc_id, unnest(toks) AS tok,
       |    unnest(range(1, len(toks) + 1)) AS pos
       |  FROM perdoc),
       |pids AS (
       |  SELECT p.doc_id, p.pos,
       |    CASE WHEN v.id IS NOT NULL THEN [v.id]
       |    ELSE $byteIds END AS ids
       |  FROM ptoks p LEFT JOIN vocab v ON p.tok = v.token),
       |flat AS (
       |  SELECT doc_id, pos, unnest(ids) AS id,
       |    unnest(range(1, len(ids) + 1)) AS sub
       |  FROM pids)
       |SELECT doc_id,
       |  CAST(count(*) AS INTEGER) AS n_ids,
       |  CAST(sum(CASE WHEN id = -1 THEN 1 ELSE 0 END) AS INTEGER) AS n_oov,
       |  CAST(sum(CASE WHEN id >= $vSize THEN 1 ELSE 0 END) AS INTEGER)
       |    AS n_byte_ids,
       |  array_to_string(list(CAST(id AS VARCHAR) ORDER BY pos, sub)[1:8], ' ')
       |    AS head_ids,
       |  CAST(sum(id) AS BIGINT) AS id_sum
       |FROM flat GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_tokens" -> (bpeTokenCounts _),
    "q_pack_sequences_bpe" -> (packSequencesBpe _),
    "q_token_budget_mix" -> (tokenBudgetMix _),
    "q_token_budget_report" -> (tokenBudgetReport _),
    "q_contamination_bpe" -> (contaminationBpe _),
    "q_bpe_coverage" -> (bpeCoverage _),
    "q_bpe_ids" -> (bpeIdCounts _),
    "q_bpe_ids_bytes" -> (bpeIdCountsBytes _))

  def oracles: Map[String, String] = Map(
    "q_bpe_tokens" -> bpeTokenCountsSql,
    "q_pack_sequences_bpe" -> packSequencesBpeSql,
    "q_token_budget_mix" -> tokenBudgetMixSql,
    "q_token_budget_report" -> tokenBudgetReportSql,
    "q_contamination_bpe" -> contaminationBpeSql,
    "q_bpe_coverage" -> bpeCoverageSql,
    "q_bpe_ids" -> bpeIdCountsSql,
    "q_bpe_ids_bytes" -> bpeIdCountsBytesSql)
}
