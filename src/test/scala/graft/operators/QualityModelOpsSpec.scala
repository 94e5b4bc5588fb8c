package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityModelOpsSpec extends SparkSpec {

  private lazy val docs = graft.Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).as("n_words"))

  test("lm perplexity: one row per doc, n_bigrams = n_words - 1, all log probs negative") {
    val lp = QualityModelOps.lmPerplexity(spark, sfDir)
    val joined = lp.join(docs, Seq("doc_id")).collect()
    assert(joined.length == docs.count())
    joined.foreach { r =>
      val nWords = r.getAs[Int]("n_words")
      assert(r.getAs[Long]("n_bigrams") == nWords - 1L)
      // smoothed bigram probs are strictly < 1 (cb <= cw, V >= 1)
      assert(r.getAs[Double]("mean_log_prob") < 0.0)
    }
  }

  test("lm perplexity: reference-slice docs score higher than out-of-slice docs on average") {
    val lp = QualityModelOps.lmPerplexity(spark, sfDir).join(docs, Seq("doc_id"))
      .groupBy(col("source").isin(QualityModelOps.refSources: _*).as("is_ref"))
      .agg(avg(col("mean_log_prob")).as("avg_lp"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // docs the model was trained on have every bigram seen (cb >= 1);
    // out-of-slice docs carry unseen bigrams that fall to the smoothing floor
    assert(lp(true) > lp(false))
  }

  test("dsir: n_features = 2*n_words - 1, flag mirrors the rounded weight's sign") {
    val w = QualityModelOps.dsirWeights(spark, sfDir)
    val joined = w.join(docs, Seq("doc_id")).collect()
    assert(joined.length == docs.count())
    joined.foreach { r =>
      val nWords = r.getAs[Int]("n_words")
      assert(r.getAs[Long]("n_features") == 2L * nWords - 1L)
      assert(r.getAs[Boolean]("target_like") == (r.getAs[Double]("log_weight") > 0.0))
    }
  }

  test("dsir: reference-slice docs weigh more target-like than out-of-slice docs on average") {
    val byRef = QualityModelOps.dsirWeights(spark, sfDir).join(docs, Seq("doc_id"))
      .groupBy(col("source").isin(QualityModelOps.refSources: _*).as("is_ref"))
      .agg(avg(col("log_weight")).as("avg_w"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byRef(true) > byRef(false))
  }

  test("stupid backoff: scores are log-probabilities of sub-1 ratios, trigram counts line up") {
    val scored = QualityModelOps.backoffScore(spark, sfDir).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    val words = docs.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    scored.foreach { case (id, nTri, score) =>
      val nw = words(id)
      if (nw >= 3) {
        assert(nTri === nw - 2, s"doc $id trigram count")
        assert(score < 0, s"doc $id score $score not a log of a sub-1 ratio")
      } else assert(nTri === -1L && score.isNaN, s"short doc $id should be unscored")
    }
  }

  test("stupid backoff: reference-slice docs score higher than out-of-slice docs") {
    val bySource = QualityModelOps.backoffScore(spark, sfDir)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .filter(col("mean_log_score").isNotNull)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Double]("mean_log_score")))
    val (ref, rest) = bySource.partition(p => QualityModelOps.refSources.contains(p._1))
    val refMean = ref.map(_._2).sum / ref.length
    val restMean = rest.map(_._2).sum / rest.length
    assert(refMean > restMean, s"in-domain $refMean not above out-of-domain $restMean")
  }

  test("quality ensemble: verdict is exactly the conjunction of its audited signals") {
    val rows = QualityModelOps.qualityEnsemble(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getString(3), r.getBoolean(4), r.getBoolean(5)))
    assert(rows.length === graft.Tables.documents(spark, sfDir).count(),
      "one verdict per document")
    rows.foreach { case (id, gk, rf, bucket, _, keep) =>
      assert(keep === (gk && !rf && bucket != "tail"), s"doc $id verdict drifts")
    }
    // the cascade actually separates: both kept and cut documents exist
    assert(rows.exists(_._6) && rows.exists(!_._6), "degenerate gate")
  }

  test("both scores are deterministic across runs") {
    def digest(df: org.apache.spark.sql.DataFrame): String =
      df.select(md5(concat_ws("#", df.columns.map(c => col(c).cast("string")): _*))
        .as("h")).agg(md5(concat_ws("", collect_list(col("h")))).as("d"))
        .collect()(0).getString(0)
    assert(digest(QualityModelOps.lmPerplexity(spark, sfDir)) ==
      digest(QualityModelOps.lmPerplexity(spark, sfDir)))
    assert(digest(QualityModelOps.dsirWeights(spark, sfDir)) ==
      digest(QualityModelOps.dsirWeights(spark, sfDir)))
  }

  test("feature extraction survives one-word and empty documents") {
    import spark.implicits._
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "  two  words  "))
      .toDF("doc_id", "text")
    val feats = docs.select(col("doc_id"), QualityModelOps.featuresCol.as("fs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(feats(1L) == Seq("solo"), "one word → one unigram, no bigrams")
    assert(feats(2L) == Seq(""), "empty text → the single empty token")
    assert(feats(3L) == Seq("two", "words", "two words"))
    // and the full scoring path survives them (model + stream scorer)
    val model = QualityModelOps.dsirModelOf(docs.withColumn("source", lit("src0")))
    assert(model.count() == QualityModelOps.dsirBuckets.toLong,
      "model must carry all 256 buckets, seen or not")
    val scored = graft.streaming.EventStream.dsirScoreStream(docs, model).collect()
    assert(scored.length == 3 && scored.forall(!_.isNullAt(2)))
  }
}
