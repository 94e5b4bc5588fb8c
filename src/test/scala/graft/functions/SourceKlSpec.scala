package graft.functions

import graft.SparkSpec

class SourceKlSpec extends SparkSpec {

  test("source KL: non-negative (Gibbs), zero only for a corpus-identical source") {
    val rows = TextFunctions.sourceKl(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, kl) =>
      assert(n > 0, s"$src empty")
      // Gibbs' inequality: KL >= 0 up to the 6-dp rounding of the output
      assert(kl >= -1e-6, s"$src negative KL $kl")
    }
    // a real multi-source corpus is not perfectly uniform: some source
    // must measurably diverge from the blend
    assert(rows.map(_._3).max > 1e-4, "no source diverges at all")
  }

  test("source KL agrees with a direct per-source recomputation") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = scala.collection.mutable.Map[(String, String), Long]()
    docs.foreach { case (src, text) =>
      text.trim.split("\\s+").foreach { w =>
        counts((src, w)) = counts.getOrElse((src, w), 0L) + 1
      }
    }
    val corpus = counts.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val nCorpus = corpus.values.sum.toDouble
    val expected = counts.groupBy(_._1._1).map { case (src, m) =>
      val nS = m.values.sum.toDouble
      val kl = m.map { case ((_, w), cs) =>
        (cs / nS) * math.log((cs / nS) / (corpus(w) / nCorpus))
      }.sum
      src -> kl
    }
    TextFunctions.sourceKl(spark, sfDir).collect().foreach { r =>
      val got = r.getDouble(2)
      val want = expected(r.getString(0))
      assert(math.abs(got - want) < 1e-5, s"${r.getString(0)}: $got vs $want")
    }
  }
}
